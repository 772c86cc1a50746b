"""Differential fuzz of the banded range join vs a plain DuckDB theta join.

``point_in_interval_join`` rewrites a keyless inequality join into a
banded equi-join (single-level or hierarchical); the property suite pins
it against Spark's own naive theta join. This fuzzer pins it against a
SECOND engine: random widths, bucket sizes, boundary openness, join
sides, and banding modes, on both the real sf0.001 events and the
boundary-heavy hostile corpus (points landing exactly ON interval
endpoints — where open_start semantics bite).

Inner specs compare exact (interval, point) pair sets; left specs compare
per-interval aggregates, because the operator's documented left-join
multiplicity is one NULL row per uncovered bucket (collapsed by
count/sum exactly like SQL's grouped LEFT JOIN).
"""

from __future__ import annotations

import random

import pytest

from .oracle_harness import compare

TYPES = ["click", "view", "purchase", "signup", "error"]


def _spec(seed: int):
    rng = random.Random(7000 + seed)
    it = rng.choice(TYPES)
    pt = rng.choice([t for t in TYPES if t != it])
    width = rng.choice([60, 300, 900, 3600, 7200])
    bucket = rng.choice([60, 300, 1800])
    open_start = rng.random() < 0.5
    how = rng.choice(["inner", "left"])
    hier = rng.choice([None, 4])  # max_buckets_per_interval
    return it, pt, width, bucket, open_start, how, hier


def _spark_side(spark, sf_dir, it, pt, width, bucket, open_start, how, hier):
    from pyspark.sql import functions as F

    from dask_hivemetastore_spark.catalog import load_table
    from dask_hivemetastore_spark.operators.rangejoin import (
        point_in_interval_join,
    )

    ev = load_table(spark, sf_dir, "events")
    iv = ev.where(F.col("event_type") == it).select(
        F.col("event_id").alias("iid"),
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr(f"INTERVAL {width} SECOND")).alias("e"),
    )
    pts = ev.where(F.col("event_type") == pt).select(
        F.col("event_id").alias("pid"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    j = point_in_interval_join(
        iv, pts, "s", "e", "p_ts", bucket_seconds=bucket, how=how,
        open_start=open_start, max_buckets_per_interval=hier,
    )
    if how == "inner":
        return j.select("iid", "pid")
    return j.groupBy("iid").agg(
        F.count("pid").alias("n_pts"),
        F.sum(F.col("p_value").cast("decimal(18,2)")).cast("double")
        .alias("val_sum"),
    )


def _oracle_sql(it, pt, width, open_start, how):
    lo = ">" if open_start else ">="
    on = f"p.ts {lo} i.ts AND p.ts <= i.ts + INTERVAL {width} SECOND"
    if how == "inner":
        return f"""
        SELECT i.event_id AS iid, p.event_id AS pid
        FROM (SELECT * FROM events WHERE event_type = '{it}') i
        JOIN (SELECT * FROM events WHERE event_type = '{pt}') p ON {on}
        """
    return f"""
    SELECT i.event_id AS iid, COUNT(p.event_id) AS n_pts,
           CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
    FROM (SELECT * FROM events WHERE event_type = '{it}') i
    LEFT JOIN (SELECT * FROM events WHERE event_type = '{pt}') p ON {on}
    GROUP BY 1
    """


N = 16


@pytest.mark.slow
@pytest.mark.parametrize("corpus", ["real", "hostile"])
def test_rangejoin_fuzz(corpus, spark, tmp_path_factory):
    import duckdb

    from .conftest import SF_SMOKE

    if corpus == "real":
        sf_dir = SF_SMOKE
    else:
        from .test_hostile_events import write_hostile_events

        d = tmp_path_factory.mktemp("rj_hostile")
        write_hostile_events(d)
        sf_dir = str(d)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    failures = []
    for seed in range(N):
        it, pt, width, bucket, open_start, how, hier = _spec(seed)
        try:
            sdf = _spark_side(spark, sf_dir, it, pt, width, bucket,
                              open_start, how, hier)
            problems = compare(
                f"rj{seed}", sdf,
                con.sql(_oracle_sql(it, pt, width, open_start, how)),
            )
        except Exception as exc:  # noqa: BLE001
            problems = [f"rj{seed}: EXCEPTION {type(exc).__name__}: {exc}"]
        if problems:
            failures.append(
                f"--- seed {seed} (iv={it} pt={pt} w={width}s bucket={bucket}"
                f" open={open_start} how={how} hier={hier}) ---\n"
                + "\n".join(problems)
            )
    con.close()
    assert not failures, f"{len(failures)} divergent:\n" + "\n".join(failures)


def _overlap_spec(seed: int):
    rng = random.Random(9000 + seed)
    at = rng.choice(TYPES)
    bt = rng.choice([t for t in TYPES if t != at])
    wa = rng.choice([60, 600, 3600])
    wb = rng.choice([60, 600, 3600])
    bucket = rng.choice([60, 600, 1800])
    hier = rng.choice([None, 4])
    return at, bt, wa, wb, bucket, hier


@pytest.mark.slow
@pytest.mark.parametrize("corpus", ["real", "hostile"])
def test_interval_overlap_fuzz(corpus, spark, tmp_path_factory):
    """interval×interval sibling: random widths on each side, closed
    overlap — pair sets must equal DuckDB's plain theta join (the anchor
    trick's exactly-once claim tested against a second engine)."""
    import duckdb

    from pyspark.sql import functions as F

    from .conftest import SF_SMOKE
    from dask_hivemetastore_spark.catalog import load_table
    from dask_hivemetastore_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    if corpus == "real":
        sf_dir = SF_SMOKE
    else:
        from .test_hostile_events import write_hostile_events

        d = tmp_path_factory.mktemp("ov_hostile")
        write_hostile_events(d)
        sf_dir = str(d)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    ev = load_table(spark, sf_dir, "events")
    failures = []
    for seed in range(12):
        at, bt, wa, wb, bucket, hier = _overlap_spec(seed)
        a = ev.where(F.col("event_type") == at).select(
            F.col("event_id").alias("aid"),
            F.col("ts").alias("a_s"),
            (F.col("ts") + F.expr(f"INTERVAL {wa} SECOND")).alias("a_e"),
        )
        b = ev.where(F.col("event_type") == bt).select(
            F.col("event_id").alias("bid"),
            F.col("ts").alias("b_s"),
            (F.col("ts") + F.expr(f"INTERVAL {wb} SECOND")).alias("b_e"),
        )
        sql = f"""
        SELECT a.event_id AS aid, b.event_id AS bid
        FROM (SELECT * FROM events WHERE event_type = '{at}') a
        JOIN (SELECT * FROM events WHERE event_type = '{bt}') b
          ON a.ts <= b.ts + INTERVAL {wb} SECOND
         AND b.ts <= a.ts + INTERVAL {wa} SECOND
        """
        try:
            sdf = interval_overlap_join(
                a, b, "a_s", "a_e", "b_s", "b_e", bucket_seconds=bucket,
                max_buckets_per_interval=hier,
            ).select("aid", "bid")
            problems = compare(f"ov{seed}", sdf, con.sql(sql))
        except Exception as exc:  # noqa: BLE001
            problems = [f"ov{seed}: EXCEPTION {type(exc).__name__}: {exc}"]
        if problems:
            failures.append(
                f"--- seed {seed} (a={at}/{wa}s b={bt}/{wb}s bucket={bucket}"
                f" hier={hier}) ---\n" + "\n".join(problems)
            )
    con.close()
    assert not failures, f"{len(failures)} divergent:\n" + "\n".join(failures)
