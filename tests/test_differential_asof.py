"""Differential fuzz of the as-of join against DuckDB's native ASOF JOIN.

The registered ``asof_join_events`` / ``asof_join_tolerance`` keys pin two
fixed configurations; this fuzzes the operator's WHOLE parameter space —
random left/right event-type splits, tolerance on/off and of random width
— on both the real sf0.001 events and the boundary-heavy hostile corpus
(exact ties at the join instant, duplicate right timestamps, ±1µs edges).

Determinism rule: a duplicate (user, ts) pair on the RIGHT side makes the
attached row engine-dependent in BOTH engines (each picks one arbitrarily),
so every spec dedupes the right side to max(event_id) per (user, ts) —
explicitly, on both sides — before joining. That is also the documented
guidance for operator users (operators/asof.py).
"""

from __future__ import annotations

import random

import pytest

from .oracle_harness import compare

TYPES = ["click", "view", "purchase", "signup", "error"]


def _spec(seed: int):
    rng = random.Random(1000 + seed)
    lt = rng.choice(TYPES)
    rt = rng.choice([t for t in TYPES if t != lt])
    tol = rng.choice([None, 60, 300, 1800, 3600])
    return lt, rt, tol


def _spark_side(spark, sf_dir: str, lt: str, rt: str, tol):
    from pyspark.sql import functions as F

    from dask_hivemetastore_spark.catalog import load_table
    from dask_hivemetastore_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == lt).select(
        "event_id", "ts", "user_id", "value"
    )
    right = (
        ev.where(F.col("event_type") == rt)
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("r_id"), F.max("value").alias("r_value"))
    )
    joined = asof_join(
        left, right, ts="ts", by="user_id",
        value_cols=["r_id", "r_value"], tolerance_seconds=tol,
    )
    return joined.select(
        "event_id",
        F.col("asof_r_id").alias("r_id"),
        F.col("asof_r_value").alias("r_value"),
    )


def _oracle_sql(lt: str, rt: str, tol) -> str:
    # tolerance is a POST-filter on the attached row (pandas merge_asof
    # semantics, same as the operator): the nearest match is found by the
    # plain backward ASOF, then nulled when farther back than the
    # tolerance. An extra predicate inside ASOF ON is not valid DuckDB.
    if tol is None:
        rid, rval = "r.r_id", "r.r_value"
    else:
        within = f"l.ts - r.ts <= INTERVAL {tol} SECOND"
        rid = f"CASE WHEN {within} THEN r.r_id END"
        rval = f"CASE WHEN {within} THEN r.r_value END"
    return f"""
    WITH l AS (SELECT event_id, ts, user_id FROM events
               WHERE event_type = '{lt}'),
    r AS (SELECT user_id, ts, MAX(event_id) AS r_id, MAX(value) AS r_value
          FROM events WHERE event_type = '{rt}' GROUP BY 1, 2)
    SELECT l.event_id, {rid} AS r_id, {rval} AS r_value
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND r.ts <= l.ts
    """


N = 20


@pytest.mark.slow
@pytest.mark.parametrize("corpus", ["real", "hostile"])
def test_asof_fuzz(corpus, spark, tmp_path_factory):
    import duckdb

    from .conftest import SF_SMOKE

    if corpus == "real":
        sf_dir = SF_SMOKE
    else:
        from .test_hostile_events import write_hostile_events

        d = tmp_path_factory.mktemp("asof_hostile")
        write_hostile_events(d)
        sf_dir = str(d)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    failures = []
    for seed in range(N):
        lt, rt, tol = _spec(seed)
        try:
            sdf = _spark_side(spark, sf_dir, lt, rt, tol)
            problems = compare(
                f"asof{seed}", sdf, con.sql(_oracle_sql(lt, rt, tol))
            )
        except Exception as exc:  # noqa: BLE001
            problems = [f"asof{seed}: EXCEPTION {type(exc).__name__}: {exc}"]
        if problems:
            failures.append(
                f"--- seed {seed} (left={lt} right={rt} tol={tol}) ---\n"
                + "\n".join(problems)
            )
    con.close()
    assert not failures, f"{len(failures)} divergent:\n" + "\n".join(failures)
