"""Differential fuzz of rolling time-window frames (E4) vs DuckDB RANGE.

Random window widths over events: Spark ``rangeBetween`` on
``unix_micros(ts)`` vs DuckDB ``RANGE BETWEEN INTERVAL … PRECEDING AND
CURRENT ROW`` — inclusive-bound and tie (peer-group) semantics must
agree row-for-row. Runs on the real sf0.001 events and the hostile
corpus, whose ±1µs rows sit exactly ON frame boundaries and whose
duplicate timestamps form real peer groups. Counts and DECIMAL-exact
sums only (order-free), keyed by the unique event_id.
"""

from __future__ import annotations

import random

import pytest

from .oracle_harness import compare


def _spec(seed: int):
    rng = random.Random(4000 + seed)
    width = rng.choice([60, 300, 3600, 7200])
    per_user = rng.random() < 0.5
    agg = rng.choice(["count", "sum"])
    return width, per_user, agg


N = 12


@pytest.mark.slow
@pytest.mark.parametrize("corpus", ["real", "hostile"])
def test_rolling_window_fuzz(corpus, spark, tmp_path_factory):
    import duckdb

    from pyspark.sql import Window, functions as F

    from .conftest import SF_SMOKE
    from dask_hivemetastore_spark.catalog import load_table

    if corpus == "real":
        sf_dir = SF_SMOKE
    else:
        from .test_hostile_events import write_hostile_events

        d = tmp_path_factory.mktemp("roll_hostile")
        write_hostile_events(d)
        sf_dir = str(d)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    ev = load_table(spark, sf_dir, "events")
    failures = []
    for seed in range(N):
        width, per_user, agg = _spec(seed)
        part_sql = "PARTITION BY user_id " if per_user else ""
        over = (f"OVER ({part_sql}ORDER BY ts RANGE BETWEEN "
                f"INTERVAL {width} SECOND PRECEDING AND CURRENT ROW)")
        if agg == "count":
            wexpr = f"CAST(COUNT(*) {over} AS BIGINT)"
        else:
            wexpr = (f"CAST(SUM(CAST(value AS DECIMAL(18,2))) {over} "
                     "AS DOUBLE)")
        sql = f"SELECT event_id, {wexpr} AS w FROM events"

        w = Window.orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        if per_user:
            w = w.partitionBy("user_id")
        w = w.rangeBetween(-width * 1_000_000, 0)
        if agg == "count":
            wc = F.count(F.lit(1)).over(w).cast("long")
        else:
            wc = F.sum(F.col("value").cast("decimal(18,2)")).over(w) \
                .cast("double")
        sdf = ev.select("event_id", wc.alias("w"))
        try:
            problems = compare(f"roll{seed}", sdf, con.sql(sql))
        except Exception as exc:  # noqa: BLE001
            problems = [f"roll{seed}: EXCEPTION {type(exc).__name__}: {exc}"]
        if problems:
            failures.append(
                f"--- seed {seed} (width={width}s per_user={per_user} "
                f"agg={agg}) ---\n" + "\n".join(problems)
            )
    con.close()
    assert not failures, f"{len(failures)} divergent:\n" + "\n".join(failures)
