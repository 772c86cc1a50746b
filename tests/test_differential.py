"""Differential fuzzing: generated Spark-vs-DuckDB parity (VERDICT r7 #2).

360 seeded random query specs (``diffgen.make_spec``) — projections,
filters, group-bys, joins, semi/anti, set-ops, windows — each compiled to
BOTH a DataFrame plan and oracle SQL, compared through the driver-identical
``oracle_harness.compare``. A failure prints the seed + SQL: the seed is a
permanent repro (``make_spec(seed)`` is deterministic).

Chunked 30 specs/test for failure granularity without per-spec session
overhead. Runs at sf0.001 by default (smoke speed, identical semantics);
set ``SPARK_GRAFT_DIFF_SF_DIR=/root/testdata/sf0.01`` for the heavier pass.
"""

from __future__ import annotations

import os

import pytest

from .diffgen import make_spec
from .oracle_harness import compare

# 360 v1 seeds (frozen pool — historical seeds reproduce forever) + 150
# v2 seeds (r9: native ROUND/AVG, decimal arithmetic + cast-down edges,
# interval day-second/year-month, window-over-join/union composites)
N_SPECS = 510
CHUNK = 30
DIFF_SF = os.environ.get("SPARK_GRAFT_DIFF_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def diff_tables(spark):
    from dask_hivemetastore_spark.catalog import load_table

    names = ["orders", "lineitem", "customer", "nation", "events",
             "documents"]
    return {n: load_table(spark, DIFF_SF, n) for n in names}


@pytest.fixture(scope="module")
def diff_duck():
    import duckdb

    con = duckdb.connect()
    for t in ["orders", "lineitem", "customer", "nation", "events",
              "documents"]:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{DIFF_SF}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.slow
@pytest.mark.parametrize("chunk", range(N_SPECS // CHUNK))
def test_differential_chunk(chunk, spark, diff_tables, diff_duck):
    failures = []
    for seed in range(chunk * CHUNK, (chunk + 1) * CHUNK):
        spec = None
        try:
            spec = make_spec(seed)
            sdf = spec.build(diff_tables)
            problems = compare(f"seed{seed}", sdf, diff_duck.sql(spec.sql))
        except Exception as exc:  # noqa: BLE001 — collect, don't abort chunk
            problems = [f"seed{seed}: EXCEPTION {type(exc).__name__}: {exc}"]
        if problems:
            failures.append(
                f"--- seed {seed}"
                + (f" ({spec.description}) ---\nSQL: {spec.sql}" if spec
                   else " (generation failed) ---")
                + "\n" + "\n".join(problems)
            )
    assert not failures, f"{len(failures)} divergent specs:\n" + "\n".join(failures)
