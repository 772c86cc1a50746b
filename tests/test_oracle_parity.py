"""The primary gate: every registered query with an oracle must match DuckDB
at sf0.01 — mirroring the driver's CORRECTNESS check."""

from __future__ import annotations

import pytest

from dask_hivemetastore_spark import plans

from .oracle_harness import compare

KEYS = sorted(plans.QUERIES)


@pytest.mark.parametrize("key", KEYS)
def test_query_parity(key, spark, duck, sf_dir):
    fn = plans.QUERIES[key]
    sdf = fn(spark, sf_dir)
    oracle = plans.ORACLES.get(key)
    if oracle is None:
        # rows-only check, like the driver's weaker path
        n = sdf.count()
        assert n >= 0
        return
    problems = compare(key, sdf, duck.sql(oracle))
    assert not problems, "\n".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) == 10
