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


def test_certification_window_integrity():
    """The driver certifies the FIRST 50 registry keys; a typo'd key name
    in _CERTIFICATION_PRIORITY would silently waste a certification slot
    (the reorder skips unknown names), and a rows-only key in the window
    wastes one on a weaker check (policy #4). Pin both, plus the
    array-free output discipline the r6 red row established: no
    top-level array/map/struct columns in any registered query's schema
    can be checked only at runtime, but the priority list itself must be
    real keys, all full-oracle, no duplicates."""
    from dask_hivemetastore_spark.plans import (
        ORACLES,
        QUERIES,
        _CERTIFICATION_PRIORITY,
    )

    unknown = [k for k in _CERTIFICATION_PRIORITY if k not in QUERIES]
    assert not unknown, f"priority list names unregistered keys: {unknown}"
    assert len(set(_CERTIFICATION_PRIORITY)) == len(_CERTIFICATION_PRIORITY)
    # a 51st entry would silently fall OUTSIDE the driver's first-50
    # window and never certify (caught live in r7 review — the list had
    # grown to 51 and salted_join_revenue was the silent casualty)
    assert len(_CERTIFICATION_PRIORITY) == 50, len(_CERTIFICATION_PRIORITY)
    window = list(QUERIES)[:50]
    assert set(window) == set(_CERTIFICATION_PRIORITY)
    rows_only = [k for k in window if k not in ORACLES]
    assert not rows_only, f"rows-only keys waste driver slots: {rows_only}"
