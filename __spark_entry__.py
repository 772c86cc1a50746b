"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`dask_hivemetastore_spark.plans` — every operator from
SURVEY.md §2 registers itself there as a ``(queries[key], oracle_sql[key])``
pair. See ``dask_hivemetastore_spark/plans/registry.py`` for the parity
discipline (aliasing, ROUND, µs timestamps).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dask_hivemetastore_spark import plans  # noqa: E402
from dask_hivemetastore_spark.session import ensure_runtime_confs  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q1_pricing_summary) on /root/testdata/sf0.001."""
    ensure_runtime_confs(spark)
    return plans.QUERIES["q1_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(plans.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every hash-checkable query."""
    return dict(plans.ORACLES)
