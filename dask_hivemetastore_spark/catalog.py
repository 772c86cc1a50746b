"""Table catalog over the driver's testdata.

Plays the role the Hive Metastore plays for the reference connector
(SURVEY.md §1.3): given a table name, resolve schema + location + format and
return a lazy DataFrame. Two layers:

- :func:`load_table` / :func:`register_views` — the testdata catalog used by
  every query in ``plans/``. Normalizes the one semantic quirk in the data
  (``events.ts`` is parquet TIMESTAMP(NANOS); Spark 4 reads it as bigint
  nanos under ``nanosAsLong`` while the DuckDB oracle truncates to µs —
  SURVEY.md §7.6) so Spark-side queries and oracle SQL see identical values.
- :class:`ThinCatalog` (in ``sources/metastore.py``) — a standalone
  metastore-like registry mirroring the reference's resolution flow for
  arbitrary tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import ensure_runtime_confs

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with oracle-aligned column semantics.

    ``events.ts``: parquet TIMESTAMP(NANOS) → (with nanosAsLong) bigint
    nanoseconds. The DuckDB oracle reads the same column as µs TIMESTAMP
    (truncating), so we expose ``ts`` as TIMESTAMP_NTZ at µs precision via
    integer division — float division would lose precision (ns since epoch
    ≈ 1.7e18 > 2^53). The raw value is kept as ``ts_ns`` for
    precision-sensitive operators.
    """
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts",
            F.expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"),
        ).select("event_id", "ts", "user_id", "event_type", "value", "props", "ts_ns")
    return df


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (SQL entry point)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
