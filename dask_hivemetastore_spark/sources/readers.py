"""Source readers (SURVEY.md §2-A A2-A5, A8).

The reference connector's format dispatch: Parquet input format →
``dd.read_parquet``; TextInputFormat + LazySimpleSerDe → ``dd.read_csv``
with the serde's ``field.delim`` (default ``\\x01``) and the
metastore-declared schema — never inference (SURVEY.md §1.3). These
functions are the Spark twins, taking Hive type strings so the §1.2 mapping
is exercised on every read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..types import hive_schema_to_struct

HIVE_DEFAULT_DELIM = "\x01"  # LazySimpleSerDe default field.delim


def read_parquet(
    spark: SparkSession,
    location: str,
    columns: list[str] | None = None,
    predicate: str | None = None,
) -> DataFrame:
    """A2: parquet scan. ``columns``/``predicate`` mirror the reference's
    explicit kwargs, but Catalyst would derive both from downstream usage
    anyway — they exist for API parity and for forcing pruning at the edge.
    """
    df = spark.read.parquet(location)
    if predicate:
        df = df.where(predicate)
    if columns:
        df = df.select(*columns)
    return df


def read_delimited(
    spark: SparkSession,
    location: str,
    hive_cols: list[tuple[str, str]],
    sep: str = HIVE_DEFAULT_DELIM,
    header: bool = False,
) -> DataFrame:
    """A3: delimited text with a *declared* Hive schema (no inference),
    exactly as the metastore path requires."""
    schema = hive_schema_to_struct(hive_cols)
    return (
        spark.read.options(sep=sep, header=str(header).lower())
        .schema(schema)
        .csv(location)
    )


def read_partitioned_parquet(
    spark: SparkSession,
    base_path: str,
    partition_predicate: str | None = None,
) -> DataFrame:
    """A4/A5: Hive-style ``key=value/`` directory layout. Spark's partition
    discovery reconstructs the key columns; a predicate on them prunes at
    the *file listing* level (PartitionFilters in the scan node) — the same
    optimization the reference got from ``get_partitions_by_filter``.
    """
    df = spark.read.option("basePath", base_path).parquet(base_path)
    if partition_predicate:
        df = df.where(partition_predicate)
    return df


def from_pandas(spark: SparkSession, pdf) -> DataFrame:
    """A8: in-memory source (``dd.from_pandas``)."""
    return spark.createDataFrame(pdf)
