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
    hive_serde: bool = False,
) -> DataFrame:
    r"""A3: delimited text with a *declared* Hive schema (no inference),
    exactly as the metastore path requires.

    ``hive_serde=True`` reads with LazySimpleSerDe field semantics rather
    than Spark-CSV conventions: NO quote handling (Hive's text serde has
    none — a leading ``"`` is data, and Spark's default quoted-field
    parsing could swallow delimiters), ``\N`` as the NULL sentinel, and
    empty string as a real value (Spark's default reads '' as NULL,
    silently corrupting valid Hive empties — r7 review). The default
    False keeps Spark-CSV semantics for files Spark itself wrote
    (quoting IS meaningful there)."""
    schema = hive_schema_to_struct(hive_cols)
    if hive_serde:
        # LazySimpleSerDe exactly, as pure JVM expressions: split each
        # line on the delimiter, map the \N sentinel to NULL, cast to
        # the declared type. Spark's CSV reader cannot express this --
        # its unquoted-empty-field handling returns NULL no matter what
        # (univocity), and its quote/escape conventions have no Hive
        # equivalent at all.
        import re as _re

        from pyspark.sql import functions as F

        lines = spark.read.text(location)
        fields = F.split(F.col("value"), _re.escape(sep), -1)
        cols = []
        for i, field_def in enumerate(schema.fields):
            # try_element_at / try_cast, NOT element_at / cast: under
            # Spark 4's default ANSI mode a short row (fewer fields than
            # the declared schema) or an unparsable primitive would throw.
            # LazySimpleSerDe NULL-pads short rows and NULLs malformed
            # values, so ragged/dirty Hive text tables must read as NULLs.
            raw = F.try_element_at(fields, F.lit(i + 1))
            val = F.when(raw == "\\N", F.lit(None)).otherwise(raw)
            cols.append(
                val.try_cast(field_def.dataType).alias(field_def.name)
            )
        return lines.select(*cols)
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
