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


def write_delimited_lossless(df: DataFrame, location: str,
                             sep: str = "|") -> None:
    r"""A6-text, LOSSLESS: delimited-text sink whose output
    :func:`read_delimited_lossless` reconstructs exactly — NULL vs empty
    string vs literal ``\N`` vs embedded newlines/quotes/delimiters all
    survive (each was a silent corruption under Spark-CSV write/read
    defaults; found by tests/test_hostile_formats.py r10 and first fixed
    inline in the ``csv_roundtrip_agg`` key, extracted here as the
    engine's interchange API).

    Protocol (LazySimpleSerDe's escape idea on RFC-4180 quoting):
    - every backslash in a string column is DOUBLED on write, so the
      bare two-char token ``\N`` can only mean NULL (``nullValue``);
    - carriage returns are written as the two-char escape ``\r`` — the
      multiLine reader NORMALIZES raw ``\r``/``\r\n`` inside quoted
      fields to ``\n`` (found by the r10 round-trip fuzzer; the same
      line-ending normalization class XML 1.0 mandates), so only an
      escape survives;
    - NUL is written as ``\0`` so the reader can use raw NUL as its
      decode placeholder;
    - writer whitespace trimming disabled (univocity trims by default);
    - fields carrying sep/quote/newline are quoted by the writer and
      re-parsed by the multiLine reader.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    def enc(name: str):
        c = F.replace(F.col(name), F.lit("\\"), F.lit("\\\\"))
        c = F.replace(c, F.lit("\r"), F.lit("\\r"))
        c = F.replace(c, F.lit("\x00"), F.lit("\\0"))
        return c.alias(name)

    cols = [
        enc(f.name) if isinstance(f.dataType, StringType) else F.col(f.name)
        for f in df.schema.fields
    ]
    df.select(*cols).write.mode("overwrite").options(
        sep=sep,
        header=False,
        nullValue="\\N",
        ignoreLeadingWhiteSpace=False,
        ignoreTrailingWhiteSpace=False,
    ).csv(location)


def read_delimited_lossless(spark: SparkSession, location: str,
                            hive_cols: list[tuple[str, str]],
                            sep: str = "|") -> DataFrame:
    r"""Scan of a :func:`write_delimited_lossless` table: declared schema
    (no inference), ``\N`` → NULL, backslashes un-doubled, quoted
    newlines re-assembled (``multiLine`` — per-file input splits, the
    interchange-format cost; parquet stays the storage path)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    schema = hive_schema_to_struct(hive_cols)
    df = (
        spark.read.options(
            sep=sep, header=False, multiLine=True, nullValue="\\N"
        )
        .schema(schema)
        .csv(location)
    )
    # Escape decode. A naive sequence of literal replaces is ambiguous
    # ("\\0" = escaped-backslash-then-zero vs NUL-escape), so step 1 is
    # ONE left-to-right regex pass turning every escape pair "\X" into
    # the two chars MARKER+X — the regex engine's non-overlapping scan
    # gives exactly one-pass decode semantics. MARKER is raw NUL, which
    # the writer guarantees absent (it escapes data NULs as "\0").
    # The marker pairs then decode independently; the NUL pair LAST,
    # because its decoded output re-creates a raw NUL that an earlier
    # data char ('r', '\\') must never be re-scanned against.
    _M = "\x00"

    def dec(name: str):
        c = F.regexp_replace(F.col(name), r"\\(.|\n)", _M + "$1")
        c = F.replace(c, F.lit(_M + "\\"), F.lit("\\"))
        c = F.replace(c, F.lit(_M + "r"), F.lit("\r"))
        c = F.replace(c, F.lit(_M + "N"), F.lit("\\N"))
        c = F.replace(c, F.lit(_M + "0"), F.lit(_M))
        return c.alias(name)

    cols = [
        dec(f.name) if isinstance(f.dataType, StringType) else F.col(f.name)
        for f in schema.fields
    ]
    return df.select(*cols)


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
