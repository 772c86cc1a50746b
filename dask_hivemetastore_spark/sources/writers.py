"""Sinks (SURVEY.md §2-A A6/A7).

Scale note: ``partition_by`` columns become the table's prunable layout —
choose low-cardinality, always-filtered keys (date, lang). Writers coalesce
nothing: output file count = shuffle partitions, which AQE has already
right-sized; repartition before write only when producing a bucketed layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    sep: str = ",",
    header: bool = True,
) -> None:
    df.write.mode(mode).options(sep=sep, header=str(header).lower()).csv(path)


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed catalog table (Spark's durable analog of the
    reference's sorted ``divisions``, SURVEY.md §2-C C3).

    Two tables bucketed identically on their join key sort-merge-join with
    ZERO exchanges — the shuffle is paid once at write time and amortized
    over every subsequent join/aggregation on that key. This is the single
    biggest lever for a 100 TB fact table joined repeatedly on the same key.
    Requires ``saveAsTable`` (bucket metadata lives in the catalog, not the
    files).
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
