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
