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

    The ``repartition(n_buckets, *bucket_cols)`` is load-bearing (same
    murmur3 hash as the bucket spec → each task holds exactly one
    bucket's rows → ONE file per bucket; without it every task writes a
    sliver of every bucket — tasks × buckets small files). Shares the
    rationale documented on :func:`..operators.layout.write_bucketed`,
    which is this writer plus an explicit external ``path`` (r7 review
    aligned the two implementations).
    """
    from pyspark.sql import functions as F

    w = (
        df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
        .write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_parquet_observed(
    df: DataFrame,
    path: str,
    metrics: dict[str, "object"],
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> dict[str, object]:
    """Write parquet and collect named QC metrics IN THE SAME PASS.

    ``metrics`` maps names to aggregate Columns (``F.count``, ``F.sum``,
    ``F.avg``, ``approx_count_distinct`` …) evaluated by Spark's
    ``Observation`` mechanism as rows stream through the write — no second
    scan. At 100 TB, the naive "write, then re-read to compute row counts /
    null rates for the manifest" doubles the pipeline's I/O; an observed
    write makes the QC manifest free. Returns the observed values.

    Constraint (Spark's, worth knowing): observed metrics must be
    aggregates over the observed plan node and at most one action may
    consume them; this helper owns that action (the write).
    """
    from pyspark.sql import Observation

    obs = Observation()
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    w = observed.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return obs.get
