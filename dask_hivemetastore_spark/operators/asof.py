"""As-of join — SURVEY.md §2-C C7 (no Catalyst strategy; library-level rewrite).

Semantics (fixed, documented per SURVEY.md §7.4 item 3): *backward* as-of,
*inclusive* on the timestamp, no tolerance — for each left row, attach the
right row with the greatest ``right.ts <= left.ts`` within the same ``by``
key group. Equivalent to DuckDB ``ASOF LEFT JOIN`` and pandas
``merge_asof(direction="backward")``.

Implementation is the union+window rewrite rather than a per-partition
``merge_asof`` UDF: tag both sides, sort within key by (ts, side) with the
right side first on ties, and carry the right columns forward with
``last(..., ignoreNulls=True)``. One shuffle on the key, no Python in the hot
path, and — unlike a broadcast-sorted-right approach — both sides may be
arbitrarily large, which is the 100 TB requirement. Skewed keys can be salted
by pre-splitting the left side; AQE handles moderate skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts: str,
    by: str,
    value_cols: list[str],
    right_prefix: str = "asof_",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join.

    Returns ``left`` with ``{right_prefix}{ts}`` and ``{right_prefix}{col}``
    for each of ``value_cols`` attached (NULL when no right row precedes).
    ``tolerance_seconds`` mirrors pandas ``merge_asof(tolerance=...)``: a
    match farther back than the tolerance is nulled out (applied as a
    post-filter on the carried columns — the window pass is unchanged).
    """
    from pyspark.sql import types as T

    lcols = left.columns
    # The right row is carried as ONE struct, not per-column: a struct is
    # non-null whenever a right row exists even if its inner values are
    # NULL, so last(ignorenulls) attaches the single latest right ROW.
    # Per-column carries would skip a NULL value column independently and
    # stitch together values from DIFFERENT right rows — a row that never
    # existed (r7 review; DuckDB ASOF / pandas merge_asof both attach the
    # whole row).
    r_struct_type = T.StructType(
        [T.StructField("__ts", right.schema[ts].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tagged = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c) if c != by and c != ts else F.col(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        F.struct(
            F.col(ts).alias("__ts"),
            *[F.col(c).alias(c) for c in value_cols],
        ).alias("__r"),
    )
    # right rows sort BEFORE left rows on ts ties → inclusive (<=) semantics
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        *lcols,
        F.col("__side"),
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    )
    out = (
        carried.where(F.col("__side") == 1)
        .select(
            *lcols,
            F.col("__r.__ts").alias(f"{right_prefix}{ts}"),
            *[
                F.col(f"__r.{c}").alias(f"{right_prefix}{c}")
                for c in value_cols
            ],
        )
    )
    if tolerance_seconds is not None:
        delta_us = F.unix_micros(F.col(ts).cast("timestamp")) - F.unix_micros(
            F.col(f"{right_prefix}{ts}").cast("timestamp")
        )
        within = delta_us <= F.lit(int(tolerance_seconds * 1_000_000))
        out = out.select(
            *lcols,
            *[
                F.when(within, F.col(f"{right_prefix}{c}"))
                .alias(f"{right_prefix}{c}")
                for c in [ts, *value_cols]
            ],
        )
    return out
