"""Skew-mitigation join: key salting (SURVEY.md §7.5).

At 100 TB a zipf-ish join key (e.g. a handful of power users owning 1% of
all orders) sends entire key groups to single reducers; AQE's skew-join
splitting (``spark.sql.adaptive.skewJoin.enabled``, on by default here)
handles sort-merge joins automatically, but explicit salting is the
portable fallback — it also works for aggregations and for engines/plans
AQE can't rewrite.

Scheme: append ``salt = pmod(hash(<row-unique expr>), S)`` to the skewed
(big) side, replicate the small side S times via ``explode(sequence)``, and
join on ``keys + [salt]`` — every original match pair survives in exactly
one salt bucket, so results are identical to the unsalted join while each
hot key fans out over S reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_big_side(df: DataFrame, unique_expr: Column, buckets: int) -> DataFrame:
    """Tag the skewed side with a deterministic pseudo-random salt bucket.

    ``unique_expr`` must vary within a key group (a row id / primary key) so
    the group spreads over buckets; using the join key itself would put the
    whole group in one bucket and defeat the purpose.
    """
    return df.withColumn(SALT_COL, F.pmod(F.hash(unique_expr), F.lit(buckets)))


def replicate_small_side(df: DataFrame, buckets: int) -> DataFrame:
    """Cross the small side with salts 0..buckets-1 (S× row replication —
    only acceptable on the *small* side; that asymmetry is the whole idea)."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    unique_expr: Column,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the hot keys of ``big``
    spread over ``buckets`` reducers. Semantically identical to
    ``big.join(small, on, how)`` for inner/left joins."""
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_join supports how='inner'/'left' only: the small side "
            f"is replicated per salt bucket, and {how!r} would emit one "
            "null-padded row PER REPLICA for unmatched small-side keys"
        )
    b = salt_big_side(big, unique_expr, buckets)
    s = replicate_small_side(small, buckets)
    return b.join(s, on + [SALT_COL], how).drop(SALT_COL)
