"""Banded range join: interval overlap WITHOUT an equi-key (SURVEY.md §2-C
C6's 100 TB fallback, promoted to a real operator).

A pure inequality join (``e.ts BETWEEN p.ts AND p.ts + w``, no shared key)
gives Spark no hash key, so the planner degrades to
BroadcastNestedLoopJoin — O(|left|·|right|) comparisons and a broadcast of
a whole side: the classic scale killer. The standard fix (DuckDB's IEJoin
and Databricks' range-join hints do the same under the hood) is BANDING:
quantize time into fixed buckets, explode each interval onto the buckets it
overlaps, map each point to its single bucket, and equi-join on the bucket
id — then apply the exact range predicate as a post-filter. The theta join
becomes a shuffled hash/sort-merge join whose candidate set is only
same-bucket pairs.

Pair-uniqueness argument: a (point, interval) pair can only meet in the
point's OWN bucket (the point maps to exactly one bucket; the interval's
explode covers it), so no dedup is needed — and with a LEFT join the
interval rows that match nothing emit one NULL row per covered bucket,
which aggregation's ``count(point)`` ignores, preserving left semantics.

Sizing: ``bucket_seconds`` should be on the order of the interval length —
each interval then explodes to ~2 bucket rows. Long-tailed interval lengths
blow the single-level explode up (an interval covering B buckets emits B
rows), so both joins take ``max_buckets_per_interval`` to switch to
HIERARCHICAL banding: ``n_levels`` static granularities, level ``ℓ`` using
buckets of ``bucket_seconds · M^ℓ`` seconds (``M = max_buckets_per_
interval``). Each interval picks, map-side from its own length, the finest
level at which it covers ≤ M+1 buckets and explodes only there; the probe
side pays one extra row per static level (points) or a geometrically-
shrinking tail of coarse rows (intervals). The exact predicate post-filter
is unchanged, so the rewrite stays a pure plan transformation — property-
tested equal to the naive theta join including pathological lengths
(tests/test_properties.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _secs(ts: Column) -> Column:
    # fractional epoch seconds; TIMESTAMP_NTZ has no direct numeric cast,
    # so hop via TIMESTAMP — wall-clock-preserving under the session's
    # pinned UTC timezone (session.REQUIRED_RUNTIME_CONFS)
    return ts.cast("timestamp").cast("double")


def _bucket(ts: Column, bucket_seconds: float) -> Column:
    return F.floor(_secs(ts) / F.lit(float(bucket_seconds))).cast("long")


def _interval_level(start: Column, end: Column, bucket_seconds: int,
                    max_buckets: int, n_levels: int) -> Column:
    """Finest level ℓ ∈ [0, n_levels) at which (start, end) covers at most
    ``max_buckets + 1`` buckets of size ``bucket_seconds · max_buckets^ℓ``:
    the smallest ℓ with length ≤ bucket_seconds · max_buckets^(ℓ+1); the
    top level absorbs anything longer (graceful degrade — the explode is
    then length / top-bucket-size, still max_buckets× smaller than the
    single-level explode)."""
    length = _secs(end) - _secs(start)
    level = F.lit(n_levels - 1)
    for lv in range(n_levels - 2, -1, -1):
        fits = length <= F.lit(float(bucket_seconds) * max_buckets ** (lv + 1))
        level = F.when(fits, F.lit(lv)).otherwise(level)
    return level


def _level_size(level: Column, bucket_seconds: int, max_buckets: int,
                n_levels: int) -> Column:
    sizes = F.array(*[
        F.lit(float(bucket_seconds) * max_buckets ** lv)
        for lv in range(n_levels)
    ])
    return F.element_at(sizes, level + 1)


def point_in_interval_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    point_col: str,
    bucket_seconds: int,
    how: str = "left",
    open_start: bool = True,
    max_buckets_per_interval: int | None = None,
    n_levels: int = 3,
) -> DataFrame:
    """Join every point into every interval whose (start, end] (or
    [start, end] with ``open_start=False``) covers it — no equi-key
    required, never a nested-loop plan.

    ``intervals`` and ``points`` must not share column names (alias
    upstream). Returns one row per matching (interval, point) pair plus,
    for ``how='left'``, NULL-point rows for uncovered intervals (one per
    covered bucket — aggregate with ``count(point_col)`` which ignores
    NULLs, or dedup on an interval key).

    Only ``how='inner'`` and ``how='left'`` are supported: the bucket
    explode duplicates each side before the equi-join, and only these two
    join types collapse back to the documented multiplicities
    (``'right'``/``'full'`` would emit one NULL row per probe/bucket
    replica — silently inflated — so they raise instead; r7 review).

    With ``max_buckets_per_interval = M`` the explode is bounded for
    long-tailed interval lengths by hierarchical banding: each interval
    picks the finest of ``n_levels`` granularities (level ℓ buckets are
    ``bucket_seconds · M^ℓ`` seconds) at which it spans ≤ M+1 buckets and
    explodes only at that level; each point emits exactly ``n_levels``
    (level, bucket) probe rows. A pair still meets exactly once — the
    interval has ONE level, the point has ONE bucket per level, and the
    interval's explosion covers the point's bucket at that level iff the
    point lies inside (up to the exact post-filter).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"point_in_interval_join supports how='inner'/'left', got {how!r}"
        )
    start_ok = (
        F.col(point_col) > F.col(start_col)
        if open_start
        else F.col(point_col) >= F.col(start_col)
    )
    exact = start_ok & (F.col(point_col) <= F.col(end_col))

    if max_buckets_per_interval is None:
        lo = _bucket(F.col(start_col), bucket_seconds)
        hi = _bucket(F.col(end_col), bucket_seconds)
        # explode_outer, not explode: an interval with NULL bounds has a
        # NULL bucket sequence, and a plain explode would DROP the row —
        # but SQL LEFT JOIN preserves left rows whose ON predicate is
        # NULL (r8 NULL-corpus fuzz). The NULL __b replica matches
        # nothing, so inner joins drop it and left joins emit the
        # unmatched row, both matching the theta-join oracle.
        iv = intervals.withColumn("__b", F.explode_outer(F.sequence(lo, hi)))
        pt = points.withColumn(
            "__b", _bucket(F.col(point_col), bucket_seconds)
        )
        cond = (iv["__b"] == pt["__b"]) & exact
        return iv.join(pt, cond, how).drop("__b")

    m = int(max_buckets_per_interval)
    if m < 1 or n_levels < 1:
        raise ValueError("max_buckets_per_interval and n_levels must be >= 1")
    level = _interval_level(
        F.col(start_col), F.col(end_col), bucket_seconds, m, n_levels
    )
    size = _level_size(F.col("__lvl"), bucket_seconds, m, n_levels)
    iv = (
        intervals.withColumn("__lvl", level)
        .withColumn(
            "__b",
            # explode_outer: same NULL-bounds left-preservation rule as
            # the single-level path above
            F.explode_outer(
                F.sequence(
                    F.floor(_secs(F.col(start_col)) / size).cast("long"),
                    F.floor(_secs(F.col(end_col)) / size).cast("long"),
                )
            ),
        )
    )
    pt = points.withColumn(
        "__probe",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(lv).alias("lvl"),
                    _bucket(
                        F.col(point_col), float(bucket_seconds) * m ** lv
                    ).alias("b"),
                )
                for lv in range(n_levels)
            ])
        ),
    )
    cond = (
        (iv["__lvl"] == pt["__probe"]["lvl"])
        & (iv["__b"] == pt["__probe"]["b"])
        & exact
    )
    return iv.join(pt, cond, how).drop("__lvl", "__b", "__probe")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int,
    max_buckets_per_interval: int | None = None,
    n_levels: int = 3,
) -> DataFrame:
    """Inner join every pair of OVERLAPPING intervals (closed overlap:
    ``l_start <= r_end AND r_start <= l_end``) — the interval×interval
    generalization of :func:`point_in_interval_join`, again without an
    equi-key and never a nested-loop plan.

    Both sides explode onto their covered buckets and equi-join on the
    bucket id. Unlike the point case, an overlapping pair shares EVERY
    bucket its overlap region spans, so the join would duplicate pairs;
    the standard anchor trick makes each pair match exactly once WITHOUT a
    distinct: the overlap region starts at ``m = greatest(l_start,
    r_start)``, both sides' explosions necessarily cover ``bucket(m)``
    (``m`` lies inside both intervals), and the join additionally requires
    the met bucket to BE ``bucket(m)`` — true in exactly one bucket per
    pair. A post-``distinct`` would instead shuffle the full match
    multiset; the anchor predicate is free.

    With ``max_buckets_per_interval = M``, hierarchical banding bounds the
    explode for long-tailed lengths: each interval computes its own finest
    fitting level ℓ₀ and explodes onto its covered buckets at EVERY level
    ℓ ≥ ℓ₀ (≤ M+1 rows at ℓ₀, then a geometrically shrinking ~2, ~1, …
    tail — bounded by M + 2·n_levels rows total). A pair joins at exactly
    ``lvl = greatest(ℓ₀ˡ, ℓ₀ʳ)`` — both sides are present there — and the
    anchor bucket at that level fires in exactly one bucket, so each
    overlapping pair still emits exactly once.

    Column names must be disjoint across the two sides (alias upstream).
    Same sizing guidance as the point join: ``bucket_seconds`` on the
    order of typical interval length.
    """
    exact = (
        (F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end))
    )

    if max_buckets_per_interval is None:
        lo_l = _bucket(F.col(l_start), bucket_seconds)
        hi_l = _bucket(F.col(l_end), bucket_seconds)
        lo_r = _bucket(F.col(r_start), bucket_seconds)
        hi_r = _bucket(F.col(r_end), bucket_seconds)
        lhs = left.withColumn("__bl", F.explode(F.sequence(lo_l, hi_l)))
        rhs = right.withColumn("__br", F.explode(F.sequence(lo_r, hi_r)))
        anchor = _bucket(
            F.greatest(F.col(l_start), F.col(r_start)), bucket_seconds
        )
        cond = (lhs["__bl"] == rhs["__br"]) & exact & (lhs["__bl"] == anchor)
        return lhs.join(rhs, cond, "inner").drop("__bl", "__br")

    m = int(max_buckets_per_interval)
    if m < 1 or n_levels < 1:
        raise ValueError("max_buckets_per_interval and n_levels must be >= 1")

    def mk_probe(lv: int):
        # single-parameter lambda on purpose: a 2-arg callable would make
        # F.transform pass (element, index)
        return lambda b: F.struct(F.lit(lv).alias("lvl"), b.alias("b"))

    empty = F.array().cast("array<struct<lvl:int,b:bigint>>")

    def explode_all_levels(df: DataFrame, s: str, e: str, lvl_col: str,
                           probe_col: str) -> DataFrame:
        own = _interval_level(F.col(s), F.col(e), bucket_seconds, m, n_levels)
        # The when() guard is load-bearing, not cosmetic: without it a LONG
        # interval would materialize its enormous fine-level sequence per
        # row before being sliced away — the exact blowup this path exists
        # to avoid.
        probes = F.flatten(
            F.array(*[
                F.when(
                    F.lit(lv) >= F.col(lvl_col),
                    F.transform(
                        F.sequence(
                            F.floor(
                                _secs(F.col(s))
                                / F.lit(float(bucket_seconds) * m ** lv)
                            ).cast("long"),
                            F.floor(
                                _secs(F.col(e))
                                / F.lit(float(bucket_seconds) * m ** lv)
                            ).cast("long"),
                        ),
                        mk_probe(lv),
                    ),
                ).otherwise(empty)
                for lv in range(n_levels)
            ])
        )
        return df.withColumn(lvl_col, own).withColumn(
            probe_col, F.explode(probes)
        )

    lhs = explode_all_levels(left, l_start, l_end, "__ll", "__pl")
    rhs = explode_all_levels(right, r_start, r_end, "__lr", "__pr")
    join_lvl = F.greatest(lhs["__ll"], rhs["__lr"])
    anchor_size = _level_size(join_lvl, bucket_seconds, m, n_levels)
    anchor = F.floor(
        _secs(F.greatest(F.col(l_start), F.col(r_start))) / anchor_size
    ).cast("long")
    cond = (
        (lhs["__pl"]["lvl"] == rhs["__pr"]["lvl"])
        & (lhs["__pl"]["b"] == rhs["__pr"]["b"])
        & (lhs["__pl"]["lvl"] == join_lvl)
        & (lhs["__pl"]["b"] == anchor)
        & exact
    )
    return lhs.join(rhs, cond, "inner").drop("__ll", "__lr", "__pl", "__pr")
