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
blow the explode up (an interval covering B buckets emits B rows); at
100 TB, split such outliers into sub-intervals first or band hierarchically
(coarse buckets for long intervals). For the fixed-window case handled
here, the expansion factor is exactly 2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(ts: Column, bucket_seconds: int) -> Column:
    # fractional epoch seconds; TIMESTAMP_NTZ has no direct numeric cast,
    # so hop via TIMESTAMP — wall-clock-preserving under the session's
    # pinned UTC timezone (session.REQUIRED_RUNTIME_CONFS)
    return F.floor(
        ts.cast("timestamp").cast("double") / bucket_seconds
    ).cast("long")


def point_in_interval_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    point_col: str,
    bucket_seconds: int,
    how: str = "left",
    open_start: bool = True,
) -> DataFrame:
    """Join every point into every interval whose (start, end] (or
    [start, end] with ``open_start=False``) covers it — no equi-key
    required, never a nested-loop plan.

    ``intervals`` and ``points`` must not share column names (alias
    upstream). Returns one row per matching (interval, point) pair plus,
    for ``how='left'``, NULL-point rows for uncovered intervals (one per
    covered bucket — aggregate with ``count(point_col)`` which ignores
    NULLs, or dedup on an interval key).
    """
    lo = _bucket(F.col(start_col), bucket_seconds)
    hi = _bucket(F.col(end_col), bucket_seconds)
    iv = intervals.withColumn("__b", F.explode(F.sequence(lo, hi)))
    pt = points.withColumn("__b", _bucket(F.col(point_col), bucket_seconds))
    start_ok = (
        F.col(point_col) > F.col(start_col)
        if open_start
        else F.col(point_col) >= F.col(start_col)
    )
    cond = (
        (iv["__b"] == pt["__b"])
        & start_ok
        & (F.col(point_col) <= F.col(end_col))
    )
    return iv.join(pt, cond, how).drop("__b")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int,
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

    Column names must be disjoint across the two sides (alias upstream).
    Same sizing guidance as the point join: ``bucket_seconds`` on the
    order of typical interval length.
    """
    lo_l = _bucket(F.col(l_start), bucket_seconds)
    hi_l = _bucket(F.col(l_end), bucket_seconds)
    lo_r = _bucket(F.col(r_start), bucket_seconds)
    hi_r = _bucket(F.col(r_end), bucket_seconds)
    lhs = left.withColumn("__bl", F.explode(F.sequence(lo_l, hi_l)))
    rhs = right.withColumn("__br", F.explode(F.sequence(lo_r, hi_r)))
    anchor = _bucket(
        F.greatest(F.col(l_start), F.col(r_start)), bucket_seconds
    )
    cond = (
        (lhs["__bl"] == rhs["__br"])
        & (F.col(l_start) <= F.col(r_end))
        & (F.col(r_start) <= F.col(l_end))
        & (lhs["__bl"] == anchor)
    )
    return lhs.join(rhs, cond, "inner").drop("__bl", "__br")
