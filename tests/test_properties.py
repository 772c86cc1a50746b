"""Property-based invariants (hypothesis) for the custom operators.

Complements the oracle harness (fixed fixtures) with generated inputs:
rewrite-equivalence for the salted join, dedup accounting, component
consistency, and float-fold parity for the dot product. Example counts are
small because every example runs Spark jobs; the properties are chosen so a
violation reproduces deterministically from the printed example.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),   # rid (unique-ified below)
        st.integers(min_value=0, max_value=5),    # join key
    ),
    min_size=1,
    max_size=25,
)
keys_st = st.lists(st.integers(min_value=0, max_value=5), min_size=0, max_size=4, unique=True)


@pytest.mark.slow
@SETTINGS
@given(rows=rows_st, small_keys=keys_st, buckets=st.integers(min_value=1, max_value=5))
def test_salted_join_rewrite_equivalence(spark, rows, small_keys, buckets):
    """For ANY input and bucket count, salted_join(inner/left) == plain join."""
    from dask_hivemetastore_spark.operators.skew import salted_join

    uniq = [(i, k) for i, (_, k) in enumerate(rows)]
    big = spark.createDataFrame(uniq, "rid long, k long")
    small = spark.createDataFrame([(k, f"v{k}") for k in small_keys], "k long, tag string") \
        if small_keys else spark.createDataFrame([], "k long, tag string")
    for how in ["inner", "left"]:
        plain = sorted(map(tuple, big.join(small, ["k"], how).collect()))
        salted = sorted(map(tuple, salted_join(
            big, small, ["k"], unique_expr=F.col("rid"), buckets=buckets, how=how
        ).collect()))
        assert plain == salted, (how, buckets)


texts_st = st.lists(st.text(alphabet="ab ", min_size=0, max_size=12), min_size=1, max_size=20)


@SETTINGS
@given(texts=texts_st)
def test_exact_dedup_accounting(spark, texts):
    """exact_dedup keeps exactly one id per distinct text (the min), and the
    kept copy-counts sum to the input row count."""
    from dask_hivemetastore_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = exact_dedup(df, "doc_id", "text").collect()
    assert len(out) == len(set(texts))
    assert sum(r.n_copies for r in out) == len(texts)
    expected_keep = {min(i for i, t in enumerate(texts) if t == u) for u in set(texts)}
    assert {r.doc_id for r in out} == expected_keep


edges_st = st.lists(
    st.tuples(st.integers(min_value=0, max_value=9), st.integers(min_value=0, max_value=9)),
    min_size=0,
    max_size=12,
)


@pytest.mark.slow
@SETTINGS
@given(edges=edges_st)
def test_connected_components_consistency(spark, edges):
    """Both endpoints of every edge land in the same component, and every
    component label is the min id of its members."""
    from dask_hivemetastore_spark.operators.dedup import connected_components

    edges = [(a, b) for a, b in edges if a != b]
    nodes = sorted({n for e in edges for n in e} | {0, 9})
    ids = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    pairs = (
        spark.createDataFrame(edges, "doc_a long, doc_b long")
        if edges
        else spark.createDataFrame([], "doc_a long, doc_b long")
    )
    comp = {r.doc_id: r.component for r in connected_components(pairs, ids, "doc_id").collect()}
    for a, b in edges:
        assert comp[a] == comp[b], (a, b, comp)
    # label == min of member ids
    members: dict[int, list[int]] = {}
    for n, c in comp.items():
        members.setdefault(c, []).append(n)
    for c, ms in members.items():
        assert c == min(ms), (c, ms)


vecs_st = st.lists(
    st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
    min_size=1,
    max_size=8,
)


@SETTINGS
@given(va=vecs_st, vb=vecs_st)
def test_dot_f64_is_sequential_fold(spark, va, vb):
    """dot_f64 == a strict left-to-right f64 fold (the exact float contract
    the oracles rely on), for any float32 inputs."""
    from dask_hivemetastore_spark.operators.similarity import dot_f64

    n = min(len(va), len(vb))
    va, vb = va[:n], vb[:n]
    df = spark.createDataFrame([(va, vb)], "a array<float>, b array<float>")
    got = df.select(dot_f64(F.col("a"), F.col("b")).alias("d")).collect()[0].d
    import numpy as np

    acc = 0.0
    for x, y in zip(np.array(va, dtype=np.float32), np.array(vb, dtype=np.float32)):
        acc += float(x) * float(y)
    assert got == pytest.approx(acc, abs=0.0) or got == acc


words_st = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=8)
    .map(" ".join),
    min_size=2,
    max_size=12,
)


@SETTINGS
@given(texts=words_st, threshold=st.sampled_from([0.5, 0.8, 0.9]))
def test_prefix_filter_is_lossless(spark, texts, threshold):
    """ngram_jaccard_pairs (prefix-filtered) must equal the brute-force
    Python computation for ANY corpus and threshold — the AllPairs prefix
    bound and the length filter are optimizations, never semantics. Small
    word alphabet forces heavy gram collisions (the regime where a buggy
    prefix/tie-break would drop pairs)."""
    from dask_hivemetastore_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(df, "doc_id", "text", n=2,
                                     threshold=threshold).collect()
    }

    def grams(t: str) -> set:
        ws = t.split(" ")
        return {f"{ws[i]} {ws[i+1]}" for i in range(len(ws) - 1)} if len(ws) >= 2 else None

    expect = set()
    gsets = {i: grams(t) for i, t in enumerate(texts)}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            ga, gb = gsets[a], gsets[b]
            if ga is None or gb is None:
                continue
            inter = len(ga & gb)
            if inter and inter / (len(ga) + len(gb) - inter) >= threshold:
                expect.add((a, b))
    assert got == expect, (sorted(got), sorted(expect), texts)


ids_st = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40, unique=True
)


@SETTINGS
@given(ids=ids_st, extra=st.lists(
    st.integers(min_value=10_001, max_value=20_000), max_size=10, unique=True))
def test_hash_split_stable_under_growth(spark, ids, extra):
    """A row's train/test membership is a pure function of its key: adding
    new rows to the corpus must never move an existing row between splits
    (the property rand()-based splits lack)."""
    from dask_hivemetastore_spark.operators.curation import train_test_split

    base = spark.createDataFrame([(i,) for i in ids], "doc_id: long")
    grown = spark.createDataFrame([(i,) for i in ids + extra], "doc_id: long")
    s1 = {r["doc_id"]: r["split"] for r in train_test_split(base, "doc_id").collect()}
    s2 = {r["doc_id"]: r["split"] for r in train_test_split(grown, "doc_id").collect()}
    assert all(s2[k] == v for k, v in s1.items())


@SETTINGS
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=5_000),
              st.sampled_from(["a", "b", "c"])),
    min_size=3, max_size=60, unique_by=lambda t: t[0]))
def test_rebalance_never_exceeds_min_group(spark, rows):
    """rebalance_to_min's kept count per group is bounded: the hash
    threshold admits at most ~min_count-proportional mass, and the smallest
    group is never upsampled (kept <= its own size)."""
    from dask_hivemetastore_spark.operators.curation import rebalance_to_min

    df = spark.createDataFrame(rows, "doc_id: long, source: string")
    sizes = {r["source"]: r["n"] for r in
             df.groupBy("source").agg(F.count("*").alias("n")).collect()}
    min_n = min(sizes.values())
    kept = {r["source"]: r["n"] for r in
            rebalance_to_min(df, "source", "doc_id")
            .groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, n in kept.items():
        assert n <= sizes[src]
        # hash thresholding is probabilistic around the target; bound by
        # the group's admissible ceiling rather than min_n exactly
        assert n <= sizes[src] * (min_n / sizes[src]) + 10


@SETTINGS
@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=5_000),
              st.sampled_from(["a", "b", "c"])),
    min_size=3, max_size=60, unique_by=lambda t: t[0]))
@pytest.mark.slow
def test_rebalance_temperature_bounds(spark, rows):
    """Temperature sampling never upsamples, keeps the smallest group
    whole, and interpolates: every row kept at alpha=0.5 is also kept at
    alpha=1 (thresholds grow monotonically with alpha)."""
    from dask_hivemetastore_spark.operators.curation import rebalance_temperature

    df = spark.createDataFrame(rows, "doc_id: long, source: string")
    sizes = {r["source"]: r["n"] for r in
             df.groupBy("source").agg(F.count("*").alias("n")).collect()}
    min_n = min(sizes.values())
    half = {r["doc_id"] for r in
            rebalance_temperature(df, "source", "doc_id", alpha=0.5).collect()}
    full = {r["doc_id"] for r in
            rebalance_temperature(df, "source", "doc_id", alpha=1.0).collect()}
    kept_by_src = {s: 0 for s in sizes}
    for did, src in rows:
        if did in half:
            kept_by_src[src] += 1
    for src, n in sizes.items():
        assert kept_by_src[src] <= n
        if n == min_n:
            assert kept_by_src[src] == n  # smallest source kept whole
    assert half <= full
    assert len(full) == len(rows)  # alpha=1 is the natural mixture


import datetime as _dt


def F_ts(seconds: int) -> "_dt.datetime":
    """Deterministic timestamp from integer seconds (epoch-based)."""
    return _dt.datetime(2024, 1, 1) + _dt.timedelta(seconds=seconds)


intervals_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2000),  # start (seconds)
        st.integers(min_value=0, max_value=700),   # length (seconds)
    ),
    min_size=1,
    max_size=15,
)
points_st = st.lists(
    st.integers(min_value=-100, max_value=2900), min_size=0, max_size=25
)


@SETTINGS
@given(iv=intervals_st, pts=points_st,
       bucket=st.sampled_from([60, 300, 1000]))
@pytest.mark.slow
def test_banded_range_join_equals_naive(spark, iv, pts, bucket):
    """For ANY intervals/points/bucket size, the banded equi-join rewrite
    produces exactly the naive theta join's (interval, point) pairs — the
    banding is a plan transformation, never a semantics change."""
    from dask_hivemetastore_spark.operators.rangejoin import (
        point_in_interval_join,
    )

    ivdf = spark.createDataFrame(
        [(i, F_ts(s), F_ts(s + ln)) for i, (s, ln) in enumerate(iv)],
        "iid long, start timestamp, end timestamp",
    )
    ptdf = spark.createDataFrame(
        [(j, F_ts(p)) for j, p in enumerate(pts)], "pid long, pt timestamp"
    )
    naive = {
        (r.iid, r.pid)
        for r in ivdf.join(
            ptdf,
            (F.col("pt") > F.col("start")) & (F.col("pt") <= F.col("end")),
            "inner",
        ).collect()
    }
    banded = {
        (r.iid, r.pid)
        for r in point_in_interval_join(
            ivdf, ptdf, "start", "end", "pt", bucket_seconds=bucket, how="inner"
        ).collect()
    }
    assert banded == naive


@SETTINGS
@given(left=intervals_st, right=intervals_st,
       bucket=st.sampled_from([60, 300, 1000]))
@pytest.mark.slow
def test_interval_overlap_join_equals_naive(spark, left, right, bucket):
    """For ANY interval sets and bucket size, the anchored banded overlap
    join emits exactly the naive theta join's pairs, each exactly once."""
    from dask_hivemetastore_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    a = spark.createDataFrame(
        [(i, F_ts(s), F_ts(s + ln)) for i, (s, ln) in enumerate(left)],
        "a_id long, a_s timestamp, a_e timestamp",
    )
    b = spark.createDataFrame(
        [(j, F_ts(s), F_ts(s + ln)) for j, (s, ln) in enumerate(right)],
        "b_id long, b_s timestamp, b_e timestamp",
    )
    naive = sorted(
        (r.a_id, r.b_id)
        for r in a.join(
            b,
            (F.col("a_s") <= F.col("b_e")) & (F.col("b_s") <= F.col("a_e")),
            "inner",
        ).collect()
    )
    banded = sorted(
        (r.a_id, r.b_id)
        for r in interval_overlap_join(
            a, b, "a_s", "a_e", "b_s", "b_e", bucket_seconds=bucket
        ).collect()
    )
    assert banded == naive  # sorted lists: catches duplicates, not just sets


# long-tailed lengths: up to ~139 h vs 60 s buckets — the single-level
# explode would be ~8000 rows for one interval; the hierarchical path must
# stay exact while never exploding past its cap
longtail_intervals_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2000),     # start (seconds)
        st.one_of(
            st.integers(min_value=0, max_value=700),        # normal
            st.integers(min_value=50_000, max_value=500_000),  # pathological
        ),
    ),
    min_size=1,
    max_size=10,
)


@SETTINGS
@given(iv=longtail_intervals_st, pts=points_st,
       mb=st.sampled_from([1, 4, 16]))
@pytest.mark.slow
def test_hierarchical_point_join_equals_naive(spark, iv, pts, mb):
    """With max_buckets_per_interval set, the multi-level banded point
    join equals the naive theta join for ANY mix of normal and
    pathologically long intervals (VERDICT r5 #3)."""
    from dask_hivemetastore_spark.operators.rangejoin import (
        point_in_interval_join,
    )

    ivdf = spark.createDataFrame(
        [(i, F_ts(s), F_ts(s + ln)) for i, (s, ln) in enumerate(iv)],
        "iid long, start timestamp, end timestamp",
    )
    ptdf = spark.createDataFrame(
        [(j, F_ts(p)) for j, p in enumerate(pts)], "pid long, pt timestamp"
    )
    naive = sorted(
        (r.iid, r.pid)
        for r in ivdf.join(
            ptdf,
            (F.col("pt") > F.col("start")) & (F.col("pt") <= F.col("end")),
            "inner",
        ).collect()
    )
    banded = sorted(
        (r.iid, r.pid)
        for r in point_in_interval_join(
            ivdf, ptdf, "start", "end", "pt", bucket_seconds=60, how="inner",
            max_buckets_per_interval=mb, n_levels=4,
        ).collect()
    )
    assert banded == naive


@SETTINGS
@given(left=longtail_intervals_st, right=longtail_intervals_st,
       mb=st.sampled_from([1, 4, 16]))
@pytest.mark.slow
def test_hierarchical_overlap_join_equals_naive(spark, left, right, mb):
    """Hierarchical banded overlap join == naive theta join, each pair
    exactly once, under long-tailed interval lengths."""
    from dask_hivemetastore_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    a = spark.createDataFrame(
        [(i, F_ts(s), F_ts(s + ln)) for i, (s, ln) in enumerate(left)],
        "a_id long, a_s timestamp, a_e timestamp",
    )
    b = spark.createDataFrame(
        [(j, F_ts(s), F_ts(s + ln)) for j, (s, ln) in enumerate(right)],
        "b_id long, b_s timestamp, b_e timestamp",
    )
    naive = sorted(
        (r.a_id, r.b_id)
        for r in a.join(
            b,
            (F.col("a_s") <= F.col("b_e")) & (F.col("b_s") <= F.col("a_e")),
            "inner",
        ).collect()
    )
    banded = sorted(
        (r.a_id, r.b_id)
        for r in interval_overlap_join(
            a, b, "a_s", "a_e", "b_s", "b_e", bucket_seconds=60,
            max_buckets_per_interval=mb, n_levels=4,
        ).collect()
    )
    assert banded == naive  # sorted: catches duplicates, not just sets


def test_hierarchical_explode_factor_capped(spark):
    """The cap contract itself (VERDICT r5 #3): an interval covering B
    fine buckets explodes to ≤ M+1 rows at its own level in the point
    join, and ≤ M + 2·n_levels rows total in the overlap join's
    all-coarser-levels explosion — vs B rows (≈ 8 334) single-level."""
    from dask_hivemetastore_spark.operators import rangejoin as rj

    m, n_levels, bucket = 16, 4, 60
    # one interval spanning 500 000 s = 8 334 fine buckets
    iv = spark.createDataFrame(
        [(0, F_ts(0), F_ts(500_000))],
        "iid long, start timestamp, end timestamp",
    )
    lvl = rj._interval_level(
        F.col("start"), F.col("end"), bucket, m, n_levels
    )
    size = rj._level_size(F.col("__lvl"), bucket, m, n_levels)
    n_rows = (
        iv.withColumn("__lvl", lvl)
        .withColumn(
            "__n",
            F.floor(rj._secs(F.col("end")) / size)
            - F.floor(rj._secs(F.col("start")) / size)
            + 1,
        )
        .select("__lvl", "__n")
        .collect()[0]
    )
    assert n_rows["__n"] <= m + 1, n_rows
    # single-level would have been ~8 334
    assert 500_000 // bucket + 1 > 8000

    # overlap-join explosion across all levels >= own stays bounded too
    exploded = rj.interval_overlap_join(
        iv,
        spark.createDataFrame(
            [(1, F_ts(10), F_ts(20))], "b_id long, b_s timestamp, b_e timestamp"
        ),
        "start", "end", "b_s", "b_e", bucket_seconds=bucket,
        max_buckets_per_interval=m, n_levels=n_levels,
    )
    # correctness of the single overlapping pair
    assert [(r.iid, r.b_id) for r in exploded.collect()] == [(0, 1)]


def test_hierarchical_join_never_nested_loop(spark):
    """The hierarchical paths must compile to hash/sort-merge equi-joins
    on (level, bucket) — never BroadcastNestedLoopJoin (same contract the
    single-level paths pin in tests/test_plans.py)."""
    from dask_hivemetastore_spark.operators.rangejoin import (
        interval_overlap_join,
        point_in_interval_join,
    )

    iv = spark.createDataFrame(
        [(0, F_ts(0), F_ts(500_000)), (1, F_ts(5), F_ts(65))],
        "iid long, start timestamp, end timestamp",
    )
    pt = spark.createDataFrame(
        [(0, F_ts(30))], "pid long, pt timestamp"
    )
    p1 = (
        point_in_interval_join(
            iv, pt, "start", "end", "pt", bucket_seconds=60, how="inner",
            max_buckets_per_interval=8,
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in p1 and "Join" in p1
    b = spark.createDataFrame(
        [(9, F_ts(10), F_ts(20))], "b_id long, b_s timestamp, b_e timestamp"
    )
    p2 = (
        interval_overlap_join(
            iv, b, "start", "end", "b_s", "b_e", bucket_seconds=60,
            max_buckets_per_interval=8,
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in p2 and "Join" in p2


docs_corpus_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),           # id (unique-ified)
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=8),
    ),
    min_size=1,
    max_size=20,
)


@SETTINGS
@given(old_rows=docs_corpus_st, new_rows=docs_corpus_st,
       threshold=st.sampled_from([0.5, 0.8, 1.0]))
@pytest.mark.slow
def test_dedup_incremental_equals_naive(spark, old_rows, new_rows, threshold):
    """For ANY corpora and threshold, dedup_incremental == the naive
    definition: within-batch exact survivors, minus exact text matches vs
    old, minus docs with word-3-gram Jaccard >= t against ANY old doc
    (docs with <3 words have no grams → near-exempt)."""
    from dask_hivemetastore_spark.operators.dedup import dedup_incremental

    def mk(rows, base):
        out, seen = [], set()
        for i, (rid, words) in enumerate(rows):
            rid = base + rid * 31 + i  # unique ids per side
            if rid in seen:
                continue
            seen.add(rid)
            out.append((rid, " ".join(words)))
        return out

    old = mk(old_rows, 10_000)
    new = mk(new_rows, 50_000)
    old_df = spark.createDataFrame(old, "doc_id long, text string")
    new_df = spark.createDataFrame(new, "doc_id long, text string")

    def grams(text):
        ws = text.split(" ")
        return {
            " ".join(ws[i:i + 3]) for i in range(len(ws) - 2)
        } if len(ws) >= 3 else set()

    # naive reference, driver-side
    by_text: dict = {}
    for rid, text in new:
        by_text.setdefault(text, []).append(rid)
    in_batch = {min(ids): text for text, ids in
                ((t, ids) for t, ids in by_text.items())}
    old_texts = {t for _, t in old}
    expect = set()
    for rid, text in in_batch.items():
        if text in old_texts:
            continue
        g = grams(text)
        near = False
        for _, otext in old:
            og = grams(otext)
            inter = len(g & og)
            union = len(g) + len(og) - inter
            # no epsilon: inter/union and the threshold literal are the
            # same IEEE doubles Spark compares, so >= agrees exactly
            if union and inter / union >= threshold:
                near = True
                break
        if not near:
            expect.add(rid)

    got = {
        r.doc_id
        for r in dedup_incremental(
            new_df, old_df, "doc_id", "text", n=3, threshold=threshold
        ).collect()
    }
    assert got == expect


ranks_st = st.lists(
    st.lists(
        st.integers(min_value=0, max_value=20),  # item ids per arm
        min_size=1, max_size=10, unique=True,
    ),
    min_size=1, max_size=4,
)


@SETTINGS
@given(arms=ranks_st, k0=st.integers(min_value=1, max_value=100))
def test_rrf_fuse_matches_reference_and_is_arm_order_invariant(
    spark, arms, k0
):
    """rrf_fuse (r13) vs a pure-python reference on ANY arm set: the
    fused score is exactly sum(1/(k0+rank)) per id, n_arms counts
    retriever agreement, and the result is invariant under arm-order
    permutation (the union+groupBy shape must not care which retriever
    is listed first)."""
    from dask_hivemetastore_spark.operators.similarity import rrf_fuse

    # 1-based ranks: the position in each generated arm list
    expect: dict[int, tuple[float, int]] = {}
    for arm in arms:
        for rank, item in enumerate(arm, start=1):
            s, n = expect.get(item, (0.0, 0))
            expect[item] = (s + 1.0 / (k0 + rank), n + 1)

    dfs = [
        spark.createDataFrame(
            [(item, rank) for rank, item in enumerate(arm, start=1)],
            "id long, rank int",
        )
        for arm in arms
    ]
    got = {
        r["id"]: (r["rrf_raw"], r["n_arms"])
        for r in rrf_fuse(dfs, "id", k0=k0).collect()
    }
    rev = {
        r["id"]: (r["rrf_raw"], r["n_arms"])
        for r in rrf_fuse(list(reversed(dfs)), "id", k0=k0).collect()
    }
    assert set(got) == set(expect)
    for item, (s, n) in expect.items():
        assert got[item][1] == n
        assert abs(got[item][0] - s) < 1e-12, (item, got[item], s)
    # arm-order invariance: counts exact; scores to IEEE-reassociation
    # tolerance (a 3-arm sum may reassociate across the two runs)
    assert set(rev) == set(got)
    for item in got:
        assert rev[item][1] == got[item][1]
        assert abs(rev[item][0] - got[item][0]) < 1e-12


calib_rows_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),     # group id
        st.integers(min_value=0, max_value=9),     # coarse score (forces ties)
    ),
    min_size=1,
    max_size=60,
)


@SETTINGS
@given(rows=calib_rows_st,
       frac=st.sampled_from([0.0, 0.2, 0.5, 0.8, 0.95]),
       threshold=st.integers(min_value=1, max_value=8))
def test_percent_rank_prefilter_gate_identity(spark, rows, frac, threshold):
    """For ANY grouped, tie-heavy input, gate fraction, and hot-group
    threshold, the rows at or above the percent-rank cutoff — and their
    exact pct values — are IDENTICAL between the plain window and
    percent_rank_top_prefiltered (the r14 calibration skew path). The
    rank-error argument in the docstring, checked mechanically."""
    from pyspark.sql import Window

    from dask_hivemetastore_spark.operators.curation import (
        percent_rank_top_prefiltered,
    )

    data = [(i, f"g{g}", float(sc) / 3.0) for i, (g, sc) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, grp string, score double")

    w = Window.partitionBy("grp").orderBy("score", "id")
    plain = {
        (r.grp, r.id): round(r.pct, 12)
        for r in df.withColumn("pct", F.percent_rank().over(w))
        .where(F.col("pct") >= frac)
        .collect()
    }
    pre = {
        (r.grp, r.id): round(r.pct, 12)
        for r in percent_rank_top_prefiltered(
            df, "score", "grp", "id", frac, hot_group_threshold=threshold
        ).where(F.col("pct") >= frac).collect()
    }
    assert pre == plain
