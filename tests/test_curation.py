"""Corpus-curation operator tests (SURVEY.md §2-K7): properties the oracle
parity gate can't express — SemDeDup's degenerate-case exactness, the
decontamination partition invariant, and the broadcast plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dask_hivemetastore_spark.catalog import load_table
from dask_hivemetastore_spark.operators import curation, similarity


@pytest.mark.slow
def test_semdedup_one_cell_equals_brute_force(spark, sf_dir):
    """n_cells=1 puts every vector in one cell → the within-cell search IS
    the all-pairs search, so SemDeDup must reproduce similar_pairs exactly.
    (With >1 cell it may only miss pairs, never invent them — checked
    below.)"""
    emb = load_table(spark, sf_dir, "embeddings")
    brute = {
        (r.id_a, r.id_b)
        for r in similarity.similar_pairs(emb, threshold=0.45).collect()
    }
    one_cell = {
        (r.id_a, r.id_b)
        for r in curation.semdedup_pairs(emb, 0.45, n_cells=1).collect()
    }
    assert one_cell == brute and brute

    clustered = {
        (r.id_a, r.id_b)
        for r in curation.semdedup_pairs(emb, 0.45, n_cells=8).collect()
    }
    assert clustered <= brute


def test_decontaminate_partitions_the_training_set(spark, sf_dir):
    """survivors ∪ contaminated == train, disjoint; short docs survive."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    train = docs.where(F.col("doc_id") % 97 != 0)

    bad = {
        r.doc_id
        for r in curation.contaminated_ids(train, bench, "doc_id", n=5).collect()
    }
    kept = {
        r.doc_id for r in curation.decontaminate(train, bench, "doc_id", n=5).collect()
    }
    all_train = {r.doc_id for r in train.select("doc_id").collect()}
    assert kept | bad == all_train
    assert kept & bad == set()


def test_decontaminate_broadcasts_benchmark_grams(spark, sf_dir):
    """The benchmark gram table must broadcast: the corpus side of the
    contamination probe never shuffles (the 100 TB requirement)."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    train = docs.where(F.col("doc_id") % 97 != 0)
    plan = (
        curation.contaminated_ids(train, bench, "doc_id", n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_cap_per_group_bounds_and_order(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    capped = curation.cap_per_group(docs, "source", "doc_id", k=3)
    per = capped.groupBy("source").agg(
        F.count("*").alias("n"), F.max("doc_id").alias("mx")
    )
    assert per.where(F.col("n") > 3).count() == 0
    # survivors are the k LOWEST ids: no kept id may exceed a dropped one
    mins = (
        docs.join(capped.select("doc_id").withColumn("__k", F.lit(1)), "doc_id", "left")
        .where(F.col("__k").isNull())
        .groupBy("source")
        .agg(F.min("doc_id").alias("min_dropped"))
    )
    bad = per.join(mins, "source").where(F.col("mx") > F.col("min_dropped"))
    assert bad.count() == 0


def test_cap_per_group_prefilter_identical(spark, sf_dir):
    """hot_group_threshold engages an approximate percentile pre-filter
    ahead of the exact window; the output must be IDENTICAL to the plain
    path — on the real fixture (unique order key) and on a synthetic hot
    group dominated by ties (the tie set must survive the value cutoff)."""
    docs = load_table(spark, sf_dir, "documents")
    plain = curation.cap_per_group(docs, "source", "doc_id", k=10).select(
        "doc_id", "source"
    )
    pre = curation.cap_per_group(
        docs, "source", "doc_id", k=10, hot_group_threshold=50
    ).select("doc_id", "source")
    assert plain.exceptAll(pre).count() == 0
    assert pre.exceptAll(plain).count() == 0

    # hot group: 2000 rows over 7 tied values; cold group untouched (n<=T)
    rows = [(i, "hot", i % 7) for i in range(2000)] + [
        (10_000 + i, "cold", i) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, val long")
    a = sorted(
        (r.grp, r.val)
        for r in curation.cap_per_group(df, "grp", "val", k=3).collect()
    )
    b = sorted(
        (r.grp, r.val)
        for r in curation.cap_per_group(
            df, "grp", "val", k=3, hot_group_threshold=100
        ).collect()
    )
    assert a == b

    import pytest

    with pytest.raises(ValueError):
        curation.cap_per_group(df, "grp", "val", k=3, hot_group_threshold=2)


def test_cap_per_group_prefilter_null_semantics(spark):
    """The hot-group pre-filter must reproduce the plain window exactly
    when NULLs appear anywhere (ADVICE r5): a NULL group key (the plain
    Window.partitionBy treats NULL as one ordinary partition — the stats
    join must be null-safe), NULL order values inside a hot group (asc is
    nulls-first, so they rank AHEAD of any cutoff value), and a hot group
    whose order values are ALL NULL (percentile_approx returns NULL — no
    row may be dropped)."""
    rows = (
        # hot NULL-keyed group: 500 distinct values
        [(i, None, i) for i in range(500)]
        # hot group with NULL order rows sprinkled in
        + [(1_000 + i, "mix", None if i % 50 == 0 else i) for i in range(500)]
        # hot group, ALL order values NULL
        + [(2_000 + i, "allnull", None) for i in range(300)]
        # cold control group
        + [(3_000 + i, "cold", i) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "id long, grp string, val long")
    nullsafe_key = lambda t: (  # noqa: E731
        t[0] is not None, t[0] or "", t[1] is not None, t[1] or 0
    )
    plain = sorted(
        [(r.grp, r.val)
         for r in curation.cap_per_group(df, "grp", "val", k=4).collect()],
        key=nullsafe_key,
    )
    pre = sorted(
        [(r.grp, r.val)
         for r in curation.cap_per_group(
             df, "grp", "val", k=4, hot_group_threshold=100
         ).collect()],
        key=nullsafe_key,
    )
    assert plain == pre
    # every group (incl. the NULL key) is capped at k and none vanished
    assert len(plain) == 4 * 4


def test_repetition_score_bounds(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    scored = curation.with_repetition_score(docs, n=2)
    assert (
        scored.where(
            (F.col("dup_ngram_frac") < 0) | (F.col("dup_ngram_frac") >= 1)
        ).count()
        == 0
    )
    short = spark.createDataFrame([(1, "oneword")], "doc_id long, text string")
    row = curation.with_repetition_score(short, n=2).collect()[0]
    assert row.dup_ngram_frac == 0.0


def test_repeated_span_removal_drops_only_corpus_dups(spark):
    # doc 1 and 2 share an identical 8-word span; doc 3 is unique
    span = "a b c d e f g h"
    df = spark.createDataFrame(
        [
            (1, span + " " + "u1 u2 u3 u4 u5 u6 u7 u8"),
            (2, span + " " + "v1 v2 v3 v4 v5 v6 v7 v8"),
            (3, "w1 w2 w3 w4 w5 w6 w7 w8"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in curation.repeated_span_removal(df, span_words=8).collect()
    }
    assert out[1].text_clean == "u1 u2 u3 u4 u5 u6 u7 u8"
    assert out[2].text_clean == "v1 v2 v3 v4 v5 v6 v7 v8"
    assert out[1].n_dropped == 1 and out[2].n_dropped == 1
    assert out[3].text_clean == "w1 w2 w3 w4 w5 w6 w7 w8"
    assert out[3].n_dropped == 0


def test_repeated_span_removal_all_dropped_gives_empty_text(spark):
    same = "x1 x2 x3 x4 x5 x6 x7 x8"
    df = spark.createDataFrame(
        [(1, same), (2, same)], "doc_id long, text string"
    )
    rows = curation.repeated_span_removal(df, span_words=8).collect()
    assert all(r.text_clean == "" and r.n_dropped == 1 for r in rows)


def test_shuffle_shards_is_balanced_total_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = curation.shuffle_shards(docs, "doc_id", n_shards=16)
    sizes = {r.shard: r.n for r in a.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    n_docs = docs.count()
    assert sum(sizes.values()) == n_docs
    # md5 buckets of a uniform key: no shard should be >2x the ideal share
    assert max(sizes.values()) <= 2 * (n_docs / 16) + 1
    # positions are a dense 1..n permutation within each shard
    dense = a.groupBy("shard").agg(
        F.count("*").alias("n"), F.max("pos").alias("mx"),
        F.countDistinct("pos").alias("nd"),
    )
    assert dense.where((F.col("mx") != F.col("n")) | (F.col("nd") != F.col("n"))).count() == 0
    # deterministic: second run identical
    b = curation.shuffle_shards(docs, "doc_id", n_shards=16)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_shuffle_shards_bucketed_rank_equals_single_window(spark, sf_dir):
    """The distributed rank (range-cut sub-buckets + offsets) must be
    bit-identical to the degenerate single-window rank at ANY bucket
    count — including one that doesn't divide the draw space evenly."""
    docs = load_table(spark, sf_dir, "documents")
    ref = curation.shuffle_shards(docs, "doc_id", n_shards=16, order_buckets=1)
    for nb in (7, 256):
        got = curation.shuffle_shards(
            docs, "doc_id", n_shards=16, order_buckets=nb
        )
        assert ref.exceptAll(got).count() == 0
        assert got.exceptAll(ref).count() == 0


def test_split_leakage_pairs_subset_and_labels(spark, sf_dir):
    """Leakage pairs are exactly the near-dup pairs whose sides get
    different train_test_split labels — checked against the full pair set
    and the split assignment recomputed independently."""
    from dask_hivemetastore_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    leaks = curation.split_leakage_pairs(
        docs, "doc_id", "text", test_frac=0.1, n=3, threshold=0.9
    ).collect()
    all_pairs = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.9).collect()
    }
    split = {
        r.doc_id: r.split
        for r in curation.train_test_split(docs, "doc_id", test_frac=0.1).collect()
    }
    expected = {(a, b) for (a, b) in all_pairs if split[a] != split[b]}
    assert {(r.doc_a, r.doc_b) for r in leaks} == expected
    assert expected  # fixture plants straddling pairs (4 at sf0.01)
    for r in leaks:
        assert r.split_a == split[r.doc_a] and r.split_b == split[r.doc_b]
        assert r.split_a != r.split_b


def test_weighted_sample_deterministic_and_scale_invariant(spark, sf_dir):
    """A-ES properties that hold exactly: the sample has exactly k rows,
    reruns are identical, and scaling ALL weights by a constant leaves the
    selection unchanged (u^(1/(cw)) is a monotone transform of u^(1/w))."""
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(
        r.doc_id
        for r in curation.weighted_sample_topk(docs, "doc_id", "n_chars", k=50).collect()
    )
    assert len(a) == 50
    b = sorted(
        r.doc_id
        for r in curation.weighted_sample_topk(docs, "doc_id", "n_chars", k=50).collect()
    )
    assert a == b
    scaled = docs.withColumn("w2", F.col("n_chars") * 7)
    c = sorted(
        r.doc_id
        for r in curation.weighted_sample_topk(scaled, "doc_id", "w2", k=50).collect()
    )
    assert a == c
    # the sample is length-biased: mean weight above the corpus mean
    chosen = docs.join(
        spark.createDataFrame([(i,) for i in a], "doc_id long"), "doc_id"
    )
    assert (
        chosen.agg(F.avg("n_chars")).first()[0]
        > docs.agg(F.avg("n_chars")).first()[0]
    )


def test_stratified_sample_exact_membership(spark, sf_dir):
    """Every keep/drop decision is re-derivable in pure Python from
    (salt, doc_id) — the engine-portability contract."""
    import hashlib

    from dask_hivemetastore_spark.catalog import load_table
    from dask_hivemetastore_spark.operators.curation import stratified_sample

    fracs = {"en": 0.25, "zh": 1.0, "es": 0.5, "de": 0.0}
    docs = load_table(spark, sf_dir, "documents")
    got = {r.doc_id for r in stratified_sample(docs, "lang", "doc_id", fracs).collect()}
    expected = set()
    for row in docs.select("doc_id", "lang").collect():
        if row.lang not in fracs:
            continue
        draw = int(hashlib.md5(f"strat:{row.doc_id}".encode()).hexdigest()[:8], 16) % 10000
        if draw < int(round(fracs[row.lang] * 10000)):
            expected.add(row.doc_id)
    assert got == expected
    assert len(got) > 0


def test_stratified_sample_rejects_bad_fraction(spark, sf_dir):
    import pytest as _pytest

    from dask_hivemetastore_spark.catalog import load_table
    from dask_hivemetastore_spark.operators.curation import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    with _pytest.raises(ValueError):
        stratified_sample(docs, "lang", "doc_id", {"en": 1.5})


def test_lm_quality_scores_hand_computed(spark):
    """Add-one smoothing on a 3-word reference: scores match a hand
    calculation, OOV words price as ln(1/(N+V+1))."""
    import math

    from dask_hivemetastore_spark.operators.text import lm_quality_scores

    ref = spark.createDataFrame([(0, "a a b")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "a b"), (2, "zz a")], "doc_id long, text string"
    )
    # N=3 total, V=2 vocab -> denom 6; lp(a)=ln(3/6), lp(b)=ln(2/6), oov=ln(1/6)
    rows = {r.doc_id: r for r in lm_quality_scores(corpus, ref).collect()}
    exp1 = round((math.log(3 / 6) + math.log(2 / 6)) / 2, 6)
    exp2 = round((math.log(1 / 6) + math.log(3 / 6)) / 2, 6)
    assert rows[1].n_words == 2 and abs(rows[1].xent - exp1) < 1e-9
    assert rows[2].n_words == 2 and abs(rows[2].xent - exp2) < 1e-9


# ---------------------------------------------------------------------------
# r14: per-source calibration skew path (VERDICT r13 missing #5)
# ---------------------------------------------------------------------------


def test_percent_rank_top_prefiltered_exact_on_skew(spark):
    """percent_rank_top_prefiltered reproduces the plain window's
    percent_rank EXACTLY for every row at or above the cutoff, on a
    synthetic 80%-one-group skew with score ties — the gated set, its
    pct values, and the per-group minimum kept score all match; a
    single-row group gets pct 0 (Spark's own convention)."""
    from pyspark.sql import Window

    rows = (
        [(i, "hot", float((i * 7919) % 997) / 997) for i in range(8000)]
        + [(100_000 + i, "cold", float(i)) for i in range(40)]
        + [(200_000, "single", 0.5)]
    )
    df = spark.createDataFrame(rows, "id long, grp string, score double")

    w = Window.partitionBy("grp").orderBy("score", "id")
    plain = {
        (r.grp, r.id): r.pct
        for r in df.withColumn("pct", F.percent_rank().over(w))
        .where(F.col("pct") >= 0.8)
        .collect()
    }
    pre_df = curation.percent_rank_top_prefiltered(
        df, "score", "grp", "id", 0.8, hot_group_threshold=100
    )
    pre = {
        (r.grp, r.id): r.pct
        for r in pre_df.where(F.col("pct") >= 0.8).collect()
    }
    assert pre == plain  # exact same kept set AND exact same pct values
    # the hot group's windowed set actually shrank (the point of the path)
    n_surv = pre_df.where(F.col("grp") == "hot").count()
    assert n_surv < 8000 * 0.3  # ~20% + approx slack, far below the full sort
    # single-row group: pct 0, below the gate, consistent with plain
    single = pre_df.where(F.col("grp") == "single").collect()
    assert len(single) == 1 and single[0].pct == 0.0


def test_quality_calibrate_prefiltered_identical_to_plain(spark, sf_dir):
    """The registered hot-source calibration key returns row-for-row the
    plain key's answer on the fixture (threshold engaged: every fixture
    source exceeds 50 docs at sf0.001+)."""
    from dask_hivemetastore_spark import plans

    plain = plans.QUERIES["quality_calibrate_by_source"](spark, sf_dir)
    pre = plans.QUERIES["quality_calibrate_prefiltered"](spark, sf_dir)
    assert plain.columns == pre.columns
    assert plain.exceptAll(pre).count() == 0
    assert pre.exceptAll(plain).count() == 0
