"""Deduplication operators (SURVEY.md §2-K K1/K2) — exact, n-gram Jaccard,
MinHash+LSH, SimHash, and connected-component canonicalization.

Ground truth: the documents fixture plants 25 near-duplicate pairs with
word-3-gram Jaccard >= 0.9 at sf0.01 (FIXTURES.md; pair (26,455) sits at
exactly 9/10, so the threshold is *inclusive*), and zero exact duplicates.

Scale design (100 TB):

- exact: hash-groupBy on a 256-bit content hash — one shuffle, no skew
  (hash keys are uniform).
- n-gram Jaccard (exact): inverted-index self-join on gram. The hot-gram
  problem (a gram shared by f docs emits f² candidate rows) is bounded by
  ``prune_df`` — grams in more than that many docs are dropped from
  *candidate generation only*; every surviving candidate is re-verified with
  the full gram sets, so pruning can only lose pairs whose overlap consists
  entirely of stop-grams (impossible at J >= 0.9 unless the threshold gram is
  itself hot). At web scale this + MinHash below is the standard recipe.
- MinHash+LSH: fixed-size signatures (128 perms), 32 bands × 4 rows →
  P[candidate | J=0.9] = 1-(1-0.9⁴)³² ≈ 1-1.6e-15 — misses are negligible
  and every candidate is exactly verified, so output equals the exact
  operator's with near-certainty while the join cost drops from Σf² over
  grams to Σf² over LSH buckets.
- components: iterative min-label propagation (small-join loop) — diameter
  of dup-clusters is tiny in practice; loop is driver-coordinated but all
  data-parallel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

MERSENNE_P = (1 << 61) - 1


def with_word_ngrams(df: DataFrame, text_col: str = "text", n: int = 3,
                     out_col: str = "grams",
                     nparts: int | None = None) -> DataFrame:
    """Attach the distinct word-``n``-gram set of ``text_col`` (JVM-side).

    Documents with fewer than ``n`` words are EXCLUDED — they cannot form an
    n-gram, and the DuckDB oracles exclude them the same way
    (``WHERE len(ws) >= n``). A whole-text fallback gram here would emit
    pairs the oracle lacks (round-1 ADVICE parity finding).

    The repartition between the split and the gram transform is load-
    bearing twice over: (1) it spreads the CPU-bound transform across the
    cluster even when the corpus arrives in few partitions; (2) the
    exchange is a projection-collapse barrier — without it Catalyst
    inlines ``__ws = split(text)`` into the transform lambda, re-running
    the split PER ARRAY ELEMENT (O(words²) per doc; measured 10× slower
    at sf0.1). One pass of raw text bytes through the shuffle is far
    cheaper, and the downstream inverted-index shuffle of exploded grams
    is ~n× larger anyway.
    """
    if nparts is None:
        # the df.rdd partition probe is illegal on a streaming frame —
        # streaming callers pass nparts explicitly (one shared gram
        # expression, not a copy that can drift; r7 review).
        # defaultParallelism (total cores), not the batch shuffle conf
        # (r17): this exchange exists to SPREAD a CPU-bound transform and
        # as a projection-collapse barrier; under a vanilla 200-partition
        # session the conf shredded a small corpus into 200 explicit
        # (AQE-uncoalescible) tasks. At scale the input partition count
        # dominates the max either way.
        nparts = max(
            int(df.sparkSession.sparkContext.defaultParallelism),
            df.rdd.getNumPartitions(),
        )
    concat = ", ".join(f"__ws[i+{j}]" for j in range(n))
    return (
        df.withColumn("__ws", F.split(F.col(text_col), " "))
        .where(F.size("__ws") >= n)
        .repartition(nparts)
        .withColumn(
            out_col,
            F.expr(
                f"array_distinct(transform(sequence(0, size(__ws)-{n}), "
                f"i -> concat_ws(' ', {concat})))"
            ),
        )
        .drop("__ws")
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """K1: keep the smallest id per identical content (content-hash groupBy).

    The sha2-256 hash keys the shuffle so arbitrarily long texts move once
    as 32 bytes + id; collision probability is negligible.
    """
    return (
        df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("__h"))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .drop("__h")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.9,
    prune_df: int | None = None,
) -> DataFrame:
    """K2 (exact): all pairs with word-n-gram Jaccard >= threshold, via
    frequency-ordered PREFIX FILTERING (the AllPairs/PPJoin bound).

    Any pair with J(A,B) >= t shares at least ``α = ⌈t·|A|⌉`` grams, so
    under one global total order (df ascending, gram hash as tiebreak) the
    smallest shared gram must sit inside each side's first
    ``|A| − α + 1`` grams — joining only those prefix postings is LOSSLESS
    for the threshold query while shrinking the inverted index ~(1−t)×
    and the candidate join ~(1−t)²× (at t=0.9: ~10× / ~100×). A length
    filter (``min ≥ t·max``) prunes further. Candidates are then verified
    on the FULL gram sets (``array_intersect``), so emitted Jaccards are
    exact — the filters only bound what gets verified.

    Rarest-first ordering also dissolves the hot-gram f² blowup: a
    stop-gram shared by f docs lands in prefixes only for docs with almost
    no rarer gram. ``prune_df`` remains as an optional extra bound on
    candidate generation (see module docstring for its recall argument);
    the default None is exact.

    Scale: one extra small aggregate (gram → df) and one row_number window
    per doc, both keyed by columns the join already shuffles on; the
    candidate join is the term that dominates at 100 TB and it is the term
    the prefix bound shrinks quadratically.
    """
    from pyspark.sql.window import Window

    # The gram table is referenced ~7× in this plan (postings, df counts,
    # prefix, both self-join sides, both verify sides); materialize it once
    # instead of recomputing the split+transform chain per reference
    # (measured 4× end-to-end at sf0.1). persist(), NOT localCheckpoint
    # (r11, VERDICT r10 missing #2): a checkpoint's RDDScanExec truncates
    # lineage, which blinded the scan-fingerprint gate for every key built
    # on this table (dedup_near, split_leakage_audit) — an InMemoryRelation
    # keeps the cache-build plan (FileScan + pruned ReadSchema) reachable
    # for plan audits, recomputes safely on executor loss at 100 TB where
    # a lost checkpoint block kills the job, and costs the same one
    # materialization. Lazy: nothing runs until the first action.
    grams = with_word_ngrams(df.select(id_col, text_col), text_col, n).persist()
    full = grams.select(
        F.col(id_col).alias("__id"),
        F.col("grams").alias("__g"),
        F.size("grams").alias("__n"),
    )
    # The inverted index, df counts, prefix windows, and candidate
    # self-join all key on the gram — carry it as an 8-byte xxhash64 int
    # instead of the ~3-word string (r7): every shuffle in the candidate
    # path shrinks ~3-4×, and int grouping/joining beats string. LOSSLESS
    # for the threshold query: a hash collision can only MERGE postings,
    # which adds candidate pairs; verification runs on the FULL STRING
    # gram sets below, so a false candidate (P ≈ pairs/2⁶⁴) is rejected
    # exactly and a real pair can never be lost (its shared gram's hash
    # is still shared). The frequency ordering heuristic is equally
    # unaffected: prefix LENGTH never depends on frequencies.
    inv = grams.select(
        F.col(id_col), F.size("grams").alias("__n"),
        F.explode(F.expr("transform(grams, g -> xxhash64(g))")).alias("gh"),
    )
    if prune_df is not None:
        hot = inv.groupBy("gh").count().where(F.col("count") > prune_df).select("gh")
        inv = inv.join(hot, "gh", "left_anti")
    gram_freq = inv.groupBy("gh").agg(F.count("*").alias("__df"))
    # α underestimated by an epsilon so FP error can never SHORTEN the
    # prefix (losing recall); a one-longer prefix only adds candidates.
    alpha = F.ceil(F.lit(threshold) * F.col("__n") - F.lit(1e-9))
    order = Window.partitionBy(id_col).orderBy(F.asc("__df"), F.asc("gh"))
    prefix = (
        inv.join(gram_freq, "gh")
        .withColumn("__rn", F.row_number().over(order))
        .where(F.col("__rn") <= F.col("__n") - alpha + 1)
        .select(id_col, "__n", "gh")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    length_ok = F.least(F.col("a.__n"), F.col("b.__n")) >= (
        F.lit(threshold) * F.greatest(F.col("a.__n"), F.col("b.__n")) - F.lit(1e-9)
    )
    cands = (
        a.join(
            b,
            (F.col("a.gh") == F.col("b.gh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & length_ok,
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )
    verified = (
        cands.join(
            full.select("__id", F.col("__g").alias("__ga"), F.col("__n").alias("na")),
            F.col("doc_a") == F.col("__id"),
        )
        .drop("__id")
        .join(
            full.select("__id", F.col("__g").alias("__gb"), F.col("__n").alias("nb")),
            F.col("doc_b") == F.col("__id"),
        )
        .drop("__id")
        .withColumn("shared", F.size(F.array_intersect("__ga", "__gb")).cast("long"))
    )
    j = F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
    return verified.where(j >= threshold).select(
        "doc_a", "doc_b", F.round(j, 6).alias("jaccard")
    )


def _minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE_P, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_band_buckets(
    grams: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
) -> DataFrame:
    """The MinHash signature + LSH banding stage of
    :func:`minhash_lsh_pairs`, exposed separately so scale harnesses can
    measure the candidate bound (``Σ C(bucket_size, 2)`` over
    (band, band_hash) groups) without duplicating the algorithm.

    Input is a ``with_word_ngrams`` frame; output one (id, band,
    band_hash) row per band per doc. Gram hashing happens in the JVM
    (``xxhash64`` inside a ``transform`` lambda — codegen'd, no Python
    per gram; r6 profiling showed per-gram ``blake2b`` in the Arrow
    batch loop dominating the whole LSH pipeline at 500 k docs). The
    Python stage is then pure numpy over the int64 hash arrays: one
    ``minimum.reduceat`` per permutation chunk across ALL docs in the
    Arrow batch — no per-doc Python loop either. Permutations are
    processed in chunks of 16 so the (chunk × total-grams) broadcast
    stays bounded (~16 × 2 M × 8 B = 256 MB worst case per 10 k-doc
    batch) regardless of batch gram count.
    """
    rows = num_perm // bands
    a_par, b_par = _minhash_params(num_perm)
    mix = np.uint64(0x9E3779B97F4A7C15)
    # NULL/empty gram arrays are excluded here, not just assumed away:
    # ``with_word_ngrams`` never emits them, but this is a documented
    # public entry point, and an empty segment would make the reduceat
    # below silently adopt the NEXT doc's first hash (or raise at
    # batch end) — a signature that LOOKS valid. No signature is the
    # only correct answer for a gram-less doc.
    hashed = grams.select(
        id_col, F.expr("transform(grams, g -> xxhash64(g))").alias("__gh")
    ).where(F.size("__gh") > 0)

    def sig_batches(batches):
        for pdf in batches:
            ndocs = len(pdf)
            if ndocs == 0:
                continue
            ids = pdf[id_col].to_numpy()
            lists = [np.asarray(g, dtype=np.int64) for g in pdf["__gh"]]
            lens = np.fromiter((len(g) for g in lists), dtype=np.int64,
                               count=ndocs)
            flat = np.concatenate(lists).view(np.uint64)
            offsets = np.zeros(ndocs, dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            sig = np.empty((ndocs, num_perm), dtype=np.uint64)
            for p0 in range(0, num_perm, 16):
                p1 = min(p0 + 16, num_perm)
                # (a*h + b) mod p per permutation (uint64 wrap, as before)
                hv = (a_par[p0:p1, None] * flat[None, :]
                      + b_par[p0:p1, None]) % MERSENNE_P
                sig[:, p0:p1] = np.minimum.reduceat(hv, offsets, axis=1).T
            # band hash: xor-multiply fold of each band's `rows` minima,
            # vectorized over (doc, band); >>1 keeps it positive-signed
            sigr = sig.reshape(ndocs, bands, rows)
            acc = np.zeros((ndocs, bands), dtype=np.uint64)
            for c in range(rows):
                acc = (acc ^ sigr[:, :, c]) * mix
            bh = (acc >> np.uint64(1)).astype(np.int64)
            yield pd.DataFrame({
                id_col: np.repeat(ids, bands),
                "band": np.tile(np.arange(bands, dtype=np.int32), ndocs),
                "band_hash": bh.reshape(-1),
            })

    return hashed.mapInPandas(
        sig_batches, f"{id_col} long, band int, band_hash long"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.9,
    num_perm: int = 128,
    bands: int = 32,
) -> DataFrame:
    """K2 (scalable): MinHash signatures → LSH banding → candidate pairs →
    exact Jaccard verification on the candidates.

    The signature stage is a vectorized pandas UDF (Arrow-batched numpy);
    banding and verification are JVM joins. Output is identical to
    :func:`ngram_jaccard_pairs` up to the (≈1e-15 per pair) LSH miss rate,
    so it shares the exact oracle.
    """
    # referenced by both the signature stage and the verify joins —
    # materialize once (see ngram_jaccard_pairs)
    grams = with_word_ngrams(df.select(id_col, text_col), text_col, n).localCheckpoint(
        eager=False
    )
    buckets = minhash_band_buckets(
        grams, id_col, num_perm=num_perm, bands=bands
    )
    l, r = buckets.alias("l"), buckets.alias("r")
    candidates = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("doc_a"), F.col(f"r.{id_col}").alias("doc_b"))
        .distinct()
    )
    full = grams.select(F.col(id_col).alias("__id"), F.col("grams").alias("__g"))
    verified = (
        candidates.join(full.withColumnRenamed("__g", "__ga"), F.col("doc_a") == F.col("__id"))
        .drop("__id")
        .join(full.withColumnRenamed("__g", "__gb"), F.col("doc_b") == F.col("__id"))
        .drop("__id")
        .withColumn("shared", F.size(F.array_intersect("__ga", "__gb")).cast("double"))
        .withColumn("uni", F.size("__ga") + F.size("__gb") - F.col("shared"))
    )
    j = F.col("shared") / F.col("uni")
    return verified.where(j >= threshold).select(
        "doc_a", "doc_b", F.round(j, 6).alias("jaccard")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    max_hamming: int = 6,
) -> DataFrame:
    """K2 (SimHash): 64-bit weighted-bit fingerprints; candidate pairs via
    4×16-bit band collisions, kept when hamming distance <= max_hamming.

    Registered rows-only — simhash similarity is not SQL-expressible for the
    oracle. At scale the band trick bounds the self-join exactly like LSH.

    Word hashing happens in the JVM (``xxhash64`` in a ``transform``
    lambda) like the MinHash path (r7); the Python stage is pure numpy —
    one ``add.reduceat`` of the ±1 bit matrix per 16-bit chunk across all
    docs in the Arrow batch, no per-doc Python loop. The signed-long
    storage convention (``uint64 sign-bit flip``) matches the banding and
    hamming expressions, which shift/XOR consistently either way.
    """
    # coalesce(NULL text → '') keeps the pre-r7 tolerance for null/odd
    # rows (split('') yields one empty word, so every doc still gets a
    # fingerprint and the numpy stage never sees a NULL array)
    # Column expressions, not an F.expr SQL string: interpolating
    # text_col verbatim would break on names needing backticks (spaces,
    # keywords) — r8 review; the rest of the module is F.col-based too.
    hashed = df.select(
        id_col,
        F.transform(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
            lambda w: F.xxhash64(w),
        ).alias("__wh"),
    )

    def sim_batches(batches):
        shifts = np.arange(bits, dtype=np.uint64)
        powers = np.uint64(1) << shifts
        for pdf in batches:
            ndocs = len(pdf)
            if ndocs == 0:
                continue
            lists = [np.asarray(g, dtype=np.int64) for g in pdf["__wh"]]
            lens = np.fromiter((len(g) for g in lists), dtype=np.int64,
                               count=ndocs)
            flat = np.concatenate(lists).view(np.uint64)
            offsets = np.zeros(ndocs, dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            # per-doc ±1 sums per bit position, 16 bit-columns at a time
            # to bound the (total_words × chunk) int64 intermediate
            acc = np.empty((ndocs, bits), dtype=np.int64)
            for b0 in range(0, bits, 16):
                b1 = min(b0 + 16, bits)
                bm = ((flat[:, None] >> shifts[None, b0:b1])
                      & np.uint64(1)).astype(np.int64)
                acc[:, b0:b1] = np.add.reduceat(2 * bm - 1, offsets, axis=0)
            sh = ((acc > 0).astype(np.uint64) * powers[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                # flip the sign bit == subtract 2^63: store as signed long
                "simhash": (sh ^ np.uint64(1 << 63)).view(np.int64),
            })

    sigs = hashed.mapInPandas(sim_batches, f"{id_col} long, simhash long")
    banded = sigs.select(
        id_col, "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.expr(f"(CAST(simhash AS BIGINT) >> {i * 16}) & 65535").alias("bh"))
            for i in range(4)
        ])).alias("bb"),
    ).select(id_col, "simhash", "bb.band", "bb.bh")
    l, r = banded.alias("l"), banded.alias("r")
    pairs = (
        l.join(r, (F.col("l.band") == F.col("r.band")) & (F.col("l.bh") == F.col("r.bh"))
               & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .select(
            F.col(f"l.{id_col}").alias("doc_a"), F.col(f"r.{id_col}").alias("doc_b"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs


def connected_components(pairs: DataFrame, ids: DataFrame, id_col: str,
                         max_iter: int = 20) -> DataFrame:
    """Min-label propagation over the dup-pair graph → (id, component).

    Iterative small-join loop (the shape SURVEY.md §2-K K2 prescribes):
    every node adopts the smallest label among itself and its neighbors
    until fixpoint. Converges in O(component diameter) rounds — tiny for
    dup clusters; each round is one shuffle join.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        # materialize once: the pair-generation lineage above (often an
        # expensive similarity join) must not re-execute on every round
        .localCheckpoint(eager=True)
    )
    labels = ids.select(F.col(id_col).alias("node"), F.col(id_col).alias("comp"))
    changed = -1
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("comp").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select("node", F.least(F.col("comp"), F.coalesce("nmin", F.col("comp"))).alias("comp"))
        )
        # checkpoint BEFORE the convergence check so the round's join
        # lineage executes once, not once per downstream action
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        import warnings

        warnings.warn(
            f"connected_components did not converge within max_iter={max_iter} "
            f"rounds ({changed} labels still changing) — returned components "
            "may be split; raise max_iter (component diameter exceeds it)",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("node").alias(id_col), F.col("comp").alias("component"))


# --------------------------------------------------- incremental (vs corpus)

def ngram_jaccard_probe(probe: DataFrame, corpus: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 3, threshold: float = 0.9) -> DataFrame:
    """Near-dup pairs (probe_doc, corpus_doc, jaccard ≥ t) WITHOUT any
    corpus×corpus work — the incremental-ingest shape: a new batch probes
    an existing (already-deduped) corpus, so the candidate join must be
    |probe|-proportional, never |corpus|².

    Asymmetric prefix filtering: only the PROBE side is prefix-truncated
    (first ``|A| − ⌈t·|A|⌉ + 1`` grams under a rarest-first total order by
    corpus document frequency); the corpus side contributes its FULL
    inverted index. Lossless by pigeonhole: J(A,B) ≥ t forces
    ``|A∩B| ≥ ⌈t·|A|⌉`` shared grams, and if every one of them sat outside
    A's prefix there would be at most ``⌈t·|A|⌉ − 1`` of them —
    contradiction; the corpus side being full means any shared
    prefix-gram is found. The symmetric bound
    (:func:`ngram_jaccard_pairs`) prunes harder but requires prefixes on
    BOTH sides under one global order — fine for a one-shot self-join,
    wrong for ingest where the corpus index is built once and reused.
    Candidates pass a length filter (``t·|A| ≤ |B| ≤ |A|/t``) and exact
    full-gram-set verification, so emitted Jaccards are exact.

    Scale: the corpus is read once to build (gram → id, |B|) postings —
    in production that index is the persisted artifact, amortized over
    every arriving batch — and per batch only probe-prefix grams (a
    ``(1−t)`` fraction) shuffle against it.
    """
    from pyspark.sql.window import Window

    gp = with_word_ngrams(probe.select(id_col, text_col), text_col, n).localCheckpoint(
        eager=False
    )
    gc = with_word_ngrams(corpus.select(id_col, text_col), text_col, n).localCheckpoint(
        eager=False
    )
    # Postings carry xxhash64(gram) ints, not gram strings — same
    # lossless-superset argument as ngram_jaccard_pairs (collisions only
    # add candidates; exact verification below runs on string gram sets).
    # For the persisted-index production shape this also makes the
    # artifact ~3-4× smaller on disk and in every probe shuffle.
    inv_c = gc.select(
        F.col(id_col).alias("__cid"),
        F.size("grams").alias("__nb"),
        F.explode(F.expr("transform(grams, g -> xxhash64(g))")).alias("gh"),
    )
    df_tbl = inv_c.groupBy("gh").agg(F.count("*").alias("__df"))
    inv_p = gp.select(
        F.col(id_col).alias("__pid"),
        F.size("grams").alias("__na"),
        F.explode(F.expr("transform(grams, g -> xxhash64(g))")).alias("gh"),
    ).join(df_tbl, "gh", "left").na.fill({"__df": 0})
    w = Window.partitionBy("__pid").orderBy(F.asc("__df"), F.asc("gh"))
    # the 1e-9 epsilons mirror ngram_jaccard_pairs' alpha guard: FP error in
    # threshold·|A| (0.9·10 evaluates to 9.000000000000002) must never
    # SHORTEN the prefix or TIGHTEN the length filter — either would drop
    # exact-boundary pairs (J == t); erring the other way only adds
    # candidates, which exact verification removes
    alpha = F.ceil(threshold * F.col("__na") - F.lit(1e-9))
    prefix = (
        inv_p.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= F.col("__na") - alpha + 1)
        .select("__pid", "__na", "gh")
    )
    cand = (
        prefix.join(inv_c, "gh")
        .where(
            (F.col("__nb") >= F.ceil(threshold * F.col("__na") - F.lit(1e-9)))
            & (F.col("__nb")
               <= F.floor(F.col("__na") / threshold + F.lit(1e-9)))
        )
        .select("__pid", "__cid")
        .distinct()
    )
    full_p = gp.select(F.col(id_col).alias("__pid"), F.col("grams").alias("__ga"))
    full_c = gc.select(F.col(id_col).alias("__cid"), F.col("grams").alias("__gb"))
    verified = (
        cand.join(full_p, "__pid")
        .join(full_c, "__cid")
        .withColumn("shared", F.size(F.array_intersect("__ga", "__gb")).cast("double"))
        .withColumn("uni", F.size("__ga") + F.size("__gb") - F.col("shared"))
    )
    j = F.col("shared") / F.col("uni")
    return verified.where(j >= threshold).select(
        F.col("__pid").alias("probe_id"),
        F.col("__cid").alias("corpus_id"),
        F.round(j, 6).alias("jaccard"),
    )


def dedup_incremental(new: DataFrame, old: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      threshold: float = 0.9) -> DataFrame:
    """Dedup a NEW batch against an existing corpus: (1) exact dedup
    WITHIN the batch (min-id survivor per identical text), (2) exact
    anti-join against the corpus on the text hash (sha2-256 — the corpus
    side reduces to a distinct hash set, broadcastable for most corpora,
    and never rescans old×old), (3) near-dedup probe against the corpus
    via :func:`ngram_jaccard_probe`. Returns the surviving new rows.

    Near-dups WITHIN the batch are the standing operators' job
    (:func:`ngram_jaccard_pairs` + components on the batch alone); this
    operator owns the batch-vs-corpus boundary, which is the part that
    must not scale with corpus².
    """
    surv_ids = exact_dedup(new, id_col, text_col=text_col).select(id_col)
    in_batch = new.join(surv_ids, id_col, "left_semi")
    old_h = old.select(F.sha2(F.col(text_col), 256).alias("__h")).distinct()
    exact_kept = in_batch.join(
        old_h, F.sha2(F.col(text_col), 256) == F.col("__h"), "left_anti"
    )
    near_bad = (
        ngram_jaccard_probe(
            exact_kept, old, id_col, text_col, n=n, threshold=threshold
        )
        .select(F.col("probe_id").alias(id_col))
        .distinct()
    )
    return exact_kept.join(near_bad, id_col, "left_anti")
