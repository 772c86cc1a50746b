"""Text-analysis operators (SURVEY.md §2-K K4): language ID, quality
scoring, token counting, fingerprinting.

All hot paths are JVM builtins over the split word array (no Python); every
operator is deterministic so it can be oracle-checked, including language ID
(a fixed-lexicon voting heuristic — the honest version of what n-gram
language ID does, minus learned weights, so the same rule is expressible in
SQL for the oracle).

Scale: each operator is a narrow per-row projection — no shuffle at all
until the caller aggregates; they compose with partition-pruned scans and
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny, fixed function-word lexicons. Order = tie-break priority.
LANG_LEXICONS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "es": ["el", "la", "los", "que", "es", "una"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "zh": ["的", "是", "了", "在", "和"],
}


def _words(text_col: str) -> Column:
    return F.split(F.lower(F.col(text_col)), " ")


def _hits(ws: Column, lexicon: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in lexicon])
    return F.size(F.filter(ws, lambda w: F.array_contains(arr, w)))


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Language-ID heuristic: function-word votes per language, argmax with
    fixed priority order, 'und' when no lexicon hits."""
    ws = _words(text_col)
    hit_cols = {lang: _hits(ws, lex) for lang, lex in LANG_LEXICONS.items()}
    langs = list(LANG_LEXICONS)
    pred = F.lit("und")
    # build CASE from lowest priority upward so earlier langs win ties
    for lang in reversed(langs):
        others_before = langs[: langs.index(lang)]
        cond = hit_cols[lang] > 0
        for o in others_before:
            cond = cond & (hit_cols[lang] > hit_cols[o])
        for o in langs[langs.index(lang) + 1:]:
            cond = cond & (hit_cols[lang] >= hit_cols[o])
        pred = F.when(cond, lang).otherwise(pred)
    return df.withColumn(out_col, pred)


def lang_id_oracle_expr(text_col: str = "text") -> str:
    """DuckDB SQL expression mirroring :func:`lang_id` exactly."""
    ws = f"string_split(lower({text_col}), ' ')"
    hits = {
        lang: (
            f"len(list_filter({ws}, w -> list_contains("
            f"[{', '.join(repr(w) for w in lex)}], w)))"
        )
        for lang, lex in LANG_LEXICONS.items()
    }
    langs = list(LANG_LEXICONS)
    expr = "'und'"
    for lang in reversed(langs):
        conds = [f"{hits[lang]} > 0"]
        for o in langs[: langs.index(lang)]:
            conds.append(f"{hits[lang]} > {hits[o]}")
        for o in langs[langs.index(lang) + 1:]:
            conds.append(f"{hits[lang]} >= {hits[o]}")
        expr = f"CASE WHEN {' AND '.join(conds)} THEN '{lang}' ELSE {expr} END"
    return expr


# BPE-ish tokenizer regex: letter runs, digit runs, single other non-space.
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace and regex ("BPE-ish") token counts per document."""
    return df.withColumns(
        {
            "n_ws_tokens": F.size(F.split(F.col(text_col), " ")).cast("long"),
            "n_re_tokens": F.size(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_REGEX), 0)
            ).cast("long"),
        }
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality score from length / stopword / word-shape
    features. Pure rational arithmetic (+,-,*,/ plus least/abs — all exact
    IEEE) so raw doubles hash-match the oracle without rounding."""
    ws = _words(text_col)
    n = F.size(ws).cast("double")
    stop = _hits(ws, LANG_LEXICONS["en"]).cast("double")
    # single-space-separated text: total word chars = len - (n-1)
    avg_wl = (F.length(text_col).cast("double") - (n - 1)) / n
    distinct_ratio = F.size(F.array_distinct(ws)).cast("double") / n
    score = (
        F.lit(0.4) * F.least(n / 100.0, F.lit(1.0))
        + F.lit(0.3) * (stop / n)
        + F.lit(0.3) * (F.lit(1.0) - F.abs(avg_wl - 4.5) / 10.0)
    )
    return df.withColumns(
        {
            "n_tokens": n.cast("long"),
            "stopword_ratio": stop / n,
            "avg_word_len": avg_wl,
            "distinct_ratio": distinct_ratio,
            "quality_score": score,
        }
    )


# The bare score expression, exported separately so EVERY oracle that
# gates on quality interpolates the ONE definition (r7 review: the
# flagship pipeline oracle had hand-inlined a copy that would silently
# go stale on any tuning change to quality_features).
QUALITY_SCORE_ORACLE_EXPR = """0.4 * least(CAST(len(string_split(lower(text), ' ')) AS DOUBLE) / 100.0, 1.0)
  + 0.3 * (CAST(len(list_filter(string_split(lower(text), ' '),
        w -> list_contains(['the','a','of','and','to','in','is'], w))) AS DOUBLE)
        / len(string_split(lower(text), ' ')))
  + 0.3 * (1.0 - abs((CAST(length(text) AS DOUBLE)
        - (len(string_split(lower(text), ' ')) - 1))
        / len(string_split(lower(text), ' ')) - 4.5) / 10.0)"""

QUALITY_ORACLE_COLS = f"""
  CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
  CAST(len(list_filter(string_split(lower(text), ' '),
       w -> list_contains(['the','a','of','and','to','in','is'], w))) AS DOUBLE)
      / len(string_split(lower(text), ' ')) AS stopword_ratio,
  (CAST(length(text) AS DOUBLE) - (len(string_split(lower(text), ' ')) - 1))
      / len(string_split(lower(text), ' ')) AS avg_word_len,
  CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE)
      / len(string_split(lower(text), ' ')) AS distinct_ratio,
  {QUALITY_SCORE_ORACLE_EXPR} AS quality_score
"""


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fp") -> DataFrame:
    """Document fingerprint: md5 of the lowercased text. Identical bytes →
    identical hex in any engine, so it is the oracle-safe fingerprint; a
    locality-sensitive alternative (SimHash) lives in operators/dedup.py."""
    return df.withColumn(out_col, F.md5(F.lower(F.col(text_col))))


# ------------------------------------------------------------ PII redaction

# Redaction rules: (pattern, replacement token), applied in order. SSN before
# phone so the longer pattern wins its overlap with the shorter one.
PII_RULES: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\d{3}-\d{2}-\d{4}", "<SSN>"),
    (r"\d{3}-\d{4}", "<PHONE>"),
]


def pii_redact(df: DataFrame, text_col: str = "text",
               out_col: str = "redacted") -> DataFrame:
    """Mask emails / SSNs / phone-shaped substrings with typed placeholder
    tokens, attaching per-rule hit counts (``n_email`` / ``n_ssn`` /
    ``n_phone``) counted BEFORE replacement.

    Pure chained ``regexp_replace`` — per-row JVM projection inside
    whole-stage codegen, no shuffle, no Python, so it streams at scan speed
    over any corpus size. Each rule's hit count is taken on the text with
    every EARLIER rule already masked — the same progression the
    replacement chain applies — so the counts agree with what was actually
    redacted (r7 review: counting SSNs on unmasked text over-reported when
    an SSN-shaped substring sat inside an email address that the email
    rule had already swallowed).
    """
    masked = F.col(text_col)
    counts = {}
    for (pat, tok), name in zip(PII_RULES, ("n_email", "n_ssn", "n_phone")):
        counts[name] = F.regexp_count(masked, F.lit(pat))
        masked = F.regexp_replace(masked, pat, tok)
    # after the loop `masked` IS the fully-redacted text — one chain
    # serves both the counts and the output
    return (
        df.withColumn("n_email", counts["n_email"])
        .withColumn("n_ssn", counts["n_ssn"])
        .withColumn("n_phone", counts["n_phone"])
        .withColumn(out_col, masked)
    )


# -------------------------------------------------------------- BM25 ranking

def bm25_scores(df: DataFrame, terms: list[str], text_col: str = "text",
                id_col: str = "doc_id", k1: float = 1.2, b: float = 0.75,
                out_col: str = "bm25") -> DataFrame:
    """Okapi BM25 relevance to a bag of query ``terms`` — rows are emitted
    ONLY for documents containing at least one query term; absent docs
    score exactly 0 by the BM25 formula (tf = 0 for every term), so
    callers wanting a dense ranking left-join this back and
    ``coalesce(bm25, 0)``. Emitting the zero rows here would shuffle a
    corpus-sized result for no information (r7 review: the docstring used
    to promise "every document", which this sparse contract is not).

    Plan, scale-first:
    - term frequencies come from exploding ONLY query-term hits — the
      ``isin(terms)`` filter runs before the explode's output ever shuffles,
      so the grouped tf table is |terms| × matching docs, not corpus-sized;
    - corpus stats (N, avgdl) are one partial-agg scan reduced to a single
      row and ``crossJoin(broadcast(...))``-ed back (never ``.count()`` on
      the driver — no extra job, no second scan);
    - per-term document frequencies aggregate to |terms| rows and broadcast.
    The idf form is ln(1 + (N - df + 0.5)/(df + 0.5)) (always positive).
    Scores are rounded to 6 dp so cross-engine float summation agrees.
    """
    # the module's shared tokenizer — a drifting inline copy here would
    # silently disagree with lang_id/quality_features on what a word is
    docs = df.select(F.col(id_col), _words(text_col).alias("__ws"))
    stats = docs.agg(
        F.count("*").cast("double").alias("__n"),
        F.avg(F.size("__ws")).alias("__avgdl"),
    )
    tf = (
        docs.select(id_col, F.size("__ws").alias("__dl"),
                    F.explode("__ws").alias("__term"))
        .where(F.col("__term").isin(terms))
        .groupBy(id_col, "__term", "__dl")
        .agg(F.count("*").cast("double").alias("__tf"))
    )
    dft = tf.groupBy("__term").agg(
        F.countDistinct(id_col).cast("double").alias("__dft")
    )
    idf = F.log(F.lit(1.0) + (F.col("__n") - F.col("__dft") + 0.5)
                / (F.col("__dft") + 0.5))
    score = idf * F.col("__tf") * (k1 + 1) / (
        F.col("__tf") + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
    )
    return (
        tf.join(F.broadcast(dft), "__term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(score), 6).alias(out_col))
    )


def cms_word_sketch(df: DataFrame, text_col: str = "text",
                    eps: float = 0.0001, confidence: float = 0.99,
                    seed: int = 42):
    """One Count-Min sketch over every word of ``text_col`` — the
    mergeable approximate-frequency state (heavy hitters / frequency
    estimation without a per-key groupBy).

    ``F.count_min_sketch`` is an AGGREGATE: each partition builds its own
    fixed-size (w×d counters) sketch map-side and the buffers merge
    cell-wise — bytes shuffle, never word rows. At 100 TB that's the whole
    point: the exact word count would shuffle the full exploded word
    multiset; the sketch ships ~KBs per partition regardless of corpus
    size, and stored sketches re-merge across days/shards like the HLL
    twin (``hll_sketch_merge``). Deterministic for a fixed seed.

    Returns the serialized sketch as driver-side ``bytes``.
    """
    row = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("__w"))
        .agg(
            F.count_min_sketch(
                "__w", F.lit(float(eps)), F.lit(float(confidence)),
                F.lit(int(seed)),
            ).alias("__sk")
        )
        .first()
    )
    return bytes(row["__sk"])


def cms_estimate_counts(spark, sketch: bytes, items: list[str]) -> dict:
    """Point-query a serialized Count-Min sketch for ``items`` via the
    JVM ``org.apache.spark.util.sketch.CountMinSketch`` reader (Spark
    exposes the build aggregate in SQL but no estimate function — the
    sketch is meant to be read back where it's consumed).

    CMS guarantees: estimate >= true count always (hash collisions only
    ADD), and estimate <= true + eps·N with probability >= confidence —
    both asserted in tests/test_operators.py against exact counts.
    """
    jvm = spark._jvm
    bis = jvm.java.io.ByteArrayInputStream(sketch)
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    return {it: int(cms.estimateCount(it)) for it in items}


def lm_quality_scores(df: DataFrame, ref: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """LM-perplexity quality scoring, the CCNet recipe (Wenzek et al. 2020)
    with the heavy LM swapped for its deterministic core: score every
    document by its per-word cross-entropy under a unigram language model
    trained on a REFERENCE corpus (CCNet uses Wikipedia; callers pass any
    trusted slice). Documents whose word distribution diverges from the
    reference (boilerplate, gibberish, wrong-language residue) score a
    high cross-entropy and get filtered/bucketed downstream — the standard
    model-based quality gate between heuristics and a real LM.

    Model: add-one smoothing over the reference vocab,
    ``lp(w) = ln((c_w + 1) / (N + V + 1))``; unseen words get
    ``ln(1 / (N + V + 1))``. Trained and applied in one DataFrame plan —
    no separate fit step, no Python.

    Scale (100 TB):
    - training pass = one groupBy over reference words (map-side partial
      aggregation; the reference is a curated slice, orders smaller than
      the corpus);
    - scoring pass = explode + **broadcast** hash join against the vocab
      (web-scale vocab: truncate to top-M words first — every word below
      the cut scores as unseen, which the smoothing already prices) +
      per-doc re-aggregation that reuses the explode's doc grouping;
    - the (N, V) totals ride a broadcast 1-row aggregate, the same shape
      as bm25's corpus-stats row.

    Cross-entropy is ROUNDed to 6 dp — sums of ~1e2 doubles in different
    orders and a ≤1-ulp libm ``ln`` divergence sit ~1e-14 away, so the
    rounded value is engine-stable.

    Returns (id_col, n_words, xent) — one row per scored document.
    """
    ref_words = ref.select(F.explode(_words(text_col)).alias("w"))
    cnt = ref_words.groupBy("w").agg(F.count("*").alias("__c"))
    tot = cnt.agg(F.sum("__c").alias("__n"), F.count("*").alias("__v"))
    words = df.select(id_col, F.explode(_words(text_col)).alias("w"))
    lp = F.log(
        (F.coalesce(F.col("__c"), F.lit(0)).cast("double") + 1.0)
        / (F.col("__n") + F.col("__v") + 1.0)
    )
    return (
        words.join(F.broadcast(cnt), "w", "left")
        .crossJoin(F.broadcast(tot))
        .select(id_col, lp.alias("__lp"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.round(F.avg("__lp"), 6).alias("xent"),
        )
    )
