"""Adversarial text-corpus pass over the K-operators (VERDICT r7 #5).

r7's text-serde fix showed the input-edge class is live: operators and
oracles can agree on clean prose and diverge on hostile input. This test
swaps ``documents.parquet`` for a corpus of edge-case texts — embedded
\\x01/\\t/newlines, a literal ``\\N``, empty and whitespace-only strings,
astral-plane unicode, composed-vs-decomposed accents, 1-char and
100k-char docs, NULL text, PII patterns, exact+near duplicate pairs —
then replays the REGISTERED K-family queries against their REGISTERED
DuckDB oracles on that corpus. Any divergence is an engine-semantics gap
the fixed-corpus parity sweep could never see; the row that exposes it
becomes a permanent regression pin by staying in this corpus.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from .conftest import SF_SMOKE
from .oracle_harness import compare

# texts chosen so every hostile class appears; near-dup and exact-dup
# pairs make the dedup keys non-trivial on this corpus
_TEXTS: list[str | None] = [
    "",                                       # 0: empty string (a value!)
    "a",                                      # 1: single char
    "   \t  \n ",                             # 2: whitespace-only
    "col1\x01col2\x01col3",                   # 3: Hive delimiter bytes
    "tab\tseparated\tfields here",            # 4: embedded tabs
    "line one\nline two\nline three",         # 5: embedded newlines
    "\\N",                                    # 6: literal backslash-N
    "emoji soup \U0001f600\U0001f680 and \U0001d54a math",  # 7: astral
    "café composed",                     # 8: composed accent
    "café decomposed",                  # 9: combining accent
    "the quick brown fox jumps over the lazy dog " * 2300,  # 10: ~100k chars
    "word " * 400,                            # 11: pathological repetition
    "reach me at alice@example.com or 123-45-6789 ok",      # 12: PII
    'quotes "inside" and \\backslash\\ and \'single\'',     # 13: quoting
    "the quick brown fox jumps over the lazy dog",          # 14: dup A
    "the quick brown fox jumps over the lazy dog",          # 15: dup A'
    "the quick brown fox jumped over the lazy dog",         # 16: near-dup
    None,                                     # 17: NULL text
    "中文文本混合 mixed with english words",  # 18
    "ALL CAPS SHOUTING TEXT WITH NUMBERS 12345 67890",      # 19
    "punctuation!!! ??? ;;; ::: ,,,, ....",   # 20
    "x",                                      # 21: another 1-char
    "semi\x01colon\tand\nnewline all in one \\N doc",       # 22: combo
    "normal looking document with ordinary sentence structure.",  # 23
    "﻿BOM prefixed document text",       # 24: byte-order mark
    "windows\r\nline\r\nendings here",        # 25: CRLF
    "zero​width‌joiners‍ here",  # 26: ZW chars
    "  leading and trailing spaces  ",        # 27: pad
]

_KEYS = [
    "dedup_exact",
    "dedup_near",
    "dedup_near_minhash",
    "dedup_near_survivors",
    "text_stats_docs",
    "lang_id_docs",
    "quality_score_docs",
    "token_count_docs",
    "doc_fingerprint",
    "tfidf_top_terms",
    "ngram_freq_top",
    "doc_chunk_windows",
    "repetition_score_docs",
    "decontaminate_docs",
    "decontaminate_fuzzy_docs",  # r14: exact-verified Jaccard oracle
    "quality_percentile_gate",
    "train_test_split_docs",
    "lm_quality_score_docs",
    "pii_redact_docs",
    "bm25_rank_docs",
    "collated_distinct_words",
    "span_dedup_docs",
    "multimodal_extract",
    # r8 extension: the remaining document-centric full-oracle keys
    "dedup_exact_selfunion",
    "dedup_incremental_batch",
    "token_pack_docs",
    "domain_cap_docs",
    "domain_cap_prefiltered",
    "decontaminate_digest_docs",
    "stratified_sample_docs",
    "weighted_sample_docs",
    "corpus_rebalance_sources",
    "corpus_rebalance_temperature",
    "interleave_sources_rr",
    "corpus_shuffle_shards",
    "split_leakage_audit",
    "training_corpus_pipeline",
    "multimodal_frame_sample",
]


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory) -> str:
    """A testdata dir whose documents.parquet is the hostile corpus; every
    other table symlinks to sf0.001 so any registered query can run."""
    d = tmp_path_factory.mktemp("hostile_sf")
    pdf = pd.DataFrame(
        {
            "doc_id": pd.array(range(len(_TEXTS)), dtype="int64"),
            "text": pd.array(_TEXTS, dtype="object"),
            "lang": [["en", "de", "fr", "es", "zh"][i % 5]
                     for i in range(len(_TEXTS))],
            "source": [f"src{i % 4}" for i in range(len(_TEXTS))],
            "n_chars": pd.array(
                [len(t) if t is not None else 0 for t in _TEXTS],
                dtype="int64",
            ),
        }
    )
    pdf.to_parquet(d / "documents.parquet", index=False)
    for f in os.listdir(SF_SMOKE):
        if f != "documents.parquet":
            os.symlink(os.path.join(SF_SMOKE, f), d / f)
    return str(d)


@pytest.fixture(scope="module")
def hostile_duck(hostile_dir):
    import duckdb

    from dask_hivemetastore_spark.catalog import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{hostile_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", _KEYS)
def test_hostile_corpus_parity(key, spark, hostile_dir, hostile_duck):
    from dask_hivemetastore_spark import plans

    sdf = plans.QUERIES[key](spark, hostile_dir)
    problems = compare(key, sdf, hostile_duck.sql(plans.ORACLES[key]))
    assert not problems, "\n".join(problems)
