"""Driver-checkable query registry.

Importing this package registers every implemented query (SURVEY.md §2's
inventory) into :mod:`.registry`. ``__spark_entry__.py`` re-exports the
result as the driver contract.
"""

from . import registry  # noqa: F401

# Import order is load order; each module registers its queries on import.
from . import tpch  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import windows  # noqa: F401,E402
from . import events  # noqa: F401,E402
from . import udf_surface  # noqa: F401,E402
from . import llm  # noqa: F401,E402
from .. import streaming  # noqa: F401,E402

# ---------------------------------------------------------------------------
# Certification window ordering — STANDING ROTATION POLICY (round 5+).
#
# The driver's CORRECTNESS gate checks the first 50 registry keys in
# iteration order. The local parity suite (tests/test_oracle_parity.py)
# runs the IDENTICAL rows+schema+hash compare against DuckDB for all
# registered full-oracle keys, but the brief's bar is a hard driver row
# per operator — so the window is a rotating certification budget, not a
# fixed showcase. Policy, applied every round:
#
#   1. Any key certified green in ≥1 prior round's CORRECTNESS_r*.json is
#      eligible to rotate OUT (its certification is on record; the local
#      suite keeps guarding it).
#   2. Every NEW query lands in the window the round it is added.
#   3. Remaining slots go to never-certified full-oracle keys, oldest
#      first, spread across SURVEY §2 families.
#   4. Rows-only keys stay outside — the driver's rows-only check adds
#      nothing over the local suite.
#   5. Pre-flight before committing a reorder: the full parity suite at
#      sf0.01 plus a driver-sim run (.claude/skills/verify) so oracle
#      dialect bugs surface locally, never in the driver.
#
# History: r1 certified keys 1–50 of module order (TPC-H + relational);
# r2–r4 certified the 50 family representatives listed in git history of
# this file. Union after r4: 100 of 184 keys (see VERDICT.md r4). This
# round rotates ALL 50 slots to never-certified keys → union 150.
# ---------------------------------------------------------------------------
_CERTIFICATION_PRIORITY = [
    # --- TPC-H shapes never driver-certified (q1/3/5/6 etc. have rows) ---
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q13_customer_distribution",
    "q21_suppliers_waiting",
    # --- relational / state-mutating / layout surfaces ---
    "incremental_agg_merge",
    "cdc_apply_changes",
    "recursive_month_spine",
    "pandas_api_groupby",
    "try_arithmetic_safety",
    "parameterized_sql_orders",
    "paginate_orders",
    "median_mode_agg",
    "table_diff_snapshots",
    "persist_cache_agg",
    "observed_write_metrics",
    "parquet_schema_evolution",
    # --- window-function kinds beyond the certified rank/cumsum set ---
    "window_rank_kinds",
    "compact_small_files",  # NEW r5 — lands in-window (policy #2)
    "data_quality_report",  # NEW r5 — lands in-window (policy #2)
    # --- event-time surfaces (r4 additions + never-certified siblings) ---
    "events_date_parts",
    "range_join_banded",  # NEW r5 — lands in-window (policy #2)
    "interval_overlap_pairs",  # NEW r5 — lands in-window (policy #2)
    "asof_join_tolerance",
    "events_hourly_gapfill",
    "funnel_signup_purchase",
    "scd2_user_event_intervals",
    "sessionize_dynamic_gap",
    "interpolate_hourly_events",
    "interval_user_span",
    "interval_order_span_ym",  # NEW r5 — lands in-window (policy #2)
    # --- Arrow/UDF surfaces beyond the certified J1–J6 representatives ---
    "map_arrow_net_price",
    "grouped_arrow_minmax",
    "udtf_polymorphic_firstwords",
    # --- K-operators: the r4 additions + never-certified family members ---
    "span_dedup_docs",
    "weighted_sample_docs",  # NEW r5 — lands in-window (policy #2)
    "decontaminate_digest_docs",  # NEW r5 — lands in-window (policy #2)
    "corpus_shuffle_shards",
    "domain_cap_docs",
    "domain_cap_prefiltered",  # NEW r5 — lands in-window (policy #2)
    "bm25_rank_docs",
    "token_pack_docs",
    "dedup_embedding_components",
    "lang_id_docs",
    "split_leakage_audit",  # NEW r5 — lands in-window (policy #2)
    # --- streaming variants beyond the certified I4–I7 set ---
    "stream_sessionize",
    "stream_static_enrich",
    "stream_sliding_30m",
    "stream_foreach_batch_snapshot",
    "stream_observe_metrics",  # NEW r5 — lands in-window (policy #2)
]
# Still never-certified after this round (round-6 window candidates, 37):
# mad_robust_outliers, cohort_retention_weekly, crosstab_status_segment,
# sample_k_per_group, window_value_funcs,
# window_price_band, q11/q12/q16/q20, agg_misc, array_set_ops,
# union_mismatched_schemas,
# posexplode_words, timestamp_parse_roundtrip, row_ids_unique,
# price_histogram, regression_price_qty, nations_per_region_csv,
# rollup_grouping_id, fuzzy_match_nations, null_safe_join,
# sorted_layout_roundtrip, zorder_layout_roundtrip, explode_words_top,
# dedup_exact_selfunion, quality_score_docs, token_count_docs,
# doc_fingerprint, tfidf_top_terms, ngram_freq_top, doc_chunk_windows,
# multimodal_frame_sample, embedding_group_centroid, repetition_score_docs,
# corpus_rebalance_sources, corpus_rebalance_temperature,
# interleave_sources_rr — plus the rows-only keys (policy #4).


def _reorder_for_certification() -> None:
    """Rebuild the registry dicts with priority keys first, rest in order."""
    for table in (registry.QUERIES, registry.ORACLES):
        prioritized = {
            k: table[k] for k in _CERTIFICATION_PRIORITY if k in table
        }
        prioritized.update(
            (k, v) for k, v in table.items() if k not in prioritized
        )
        table.clear()
        table.update(prioritized)


_reorder_for_certification()

QUERIES = registry.QUERIES
ORACLES = registry.ORACLES
