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
#      sf0.01 plus the local driver-sim pre-flight script so oracle
#      dialect bugs surface locally, never in the driver.
#
# History: r1 certified keys 1–50 of module order (TPC-H + relational);
# r2–r4 certified the 50 family representatives listed in git history of
# this file. Union after r4: 100 of 184 keys (see VERDICT.md r4); r5
# rotated all 50 slots to never-certified keys → union 150 of 185.
# Round 6 held the FINAL 38 never-certified full-oracle keys + the 7
# queries new in r6 (policy #2) + re-certifications of keys whose
# implementation changed that round — after r6 the r1–r6 union covers
# every full-oracle key (195/196 green; embedding_group_centroid was
# the one red row, a driver-canonicalizer array-column failure).
# Round 7 certified the 12 new/changed keys of that round plus drift
# re-certification of the r1 window — CORRECTNESS_r07: 50/50 green.
# Round 8 certified the 15 keys r7 flagged as driver-stale + 7
# hostile-corpus-fix keys + drift re-certification of most of the r2
# window — CORRECTNESS_r08: 50/50 green (see git history of this file
# for the full r8 list).
# Round 9 certified the post-r8-freeze changed keys, the 8 deferred r2
# keys, the r1 window, and the first r5 drift block — CORRECTNESS_r09:
# 50/50 green (see git history of this file for the full list).
# Round 10 (this window): blocks 1/1b = the 21 keys whose contracts
# changed this round (8 newly-derived full oracles, 8 hostile-FORMAT/
# extended-NUMERIC gate fixes, 5 hostile-EMBEDDINGS declared-dim
# eligibility keys); block 2 = the ENTIRE remaining r5-vintage drift
# tail (23 keys, newest driver rows 5 rounds old); block 3 = the 6
# oldest r6-vintage keys. After r10, no driver row predates r6 and 25
# r6 stragglers remain (named in the block-3 comment) for r11.
# STANDING OUTPUT DISCIPLINE: no registered query may return a
# top-level array/map/struct column — the driver's canonicalizer
# sort_values over raw columns and cannot sort list cells (r6's only
# red row). Explode to scalar rows or cast to a canonical string.
# ---------------------------------------------------------------------------
_CERTIFICATION_PRIORITY = [
    # --- r10 block 1 (changed-keys re-cert rule): eight previously
    # --- rows-only keys gained DERIVED full oracles this round
    # --- (sketch-guarantee verdict columns / exact-rerank brute oracle),
    # --- and the r10 hostile-FORMAT + extended hostile-NUMERIC gates
    # --- changed eight engine/oracle contracts (CSV escape protocol,
    # --- XML entity-escape + absent-element NULLs + C0 class, CDC/q9
    # --- DECIMAL-collapse cent pins, pandas dropna NULL-key contract,
    # --- crosstab positional rename, __HIVE_DEFAULT_PARTITION__ fold,
    # --- empty-write declared-schema read-back). ---
    "quantile_approx_value",
    "hll_sketch_merge",
    "cms_heavy_hitters",
    "knn_ivf_topk",
    "knn_pq_topk",
    "approx_distinct_users",
    "sample_fraction",
    "sample_stratified",
    "csv_roundtrip_agg",
    "xml_parse_orders",
    "cdc_apply_changes",
    "q9_product_profit",
    "pandas_api_groupby",
    "crosstab_status_segment",
    "compact_partition_scoped",
    "parquet_partitioned_roundtrip",
    # --- r10 block 1b (changed-keys rule, late r10): the hostile-
    # --- EMBEDDINGS gate gave the vector family its declared-dim
    # --- eligibility contract — engine finite_vectors(dim) + explicit
    # --- oracle predicate — and the quantize oracle its unquantizable-
    # --- row CASE. knn_ivf/pq re-certify above; these five changed too. ---
    "embedding_near_pairs",
    "dedup_embedding_components",
    "knn_cosine_topk",
    "knn_join_batch",
    "embedding_quantize_roundtrip",
    # --- r10 block 2: the r5-vintage drift tail — every key whose
    # --- newest driver row still dates to round 5 (VERDICT r9 missing
    # --- #1; q9/pandas_api_groupby moved into block 1 above). ---
    "domain_cap_prefiltered",
    "interpolate_hourly_events",
    "interval_order_span_ym",
    "interval_user_span",
    "lang_id_docs",
    "map_arrow_net_price",
    "observed_write_metrics",
    "paginate_orders",
    "parameterized_sql_orders",
    "parquet_schema_evolution",
    "persist_cache_agg",
    "q13_customer_distribution",
    "q21_suppliers_waiting",
    "q2_min_cost_supplier",
    "q8_market_share",
    "recursive_month_spine",
    "stream_foreach_batch_snapshot",
    "stream_observe_metrics",
    "stream_static_enrich",
    "table_diff_snapshots",
    "try_arithmetic_safety",
    "udtf_polymorphic_firstwords",
    "window_rank_kinds",
    # --- r10 block 3: drift re-certification, oldest r6-vintage keys
    # --- (alphabetical prefix of the 31 r6 stragglers;
    # --- compact_partition_scoped re-certifies in block 1). The
    # --- remaining 25 — mad_robust_outliers, ngram_freq_top,
    # --- null_safe_join, posexplode_words, price_histogram (displaced
    # --- by the five late embedding-contract keys), q11, q12, q16, q20, quality_score_docs,
    # --- range_join_longtail_points, regression_price_qty,
    # --- repetition_score_docs, rollup_grouping_id, row_ids_unique,
    # --- sample_k_per_group, sorted_layout_roundtrip,
    # --- statestore_event_counts, tfidf_top_terms,
    # --- timestamp_parse_roundtrip, token_count_docs,
    # --- union_mismatched_schemas, weighted_sample_docs,
    # --- window_price_band, zorder_layout_roundtrip — defer to r11
    # --- (three were displaced when approx_distinct_users/sample_*
    # --- gained oracles late in r10), after which no driver row
    # --- predates r7. ---
    "array_set_ops",
    "cohort_retention_weekly",
    "dedup_exact_selfunion",
    "explode_words_top",
    "fuzzy_match_nations",
    "lm_quality_score_docs",
]

# The r5 window (see git history of this file) was fully certified in
# CORRECTNESS_r05.json. After the r6 window runs, NO full-oracle key
# remains never-certified (the rows-only keys stay outside by policy #4).


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
