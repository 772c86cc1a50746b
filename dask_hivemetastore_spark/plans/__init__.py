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
# Round 10: blocks 1/1b = the 21 keys whose contracts changed that
# round (8 newly-derived full oracles, 8 hostile-FORMAT/extended-
# NUMERIC gate fixes, 5 hostile-EMBEDDINGS declared-dim eligibility
# keys); block 2 = the ENTIRE remaining r5-vintage drift tail (23
# keys); block 3 = the 6 oldest r6-vintage keys — CORRECTNESS_r10:
# 50/50 green. After r10, no driver row predates r6.
# Round 11 (this window): block 1 = the 9 keys whose contract or
# engine changed this round (hll_sketch_merge NULL-ts oracle,
# xml_parse_orders \x00 class, stream_sessionize component-set state,
# the six verify_enabled()-gated sketch/sample keys, knn_pq_topk
# encode path) plus the round's TWO new keys (knn_ivf_append_probe and
# stream_ivf_ingest — incremental materialized-IVF ingest, batch and
# streaming; policy #2); block 2 = the
# ENTIRE r6-vintage drift tail (25 keys,
# VERDICT r10 next #1) — after r11 no driver row predates r7; block 3
# = the 14 alphabetically-first r7-vintage keys (30 r7 stragglers
# remain for r12: filter_in_list and full_outer_nation_presence —
# displaced by the round's two new keys — intersect_nations, join_indicator,
# join_orders_customer, left_join_customer_orders, null_handling,
# q10/q14/q15/q17/q18/q19/q1/q22/q3/q4/q5/q6/q7,
# rollup_nation_region, scan_project_filter, semi_join_customers,
# split_leakage_audit, stream_dedup_near_docs, string_funcs_docs,
# training_corpus_pipeline, union_all_events_split, union_distinct,
# value_counts_events).
# STANDING OUTPUT DISCIPLINE: no registered query may return a
# top-level array/map/struct column — the driver's canonicalizer
# sort_values over raw columns and cannot sort list cells (r6's only
# red row). Explode to scalar rows or cast to a canonical string.
# ---------------------------------------------------------------------------
_CERTIFICATION_PRIORITY = [
    # --- r11 block 1 (changed-keys re-cert rule): hll_sketch_merge's
    # --- oracle gained the NULL-ts sketch-group term, xml_parse_orders'
    # --- illegal-character class extended to \x00, stream_sessionize
    # --- moved to order-independent component-set state (tombstone
    # --- emission contract), six sketch/sample keys gained the
    # --- verify_enabled() gate (default path byte-identical, engine
    # --- changed), and knn_pq_topk's encode now feeds the raw corpus
    # --- with the declared dim. ---
    "hll_sketch_merge",
    "xml_parse_orders",
    "stream_sessionize",
    "approx_distinct_users",
    "quantile_approx_value",
    "cms_heavy_hitters",
    "sample_fraction",
    "sample_stratified",
    "knn_pq_topk",
    # --- plus the round's TWO new keys (policy #2): the incremental
    # --- materialized-IVF ingest path, batch and streaming. ---
    "knn_ivf_append_probe",
    "stream_ivf_ingest",
    # --- r11 block 2: the ENTIRE r6-vintage drift tail (VERDICT r10
    # --- missing #1 / next #1 — the 25 keys the r10 block-3 comment
    # --- named). After r11 no driver row predates r7. ---
    "mad_robust_outliers",
    "ngram_freq_top",
    "null_safe_join",
    "posexplode_words",
    "price_histogram",
    "q11_important_stock",
    "q12_priority_lines",
    "q16_supplier_count",
    "q20_volume_suppliers",
    "quality_score_docs",
    "range_join_longtail_points",
    "regression_price_qty",
    "repetition_score_docs",
    "rollup_grouping_id",
    "row_ids_unique",
    "sample_k_per_group",
    "sorted_layout_roundtrip",
    "statestore_event_counts",
    "tfidf_top_terms",
    "timestamp_parse_roundtrip",
    "token_count_docs",
    "union_mismatched_schemas",
    "weighted_sample_docs",
    "window_price_band",
    "zorder_layout_roundtrip",
    # --- r11 block 3: drift re-certification, the 14 alphabetically-
    # --- first r7-vintage keys (their newest driver rows are now 4
    # --- rounds old; the remaining 30 are listed in the history note
    # --- above for r12). dedup_near doubles as the key whose scan-
    # --- fingerprint blindness r11 closed. ---
    "agg_collect",
    "agg_var_std",
    "anti_join_customers",
    "bucketed_join_agg",
    "case_when_bucketing",
    "cross_join_region_status",
    "cube_segment_status",
    "dedup_incremental_batch",
    "dedup_near",
    "dedup_near_minhash",
    "dedup_near_survivors",
    "distinct_users",
    "embedding_group_centroid",
    "except_returned_items",
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
