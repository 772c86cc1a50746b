"""Executed-plan shuffle + scan metrics (VERDICT r7 #4, widened r9 #5).

The registry-wide plan audit (``scripts/plan_audit.py``) greps operator
TREES — it cannot see a shuffle-VOLUME regression that keeps the same
operators (e.g. a filter that stops pushing below an exchange quietly
10×es the shuffled rows). This module reads the actual SQLMetrics off an
executed plan: total shuffle bytes/records written, the number of
ShuffleExchange nodes, and (r9) per-file-scan bytes read plus the
PRUNED COLUMN fingerprint — the scan's output attribute list, which IS
the ReadSchema; a column-pruning regression (scan suddenly reading all
columns for a 2-column projection) changes the fingerprint even when
the operator tree is identical. That's the silent 10× at 100 TB.

Used by ``scripts/perf_sweep.py`` (sweep JSON carries bytes per query) and
``tests/test_shuffle_budget.py`` (pins volumes at ±50% and fingerprints
exactly against a committed snapshot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_METRIC_KEYS = ("shuffleBytesWritten", "shuffleRecordsWritten")


def _walk(p, nodes: list, seen_caches: set | None = None) -> None:
    if seen_caches is None:
        seen_caches = set()
    nodes.append(p)
    cname = p.getClass().getSimpleName()
    if cname == "AdaptiveSparkPlanExec":
        _walk(p.executedPlan(), nodes, seen_caches)
        return
    if cname.endswith("QueryStageExec"):
        _walk(p.plan(), nodes, seen_caches)
        return
    if cname == "ReusedExchangeExec":
        # metrics live on (and are already counted at) the original
        return
    if cname == "InMemoryTableScanExec":
        # r11 (VERDICT r10 missing #2): a persist() boundary used to
        # STOP the walk here, leaving the scan-fingerprint gate blind
        # for any key whose executed plan tops out at the cache
        # (dedup_near, split_leakage_audit). The cache's build plan —
        # FileScans with their pruned ReadSchema, plus any exchanges
        # below the boundary — is reachable via the InMemoryRelation;
        # walk it ONCE per relation (several InMemoryTableScans can
        # share one cache; double-walking would double-count bytes).
        rel_id = p.relation().cacheBuilder().cachedPlan().id()
        if rel_id not in seen_caches:
            seen_caches.add(rel_id)
            _walk(p.relation().cacheBuilder().cachedPlan(), nodes,
                  seen_caches)
        return
    it = p.children().iterator()
    while it.hasNext():
        _walk(it.next(), nodes, seen_caches)


def shuffle_profile(df: DataFrame) -> dict[str, int]:
    """Execute ``df`` and return its shuffle totals.

    Runs ``collect()`` (metrics attach to THIS QueryExecution — an
    action like ``count()`` would execute a different wrapped plan and
    leave these metrics zero), then folds SQLMetrics over the final
    adaptive plan. Only call on bounded results.
    """
    df.collect()
    nodes: list = []
    _walk(df._jdf.queryExecution().executedPlan(), nodes)
    out: dict = {"n_shuffles": 0, "shuffle_bytes": 0, "shuffle_records": 0,
                 "scan_bytes": 0, "scan_cols": []}
    scan_cols: list[str] = []
    for n in nodes:
        cname = n.getClass().getSimpleName()
        is_exchange = cname == "ShuffleExchangeExec"
        if is_exchange:
            out["n_shuffles"] += 1
        is_scan = cname in ("FileSourceScanExec", "BatchScanExec")
        if is_scan:
            # the scan's output attribute list IS its pruned ReadSchema
            # (+ partition columns) — the column-pruning fingerprint
            cols = []
            ito = n.output().iterator()
            while ito.hasNext():
                cols.append(ito.next().name())
            scan_cols.append(",".join(sorted(cols)))
        it = n.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            name = kv._1()
            if name == _METRIC_KEYS[0]:
                out["shuffle_bytes"] += kv._2().value()
            elif name == _METRIC_KEYS[1]:
                out["shuffle_records"] += kv._2().value()
            elif is_scan and name == "filesSize":
                out["scan_bytes"] += kv._2().value()
    # sorted: scan discovery order is plan-layout-dependent, the SET of
    # (table-shaped) column lists is what pruning regressions change
    out["scan_cols"] = sorted(scan_cols)
    return out
