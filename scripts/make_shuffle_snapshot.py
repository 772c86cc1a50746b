#!/usr/bin/env python
"""Record the shuffle+scan snapshot that tests/test_shuffle_budget.py
gates against (VERDICT r7 #4; widened r9 #5).

Profiles every BATCH registry query at the correctness scale (sf0.01)
under the test-suite session config (shuffle_partitions=8 — shuffle
BYTES depend on partition count via per-partition compression framing,
so snapshot and replay must match). Pinned set (r9): the 20 heaviest by
shuffle bytes UNION every key whose plan has >= 2 exchanges — a pruning
or pushdown regression on a mid-weight multi-exchange query is the
silent 10× at 100 TB that the old top-20 pin could not see. Each pinned
entry carries shuffle volumes, scan bytes, and the pruned-column
fingerprint (sorted per-scan output column lists).

Streaming keys are skipped: their returned DataFrame is a memory-sink
table scan whose executed plan carries none of the stream's shuffles.

Re-run + commit the snapshot ONLY when a deliberate plan change moves a
pinned query's volume (the test failure message says which and by how
much); an unexplained move is the regression the gate exists to catch.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = "/root/testdata/sf0.01"
TOP_N = 20


def main() -> None:
    from plan_metrics import shuffle_profile

    from dask_hivemetastore_spark import plans
    from dask_hivemetastore_spark.session import get_spark

    spark = get_spark(app_name="shuffle-snapshot", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    profiles: dict[str, dict[str, int]] = {}
    for key, fn in plans.QUERIES.items():
        if "stream" in key:
            continue
        try:
            # cold-plan shape: a persist() from an earlier key must not
            # swap later keys' FileScans for InMemoryTableScan (the
            # pinning test clears the cache the same way)
            spark.catalog.clearCache()
            profiles[key] = shuffle_profile(fn(spark, SF_DIR))
        except Exception as exc:  # noqa: BLE001 — diagnostic tool
            print(f"skip {key}: {type(exc).__name__}: {exc}", file=sys.stderr)
            continue
        print(json.dumps({"query": key, **profiles[key]}), flush=True)

    top = dict(
        sorted(profiles.items(), key=lambda kv: -kv[1]["shuffle_bytes"])[:TOP_N]
    )
    # r9 widening: every multi-exchange key joins the pin — these are the
    # queries whose plans have room for a mid-plan pushdown regression
    for key, prof in profiles.items():
        if prof["n_shuffles"] >= 2:
            top.setdefault(key, prof)
    # r10 (ADVICE): a query whose executed plan surfaces NO FileScan
    # (an internal persist/localCheckpoint boundary hides it) records an
    # EMPTY fingerprint — the scan gate is blind for it. Mark that
    # explicitly so the pinning test can assert blindness never spreads
    # silently: a key losing its fingerprint in a re-snapshot shows up
    # as a scan_blind:true diff a reviewer must accept, not as a
    # quietly-vacuous 0 == 0.
    for key, prof in top.items():
        if not prof.get("scan_cols"):
            prof["scan_blind"] = True
            print(
                f"WARNING: {key} surfaces no FileScan (persist boundary) — "
                "scan fingerprint gate is BLIND for it",
                file=sys.stderr,
            )
    out = {
        "sf_dir": SF_DIR,
        "shuffle_partitions": 8,
        "queries": top,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "tests", "shuffle_snapshot.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"\nwrote {path} with top {len(top)} by shuffle bytes")


if __name__ == "__main__":
    main()
