#!/usr/bin/env python
"""Micro-batch census for every streaming registry key (r18, VERDICT r17
next #7): one rep per key, recording the wall time and the number of
COMMITTED micro-batches (counted from the commit log of every checkpoint
directory the rep created under the process temp dir).

Each availableNow drain pays a fixed per-batch floor (~0.6 s on these
boxes: IncrementalExecution re-plans every batch + offset/commit WAL
writes), so the census answers "which keys run more micro-batches than
their contract requires?" — the ones that do are candidates for fewer,
larger batches; the ones already at 1 data batch (+ the no-data
watermark-finalization batches Spark appends for append-mode sinks)
have nothing left to cut at the query level.

Usage: python scripts/stream_batches.py [sf_dir]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STREAM_KEYS = [
    "stream_tumbling_1h",
    "stream_sliding_30m",
    "stream_dedup_users",
    "stream_stateful_counts",
    "stream_sessionize",
    "stream_filter_to_parquet",
    "stream_static_enrich",
    "stream_click_attribution",
    "stream_foreach_batch_snapshot",
    "stream_observe_metrics",
    "statestore_event_counts",
    "python_stream_source_agg",
    "stream_ivf_ingest",
    "stream_lsh_ingest",
    "stream_ivfpq_ingest",
    "stream_dedup_near_docs",
]


def _tmp_dirs() -> set[str]:
    base = tempfile.gettempdir()
    return {p for p in glob.glob(os.path.join(base, "*")) if os.path.isdir(p)}


def _commit_counts(new_dirs: set[str]) -> list[int]:
    counts = []
    for d in sorted(new_dirs):
        for commits in glob.glob(os.path.join(d, "**", "commits"),
                                 recursive=True):
            n = len([f for f in os.listdir(commits) if f.isdigit()])
            if n:
                counts.append(n)
    return counts


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dask_hivemetastore_spark import plans
    from dask_hivemetastore_spark.session import get_spark

    spark = get_spark(app_name="stream-batches")
    spark.sparkContext.setLogLevel("ERROR")

    rows = {}
    for key in STREAM_KEYS:
        fn = plans.QUERIES.get(key)
        if fn is None:
            continue
        before = _tmp_dirs()
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        wall = round(time.perf_counter() - t0, 2)
        rows[key] = {"wall": wall,
                     "batches": _commit_counts(_tmp_dirs() - before)}
        print(f"{key}: {wall}s batches={rows[key]['batches']}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "keys": rows}))


if __name__ == "__main__":
    main()
