#!/usr/bin/env python
"""Full-registry timing sweep at $SPARK_GRAFT_SF_DIR (default sf0.1).

Produces the PERF.md table body: one row per registered query, sorted by
time descending, printed as JSON lines plus a markdown table on stdout.

Methodology (round 5 — VERDICT r4 "Next round #6"): one warm session, then
PER QUERY one untimed warm rep followed by the timed rep. The warm rep
absorbs codegen compilation, Python-worker spin-up, and parquet footer
reads for that query's tables, so sweep position in the alphabet no longer
biases the number (the r3/r4 sweeps' apparent regressions were exactly
that positional noise — see PERF.md and memory note). Streaming queries
re-execute their full micro-batch drain both reps, so their numbers stay
honest end-to-end costs.

Usage:  python scripts/perf_sweep.py [--prev PERF_prev.json]
Writes PERF_sweep.json next to the repo root for the next round's Δ column.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dask_hivemetastore_spark import plans
    from dask_hivemetastore_spark.session import get_spark

    prev: dict[str, float] = {}
    if len(sys.argv) == 3 and sys.argv[1] == "--prev":
        with open(sys.argv[2]) as f:
            prev = json.load(f)["queries"]

    spark = get_spark(app_name="perf-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from plan_metrics import shuffle_profile

    times: dict[str, float] = {}
    shuffles: dict[str, dict[str, int]] = {}
    t_all = time.perf_counter()
    for key, fn in plans.QUERIES.items():
        # The untimed warm rep doubles as the shuffle-metrics rep (r8,
        # VERDICT r7 #4): collect() attaches SQLMetrics to the plan it
        # executes, which count() would not. Timing methodology (timed
        # rep = count, after one warm rep) is unchanged from r5.
        # Streaming keys keep the count() warm rep: their returned frame
        # is a memory-sink scan whose plan has NONE of the stream's
        # shuffles — recording its near-zero numbers would pollute the
        # sweep JSON (r8 review; make_shuffle_snapshot skips them too).
        try:
            if "stream" in key:
                fn(spark, sf_dir).count()
            else:
                shuffles[key] = shuffle_profile(fn(spark, sf_dir))
        except Exception:  # noqa: BLE001 — warm rep must never kill a sweep
            try:
                fn(spark, sf_dir).count()
            except Exception as exc:  # noqa: BLE001 — a query that fails
                # DETERMINISTICALLY (the case most likely to have thrown
                # above) would re-raise here and kill the whole sweep (r9
                # advisor); record it as failed and keep sweeping.
                times[key] = -1.0
                print(json.dumps({"query": key, "error": repr(exc)[:200]}),
                      flush=True)
                continue
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001 — same no-kill contract
            times[key] = -1.0
            print(json.dumps({"query": key, "error": repr(exc)[:200]}),
                  flush=True)
            continue
        times[key] = round(time.perf_counter() - t0, 3)
        print(json.dumps({"query": key, "sec": times[key],
                          **shuffles.get(key, {})}), flush=True)
    total = round(time.perf_counter() - t_all, 1)

    out = {"sf_dir": sf_dir, "total_sec": total, "n": len(times),
           "queries": times, "shuffle": shuffles}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PERF_sweep.json"), "w") as f:
        json.dump(out, f, indent=1)

    print(f"\n{len(times)} queries, {total} s wall (incl. warm reps)\n")
    print("| query | sec |" + (" prev | Δ |" if prev else ""))
    print("|---|---:|" + ("---:|---:|" if prev else ""))
    for k in sorted(times, key=times.get, reverse=True):
        row = f"| {k} | {times[k]:.2f} |"
        if prev and k in prev:
            d = times[k] / prev[k] if prev[k] else float("nan")
            row += f" {prev[k]:.2f} | {d:.1f}× |"
        print(row)


if __name__ == "__main__":
    main()
