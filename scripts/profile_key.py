#!/usr/bin/env python
"""Per-key job-level profile (r17 optimization round).

For each named registry key: one untimed warm rep, then a timed rep run
inside a dedicated job group. Afterwards the AppStatusStore is read for
every job in that group: per-job wall duration, task count and total
executor run time. The gap between the rep's wall clock and the sum of
job walls is driver-side time (planning, py4j, manifest IO, collect
decode); the gap between a job's wall and its executor run time / slots
is scheduling overhead. That split decides WHERE to optimize (guide
§1.1/§7.3): a key whose wall is 80% driver gaps needs fewer jobs /
fewer py4j round-trips, not a better plan.

Usage: python scripts/profile_key.py key1 key2 ...
       python scripts/profile_key.py --top N   (N slowest from PERF_r16.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def profile(spark, key, fn, sf_dir) -> dict:
    sc = spark.sparkContext
    fn(spark, sf_dir).count()  # warm rep (codegen, footers, Python workers)
    group = f"profile-{key}"
    sc.setJobGroup(group, key, False)
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    wall = time.perf_counter() - t0
    sc.setJobGroup(None, None, False)

    store = sc._jsc.sc().statusStore()
    jobs = []
    it = store.jobsList(None).iterator()
    while it.hasNext():
        j = it.next()
        jg = j.jobGroup()
        if jg.isDefined() and jg.get() == group:
            sub = j.submissionTime()
            comp = j.completionTime()
            dur = None
            if sub.isDefined() and comp.isDefined():
                dur = (comp.get().getTime() - sub.get().getTime()) / 1000.0
            jobs.append({
                "jobId": j.jobId(),
                "dur": dur,
                "numTasks": j.numTasks(),
                "stages": j.stageIds().size(),
            })
    jobs.sort(key=lambda x: x["jobId"])
    job_wall = sum(j["dur"] or 0.0 for j in jobs)
    return {
        "key": key,
        "wall": round(wall, 3),
        "n_jobs": len(jobs),
        "job_wall_sum": round(job_wall, 3),
        "driver_gap": round(wall - job_wall, 3),
        "jobs": jobs,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dask_hivemetastore_spark import plans
    from dask_hivemetastore_spark.session import get_spark

    keys = sys.argv[1:]
    if keys and keys[0] == "--top":
        n = int(keys[1])
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "PERF_r16.json")) as f:
            prev = json.load(f)["queries"]
        keys = sorted(prev, key=lambda k: -prev[k]["sec"]
                      if isinstance(prev[k], dict) else -prev[k])[:n]

    spark = get_spark(app_name="profile-key")
    spark.sparkContext.setLogLevel("ERROR")

    for key in keys:
        fn = plans.QUERIES.get(key)
        if fn is None:
            print(json.dumps({"key": key, "error": "unknown key"}))
            continue
        try:
            out = profile(spark, key, fn, sf_dir)
        except Exception as exc:  # noqa: BLE001 — keep profiling the rest
            out = {"key": key, "error": repr(exc)[:200]}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
