#!/usr/bin/env python
"""A/B the two brute-force knn serving paths for the bench's knn cell
(r11, VERDICT r10 #3).

The knn bench cell (knn_cosine_topk, 2 000×64-d at sf0.1) sits in the
0.2–0.4 s regime where the measured same-day box noise is ±10–30%: its
r10 driver reading hit 1.79× of baseline with zero code change, one bad
box-day below the 2× gate. BASELINE.md sanctions a mapInPandas/NumPy
fallback if the cell goes over budget; this script pre-arms that swap
with committed evidence:

- arm A: registry ``knn_cosine_topk`` (JVM ``aggregate``/``zip_with``
  fold — the current default);
- arm B: ``knn_topk_arrow`` (Arrow-batched GEMV shortlist + exact JVM
  rescore — identical results by construction, asserted here first).

Interleaved per rep so drift hits both arms equally (PERF.md:3-12
protocol); reports best AND worst per arm — the gate risk is the noisy
TAIL, so worst-case spread decides whether a swap helps.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 9


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dask_hivemetastore_spark import plans
    from dask_hivemetastore_spark.catalog import load_table
    from dask_hivemetastore_spark.operators.similarity import knn_topk_arrow
    from dask_hivemetastore_spark.session import get_spark

    spark = get_spark(app_name="ab-knn-brute")
    spark.sparkContext.setLogLevel("ERROR")

    def arm_a():
        return plans.QUERIES["knn_cosine_topk"](spark, sf_dir)

    def arm_b():
        return knn_topk_arrow(load_table(spark, sf_dir, "embeddings"),
                              query_id=0, k=10, dim=64)

    # identical-result precondition (the whole point of the exact rescore)
    ra = [(r.vec_id, r.label, r.cosine) for r in arm_a().collect()]
    rb = [(r.vec_id, r.label, r.cosine) for r in arm_b().collect()]
    assert ra == rb, f"arms diverge:\nA={ra}\nB={rb}"
    print(f"arms identical on {len(ra)} rows", file=sys.stderr)

    times: dict[str, list[float]] = {"jvm_fold": [], "arrow_gemv": []}
    for _ in range(2):  # warm both arms untimed
        arm_a().collect()
        arm_b().collect()
    for _ in range(REPS):
        for name, fn in (("jvm_fold", arm_a), ("arrow_gemv", arm_b)):
            t0 = time.perf_counter()
            fn().collect()
            times[name].append(time.perf_counter() - t0)

    out = {}
    for name, ts in times.items():
        ts = sorted(ts)
        out[name] = {
            "best": round(ts[0], 4),
            "median": round(ts[len(ts) // 2], 4),
            "worst": round(ts[-1], 4),
        }
    print(json.dumps({"sf_dir": sf_dir, "reps": REPS, **out}))


if __name__ == "__main__":
    main()
