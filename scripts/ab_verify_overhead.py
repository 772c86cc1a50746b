#!/usr/bin/env python
"""A/B the derived-verdict overhead on the sketch/sample keys (r11,
VERDICT r10 #7).

The r10 oracle-derivation work gave eight previously rows-only keys full
DuckDB oracles by computing an EXACT counterpart beside each sketch
(count_distinct beside HLL, a conditional-aggregate rank pass beside the
quantile sketch, population counts + anti-join beside the samplers).
That exact pass exists only for certification: at 100 TB it is the
difference between a sketch query (one scan, fixed-size state) and a
full exact scan (or a second one). r11 guards it behind
``SPARK_GRAFT_VERIFY`` (default ON — the driver contract is unchanged);
this script measures what flipping it off buys, per key.

The two knn keys from the r10 batch (knn_ivf_topk, knn_pq_topk) are NOT
here: their exact top-k RERANK is the IVF/PQ serving path itself (ADC or
cell scan shortlists, exact rescore decides) — there is no
verification-only pass to strip.

Protocol (PERF.md:3-12): one warm session, modes interleaved per rep so
box drift hits both arms equally; best-of-N per (key, mode); quiet box
required (pgrep first). Prints a markdown table + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = [
    "approx_distinct_users",
    "hll_sketch_merge",
    "cms_heavy_hitters",
    "quantile_approx_value",
    "sample_fraction",
    "sample_stratified",
]
REPS = 5


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dask_hivemetastore_spark import plans
    from dask_hivemetastore_spark.session import get_spark

    spark = get_spark(app_name="ab-verify-overhead")
    spark.sparkContext.setLogLevel("ERROR")

    # warm both arms untimed
    for mode in ("1", "0"):
        os.environ["SPARK_GRAFT_VERIFY"] = mode
        for key in KEYS:
            plans.QUERIES[key](spark, sf_dir).collect()

    best: dict[tuple[str, str], float] = {}
    for _ in range(REPS):
        for key in KEYS:
            for mode in ("1", "0"):
                os.environ["SPARK_GRAFT_VERIFY"] = mode
                t0 = time.perf_counter()
                plans.QUERIES[key](spark, sf_dir).collect()
                dt = time.perf_counter() - t0
                k = (key, mode)
                best[k] = min(best.get(k, float("inf")), dt)
    os.environ["SPARK_GRAFT_VERIFY"] = "1"

    print("| key | verdict ON (s) | verdict OFF (s) | overhead |")
    print("|---|---|---|---|")
    rows = {}
    for key in KEYS:
        on, off = best[(key, "1")], best[(key, "0")]
        ratio = on / off if off > 0 else float("inf")
        rows[key] = {"on": round(on, 4), "off": round(off, 4),
                     "ratio": round(ratio, 2)}
        print(f"| {key} | {on:.3f} | {off:.3f} | {ratio:.2f}x |")
    print(json.dumps({"sf_dir": sf_dir, "reps": REPS, "keys": rows}))


if __name__ == "__main__":
    main()
