#!/usr/bin/env python
"""100x scale stress for the iterative connected-components loop (K2's
canonical-survivor stage — the classic scale trap: an iterative algorithm
whose per-round cost or round count silently blows up with data size).

Corpus: documents replicated R times with replica-tagged words (the
stress_near_dedup.py construction — near-dup structure per replica
identical to base, cross-replica Jaccard 0), so the TRUE component
structure at Rx is exactly R disjoint copies of the 1x structure: same
diameter (so the SAME number of propagation rounds must suffice), R x the
non-trivial components, R x the merged nodes. Any deviation means the
label propagation lost or bridged components at scale.

Reports wall-clock, rounds-to-converge (from the operator's max_iter
contract), component count and merged-node count at 1x and Rx.

Usage: python scripts/stress_components.py [--reps 100]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/scripts")
    from stress_near_dedup import tagged_replicas

    from dask_hivemetastore_spark.catalog import load_table
    from dask_hivemetastore_spark.operators import dedup as D
    from dask_hivemetastore_spark.session import ensure_runtime_confs

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    ensure_runtime_confs(spark)

    base = load_table(spark, args.sf_dir, "documents").select("doc_id", "text")
    results: dict = {"reps": args.reps}

    for scale, reps in (("1x", 1), (f"{args.reps}x", args.reps)):
        df = tagged_replicas(base, reps).localCheckpoint()
        ids = df.select("doc_id")
        pairs = D.ngram_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.9
        ).localCheckpoint()  # isolate the components cost from pair-gen
        n_pairs = pairs.count()
        t0 = time.time()
        comps = D.connected_components(pairs, ids, "doc_id").localCheckpoint()
        sec = round(time.time() - t0, 2)
        merged = comps.where(F.col("component") != F.col("doc_id")).count()
        n_nontrivial = (
            comps.groupBy("component").count().where(F.col("count") > 1).count()
        )
        results[scale] = {
            "n_docs": df.count(), "n_pairs": n_pairs,
            "components_sec": sec, "merged_nodes": merged,
            "nontrivial_components": n_nontrivial,
        }
        print(scale, results[scale], flush=True)

    r1, rN = results["1x"], results[f"{args.reps}x"]
    results["structure_scales_exact"] = (
        rN["merged_nodes"] == args.reps * r1["merged_nodes"]
        and rN["nontrivial_components"] == args.reps * r1["nontrivial_components"]
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
