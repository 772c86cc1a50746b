#!/usr/bin/env python
"""Scale stress for the incremental near-dup probe (ngram_jaccard_probe):
the corpus grows 100x, the arriving batch stays FIXED — the probe's
output and candidate volume must be corpus-growth-invariant.

Construction: corpus = base documents replicated R times with
replica-tagged words; batch = a fixed 10% slice of base docs, tagged like
replica 0 and id-shifted. A batch doc can only match replica-0 docs (its
identical twin there at Jaccard 1.0 plus its planted near-dup partners),
so the TRUE probe result is byte-identical whether the corpus holds 1 or
100 replicas. Any pair-count drift at 100x means the asymmetric prefix
filter lost or invented matches as the corpus (and its df statistics —
which the prefix ORDER depends on) scaled.

Reports probe wall-clock and pair count at corpus 1x and Rx. The wall
includes building the corpus inverted index (linear in corpus, the
amortized-once artifact in production); the invariant quantity is the
match set.

Usage: python scripts/stress_incremental_probe.py [--reps 100]
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
    batch = (
        tagged_replicas(base.where(F.col("doc_id") % 10 == 0), 1)
        .select((F.col("doc_id") + 500_000_000).alias("doc_id"), "text")
        .localCheckpoint()
    )
    n_batch = batch.count()
    results: dict = {"reps": args.reps, "n_batch": n_batch}

    pair_sets: dict[str, int] = {}
    for scale, reps in (("1x", 1), (f"{args.reps}x", args.reps)):
        corpus = tagged_replicas(base, reps).localCheckpoint()
        n_corpus = corpus.count()
        t0 = time.time()
        pairs = D.ngram_jaccard_probe(
            batch, corpus, "doc_id", "text", n=3, threshold=0.9
        ).localCheckpoint()
        n_pairs = pairs.count()
        sec = round(time.time() - t0, 2)
        # matches must all land in replica 0 (corpus ids < 10M)
        outside = pairs.where(F.col("corpus_id") >= 10_000_000).count()
        results[scale] = {
            "n_corpus": n_corpus, "probe_sec": sec,
            "n_pairs": n_pairs, "pairs_outside_replica0": outside,
        }
        pair_sets[scale] = n_pairs
        print(scale, results[scale], flush=True)

    results["pairs_invariant"] = (
        pair_sets["1x"] == pair_sets[f"{args.reps}x"]
        and results[f"{args.reps}x"]["pairs_outside_replica0"] == 0
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
