#!/usr/bin/env python
"""100x scale stress for the near-dedup family (VERDICT r5 #2).

Replicates the sf0.1 documents corpus R times with REPLICA-TAGGED words
(every word of replica r becomes ``word_r``), so:

- within-replica near-dup structure is identical to the base corpus;
- cross-replica Jaccard is exactly 0 (no shared grams at all);
- the true pair count at Rx is therefore exactly R x the 1x count — any
  deviation means the candidate path lost or invented pairs at scale.

Measures wall-clock and output pairs for BOTH K2 paths — the exact
prefix-filtered n-gram Jaccard join (``ngram_jaccard_pairs``) and the
MinHash+LSH banded path (``minhash_lsh_pairs``) — at 1x and Rx, plus the
LSH candidate bound (sum C(bucket,2) over (band, band_hash) buckets,
computed from the shared ``minhash_band_buckets`` stage) at both scales:
the sub-quadratic-candidates claim, measured rather than argued.

Usage: python scripts/stress_near_dedup.py [--reps 100] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def tagged_replicas(docs, reps: int):
    """Union of `reps` copies; replica r's ids shift by r*10M and every
    word gets a ``_r`` suffix (combined map-side, one explode, no UDF)."""
    return (
        docs.select("doc_id", "text")
        .withColumn("__rep", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))))
        .select(
            (F.col("doc_id") + F.col("__rep") * 10_000_000).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda w: F.concat(w, F.lit("_"), F.col("__rep")),
                ),
                " ",
            ).alias("text"),
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import sys

    sys.path.insert(0, "/root/repo")
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

    for scale, df in (
        ("1x", tagged_replicas(base, 1)),
        (f"{args.reps}x", tagged_replicas(base, args.reps)),
    ):
        df = df.localCheckpoint()  # isolate the dedup cost from the explode
        n_docs = df.count()
        row: dict = {"n_docs": n_docs}

        t0 = time.time()
        row["prefix_pairs"] = D.ngram_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.9
        ).count()
        row["prefix_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        row["minhash_pairs"] = D.minhash_lsh_pairs(
            df, "doc_id", "text", n=3, threshold=0.9
        ).count()
        row["minhash_sec"] = round(time.time() - t0, 2)

        grams = D.with_word_ngrams(df, "text", 3)
        t0 = time.time()
        cand = (
            D.minhash_band_buckets(grams, "doc_id")
            .groupBy("band", "band_hash")
            .count()
            .agg(F.sum(F.expr("count * (count - 1) / 2")).cast("long"))
            .first()[0]
        )
        row["lsh_candidate_bound"] = int(cand)
        row["lsh_bucket_stage_sec"] = round(time.time() - t0, 2)
        results[scale] = row
        print(scale, row, flush=True)

    r1, rN = results["1x"], results[f"{args.reps}x"]
    results["pairs_scale_exact"] = (
        rN["prefix_pairs"] == args.reps * r1["prefix_pairs"]
        and rN["minhash_pairs"] == args.reps * r1["minhash_pairs"]
    )
    results["candidate_growth_factor"] = round(
        rN["lsh_candidate_bound"] / max(1, r1["lsh_candidate_bound"]), 2
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
