#!/usr/bin/env python
"""100x scale stress for benchmark decontamination (K7).

The decontamination claim under test: the CORPUS side never shuffles —
the benchmark's gram table (or its 8-byte digests) broadcasts, the corpus
is read once and probed map-side, and only contaminated ids aggregate.
If that holds, wall-clock grows ~linearly with corpus size and the
contaminated-id count grows EXACTLY with the replica factor.

Setup: benchmark = every 97th base document (untagged). Corpus = the
base documents replicated R times by pure id-shift (texts unchanged), so
every replica of a contaminated base doc is contaminated and the true
contaminated count at Rx is exactly R x the 1x count — an exactness
check built into the throughput run, same pattern as
scripts/stress_near_dedup.py.

Measures both paths: `contaminated_ids` (string-gram broadcast) and
`contaminated_ids_digest` (xxhash64-digest broadcast + exact semi-join).

Usage: python scripts/stress_decontaminate.py [--reps 100]
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
    from dask_hivemetastore_spark.catalog import load_table
    from dask_hivemetastore_spark.operators import curation
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
    bench = base.where(F.col("doc_id") % 97 == 0).localCheckpoint()
    results: dict = {"reps": args.reps, "bench_docs": bench.count()}

    for scale, reps in (("1x", 1), (f"{args.reps}x", args.reps)):
        corpus = (
            base.withColumn(
                "__rep", F.explode(F.sequence(F.lit(0), F.lit(reps - 1)))
            )
            .select(
                (F.col("doc_id") + F.col("__rep") * 10_000_000).alias("doc_id"),
                "text",
            )
            .localCheckpoint()  # isolate decontamination cost from the explode
        )
        row: dict = {"n_docs": corpus.count()}
        for name, fn in (
            ("broadcast", curation.contaminated_ids),
            ("digest", curation.contaminated_ids_digest),
        ):
            t0 = time.time()
            row[f"{name}_contaminated"] = fn(corpus, bench, "doc_id", n=5).count()
            row[f"{name}_sec"] = round(time.time() - t0, 2)
        results[scale] = row
        print(scale, row, flush=True)

    r1, rN = results["1x"], results[f"{args.reps}x"]
    results["counts_scale_exact"] = (
        rN["broadcast_contaminated"] == args.reps * r1["broadcast_contaminated"]
        and rN["digest_contaminated"] == rN["broadcast_contaminated"]
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
