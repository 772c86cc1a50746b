#!/usr/bin/env python
"""ann_index_compact at 100x corpus scale (r13).

Companion to scripts/stress_lsh_scale.py / stress_ivf_scale.py for the
r13 maintenance pass: the sf0.1 embeddings (2 000 x 64-dim) replicate
100x to 200 000 vectors, and each index is assembled the way the
at-least-once streaming sinks actually leave it — manifest first, then
MANY batch-keyed ``ingest_batch=<i>`` appends — so the pre-compaction
layout carries the real small-files tax (one directory + >=1 file per
batch per partition value).

Measured claims, invariants wired into the exit code:

- probe identity: the post-compaction probe returns row-for-row the
  pre-compaction answer (both LSH and IVF, path-only config);
- file collapse: n_files_out < n_files_in and every ``ingest_batch``
  dir is folded (counted from the returned stats);
- probe speedup: probe latency before vs after compaction (the
  listing/footer tax is the claim — reported, not asserted: on a local
  FS with a warm dentry cache the tax is mostly footer reads, the
  100 TB story is object-store listing);
- compaction cost: the one-time rewrite wall the speedup amortizes.

Usage: python scripts/stress_compact.py [--reps 100] [--batches 40]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

import numpy as np
from pyspark.sql import SparkSession, functions as F


def _best(n: int, fn) -> float:
    fn()  # warm rep
    times = []
    for _ in range(n):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return round(min(times), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--batches", type=int, default=40)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--bits", type=int, default=8)
    ap.add_argument("--n-tables", type=int, default=16)
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from dask_hivemetastore_spark.catalog import load_table
    from dask_hivemetastore_spark.operators.similarity import (
        ann_index_compact,
        finite_vectors,
        ivf_append,
        ivf_manifest,
        ivf_probe_indexed,
        ivf_train_centroids,
        lsh_append,
        lsh_manifest,
        lsh_probe_indexed,
        write_index_manifest,
    )
    from dask_hivemetastore_spark.session import ensure_runtime_confs

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    ensure_runtime_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, args.sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    big = (
        emb.withColumn(
            "__rep", F.explode(F.sequence(F.lit(0), F.lit(args.reps - 1)))
        )
        .select(
            (F.col("vec_id") + F.col("__rep") * 10_000_000).alias("vec_id"),
            "embedding",
            "label",
        )
    )
    base = tempfile.mkdtemp(prefix="compact_scale_")
    flat_path = f"{base}/flat"
    big.write.mode("overwrite").parquet(flat_path)
    flat = spark.read.parquet(flat_path)
    n = flat.count()
    B = args.batches
    results: dict = {"n_vectors": n, "batches": B}
    ok = True

    # ---------------- LSH: manifest-first, B batch-keyed appends ----
    lsh_idx = f"{base}/lsh"
    write_index_manifest(
        spark, lsh_idx,
        lsh_manifest(dim=dim, bits=args.bits, n_tables=args.n_tables),
    )
    t0 = time.time()
    for b in range(B):
        lsh_append(flat.where(F.col("vec_id") % B == b), lsh_idx,
                   subdir=f"ingest_batch={b}", mode="overwrite")
    results["lsh_ingest_sec"] = round(time.time() - t0, 2)

    def lsh_probe():
        return [tuple(r) for r in lsh_probe_indexed(
            flat, lsh_idx, query_id=0, k=10).collect()]

    before = lsh_probe()
    results["lsh_probe_before_sec"] = _best(3, lsh_probe)
    t0 = time.time()
    stats = ann_index_compact(spark, lsh_idx)
    results["lsh_compact_sec"] = round(time.time() - t0, 2)
    results["lsh_files_in"] = stats["n_files_in"]
    results["lsh_files_out"] = stats["n_files_out"]
    results["lsh_batch_dirs_folded"] = stats["n_batch_dirs_folded"]
    after = lsh_probe()
    results["lsh_probe_after_sec"] = _best(3, lsh_probe)
    results["lsh_probe_identity"] = (
        after == before and len(after) == 10
    )
    ok &= results["lsh_probe_identity"]
    ok &= stats["n_files_out"] < stats["n_files_in"]
    ok &= stats["n_batch_dirs_folded"] == B

    # ---------------- IVF: manifest-first, B batch-keyed appends ----
    ivf_idx = f"{base}/ivf"
    C = ivf_train_centroids(flat, n_cells=16, cache_key=flat_path, dim=dim)
    write_index_manifest(
        spark, ivf_idx,
        ivf_manifest(flat, C, dim=dim, n_cells=16, seed=42,
                     drift_reference=False),
    )
    t0 = time.time()
    for b in range(B):
        ivf_append(flat.where(F.col("vec_id") % B == b),
                   f"{ivf_idx}/ingest_batch={b}", mode="overwrite")
    results["ivf_ingest_sec"] = round(time.time() - t0, 2)
    qv = np.asarray(
        finite_vectors(flat, "embedding", dim)
        .where(F.col("vec_id") == 0).select("embedding").first()[0],
        dtype=np.float64,
    )

    def ivf_probe():
        return [tuple(r) for r in ivf_probe_indexed(
            spark, ivf_idx, None, qv, k=10, nprobe=8,
            exclude_id=0).collect()]

    before = ivf_probe()
    results["ivf_probe_before_sec"] = _best(3, ivf_probe)
    t0 = time.time()
    stats = ann_index_compact(spark, ivf_idx)
    results["ivf_compact_sec"] = round(time.time() - t0, 2)
    results["ivf_files_in"] = stats["n_files_in"]
    results["ivf_files_out"] = stats["n_files_out"]
    results["ivf_batch_dirs_folded"] = stats["n_batch_dirs_folded"]
    after = ivf_probe()
    results["ivf_probe_after_sec"] = _best(3, ivf_probe)
    results["ivf_probe_identity"] = (
        after == before and len(after) == 10
    )
    ok &= results["ivf_probe_identity"]
    ok &= stats["n_files_out"] < stats["n_files_in"]
    ok &= stats["n_batch_dirs_folded"] == B

    results["lsh_probe_speedup_x"] = round(
        results["lsh_probe_before_sec"]
        / max(results["lsh_probe_after_sec"], 1e-9), 2)
    results["ivf_probe_speedup_x"] = round(
        results["ivf_probe_before_sec"]
        / max(results["ivf_probe_after_sec"], 1e-9), 2)
    results["ok"] = bool(ok)
    print(json.dumps(results))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
