#!/usr/bin/env python
"""ann_index_recover at 100x corpus scale (r15).

Companion to scripts/stress_compact.py for the r15 recovery protocol:
the sf0.1 embeddings (2 000 x 64-dim) replicate 100x to 200 000
vectors, ingested as batch-keyed ``ingest_batch=<i>`` appends into an
IVFPQ index (the family whose probes do NOT dropDuplicates — the r14
advisor's exposure), and a compaction is CRASHED at the worst point
(post-swap, pre-commit-sentinel: every original dir tombstoned, every
folded ``cell=*`` dir swapped in with no tombstone counterpart — the
state that used to double every row on roll-back).

Measured claims, invariants wired into the exit code:

- duplication really happens: the crashed state's cell dirs hold the
  full corpus ALONGSIDE the tombstoned batch dirs (counted);
- recovery is lossless: post-recover row count equals pre-crash, the
  probe returns row-for-row the pre-crash answer, and
  ann_index_verify is clean;
- recovery is cheap: wall time is reported — the work is O(dirs)
  driver-side renames/deletes, never a data rewrite (the claim that
  matters at 100 TB: recovery cost is metadata-proportional);
- the re-run compaction completes the fold and the probe still
  matches.

Usage: python scripts/stress_recover.py [--reps 100] [--batches 20]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    import numpy as np
    from pyspark.sql import SparkSession, functions as F

    from dask_hivemetastore_spark.catalog import load_table
    from dask_hivemetastore_spark.operators import similarity
    from dask_hivemetastore_spark.operators.similarity import (
        ann_index_compact,
        ann_index_recover,
        ann_index_verify,
        finite_vectors,
        ivfpq_append,
        ivfpq_build_index,
        ivfpq_probe_indexed,
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
    base = tempfile.mkdtemp(prefix="recover_scale_")
    flat_path = f"{base}/flat"
    big.write.mode("overwrite").parquet(flat_path)
    flat = spark.read.parquet(flat_path)
    n = flat.count()
    B = args.batches
    results: dict = {"n_vectors": n, "batches": B}
    ok = True

    # build on batch 0, append the rest batch-keyed (the streaming shape)
    idx = f"{base}/ivfpq"
    ivfpq_build_index(flat.where(F.col("vec_id") % B == 0), idx,
                      n_cells=16, m=16, ksub=32, cache_key=flat_path,
                      dim=dim, drift_reference=False)
    t0 = time.time()
    for b in range(1, B):
        ivfpq_append(flat.where(F.col("vec_id") % B == b),
                     f"{idx}/ingest_batch={b}", mode="overwrite")
    results["ingest_sec"] = round(time.time() - t0, 2)

    qv = np.asarray(
        finite_vectors(flat, "embedding", dim)
        .where(F.col("vec_id") == 0).select("embedding").first()[0],
        dtype=np.float64,
    )

    def probe():
        return [tuple(r) for r in ivfpq_probe_indexed(
            spark, idx, qv, k=10, nprobe=16, shortlist=4000,
            exclude_id=0).collect()]

    want = probe()
    # mixed root (built cell=* + batch-keyed dirs): counts go through
    # the depth-group-aware reader, plain spark.read.parquet conflicts
    n_before = similarity._read_index_root(spark, idx, "cell").count()
    results["rows_before_crash"] = n_before
    import os

    n_dirs_before = sum(
        1 for d in os.listdir(idx)
        if d.startswith(("cell=", "ingest_batch="))
    )
    results["data_dirs_before_crash"] = n_dirs_before

    # crash the compaction post-swap, pre-commit-sentinel (the marker
    # re-list call #4: stale-check, snapshot, pre-swap, post-swap)
    real = similarity._list_append_markers
    calls = {"n": 0}

    def crashing(spark_, root):
        calls["n"] += 1
        if calls["n"] == 4:
            raise RuntimeError("injected crash after swap")
        return real(spark_, root)

    similarity._list_append_markers = crashing
    t0 = time.time()
    try:
        ann_index_compact(spark, idx)
        ok = False
        results["crash_injected"] = False
    except RuntimeError:
        results["crash_injected"] = True
    finally:
        similarity._list_append_markers = real
    results["crashed_compact_sec"] = round(time.time() - t0, 2)

    # the crashed state really holds every row twice (cells + tombs)
    names = os.listdir(idx)
    cell_dirs = [f"{idx}/{d}" for d in names if d.startswith("cell=")]
    dup_rows = spark.read.option("basePath", idx).parquet(*cell_dirs).count()
    results["rows_in_swapped_cells"] = dup_rows
    ok &= dup_rows == n_before  # the full corpus, duplicated vs tombs

    t0 = time.time()
    stats = ann_index_recover(spark, idx)
    results["recover_sec"] = round(time.time() - t0, 2)
    results["recover_stats"] = stats
    ok &= stats["recovered"] == n_dirs_before
    ok &= stats["staged_removed"] > 0

    n_after = similarity._read_index_root(spark, idx, "cell").count()
    results["rows_after_recover"] = n_after
    results["recover_lossless"] = n_after == n_before
    ok &= results["recover_lossless"]
    got = probe()
    results["probe_identity_after_recover"] = got == want and len(got) == 10
    ok &= results["probe_identity_after_recover"]
    rep = ann_index_verify(spark, idx)
    results["verify_ok_after_recover"] = rep["ok"]
    ok &= rep["ok"]

    t0 = time.time()
    cstats = ann_index_compact(spark, idx)
    results["rerun_compact_sec"] = round(time.time() - t0, 2)
    results["batch_dirs_folded"] = cstats["n_batch_dirs_folded"]
    got2 = probe()
    results["probe_identity_after_compact"] = got2 == want
    ok &= results["probe_identity_after_compact"]
    ok &= spark.read.parquet(idx).count() == n_before  # folded: flat read

    results["ok"] = bool(ok)
    print(json.dumps(results))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
