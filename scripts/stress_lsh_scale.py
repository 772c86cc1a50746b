#!/usr/bin/env python
"""Materialized LSH postings vs inline re-hash at 100x corpus scale (r12).

Companion to scripts/stress_ivf_scale.py, for the r12 postings layout
(`lsh_build_index` / `lsh_probe_indexed` / `lsh_append`): the sf0.1
embeddings (2 000 x 64-dim) replicate 100x to 200 000 vectors written to
parquet, so both paths pay real scan I/O.

Measured claims, each wired into the exit code where it is an
invariant (not a timing):

- probe identity: `lsh_probe_indexed` over the materialized postings
  returns row-for-row what inline `lsh_topk` returns (same seeded
  planes -> same candidates -> same exact scores) — on 100x data, not
  just the fixture;
- amortization: the inline path re-hashes the corpus per query
  (n_tables GEMM passes over 200 k vectors), the indexed path reads
  pruned postings + rescores candidates — report both latencies and
  the build cost they amortize;
- append ≡ rebuild: postings grown by `lsh_append` batches are
  content-identical to a one-shot build over the union, and the probe
  is oblivious to ingest history;
- candidate fraction: the postings restriction actually prunes
  (reported; on this near-orthogonal fixture ~45% at 16x8-bit — the
  honest number, see PERF.md r12).

Usage: python scripts/stress_lsh_scale.py [--reps 100] [--n-tables 16]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

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
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--bits", type=int, default=8)
    ap.add_argument("--n-tables", type=int, default=16)
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from dask_hivemetastore_spark.catalog import load_table
    from dask_hivemetastore_spark.operators.similarity import (
        lsh_append,
        lsh_build_index,
        lsh_probe_indexed,
        lsh_topk,
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
    base = tempfile.mkdtemp(prefix="lsh_scale_")
    flat_path = f"{base}/flat"
    big.write.mode("overwrite").parquet(flat_path)
    flat = spark.read.parquet(flat_path)
    n = flat.count()
    results: dict = {"n_vectors": n, "bits": args.bits,
                     "n_tables": args.n_tables}

    kw = dict(dim=dim, bits=args.bits, n_tables=args.n_tables)

    # one-shot build (the ingest-time cost the probes amortize)
    oneshot = f"{base}/postings"
    t0 = time.time()
    lsh_build_index(flat, oneshot, **kw)
    results["index_build_sec"] = round(time.time() - t0, 2)
    post = spark.read.parquet(oneshot)
    results["postings_rows"] = post.count()

    # probe identity across ALL THREE paths on 100x data (r13: the
    # INT8-screened rescore is the default; it must stay row-identical
    # to the all-float rescore and the inline re-hash)
    p_int8 = [tuple(r) for r in lsh_probe_indexed(
        flat, oneshot, query_id=0, k=10, rescore="int8", **kw).collect()]
    p_float = [tuple(r) for r in lsh_probe_indexed(
        flat, oneshot, query_id=0, k=10, rescore="float", **kw).collect()]
    i_rows = [tuple(r) for r in lsh_topk(flat, 0, k=10, **kw).collect()]
    results["probe_identity"] = (
        p_int8 == p_float == i_rows and len(p_int8) == 10
    )
    p_rows = p_int8

    results["indexed_probe_int8_sec"] = _best(
        3, lambda: lsh_probe_indexed(
            flat, oneshot, query_id=0, k=10, rescore="int8",
            **kw).collect()
    )
    results["indexed_probe_float_sec"] = _best(
        3, lambda: lsh_probe_indexed(
            flat, oneshot, query_id=0, k=10, rescore="float",
            **kw).collect()
    )
    results["inline_rehash_sec"] = _best(
        3, lambda: lsh_topk(flat, 0, k=10, **kw).collect()
    )
    results["amortization_x"] = round(
        results["inline_rehash_sec"] / results["indexed_probe_int8_sec"], 1
    )
    results["int8_vs_float_rescore_x"] = round(
        results["indexed_probe_float_sec"]
        / results["indexed_probe_int8_sec"], 2
    )

    # scanned-FLOAT-bytes accounting (r13, VERDICT r12 next #4's done
    # condition): the float path exact-rescores every candidate
    # (|cand| x dim x 4B); the int8 path screens candidates against
    # 1B/dim codes and exact-rescores only the shortlist. Candidate
    # count derived from the same probe condition the probe uses.
    from functools import reduce
    from operator import or_

    import numpy as np

    from dask_hivemetastore_spark.operators.similarity import _hyperplanes

    qv = np.asarray(
        flat.where("vec_id = 0").select("embedding").first()[0],
        dtype=np.float64,
    )
    planes = _hyperplanes(dim, args.bits, seed=42, n_tables=args.n_tables)
    w = 1 << np.arange(args.bits)
    conds = []
    for t in range(args.n_tables):
        qb = int((((qv @ planes[t].T) > 0) * w).sum())
        probes = [qb] + [qb ^ (1 << i) for i in range(args.bits)]
        conds.append((F.col("table") == t) & F.col("bucket").isin(probes))
    n_cand = (
        post.where(reduce(or_, conds)).select("vec_id").distinct().count()
    )
    shortlist = max(4 * 10, 10 + 32)
    results["candidate_fraction"] = round(n_cand / n, 3)
    results["float_bytes_float_path"] = n_cand * dim * 4
    results["float_bytes_int8_path"] = shortlist * dim * 4
    results["int8_screen_bytes"] = n_cand * (dim + 8)  # codes + scale
    results["scanned_float_bytes_reduction_x"] = round(
        n_cand / shortlist, 1
    )

    # append ≡ rebuild on 100x data
    grown = f"{base}/grown"
    lsh_build_index(flat.where(F.pmod("vec_id", F.lit(10)) != 0), grown, **kw)
    t0 = time.time()
    lsh_append(flat.where(F.pmod("vec_id", F.lit(10)) == 0), grown, **kw)
    results["append_batch_sec"] = round(time.time() - t0, 2)
    results["append_vs_rebuild_speedup"] = round(
        results["index_build_sec"] / max(results["append_batch_sec"], 1e-9), 1
    )
    g, o = spark.read.parquet(grown), post
    results["append_identical_to_rebuild"] = bool(
        g.count() == results["postings_rows"]
        and g.exceptAll(o).count() == 0
        and o.exceptAll(g).count() == 0
    )
    ap_rows = [tuple(r) for r in lsh_probe_indexed(
        flat, grown, query_id=0, k=10, **kw).collect()]
    results["append_probe_equals_oneshot"] = ap_rows == p_rows

    print(json.dumps(results))
    ok = (results["probe_identity"]
          and results["append_identical_to_rebuild"]
          and results["append_probe_equals_oneshot"])
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
