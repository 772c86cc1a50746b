#!/usr/bin/env python
"""Materialized IVF+PQ probe at 100x corpus scale (r14).

Companion to scripts/stress_batch_probe.py: the sf0.1 embeddings
replicate 100x to 200 000 vectors, then the same single-query workload
is served by three layouts:

- IVF (float rescore of the probed cells) — the r11 layout;
- IVF + INT8 screen (``int8_cols=True``) — the r13 screen;
- IVF+PQ (``ivfpq_build_index``) — cells × 16-byte ADC codes × pushed-In
  exact rescore.

Invariants wired into the exit code:

- exactness-at-full-config: the IVFPQ probe at nprobe=n_cells with a
  wide shortlist equals the plain IVF probe at nprobe=n_cells
  row-for-row (ADC only prunes; the exact rescore decides);
- serving-config identity across the screen variants is NOT asserted
  (nprobe<n_cells recall differs by design) — instead recall@10 vs the
  full-config answer is REPORTED per layout.

Reported: probe wall per layout (best-of-N), on-disk bytes of the
column each screen reads (float embedding vs qvec INT8 vs pq_code) —
the I/O story behind the wall numbers.

Usage: python scripts/stress_ivfpq.py [--reps 100] [--timing-reps 3]
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--timing-reps", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from dask_hivemetastore_spark.catalog import load_table
    from dask_hivemetastore_spark.operators.similarity import (
        finite_vectors,
        ivf_build_index,
        ivf_probe_indexed,
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
    base = tempfile.mkdtemp(prefix="ivfpq_stress_")
    flat_path = f"{base}/flat"
    big.write.mode("overwrite").parquet(flat_path)
    flat = spark.read.parquet(flat_path)
    n = flat.count()
    results: dict = {"n_vectors": n}
    ok = True

    qv = np.asarray(
        finite_vectors(flat, "embedding", dim)
        .where(F.col("vec_id") == 0).select("embedding").first()[0],
        dtype=np.float64,
    )

    ivf_f = f"{base}/ivf_float"
    ivf_build_index(flat, ivf_f, n_cells=16, cache_key=flat_path, dim=dim,
                    drift_reference=False)
    ivf_q = f"{base}/ivf_int8"
    ivf_build_index(flat, ivf_q, n_cells=16, cache_key=flat_path, dim=dim,
                    drift_reference=False, int8_cols=True)
    pq = f"{base}/ivfpq"
    ivfpq_build_index(flat, pq, n_cells=16, m=16, ksub=32,
                      cache_key=flat_path, dim=dim, drift_reference=False)

    def probe_float():
        return [tuple(r) for r in ivf_probe_indexed(
            spark, ivf_f, None, qv, k=10, nprobe=8, exclude_id=0,
            rescore="float").collect()]

    def probe_int8():
        return [tuple(r) for r in ivf_probe_indexed(
            spark, ivf_q, None, qv, k=10, nprobe=8, exclude_id=0,
            rescore="int8").collect()]

    def probe_pq():
        return [tuple(r) for r in ivfpq_probe_indexed(
            spark, pq, qv, k=10, nprobe=8, shortlist=50,
            exclude_id=0).collect()]

    # exactness-at-full-config invariant
    full_ivf = [tuple(r) for r in ivf_probe_indexed(
        spark, ivf_f, None, qv, k=10, nprobe=16, exclude_id=0,
        rescore="float").collect()]
    full_pq = [tuple(r) for r in ivfpq_probe_indexed(
        spark, pq, qv, k=10, nprobe=16, shortlist=500,
        exclude_id=0).collect()]
    ok &= full_pq == full_ivf
    results["full_config_identical"] = full_pq == full_ivf

    truth = {t[0] for t in full_ivf}
    for name, fn in [("float", probe_float), ("int8", probe_int8),
                     ("pq", probe_pq)]:
        got = fn()
        results[f"{name}_recall_at_10"] = round(
            len({t[0] for t in got} & truth) / 10, 2)
        results[f"{name}_probe_sec"] = _best(args.timing_reps, fn)

    # bytes of the column each screen decodes, from parquet metadata
    import pyarrow.parquet as pqt
    import glob as _g
    import os as _os

    def col_bytes(root: str, col: str) -> int:
        total = 0
        for f in _g.glob(f"{root}/**/*.parquet", recursive=True):
            if "_index_manifest" in f:
                continue
            md = pqt.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for c in range(g.num_columns):
                    cc = g.column(c)
                    if cc.path_in_schema.split(".")[0] == col:
                        total += cc.total_compressed_size
        return total
    _os.stat(base)  # keep linters honest about the import use

    results["screen_col_bytes"] = {
        "float_embedding": col_bytes(ivf_f, "embedding"),
        "int8_qvec": col_bytes(ivf_q, "qvec"),
        "pq_code": col_bytes(pq, "pq_code"),
    }

    # ---- batch vs loop (Q=8), identity wired into the exit code ----
    from dask_hivemetastore_spark.operators.similarity import (
        ivfpq_probe_indexed_batch,
    )

    qids = list(range(8))
    qvecs = {
        int(r[0]): np.asarray(r[1], dtype=np.float64)
        for r in finite_vectors(flat, "embedding", dim)
        .where(F.col("vec_id").isin(qids))
        .select("vec_id", "embedding").collect()
    }

    def pq_loop():
        out = {}
        for q in qids:
            out[q] = {(r.vec_id, r.cosine) for r in ivfpq_probe_indexed(
                spark, pq, qvecs[q], k=5, nprobe=8, shortlist=40,
                exclude_id=q).collect()}
        return out

    def pq_batch():
        out = {}
        for r in ivfpq_probe_indexed_batch(
            flat, pq, qids, k=5, nprobe=8, shortlist=40
        ).collect():
            out.setdefault(r.q_id, set()).add((r.vec_id, r.cosine))
        return out

    ok &= pq_batch() == pq_loop()
    results["pq_loop_sec"] = _best(args.timing_reps, pq_loop)
    results["pq_batch_sec"] = _best(args.timing_reps, pq_batch)
    results["pq_batch_speedup_x"] = round(
        results["pq_loop_sec"] / results["pq_batch_sec"], 2)

    print(json.dumps(results))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
