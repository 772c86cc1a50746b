#!/usr/bin/env python
"""IVF index vs brute-force scan at 100x corpus scale.

Companion to scripts/ivf_recall_curve.py (which measures QUALITY): this
measures the COST side of the trade at a corpus size where the index should
win. The sf0.1 embeddings (2 000 x 64-dim) replicate 100x to 200 000
vectors, written to parquet so both paths pay real scan I/O:

- brute: `knn_topk` over the flat table — every query reads every row;
- indexed: `ivf_build_index` once (corpus written hive-partitioned by
  cell), then `ivf_probe_indexed` at several nprobe — the `cell IN (...)`
  filter is a partition-key predicate, so the scan LISTS only the probed
  directories (plan-asserted in tests/test_plans.py); scan fraction
  reported from the actual per-cell row counts.

Query latencies are warm best-of-3 (the index-build cost is reported
separately — it is a once-per-corpus maintenance pass, like compaction).

r9 (VERDICT r8 #4): a --corrupt-frac block of NaN/Inf-component vectors
is unioned into the flat corpus (default 1%), and the run FAILS unless
(a) exclusion accounting is exact — index rows + corrupt == flat rows,
(b) neither the brute scan nor any probed cell ever ranks a corrupt id,
and (c) the nprobe=16 top-k cosine multiset equals the brute one (the
recall floor on the clean subset, tie-proof under 100x replication).

Usage: python scripts/stress_ivf_scale.py [--reps 100] [--n-cells 64]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


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
    ap.add_argument("--n-cells", type=int, default=64)
    ap.add_argument("--corrupt-frac", type=float, default=0.01)
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from dask_hivemetastore_spark.catalog import load_table
    from dask_hivemetastore_spark.operators.similarity import (
        ivf_build_index,
        ivf_probe_indexed,
        knn_topk,
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

    emb = load_table(spark, args.sf_dir, "embeddings")
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
    base = tempfile.mkdtemp(prefix="ivf_scale_")
    flat_path, index_path = f"{base}/flat", f"{base}/ivf"
    # corrupt block (r9): NaN/Inf-component vectors with ids >= 2e9 ride
    # into the flat corpus; the index build and every ranking must
    # exclude them with exact accounting
    import pandas as pd

    n_clean_base = emb.count()
    n_corrupt = int(n_clean_base * args.reps * args.corrupt_frac)
    dim = len(emb.select("embedding").first()[0])
    rng = np.random.default_rng(7)
    bad = rng.standard_normal((n_corrupt, dim))
    poisons = [float("nan"), float("inf"), float("-inf")]
    for i in range(n_corrupt):
        bad[i, i % dim] = poisons[i % 3]
    bad_df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": (2_000_000_000 + np.arange(n_corrupt)).astype(
                    np.int64
                ),
                "embedding": [r.astype(np.float32).tolist() for r in bad],
                "label": np.zeros(n_corrupt, dtype=np.int32),
            }
        )
    ).select(
        "vec_id",
        F.col("embedding").cast(big.schema["embedding"].dataType),
        F.col("label").cast(big.schema["label"].dataType),
    )
    big.unionByName(bad_df).write.mode("overwrite").parquet(flat_path)
    flat = spark.read.parquet(flat_path)
    n = flat.count()
    qv = np.asarray(
        emb.where(F.col("vec_id") == 0).select("embedding").first()[0],
        dtype=np.float64,
    )

    results: dict = {"n_vectors": n, "n_cells": args.n_cells,
                     "n_corrupt": n_corrupt}

    brute_rows = knn_topk(flat, 0, k=10).collect()
    results["brute_corrupt_free"] = all(
        r.vec_id < 2_000_000_000 for r in brute_rows
    ) and len(brute_rows) == 10
    brute_scores = sorted(round(r.cosine, 6) for r in brute_rows)

    results["brute_sec"] = _best(
        3, lambda: knn_topk(flat, 0, k=10).collect()
    )

    t0 = time.time()
    C = ivf_build_index(
        flat, index_path, n_cells=args.n_cells, cache_key=index_path
    )
    results["index_build_sec"] = round(time.time() - t0, 2)

    # exclusion accounting: every corrupt row excluded from the index,
    # every clean row present — indexed + corrupt == flat, exactly
    indexed = spark.read.parquet(index_path)
    n_indexed = indexed.count()
    results["accounting_ok"] = bool(
        n_indexed + n_corrupt == n
        and indexed.where(F.col("vec_id") >= 2_000_000_000).count() == 0
    )

    cell_rows = {
        r.cell: r.n
        for r in spark.read.parquet(index_path)
        .groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    probe_corrupt_free = True
    probe16_scores: list = []
    for nprobe in (4, 8, 16):
        rows = ivf_probe_indexed(
            spark, index_path, C, qv, k=10, nprobe=nprobe, exclude_id=0
        ).collect()
        probe_corrupt_free &= all(r.vec_id < 2_000_000_000 for r in rows)
        if nprobe == 16:
            probe16_scores = sorted(round(r.cosine, 6) for r in rows)
        sec = _best(
            3,
            lambda: ivf_probe_indexed(
                spark, index_path, C, qv, k=10, nprobe=nprobe, exclude_id=0
            ).collect(),
        )
        probes = [int(c) for c in (C @ qv).argsort()[::-1][:nprobe]]
        frac = sum(cell_rows.get(c, 0) for c in probes) / n
        results[f"ivf_nprobe{nprobe}"] = {
            "sec": sec,
            "scan_frac": round(frac, 3),
            "speedup_vs_brute": round(results["brute_sec"] / sec, 1),
        }
    results["probes_corrupt_free"] = bool(probe_corrupt_free)
    # recall floor on the clean subset: replicated ids make id-recall
    # tie-arbitrary, so compare the top-k COSINE multiset instead
    results["recall_floor_clean"] = probe16_scores == brute_scores

    # --- r13 INT8-screen arm (opt-in int8_cols index): the probe
    # screens probed cells on the 4x-narrower codes and exact-rescores
    # only the bounded shortlist via a pushed In(id) filter. Invariant:
    # the top-k COSINE multiset equals the float path's at nprobe=8;
    # measured: both walls + the float-byte accounting.
    coded_path = f"{base}/ivf_int8"
    t0 = time.time()
    ivf_build_index(flat, coded_path, n_cells=args.n_cells,
                    cache_key=index_path, int8_cols=True)
    results["int8_index_build_sec"] = round(time.time() - t0, 2)
    i8_scores = sorted(round(r.cosine, 6) for r in ivf_probe_indexed(
        spark, coded_path, C, qv, k=10, nprobe=8, exclude_id=0,
        rescore="int8").collect())
    f_scores = sorted(round(r.cosine, 6) for r in ivf_probe_indexed(
        spark, coded_path, C, qv, k=10, nprobe=8, exclude_id=0,
        rescore="float").collect())
    results["int8_probe_identity"] = i8_scores == f_scores
    results["ivf_nprobe8_int8_sec"] = _best(
        3, lambda: ivf_probe_indexed(
            spark, coded_path, C, qv, k=10, nprobe=8, exclude_id=0,
            rescore="int8").collect())
    results["ivf_nprobe8_float_sec_coded"] = _best(
        3, lambda: ivf_probe_indexed(
            spark, coded_path, C, qv, k=10, nprobe=8, exclude_id=0,
            rescore="float").collect())
    probes8 = [int(c) for c in (C @ qv).argsort()[::-1][:8]]
    n_probed = sum(cell_rows.get(c, 0) for c in probes8)
    results["int8_float_bytes_float_path"] = n_probed * dim * 4
    results["int8_float_bytes_int8_path"] = max(4 * 10, 10 + 32) * dim * 4
    results["int8_screen_bytes"] = n_probed * (dim + 8)

    # --- r11 incremental-append arm: maintenance cost of ingest.
    # Resident index = 90% of the corpus written once; the arriving 10%
    # batch (with its share of the corrupt block — append-time exclusion
    # must hold too) is assigned against the SAME centroids and appended.
    # Invariants: grown index content-identical to the one-shot build,
    # and the nprobe=16 probe answer identical. The measured point is
    # append_batch_sec vs index_build_sec — what a daily embedding batch
    # costs against a corpus rewrite.
    from dask_hivemetastore_spark.operators.similarity import (
        ivf_append,
        ivf_assign_full,
    )

    grown_path = f"{base}/ivf_grown"
    resident = flat.where(F.pmod(F.col("vec_id"), F.lit(10)) != 0)
    batch = flat.where(F.pmod(F.col("vec_id"), F.lit(10)) == 0)
    ivf_assign_full(resident, C).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(grown_path)
    t0 = time.time()
    ivf_append(batch, grown_path, C)
    results["append_batch_sec"] = round(time.time() - t0, 2)
    results["append_vs_rebuild_speedup"] = round(
        results["index_build_sec"] / max(results["append_batch_sec"], 1e-9), 1
    )
    g = spark.read.parquet(grown_path).select("vec_id", "cell")
    o = spark.read.parquet(index_path).select("vec_id", "cell")
    results["append_identical_to_rebuild"] = bool(
        g.count() == n_indexed
        and g.exceptAll(o).count() == 0
        and o.exceptAll(g).count() == 0
    )
    ap_scores = sorted(
        round(r.cosine, 6)
        for r in ivf_probe_indexed(
            spark, grown_path, C, qv, k=10, nprobe=16, exclude_id=0
        ).collect()
    )
    results["append_probe_equals_oneshot"] = ap_scores == probe16_scores

    # --- r12 drift arm (VERDICT r11 next #2): centroid drift as a
    # MEASURED retrain trigger. Two batches are scored with
    # ivf_drift_stats against the training-corpus reference:
    #   control = the in-distribution 10% batch  -> must NOT flag;
    #   shifted = the same batch + alpha*u offset, renormalized (a
    #             deliberate distribution shift)  -> MUST flag.
    # Alongside the detector, the arm measures what drift actually does
    # to the index: the shifted batch's occupancy collapse (max cell
    # share), the scan fraction a shifted query pays at nprobe=4 on the
    # drifted index, and recall@10 of the shifted query vs brute force
    # over the same drifted corpus. Exit code flips unless the detector
    # separates the two batches.
    from dask_hivemetastore_spark.operators.similarity import (
        ivf_drift_flag,
        ivf_drift_reference,
        ivf_drift_stats,
        shift_vectors,
    )

    alpha, u = 2.0, np.ones(dim) / np.sqrt(dim)
    shifted = shift_vectors(batch, alpha=alpha, dim=dim)

    # r13: the reference is the manifest payload — training-time mean +
    # per-slice sigma — and the PRIMARY flag is the derived per-index
    # 3-sigma threshold (VERDICT r12 next #3 done condition: fixture
    # margins re-measured here); the global-delta fallback flags are
    # reported alongside for comparison.
    refd = ivf_drift_reference(resident, C, dim=dim)
    ref = (refd["ref_mean"], refd["ref_max_share"], refd["n"])
    ctl = ivf_drift_stats(batch, C, dim=dim)
    sh = ivf_drift_stats(shifted, C, dim=dim)
    results["drift"] = {
        "ref_mean_dot": round(ref[0], 4), "ref_max_share": round(ref[1], 4),
        "ref_sigma": round(refd["ref_sigma"], 5),
        "threshold_3sigma": round(3 * refd["ref_sigma"], 4),
        "control_mean_dot": round(ctl[0], 4),
        "control_max_share": round(ctl[1], 4),
        "shifted_mean_dot": round(sh[0], 4),
        "shifted_max_share": round(sh[1], 4),
        "control_flagged": ivf_drift_flag(ctl, ref,
                                          sigma=refd["ref_sigma"]),
        "shifted_flagged": ivf_drift_flag(sh, ref,
                                          sigma=refd["ref_sigma"]),
        "control_flagged_global_fallback": ivf_drift_flag(ctl, ref),
        "shifted_flagged_global_fallback": ivf_drift_flag(sh, ref),
    }

    # what drift does to serving: append the shifted batch (fixed
    # centroids), then probe with a shifted query
    drift_path = f"{base}/ivf_drifted"
    ivf_assign_full(resident, C).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(drift_path)
    ivf_append(shifted, drift_path, C, dim=dim)
    qv_sh = (qv + alpha * u)
    qv_sh /= np.linalg.norm(qv_sh)
    drift_cells = {
        r.cell: r.n
        for r in spark.read.parquet(drift_path)
        .groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    n_drift = sum(drift_cells.values())
    probes4 = [int(c) for c in (C @ qv_sh).argsort()[::-1][:4]]
    results["drift"]["shifted_query_scan_frac_nprobe4"] = round(
        sum(drift_cells.get(c, 0) for c in probes4) / n_drift, 3
    )
    # exact reference = probe at FULL cell coverage (nprobe = n_cells
    # scans every row of the drifted corpus — brute force by definition)
    brute_sh = {
        r.vec_id
        for r in ivf_probe_indexed(
            spark, drift_path, C, qv_sh, k=10, nprobe=args.n_cells
        ).collect()
    }
    got = {
        r.vec_id
        for r in ivf_probe_indexed(
            spark, drift_path, C, qv_sh, k=10, nprobe=16
        ).collect()
    }
    results["drift"]["shifted_query_recall_at16"] = round(
        len(got & brute_sh) / 10, 2
    )

    print(json.dumps(results))
    ok = (results["accounting_ok"] and results["brute_corrupt_free"]
          and results["probes_corrupt_free"]
          and results["recall_floor_clean"]
          and results["int8_probe_identity"]
          and results["append_identical_to_rebuild"]
          and results["append_probe_equals_oneshot"]
          and not results["drift"]["control_flagged"]
          and results["drift"]["shifted_flagged"])
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
