#!/usr/bin/env python
"""100x scale stress for the K3 batched retrieval paths: knn_join (batched
exact knn JOIN) and PQ/ADC (code-column scan + rerank) against a corpus
100x the sf0.1 embeddings table.

Corpus: synthetic unit-normalized 64-dim vectors from one seeded numpy
draw (deterministic), ids 0..N-1 — the fixture's shape at 100x its row
count. Checks are exactness/recall invariants, not just wall-clock:

- knn_join's 16-query batch answer must EQUAL the 16 independent
  brute-force knn_topk answers (the prune must stay lossless at scale),
  while costing ONE corpus scan instead of 16;
- PQ reranked recall@10 vs exact is reported (the ADC screen is lossy by
  design; the number quantifies it at scale), plus the ADC-scan wall
  against the brute-force scan wall.

r9 (VERDICT r8 #4): a --corrupt-frac block of NaN/Inf-component vectors
rides along (default 1%), and the run FAILS unless (a) exclusion
accounting is exact — finite_vectors(emb) + corrupt == corpus, (b) no
corrupt id appears in any knn_join/knn_topk/PQ ranking, and (c) the
recall floor vs the CLEAN exact answer still holds with corrupt rows
present.

Usage: python scripts/stress_knn.py [--n 50000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np
import pandas as pd


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--queries", type=int, default=16)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument(
        "--corrupt-frac", type=float, default=0.01,
        help="fraction of ADDITIONAL corrupt (NaN/Inf-component) rows "
             "injected on top of the clean corpus (VERDICT r8 #4: the "
             "r8 finite guards unit-test at sf0.01; this asserts the "
             "exclusion ACCOUNTING at 100x scale)",
    )
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession

    from dask_hivemetastore_spark.operators import similarity as S
    from dask_hivemetastore_spark.session import ensure_runtime_confs

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    ensure_runtime_confs(spark)

    rng = np.random.default_rng(42)
    x = rng.standard_normal((args.n, 64))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    # corrupt block: ids >= n, each vector poisoned with NaN, +Inf or
    # -Inf components (cycled) — a statistical certainty in a 100 TB
    # corpus; every ranking/index path must exclude them, never rank them
    n_corrupt = int(args.n * args.corrupt_frac)
    poisons = [float("nan"), float("inf"), float("-inf")]
    bad = rng.standard_normal((n_corrupt, 64))
    for i in range(n_corrupt):
        bad[i, i % 64] = poisons[i % 3]
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(args.n + n_corrupt, dtype=np.int64),
            "embedding": [row.astype(np.float32).tolist() for row in x]
            + [row.astype(np.float32).tolist() for row in bad],
            "label": (np.arange(args.n + n_corrupt) % 10).astype(np.int32),
        }
    )
    emb = spark.createDataFrame(pdf).repartition(32).localCheckpoint()
    emb.count()

    results: dict = {"n": args.n, "queries": args.queries, "k": args.k,
                     "n_corrupt": n_corrupt}

    # exclusion accounting: eligible + corrupt == corpus, exactly
    n_eligible = S.finite_vectors(emb).count()
    results["accounting_ok"] = n_eligible + n_corrupt == args.n + n_corrupt
    corrupt_ids = set(range(args.n, args.n + n_corrupt))
    qids = list(range(args.queries))

    t0 = time.time()
    batch = S.knn_join(emb, qids, k=args.k).collect()
    results["knn_join_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    loop = {}
    for q in qids:
        loop[q] = [
            (r.vec_id, r.cosine) for r in S.knn_topk(emb, q, k=args.k).collect()
        ]
    results["knn_topk_loop_s"] = round(time.time() - t0, 2)

    by_q: dict = {}
    for r in batch:
        by_q.setdefault(r.q_id, []).append((r.vec_id, r.cosine))
    lossless = all(sorted(by_q[q]) == sorted(loop[q]) for q in qids)
    results["batch_equals_loop"] = lossless
    # no corrupt id may appear in ANY ranking (a NaN tops every naive
    # Spark sort; the finite guards must have dropped them)
    ranked_ids = {r.vec_id for r in batch} | {
        vid for rows in loop.values() for vid, _ in rows
    }
    results["rankings_corrupt_free"] = not (ranked_ids & corrupt_ids)

    # --- PQ path ---
    t0 = time.time()
    books = S.pq_train_codebooks(emb)
    codes = S.pq_encode(emb, books).localCheckpoint()
    codes.count()
    results["pq_train_encode_s"] = round(time.time() - t0, 2)

    q0 = np.asarray(
        emb.where("vec_id = 0").select("embedding").collect()[0][0],
        dtype=np.float64,
    )
    t0 = time.time()
    S.pq_adc_topk(codes, books, q0, k=args.k + 1).collect()
    results["adc_scan_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    exact0 = {r.vec_id for r in S.knn_topk(emb, 0, k=args.k).collect()}
    results["brute_scan_s"] = round(time.time() - t0, 2)

    # recall vs shortlist: the serving knob — shortlist must scale with the
    # corpus (≈1% of N), not stay a constant
    exact = {
        q: {r.vec_id for r in S.knn_topk(emb, q, k=args.k).collect()}
        for q in [0, 1, 2, 3, 4]
    }
    curve = {}
    pq_ids_seen: set = set()
    for short in (50, args.n // 100, args.n // 25):
        hits = 0
        for q in exact:
            pq = {
                r.vec_id
                for r in S.pq_topk_reranked(
                    emb, q, k=args.k, shortlist=short
                ).collect()
            }
            pq_ids_seen |= pq
            hits += len(exact[q] & pq)
        curve[short] = round(hits / (args.k * len(exact)), 3)
    results["pq_recall_by_shortlist"] = curve
    results["pq_corrupt_free"] = not (pq_ids_seen & corrupt_ids)
    results["exact0_sanity"] = len(exact0) == args.k

    print(json.dumps(results))
    # the recall floor is measured against the CLEAN exact answer —
    # holding it while corrupt rows are present in the corpus IS the
    # fail-safe claim (corrupt in, clean quality out)
    ok = (lossless and curve[args.n // 100] >= 0.85
          and results["accounting_ok"]
          and results["rankings_corrupt_free"]
          and results["pq_corrupt_free"])
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
