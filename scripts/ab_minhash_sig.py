#!/usr/bin/env python
"""Same-session A/B for the MinHash signature+banding stage (VERDICT r6 #4).

The r6 stress attributed 100 s of the 500 k-doc LSH wall to per-gram
``blake2b`` Python hashing inside the Arrow batch loop. r7 moved gram
hashing to the JVM (``xxhash64`` in a ``transform`` lambda) and made the
Python stage pure numpy (``minimum.reduceat`` across the whole batch).
Box speed drifts round to round (PERF.md:3-12), so this script times BOTH
implementations on the SAME corpus in the SAME session — the old one
reproduced inline verbatim — and prints one JSON line. Run:

    python scripts/ab_minhash_sig.py [--reps 100] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")


def old_band_buckets(grams, id_col, num_perm=128, bands=32):
    """The pre-r7 implementation, verbatim (per-gram blake2b in Python)."""
    from dask_hivemetastore_spark.operators.dedup import (
        MERSENNE_P,
        _minhash_params,
    )

    rows = num_perm // bands
    a_par, b_par = _minhash_params(num_perm)

    def _gram_hashes(gs):
        return np.fromiter(
            (int.from_bytes(
                hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
             for g in gs),
            dtype=np.uint64, count=len(gs),
        )

    def sig_batches(batches):
        for pdf in batches:
            out_rows = []
            for did, gs in zip(pdf[id_col], pdf["grams"]):
                h = _gram_hashes(list(gs))
                hv = (a_par[:, None] * h[None, :] + b_par[:, None]) % MERSENNE_P
                sig = hv.min(axis=1)
                for band in range(bands):
                    chunk = sig[band * rows:(band + 1) * rows]
                    bh = int.from_bytes(
                        hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(),
                        "big", signed=False) >> 1
                    out_rows.append((did, band, bh))
            yield pd.DataFrame(out_rows, columns=[id_col, "band", "band_hash"])

    return grams.mapInPandas(sig_batches, f"{id_col} long, band int, band_hash long")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from dask_hivemetastore_spark.catalog import load_table
    from dask_hivemetastore_spark.operators import dedup as D
    from dask_hivemetastore_spark.session import ensure_runtime_confs
    from scripts.stress_near_dedup import tagged_replicas

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    ensure_runtime_confs(spark)

    base = load_table(spark, args.sf_dir, "documents").select("doc_id", "text")
    df = tagged_replicas(base, args.reps).localCheckpoint()
    grams = D.with_word_ngrams(df, "text", 3).localCheckpoint()  # shared input
    n_docs = grams.count()

    results = {"reps": args.reps, "n_docs": n_docs}
    for name, fn in (("old_blake2b", old_band_buckets),
                     ("new_jvm_xxhash", D.minhash_band_buckets)):
        for attempt in ("cold", "warm"):
            t0 = time.time()
            n = fn(grams, "doc_id").count()
            results[f"{name}_{attempt}_sec"] = round(time.time() - t0, 2)
            results[f"{name}_rows"] = n
    results["speedup_warm"] = round(
        results["old_blake2b_warm_sec"] / results["new_jvm_xxhash_warm_sec"], 2
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
