#!/usr/bin/env python
"""Same-session A/B for the prefix-filter join's posting key (r7).

r7 switched `ngram_jaccard_pairs`' inverted index / df counts / prefix
window / candidate self-join from STRING gram keys to ``xxhash64(gram)``
ints (strings survive only in the exact-verify stage, so the answer is
unchanged — collisions can only add candidates that verification
rejects). Shuffled bytes per posting drop from ~3 words to 8 bytes.
Like ``ab_minhash_sig.py``, both variants run on the SAME corpus in the
SAME session — the old variant is loaded from the git commit preceding
the change (pass ``--old-ref``) — so box-speed drift between rounds
can't masquerade as a win. Prints one JSON line.

Usage:
    python scripts/ab_prefix_postings.py [--reps 100] [--old-ref <sha>]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import subprocess
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")


def load_module_from_git(ref: str, relpath: str, name: str):
    src = subprocess.run(
        ["git", "-C", "/root/repo", "show", f"{ref}:{relpath}"],
        capture_output=True, text=True, check=True,
    ).stdout
    path = f"/tmp/{name}.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--old-ref", default="6438190")
    args = ap.parse_args()

    from dask_hivemetastore_spark.catalog import load_table
    from dask_hivemetastore_spark.operators import dedup as new_dedup
    from dask_hivemetastore_spark.session import ensure_runtime_confs
    from scripts.stress_near_dedup import tagged_replicas

    old_dedup = load_module_from_git(
        args.old_ref, "dask_hivemetastore_spark/operators/dedup.py",
        "old_dedup_ab",
    )

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
    n_docs = df.count()

    results = {"reps": args.reps, "n_docs": n_docs}
    # interleave old/new twice: rep 0 absorbs first-touch costs for each
    # variant, rep 1 is the recorded number; pair counts must agree.
    for rep in (0, 1):
        for name, mod in (("old_string_postings", old_dedup),
                          ("new_hashed_postings", new_dedup)):
            t0 = time.time()
            n = mod.ngram_jaccard_pairs(
                df, "doc_id", "text", n=3, threshold=0.9
            ).count()
            results[f"{name}_rep{rep}_sec"] = round(time.time() - t0, 2)
            results[f"{name}_pairs"] = n
    assert results["old_string_postings_pairs"] == results["new_hashed_postings_pairs"]
    results["speedup_rep1"] = round(
        results["old_string_postings_rep1_sec"]
        / results["new_hashed_postings_rep1_sec"], 2
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
