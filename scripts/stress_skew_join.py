#!/usr/bin/env python
"""Skew-join stress: plain shuffle join vs key salting vs AQE skew split.

A zipf-ish fact table (80% of rows share ONE key) equi-joined against a
medium dimension that is forced OFF the broadcast path — the shape where a
plain shuffle join serializes the hot key on one reducer. Three plans over
identical data:

1. plain sort-merge join, AQE skew handling OFF — the pathological base;
2. `operators.skew.salted_join` (explicit salting, S buckets) — the
   portable rewrite that also works for aggregations;
3. plain join with `spark.sql.adaptive.skewJoin.enabled=true` — Spark's
   runtime split of oversized partitions.

All three must return the SAME row count (salting is semantics-preserving;
asserted), and the report shows per-variant wall-clock. The per-task skew
is visible in the Spark UI at real scale; locally the wall-clock gap is
modest (32 threads share one box) — the point is the plan shapes and that
the hot key's group fans out over buckets.

Usage: python scripts/stress_skew_join.py [--rows 20000000] [--buckets 32]
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
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--dim-rows", type=int, default=100_000)
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from dask_hivemetastore_spark.operators.skew import salted_join
    from dask_hivemetastore_spark.session import ensure_runtime_confs

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    ensure_runtime_confs(spark)
    # force the shuffle-join shape the operator exists for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    # 80% of fact rows hit key 0; the rest spread uniformly
    fact = spark.range(args.rows).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") % 5 < 4, F.lit(0))
        .otherwise(F.pmod(F.hash("id"), F.lit(args.dim_rows)))
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    ).localCheckpoint()
    dim = spark.range(args.dim_rows).select(
        F.col("id").alias("k"), F.sha2(F.col("id").cast("string"), 256).alias("name")
    ).localCheckpoint()

    def timed(name: str, skew_flag: str, fn) -> dict:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_flag)
        fn()  # warm
        t0 = time.time()
        n = fn()
        return {"variant": name, "sec": round(time.time() - t0, 2), "rows": n}

    results = [
        timed(
            "plain_skewed", "false",
            lambda: fact.join(dim, "k").count(),
        ),
        timed(
            "salted", "false",
            lambda: salted_join(
                fact, dim, ["k"], unique_expr=F.col("rid"),
                buckets=args.buckets,
            ).count(),
        ),
        timed(
            "aqe_skew_split", "true",
            lambda: fact.join(dim, "k").count(),
        ),
    ]
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")  # restore
    counts = {r["rows"] for r in results}
    assert len(counts) == 1, f"variants disagree: {results}"
    print(json.dumps({"rows": args.rows, "buckets": args.buckets,
                      "results": results, "counts_identical": True}))


if __name__ == "__main__":
    main()
