#!/usr/bin/env python
"""Per-source calibration window vs the r14 hot-source pre-filter at a
100x skewed scale (VERDICT r13 missing #5).

The plain ``quality_calibrate_by_source`` window shuffles the corpus by
``source`` and a skewed mega-source sorts on ONE task. This script
builds a synthetic 20 M-row corpus with 80 % of rows in one source
(the ``stress_skew_join`` shape) and compares:

- plain: ``percent_rank() OVER (PARTITION BY source ORDER BY score,id)``
  + the 0.8 gate + the per-source aggregate;
- prefiltered: :func:`percent_rank_top_prefiltered` (approximate
  percentile cut on the hot source BEFORE the exact sort) + the same
  gate + aggregate.

Invariant wired into the exit code: the two aggregates are IDENTICAL
row-for-row (the pre-filter is provably exact — the point of the
``domain_cap_prefiltered`` recipe this reuses). Wall-clock for each arm
is reported; the claim is the hot source's windowed set shrinking to
~20 % + slack, which is what caps the single-task sort at 100 TB.

Usage: python scripts/stress_calibrate_skew.py [--rows 20000000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession, Window, functions as F


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from dask_hivemetastore_spark.operators.curation import (
        percent_rank_top_prefiltered,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("stress-calibrate-skew")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    n = args.rows
    # 80% of rows land in source 'hot'; 20 cold sources share the rest.
    # Score is a deterministic hash-derived double with deliberate ties.
    df = (
        spark.range(n)
        .select(
            F.col("id"),
            F.when(F.col("id") % 5 != 0, F.lit("hot"))
            .otherwise(
                F.concat(F.lit("cold_"),
                         (F.col("id") / 5).cast("long") % 20)
            )
            .alias("source"),
            ((F.xxhash64("id") % 100_000) / F.lit(100_000.0)).alias("score"),
        )
        .persist()
    )
    df.count()

    def plain():
        w = Window.partitionBy("source").orderBy("score", "id")
        ranked = df.withColumn("pct", F.percent_rank().over(w))
        return ranked.groupBy("source").agg(
            F.count(F.when(F.col("pct") >= 0.8, 1)).alias("n_kept"),
            F.count("*").alias("n_docs"),
            F.round(
                F.min(F.when(F.col("pct") >= 0.8, F.col("score"))), 6
            ).alias("cutoff_score"),
        )

    def prefiltered():
        n_docs = df.groupBy("source").agg(F.count("*").alias("n_docs"))
        ranked = percent_rank_top_prefiltered(
            df, "score", "source", "id", 0.8, hot_group_threshold=1_000_000
        )
        kept = ranked.where(F.col("pct") >= 0.8).groupBy("source").agg(
            F.count("*").alias("n_kept"),
            F.round(F.min("score"), 6).alias("cutoff_score"),
        )
        return (
            F.broadcast(n_docs)
            .join(kept, "source", "left")
            .select(
                "source",
                F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                "n_docs",
                "cutoff_score",
            )
        )

    t0 = time.perf_counter()
    a = {tuple(r) for r in plain().collect()}
    t_plain = time.perf_counter() - t0

    t0 = time.perf_counter()
    b = {tuple(r) for r in prefiltered().collect()}
    t_pre = time.perf_counter() - t0

    identical = a == b
    out = {
        "rows": n,
        "hot_share": 0.8,
        "plain_s": round(t_plain, 2),
        "prefiltered_s": round(t_pre, 2),
        "speedup": round(t_plain / max(t_pre, 1e-9), 2),
        "identical": identical,
        "n_sources": len(a),
    }
    print(json.dumps(out))
    spark.stop()
    return 0 if identical else 1


if __name__ == "__main__":
    sys.exit(main())
