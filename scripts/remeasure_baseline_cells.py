#!/usr/bin/env python
"""Re-measure the sub-second BASELINE.md PySpark cells under bench.py's
current draw protocol (r12, VERDICT r11 #4 + ADVICE r12 #3).

bench.py gives any cell whose best-of-3 lands under 0.5 s four extra
draws (best-of-7 total, r11 de-noising). The committed BASELINE.md cells
were measured best-of-3 (r0/r2 methodology), so for those cells the 2×
gate compared a best-of-7 numerator against a best-of-3 denominator —
min-of-more-draws is biased low, loosening the gate asymmetrically
(advisor r12 #3). This script restates the affected cells like-for-like:

- SAME neutral engine baseline as BASELINE.md: plain declarative
  PySpark/SQL over the raw parquet (NOT this repo's tuned operators),
  `local[8]`, `shuffle.partitions=8`, UI off, warm session.
- SAME protocol as bench.py: two untimed warm sweeps over all cells,
  then per cell best-of-3 + 4 extra draws if the best-of-3 is < 0.5 s;
  per-cell draw counts are recorded so the comparison is auditable.

Prints one JSON line: {cell: {"best3": s, "best": s, "draws": n}, ...}.
Usage: python scripts/remeasure_baseline_cells.py [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession, Window, functions as F

EXTRA_RUNS_BELOW_SEC = 0.5
RUNS, EXTRA_RUNS = 3, 4


def build_cells(spark, sf_dir):
    """The plain declarative forms BASELINE.md's cells were measured
    with (mirroring each registry query's semantics, none of the repo's
    operator code)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def q6():
        return (
            li.where(
                (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
                & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
                & (F.col("l_discount") >= 0.05)
                & (F.col("l_discount") <= 0.07)
                & (F.col("l_quantity") < 24)
            )
            .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2))
        )

    def events_tumbling():
        return (
            ev.groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(
                F.count("*").alias("n_events"),
                F.countDistinct("user_id").alias("n_users"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
            .select(
                F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss"),
                "n_events", "n_users", "total_value",
            )
        )

    def window_rank():
        w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
        return (
            orders.select("o_custkey", "o_orderkey", "o_totalprice",
                          F.rank().over(w).alias("rk"))
            .where(F.col("rk") <= 3)
        )

    def distinct_users():
        return ev.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("n_users")
        )

    def knn():
        q = emb.where(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv")
        )
        dot = F.aggregate(
            F.zip_with(
                "embedding", "qv",
                lambda x, y: x.cast("double") * y.cast("double"),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        return (
            emb.where(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(q))
            .select("vec_id", "label", F.round(dot, 6).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .limit(10)
        )

    return {
        "q6_revenue_delta": q6,
        "events_tumbling_1h": events_tumbling,
        "window_rank_orders": window_rank,
        "distinct_users": distinct_users,
        "knn_cosine_top10": knn,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cells = build_cells(spark, args.sf_dir)

    for _ in range(2):  # bench.py's double warm sweep
        for fn in cells.values():
            fn().collect()

    out = {}
    for name, fn in cells.items():
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn().collect()
            times.append(time.perf_counter() - t0)
        if min(times) < EXTRA_RUNS_BELOW_SEC:
            for _ in range(EXTRA_RUNS):
                t0 = time.perf_counter()
                fn().collect()
                times.append(time.perf_counter() - t0)
        out[name] = {
            "best3": round(min(times[:RUNS]), 4),
            "best": round(min(times), 4),
            "draws": len(times),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
