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


def build_cells(spark, sf_dir, all_cells: bool = False):
    """The plain declarative forms BASELINE.md's cells were measured
    with (mirroring each registry query's semantics, none of the repo's
    operator code). ``all_cells=True`` (r15, VERDICT r14 next #2) adds
    the three super-second cells (q1/q3/q5) so bench.py can re-measure
    the FULL 8-cell denominator in the same box session as its
    numerator — the paired-baseline protocol that makes each BENCH
    artifact self-adjudicating against box contention."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def _ntz(s):
        return F.lit(s).cast("timestamp_ntz")

    def q1():
        disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        charge = disc_price * (1 + F.col("l_tax"))
        return (
            li.where(F.col("l_shipdate") <= _ntz("2001-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 2),
                F.round(F.sum("l_extendedprice"), 2),
                F.round(F.sum(disc_price), 2),
                F.round(F.sum(charge), 2),
                F.round(F.avg("l_quantity"), 6),
                F.round(F.avg("l_extendedprice"), 6),
                F.round(F.avg("l_discount"), 6),
                F.count("*"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )

    def q3():
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet").where(
            F.col("c_mktsegment") == "BUILDING")
        o = orders.where(F.col("o_orderdate") < _ntz("1998-03-15"))
        l3 = li.where(F.col("l_shipdate") > _ntz("1998-03-15"))
        return (
            l3.join(o, l3.l_orderkey == o.o_orderkey)
            .join(cust, o.o_custkey == cust.c_custkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.round(F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ), 2).alias("revenue"))
            .select(
                "l_orderkey", "revenue",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("od"),
                "o_orderpriority",
            )
            .orderBy(F.desc("revenue"), F.asc("od"), F.asc("l_orderkey"))
            .limit(10)
        )

    def q5():
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
        nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
        region = spark.read.parquet(f"{sf_dir}/region.parquet").where(
            F.col("r_name") == "ASIA")
        o = orders.where(
            (F.col("o_orderdate") >= _ntz("1996-01-01"))
            & (F.col("o_orderdate") < _ntz("1997-01-01")))
        return (
            cust.join(o, cust.c_custkey == o.o_custkey)
            .join(li, o.o_orderkey == li.l_orderkey)
            .join(supp, (li.l_suppkey == supp.s_suppkey)
                  & (cust.c_nationkey == supp.s_nationkey))
            .join(nation, supp.s_nationkey == nation.n_nationkey)
            .join(region, nation.n_regionkey == region.r_regionkey)
            .groupBy("n_name")
            .agg(F.round(F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ), 2).alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("n_name"))
        )

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

    cells = {
        "q6_revenue_delta": q6,
        "events_tumbling_1h": events_tumbling,
        "window_rank_orders": window_rank,
        "distinct_users": distinct_users,
        "knn_cosine_top10": knn,
    }
    if all_cells:
        cells = {"q1_pricing_summary": q1, "q3_top_orders": q3,
                 "q5_local_supplier": q5, **cells}
    return cells


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--all-cells", action="store_true",
                    help="include q1/q3/q5 (the 8-cell paired-baseline "
                         "re-measure bench.py embeds per round)")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cells = build_cells(spark, args.sf_dir, all_cells=args.all_cells)

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
