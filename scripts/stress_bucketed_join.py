#!/usr/bin/env python
"""Measure the bucketed-join amortization claim (r7, SURVEY §2-C C3).

`bucketed_join_agg` argues: a fact table joined on the same key every run
pays a full shuffle per run; `write_bucketed` pays that shuffle ONCE at
write time, and every subsequent join reads matching buckets with zero
Exchange. This script measures that trade at ~20× sf0.1 (3 M orders ×
12 M lineitem): both sides written PLAIN and BUCKETED, then the same
join+agg run J times against each layout, answers asserted identical.
Reports per-layout write cost, per-join cost, and the break-even join
count ((bucketed_write − plain_write) / (plain_join − bucketed_join)) —
the number of repeated joins after which bucketing is pure profit.

Usage: python scripts/stress_bucketed_join.py [--reps 20] [--joins 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")


def replicate(df, key: str, reps: int):
    """Union of `reps` id-shifted copies (join keys stay aligned across
    tables because both sides shift by the same r*10M)."""
    return df.withColumn(
        "__rep", F.explode(F.sequence(F.lit(0), F.lit(reps - 1)))
    ).withColumn(
        key, F.col(key) + F.col("__rep") * 10_000_000
    ).drop("__rep")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--joins", type=int, default=3)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from dask_hivemetastore_spark.catalog import load_table
    from dask_hivemetastore_spark.operators.layout import write_bucketed
    from dask_hivemetastore_spark.session import ensure_runtime_confs

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    ensure_runtime_confs(spark)

    o = replicate(
        load_table(spark, args.sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        ),
        "o_orderkey", args.reps,
    )
    li = replicate(
        load_table(spark, args.sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        "l_orderkey", args.reps,
    )
    base = tempfile.mkdtemp(prefix="stress_bkt_")
    results: dict = {"reps": args.reps, "buckets": args.buckets,
                     "n_orders": o.count(), "n_lineitem": li.count()}

    # plain layout: same partition count as the bucketed write so the
    # comparison is layout-only, not file-count. Both writes run twice —
    # rep 0 absorbs first-touch costs (lineage first execution, codegen,
    # committer setup), rep 1 is recorded — so write order can't bias
    # the break-even arithmetic.
    for rep in (0, 1):
        t0 = time.time()
        o.repartition(args.buckets).write.mode("overwrite").parquet(
            base + "/o_plain")
        li.repartition(args.buckets).write.mode("overwrite").parquet(
            base + "/l_plain")
        results["plain_write_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        bo = write_bucketed(o, "stress_bkt_orders", "o_orderkey",
                            base + "/o_bkt", buckets=args.buckets)
        bl = write_bucketed(li, "stress_bkt_lineitem", "l_orderkey",
                            base + "/l_bkt", buckets=args.buckets)
        results["bucketed_write_sec"] = round(time.time() - t0, 2)

    def join_agg(lhs, rhs, lkey="o_orderkey", rkey="l_orderkey"):
        j = lhs.hint("merge").join(rhs, lhs[lkey] == rhs[rkey])
        return (
            j.groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2).alias("rev"))
        )

    po = spark.read.parquet(base + "/o_plain")
    pl = spark.read.parquet(base + "/l_plain")
    answers = {}
    for name, lhs, rhs in (("plain", po, pl), ("bucketed", bo, bl)):
        secs = []
        for _ in range(args.joins):
            t0 = time.time()
            answers[name] = sorted(map(tuple, join_agg(lhs, rhs).collect()))
            secs.append(round(time.time() - t0, 2))
        results[f"{name}_join_secs"] = secs
    assert answers["plain"] == answers["bucketed"], "layouts disagree!"
    results["answers_identical"] = True

    pj = min(results["plain_join_secs"])
    bj = min(results["bucketed_join_secs"])
    extra_write = results["bucketed_write_sec"] - results["plain_write_sec"]
    results["join_speedup"] = round(pj / bj, 2)
    results["breakeven_joins"] = (
        round(extra_write / (pj - bj), 1) if pj > bj else None
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
