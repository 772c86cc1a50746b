#!/usr/bin/env python
"""100x capped-state accounting stress for STREAMING near-dedup (r10).

VERDICT r9 "Next round #5": the streaming band-bucket path
(``streaming/pipeline.py make_band_collisions``) is the one LLM pillar
whose scale story was probed (r7) but not harnessed with an exit-code
invariant. This script replicates the documents corpus R times with
replica-tagged words (within-replica near-dup structure identical,
cross-replica Jaccard exactly 0 — same construction as
``stress_near_dedup.py``), appends a boilerplate cluster LARGER than the
membership cap to drive real overflow, streams it through the capped
``applyInPandasWithState`` band-bucket operator in several micro-batches,
reads the final state back through the state-store reader (I10), and
asserts — wired to the exit code, not prose:

  A. EXACT enrollment accounting, per bucket: |members| + overflow equals
     the ground-truth distinct-doc occupancy of that (band, band_hash)
     bucket (computed by the certified batch ``minhash_band_buckets``
     stage on the identical corpus). Nothing lost, nothing invented.
  B. Cap bound: every bucket's resident membership <= cap, and the
     emitted pair log never exceeds C(cap, 2) pairs per bucket.
  C. No pair lost below the cap: for every bucket whose total occupancy
     fits the cap, the stream's distinct candidate pairs equal the batch
     self-join's candidate pairs exactly (set equality both directions).
  D. Overflow happened (the boilerplate cluster actually drove buckets
     past the cap) — otherwise the run proves nothing.

Usage: python scripts/stress_stream_dedup.py [--reps 100] [--cap 64]
         [--boilerplate 200] [--sf-dir /root/testdata/sf0.01]
Prints one JSON line; exit 0 iff every invariant holds.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--cap", type=int, default=64)
    ap.add_argument("--boilerplate", type=int, default=200)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--rocksdb", action="store_true")
    ap.add_argument("--driver-mem", default=None)
    args = ap.parse_args()

    from dask_hivemetastore_spark.operators.dedup import (
        minhash_band_buckets,
        with_word_ngrams,
    )
    from dask_hivemetastore_spark.session import get_spark
    from dask_hivemetastore_spark.streaming.pipeline import (
        _BAND_STATE,
        _PAIR_OUT,
        make_band_collisions,
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    # 100 replicas × 32 bands ≈ 1.6M state-store keys, all resident in
    # the single local JVM's heap (HDFSBackedStateStore + its maintenance
    # snapshots) — the default ~1g driver heap OOMs. Provision for the
    # harness's scale up front; at production scale this is executor
    # memory × shard count, or the RocksDB provider (disk-backed state).
    # --rocksdb (r11) runs that production path: state spills to local
    # RocksDB instances instead of the JVM heap, so the heap need drops
    # from 24g to the sink/shuffle working set (--driver-mem 8g passes).
    spark = get_spark(
        app_name="stress_stream_dedup",
        extra_confs={"spark.driver.memory": args.driver_mem
                     or ("8g" if args.rocksdb else "24g")},
    )
    if args.rocksdb:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    t_all = time.time()

    # ------------------------------------------------ corpus construction
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    reps = args.reps
    tagged = (
        docs.withColumn("__rep", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))))
        .select(
            (F.col("doc_id") + F.col("__rep") * 10_000_000).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda w: F.concat(w, F.lit("_"), F.col("__rep")),
                ),
                " ",
            ).alias("text"),
        )
    )
    # boilerplate cluster: `boilerplate` IDENTICAL documents — every one
    # lands in the same 32 band buckets, so each of those buckets sees
    # `boilerplate` distinct ids and must overflow past the cap
    boiler = spark.range(args.boilerplate).select(
        (F.col("id") + 2_000_000_000).alias("doc_id"),
        F.lit(
            "standard boilerplate license header text repeated verbatim "
            "across every scraped page of the mirrored site corpus"
        ).alias("text"),
    )
    corpus = tagged.unionByName(boiler)

    # stream source: `batches` parquet files with increasing mtimes so the
    # file source replays them as ordered micro-batches
    src = tempfile.mkdtemp(prefix="stress_sdd_src_")
    corpus.withColumn(
        "__b", F.pmod(F.xxhash64("doc_id"), F.lit(args.batches))
    ).write.partitionBy("__b").mode("overwrite").parquet(src)
    base_t = 1_000_000_000
    for i in range(args.batches):
        d = os.path.join(src, f"__b={i}")
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (base_t + 60 * i, base_t + 60 * i))

    n_docs = corpus.count()

    # ------------------------------------------------ ground truth (batch)
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    grams_b = with_word_ngrams(corpus, "text", 3, nparts=nparts).drop("text")
    buckets_b = minhash_band_buckets(grams_b, "doc_id")
    truth = (
        buckets_b.groupBy("band", "band_hash")
        .agg(F.count_distinct("doc_id").alias("occ"))
        .persist()
    )
    truth_n = truth.count()

    # batch candidate pairs restricted to cap-fitting buckets (invariant C)
    small = buckets_b.join(
        truth.where(F.col("occ") <= args.cap).select("band", "band_hash"),
        ["band", "band_hash"],
    )
    a, b = small.alias("a"), small.alias("b")
    batch_pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        .persist()
    )
    n_batch_pairs = batch_pairs.count()

    # ------------------------------------------------ the streaming run
    t0 = time.time()
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max(1, nparts))
        .option("basePath", src)
        .parquet(src)
        .select("doc_id", "text")
    )
    grams_s = with_word_ngrams(stream, "text", 3, nparts=nparts).drop("text")
    buckets_s = minhash_band_buckets(grams_s, "doc_id")
    pair_log = buckets_s.groupBy("band", "band_hash").applyInPandasWithState(
        make_band_collisions(args.cap),
        outputStructType=_PAIR_OUT,
        stateStructType=_BAND_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    ckpt = tempfile.mkdtemp(prefix="stress_sdd_ckpt_")
    q = (
        pair_log.writeStream.format("memory")
        .queryName("stress_sdd_pairs")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    wall_stream = time.time() - t0

    stream_pairs = spark.table("stress_sdd_pairs").distinct().persist()
    n_stream_pairs = stream_pairs.count()

    # ------------------------------------------------ state readback (I10)
    state = (
        spark.read.format("statestore")
        .load(ckpt)
        .select(
            F.col("key.band").alias("band"),
            F.col("key.band_hash").alias("band_hash"),
            F.size(F.col("value.groupState.ids")).alias("n_members"),
            F.coalesce(F.col("value.groupState.overflow"), F.lit(0)).alias(
                "overflow"
            ),
        )
        .persist()
    )

    failures: list[str] = []

    # A: members + overflow == ground-truth occupancy, EVERY bucket
    acct = state.join(truth, ["band", "band_hash"], "full_outer").select(
        F.coalesce("n_members", F.lit(0)).alias("m"),
        F.coalesce("overflow", F.lit(0)).alias("o"),
        F.coalesce("occ", F.lit(0)).alias("occ"),
    )
    bad_acct = acct.where(F.col("m") + F.col("o") != F.col("occ")).count()
    if bad_acct:
        failures.append(f"A: {bad_acct} buckets with members+overflow != occupancy")

    # B: cap bound on resident membership
    over_cap = state.where(F.col("n_members") > args.cap).count()
    if over_cap:
        failures.append(f"B: {over_cap} buckets hold more than cap members")

    # C: candidate pairs from cap-fitting buckets — exact set equality.
    # stream_pairs also contains pairs from CAPPED buckets (the first
    # `cap` members still pair); those are exactly the pairs among
    # boilerplate ids, so C compares after excluding pairs where both
    # ends are boilerplate ids (>= 2e9).
    sp_small = stream_pairs.where(
        ~((F.col("doc_a") >= 2_000_000_000) & (F.col("doc_b") >= 2_000_000_000))
    )
    missing = batch_pairs.join(sp_small, ["doc_a", "doc_b"], "left_anti").count()
    invented = sp_small.join(batch_pairs, ["doc_a", "doc_b"], "left_anti").count()
    if missing or invented:
        failures.append(f"C: {missing} pairs lost / {invented} invented below cap")

    # D: the boilerplate cluster actually overflowed
    n_overflowed = state.where(F.col("overflow") > 0).count()
    total_overflow = state.agg(F.sum("overflow")).collect()[0][0] or 0
    expected_boiler_overflow = args.boilerplate - args.cap
    if n_overflowed == 0 or total_overflow < expected_boiler_overflow:
        failures.append(
            f"D: overflow not driven (buckets={n_overflowed}, "
            f"total={total_overflow}, expected >= {expected_boiler_overflow})"
        )

    # capped-bucket pair bound: boilerplate-only pairs <= C(cap, 2)
    boiler_pairs = stream_pairs.where(
        (F.col("doc_a") >= 2_000_000_000) & (F.col("doc_b") >= 2_000_000_000)
    ).count()
    cap_bound = args.cap * (args.cap - 1) // 2
    if boiler_pairs > cap_bound:
        failures.append(f"B2: {boiler_pairs} boilerplate pairs > C(cap,2)={cap_bound}")

    out = {
        "metric": "stress_stream_dedup",
        "provider": "rocksdb" if args.rocksdb else "hdfs",
        "reps": reps,
        "n_docs": n_docs,
        "cap": args.cap,
        "boilerplate": args.boilerplate,
        "batches": args.batches,
        "n_buckets": truth_n,
        "n_batch_pairs_uncapped": n_batch_pairs,
        "n_stream_pairs": n_stream_pairs,
        "boiler_pairs": boiler_pairs,
        "cap_pair_bound": cap_bound,
        "buckets_overflowed": n_overflowed,
        "total_overflow": int(total_overflow),
        "wall_stream_sec": round(wall_stream, 2),
        "wall_total_sec": round(time.time() - t_all, 2),
        "failures": failures,
        "ok": not failures,
    }
    print(json.dumps(out))
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return 0 if not failures else 1


if __name__ == "__main__":
    raise SystemExit(main())
