"""Sources, sinks and format round-trips (SURVEY.md §2-A; split out of
``relational.py`` in r9 — registration order within the family is the
original file order, and the certification window is pinned separately
by ``plans/__init__._CERTIFICATION_PRIORITY``).

Covers: CSV/ORC/JSONL/partitioned-parquet round-trips, the thin
metastore scan, the custom Python DataSource, schema evolution, SCD1
merge-upsert, CDC apply, snapshot diff, observed writes, and the
in-memory (persist) source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query, scratch_dir


@query(
    "csv_roundtrip_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(*)                  AS n,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem WHERE l_orderkey % 11 = 0
    GROUP BY 1
    """,
)
def csv_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 + A7 through the correctness gate: sink a projection to
    delimited text (``|``-separated, headerless — the Hive serde shape the
    reference reads via ``field.delim``), re-scan it with a *declared*
    schema (metastore-style: no inference), and aggregate.

    The oracle computes the same aggregate straight from parquet, so the
    hash match certifies the full text write→read round-trip including
    float formatting. Scale: CSV is the interchange path only — parquet
    (columnar, predicate pushdown) is the storage path; a text scan reads
    every byte of every row.
    """

    # Faithful-round-trip protocol (r10 hostile-format gate; every clause
    # is a corruption the gate caught on clean-looking defaults —
    # writer whitespace trim, newline record-shredding, NULL/'' fold,
    # \N-sentinel collision). Lives in sources.readers as the engine's
    # delimited interchange API; fuzz-pinned on seeded hostile frames in
    # tests/test_hostile_formats.py.
    from ..sources.readers import (
        read_delimited_lossless,
        write_delimited_lossless,
    )

    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 11 == 0)
    out = scratch_dir("csv_rt_") + "/lineitem_csv"
    write_delimited_lossless(
        li.select("l_orderkey", "l_returnflag", "l_quantity"), out
    )
    back = read_delimited_lossless(
        spark,
        out,
        [("l_orderkey", "bigint"), ("l_returnflag", "string"),
         ("l_quantity", "double")],
    )
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@query(
    "parquet_partitioned_roundtrip",
    oracle="""
    SELECT l_linestatus,
           COUNT(*)                  AS n,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem WHERE l_returnflag = 'R' AND l_orderkey % 13 = 0
    GROUP BY 1
    """,
)
def parquet_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 + A4 + A5 through the correctness gate: sink with
    ``partitionBy(l_returnflag)`` (the prunable layout), re-read with a
    partition-key filter, aggregate. The re-scan's filter prunes to one
    hive-style directory before any file is opened — at 100 TB this is the
    difference between reading one partition and reading the table.

    The oracle aggregates straight from the source parquet, so the hash
    match certifies the partitioned write→discover→prune→read cycle.
    """

    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 13 == 0)
    out = scratch_dir("pq_rt_") + "/lineitem_part"
    towrite = li.select(
        "l_orderkey", "l_returnflag", "l_linestatus", "l_quantity"
    )
    towrite.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    # explicit schema on the read-back (r10 hostile-numeric gate): a
    # filter that matches ZERO rows writes an empty table — no data
    # files, nothing to infer from — and the bare read throws
    # UNABLE_TO_INFER_SCHEMA. A declared schema (metastore-style) makes
    # the empty round-trip a plain empty DataFrame, which is what a
    # 100 TB pipeline wants from an empty partition write, not a crash.
    back = (
        spark.read.schema(towrite.schema)
        .option("basePath", out)
        .parquet(out)
        .where(F.col("l_returnflag") == "R")
    )
    return back.groupBy("l_linestatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@query(
    "thin_metastore_scan",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*)                    AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 7 = 0
    GROUP BY 1
    """,
)
def thin_metastore_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 + A4 + A5 through the correctness gate: the reference's ENTIRE
    metastore resolution flow — register a TableDef (schema/location/format/
    partition keys), compile the partition predicate against the partition
    listing BEFORE touching data, read only surviving partition directories,
    attach constant partition-key columns, union — then aggregate.

    The oracle recomputes from the source parquet, so the hash match
    certifies resolution, pruning, typed partition-column attachment, and
    the scan. This is the thin-catalog sibling of the Hive-metastore path
    (tests/test_sources.py drives the real embedded-Derby HMS)."""

    from ..sources.metastore import TableDef, ThinCatalog

    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 7 == 0)
    loc = scratch_dir("thin_ms_") + "/orders_part"
    orders.select("o_orderkey", "o_totalprice", "o_orderstatus").write.partitionBy(
        "o_orderstatus"
    ).parquet(loc)

    cat = ThinCatalog()
    cat.register(
        TableDef(
            name="orders_part",
            location=loc,
            columns=[("o_orderkey", "bigint"), ("o_totalprice", "double")],
            partition_keys=[("o_orderstatus", "string")],
        )
    )
    df = cat.read_table(spark, "orders_part", partition_filter="o_orderstatus = 'F'")
    return df.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


@query(
    "python_datasource_scan",
    oracle="""
    SELECT CAST(range % 10 AS BIGINT)              AS bucket,
           COUNT(*)                                AS n,
           CAST(SUM(range * range) AS BIGINT)      AS sq_sum
    FROM range(5000) GROUP BY 1
    """,
)
def python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-extensibility: a custom Python DataSource (Spark 4
    ``pyspark.sql.datasource``) — the first-class hook for teaching Spark a
    source it doesn't know, i.e. the modern form of what the reference does
    for Hive-metastore tables. The source declares its own partition split;
    Spark runs one read task per split. Oracle recomputes from DuckDB's
    range()."""
    from ..sources.pyds import register

    register(spark)
    df = spark.read.format("synthrange").option("n", 5000).option("parts", 8).load()
    return df.groupBy((F.col("i") % 10).alias("bucket")).agg(
        F.count("*").alias("n"), F.sum("sq").alias("sq_sum")
    )


@query(
    "timestamp_parse_roundtrip",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           COUNT(*) AS n
    FROM events
    WHERE EXTRACT(minute FROM ts) = 0 AND EXTRACT(second FROM ts) = 0
    GROUP BY 1
    """,
)
def timestamp_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-date parsing: format → string → ``to_timestamp`` parse-back
    round-trip (pandas ``to_datetime``). The WHERE keeps only second-exact
    timestamps so the seconds-precision string round-trip is lossless and
    the parse is certified by the hash match."""
    ev = load_table(spark, sf_dir, "events")
    on_hour = ev.where((F.minute("ts") == 0) & (F.second("ts") == 0))
    as_str = on_hour.select(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str")
    )
    parsed = as_str.select(
        F.to_timestamp("ts_str", "yyyy-MM-dd HH:mm:ss").alias("ts_parsed")
    )
    return parsed.groupBy(
        F.date_format("ts_parsed", "yyyy-MM-dd HH:mm:ss").alias("ts_str")
    ).agg(F.count("*").alias("n"))


@query(
    "parquet_schema_evolution",
    oracle="""
    SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_note
    FROM orders WHERE o_orderkey % 31 = 0
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'v2' AS o_note
    FROM orders WHERE o_orderkey % 37 = 0
    """,
)
def parquet_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family schema evolution: two parquet footprints under one table
    directory — an old layout and a new one with an added column — read
    back as one DataFrame via ``mergeSchema``; rows from the old files get
    NULL for the added column. This is how a long-lived 100 TB table
    absorbs additive schema change without rewriting history. mergeSchema
    costs a footer read per file at planning (off by default for that
    reason) — production tables keep the merged schema in a catalog
    instead and pass it explicitly."""

    orders = load_table(spark, sf_dir, "orders")
    out = scratch_dir("schema_evo_") + "/orders_evo"
    orders.where(F.col("o_orderkey") % 31 == 0).select(
        "o_orderkey", "o_totalprice"
    ).write.mode("overwrite").parquet(f"{out}/v1")
    orders.where(F.col("o_orderkey") % 37 == 0).select(
        "o_orderkey", "o_totalprice", F.lit("v2").alias("o_note")
    ).write.mode("overwrite").parquet(f"{out}/v2")
    return (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(out)
        .select("o_orderkey", "o_totalprice", "o_note")
    )


@query(
    "nations_per_region_csv",
    oracle="""
    SELECT r_name,
           string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations
    FROM region JOIN nation ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def nations_per_region_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9+ ordered string aggregation (listagg/string_agg): collect_set →
    array_sort → concat_ws gives a DETERMINISTIC delimited list — the only
    safe form in a distributed engine, where bare listagg order is
    partition-dependent."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return (
        region.join(nation, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("n_name"))).alias(
                "nations"
            )
        )
    )


@query(
    "orc_roundtrip_agg",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*)                    AS n,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders WHERE o_orderkey % 7 = 0
    GROUP BY 1
    """,
)
def orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6-alt: ORC sink + scan — Spark's second native columnar format
    (the Hive-ecosystem default the reference's metastore tables often
    use). Same round-trip certification shape as `csv_roundtrip_agg`: the
    oracle aggregates straight from parquet, so a hash match proves the
    ORC write→read preserves values exactly. ORC keeps predicate pushdown
    and column pruning like parquet, so it's a storage-path peer, not an
    interchange-only format."""

    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 7 == 0
    )
    out = scratch_dir("orc_rt_") + "/orders_orc"
    orders.select("o_orderkey", "o_orderpriority", "o_totalprice").write.mode(
        "overwrite"
    ).orc(out)
    back = spark.read.orc(out)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@query(
    "jsonl_roundtrip_agg",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*)                  AS n,
           ROUND(SUM(c_acctbal), 2) AS sum_bal
    FROM customer WHERE c_custkey % 5 = 0
    GROUP BY 1
    """,
)
def jsonl_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3-alt: JSON-lines sink + declared-schema scan — the training-data
    interchange format (one JSON object per line, splittable, appendable).
    Schema is DECLARED on read (metastore-style, no inference pass — at
    100 TB an inference pass is a full extra scan). Oracle aggregates from
    parquet, certifying the JSON write→read round-trip including float
    formatting."""

    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") % 5 == 0
    )
    out = scratch_dir("jsonl_rt_") + "/customer_jsonl"
    cust.select("c_custkey", "c_mktsegment", "c_acctbal").write.mode(
        "overwrite"
    ).json(out)
    back = spark.read.schema(
        "c_custkey bigint, c_mktsegment string, c_acctbal double"
    ).json(out)
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
    )


@query(
    "merge_upsert_orders",
    oracle="""
    WITH upd AS (
        SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey + 10000000, 1.0
        FROM orders WHERE o_orderkey % 1000 = 1
    )
    SELECT COALESCE(u.o_orderkey, o.o_orderkey) AS o_orderkey,
           COALESCE(u.o_totalprice, o.o_totalprice) AS o_totalprice
    FROM orders o FULL OUTER JOIN upd u USING (o_orderkey)
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 merge-upsert (MERGE ... WHEN MATCHED THEN UPDATE / WHEN NOT
    MATCHED THEN INSERT), the last-writer-wins compaction every CDC
    ingest needs: full-outer join base↔updates on the key, updates win
    via COALESCE. (The update mutation is ``+1000.0`` — IEEE-exact and
    engine-identical; a ``×1.1`` + ROUND hits double half-even edges
    where Spark and DuckDB disagree by one cent.)

    Scale: one shuffle per side on the merge key — exactly what a table
    format's MERGE executes underneath. When updates are small relative
    to base (the common CDC shape), prefer partition-overwrite: semi-join
    to find touched partitions, rewrite only those. The updates side here
    derives deterministically from orders (10% updated rows + planted
    inserts), so the result is exact-row certified."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    upd = (
        orders.where(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        )
        .unionByName(
            orders.where(F.col("o_orderkey") % 1000 == 1).select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                F.lit(1.0).alias("o_totalprice"),
            )
        )
    )
    merged = orders.alias("o").join(
        upd.alias("u"), "o_orderkey", "full_outer"
    )
    return merged.select(
        "o_orderkey",
        F.coalesce(F.col("u.o_totalprice"), F.col("o.o_totalprice")).alias(
            "o_totalprice"
        ),
    )


@query(
    "cdc_apply_changes",
    oracle="""
    WITH chg AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 10 = 0 THEN 'D'
                  WHEN o_orderkey % 10 IN (1, 2) THEN 'U' END AS op,
             o_totalprice * 1.1 AS new_price
      FROM orders WHERE o_orderkey % 10 IN (0, 1, 2)),
    ins AS (
      SELECT o_orderkey + 3000000 AS k, 'I' AS op,
             o_totalprice / 2 AS new_price,
             o_orderstatus
      FROM orders WHERE o_orderkey % 10 = 3),
    applied AS (
      SELECT o.o_orderkey, o.o_orderstatus,
             COALESCE(c.new_price, o.o_totalprice) AS price
      FROM orders o LEFT JOIN chg c ON o.o_orderkey = c.k
      WHERE c.op IS DISTINCT FROM 'D'
      UNION ALL
      SELECT k, o_orderstatus, new_price FROM ins)
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           CAST(ROUND(CAST(SUM(price) AS DECIMAL(27,4)), 2) AS DOUBLE)
             AS total_price
    FROM applied GROUP BY 1
    """,
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC batch apply: a change feed with typed ops — D(elete),
    U(pdate), I(nsert) — applied to a base table in one pass. Deletes and
    updates resolve through a single left join on the key (NULL op =
    untouched, 'D' filtered, 'U' price coalesced); inserts union in after.

    Scale shape: ONE equi-join of base against the (always far smaller)
    change batch — broadcast when the batch fits, shuffle-hash otherwise —
    plus a union; no window, no global sort, no driver loop. This is the
    standard lakehouse upsert plan (what MERGE INTO lowers to). The change
    feed is synthesized deterministically from orders so the oracle can
    rebuild the identical feed and certify the applied state."""
    orders = load_table(spark, sf_dir, "orders")
    mod = F.col("o_orderkey") % 10
    chg = orders.where(mod.isin(0, 1, 2)).select(
        F.col("o_orderkey").alias("k"),
        F.when(mod == 0, "D").otherwise("U").alias("op"),
        (F.col("o_totalprice") * 1.1).alias("new_price"),
    )
    ins = orders.where(mod == 3).select(
        (F.col("o_orderkey") + 3_000_000).alias("o_orderkey"),
        "o_orderstatus",
        (F.col("o_totalprice") / 2).alias("price"),
    )
    applied = (
        orders.join(chg, orders.o_orderkey == chg.k, "left")
        .where(F.coalesce(F.col("op") != "D", F.lit(True)))
        .select(
            "o_orderkey", "o_orderstatus",
            F.coalesce("new_price", "o_totalprice").alias("price"),
        )
        .unionByName(ins)
    )
    # DECIMAL-collapse pin (r10 hostile-format gate): ×1.1 / ÷2 make the
    # applied prices 3-decimal-grained; a poisoned group summed to an
    # exact cent half-edge, so collapse at scale 4 before the cent round
    # (the standing recipe — see quantile_value / q9)
    return applied.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("price").cast("decimal(27,4)"), 2)
        .cast("double")
        .alias("total_price"),
    )


@query(
    "table_diff_snapshots",
    oracle="""
    WITH old AS (
        SELECT o_orderkey, o_totalprice + CASE WHEN o_orderkey % 101 = 0 THEN 1.0 ELSE 0.0 END AS o_totalprice,
               o_orderstatus
        FROM orders WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT -o_orderkey AS o_orderkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % 89 = 0
    )
    SELECT CASE WHEN old.o_orderkey IS NULL THEN 'added'
                WHEN new.o_orderkey IS NULL THEN 'removed'
                WHEN old.o_totalprice <> new.o_totalprice
                     OR old.o_orderstatus <> new.o_orderstatus THEN 'changed'
                ELSE 'unchanged' END  AS change_type,
           COUNT(*)                   AS n
    FROM old FULL OUTER JOIN orders AS new USING (o_orderkey)
    GROUP BY change_type
    """,
)
def table_diff_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (data-diff): classify every key across two
    table versions as added / removed / changed / unchanged — the
    validation step behind any CDC or backfill pipeline ("did the rewrite
    lose rows? silently mutate values?").

    The "old" snapshot is derived deterministically from orders (drop
    keys %97 → added in new; negate keys %89 → removed; bump price %101 →
    changed) so both engines diff identical inputs. Plan shape at 100 TB:
    one full-outer shuffle join on the primary key — both sides
    hash-partition once, comparison is per-row JVM codegen; with both
    snapshots bucketed on the key it degrades to a zero-shuffle zip. The
    per-column null-safe comparison stays in whole-stage codegen (no
    row hashing UDF)."""
    new = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    old = (
        new.where(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 101 == 0, F.lit(1.0)).otherwise(0.0),
        )
        .unionByName(
            new.where(F.col("o_orderkey") % 89 == 0).withColumn(
                "o_orderkey", -F.col("o_orderkey")
            )
        )
    )
    o, n = old.alias("o"), new.alias("n")
    joined = o.join(n, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer")
    change = (
        F.when(F.col("o.o_orderkey").isNull(), F.lit("added"))
        .when(F.col("n.o_orderkey").isNull(), F.lit("removed"))
        .when(
            (F.col("o.o_totalprice") != F.col("n.o_totalprice"))
            | (F.col("o.o_orderstatus") != F.col("n.o_orderstatus")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return joined.groupBy(change.alias("change_type")).agg(F.count("*").alias("n"))


@query(
    "persist_cache_agg",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n, ROUND(AVG(o_totalprice), 2) AS avg_price
    FROM orders GROUP BY 1
    """,
)
def persist_cache_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dask ``persist()`` parity: materialize a frame once
    (``df.persist()``, deserialized in-memory columnar batches with
    disk spill), reuse it across two actions, and certify caching is
    semantically invisible (same answer as the uncached oracle).

    At 100 TB, persist() is for REUSE not speed of one pass: iterative
    loops (the components/IVF operators here localCheckpoint for the same
    reason) and multi-output pipelines. MEMORY_AND_DISK means partitions
    that don't fit spill instead of recomputing the lineage per access;
    ``unpersist`` releases executor memory eagerly."""
    o = load_table(spark, sf_dir, "orders").persist()
    try:
        n_rows = o.count()  # action 1 materializes the cache
        assert n_rows > 0
        rows = (
            o.groupBy("o_orderstatus")  # action 2 reads InMemoryRelation
            .agg(
                F.count("*").alias("n"),
                F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
            )
            .collect()
        )
    finally:
        o.unpersist(blocking=False)
    return spark.createDataFrame(
        rows, "o_orderstatus string, n bigint, avg_price double"
    )


@query(
    "observed_write_metrics",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT)  AS n_rows,
           CAST(COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS BIGINT)
                                     AS n_returned,
           ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem
    """,
)
def observed_write_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 observed write, surfaced as a query: copy lineitem to parquet and
    collect the QC manifest (row count, returned-flag count, total price)
    with ``Observation`` IN THE SAME PASS — zero extra scans. The oracle
    recomputes the same aggregates from the source, so the hash match
    certifies the observed metrics are exact, not sampled.

    At 100 TB this is the difference between writing a manifest for free and
    doubling pipeline I/O with a write-then-recount.
    """

    from ..sources.writers import write_parquet_observed

    li = load_table(spark, sf_dir, "lineitem")
    out = scratch_dir("observed_q_") + "/lineitem_copy"
    got = write_parquet_observed(
        li,
        out,
        {
            "n_rows": F.count(F.lit(1)),
            "n_returned": F.count(F.when(F.col("l_returnflag") == "R", 1)),
            "total_price": F.round(F.sum("l_extendedprice"), 2),
        },
    )
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField("n_rows", LongType()),
            StructField("n_returned", LongType()),
            StructField("total_price", DoubleType()),
        ]
    )
    row = (int(got["n_rows"]), int(got["n_returned"]), float(got["total_price"]))
    return spark.createDataFrame([row], schema)
