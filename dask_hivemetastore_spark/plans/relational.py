"""Relational operator coverage (SURVEY.md §2-B/C/D/F/G).

Every entry certifies one inventory row: filters/conditionals/null handling
(B4-B7), the join family (C1/C5/C8 plus outer variants), the aggregate family
(D3/D4/D7/D9/D10/D12/D13), and set operations (G1-G3). TPC-H-shaped joins
live in ``tpch.py``; window functions in ``windows.py``.

Scale notes: all plain DataFrame ops — aggregation is partial+final
(map-side combine) by construction; dimension sides broadcast; set ops and
distincts shuffle on the full row which is exactly what they would do at
100 TB (AQE coalesces the post-shuffle partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query, scratch_dir


# ---------------------------------------------------------------- B: filters


@query(
    "case_when_bucketing",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END AS bucket,
           COUNT(*)                      AS n_orders,
           ROUND(SUM(o_totalprice), 2)   AS total
    FROM orders
    GROUP BY bucket
    """,
)
def case_when_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 conditional expressions: CASE WHEN bucketing + aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@query(
    "null_handling",
    oracle="""
    SELECT l_returnflag,
           COUNT(*)                                                   AS n_rows,
           COUNT(NULLIF(l_discount, 0.0))                             AS n_discounted,
           ROUND(AVG(COALESCE(NULLIF(l_discount, 0.0), 0.05)), 6)     AS avg_disc_imputed
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 null semantics: nullif / count-skips-nulls / coalesce imputation.

    The testdata has no physical NULLs, so NULLIF manufactures them — which
    also certifies that Spark and the oracle agree on null-skipping aggregate
    semantics.
    """
    li = load_table(spark, sf_dir, "lineitem")
    d = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.count(d).alias("n_discounted"),
        F.round(F.avg(F.coalesce(d, F.lit(0.05))), 6).alias("avg_disc_imputed"),
    )


@query(
    "filter_in_list",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers, ROUND(AVG(c_acctbal), 6) AS avg_bal
    FROM customer
    WHERE c_mktsegment IN ('MACHINERY', 'AUTOMOBILE', 'HOUSEHOLD')
    GROUP BY c_mktsegment
    """,
)
def filter_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7 membership predicate; IN-list pushes to the parquet scan."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.where(F.col("c_mktsegment").isin("MACHINERY", "AUTOMOBILE", "HOUSEHOLD"))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"), F.round(F.avg("c_acctbal"), 6).alias("avg_bal"))
    )


# ------------------------------------------------------------------ C: joins


@query(
    "join_orders_customer",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*)                      AS n_orders,
           ROUND(AVG(o_totalprice), 6)   AS avg_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 hash equi-join fact→dim, then aggregate on a dim attribute."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), F.round(F.avg("o_totalprice"), 6).alias("avg_price"))
    )


@query(
    "left_join_customer_orders",
    oracle="""
    WITH per_cust AS (
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey
    )
    SELECT n_orders, COUNT(*) AS n_customers
    FROM per_cust GROUP BY n_orders
    """,
)
def left_join_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 left outer join preserving unmatched rows (order-count histogram,
    including the zero-order bucket that an inner join would drop)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


@query(
    "full_outer_nation_presence",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(c.nk, s.nk)    AS nationkey,
           COALESCE(n_cust, 0)     AS n_cust,
           COALESCE(n_supp, 0)     AS n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 full outer join of two pre-aggregated sides with COALESCE repair."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    c = cust.groupBy(F.col("c_nationkey").alias("nk")).agg(F.count("*").alias("n_cust"))
    s = supp.groupBy(F.col("s_nationkey").alias("nk")).agg(F.count("*").alias("n_supp"))
    return (
        c.join(s, "nk", "full")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@query(
    "semi_join_customers",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
    """,
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 left-semi join (first-class in Spark; the reference's Dask surface
    had to emulate it with isin — SURVEY.md §2-C C8)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
    )


@query(
    "anti_join_customers",
    oracle="""
    SELECT c_custkey, c_nationkey
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 left-anti join: customers that never ordered."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_nationkey")
    )


@query(
    "cross_join_region_status",
    oracle="""
    SELECT r_name, o_orderstatus
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
    """,
)
def cross_join_region_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 cross join (both sides tiny; at scale one side must broadcast —
    Spark lowers this to BroadcastNestedLoopJoin automatically)."""
    region = load_table(spark, sf_dir, "region").select("r_name")
    status = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return region.crossJoin(status)


# ------------------------------------------------------------- D: aggregates


@query(
    "distinct_users",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 exact count-distinct per group (expand+two-phase agg in Spark)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_users"))


@query("approx_distinct_users")  # no oracle: HLL estimates differ per engine
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 approx count-distinct (HyperLogLog++). Registered rows-only by
    design — sketch estimates are engine-specific (SURVEY.md §7.4 item 5).
    At 100 TB this is the right default: no expand, fixed-size sketch merge.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("n_users_approx")
    )


@query(
    "agg_var_std",
    oracle="""
    SELECT l_returnflag,
           ROUND(VAR_SAMP(l_extendedprice), 2)    AS var_price,
           ROUND(STDDEV_SAMP(l_extendedprice), 4) AS std_price,
           ROUND(VAR_POP(l_quantity), 6)          AS varp_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_var_std(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 variance/stddev (chunked-merge in Dask ≙ partial+final here)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.var_samp("l_extendedprice"), 2).alias("var_price"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
        F.round(F.var_pop("l_quantity"), 6).alias("varp_qty"),
    )


@query(
    "quantile_value",
    oracle="""
    SELECT l_returnflag,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 4)  AS median_price,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.95), 4) AS p95_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def quantile_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 quantiles — *exact* linear-interpolated percentile so the oracle
    hash matches. (`percentile_approx`/t-digest is the 100 TB path but is
    engine-specific, same argument as approx_distinct.)"""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", 0.5), 4).alias("median_price"),
        F.round(F.percentile("l_extendedprice", 0.95), 4).alias("p95_price"),
    )


@query(
    "agg_collect",
    oracle="""
    SELECT c_mktsegment,
           ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT c_nationkey)), ',') AS nations
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9 collect-to-set, sorted and stringified for deterministic hashing."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.array_join(F.array_sort(F.collect_set("c_nationkey")), ",").alias("nations")
    )


@query(
    "value_counts_events",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def value_counts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D10 value_counts ≙ groupBy().count()."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.count("*").alias("n"))


@query(
    "rollup_nation_region",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n_customers, ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def rollup_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D12 rollup — absent in the reference's Dask surface, free in Spark."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"), F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
    )


@query(
    "cube_segment_status",
    oracle="""
    SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY CUBE (c_mktsegment, o_orderstatus)
    """,
)
def cube_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D12 cube over a join."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .cube("c_mktsegment", "o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


@query(
    "corr_price_qty",
    oracle="""
    SELECT l_returnflag,
           ROUND(CORR(l_extendedprice, l_quantity), 6)       AS corr_pq,
           ROUND(COVAR_SAMP(l_extendedprice, l_quantity), 2) AS cov_pq
    FROM lineitem GROUP BY l_returnflag
    """,
)
def corr_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D13 correlation / covariance."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_pq"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias("cov_pq"),
    )


# --------------------------------------------------------------- G: set ops


@query(
    "union_all_events_split",
    oracle="""
    WITH unioned AS (
        SELECT event_type, value FROM events WHERE user_id % 2 = 0
        UNION ALL
        SELECT event_type, value FROM events WHERE user_id % 2 = 1
    )
    SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
    FROM unioned GROUP BY event_type
    """,
)
def union_all_events_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 union-all (dd.concat ≙ unionByName; position-based union is the
    footgun SURVEY.md §2-G warns about)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value", "user_id")
    even = ev.where(F.col("user_id") % 2 == 0).select("event_type", "value")
    odd = ev.where(F.col("user_id") % 2 == 1).select("value", "event_type")  # swapped on purpose
    return (
        even.unionByName(odd)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )


@query(
    "union_distinct",
    oracle="""
    SELECT l_returnflag AS flag FROM lineitem
    UNION
    SELECT l_linestatus FROM lineitem
    """,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 union + distinct."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(F.col("l_returnflag").alias("flag"))
        .unionByName(li.select(F.col("l_linestatus").alias("flag")))
        .distinct()
    )


@query(
    "except_returned_items",
    oracle="""
    SELECT DISTINCT l_partkey FROM lineitem
    EXCEPT
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def except_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 EXCEPT (distinct semantics): parts never returned."""
    li = load_table(spark, sf_dir, "lineitem")
    all_parts = li.select("l_partkey").distinct()
    returned = li.where(F.col("l_returnflag") == "R").select("l_partkey")
    return all_parts.subtract(returned)


@query(
    "intersect_nations",
    oracle="""
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 INTERSECT: nations present on both customer and supplier sides."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


# ------------------------------------------------- H: scalar string functions


@query(
    "string_funcs_docs",
    oracle="""
    SELECT doc_id,
           upper(source)                                    AS src_upper,
           length(text)                                     AS n_chars,
           CASE WHEN contains(text, 'spark') THEN 1 ELSE 0 END AS has_spark,
           replace(substr(text, 1, 20), ' ', '_')           AS head_snake,
           concat_ws('|', lang, source)                     AS lang_src,
           trim(leading 'k' FROM split_part(text, ' ', 1))  AS first_word_trim
    FROM documents
    WHERE source LIKE 'src1%'
    """,
)
def string_funcs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-string family: upper/length/contains/replace/substr/concat_ws/
    trim/split + LIKE predicate (the reference's pandas ``.str`` accessor
    surface, SURVEY.md §2-H)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.where(F.col("source").like("src1%"))
        .select(
            "doc_id",
            F.upper("source").alias("src_upper"),
            F.length("text").cast("long").alias("n_chars"),
            F.when(F.contains("text", F.lit("spark")), 1).otherwise(0).alias("has_spark"),
            F.replace(F.substring("text", 1, 20), F.lit(" "), F.lit("_")).alias("head_snake"),
            F.concat_ws("|", "lang", "source").alias("lang_src"),
            F.expr("trim(LEADING 'k' FROM split(text, ' ')[0])").alias("first_word_trim"),
        )
    )


@query(
    "argmin_argmax_orders",
    oracle="""
    WITH t AS (SELECT o_orderstatus, o_orderkey, o_totalprice,
                      CAST(ROUND(o_totalprice * 100) AS BIGINT) * 100000000
                        + o_orderkey AS tie
               FROM orders)
    SELECT o_orderstatus,
           arg_min(o_orderkey, tie) AS cheapest_order,
           arg_max(o_orderkey, tie) AS priciest_order,
           ROUND(MIN(o_totalprice), 2)       AS min_price,
           ROUND(MAX(o_totalprice), 2)       AS max_price
    FROM t GROUP BY o_orderstatus
    """,
)
def argmin_argmax_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 order-pinned first/last: min_by/max_by replace Dask's
    partition-order-dependent first()/last() — but on a bare ordering
    column they are still TIE-nondeterministic (two orders sharing the
    group extreme price let each engine pick its own orderkey). The
    ordering value is therefore the composite scalar
    ``cents(price)·10⁸ + orderkey`` — lexicographic (price, key) order as
    one BIGINT both engines compare identically (DuckDB's arg_min takes
    no struct ordering; the encoding is exact while orderkey < 10⁸ and
    cents·10⁸ < 2⁶³, comfortably true at every tested SF) — which makes
    the picked key a pure function of the data (r7 review; the fixture's
    unique extremes had been masking the hazard)."""
    orders = load_table(spark, sf_dir, "orders")
    tie = (
        F.round(F.col("o_totalprice") * 100).cast("bigint") * 100_000_000
        + F.col("o_orderkey")
    )
    return orders.groupBy("o_orderstatus").agg(
        F.min_by("o_orderkey", tie).alias("cheapest_order"),
        F.max_by("o_orderkey", tie).alias("priciest_order"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@query("sample_fraction")  # rows-only: RNG streams differ per engine by design
def sample_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-sample: seeded Bernoulli sample (Dask ``.sample``). Deterministic
    for a fixed seed+partitioning within Spark, but engine-specific RNG →
    rows-only check."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select("l_orderkey", "l_linenumber")


@query(
    "join_indicator",
    oracle="""
    WITH c AS (SELECT c_custkey AS custkey FROM customer),
         o AS (SELECT DISTINCT o_custkey AS custkey FROM orders)
    SELECT CASE WHEN c.custkey IS NOT NULL AND o.custkey IS NOT NULL THEN 'both'
                WHEN c.custkey IS NOT NULL THEN 'left_only'
                ELSE 'right_only' END AS indicator,
           COUNT(*) AS n
    FROM c FULL OUTER JOIN o ON c.custkey = o.custkey
    GROUP BY 1
    """,
)
def join_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9 merge(indicator=True): pandas-style provenance column over a full
    outer join — 'both' / 'left_only' / 'right_only' counts.

    Spark has no indicator kwarg; the idiom is null-flag columns on either
    side of the full outer join. Scale: both sides project to the single
    join key before shuffling (minimal shuffle width), and the aggregation
    on the 3-value indicator is map-side partial.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    ords = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    ).distinct()
    joined = cust.withColumn("_l", F.lit(1)).join(
        ords.withColumn("_r", F.lit(1)).withColumnRenamed("custkey", "r_custkey"),
        F.col("custkey") == F.col("r_custkey"),
        "full_outer",
    )
    ind = (
        F.when(F.col("_l").isNotNull() & F.col("_r").isNotNull(), "both")
        .when(F.col("_l").isNotNull(), "left_only")
        .otherwise("right_only")
    )
    return joined.groupBy(ind.alias("indicator")).agg(F.count("*").alias("n"))


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

    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 11 == 0)
    out = scratch_dir("csv_rt_") + "/lineitem_csv"
    li.select("l_orderkey", "l_returnflag", "l_quantity").write.mode(
        "overwrite"
    ).options(sep="|", header=False).csv(out)
    back = (
        spark.read.options(sep="|", header=False)
        .schema("l_orderkey bigint, l_returnflag string, l_quantity double")
        .csv(out)
    )
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@query(
    "salted_join_revenue",
    oracle="""
    SELECT c.c_nationkey            AS nationkey,
           COUNT(*)                 AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join (§7.5): orders ⋈ customer with the big side
    salted over 8 buckets and the small side replicated 8×, proving the
    rewrite is result-identical to the plain join (the oracle IS the plain
    join). At test scale Catalyst may still broadcast the replicated small
    side (salting is then cost-neutral); at 100 TB, where both sides
    shuffle, the (key, salt) composite spreads each hot key over 8
    reducers.
    """
    from ..operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    joined = salted_join(
        orders, cust, ["o_custkey"], unique_expr=F.col("o_orderkey"), buckets=8
    )
    return joined.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
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
    li.select("l_orderkey", "l_returnflag", "l_linestatus", "l_quantity").write.mode(
        "overwrite"
    ).partitionBy("l_returnflag").parquet(out)
    back = spark.read.parquet(out).where(F.col("l_returnflag") == "R")
    return back.groupBy("l_linestatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@query(
    "decimal_money_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR)
               AS sum_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(12,2))
                       - CAST(l_discount AS DECIMAL(12,2)))) AS VARCHAR)
               AS sum_charge
    FROM lineitem WHERE l_orderkey % 7 = 0
    GROUP BY 1
    """,
)
def decimal_money_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECIMAL end-to-end (SURVEY §1.2 type mapping): cast money columns to
    ``decimal(12,2)``, round-trip them through a parquet sink/scan (parquet
    stores decimals as fixed-point — the type must survive exactly), then
    aggregate in decimal arithmetic. Exact fixed-point is the semantics a
    finance pipeline needs at 100 TB: decimal SUM never drifts with
    accumulation order, unlike double.

    Output decimals are cast to string on BOTH sides because the harness
    would otherwise compare ``decimal.Decimal`` (Spark→pandas) against
    float64 (DuckDB fetchdf); the string form also certifies scale (always
    2 resp. 4 fractional digits).
    """

    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 7 == 0)
    dec = li.select(
        "l_returnflag",
        F.col("l_extendedprice").cast("decimal(12,2)").alias("price_dec"),
        F.col("l_discount").cast("decimal(12,2)").alias("disc_dec"),
    )
    out = scratch_dir("dec_rt_") + "/lineitem_dec"
    dec.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    dtypes = dict(back.dtypes)
    if dtypes["price_dec"] != "decimal(12,2)":  # round-trip must keep the type
        raise TypeError(f"decimal lost in parquet round-trip: {dtypes}")
    charge = F.col("price_dec") * (
        F.lit(1).cast("decimal(12,2)") - F.col("disc_dec")
    )
    return (
        back.withColumn("charge_dec", charge)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum("price_dec").cast("string").alias("sum_price"),
            F.sum("charge_dec").cast("string").alias("sum_charge"),
        )
    )


@query(
    "pivot_status_by_segment",
    oracle="""
    SELECT c_mktsegment,
           ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS F,
           ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS O,
           ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS P
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dask/pandas ``pivot_table``: long→wide reshaping via
    ``groupBy().pivot(col, values)``. Pinning the pivot values up front
    matters at scale: without the explicit list Spark runs an extra
    distinct-collect job over the pivot column to discover them."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum(F.coalesce("o_totalprice", F.lit(0.0))), 2))
        .na.fill(0.0, ["F", "O", "P"])
    )


@query(
    "unpivot_lineitem_metrics",
    oracle="""
    WITH m AS (
        SELECT l_returnflag, 'quantity' AS metric, l_quantity AS val FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'tax', l_tax FROM lineitem
    )
    SELECT l_returnflag, metric,
           COUNT(*) AS n, ROUND(SUM(val), 2) AS total
    FROM m GROUP BY 1, 2
    """,
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dask/pandas ``melt``: wide→long via ``DataFrame.unpivot`` (Spark's
    built-in, one pass — the oracle's UNION ALL form reads the table once
    per metric, which is exactly what unpivot avoids at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.unpivot(
            ids=["l_returnflag"],
            values=["l_quantity", "l_discount", "l_tax"],
            variableColumnName="metric",
            valueColumnName="val",
        )
        .withColumn("metric", F.expr("substr(metric, 3)"))  # l_quantity -> quantity
        .groupBy("l_returnflag", "metric")
        .agg(F.count("*").alias("n"), F.round(F.sum("val"), 2).alias("total"))
    )


@query(
    "describe_lineitem",
    oracle="""
    SELECT 'l_quantity' AS column_name,
           COUNT(l_quantity)                    AS n,
           ROUND(AVG(l_quantity), 6)            AS mean,
           ROUND(STDDEV_SAMP(l_quantity), 6)    AS std,
           MIN(l_quantity)                      AS min_val,
           MAX(l_quantity)                      AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice',
           COUNT(l_extendedprice), ROUND(AVG(l_extendedprice), 6),
           ROUND(STDDEV_SAMP(l_extendedprice), 6),
           MIN(l_extendedprice), MAX(l_extendedprice)
    FROM lineitem
    """,
)
def describe_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dask/pandas ``describe()``: per-column summary stats in long form.

    One scan computes all columns' aggregates simultaneously (a single
    partial+final HashAggregate over zero grouping keys); the long-form
    reshape is a literal-column union of the single result row — no second
    scan, unlike the oracle's UNION ALL."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.count("l_quantity").alias("q_n"),
        F.round(F.avg("l_quantity"), 6).alias("q_mean"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("q_std"),
        F.min("l_quantity").alias("q_min"),
        F.max("l_quantity").alias("q_max"),
        F.count("l_extendedprice").alias("p_n"),
        F.round(F.avg("l_extendedprice"), 6).alias("p_mean"),
        F.round(F.stddev_samp("l_extendedprice"), 6).alias("p_std"),
        F.min("l_extendedprice").alias("p_min"),
        F.max("l_extendedprice").alias("p_max"),
    )
    q = stats.select(
        F.lit("l_quantity").alias("column_name"),
        F.col("q_n").alias("n"), F.col("q_mean").alias("mean"),
        F.col("q_std").alias("std"),
        F.col("q_min").alias("min_val"), F.col("q_max").alias("max_val"),
    )
    p = stats.select(
        F.lit("l_extendedprice").alias("column_name"),
        F.col("p_n").alias("n"), F.col("p_mean").alias("mean"),
        F.col("p_std").alias("std"),
        F.col("p_min").alias("min_val"), F.col("p_max").alias("max_val"),
    )
    return q.unionByName(p)


@query(
    "sql_entrypoint",
    oracle="""
    SELECT n_name,
           COUNT(DISTINCT c_custkey)   AS n_customers,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM nation
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    WHERE o_orderstatus = 'F'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def sql_entrypoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry point 3 (SURVEY.md §3): a free-form SQL string over the
    registered catalog views — the identical text a user would hand to
    ``spark.sql`` runs against DuckDB as its own oracle. Catalyst plans it
    exactly like the DataFrame form (same logical plan after analysis);
    this certifies the register_views + SQL surface end-to-end."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name,
               COUNT(DISTINCT c_custkey)   AS n_customers,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM nation
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders   ON o_custkey = c_custkey
        WHERE o_orderstatus = 'F'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
        """
    )


@query(
    "grouping_sets_sql",
    oracle="""
    SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
           COALESCE(CAST(c_nationkey AS VARCHAR), 'ALL') AS nation,
           COUNT(*) AS n,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    """,
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D12 GROUPING SETS proper (rollup/cube are the prefix/powerset
    specializations, certified separately): per-segment, per-nation, and
    grand totals in ONE pass — Catalyst expands the sets into a single
    Expand + hash aggregate, vs three scans if written as UNION ALL."""

    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_gs_customer")
    return spark.sql(
        """
        SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
               COALESCE(CAST(c_nationkey AS STRING), 'ALL') AS nation,
               COUNT(*) AS n,
               ROUND(SUM(c_acctbal), 2) AS total_bal
        FROM _gs_customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """
    )


@query(
    "regexp_extract_docs",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+tion)')          AS first_tion,
           CAST(len(regexp_extract_all(text, 'scan')
                ) AS BIGINT)                             AS n_scan,
           regexp_replace(substr(text, 1, 30),
                          '[aeiou]', '_', 'g')           AS devoweled
    FROM documents WHERE doc_id % 31 = 0
    """,
)
def regexp_extract_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-string regex family: regexp_extract (first match), count of all
    matches, global regexp_replace — the pandas ``.str.extract`` /
    ``.str.count`` / ``.str.replace`` trio. All JVM-side regex (codegen'd);
    no Python."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 31 == 0)
    return docs.select(
        "doc_id",
        F.regexp_extract("text", "([a-z]+tion)", 1).alias("first_tion"),
        F.size(F.expr("regexp_extract_all(text, 'scan', 0)")).cast("long").alias("n_scan"),
        F.regexp_replace(F.substring("text", 1, 30), "[aeiou]", "_").alias("devoweled"),
    )


@query("sample_stratified")  # rows-only: engine RNG streams differ by design
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-sample stratified: ``sampleBy`` with per-stratum fractions (the
    groupby-sample idiom) — seeded and deterministic within Spark for a
    fixed partitioning; rows-only because RNG streams are engine-specific.
    Scale: sampling is a map-side filter, no shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.sampleBy(
        "l_returnflag", {"A": 0.05, "N": 0.01, "R": 0.05}, seed=7
    ).select("l_orderkey", "l_linenumber", "l_returnflag")


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
    "agg_misc",
    oracle="""
    SELECT l_returnflag,
           CAST(mode(l_quantity) AS DOUBLE)        AS qty_mode,
           ROUND(median(l_extendedprice), 4)       AS price_median,
           bool_and(l_quantity >= 1.0)             AS all_positive,
           bool_or(l_discount > 0.09)              AS any_big_discount,
           MIN(l_linestatus)                       AS a_status
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-family completion: mode / median (exact) / bool_and / bool_or, and
    a deterministic any_value stand-in (MIN — ``any_value`` itself is
    legitimately nondeterministic, so the certified form pins it).

    Note: Spark's ``mode`` breaks frequency ties nondeterministically;
    l_quantity's integral grid at this scale has a unique winner per group
    (verified by the hash match)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.mode("l_quantity").cast("double").alias("qty_mode"),
        F.round(F.median("l_extendedprice"), 4).alias("price_median"),
        F.bool_and(F.col("l_quantity") >= 1.0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_big_discount"),
        F.min("l_linestatus").alias("a_status"),
    )


@query(
    "array_set_ops",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               list_distinct(string_split(text, ' ')) AS u,
               list_distinct(string_split(upper(text), ' ')) AS v
        FROM documents WHERE doc_id % 53 = 0
    )
    SELECT doc_id,
           CAST(len(list_intersect(u, v)) AS INT)  AS n_common,
           CAST(len(u) + len(v) - len(list_intersect(u, v)) AS INT) AS n_union,
           array_to_string(list_sort(list_filter(u,
                x -> NOT list_contains(v, x)))[1:3], ',')  AS first_only_lower
    FROM w
    """,
)
def array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-array set algebra: array_intersect / array_union / array_except
    (+ sort/slice for determinism) between the lower- and upper-cased word
    sets of each document. All JVM-side; DuckDB recomputes with list_*
    equivalents (union expressed as |u|+|v|−|u∩v| to avoid ordering
    differences)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 53 == 0)
    u = F.array_distinct(F.split("text", " "))
    v = F.array_distinct(F.split(F.upper("text"), " "))
    return docs.select(
        "doc_id",
        F.size(F.array_intersect(u, v)).alias("n_common"),
        F.size(F.array_union(u, v)).alias("n_union"),
        F.array_join(F.slice(F.array_sort(F.array_except(u, v)), 1, 3), ",").alias(
            "first_only_lower"
        ),
    )


@query(
    "union_mismatched_schemas",
    oracle="""
    WITH a AS (SELECT o_orderkey AS k, o_totalprice AS price, NULL AS qty
               FROM orders WHERE o_orderkey % 101 = 0),
         b AS (SELECT l_orderkey AS k, NULL AS price, l_quantity AS qty
               FROM lineitem WHERE l_orderkey % 101 = 0)
    SELECT k, COUNT(price) AS n_price, COUNT(qty) AS n_qty,
           ROUND(SUM(COALESCE(price, 0) + COALESCE(qty, 0)), 2) AS mixed_sum
    FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
    GROUP BY k
    """,
)
def union_mismatched_schemas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 with schema drift: Dask's ``dd.concat`` of frames with different
    columns fills the gaps with NaN; Spark's form is
    ``unionByName(allowMissingColumns=True)`` filling with NULL. Certifies
    the null-fill semantics through aggregation (COUNT skips the fills)."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 101 == 0)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 101 == 0)
    a = orders.select(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("price"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_quantity").alias("qty"))
    u = a.unionByName(b, allowMissingColumns=True)
    return u.groupBy("k").agg(
        F.count("price").alias("n_price"),
        F.count("qty").alias("n_qty"),
        F.round(
            F.sum(F.coalesce("price", F.lit(0.0)) + F.coalesce("qty", F.lit(0.0))), 2
        ).alias("mixed_sum"),
    )


@query(
    "posexplode_words",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
               FROM documents WHERE doc_id % 211 = 0)
    SELECT doc_id, CAST(i - 1 AS INT) AS pos, ws[i] AS word
    FROM w, UNNEST(generate_series(1, len(ws))) AS t(i)
    """,
)
def posexplode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/H-array: ``posexplode`` — the builtin positional table function
    (vs the Python UDTF in ``udtf_bigrams``; this one never leaves the
    JVM)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 211 == 0)
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
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
    "crosstab_status_segment",
    oracle="""
    SELECT c_mktsegment AS segment,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """,
)
def crosstab_status_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas/Dask ``crosstab`` via ``df.stat.crosstab`` — contingency
    counts of two categorical columns. The column set is data-dependent
    (one per distinct value), which is exactly why ``pivot`` with pinned
    values is preferred at scale; the output domain is pinned here with
    zero-filled columns for any status value absent from the slice (a
    bare ``select("F","O","P")`` would throw AnalysisException on such a
    fixture — round-1 ADVICE finding)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    ct = j.stat.crosstab("c_mktsegment", "o_orderstatus")
    present = set(ct.columns)
    cols = [
        (F.col(s) if s in present else F.lit(0)).cast("bigint").alias(s)
        for s in ("F", "O", "P")
    ]
    return ct.select(F.col("c_mktsegment_o_orderstatus").alias("segment"), *cols)


@query(
    "row_ids_unique",
    oracle="""
    SELECT COUNT(*)  AS n_rows,
           COUNT(*)  AS n_distinct_ids
    FROM lineitem
    """,
)
def row_ids_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dask index creation (``reset_index`` / default RangeIndex):
    ``monotonically_increasing_id`` mints a distinct 64-bit id per row with
    NO shuffle and no coordination (partition-id in the high bits, local
    counter in the low bits). Ids are run-dependent, so the certified
    property is uniqueness: distinct-count == row-count."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "__rid", F.monotonically_increasing_id()
    )
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("__rid").alias("n_distinct_ids"),
    )


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
    "price_histogram",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 30000) AS BIGINT) AS bucket,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1
    """,
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-family histogram: fixed-width value bucketing + count — the
    building block of every numeric profile/distribution report. The
    bucket expression is the IDENTICAL floor division on both sides
    (width_bucket's internal arithmetic differs between engines at
    boundaries; a shared explicit expression cannot)."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 30000).cast("bigint")
    return orders.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n_orders")
    )


@query(
    "regression_price_qty",
    oracle="""
    SELECT l_returnflag,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem GROUP BY 1
    """,
)
def regression_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D13+ linear-regression aggregates (slope/intercept/R²) — built-in
    partial-izable aggregates in both engines, so the fit costs exactly
    one hash-agg shuffle like any SUM; no ML library, no iteration."""
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.regr_count(y, x).cast("bigint").alias("n"),
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
    "rollup_grouping_id",
    oracle="""
    SELECT COALESCE(r_name, 'ALL') AS region,
           COALESCE(n_name, 'ALL') AS nation,
           CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS gid,
           COUNT(*) AS n
    FROM region JOIN nation ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D12 with grouping indicators: GROUPING() distinguishes a real NULL
    key from a subtotal row — without it a rollup over nullable keys is
    ambiguous. gid doubles as the aggregation-level id (0=detail,
    1=per-region subtotal, 3=grand total)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    j = region.join(nation, nation.n_regionkey == region.r_regionkey)
    gid = (F.grouping("r_name") * 2 + F.grouping("n_name")).cast("bigint")
    return (
        j.rollup("r_name", "n_name")
        .agg(gid.alias("gid"), F.count("*").alias("n"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "gid",
            "n",
        )
    )


# ------------------------------------------------ more source formats (A*)


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


# ------------------------------------------------------ SCD1 merge-upsert


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


# --------------------------------------- fuzzy match + null-safe join (C*)


@query(
    "fuzzy_match_nations",
    oracle="""
    WITH d AS (SELECT n_nationkey AS dirty_key,
                      lower(substr(n_name, 1, length(n_name) - 1)) AS dirty_name
               FROM nation),
    c AS (SELECT d.dirty_key, d.dirty_name, n.n_name,
                 levenshtein(d.dirty_name, lower(n.n_name)) AS dist
          FROM d JOIN nation n
            ON substr(d.dirty_name, 1, 1) = substr(lower(n.n_name), 1, 1)
           AND levenshtein(d.dirty_name, lower(n.n_name)) <= 2)
    SELECT dirty_key, dirty_name, n_name AS matched, dist
    FROM c
    QUALIFY ROW_NUMBER() OVER (PARTITION BY dirty_key
                               ORDER BY dist, n_name) = 1
    """,
)
def fuzzy_match_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution via blocking + verify: corrupt every nation name
    deterministically (lowercase, last char dropped), then re-match it to
    the canonical dimension by edit distance, keeping the best match.

    The plan is the production shape: a cheap BLOCKING predicate (equal
    first letter) bounds the candidate set so the quadratic levenshtein
    verify runs per block, never all-pairs — at 100 TB the block key is
    the join key (one shuffle / broadcast), and only candidates inside a
    block pay the DP cost. Best-match via row_number over (dist, name) is
    deterministic, so the result is exact-row certified."""
    nat = load_table(spark, sf_dir, "nation")
    dirty = nat.select(
        F.col("n_nationkey").alias("dirty_key"),
        F.lower(
            F.expr("substring(n_name, 1, length(n_name) - 1)")
        ).alias("dirty_name"),
    )
    canon = nat.select("n_name", F.lower("n_name").alias("__lc"))
    cand = (
        dirty.join(
            F.broadcast(canon),
            (
                F.substring("dirty_name", 1, 1)
                == F.substring("__lc", 1, 1)
            )
            & (F.levenshtein("dirty_name", "__lc") <= 2),
        )
        .withColumn("dist", F.levenshtein("dirty_name", "__lc"))
    )
    w = Window.partitionBy("dirty_key").orderBy("dist", "n_name")
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("dirty_key", "dirty_name", F.col("n_name").alias("matched"), "dist")
    )


@query(
    "null_safe_join",
    oracle="""
    WITH a AS (SELECT NULLIF(n_regionkey, 2) AS rk, COUNT(*) AS n_a
               FROM nation GROUP BY 1),
    b AS (SELECT NULLIF(r_regionkey, 2) AS rk, r_name
          FROM region)
    SELECT a.rk, a.n_a, b.r_name
    FROM a JOIN b ON a.rk IS NOT DISTINCT FROM b.rk
    """,
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-family: null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM) —
    NULL keys MATCH each other instead of vanishing, the semantics CDC
    and dimension-cleanup joins need for unknown keys. Still hash-joinable
    (null-safe equality is an equi-key to Spark), so no plan downgrade to
    nested-loop."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    a = nation.groupBy(
        F.nullif(F.col("n_regionkey"), F.lit(2)).alias("rk")
    ).agg(F.count("*").alias("n_a"))
    b = region.select(
        F.nullif(F.col("r_regionkey"), F.lit(2)).alias("rk"), "r_name"
    )
    return a.join(b, a.rk.eqNullSafe(b.rk)).select(a.rk.alias("rk"), "n_a", "r_name")


@query("quantile_approx_value", oracle=None)
def quantile_approx_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7's 100 TB path made runnable: ``percentile_approx`` (a mergeable
    quantile sketch) instead of the exact sort-based percentile — partials
    merge map-side like any agg, so quantiles of a 100 TB column cost one
    scan + a scalar-sized shuffle. Rows-only by design: sketch outputs are
    engine-specific (the exact twin `quantile_value` is the hash-checked
    one)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10_000).alias("median_approx"),
        F.percentile_approx("l_extendedprice", 0.95, 10_000).alias("p95_approx"),
    )


# ------------------------------------ mergeable aggregation state (D5/D1)


@query("hll_sketch_merge", oracle=None)
def hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5's production form: Apache DataSketches HLL state persisted and
    re-merged. Per (day, event_type) sketches (``hll_sketch_agg``) land in
    parquet as BINARY columns — a materialized, *mergeable* distinct-count
    state — then a second job unions them per event_type
    (``hll_union_agg``) and reads off the estimate.

    This is how distinct-counting actually runs at 100 TB: each
    day/partition aggregates its own fixed-size sketch once (map-side
    partial, bytes not rows shuffle), and any rollup window — day, month,
    all-time — is a cheap union of stored sketches with NO rescan of the
    raw events. Rows-only by design: sketch estimates are engine-specific
    (no DuckDB twin); ``tests/test_operators.py`` asserts the estimates
    against exact distinct counts instead."""

    ev = load_table(spark, sf_dir, "events")
    out = scratch_dir("hll_") + "/sketches"
    per_day = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sketch"))
    per_day.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("n_users_est"),
            F.count("*").alias("n_sketches_merged"),
        )
        .orderBy("event_type")
    )


@query(
    "incremental_agg_merge",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value,
           ROUND(SUM(value) / COUNT(*), 6) AS avg_value
    FROM events
    GROUP BY event_type
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregation via persisted partial state: the stream of
    events arrives as two batches (even/odd event_id halves standing in
    for yesterday/today); each batch reduces to per-group (sum, count)
    partials appended to a parquet state table; the final answer merges
    partials — sums add, counts add, avg = merged sum / merged count.

    The point at 100 TB: the raw events are aggregated ONCE per batch at
    arrival; every later query touches only the group-cardinality-sized
    state table. The algebra is exactly Spark's own partial/final split
    (plans/tpch.py q1 plan test), lifted to a *durable* boundary. The
    oracle recomputes from scratch over the full table — the hash match
    proves batch-split + merge ≡ single-pass aggregation."""

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    state_dir = scratch_dir("aggstate_") + "/state"
    for parity in (0, 1):
        batch = ev.where(F.col("event_id") % 2 == parity)
        batch.groupBy("event_type").agg(
            F.sum("value").alias("part_sum"),
            F.count("*").alias("part_n"),
        ).write.mode("append").parquet(state_dir)
    state = spark.read.parquet(state_dir)
    return state.groupBy("event_type").agg(
        F.sum("part_n").alias("n_events"),
        F.round(F.sum("part_sum"), 2).alias("total_value"),
        F.round(F.sum("part_sum") / F.sum("part_n"), 6).alias("avg_value"),
    )


# ------------------------------------------------- CDC / layout / sampling


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
           ROUND(SUM(price), 2) AS total_price
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
    return applied.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("price"), 2).alias("total_price"),
    )


@query(
    "sample_k_per_group",
    oracle="""
    SELECT doc_id, source FROM documents
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY source
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 50
    """,
)
def sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-group deterministic sample: rank rows inside each
    group by the md5 of their key (a uniform, engine-portable pseudo-random
    order) and keep the first 50. Unlike ``rand()`` reservoir sampling the
    selection is reproducible across engines/runs/partitionings — the
    oracle re-derives the identical 50 ids per source — and unlike
    ``sample(fraction)`` the per-group size is exact. One shuffle on the
    group key; the window's top-k applies during the sort, so at 100 TB
    this is the partition-parallel 'take a pinned eval slice per domain'
    op."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 50)
        .select("doc_id", "source")
    )


@query(
    "sorted_layout_roundtrip",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-03' AND ts < TIMESTAMP '2024-01-04'
    GROUP BY 1, 2
    """,
)
def sorted_layout_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-layout optimization: rewrite events range-partitioned AND
    sorted by ``ts`` (``repartitionByRange`` + ``sortWithinPartitions``),
    then answer a time-slice query from the rewritten copy.

    Why this layout wins at 100 TB: parquet stores per-row-group min/max
    stats; with rows time-clustered, a ``ts`` predicate prunes whole files
    (range partitioning ⇒ most files' ranges miss) and whole row groups
    inside surviving files — I/O proportional to the slice, not the table.
    Unsorted data defeats both prunings (every row group spans the full
    range). The oracle answers from the original source, so the hash match
    certifies the rewrite lost/duplicated nothing."""

    ev = load_table(spark, sf_dir, "events")
    out = scratch_dir("sorted_") + "/events_sorted"
    (
        ev.repartitionByRange(8, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(out)
    )
    # timestamp_ntz literals: ts IS NTZ (catalog contract) — an LTZ cast
    # here would make the day-slice session-timezone-dependent (r7 review)
    back = spark.read.parquet(out).where(
        (F.col("ts") >= F.lit("2024-01-03").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-04").cast("timestamp_ntz"))
    )
    return back.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))


@query(
    "bucketed_join_agg",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           COUNT(*) AS n_lines,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
)
def bucketed_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3's persisted half (SURVEY §2-C): orders and lineitem rewritten as
    co-bucketed catalog tables (``bucketBy(8, key).sortBy(key)``), then
    sort-merge-joined WITHOUT an Exchange on either side — the Spark twin
    of Dask's persisted sorted ``divisions``.

    At 100 TB this converts the daily fact-join's full-table shuffle into
    a one-time write cost: each side's files are pinned to
    ``murmur3(key) % 8``, so the join reads matching buckets directly
    (``tests/test_plans.py::test_bucketed_join_no_exchange`` asserts
    zero Exchange vs two Exchanges for the identical unbucketed join;
    the residual per-bucket sort is shuffle-free and linear over
    ``sortBy``-clustered rows). The ``merge`` hint pins SMJ so the demo exercises
    the bucketed path even at sf0.01 where AQE would otherwise broadcast.
    The oracle answers from the raw tables — the hash match certifies the
    bucketed rewrite lost/duplicated nothing."""

    from ..operators.layout import write_bucketed

    base = scratch_dir("bucketed_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    bo = write_bucketed(o, "bkt_orders", "o_orderkey", base + "/orders")
    bl = write_bucketed(li, "bkt_lineitem", "l_orderkey", base + "/lineitem")
    joined = bo.hint("merge").join(
        bl, bo["o_orderkey"] == bl["l_orderkey"]
    )
    return joined.groupBy(
        F.col("o_orderpriority").alias("priority")
    ).agg(
        F.count("*").alias("n_lines"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


@query(
    "xml_parse_orders",
    oracle="""
    SELECT o_orderpriority      AS priority,
           COUNT(*)             AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders GROUP BY 1
    """,
)
def xml_parse_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-xml: ``from_xml`` (built into Spark 4 — no spark-xml package)
    round-trip: serialize two order fields into an XML fragment, parse
    them back with a declared schema, aggregate on the parsed struct.
    Mirrors ``csv_roundtrip_agg``'s pattern for feeds that arrive as XML
    documents: the parse is JVM-side (StaxXmlParser), stays inside
    whole-stage codegen's pipeline, and never touches Python. The oracle
    aggregates the source columns directly — parse-then-aggregate must be
    lossless."""
    orders = load_table(spark, sf_dir, "orders")
    xml = F.concat(
        F.lit("<o><p>"), F.col("o_orderpriority"), F.lit("</p><t>"),
        F.col("o_totalprice").cast("string"), F.lit("</t></o>"),
    )
    parsed = orders.select(F.from_xml(xml, "p STRING, t DOUBLE").alias("x"))
    return parsed.groupBy(F.col("x.p").alias("priority")).agg(
        F.count("*").alias("n"), F.round(F.sum("x.t"), 2).alias("total")
    )


@query(
    "lateral_top_lineitems",
    oracle="""
    SELECT big.o_orderkey, big.o_totalprice, t.l_extendedprice
    FROM (SELECT o_orderkey, o_totalprice FROM orders
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 5) big,
         LATERAL (SELECT l_extendedprice FROM lineitem
                  WHERE l_orderkey = big.o_orderkey
                  ORDER BY l_extendedprice DESC LIMIT 2) t
    """,
)
def lateral_top_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join (Spark 4 ``DataFrame.lateralJoin``): for
    each of the 5 priciest orders, the 2 most expensive lineitems. The
    lateral form evaluates the correlated top-k per outer row — the right
    tool when the outer side is tiny (vs. a window rank over the whole
    fact table, which is the scale path when every group is needed; see
    ``topn_parts_per_brand`` for that twin). Ordering ties on
    ``l_extendedprice`` are harmless: the projected output is the price
    itself, so any tie choice yields the same multiset."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        orders.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(5)
        .select("o_orderkey", "o_totalprice")
    )
    top_li = (
        li.where(F.col("l_orderkey") == F.col("o_orderkey").outer())
        .orderBy(F.desc("l_extendedprice"))
        .limit(2)
        .select("l_extendedprice")
    )
    return big.lateralJoin(top_li)


@query(
    "recursive_month_spine",
    oracle="""
    WITH RECURSIVE spine(m) AS (
        SELECT DATE '1996-01-01'
        UNION ALL
        SELECT m + INTERVAL 1 MONTH FROM spine
        WHERE m < DATE '1997-12-01'
    )
    SELECT strftime(m, '%Y-%m') AS month, COUNT(o.o_orderkey) AS n_urgent
    FROM spine s LEFT JOIN orders o
      ON date_trunc('month', o.o_orderdate) = s.m
     AND o.o_orderpriority = '1-URGENT'
    GROUP BY 1
    """,
)
def recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (new in Spark 4): generate the complete month spine of
    the order-date range — including months with zero matching orders —
    then left-join urgent-order counts onto it. Zero-filled calendar spines
    are the canonical WITH RECURSIVE use (a bare GROUP BY silently drops
    empty months); the window is pinned to 24 months because every
    recursion level costs one plan segment (~150 ms of fixed overhead
    locally — depth, not data volume, is what recursion prices), and
    ``spark.sql.cteRecursionLevelLimit`` (100 default) bounds it. For
    unbounded-depth graph closure, iterative checkpointed propagation
    (``operators/dedup.py:connected_components``) remains the 100 TB path."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__orders_rec")
    return spark.sql(
        """
        WITH RECURSIVE spine(m) AS (
            SELECT TIMESTAMP '1996-01-01'
            UNION ALL
            SELECT m + INTERVAL '1' MONTH FROM spine
            WHERE m < TIMESTAMP '1997-12-01'
        )
        SELECT date_format(s.m, 'yyyy-MM') AS month,
               COUNT(o.o_orderkey)         AS n_urgent
        FROM spine s LEFT JOIN __orders_rec o
          ON date_trunc('MONTH', o.o_orderdate) = s.m
         AND o.o_orderpriority = '1-URGENT'
        GROUP BY 1
        """
    )


@query(
    "pandas_api_groupby",
    oracle="""
    SELECT o_orderstatus                    AS status,
           COUNT(*)                         AS n,
           ROUND(AVG(o_totalprice), 4)      AS avg_price
    FROM orders GROUP BY 1
    """,
)
def pandas_api_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas API on Spark (``pyspark.pandas``) — the direct counterpart of
    the reference's Dask-dataframe dialect: a user migrating from
    ``dd.read_parquet(...).groupby(...).agg(...)`` keeps that exact shape
    and gets a Catalyst plan underneath (``to_spark`` exposes it — same
    partial+final hash aggregate as the native ``groupBy``; the pandas
    layer adds plan nodes, not a different execution). The escape hatch in
    both directions (`to_spark` / `pandas_api`) means the two dialects mix
    freely in one pipeline."""
    import pyspark.pandas as ps

    psdf = ps.read_parquet(f"{sf_dir}/orders.parquet")
    g = (
        psdf.groupby("o_orderstatus")
        .agg(n=("o_orderkey", "count"), avg_price=("o_totalprice", "mean"))
        .reset_index()
    )
    sdf = g.to_spark()
    return sdf.select(
        F.col("o_orderstatus").alias("status"),
        "n",
        F.round("avg_price", 4).alias("avg_price"),
    )


@query(
    "try_arithmetic_safety",
    oracle="""
    SELECT COUNT(*)                                          AS n,
           COUNT(*) - COUNT(l_extendedprice / NULLIF(l_quantity - 10, 0))
                                                             AS n_div_null,
           ROUND(SUM(l_extendedprice / NULLIF(l_quantity - 10, 0)), 2)
                                                             AS ratio_sum,
           COUNT(TRY_CAST(substr(strftime(l_shipdate, '%Y-%m-%d'), 1, 4) AS INTEGER))
                                                             AS n_year_castable,
           COUNT(TRY_CAST(l_returnflag AS INTEGER))          AS n_flag_castable
    FROM lineitem
    """,
)
def try_arithmetic_safety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode safety valves: Spark 4 runs with ANSI SQL semantics ON —
    division by zero / overflow / bad casts RAISE by default instead of
    silently corrupting. The ``try_*`` family opts specific expressions
    back into null-on-error, which is what a 100 TB ingest of dirty data
    wants: one malformed row yields a NULL to count and quarantine, not a
    dead 6-hour job. The oracle mirrors ``try_divide`` with
    ``NULLIF``-guarded division and DuckDB's own ``TRY_CAST``."""
    li = load_table(spark, sf_dir, "lineitem")
    ratio = F.try_divide("l_extendedprice", F.col("l_quantity") - 10)
    year = F.substring(F.col("l_shipdate").cast("string"), 1, 4).try_cast("int")
    flag = F.col("l_returnflag").try_cast("int")
    return li.agg(
        F.count("*").alias("n"),
        (F.count("*") - F.count(ratio)).alias("n_div_null"),
        F.round(F.sum(ratio), 2).alias("ratio_sum"),
        F.count(year).alias("n_year_castable"),
        F.count(flag).alias("n_flag_castable"),
    )


@query(
    "parameterized_sql_orders",
    oracle="""
    SELECT o_orderpriority AS priority,
           COUNT(*)                    AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderdate >= DATE '1997-01-01'
    GROUP BY 1
    """,
)
def parameterized_sql_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 3.4+/4): ``spark.sql(text, args=...)`` binds
    named parameters server-side — ``:cutoff`` arrives as a typed literal
    (a Python ``date`` stays a DATE, so the parquet min/max pushdown still
    prunes), and ``IDENTIFIER(:tbl)`` resolves a *name* position safely —
    the injection-proof way to template one audited query text over many
    tables/dates in a 100 TB pipeline. ``GROUP BY ALL`` groups by every
    non-aggregate select item. The oracle is the fully-inlined equivalent."""
    import datetime

    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority AS priority,
               COUNT(*)                    AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM IDENTIFIER(:tbl)
        WHERE o_orderdate >= :cutoff
        GROUP BY ALL
        """,
        args={"tbl": "orders", "cutoff": datetime.date(1997, 1, 1)},
    )


@query(
    "paginate_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 10
    """,
)
def paginate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 + pagination: ``offset(10).limit(10)`` — page 2 of a
    deterministically ordered result (tie-broken on the key). Spark plans
    this as a single ``TakeOrderedAndProject(limit=20, offset=10)``: each
    partition keeps only its local top-20 heap, the driver merges and
    drops the first 10 — no global sort, no shuffle of anything beyond
    20 rows per partition, which is why ORDER BY + LIMIT/OFFSET pagination
    is safe at 100 TB as long as the page depth stays bounded."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(10)
        .limit(10)
    )


@query(
    "median_mode_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(median(l_quantity), 6)                                  AS median_qty,
           mode(l_linestatus)                                            AS mode_status,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6)                 AS p50_price,
           ROUND(quantile_disc(l_extendedprice, 0.5), 6)                 AS p50_price_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def median_mode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7/D10 extension: exact order statistics — ``median`` (linear
    interpolation), ``mode`` (most frequent value), and the ANSI
    ``percentile_cont/_disc`` WITHIN GROUP forms, per group.

    Scale notes: unlike ``percentile_approx`` (mergeable GK sketch, the
    100 TB default elsewhere in this repo), exact percentiles must gather
    each group's values — Spark's ``Percentile`` aggregate buffers a
    counts-map per group (value → count), so memory is O(distinct values
    per group), not O(rows); ``mode`` likewise partial-aggregates a
    counts-map map-side. Both are safe when per-group cardinality is
    bounded (quantities/prices here), and exactly the aggregates a
    training-data QC report wants precise. The fixture has no count ties
    within a group (A 10003 / N 9924 / R 10009 per status at sf0.01), so
    ``mode`` is engine-deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 6).alias("median_qty"),
        F.mode("l_linestatus").alias("mode_status"),
        F.round(
            F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"), 6
        ).alias("p50_price"),
        F.round(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"), 6
        ).alias("p50_price_disc"),
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
    "zorder_layout_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*)                    AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    WHERE o_custkey BETWEEN 100 AND 240
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY o_orderstatus
    """,
)
def zorder_layout_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dim clustered layout: rewrite orders Z-ORDERED on
    (o_custkey, order day) — operators/layout.zorder_rewrite — then answer
    a two-dimensional box query from the rewritten copy.

    Why this beats single-key sort at 100 TB: sorting by custkey alone
    gives every file the FULL date range (a date predicate prunes
    nothing); interleaving the bits of both keys gives every file a small
    bounding box in BOTH dimensions, so parquet min/max stats skip most
    files for customer-only, date-only, and box queries alike
    (tests/test_plans.py quantifies the skip vs a linear sort on this
    exact layout). The oracle answers from the original table — the hash
    match certifies the rewrite lost/duplicated nothing."""

    from ..operators.layout import zorder_rewrite

    o = load_table(spark, sf_dir, "orders").withColumn(
        "__day", F.datediff("o_orderdate", F.lit("1995-01-01").cast("timestamp_ntz"))
    )
    out = scratch_dir("zorder_") + "/orders_z"
    zorder_rewrite(o, ["o_custkey", "__day"], out, bits=10, n_files=16)
    back = spark.read.parquet(out).where(
        F.col("o_custkey").between(100, 240)
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


_COMPACT_SCRATCH: dict = {}


def _compact_scratch_dir(sf_dir: str) -> str:
    """One scratch directory per (process, sf_dir) for the compaction demo.

    ``SPARK_GRAFT_SCRATCH`` overrides the base with any Hadoop-readable URI
    (HDFS/s3a) so the query also runs on a real cluster where driver-local
    ``tempfile`` paths are not visible to executors; without it, a single
    local tempdir is created once, reused across repetitions (both writes
    are ``mode("overwrite")``), and removed at interpreter exit — the perf
    sweep's repeated runs no longer leak a lineitem copy per rep.
    """
    base = _COMPACT_SCRATCH.get(sf_dir)
    if base is None:
        # delegate to the shared scratch helper (r7): per-process-unique
        # base under SPARK_GRAFT_SCRATCH too — the old sf_dir-only remote
        # tag let two concurrent sweeps of the same dataset clobber each
        # other's non-transactional compaction swap mid-query. The
        # per-(process, sf_dir) cache preserves cross-rep reuse; cleanup
        # rides the helper's atexit.
        base = scratch_dir("compact_")
        _COMPACT_SCRATCH[sf_dir] = base
    return base


@query(
    "compact_small_files",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT)       AS n,
           ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem GROUP BY 1, 2
    """,
)
def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout maintenance: explode lineitem into 64 undersized parquet
    files (the streaming-sink/over-parallel-writer pathology), then
    bin-pack them back to ``ceil(bytes / target)`` right-sized files via
    :func:`..operators.layout.compact_rewrite` — sized from actual on-disk
    bytes (Hadoop FS listing), the same numbers a lakehouse OPTIMIZE uses.
    The aggregate is answered from the COMPACTED copy and the oracle from
    the original table, so the hash match certifies the rewrite
    lost/duplicated nothing; tests/test_sources.py pins the file-count
    contract (64 → ceil) and the size balance."""
    from ..operators.layout import compact_rewrite

    li = load_table(spark, sf_dir, "lineitem")
    base = _compact_scratch_dir(sf_dir)
    li.repartition(64).write.mode("overwrite").parquet(f"{base}/small")
    compact_rewrite(
        spark, f"{base}/small", f"{base}/packed", target_bytes=8 * 1024 * 1024
    )
    back = spark.read.parquet(f"{base}/packed")
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )


@query(
    "compact_partition_scoped",
    oracle="""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders GROUP BY 1
    """,
)
def compact_partition_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped OPTIMIZE (VERDICT r5 #4): orders is laid out
    partitioned by ``o_orderstatus`` with 16 undersized files per
    partition, then ONLY the ``o_orderstatus=F`` partition is compacted
    via :func:`..operators.layout.compact_partitions` — direct partition
    addressing (no whole-table listing) plus a staged delete-rename swap,
    the maintenance shape that still works when the table is 100 TB and
    the hot partition is the only one needing attention. The aggregate
    reads the WHOLE table back (compacted partition + untouched ones) and
    the oracle aggregates the original orders, so the hash match certifies
    the scoped rewrite lost/duplicated nothing anywhere;
    tests/test_layouts.py pins the scoping contract itself (untouched
    partitions keep byte-identical file lists, target partition reaches
    its bin-packed file count)."""
    from ..operators.layout import compact_partitions

    orders = load_table(spark, sf_dir, "orders")
    base = _compact_scratch_dir(sf_dir)
    ptable = f"{base}/ptable"
    (
        orders.repartition(16)
        .write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .parquet(ptable)
    )
    compact_partitions(
        spark, ptable, {"o_orderstatus": "F"}, target_bytes=8 * 1024 * 1024
    )
    back = spark.read.parquet(ptable)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "data_quality_report",
    oracle="""
    WITH s AS (SELECT
        COUNT(*) AS n,
        COUNT(CASE WHEN l_orderkey IS NULL THEN 1 END) AS r0,
        COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS r1,
        COUNT(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 END) AS r2,
        COUNT(CASE WHEN l_quantity < 1 OR l_quantity > 25 THEN 1 END) AS r3,
        COUNT(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 END) AS r4,
        GREATEST(0, 1000 - COUNT(*)) AS r5
      FROM lineitem)
    SELECT rule, violations,
           CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
    FROM (
      SELECT 'not_null(l_orderkey)' AS rule, CAST(r0 AS BIGINT) AS violations
        FROM s
      UNION ALL SELECT 'unique(l_orderkey, l_linenumber)', CAST(r1 AS BIGINT)
        FROM s
      UNION ALL SELECT 'in_range(l_discount, 0, 0.1)', CAST(r2 AS BIGINT)
        FROM s
      UNION ALL SELECT 'in_range(l_quantity, 1, 25)', CAST(r3 AS BIGINT)
        FROM s
      UNION ALL SELECT 'accepted_values(l_returnflag)', CAST(r4 AS BIGINT)
        FROM s
      UNION ALL SELECT 'min_rows(1000)', CAST(r5 AS BIGINT) FROM s
    )
    """,
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint report (Deequ / dbt-test pattern): six
    declared rules — key not-null, composite-key uniqueness, two numeric
    ranges, an accepted-values set, a minimum row count — ALL evaluated in
    one aggregation pass over lineitem (operators/quality.py), unpivoted
    to one deterministic (rule, violations, passed) row each. Two rules
    FAIL by design — the l_quantity range is deliberately tight, and the
    synthetic testdata's (l_orderkey, l_linenumber) key is genuinely
    non-unique — so the report demonstrates exact violation counting, and
    the oracle recomputing every rule in SQL certifies those counts. At
    100 TB the single pass is the whole point — validation must not
    double pipeline I/O."""
    from ..operators import quality as Q

    li = load_table(spark, sf_dir, "lineitem")
    return Q.check(
        li,
        [
            Q.not_null("l_orderkey"),
            Q.unique("l_orderkey", "l_linenumber"),
            Q.in_range("l_discount", 0, 0.1),
            Q.in_range("l_quantity", 1, 25),
            Q.accepted_values("l_returnflag", ["A", "N", "R"]),
            Q.min_rows(1000),
        ],
    )


@query(
    "quality_report_by_status",
    oracle="""
    WITH s AS (SELECT l_returnflag,
        COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS r0,
        COUNT(CASE WHEN l_quantity < 1 OR l_quantity > 25 THEN 1 END) AS r1,
        GREATEST(0, 10000 - COUNT(*)) AS r2
      FROM lineitem GROUP BY 1)
    SELECT l_returnflag, rule, violations,
           CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
    FROM (
      SELECT l_returnflag, 'unique(l_orderkey, l_linenumber)' AS rule,
             CAST(r0 AS BIGINT) AS violations FROM s
      UNION ALL SELECT l_returnflag, 'in_range(l_quantity, 1, 25)',
             CAST(r1 AS BIGINT) FROM s
      UNION ALL SELECT l_returnflag, 'min_rows(10000)',
             CAST(r2 AS BIGINT) FROM s
    )
    """,
)
def quality_report_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-PARTITION data-quality report (VERDICT r5 #8's grouped Deequ
    analogy): the same declared rules as ``data_quality_report`` but
    evaluated per ``l_returnflag`` group in one grouped aggregation pass
    (``operators/quality.check_grouped``) — per-group uniqueness, a
    per-group value range whose violation counts differ by group, and a
    per-group minimum row count that some groups fail. One shuffle on the
    group key, report unpivoted to (group, rule, violations, passed); the
    oracle recomputes every (group, rule) cell in SQL."""
    from ..operators import quality as Q

    li = load_table(spark, sf_dir, "lineitem")
    return Q.check_grouped(
        li,
        "l_returnflag",
        [
            Q.unique("l_orderkey", "l_linenumber"),
            Q.in_range("l_quantity", 1, 25),
            Q.min_rows(10000),
        ],
    )


@query(
    "mad_robust_outliers",
    oracle="""
    WITH med AS (SELECT event_type,
                        quantile_cont(value, 0.5) AS med
                 FROM events GROUP BY 1),
    dev AS (SELECT e.event_type, e.value, m.med,
                   ABS(e.value - m.med) AS adev
            FROM events e JOIN med m USING (event_type)),
    mad AS (SELECT event_type,
                   quantile_cont(adev, 0.5) AS mad
            FROM dev GROUP BY 1)
    SELECT d.event_type,
           ROUND(ANY_VALUE(d.med), 6)  AS median_value,
           ROUND(ANY_VALUE(m.mad), 6)  AS mad_value,
           CAST(SUM(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
           COUNT(*)                    AS n
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
)
def mad_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per group: median + MAD (median absolute
    deviation), flagging values beyond 3×MAD — the quality gate that
    survives heavy-tailed training data where mean/stddev z-scores are
    themselves dragged by the outliers they should catch.

    Two exact grouped medians (counts-map percentile aggregate, memory
    O(distinct values per group)) with the tiny per-group stats broadcast
    back onto the data — the corpus shuffles once on the group key and the
    second pass is a broadcast join, so the shape is two scans + one
    shuffle regardless of table size. ``percentile_approx`` is the drop-in
    at extreme group cardinality."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY value)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY adev)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.any_value("med"), 6).alias("median_value"),
            F.round(F.any_value("mad"), 6).alias("mad_value"),
            F.sum(
                (F.col("adev") > 3 * F.col("mad")).cast("bigint")
            ).alias("n_outliers"),
            F.count("*").alias("n"),
        )
    )


@query(
    "cohort_retention_weekly",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
        FROM events GROUP BY 1),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts))
                    AS INT) AS week_offset
        FROM events e JOIN first_seen f USING (user_id))
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           week_offset,
           COUNT(*)                          AS n_active
    FROM activity
    WHERE week_offset BETWEEN 0 AND 3
    GROUP BY 1, 2
    """,
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, distinct-active
    counts at week offsets 0-3 — the canonical product-analytics rollup
    (and, for training pipelines, the freshness profile of a crawl).

    Shape at 100 TB: first-seen is one groupBy(user) min; the offset table
    re-joins events to that aggregate on user_id — same shuffle key both
    times, so AQE reuses one exchange of the event log; the DISTINCT
    before counting dedups (user, cohort, offset) triples at a cardinality
    bounded by users × 4, far below the raw log."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", "ts")).alias("cohort_week")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.expr(
                "CAST(timestampdiff(WEEK, cohort_week, date_trunc('week', ts)) AS INT)"
            ).alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.where(F.col("week_offset").between(0, 3))
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
        )
        .agg(F.count("*").alias("n_active"))
    )


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


# --------------------------------------------- A11: observed write as a query


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
