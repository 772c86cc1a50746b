"""The join family (SURVEY.md §2-C; split out of ``relational.py`` in
r9). Inner/left/full/semi/anti/cross, the join-indicator pattern,
salted skew joins, fuzzy and null-safe matching, and the zero-Exchange
bucketed SMJ demo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query, scratch_dir


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
    "salted_join_revenue",
    oracle="""
    SELECT c.c_nationkey            AS nationkey,
           COUNT(*)                 AS n_orders,
           CAST(ROUND(CAST(SUM(o.o_totalprice) AS DECIMAL(27,3)), 2)
                AS DOUBLE)          AS revenue
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
    # revenue rounds through DECIMAL(27,3): the r9 hostile-numeric gate put
    # a single 8194.925 (exact cent half-edge) group through this SUM and
    # plain ROUND diverged (Spark shortest-repr HALF_UP vs DuckDB binary).
    return joined.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice").cast("decimal(27,3)"), 2)
        .cast("double").alias("revenue"),
    )


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
