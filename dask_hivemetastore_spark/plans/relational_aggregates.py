"""The aggregate family (SURVEY.md §2-D + stats; split out of
``relational.py`` in r9). Distinct/approx-distinct, var/std, exact and
approximate quantiles, collect/value_counts, rollup/cube,
corr/regression, HLL sketch merge, mergeable incremental aggregation
state, and the grouped data-quality reports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query, scratch_dir, verify_enabled


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


@query(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_exact,
           1 AS within_rsd
    FROM events GROUP BY event_type
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 approx count-distinct (HyperLogLog++). At 100 TB this is the
    right default: no expand, fixed-size sketch merge.

    DERIVED full oracle (r10, VERDICT r9 #2 — previously rows-only, same
    recipe as ``hll_sketch_merge``): the raw estimate is engine-specific,
    but rsd=0.01 bounds the relative error; the query emits the exact
    count (Spark-side) plus a within-5×rsd INT verdict the oracle pins
    to 1, so an estimator regression turns a driver row red.

    The exact-twin verdict pass is gated by ``registry.verify_enabled()``
    (default ON — the driver contract; ``SPARK_GRAFT_VERIFY=0`` serves the
    sketch-only path with NULL verdict columns; r11 #7)."""
    ev = load_table(spark, sf_dir, "events")
    est = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("__est")
    )
    if not verify_enabled():
        # sketch-only serving path (r11 #7): one scan, no exact twin —
        # verdict columns NULL, schema unchanged
        return est.select(
            "event_type",
            F.lit(None).cast("long").alias("n_exact"),
            F.lit(None).cast("int").alias("within_rsd"),
        )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("__est") - F.col("n_exact"))
            <= F.greatest(F.lit(2), 0.05 * F.col("n_exact"))
        )
        .cast("int")
        .alias("within_rsd"),
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
           CAST(ROUND(CAST(QUANTILE_CONT(l_extendedprice, 0.5)
                           AS DECIMAL(27,5)), 4) AS DOUBLE) AS median_price,
           CAST(ROUND(CAST(QUANTILE_CONT(l_extendedprice, 0.95)
                           AS DECIMAL(27,5)), 4) AS DOUBLE) AS p95_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def quantile_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 quantiles — *exact* linear-interpolated percentile so the oracle
    hash matches. (`percentile_approx`/t-digest is the 100 TB path but is
    engine-specific, same argument as approx_distinct.)

    Rounding pin (r9 hostile-numeric gate): the engines interpolate with
    different formulas (a+(b−a)·g vs (1−g)·a+g·b), so their doubles can
    land one ulp either side of an exact half-edge — the corpus's p95 is
    exactly 7371.19375 and ROUND(·,4) diverged.  Both sides collapse to
    the exact value via DECIMAL(27,5) (scale = the exact value's grain:
    3-decimal data × 2-decimal interpolation weight) before rounding
    HALF_UP — see the engine-semantics notes in tests/diffgen.py."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", 0.5).cast("decimal(27,5)"), 4)
        .cast("double").alias("median_price"),
        F.round(F.percentile("l_extendedprice", 0.95).cast("decimal(27,5)"), 4)
        .cast("double").alias("p95_price"),
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
           CAST(ROUND(CAST(COVAR_SAMP(l_extendedprice, l_quantity)
                           AS DECIMAL(27,3)), 2) AS DOUBLE)  AS cov_pq
    FROM lineitem GROUP BY l_returnflag
    """,
)
def corr_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D13 correlation / covariance.

    Rounding pin (r9 hostile-numeric gate): a hostile group's exact
    covariance landed exactly on a cent half-edge (78812.125 — 3-decimal
    prices × integral quantities over n−1 = 8ths), where the engines'
    different update formulas straddle by one ulp.  Both sides collapse
    to the exact value via DECIMAL(27,3) before rounding HALF_UP.
    ``corr`` is dimensionless and stays plain ROUND at 6."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_pq"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity")
                .cast("decimal(27,3)"), 2).cast("double").alias("cov_pq"),
    )


@query(
    "argmin_argmax_orders",
    oracle="""
    WITH ranked AS (
      SELECT o_orderstatus, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice ASC, o_orderkey ASC)
               AS rn_min,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice DESC, o_orderkey DESC)
               AS rn_max
      FROM orders WHERE o_totalprice IS NOT NULL),
    args AS (
      SELECT o_orderstatus,
             MIN(CASE WHEN rn_min = 1 THEN o_orderkey END) AS cheapest_order,
             MIN(CASE WHEN rn_max = 1 THEN o_orderkey END) AS priciest_order
      FROM ranked GROUP BY o_orderstatus),
    aggs AS (
      SELECT o_orderstatus,
             CAST(ROUND(CAST(MIN(o_totalprice) AS DECIMAL(27,3)), 2)
                  AS DOUBLE) AS min_price,
             CAST(ROUND(CAST(MAX(o_totalprice) AS DECIMAL(27,3)), 2)
                  AS DOUBLE) AS max_price
      FROM orders GROUP BY o_orderstatus)
    SELECT a.o_orderstatus, g.cheapest_order, g.priciest_order,
           a.min_price, a.max_price
    FROM aggs a LEFT JOIN args g
      ON a.o_orderstatus IS NOT DISTINCT FROM g.o_orderstatus
    """,
)
def argmin_argmax_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 order-pinned first/last: min_by/max_by replace Dask's
    partition-order-dependent first()/last() — but on a bare ordering
    column they are still TIE-nondeterministic (two orders sharing the
    group extreme price let each engine pick its own orderkey).  The
    ordering value is therefore the composite ``struct(price, orderkey)``
    — Spark structs compare lexicographically, so the picked key is a
    pure function of the data (r7 review).  r9 hostile-numeric gate: the
    earlier BIGINT encoding ``cents·10⁸ + key`` ANSI-overflowed on a
    10¹² price — its documented envelope, which hostile data WILL exceed
    at 100 TB; the struct form has no envelope.  DuckDB's arg_min takes
    no struct ordering, so the oracle ranks with ROW_NUMBER instead.
    Rows with NULL price carry a NULL ordering (min_by/arg_min skip
    them); min/max price round through DECIMAL(27,3) so the corpus's
    8194.925 cent-edge rounds HALF_UP identically in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    tie = F.when(
        F.col("o_totalprice").isNotNull(),
        F.struct(F.col("o_totalprice"), F.col("o_orderkey")),
    )
    return orders.groupBy("o_orderstatus").agg(
        F.min_by("o_orderkey", tie).alias("cheapest_order"),
        F.max_by("o_orderkey", tie).alias("priciest_order"),
        F.round(F.min("o_totalprice").cast("decimal(27,3)"), 2)
        .cast("double").alias("min_price"),
        F.round(F.max("o_totalprice").cast("decimal(27,3)"), 2)
        .cast("double").alias("max_price"),
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
    "agg_misc",
    oracle="""
    WITH m AS (
      SELECT l_returnflag, l_quantity AS v,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY COUNT(*) DESC, l_quantity ASC) AS rn
      FROM lineitem WHERE l_quantity IS NOT NULL
      GROUP BY l_returnflag, l_quantity)
    SELECT l.l_returnflag,
           CAST(MIN(m.v) AS DOUBLE)                  AS qty_mode,
           ROUND(median(l.l_extendedprice), 4)       AS price_median,
           bool_and(l.l_quantity >= 1.0)             AS all_positive,
           bool_or(l.l_discount > 0.09)              AS any_big_discount,
           MIN(l.l_linestatus)                       AS a_status
    FROM lineitem l
    LEFT JOIN m ON l.l_returnflag IS NOT DISTINCT FROM m.l_returnflag
               AND m.rn = 1
    GROUP BY l.l_returnflag
    """,
)
def agg_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-family completion: mode / median (exact) / bool_and / bool_or, and
    a deterministic any_value stand-in (MIN — ``any_value`` itself is
    legitimately nondeterministic, so the certified form pins it).

    Mode tie contract (r9 hostile-numeric gate): ``mode`` with
    ``deterministic=True`` (Spark 4) returns the LOWEST of the
    equally-most-frequent values — an all-distinct hostile group made the
    engines' otherwise-arbitrary picks diverge; the oracle pins the same
    rule by ranking (count DESC, value ASC)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.mode("l_quantity", True).cast("double").alias("qty_mode"),
        F.round(F.median("l_extendedprice"), 4).alias("price_median"),
        F.bool_and(F.col("l_quantity") >= 1.0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_big_discount"),
        F.min("l_linestatus").alias("a_status"),
    )


@query(
    "crosstab_status_segment",
    oracle="""
    SELECT COALESCE(c_mktsegment, 'null') AS segment,
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
    fixture — round-1 ADVICE finding). NULL row-label contract (r9
    hostile-numeric gate): ``df.stat.crosstab`` stringifies a NULL group
    value as the literal ``'null'``; the oracle COALESCEs to the same
    sentinel (a real segment named 'null' would collide — acceptable for
    a profiling crosstab, documented here).

    Name-resolution contract (r10 hostile-format gate): crosstab column
    names come from DATA, and under Spark's default case-INSENSITIVE
    resolution a corpus holding both 'F' and 'f' status values makes
    ``F.col("F")`` throw AMBIGUOUS_REFERENCE. Columns are therefore
    renamed POSITIONALLY (``toDF``) to synthetic names first and matched
    against the wanted values by exact string comparison — never resolved
    by data-derived name."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    ct = j.stat.crosstab("c_mktsegment", "o_orderstatus")
    names = ct.columns  # exact, case-sensitive data-derived names
    safe = ct.toDF(*[f"__c{i}" for i in range(len(names))])
    idx = {n: i for i, n in enumerate(names)}
    cols = [
        (F.col(f"__c{idx[s]}") if s in idx else F.lit(0))
        .cast("bigint")
        .alias(s)
        for s in ("F", "O", "P")
    ]
    return safe.select(F.col("__c0").alias("segment"), *cols)


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


@query(
    "quantile_approx_value",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           1 AS median_in_bounds,
           1 AS p95_in_bounds
    FROM lineitem GROUP BY l_returnflag
    """,
)
def quantile_approx_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7's 100 TB path made runnable: ``percentile_approx`` (a mergeable
    quantile sketch) instead of the exact sort-based percentile — partials
    merge map-side like any agg, so quantiles of a 100 TB column cost one
    scan + a scalar-sized shuffle.

    DERIVED full oracle (r10, VERDICT r9 #2 — previously rows-only): the
    raw sketch values are engine-specific, but the sketch GUARANTEE is
    checkable — ``percentile_approx(accuracy=10_000)`` returns an actual
    data element whose RANK is within 1/accuracy of the target. The
    verdict therefore checks RANKS, not values (an interpolated-value
    bracket fails legitimately on small groups where exact p49/p51 fall
    between adjacent elements — found by the hostile-numeric replay):
    count elements strictly below / at-or-below the approx value in a
    second conditional-aggregate pass, and assert that rank interval
    intersects target ± 0.01 (a 100× margin on the sketch's 1e-4 bound).
    The oracle recomputes the real count column and pins the INT verdicts
    to 1 — a sketch regression turns a driver row red instead of staying
    invisible. (The exact twin `quantile_value` hash-checks quantile
    VALUES.)

    The exact-twin verdict pass is gated by ``registry.verify_enabled()``
    (default ON — the driver contract; ``SPARK_GRAFT_VERIFY=0`` serves the
    sketch-only path with NULL verdict columns; r11 #7)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    apx = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.count("l_extendedprice").alias("__nv"),
        F.percentile_approx("l_extendedprice", 0.5, 10_000).alias("__m_apx"),
        F.percentile_approx("l_extendedprice", 0.95, 10_000).alias("__p_apx"),
    )
    if not verify_enabled():
        # sketch-only serving path (r11 #7): one scan, no rank-verdict
        # second pass — verdicts NULL, schema unchanged
        return apx.select(
            "l_returnflag",
            "n_rows",
            F.lit(None).cast("int").alias("median_in_bounds"),
            F.lit(None).cast("int").alias("p95_in_bounds"),
        )
    # eqNullSafe: a NULL group key is a real group in both engines; a
    # bare equi-join would silently drop it from the verdict pass
    j = li.join(
        F.broadcast(apx),
        li["l_returnflag"].eqNullSafe(apx["l_returnflag"]),
    ).drop(apx["l_returnflag"])

    def rank_ok(apx_col: str, q: float, margin: float = 0.01):
        lo = F.sum((F.col("l_extendedprice") < F.col(apx_col)).cast("long"))
        hi = F.sum((F.col("l_extendedprice") <= F.col(apx_col)).cast("long"))
        nv = F.first("__nv")
        # rank interval [lo+1, hi] must intersect [(q-margin)·nv,
        # (q+margin)·nv], widened by the ±1-rank discretization slack —
        # the sketch returns an ELEMENT, and at small n the fractional
        # target rank q·n falls strictly between two of them
        ok = ((lo + 1) <= (q + margin) * nv + 1) & (hi >= (q - margin) * nv)
        # vacuously true for an all-NULL group (sketch returns NULL)
        return F.when(nv == 0, F.lit(True)).otherwise(ok).cast("int")

    return j.groupBy("l_returnflag").agg(
        F.first("n_rows").alias("n_rows"),
        rank_ok("__m_apx", 0.5).alias("median_in_bounds"),
        rank_ok("__p_apx", 0.95).alias("p95_in_bounds"),
    )


@query(
    "hll_sketch_merge",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id)      AS n_exact,
           COUNT(DISTINCT CAST(ts AS DATE))
             + CASE WHEN COUNT(CASE WHEN ts IS NULL THEN 1 END) > 0
                    THEN 1 ELSE 0 END AS n_sketches_merged,
           1 AS within_tol
    FROM events GROUP BY event_type
    """,
)
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
    raw events.

    DERIVED full oracle (r10, VERDICT r9 #2 — previously rows-only): the
    raw estimate is engine-specific, but the sketch GUARANTEE is not —
    lgConfigK=12 bounds the relative error at ~1.6% (3σ ≈ 5%), so the
    merged estimate must land within 5% of the exact distinct count. The
    query emits the exact count (computed Spark-side), the merged-sketch
    count, and the within-tolerance verdict as an INT; the oracle
    recomputes both real columns and asserts the verdict is 1. A merge
    bug (double-merged or dropped sketches) shifts the estimate and
    turns the driver row red.

    NULL-ts contract (r11, r10 advisor): the engine's per-day sketch job
    keeps ``to_date(ts) = NULL`` as a REAL group — one persisted sketch —
    while the oracle's ``COUNT(DISTINCT CAST(ts AS DATE))`` skips NULL,
    so the oracle adds ``CASE WHEN COUNT(CASE WHEN ts IS NULL ...)>0 THEN
    1`` to count that sketch. Pinned by the hostile-events replay (its
    corpus carries a NULL event time).

    The exact-twin verdict pass is gated by ``registry.verify_enabled()``
    (default ON — the driver contract; ``SPARK_GRAFT_VERIFY=0`` serves the
    sketch-only path with NULL verdict columns; r11 #7)."""

    ev = load_table(spark, sf_dir, "events")
    out = scratch_dir("hll_") + "/sketches"
    per_day = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sketch"))
    per_day.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    merged = back.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("__est"),
        F.count("*").alias("n_sketches_merged"),
    )
    if not verify_enabled():
        # sketch-only serving path (r11 #7): union the stored sketches,
        # never rescan raw events for an exact twin — exactly the 100 TB
        # rollup shape this key exists to demonstrate
        return merged.select(
            "event_type",
            F.lit(None).cast("long").alias("n_exact"),
            "n_sketches_merged",
            F.lit(None).cast("int").alias("within_tol"),
        )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "n_exact",
        "n_sketches_merged",
        (
            F.abs(F.col("__est") - F.col("n_exact"))
            <= F.greatest(F.lit(2), 0.05 * F.col("n_exact"))
        )
        .cast("int")
        .alias("within_tol"),
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


@query(
    "median_mode_agg",
    oracle="""
    WITH m AS (
      SELECT l_returnflag, l_linestatus AS v,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY COUNT(*) DESC, l_linestatus ASC) AS rn
      FROM lineitem WHERE l_linestatus IS NOT NULL
      GROUP BY l_returnflag, l_linestatus)
    SELECT l.l_returnflag,
           ROUND(median(l.l_quantity), 6)                    AS median_qty,
           MIN(m.v)                                          AS mode_status,
           ROUND(quantile_cont(l.l_extendedprice, 0.5), 6)   AS p50_price,
           ROUND(quantile_disc(l.l_extendedprice, 0.5), 6)   AS p50_price_disc
    FROM lineitem l
    LEFT JOIN m ON l.l_returnflag IS NOT DISTINCT FROM m.l_returnflag
               AND m.rn = 1
    GROUP BY l.l_returnflag
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
    training-data QC report wants precise. Mode ties (r9 hostile-numeric
    gate): ``deterministic=True`` pins lowest-value tie-break; the oracle
    ranks (count DESC, value ASC) to match — see agg_misc."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 6).alias("median_qty"),
        F.mode("l_linestatus", True).alias("mode_status"),
        F.round(
            F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"), 6
        ).alias("p50_price"),
        F.round(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"), 6
        ).alias("p50_price_disc"),
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
