"""Window / analytic functions (SURVEY.md §2-E).

The reference's Dask surface only had rolling/cumulative kernels; Spark's
``Window`` is a strict superset (ranking, frames, range frames). Every frame
is pinned with a deterministic ORDER BY (ties broken on the row key) so the
oracle hash is stable.

Scale notes: window functions shuffle once on partitionBy and sort within
partitions — the same cost model at 100 TB. The dangerous pattern is a
partitionBy with few huge keys (here: per-customer / per-user keys, which are
plentiful and small). No global ORDER BY without a partition key is used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query


@query(
    "window_rank_orders",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rk
        FROM orders
    ) WHERE rk <= 3
    """,
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5/E6 ranking + per-group top-n (rank is tie-stable, so no tiebreak
    column is needed for determinism)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return (
        orders.select("o_custkey", "o_orderkey", "o_totalprice", F.rank().over(w).alias("rk"))
        .where(F.col("rk") <= 3)
    )


@query(
    "window_rank_kinds",
    oracle="""
    SELECT p_brand, p_partkey,
           ROW_NUMBER()   OVER w AS rn,
           DENSE_RANK()   OVER w AS drk,
           ROUND(PERCENT_RANK() OVER w, 6) AS prk,
           NTILE(4)       OVER w AS quartile
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC)
    """,
)
def window_rank_kinds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 the full ranking family over one deterministic frame."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return part.select(
        "p_brand",
        "p_partkey",
        F.row_number().over(w).alias("rn"),
        F.dense_rank().over(w).alias("drk"),
        F.round(F.percent_rank().over(w), 6).alias("prk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "cumsum_orders",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(CAST(SUM(o_totalprice) OVER w AS DECIMAL(27,3)), 2)
                AS DOUBLE) AS cum_spend,
           CAST(ROUND(CAST(MAX(o_totalprice) OVER w AS DECIMAL(27,3)), 2)
                AS DOUBLE) AS max_so_far
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def cumsum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 cumulative sum/max (Dask's cumsum/cummax partition chain ≙ one
    running frame per key).

    NULL-date contract (pinned by the r9 hostile-numeric window gate):
    undated orders accumulate FIRST — ``ASC NULLS FIRST`` explicitly on
    both sides, because the engines' defaults disagree (Spark ASC →
    NULLS FIRST, DuckDB → NULLS LAST) and a NULL-able ordering column is
    a certainty at 100 TB. Same pin ``lag_lead_events`` carries. The
    oracle rounds through DECIMAL(27,3) — the running sum lands on cent
    half-edges (…602.675) where DuckDB's ROUND(double) and Spark's
    shortest-repr HALF_UP disagree; the decimal collapse pins both to
    HALF_UP (the house rule from the aggregate family)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc_nulls_first("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("cum_spend"),
        F.round(F.max("o_totalprice").over(w), 2).alias("max_so_far"),
    )


@query(
    "lag_lead_events",
    oracle="""
    SELECT event_id,
           value,
           LAG(value)  OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           ROUND(value - COALESCE(LAG(value) OVER w, 0), 2) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY ts ASC NULLS FIRST, event_id ASC)
    """,
)
def lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 shift/diff ≙ lag/lead (Dask's map_overlap across partition edges
    becomes a plain sorted window)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc_nulls_first("ts"), F.asc("event_id"))
    return ev.select(
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.round(F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0)), 2).alias("delta"),
    )


@query(
    "rolling_avg_value",
    oracle="""
    SELECT event_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id
                                  ORDER BY ts ASC NULLS FIRST, event_id ASC
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS avg4
    FROM events
    """,
)
def rolling_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 rolling row-count window (rolling(4).mean())."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc_nulls_first("ts"), F.asc("event_id"))
        .rowsBetween(-3, Window.currentRow)
    )
    return ev.select("event_id", F.round(F.avg("value").over(w), 6).alias("avg4"))


@query(
    "rolling_1h_events",
    oracle="""
    WITH c AS (SELECT event_id, user_id, ts,
                      CAST(ROUND(value * 100) AS BIGINT) AS cents
               FROM events)
    SELECT event_id,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(cents) OVER w AS DOUBLE) / 100.0 AS sum_1h
    FROM c
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
    """,
)
def rolling_1h_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 rolling *time* window (rolling("1h", on=ts)).

    Spark's rangeBetween needs a numeric ordering column: order by µs since
    epoch (``unix_micros(ts)`` — same precision the oracle sees) with a
    ±3.6e9 µs frame; range frames include ts-peers on both engines, so ties
    need no tiebreak.

    Parity: the frame sum runs over exact integer CENTS divided once at
    the end — the same discipline ``window_price_band`` documents. A
    float SUM over a sliding RANGE frame accumulates in engine-specific
    order (Spark sequential per frame, DuckDB segment-tree combine), and
    ROUND(,2) flips at .xx5 boundaries under that low-bit drift (measured
    ~3 flips per 500 rows on the price-band fixture; r7 review applied
    the existing fix here too)."""
    ev = load_table(spark, sf_dir, "events")
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    w = (
        Window.partitionBy("user_id")
        .orderBy(us.asc())
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    return ev.withColumn("cents", cents).select(
        "event_id",
        F.count("*").over(w).alias("n_1h"),
        (F.sum("cents").over(w).cast("double") / 100.0).alias("sum_1h"),
    )


@query(
    "topn_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice
    FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               ROW_NUMBER() OVER (PARTITION BY p_brand
                                  ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
        FROM part
    ) WHERE rn <= 5
    """,
)
def topn_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 per-group top-n via row_number (Dask's groupby().nlargest()).

    At scale this beats sort+filter because the window sort is per-key and
    AQE-skew-splittable; for extreme k≪group-size a partial top-k
    pre-aggregation per partition would cut the shuffle further.
    """
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.select("p_brand", "p_partkey", "p_retailprice", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )


@query(
    "window_value_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus,
           ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS first_price,
           ROUND(LAST_VALUE(o_totalprice)  OVER w, 2) AS last_price,
           ROUND(NTH_VALUE(o_totalprice, 2) OVER w, 2) AS second_price,
           ROUND(CUME_DIST() OVER (PARTITION BY o_orderstatus
                                   ORDER BY o_totalprice NULLS FIRST,
                                            o_orderkey), 6) AS cd,
           NTILE(4) OVER (PARTITION BY o_orderstatus
                          ORDER BY o_totalprice NULLS FIRST,
                                   o_orderkey) AS quartile
    FROM orders
    WHERE o_orderkey % 101 = 0
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice NULLS FIRST, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_value_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 value/window functions beyond ranking: first_value / last_value /
    nth_value over an unbounded frame, plus cume_dist and ntile. Ties are
    pinned with a secondary orderkey sort — value window functions are
    nondeterministic under ties otherwise (on every engine).

    NULL-price contract (pinned by the r9 hostile-numeric window gate):
    ``ASC NULLS FIRST`` explicitly on both sides — the engines' defaults
    disagree (Spark FIRST, DuckDB LAST), which moves first_value /
    nth_value / cume_dist / ntile for every row in an affected
    partition, not just the NULL ones."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 101 == 0)
    w_full = (
        Window.partitionBy("o_orderstatus")
        .orderBy(F.asc_nulls_first("o_totalprice"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_ord = Window.partitionBy("o_orderstatus").orderBy(
        F.asc_nulls_first("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.first("o_totalprice").over(w_full), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w_full), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w_full), 2).alias("second_price"),
        F.round(F.cume_dist().over(w_ord), 6).alias("cd"),
        F.ntile(4).over(w_ord).alias("quartile"),
    )


@query(
    "window_price_band",
    oracle="""
    WITH c AS (SELECT o_orderkey, o_orderstatus, o_totalprice,
                      CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
               FROM orders WHERE o_orderkey % 19 = 0)
    SELECT o_orderkey,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_in_band,
           CAST(SUM(cents) OVER w AS DOUBLE) / 100.0
                 / (COUNT(*) OVER w) AS band_avg
    FROM c
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
                 RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING)
    """,
)
def window_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family numeric RANGE frame: per order, stats over all orders of
    the same status within ±1000 of its price — a VALUE-based frame
    (rangeBetween), not a row-count one; rows with equal prices share one
    frame. The per-partition sort is the cost; the frame scan is an
    incremental two-pointer inside each partition, not O(n²).

    Parity: the band mean is an exact integer-cents SUM divided once, and
    the quotient ships RAW — a float AVG over a sliding frame accumulates
    incrementally and drifts (3 boundary flips per ~500 rows measured),
    and even on the exact sum a final ROUND(,2) diverges where the
    quotient is exactly .xx5 (Spark rounds the shortest-decimal rendering,
    DuckDB the binary value). Identical exact inputs + identical division
    order ⇒ bit-identical doubles with no rounding at all."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 19 == 0)
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, 1000)
    )
    return orders.withColumn("cents", cents).select(
        "o_orderkey",
        F.count("*").over(w).alias("n_in_band"),
        (
            F.sum("cents").over(w).cast("double") / 100.0
            / F.count("*").over(w)
        ).alias("band_avg"),
    )
