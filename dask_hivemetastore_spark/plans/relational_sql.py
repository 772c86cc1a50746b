"""Filters, set ops, scalar functions and the SQL surface
(SURVEY.md §2-B/G/H; split out of ``relational.py`` in r9).
Case/when, null handling, IN-lists, union/except/intersect, string and
regexp functions, pivot/unpivot, XML, lateral joins, WITH RECURSIVE,
pandas-API-on-Spark, ANSI try_*, parameterized SQL, and pagination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query, scratch_dir


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
    "pivot_status_by_segment",
    oracle="""
    SELECT c_mktsegment,
           CAST(ROUND(CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END)
                           AS DECIMAL(27,3)), 2) AS DOUBLE) AS F,
           CAST(ROUND(CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END)
                           AS DECIMAL(27,3)), 2) AS DOUBLE) AS O,
           CAST(ROUND(CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END)
                           AS DECIMAL(27,3)), 2) AS DOUBLE) AS P
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dask/pandas ``pivot_table``: long→wide reshaping via
    ``groupBy().pivot(col, values)``. Pinning the pivot values up front
    matters at scale: without the explicit list Spark runs an extra
    distinct-collect job over the pivot column to discover them. Sums
    round through DECIMAL(27,3) — cent half-edge pin, see
    salted_join_revenue (r9 hostile-numeric gate)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.round(
                F.sum(F.coalesce("o_totalprice", F.lit(0.0)))
                .cast("decimal(27,3)"), 2
            ).cast("double")
        )
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
    "xml_parse_orders",
    oracle="""
    WITH src AS (
        SELECT CASE WHEN o_orderpriority IS NULL THEN NULL
                    WHEN regexp_matches(o_orderpriority,
                         '[\\x{00}-\\x{08}\\x{0B}\\x{0C}\\x{0E}-\\x{1F}]')
                         THEN NULL
                    ELSE o_orderpriority END AS priority,
               CASE WHEN o_orderpriority IS NOT NULL
                         AND regexp_matches(o_orderpriority,
                             '[\\x{00}-\\x{08}\\x{0B}\\x{0C}\\x{0E}-\\x{1F}]')
                         THEN NULL
                    ELSE o_totalprice END AS t
        FROM orders)
    SELECT priority, COUNT(*) AS n, ROUND(SUM(t), 2) AS total
    FROM src GROUP BY 1
    """,
)
def xml_parse_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-xml: ``from_xml`` (built into Spark 4 — no spark-xml package)
    round-trip: serialize two order fields into an XML fragment, parse
    them back with a declared schema, aggregate on the parsed struct.
    Mirrors ``csv_roundtrip_agg``'s pattern for feeds that arrive as XML
    documents: the parse is JVM-side (StaxXmlParser), stays inside
    whole-stage codegen's pipeline, and never touches Python.

    Format contract (r10 hostile-format gate — the naive ``concat`` was
    silently corrupting every one of these):
    - ``&``/``<``/``>`` are escaped to entities on serialize (raw, they
      either break the parse or swallow siblings);
    - CR is serialized as ``&#13;`` — a compliant XML parser NORMALIZES
      literal ``\\r`` to ``\\n`` (XML 1.0 §2.11), so only the character
      reference survives a round-trip;
    - surrounding whitespace is preserved via
      ``ignoreSurroundingSpaces=false`` (the parser default trims it);
    - a NULL field — string OR numeric — is serialized as an ABSENT
      element (concat would NULL-poison the whole fragment, folding every
      OTHER field of the row to NULL too) and parses back to NULL;
    - C0 control characters (except tab/LF/CR) are ILLEGAL in XML 1.0 in
      any form, entity included: the row's parse fails and both parsed
      fields come back NULL. The oracle models exactly that class — the
      one documented lossy residue of the format."""
    orders = load_table(spark, sf_dir, "orders")
    esc = F.col("o_orderpriority")
    for pat, rep in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ("\r", "&#13;")):
        esc = F.replace(esc, F.lit(pat), F.lit(rep))
    xml = F.concat(
        F.lit("<o>"),
        F.when(
            F.col("o_orderpriority").isNotNull(),
            F.concat(F.lit("<p>"), esc, F.lit("</p>")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("o_totalprice").isNotNull(),
            F.concat(
                F.lit("<t>"), F.col("o_totalprice").cast("string"), F.lit("</t>")
            ),
        ).otherwise(F.lit("")),
        F.lit("</o>"),
    )
    parsed = orders.select(
        F.from_xml(
            xml, "p STRING, t DOUBLE", {"ignoreSurroundingSpaces": "false"}
        ).alias("x")
    )
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
    FROM orders WHERE o_orderstatus IS NOT NULL GROUP BY 1
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
    freely in one pipeline.

    NULL-key contract (r10 hostile-format gate): pandas ``groupby``
    defaults to ``dropna=True`` — a NULL group key is DROPPED, unlike
    SQL GROUP BY which keeps it as a group. That pandas/Dask semantic is
    the point of this dialect key, so the oracle models it with
    ``WHERE o_orderstatus IS NOT NULL`` (pass ``dropna=False`` to the
    pandas groupby when SQL semantics are wanted)."""
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
