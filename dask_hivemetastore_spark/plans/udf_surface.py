"""UDF / UDAF / UDTF surface (SURVEY.md §2-J) — the Dask escape hatches
re-expressed as Arrow-batched Pandas UDFs.

Mapping from the reference's Dask forms:

- ``map_partitions``            → ``mapInPandas``           (J1)
- ``Series.map`` / elementwise  → scalar ``pandas_udf``     (J2)
- ``groupby().apply``           → ``applyInPandas``         (J3)
- ``dask.dataframe.Aggregation``→ GROUPED_AGG ``pandas_udf``(J4/D11)
- row-multiplying functions     → ``explode`` (builtin UDTF path) (J5)
- aligned two-frame apply       → ``cogroup().applyInPandas``(J6)

Each query here deliberately computes something that ALSO has a pure-SQL
form, so the oracle hash-checks the Python path end-to-end (Arrow
serialization included).

Scale notes: all of these ship data through Arrow once per batch — the
10-100× faster path vs row-at-a-time Python UDFs. They are still the slow
path vs JVM builtins (UDFs are opaque to Catalyst: no pushdown through them,
no codegen inside) — every docstring notes the builtin equivalent used when
semantics allow.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import load_table
from ..functions import sql_round
from .registry import query


@query(
    "pandas_udf_scalar",
    oracle="""
    SELECT event_id,
           SQRT(value) * 2 + value / 100 AS score
    FROM events WHERE event_type = 'view'
    """,
)
def pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 elementwise scalar pandas_udf (vectorized over Arrow batches).

    The same expression exists as JVM builtins (F.sqrt/F.log) — that is the
    production path; this entry certifies the Python vectorized path.
    """

    # Expression restricted to correctly-rounded IEEE ops (sqrt, *, /, +) so
    # the Python path is bit-identical to the oracle with no rounding needed;
    # libm functions (log, exp) differ by ulps across engines.
    @pandas_udf("double")
    def score(v: pd.Series) -> pd.Series:
        import numpy as np

        return np.sqrt(v) * 2 + v / 100

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_type") == "view")
        .select("event_id", score("value").alias("score"))
    )


@query(
    "custom_agg_geomean",
    oracle="""
    SELECT o_orderstatus,
           ROUND(EXP(AVG(CASE WHEN o_totalprice > 0
                         THEN LN(o_totalprice) END)), 4) AS geomean_price,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def custom_agg_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/D11 custom aggregation (the reference's ``dd.Aggregation``
    chunk/agg/finalize triple) as a GROUPED_AGG pandas_udf: geometric mean.

    Domain contract (pinned by the r9 hostile-numeric gate): the geometric
    mean is defined over STRICTLY POSITIVE values only — NULL, zero and
    negative prices are excluded from the log-average (NULL if a group has
    no positive value), while ``n`` still counts every row. Without the
    guard the engines silently diverge: numpy's ``log`` yields ``-inf``/NaN
    (pandas ``mean`` then skips the NaN rows), DuckDB's ``LN`` raises.

    Note for 100 TB: a GROUPED_AGG udf materializes each group in memory; the
    decomposable form (avg of logs, as the oracle does) is the scalable
    rewrite — partial aggregation stays JVM-side. Certified here: Python path.
    """

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float | None:
        import numpy as np

        pos = v[v > 0]  # drops NaN (NULL) too: NaN > 0 is False
        if len(pos) == 0:
            return None
        return float(np.exp(np.log(pos).mean()))

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        # Spark disallows mixing GROUPED_AGG pandas UDFs with JVM aggregates
        # in one agg() — so the count is a pandas aggregate too
        return len(v)

    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(geomean("o_totalprice"), 4).alias("geomean_price"),
        n_rows("o_totalprice").alias("n"),
    )


@query(
    "grouped_map_zscore",
    oracle="""
    SELECT c_custkey,
           CASE WHEN MIN(c_acctbal) OVER (PARTITION BY c_mktsegment)
                     = MAX(c_acctbal) OVER (PARTITION BY c_mktsegment)
                THEN NULL
                ELSE ROUND(
                  (c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_mktsegment))
                  / STDDEV_SAMP(c_acctbal) OVER (PARTITION BY c_mktsegment), 6)
           END AS z
    FROM customer
    """,
)
def grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 grouped map (``groupby().apply``) via applyInPandas: per-segment
    z-score. Each group becomes one pandas DataFrame on an executor — fine
    when groups fit in memory (segments here); for giant groups use the
    window-function form the oracle uses.

    Degenerate-group contract (pinned by the r9 hostile-numeric gate): a
    group whose non-null values are all EQUAL has zero variance, so the
    z-score is undefined → NULL for every row.  Without the explicit
    ``min == max`` guard the engines diverge on pure float noise: pandas'
    two-pass std of three copies of 55.55 is a tiny NONZERO residue
    (yielding z = ±0.816…), DuckDB's STDDEV_SAMP is exactly 0 (yielding
    NULL).  Single-row groups already agree (ddof=1 → NaN/NULL both)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf["c_acctbal"]
        if s.min() == s.max():  # all-equal (NaN-skipping min/max) → undefined
            z = pd.Series([None] * len(s), dtype="float64")
        else:
            z = (s - s.mean()) / s.std(ddof=1)  # rounding is JVM-side, see pandas_udf_scalar
        return pd.DataFrame({"c_custkey": pdf["c_custkey"], "z": z})

    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .applyInPandas(zscore, "c_custkey bigint, z double")
        .select("c_custkey", F.round("z", 6).alias("z"))
    )


@query(
    "map_partitions_net_price",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS net_price
    FROM lineitem WHERE l_quantity >= 48
    """,
)
def map_partitions_net_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 partition-wise function (``map_partitions``) via mapInPandas.

    The iterator-of-batches signature is the exact analog of Dask's
    per-partition pandas kernel; the filter stays BEFORE the UDF so the scan
    still prunes (Catalyst cannot push predicates through Python)."""

    def add_net(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["l_orderkey", "l_linenumber"]].copy()
            # elementwise products are left-assoc IEEE ops → bit-identical to
            # the oracle; raw doubles are SAFER than rounding (rounding
            # creates half-way boundary divergence). ROUND discipline only
            # applies to accumulation-order-dependent aggregates.
            out["net_price"] = pdf["l_extendedprice"] * (1 - pdf["l_discount"]) * (1 + pdf["l_tax"])
            yield out

    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 48)
    return li.mapInPandas(add_net, "l_orderkey bigint, l_linenumber int, net_price double")


@query(
    "explode_words_top",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
    ORDER BY n DESC, word ASC
    LIMIT 20
    """,
)
def explode_words_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 table function: one row in → many rows out. The idiomatic Spark
    path is builtin ``explode`` (JVM-side, codegen) rather than a Python
    UDTF; Python ``@udtf`` exists for logic explode can't express."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


@query(
    "cogrouped_map_ratio",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust,
                      CAST(ROUND(CAST(SUM(c_acctbal) AS DECIMAL(27,3)), 2)
                           AS DOUBLE) AS cust_bal
               FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(n_cust, 0)  AS n_cust,
           COALESCE(n_supp, 0)  AS n_supp,
           COALESCE(cust_bal, 0.0) AS cust_bal
    FROM c FULL OUTER JOIN s ON c.nk IS NOT DISTINCT FROM s.nk
    """,
)
def cogrouped_map_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 cogrouped map: align two frames by key, combine each pair of
    groups in pandas (the reference's align + map pattern).

    NULL-key contract (pinned by the r9 hostile-numeric gate): cogroup is
    GROUP-BY alignment, so the NULL-key customer group and the NULL-key
    supplier group meet in ONE combined row — the oracle's join must be
    ``IS NOT DISTINCT FROM`` (a plain ``=`` FULL JOIN emits two half
    rows).  The NULL key also reaches pandas as NaN, so the int() cast
    needs the isna guard."""

    def combine(cust: pd.DataFrame, supp: pd.DataFrame) -> pd.DataFrame:
        nk = cust["c_nationkey"].iloc[0] if len(cust) else supp["s_nationkey"].iloc[0]
        return pd.DataFrame(
            {
                "nationkey": [None if pd.isna(nk) else int(nk)],
                "n_cust": [len(cust)],
                "n_supp": [len(supp)],
                # sql_round, not round(): must match the oracle's SQL
                # ROUND at shortest-repr .xx5 boundaries (r8)
                "cust_bal": [sql_round(float(cust["c_acctbal"].sum()))
                             if len(cust) else 0.0],
            }
        )

    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        cust.groupBy("c_nationkey")
        .cogroup(supp.groupBy("s_nationkey"))
        .applyInPandas(combine, "nationkey int, n_cust bigint, n_supp bigint, cust_bal double")
    )


@query(
    "udtf_bigrams",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
               FROM documents WHERE doc_id % 97 = 0)
    SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
           words[i] || ' ' || words[i+1]  AS bigram
    FROM w, UNNEST(generate_series(1, len(words) - 1)) AS t(i)
    """,
)
def udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 table function: a Python UDTF (Spark 4 ``@udtf``) emitting one row
    per consecutive word pair, applied per document via LATERAL join.

    This is the row-multiplying escape hatch the reference ecosystem reaches
    ``map_partitions`` for; where semantics allow, the builtin generator path
    (``explode``/``posexplode``, see ``explode_words_top``) stays JVM-side
    and is preferred — a UDTF runs one Python process round-trip per batch.
    Scale: UDTF evaluation is per-row streaming over Arrow; no state, no
    shuffle — it pipelines into whatever follows.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: bigint, bigram: string")
    class BigramUDTF:
        def eval(self, text: str):
            if text is None:
                return  # NULL text -> no rows, matching unnest(NULL)
            words = text.split(" ")
            for i in range(len(words) - 1):
                yield i, words[i] + " " + words[i + 1]

    spark.udtf.register("bigrams", BigramUDTF)
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 97 == 0)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.bigram FROM _udtf_docs d, LATERAL bigrams(d.text) t"
    )


@query(
    "map_arrow_net_price",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS net_price
    FROM lineitem WHERE l_quantity <= 3
    """,
)
def map_arrow_net_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 Arrow-native variant: ``mapInArrow`` hands raw
    ``pyarrow.RecordBatch`` objects — no pandas materialization at all, the
    fastest Python escape hatch (zero-copy columnar in both directions).
    Same computation as ``map_partitions_net_price`` on a disjoint slice."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def add_net(batches):
        for batch in batches:
            net = pc.multiply(
                pc.multiply(
                    batch.column("l_extendedprice"),
                    pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
                ),
                pc.add(pa.scalar(1.0), batch.column("l_tax")),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("l_orderkey"), batch.column("l_linenumber"), net],
                names=["l_orderkey", "l_linenumber", "net_price"],
            )

    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") <= 3)
    return li.mapInArrow(
        add_net, "l_orderkey bigint, l_linenumber int, net_price double"
    )


@query(
    "grouped_arrow_minmax",
    oracle="""
    SELECT c_mktsegment AS segment,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal,
           COUNT(*)       AS n
    FROM customer GROUP BY 1
    """,
)
def grouped_arrow_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 variant on the Spark 4 Arrow-native grouped map
    (``applyInArrow``): the group arrives as a ``pyarrow.Table`` — no
    pandas conversion, no NumPy copy, the fastest Python grouped path
    when the logic can stay in Arrow compute kernels. Same executor-memory
    caveat as applyInPandas: one group must fit; pre-aggregate or window
    when it cannot."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def minmax(tbl: pa.Table) -> pa.Table:
        bal = tbl["c_acctbal"]
        # Every column carries an EXPLICIT arrow type: the NULL-segment
        # group otherwise infers `null`-typed columns from [None] and
        # Spark rejects the batch (RESULT_COLUMN_TYPES_MISMATCH) — an
        # all-NULL group is a certainty at 100 TB (r9 hostile gate).
        return pa.table(
            {
                "segment": pa.array([tbl["c_mktsegment"][0].as_py()], pa.string()),
                "min_bal": pa.array([pc.min(bal).as_py()], pa.float64()),
                "max_bal": pa.array([pc.max(bal).as_py()], pa.float64()),
                "n": pa.array([tbl.num_rows], pa.int64()),
            }
        )

    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").applyInArrow(
        minmax, "segment string, min_bal double, max_bal double, n bigint"
    )


@query(
    "udtf_polymorphic_firstwords",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
               FROM documents WHERE doc_id % 97 = 0)
    SELECT doc_id,
           words[1] AS word_1,
           words[2] AS word_2,
           words[3] AS word_3
    FROM w
    """,
)
def udtf_polymorphic_firstwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 polymorphic table function: the UDTF's ``analyze()`` hook (Spark
    4) computes the OUTPUT SCHEMA from the call's literal arguments at plan
    time — here ``first_words(text, 3)`` declares columns word_1..word_3.
    This is how a table function family (parse_csv(n), top_k(k),
    struct-flatteners) exposes one name instead of one registration per
    arity, while Catalyst still sees a fully resolved static schema —
    column pruning and downstream resolution work exactly as for a fixed
    UDTF."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class FirstWordsUDTF:
        @staticmethod
        def analyze(text: AnalyzeArgument, k: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for i in range(k.value):
                schema = schema.add(f"word_{i + 1}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, k: int):
            # NULL text -> all-NULL word columns, matching words[i] on NULL
            words = text.split(" ") if text is not None else []
            yield tuple(words[i] if i < len(words) else None for i in range(k))

    spark.udtf.register("first_words", udtf(FirstWordsUDTF))
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 97 == 0)
    docs.createOrReplaceTempView("_udtf_poly_docs")
    return spark.sql(
        "SELECT d.doc_id, t.* FROM _udtf_poly_docs d, "
        "LATERAL first_words(d.text, 3) t"
    )
