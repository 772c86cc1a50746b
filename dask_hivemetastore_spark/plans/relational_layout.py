"""Physical layout and sampling (SURVEY.md §2-F; split out of
``relational.py`` in r9). Sorted/z-ordered layout round-trips,
small-file compaction (global and partition-scoped), deterministic
sampling, and monotonic row ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query, scratch_dir, verify_enabled


@query(
    "sample_fraction",
    oracle="""
    SELECT COUNT(*) AS n_population, 1 AS subset_ok, 1 AS count_in_ci
    FROM lineitem
    """,
)
def sample_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-sample: seeded Bernoulli sample (Dask ``.sample``). Deterministic
    for a fixed seed+partitioning within Spark, but the RNG stream is
    engine-specific, so the sampled ROW SET has no SQL twin.

    DERIVED full oracle (r10, VERDICT r9 #2 — previously rows-only): the
    checkable contract is statistical, not row-wise — every sampled row
    must EXIST in the population (anti-join = 0: no invented rows) and
    the sample size must sit inside a 6σ binomial window around n·p
    (a seeded sampler grossly off its fraction is broken). Both emit as
    INT verdicts beside the real population count the oracle recomputes.

    The exact-twin verdict pass is gated by ``registry.verify_enabled()``
    (default ON — the driver contract; ``SPARK_GRAFT_VERIFY=0`` serves the
    sketch-only path with NULL verdict columns; r11 #7)."""
    li = load_table(spark, sf_dir, "lineitem")
    keys = li.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    sampled = li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    if not verify_enabled():
        # serving path (r11 #7): just the map-side Bernoulli filter —
        # no population rescan, no anti-join; verdicts NULL
        return sampled.agg(F.count("*").alias("__n_smp")).select(
            F.lit(None).cast("long").alias("n_population"),
            F.lit(None).cast("int").alias("subset_ok"),
            F.lit(None).cast("int").alias("count_in_ci"),
        )
    n_pop = F.first("__n_pop")
    n_smp = F.first("__n_smp")
    sigma = F.sqrt(n_pop * 0.1 * 0.9)
    stats = (
        keys.agg(F.count("*").alias("__n_pop"))
        .crossJoin(sampled.agg(F.count("*").alias("__n_smp")))
        .crossJoin(
            sampled.join(
                keys, ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
                "left_anti",
            ).agg(F.count("*").alias("__n_orphan"))
        )
    )
    return stats.agg(
        F.first("__n_pop").alias("n_population"),
        (F.first("__n_orphan") == 0).cast("int").alias("subset_ok"),
        (F.abs(n_smp - n_pop * 0.1) <= 6 * sigma + 1)
        .cast("int")
        .alias("count_in_ci"),
    )


@query(
    "sample_stratified",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_stratum, 1 AS count_in_ci
    FROM lineitem WHERE l_returnflag IN ('A', 'N', 'R')
    GROUP BY 1
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-sample stratified: ``sampleBy`` with per-stratum fractions (the
    groupby-sample idiom) — seeded and deterministic within Spark for a
    fixed partitioning; the RNG stream is engine-specific so the row set
    has no SQL twin. Scale: sampling is a map-side filter, no shuffle.

    DERIVED full oracle (r10): per stratum, the real population count
    (oracle-recomputable) plus an INT verdict that the per-stratum
    sample size sits inside a 6σ binomial window around its declared
    fraction — a sampler ignoring its strata turns the row red.

    The exact-twin verdict pass is gated by ``registry.verify_enabled()``
    (default ON — the driver contract; ``SPARK_GRAFT_VERIFY=0`` serves the
    sketch-only path with NULL verdict columns; r11 #7)."""
    fracs = {"A": 0.05, "N": 0.01, "R": 0.05}
    li = load_table(spark, sf_dir, "lineitem")
    pop = (
        li.where(F.col("l_returnflag").isin(*fracs))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_stratum"))
    )
    smp = (
        li.sampleBy("l_returnflag", fracs, seed=7)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("__n_smp"))
    )
    if not verify_enabled():
        # serving path (r11 #7): sampleBy filter + per-stratum count
        # only — no population pass; verdicts NULL
        return smp.select(
            "l_returnflag",
            F.lit(None).cast("long").alias("n_stratum"),
            F.lit(None).cast("int").alias("count_in_ci"),
        )
    frac = F.element_at(
        F.create_map(*[F.lit(x) for kv in fracs.items() for x in kv]),
        F.col("l_returnflag"),
    )
    sigma = F.sqrt(F.col("n_stratum") * frac * (1 - frac))
    return (
        pop.join(smp, "l_returnflag", "left")
        .select(
            "l_returnflag",
            "n_stratum",
            (
                F.abs(
                    F.coalesce("__n_smp", F.lit(0))
                    - F.col("n_stratum") * frac
                )
                <= 6 * sigma + 1
            )
            .cast("int")
            .alias("count_in_ci"),
        )
    )


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
    SELECT NULLIF(o_orderstatus, '') AS o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
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
    its bin-packed file count).

    Hive-layout fold (r10 hostile-format gate): a partitioned WRITE
    stores both NULL and '' partition values as
    ``__HIVE_DEFAULT_PARTITION__``, so they read back merged as NULL —
    inherent to the hive-style directory encoding (the dir name cannot
    carry an empty component). The oracle models it with
    ``NULLIF(o_orderstatus, '')``; a no-op on real data, where partition
    columns never hold ''."""
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
