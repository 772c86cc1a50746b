"""Physical-layout maintenance: Z-order clustering and small-file compaction.

Single-dim sort-clustering (``sorted_layout_roundtrip``) makes parquet
min/max stats prune perfectly on the sort key and not at all on any other
column. Z-ordering interleaves the bits of several quantized keys into one
cluster key, so each file's bounding box is small in EVERY interleaved
dimension — a predicate on any one of them (or any combination) skips most
files. This is the standard multi-dim layout for 100 TB lakehouse tables
(Delta/Iceberg ``OPTIMIZE ZORDER BY``), reproduced here with nothing but
built-in expressions: quantize → interleave bits → ``repartitionByRange``
on the z-value → ``sortWithinPartitions`` → write.

Everything stays in whole-stage codegen: the z-value is a pure bitwise
expression (no UDF), and the only extra cost over a plain rewrite is one
min/max stats aggregate over the clustering columns (one pass; in a real
lakehouse these bounds come from table-level stats instead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map ``col`` from [lo, hi] onto the integer grid [0, 2**bits - 1].

    Monotonic, so range predicates on the raw column translate to range
    predicates on the cell index; constant inputs (hi == lo) collapse to
    cell 0 rather than dividing by zero.
    """
    span = (hi - lo).cast("double")
    scaled = F.when(
        span > 0,
        F.floor((col.cast("double") - lo.cast("double")) * ((1 << bits) - 1) / span),
    ).otherwise(F.lit(0))
    return scaled.cast("long")


def zorder_value(cells: list[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of each cell index (Morton code).

    Bit ``i`` of column ``c`` lands at output position ``i * n_cols + c``,
    giving every column equal weight in the cluster order. Built as a
    single OR-tree of shift/mask expressions — pure JVM codegen, no UDF;
    ``n_cols * bits`` must stay < 63 to fit a long.
    """
    n = len(cells)
    if n * bits >= 63:
        raise ValueError(f"{n} cols x {bits} bits overflows a long z-value")
    z = F.lit(0).cast("long")
    for c, cell in enumerate(cells):
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(cell, i).bitwiseAND(F.lit(1)), i * n + c)
            )
    return z


def zorder_rewrite(
    df: DataFrame,
    cols: list[str],
    path: str,
    bits: int = 10,
    n_files: int = 16,
) -> None:
    """Rewrite ``df`` z-order-clustered on ``cols`` into ``path``.

    One stats pass bounds each column, then the z-value drives a range
    partition (files = contiguous z-ranges = small multi-dim boxes) and a
    within-partition sort (row groups inherit the same locality). The
    rewrite is content-preserving: same rows, new physical order.
    """
    bounds = df.agg(
        *[F.min(c).alias(f"__lo_{c}") for c in cols],
        *[F.max(c).alias(f"__hi_{c}") for c in cols],
    ).first()
    cells = [
        quantize(
            F.col(c),
            F.lit(bounds[f"__lo_{c}"]),
            F.lit(bounds[f"__hi_{c}"]),
            bits,
        )
        for c in cols
    ]
    (
        df.withColumn("__z", zorder_value(cells, bits))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def list_data_files(spark, path: str, suffix: str = ".parquet") -> list[tuple[str, int]]:
    """Recursive (path, bytes) listing of a table directory via the Hadoop
    FileSystem API — works for any scheme Spark can read (local, HDFS, s3a),
    unlike a Python glob. Metadata/_SUCCESS files are skipped."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out: list[tuple[str, int]] = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(suffix) and not name.startswith(("_", ".")):
            out.append((st.getPath().toString(), int(st.getLen())))
    return out


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    path: str,
    buckets: int = 8,
) -> DataFrame:
    """Persist ``df`` as a bucketed + per-bucket-sorted catalog table
    (SURVEY §2-C C3's persisted half — the Spark twin of Dask's sorted
    ``divisions`` / a Hive ``CLUSTERED BY ... SORTED BY ... INTO n
    BUCKETS`` table).

    Why this is the single biggest repeated-join lever at 100 TB: a fact
    table joined on the same key every day pays a full shuffle of ALL its
    bytes per run. Bucketing pays that shuffle ONCE at write time — each
    file is pinned to ``murmur3(key) % buckets`` — and every subsequent
    equi-join or aggregation on ``key`` against a co-bucketed table reads
    matching buckets side by side with NO Exchange on either side (plan-
    asserted in tests/test_plans.py). ``sortBy`` clusters each bucket on
    the key — row-group min/max stats prune key predicates, and engines
    honoring sorted-bucket metadata skip the merge sort entirely (Spark
    itself gates that ordering behind the off-by-default legacy flag
    ``spark.sql.legacy.bucketedTableScanOutputOrdering`` since 3.1, so
    its SMJ keeps a cheap shuffle-free in-partition sort over the
    already-clustered rows).

    The ``repartition(buckets, key)`` before the write is load-bearing:
    it uses the same murmur3 hash-partitioning as the bucket spec, so
    each task holds exactly one bucket's rows → ONE file per bucket.
    Without it every write task emits a sliver of every bucket
    (tasks × buckets small files — the scan cost problem compaction
    exists to fix, and the one-file-per-bucket shape sorted-scan-aware
    readers require).

    The table is registered with an explicit ``path`` (external), so the
    data lands under the caller's scratch/lake directory rather than the
    session warehouse; re-running overwrites both metadata and files.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.repartition(buckets, F.col(key))
        .write.bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )
    return spark.table(table)


def compact_rewrite(
    spark,
    in_path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """Small-file compaction (the lakehouse ``OPTIMIZE`` / bin-packing
    rewrite): coalesce a directory of many undersized parquet files into
    ``ceil(total_bytes / target_bytes)`` right-sized files.

    Small files are the silent killer of 100 TB scans — every file costs a
    driver listing entry, a footer read, and a task schedule; streaming
    sinks and over-parallel writers produce them constantly, so compaction
    is a standing maintenance pass in any lakehouse. Sizing comes from the
    actual on-disk bytes (Hadoop FS listing — the same numbers a real
    OPTIMIZE uses), not a row-count guess, so compressed-size skew is
    handled. With ``sort_cols`` the rewrite also restores a clustered
    layout via ``repartitionByRange`` + ``sortWithinPartitions`` (stats
    stay prunable); without it a round-robin ``repartition`` balances
    output file sizes exactly. Content-preserving either way: same rows,
    new physical layout.

    Returns ``{"n_files_in", "bytes_in", "n_files_out"}``.
    """
    files = list_data_files(spark, in_path)
    bytes_in = sum(sz for _, sz in files)
    n_out = max(1, -(-bytes_in // target_bytes))  # ceil
    df = spark.read.parquet(in_path)
    if sort_cols:
        writer = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        writer = df.repartition(n_out)
    writer.write.mode("overwrite").parquet(out_path)
    return {
        "n_files_in": len(files),
        "bytes_in": bytes_in,
        "n_files_out": len(list_data_files(spark, out_path)),
    }


def compact_partitions(
    spark,
    table_path: str,
    partition_filter: dict,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """Partition-scoped compaction — ``OPTIMIZE ... WHERE key=value``
    (VERDICT r5 #4): list and rewrite ONLY the partition directory named
    by ``partition_filter`` (``{"k": v}`` → ``<table>/k=v``, nested dicts
    in key order for multi-level layouts), leaving every other
    partition's files untouched — at 100 TB a whole-table listing is
    itself a scan, so maintenance must address partitions directly.

    In-place rewrite with a staged swap (the lakehouse commit shape):
    the compacted files are written to a sibling staging directory,
    the partition's old data files are deleted, the new files are
    renamed in, and the staging directory is removed. Hadoop FS renames
    are metadata-only within a filesystem. NOT transactional on a plain
    parquet directory (a concurrent reader between delete and rename
    sees partial data) — a real table format makes the swap a log commit;
    the file choreography here is exactly what its OPTIMIZE executes.

    Returns ``{"partition", "n_files_in", "bytes_in", "n_files_out",
    "untouched_files"}`` — the last is the count of data files OUTSIDE
    the target partition, so callers can assert the scoping contract.
    """
    sub = "/".join(f"{k}={v}" for k, v in partition_filter.items())
    root = table_path.rstrip("/")
    part_path = f"{root}/{sub}"
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(part_path)
    fs = jpath.getFileSystem(hconf)
    if not fs.exists(jpath):
        raise ValueError(f"no such partition directory: {part_path}")

    files = list_data_files(spark, part_path)
    bytes_in = sum(sz for _, sz in files)
    n_out = max(1, -(-bytes_in // target_bytes))  # ceil
    df = spark.read.parquet(part_path)
    if sort_cols:
        writer = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        writer = df.repartition(n_out)
    staging = f"{root}/__compact_staging"
    writer.write.mode("overwrite").parquet(staging)

    for path, _sz in files:
        fs.delete(jvm.org.apache.hadoop.fs.Path(path), False)
    for path, _sz in list_data_files(spark, staging):
        src = jvm.org.apache.hadoop.fs.Path(path)
        fs.rename(
            src, jvm.org.apache.hadoop.fs.Path(f"{part_path}/{src.getName()}")
        )
    fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)

    n_out_actual = len(list_data_files(spark, part_path))
    # listings come back as full URIs (file:/..., hdfs://...); membership in
    # the target partition is decided by the partition path segment
    untouched = len(
        [p for p, _ in list_data_files(spark, root) if f"/{sub}/" not in p]
    )
    return {
        "partition": sub,
        "n_files_in": len(files),
        "bytes_in": bytes_in,
        "n_files_out": n_out_actual,
        "untouched_files": untouched,
    }
