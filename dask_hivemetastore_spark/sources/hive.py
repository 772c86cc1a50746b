"""Real Hive-metastore path (SURVEY.md §2-A A1): ``enableHiveSupport``.

On a cluster with a Thrift HMS this is the whole reference connector in one
line — ``spark.table("db.tbl")`` resolves schema/location/format/partitions
from the metastore, with ``spark.sql.hive.metastorePartitionPruning`` (on by
default) doing the server-side partition filtering the reference did via
``get_partitions_by_filter``.

``spark.sql.catalogImplementation`` is a *static* conf: a Hive-enabled
session cannot be created after a plain one in the same JVM, so the demo
below runs standalone (``python -m dask_hivemetastore_spark.sources.hive``)
with an embedded Derby metastore, and the test suite drives it as a
subprocess.
"""

from __future__ import annotations

import os
import re
import sys
import tempfile

from pyspark.sql import SparkSession


def create_hive_session(warehouse_dir: str, metastore_dir: str) -> SparkSession:
    """Hive-enabled local session with embedded Derby metastore."""
    return (
        SparkSession.builder.appName("hive-metastore-demo")
        .master("local[4]")
        .config("spark.sql.warehouse.dir", warehouse_dir)
        .config(
            "spark.hadoop.javax.jdo.option.ConnectionURL",
            f"jdbc:derby:;databaseName={metastore_dir}/metastore_db;create=true",
        )
        .config("spark.sql.catalogImplementation", "hive")
        .config("spark.sql.hive.metastorePartitionPruning", "true")
        .config("spark.ui.enabled", "false")
        .enableHiveSupport()
        .getOrCreate()
    )


def demo(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    """Round-trip a partitioned table through the Hive catalog and prove
    catalog-level partition pruning via the explain plan. Returns a summary
    dict (printed as the module's stdout contract for the subprocess test).
    """
    tmp = tempfile.mkdtemp(prefix="hive_demo_")
    spark = create_hive_session(os.path.join(tmp, "wh"), tmp)
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        (
            orders.selectExpr("*", "o_orderstatus AS status_part")
            .write.mode("overwrite")
            .partitionBy("status_part")
            .saveAsTable("orders_hive")
        )
        tbl = spark.table("orders_hive")
        n_all = tbl.count()
        pruned = tbl.where("status_part = 'F'")
        n_f = pruned.count()
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        partitions = [
            r[0] for r in spark.sql("SHOW PARTITIONS orders_hive").collect()
        ]
        catalog_tables = [t.name for t in spark.catalog.listTables()]
        return {
            "n_all": n_all,
            "n_f": n_f,
            "partitions": partitions,
            "table_visible": "orders_hive" in catalog_tables,
            # NON-EMPTY PartitionFilters required: the bare substring
            # "PartitionFilters" appears in EVERY partitioned-scan plan
            # (even as an empty list), which made the old or-branch
            # vacuously true and the demo unable to catch a pruning
            # regression (r7 review)
            "prunes": "status_part=F" in plan.replace(" ", "")
            or bool(re.search(r"PartitionFilters: \[[^\]]", plan)),
        }
    finally:
        spark.stop()


if __name__ == "__main__":
    import json

    print(json.dumps(demo(*(sys.argv[1:2]))))
