"""dask_hivemetastore_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of ``mariusvniekerk/dask-hivemetastore``.

The reference is a Hive-Metastore → Dask-DataFrame connector: it resolves a
table's schema / format / location / partitions from the metastore and hands
the actual query work to the Dask DataFrame operator surface (see SURVEY.md
§0–§2; the local reference snapshot is empty, so citations in this package
use SURVEY.md's provenance tags instead of reference file:line).

This package re-expresses that whole surface Spark-first:

- ``session``    — SparkSession factory with the configs this testdata needs
- ``types``      — Hive metastore type string → Spark ``DataType`` (the
                   connector's central artifact, SURVEY.md §1.2)
- ``catalog``    — thin metastore-like table registry + temp-view catalog
- ``sources``    — parquet / delimited-text / partitioned readers, sinks,
                   Hive-metastore (``enableHiveSupport``) integration
- ``operators``  — relational / window / as-of / dedup / similarity / text /
                   multimodal operators (SURVEY.md §2-B…§2-K)
- ``functions``  — scalar helpers (event timestamps, array math, JSON)
- ``plans``      — the driver-checkable query registry: every operator ships
                   as a named ``(queries[key], oracle_sql[key])`` pair
- ``streaming``  — Structured Streaming variants of the batch event ops
"""

__version__ = "0.1.0"
