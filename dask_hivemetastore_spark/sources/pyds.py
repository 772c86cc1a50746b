"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

The reference's whole reason to exist is teaching an engine about a source
it doesn't natively know (Hive-metastore tables → Dask). Spark 4's Python
DataSource API is the first-class extension point for exactly that job, so
this module demonstrates it end-to-end with a deterministic synthetic
source: ``spark.read.format("synthrange").option("n", ...).load()``.

Scale semantics are the real point: ``partitions()`` declares the split
(here round-robin strides), Spark schedules one ``read(partition)`` task
per split across executors — the same partition-planning contract a real
connector (REST API pages, Kafka offset ranges, metastore partition dirs)
implements. A production metastore connector on this API would return one
InputPartition per Hive partition directory, giving catalog-level pruning
for free when the option carries the partition filter.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class SynthRangeDataSource(DataSource):
    """``synthrange``: rows (i, sq=i²) for i in [0, n), split over
    ``parts`` partitions by round-robin stride."""

    @classmethod
    def name(cls) -> str:
        return "synthrange"

    def schema(self) -> str:
        return "i bigint, sq bigint"

    def reader(self, schema) -> "SynthRangeReader":
        return SynthRangeReader(self.options)


class SynthRangeReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 4))

    def partitions(self):
        return [InputPartition(p) for p in range(self.parts)]

    def read(self, partition):
        stride, start = self.parts, partition.value
        for i in range(start, self.n, stride):
            yield (i, i * i)


def register(spark) -> None:
    spark.dataSource.register(SynthRangeDataSource)
