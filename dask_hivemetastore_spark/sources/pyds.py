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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


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


def make_stream_source():
    """Build the ``synthstream`` source classes.

    Defined inside a factory ON PURPOSE: the streaming Python runner is a
    separate process that does NOT inherit the driver's ``sys.path``, so a
    module-level class (pickled by reference) fails to unpickle whenever
    the driver ran from outside the repo. Closure-local classes make
    cloudpickle serialize them BY VALUE — self-contained, importable from
    nowhere. (The batch reader above survives by reference because batch
    python workers inherit the driver environment; the streaming runner
    does not.)

    Reader contract: offsets advance ``batch`` rows per micro-batch until
    ``n`` — Kafka-style offset/commit/replay in miniature;
    ``readBetweenOffsets`` is the recovery replay path.
    """

    class SynthRangeStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options) -> None:
            self.n = int(options.get("n", 1000))
            self.batch = int(options.get("batch", 200))

        def initialOffset(self):
            return {"offset": 0}

        def read(self, start):
            s = start["offset"]
            e = min(s + self.batch, self.n)
            return iter([(i,) for i in range(s, e)]), {"offset": e}

        def readBetweenOffsets(self, start, end):
            return iter([(i,) for i in range(start["offset"], end["offset"])])

    class SynthRangeStreamSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "synthstream"

        def schema(self) -> str:
            return "i bigint"

        def simpleStreamReader(self, schema):
            return SynthRangeStreamReader(self.options)

    return SynthRangeStreamSource


def register_stream(spark) -> None:
    spark.dataSource.register(make_stream_source())


def make_jsonl_sink():
    """Build the ``pyjsonl`` batch SINK classes (Spark 4 Python
    DataSourceWriter) — the write-side twin of the reader above, i.e. the
    modern extension point for teaching Spark a destination it doesn't
    know (REST ingest endpoints, bespoke stores).

    Commit protocol is the real content: each task writes its partition to
    a UNIQUE temp-suffixed file and returns a WriterCommitMessage naming
    it; the driver's ``commit(messages)`` renames all parts into place and
    stamps a manifest, ``abort`` removes strays. Task retries/speculation
    therefore never produce duplicate or torn output — exactly the
    two-phase contract FileFormatWriter gives built-in sinks, reproduced
    at the Python layer. Closure-local classes for the same pickle-by-value
    reason as :func:`make_stream_source`.
    """
    import json
    import os
    import uuid

    from dataclasses import dataclass

    from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage

    @dataclass
    class PartFile(WriterCommitMessage):
        tmp_path: str
        final_path: str
        n_rows: int

    class JsonlWriter(DataSourceWriter):
        def __init__(self, options, overwrite: bool = False) -> None:
            self.path = options["path"]
            self.overwrite = overwrite

        def write(self, iterator) -> "PartFile":
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            os.makedirs(self.path, exist_ok=True)
            final = os.path.join(self.path, f"part-{pid:05d}.jsonl")
            tmp = f"{final}.{uuid.uuid4().hex}.tmp"
            n = 0
            with open(tmp, "w") as f:
                for row in iterator:
                    f.write(json.dumps(row.asDict()) + "\n")
                    n += 1
            return PartFile(tmp_path=tmp, final_path=final, n_rows=n)

        def commit(self, messages) -> None:
            total = 0
            keep = {m.final_path for m in messages}
            for m in messages:
                os.replace(m.tmp_path, m.final_path)
                total += m.n_rows
            if self.overwrite:
                # overwrite-at-commit: clear stale part files from prior
                # runs AFTER the new files land — a second overwrite with
                # fewer partitions used to leave old parts beside a
                # manifest that didn't count them (r7 review). Deferring
                # the delete to commit keeps the failure contract: an
                # aborted write leaves the previous output intact.
                for fname in os.listdir(self.path):
                    full = os.path.join(self.path, fname)
                    if fname.endswith(".jsonl") and full not in keep:
                        os.remove(full)
            with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
                json.dump({"n_rows": total, "n_files": len(messages)}, f)

        def abort(self, messages) -> None:
            for m in messages:
                try:
                    os.remove(m.tmp_path)
                except FileNotFoundError:
                    pass

    class JsonlSinkDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "pyjsonl"

        def writer(self, schema, overwrite: bool) -> "JsonlWriter":
            return JsonlWriter(self.options, overwrite=overwrite)

    return JsonlSinkDataSource


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(make_jsonl_sink())
