"""Layout-matrix regression tests for events.parquet physical layouts.

Round 2 lost its entire bench (rc=1) and 17 correctness rows when the driver
regenerated events.parquet as TIMESTAMP(MICROS) while the catalog assumed
TIMESTAMP(NANOS)+nanosAsLong. These tests write the SAME tiny events fixture
in BOTH layouts and drive the full adaptation surface over each —
``catalog.load_table``, a batch window plan, and the streaming reader — so
the next testdata regeneration (micros-with-tz, int96, back to nanos) fails
a unit test here instead of failing the round.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql.types import LongType, TimestampNTZType

N_ROWS = 48
BASE = dt.datetime(2024, 3, 1, 0, 0, 0)


def _events_arrays():
    """One fixture, µs-precision wall-clock values (lossless in both layouts)."""
    ts = [BASE + dt.timedelta(minutes=7 * i, microseconds=123456 * i) for i in range(N_ROWS)]
    return {
        "event_id": list(range(N_ROWS)),
        "ts": ts,
        "user_id": [i % 5 for i in range(N_ROWS)],
        "event_type": ["click" if i % 3 else "view" for i in range(N_ROWS)],
        "value": [round(0.5 * i, 2) for i in range(N_ROWS)],
        "props": ['{"k":%d}' % i for i in range(N_ROWS)],
    }


def _write_layout(dirpath: str, unit: str) -> str:
    """Write events.parquet with ts as timestamp[unit] (us → TIMESTAMP(MICROS),
    ns → TIMESTAMP(NANOS); parquet format version 2.6 keeps nanos as nanos)."""
    cols = _events_arrays()
    table = pa.table(
        {
            "event_id": pa.array(cols["event_id"], pa.int64()),
            "ts": pa.array(cols["ts"], pa.timestamp(unit)),
            "user_id": pa.array(cols["user_id"], pa.int64()),
            "event_type": pa.array(cols["event_type"], pa.string()),
            "value": pa.array(cols["value"], pa.float64()),
            "props": pa.array(cols["props"], pa.string()),
        }
    )
    os.makedirs(dirpath, exist_ok=True)
    path = os.path.join(dirpath, "events.parquet")
    pq.write_table(table, path, version="2.6")
    return dirpath


@pytest.fixture(scope="module")
def layout_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("events_layouts")
    return {
        "micros": _write_layout(str(root / "micros"), "us"),
        "nanos": _write_layout(str(root / "nanos"), "ns"),
    }


def test_physical_layouts_differ_as_intended(layout_dirs, spark):
    """Sanity: the fixtures really exercise both branches of the adapter."""
    from dask_hivemetastore_spark.catalog import events_ts_is_long

    raw_us = spark.read.parquet(f"{layout_dirs['micros']}/events.parquet")
    raw_ns = spark.read.parquet(f"{layout_dirs['nanos']}/events.parquet")
    assert not events_ts_is_long(raw_us)  # native timestamp branch
    assert events_ts_is_long(raw_ns)  # bigint-nanos branch (nanosAsLong)


def test_load_table_normalizes_both_layouts(layout_dirs, spark):
    """load_table exposes identical TIMESTAMP_NTZ µs values for both layouts."""
    from dask_hivemetastore_spark.catalog import load_table

    frames = {k: load_table(spark, d, "events") for k, d in layout_dirs.items()}
    for name, df in frames.items():
        assert isinstance(df.schema["ts"].dataType, TimestampNTZType), name
        assert not isinstance(df.schema["ts"].dataType, LongType), name
    rows_us = sorted(frames["micros"].collect(), key=lambda r: r.event_id)
    rows_ns = sorted(frames["nanos"].collect(), key=lambda r: r.event_id)
    assert rows_us == rows_ns
    assert rows_us[1].ts == BASE + dt.timedelta(minutes=7, microseconds=123456)


def test_window_plan_identical_across_layouts(layout_dirs, spark):
    """A real registered plan (rolling time window, derives unix_micros(ts))
    returns byte-identical results over both physical layouts."""
    from dask_hivemetastore_spark.plans.windows import rolling_1h_events

    out = {
        k: sorted(rolling_1h_events(spark, d).collect(), key=lambda r: r.event_id)
        for k, d in layout_dirs.items()
    }
    assert out["micros"] == out["nanos"]
    assert len(out["micros"]) == N_ROWS


def test_tumbling_plan_identical_across_layouts(layout_dirs, spark):
    from dask_hivemetastore_spark.plans.events import events_tumbling_1h

    out = {
        k: sorted(map(tuple, events_tumbling_1h(spark, d).collect()))
        for k, d in layout_dirs.items()
    }
    assert out["micros"] == out["nanos"]
    assert len(out["micros"]) > 0


def test_streaming_reader_identical_across_layouts(layout_dirs, spark):
    """read_events_stream drains to the same rows for both layouts."""
    from dask_hivemetastore_spark.streaming.pipeline import (
        read_events_stream,
        run_to_memory,
    )

    out = {}
    for k, d in layout_dirs.items():
        batch = run_to_memory(read_events_stream(spark, d), f"layout_{k}", "append")
        out[k] = sorted(batch.collect(), key=lambda r: r.event_id)
    assert out["micros"] == out["nanos"]
    assert len(out["micros"]) == N_ROWS


def test_ivf_append_content_identical_to_rebuild(spark, tmp_path):
    """r11 incremental IVF maintenance: an index grown by ivf_append
    batches against FIXED centroids must be content-identical (every
    row, including its cell assignment) to a one-shot ivf_build_index
    over the union — assignment is a pure function of (vector,
    centroids), so ingest history cannot leak into the index. Also pins
    that the appended layout stays partition-prunable: the probe scan
    lists only the probed cell directories."""
    from dask_hivemetastore_spark.catalog import load_table
    from dask_hivemetastore_spark.operators.similarity import (
        ivf_append,
        ivf_assign_full,
        ivf_build_index,
        ivf_probe_indexed,
        ivf_train_centroids,
    )
    from pyspark.sql import functions as F
    from .conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    C = ivf_train_centroids(emb, n_cells=8, cache_key=str(tmp_path))

    grown = str(tmp_path / "grown")
    ivf_assign_full(emb.where(F.col("vec_id") % 2 == 0), C).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(grown)
    for parity in (1, 3):
        ivf_append(emb.where(F.col("vec_id") % 4 == parity), grown, C)

    oneshot = str(tmp_path / "oneshot")
    ivf_build_index(emb, oneshot, n_cells=8, cache_key=str(tmp_path))

    a = spark.read.parquet(grown).select("vec_id", "cell")
    b = spark.read.parquet(oneshot).select("vec_id", "cell")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.count() == b.count()

    qv = emb.where("vec_id = 0").select("embedding").first()[0]
    top = ivf_probe_indexed(spark, grown, C, qv, k=5, nprobe=3, exclude_id=0)
    plan = spark._jvm.PythonSQLUtils.explainString(
        top._jdf.queryExecution(), "formatted"
    )
    part_filters = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "cell" in part_filters, plan
    ref = ivf_probe_indexed(spark, oneshot, C, qv, k=5, nprobe=3,
                            exclude_id=0)
    assert [tuple(r) for r in top.collect()] == [tuple(r) for r in ref.collect()]


def test_ivf_hot_cell_compaction_preserves_probe(spark, tmp_path):
    """The maintenance pair the r11 append docstrings promise: appends
    accumulate small files per cell directory, and the partition-scoped
    compactor (OPTIMIZE ... WHERE cell=k) must rewrite a hot cell
    in-place — fewer files, byte-identical rows — without touching
    other cells or changing any probe answer."""
    import os as _os

    import numpy as _np

    from dask_hivemetastore_spark.catalog import load_table
    from dask_hivemetastore_spark.operators.layout import compact_partitions
    from dask_hivemetastore_spark.operators.similarity import (
        ivf_append,
        ivf_assign_full,
        ivf_probe_indexed,
        ivf_train_centroids,
    )
    from pyspark.sql import functions as F
    from .conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    C = ivf_train_centroids(emb, n_cells=4, cache_key=str(tmp_path))
    idx = str(tmp_path / "hot_idx")
    ivf_assign_full(emb.where(F.col("vec_id") % 4 == 0), C).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(idx)
    for parity in (1, 2, 3):  # three appends -> several files per cell
        ivf_append(emb.where(F.col("vec_id") % 4 == parity), idx, C)

    qv = _np.asarray(
        emb.where("vec_id = 0").select("embedding").first()[0],
        dtype=_np.float64,
    )
    hot = int((C @ qv).argmax())
    before = [tuple(r) for r in ivf_probe_indexed(
        spark, idx, C, qv, k=5, nprobe=2, exclude_id=0).collect()]

    def _nfiles(cell: int) -> int:
        d = _os.path.join(idx, f"cell={cell}")
        return len([f for f in _os.listdir(d) if f.endswith(".parquet")])

    n_before = _nfiles(hot)
    assert n_before >= 3  # the appends really fragmented the hot cell
    other = next(c for c in range(4) if c != hot and
                 _os.path.isdir(_os.path.join(idx, f"cell={c}")))
    other_files = sorted(_os.listdir(_os.path.join(idx, f"cell={other}")))

    stats = compact_partitions(spark, idx, {"cell": hot})
    assert stats["n_files_out"] < stats["n_files_in"] == n_before

    # untouched sibling cell keeps its exact file listing
    assert sorted(_os.listdir(_os.path.join(idx, f"cell={other}"))) \
        == other_files
    after = [tuple(r) for r in ivf_probe_indexed(
        spark, idx, C, qv, k=5, nprobe=2, exclude_id=0).collect()]
    assert after == before
