"""Hostile + mid-batch-recovery gates for the streaming twins (r9).

VERDICT r8 "Next round #2": the r8 hostile corpora replay the BATCH
keys; the differential fuzzers target batch operators; the 13 fixed
streaming tests restart only BETWEEN batches. This module closes those
gaps for the streaming surface:

1. Replays the hostile EVENTS corpus (test_hostile_events.write_hostile_events
   — boundary timestamps, NULL ts/user/value, hostile JSON, duplicate
   keys) through every registered ``stream_*``/streaming-family key with
   a full oracle, comparing against its registered DuckDB oracle on the
   hostile data — the same gate the batch twins passed in r8.
2. Pins the watermark LATE-ROW boundary across micro-batches: a late row
   into an already-finalized window is dropped, a window whose end is
   EXACTLY the watermark finalizes without it, and an open-window late
   row is accepted (the boundary class the single-batch registered
   queries can never exercise).
3. Pins the session-gap boundary ACROSS batches for the custom
   sessionizer: an arrival in a LATER batch at exactly last+gap must
   merge into the state-carried open session (strictly-greater closes —
   same rule the r8 hostile corpus pinned within one batch).
4. Drives adversarial duplicate keys into the REAL band-bucket
   applyInPandasWithState path (not the FakeState unit harness): a
   boilerplate cluster larger than the membership cap must cap resident
   state, accumulate overflow across batches, and emit at most
   C(cap, 2) pairs.
5. Crash-INSIDE-a-batch recovery, one test per state kind (built-in
   aggregation state; custom applyInPandasWithState state): a task
   failure mid-batch kills the query (local mode has no task retries),
   and a restart from the same checkpoint must produce EXACTLY the batch
   answer — the failed attempt's partial state/sink output must not
   double-count. The r8 recovery tests stop cleanly between batches;
   this is the other half.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from .oracle_harness import compare
from .test_hostile_events import write_hostile_events

# ---------------------------------------------------------------------------
# 1. hostile-events replay through the streaming registry keys
# ---------------------------------------------------------------------------

# Every registered streaming-family key with a full oracle that reads
# ``events`` (stream_sessionize already rides test_hostile_events._KEYS;
# stream_dedup_near_docs reads documents and is gated by the cap test
# below + the batch hostile corpus; python_stream_source_agg reads a
# synthetic source, not events).
_STREAM_KEYS = [
    "stream_tumbling_1h",
    "stream_dedup_users",
    "stream_stateful_counts",
    "stream_filter_to_parquet",
    "stream_static_enrich",
    "stream_sliding_30m",
    "stream_click_attribution",
    "stream_foreach_batch_snapshot",
    "statestore_event_counts",
    "stream_observe_metrics",
]


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory) -> str:
    from .conftest import SF_SMOKE

    d = tmp_path_factory.mktemp("hostile_stream_sf")
    write_hostile_events(d)
    for f in os.listdir(SF_SMOKE):
        if f != "events.parquet":
            os.symlink(os.path.join(SF_SMOKE, f), d / f)
    return str(d)


@pytest.fixture(scope="module")
def hostile_duck(hostile_dir):
    import duckdb

    from dask_hivemetastore_spark.catalog import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{hostile_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", _STREAM_KEYS)
def test_hostile_stream_parity(key, spark, hostile_dir, hostile_duck):
    from dask_hivemetastore_spark import plans

    sdf = plans.QUERIES[key](spark, hostile_dir)
    problems = compare(key, sdf, hostile_duck.sql(plans.ORACLES[key]))
    assert not problems, "\n".join(problems)


# ---------------------------------------------------------------------------
# shared multi-batch machinery
# ---------------------------------------------------------------------------

_US = 1_000_000
_MIN = 60 * _US
_T0 = 1_700_000_000_000_000  # 2023-11-14 22:13:20 UTC — µs epoch base


def _write_batches(src, files: dict[str, list[tuple]]) -> None:
    """Write (user_id, ts_us, value) row lists as one parquet file each,
    with strictly increasing mtimes so FileStreamSource (which orders by
    modification time) replays them as ordered micro-batches under
    ``maxFilesPerTrigger=1``."""
    os.makedirs(str(src), exist_ok=True)
    base = 1_000_000_000
    for i, (name, rows) in enumerate(files.items()):
        path = os.path.join(str(src), name)
        pd.DataFrame(
            {
                "user_id": pd.array([r[0] for r in rows], dtype="Int64"),
                "ts_us": pd.array([r[1] for r in rows], dtype="int64"),
                "value": pd.array([r[2] for r in rows], dtype="Float64"),
            }
        ).to_parquet(path, index=False)
        os.utime(path, (base + 60 * i, base + 60 * i))


_BATCH_SCHEMA = "user_id long, ts_us long, value double"


def _stream_src(spark, src):
    from pyspark.sql import functions as F

    return (
        spark.readStream.schema(_BATCH_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .select("user_id", F.timestamp_micros("ts_us").alias("ts"), "value")
    )


def _drain(stream_df, name: str, mode: str, ckpt: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return stream_df.sparkSession.table(name)


# ---------------------------------------------------------------------------
# 2. late rows exactly AT the watermark (multi-batch, append mode)
# ---------------------------------------------------------------------------


def _hour_grid(hours: int, minutes: int = 0) -> int:
    # lay rows on an exact hour grid: _T0 floored to the hour
    floor = _T0 - (_T0 % (60 * _MIN))
    return floor + hours * 60 * _MIN + minutes * _MIN


def _wlabel(hours: int) -> str:
    """HH:mm display label of the tumbling window containing grid hour N
    (the grid base is _T0 floored to an hour, not midnight)."""
    return pd.Timestamp(_hour_grid(hours), unit="us").strftime("%H:%M")


def _tumbling_append(spark, src, ckpt: str):
    from pyspark.sql import functions as F

    agg = (
        _stream_src(spark, src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.date_format("w.start", "HH:mm").alias("win"), "n_events")
    )
    return _drain(agg, "late_rows_wm", "append", ckpt)


def test_late_rows_after_eviction_dropped(spark, tmp_path):
    """Append-mode tumbling agg, 10-min watermark, one file per batch.

    Batch 0 (f1) carries windows w10/w11 and a max ts of 12:10, setting
    the watermark to EXACTLY 12:00:00 for batch 1. Batch 1 (f2, no late
    rows) therefore finalizes and EVICTS both: w10 (end 11:00 < wm) and
    w11 (end 12:00 == wm — equality finalizes; the eviction predicate is
    ``window.end <= watermark``). Batch 2 (f3) then delivers late rows
    into both EVICTED windows — they must be silently dropped (state
    gone, append emits once), while its late-but-open 12:20 row is
    accepted into w12. The sentinel file advances the watermark so the
    final no-data micro-batch flushes w12.

    Together with test_late_rows_same_batch_as_finalization_included
    this pins Spark's actual late-data contract: dropping is BEST-EFFORT
    (docs: "may or may not" be dropped) — the guarantee is eviction-
    based, not a row-level timestamp filter.
    """
    h = _hour_grid
    _write_batches(
        tmp_path / "src",
        {
            "f1.parquet": [
                (1, h(10, 5), 1.0),
                (1, h(10, 30), 1.0),
                (1, h(11, 15), 1.0),
                (1, h(11, 45), 1.0),
                (1, h(12, 10), 1.0),  # max → watermark 12:00:00 for b1
            ],
            # no late rows: just finalize w10 + w11 (boundary: end==wm)
            "f2.parquet": [(1, h(12, 15), 1.0)],
            "f3.parquet": [
                (1, h(10, 45), 1.0),  # late into EVICTED w10 → dropped
                (1, h(11, 30), 1.0),  # late into EVICTED w11 → dropped
                (1, h(12, 20), 1.0),  # late but w12 still open → accepted
            ],
            "f4.parquet": [(1, h(14, 50), 1.0)],  # sentinel: flushes w12
        },
    )
    out = _tumbling_append(spark, tmp_path / "src", str(tmp_path / "ckpt"))
    rows = [(r.win, r.n_events) for r in out.collect()]
    got = dict(rows)
    assert len(rows) == len(got), rows  # each window emitted exactly once
    assert got.get(_wlabel(10)) == 2, got  # post-eviction late 10:45 dropped
    assert got.get(_wlabel(11)) == 2, got  # end==wm finalized; late dropped
    assert got.get(_wlabel(12)) == 3, got  # 12:10 + 12:15 + late-open 12:20
    assert _wlabel(14) not in got, got     # sentinel window never finalized


def test_late_rows_same_batch_as_finalization_included(spark, tmp_path):
    """The other half of the best-effort contract: late rows arriving in
    the SAME micro-batch in which their window finalizes are still
    INCLUDED — the batch-1 watermark (12:00) both accepts f2's late rows
    into the still-resident w10/w11 state and finalizes those windows at
    batch end. A row-level `ts < watermark → drop` mental model would
    predict 2/2 here; Spark's actual answer is 3/3 (r9 probe)."""
    h = _hour_grid
    _write_batches(
        tmp_path / "src",
        {
            "f1.parquet": [
                (1, h(10, 5), 1.0),
                (1, h(10, 30), 1.0),
                (1, h(11, 15), 1.0),
                (1, h(11, 45), 1.0),
                (1, h(12, 10), 1.0),  # max → watermark 12:00:00 for b1
            ],
            "f2.parquet": [
                (1, h(10, 45), 1.0),  # late, but w10 state still resident
                (1, h(11, 30), 1.0),  # late, boundary window, still resident
                (1, h(12, 40), 1.0),
            ],
            "f3.parquet": [(1, h(14, 50), 1.0)],  # sentinel: flushes w12
        },
    )
    out = _tumbling_append(spark, tmp_path / "src", str(tmp_path / "ckpt"))
    got = {r.win: r.n_events for r in out.collect()}
    assert got.get(_wlabel(10)) == 3, got  # same-batch late row INCLUDED
    assert got.get(_wlabel(11)) == 3, got  # same-batch boundary row INCLUDED
    assert got.get(_wlabel(12)) == 2, got  # 12:10 + 12:40


# ---------------------------------------------------------------------------
# 3. session gap exactly equal, across batches (custom state carry)
# ---------------------------------------------------------------------------


def test_sessionize_gap_boundary_across_batches(spark, tmp_path):
    """The r8 hostile corpus pinned exact-gap merge WITHIN a batch; here
    the exact-gap arrival lands in a LATER micro-batch, so the merge must
    go through the checkpointed open-session state: 30:00.000000 after
    the state's ``last`` merges, 30:00.000001 closes."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from dask_hivemetastore_spark.streaming.pipeline import (
        _SESS_OUT,
        _SESS_STATE,
        _sessionize_fn,
    )

    _write_batches(
        tmp_path / "src",
        {
            # user 7: open session [t0, t0+10m]; user 8: open [t0]
            "f1.parquet": [
                (7, _T0, 1.0),
                (7, _T0 + 10 * _MIN, 2.0),
                (8, _T0, 1.0),
            ],
            # user 7: EXACTLY last+30min → must merge via carried state
            # user 8: last+30min+1µs → must close and open a new session
            "f2.parquet": [
                (7, _T0 + 40 * _MIN, 3.0),
                (8, _T0 + 30 * _MIN + 1, 2.0),
            ],
            # user 7: 30min+1µs after 40m → closes the merged session
            "f3.parquet": [
                (7, _T0 + 70 * _MIN + 1, 4.0),
            ],
        },
    )
    sessions = (
        _stream_src(spark, tmp_path / "src")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=_SESS_OUT,
            stateStructType=_SESS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    log = _drain(sessions, "sess_gap_xbatch", "update", str(tmp_path / "ck"))
    # update-mode log re-emits a growing open session; n_events per
    # (user, session_start) is monotone, so last-wins == struct-max
    final = (
        log.groupBy("user_id", "session_start")
        .agg(F.max(F.struct("n_events", "total_value")).alias("m"))
        .select("user_id", "session_start", "m.n_events", "m.total_value")
        .collect()
    )
    got = {
        (r.user_id, r.session_start[-8:]): (r.n_events, r.total_value)
        for r in final
    }
    t0s = pd.Timestamp(_T0, unit="us")

    def s(us):
        return pd.Timestamp(us, unit="us").strftime("%H:%M:%S")

    assert got[(7, s(_T0))] == (3, 6.0), (got, t0s)       # exact gap merged
    assert (7, s(_T0 + 40 * _MIN)) not in got, got         # NOT a new session
    assert got[(7, s(_T0 + 70 * _MIN))] == (1, 4.0), got   # post-close opener
    assert got[(8, s(_T0))] == (1, 1.0), got               # gap+1µs closed
    assert got[(8, s(_T0 + 30 * _MIN))] == (1, 2.0), got   # new session


# ---------------------------------------------------------------------------
# 4. band-bucket cap under adversarial duplicates, REAL state path
# ---------------------------------------------------------------------------


def test_band_bucket_cap_real_state_overflow(spark, tmp_path):
    """24 documents with IDENTICAL text arrive over two micro-batches —
    every one of the 32 LSH bands maps them all to the same bucket, the
    adversarial worst case for the band-bucket state. With cap=8 the real
    applyInPandasWithState path must enroll exactly the first 8 arrivals
    per bucket, accumulate overflow=16 ACROSS batches, and emit at most
    C(8,2) distinct pairs — bounded state and bounded output no matter
    how degenerate the corpus (VERDICT r8 #2)."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from dask_hivemetastore_spark.operators.dedup import (
        minhash_band_buckets,
        with_word_ngrams,
    )
    from dask_hivemetastore_spark.streaming.pipeline import (
        _BAND_STATE,
        _PAIR_OUT,
        make_band_collisions,
    )

    text = "the quick brown fox jumps over the lazy dog again and again"
    src = tmp_path / "docs"
    os.makedirs(str(src))
    base = 1_000_000_000
    for i, ids in enumerate([range(0, 14), range(14, 24)]):
        p = os.path.join(str(src), f"d{i}.parquet")
        pd.DataFrame(
            {"doc_id": pd.array(list(ids), dtype="int64"),
             "text": [text] * len(list(ids))}
        ).to_parquet(p, index=False)
        os.utime(p, (base + 60 * i, base + 60 * i))

    docs = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    grams = with_word_ngrams(docs, "text", 3, nparts=8).drop("text")
    buckets = minhash_band_buckets(grams, "doc_id")
    pair_log = buckets.groupBy("band", "band_hash").applyInPandasWithState(
        make_band_collisions(max_bucket_size=8),
        outputStructType=_PAIR_OUT,
        stateStructType=_BAND_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    ckpt = str(tmp_path / "cap_ckpt")
    log = _drain(pair_log, "band_cap_real", "update", ckpt)

    pairs = {(r.doc_a, r.doc_b) for r in log.collect()}
    assert len(pairs) == 8 * 7 // 2, len(pairs)  # exactly C(8,2), no more
    # enrollment order within batch 0 is shuffle-arrival order, not
    # doc_id order — but the cap filled during batch 0 (14 arrivals > 8),
    # so every enrolled id is from batch 0's file and ALL of batch 1's
    # 10 docs overflowed
    assert all(0 <= a < b <= 13 for a, b in pairs), sorted(pairs)[:5]

    # read the capped state back through the I10 state-store reader:
    # every bucket holds exactly 8 batch-0 arrivals + overflow 16
    # (6 over-cap in batch 0 + all 10 of batch 1), and enrolled +
    # overflow accounts for the whole corpus
    from dask_hivemetastore_spark.streaming.pipeline import read_query_state

    # applyInPandasWithState state rows come back wrapped one level
    # deeper than built-in agg state: value.groupState.<field> (probed)
    state = read_query_state(spark, ckpt).select(
        F.size("value.groupState.ids").alias("n_ids"),
        F.col("value.groupState.overflow").alias("overflow"),
        F.col("value.groupState.ids").alias("ids"),
    ).collect()
    assert len(state) == 32  # one bucket per band, all colliding
    for r in state:
        assert r.n_ids == 8, r
        assert r.overflow == 16, r
        assert all(0 <= i <= 13 for i in r.ids), r  # batch-0 members only
        assert r.n_ids + r.overflow == 24  # exclusion accounting


# ---------------------------------------------------------------------------
# 5. crash INSIDE a batch → restart → exactly-once (both state kinds)
# ---------------------------------------------------------------------------


def _poison(sentinel: str, marker_user: int):
    """mapInPandas stage that kills its task when the sentinel file
    exists and the marker row is in this batch — a deterministic
    mid-batch crash (local mode has no task retries, so the query
    dies with the task)."""

    def fn(batches):
        for pdf in batches:
            if os.path.exists(sentinel) and (pdf["user_id"] == marker_user).any():
                raise RuntimeError("injected mid-batch task failure")
            yield pdf

    return fn


def test_midbatch_crash_recovery_builtin_agg_state(spark, tmp_path):
    """Built-in aggregation state: the query is killed by a task failure
    while processing batch 2 (after batch 1 committed), then restarted
    from the same checkpoint. The final complete-mode snapshot must equal
    the batch answer exactly — the failed attempt's partial aggregation
    state and sink output must not double-count batch 2."""
    from pyspark.sql import functions as F

    _write_batches(
        tmp_path / "src",
        {
            "f1.parquet": [(1, _T0, 1.0), (2, _T0 + _MIN, 2.0)],
            "f2.parquet": [(1, _T0 + 2 * _MIN, 4.0), (999, _T0 + 3 * _MIN, 8.0)],
        },
    )
    sentinel = str(tmp_path / "poison_on")
    open(sentinel, "w").close()
    ckpt = str(tmp_path / "ckpt")
    snapshots: list = []  # (batch_id, complete-mode agg rows)

    def run():
        # poison sits on the RAW schema, before any rename
        raw = (
            spark.readStream.schema(_BATCH_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(tmp_path / "src"))
            .mapInPandas(_poison(sentinel, 999), _BATCH_SCHEMA)
        )
        agg = raw.groupBy("user_id").agg(
            F.count("*").alias("n"), F.sum("value").alias("total")
        )

        def snap(batch_df, bid):
            # collect triggers the computation, so the poison fires HERE
            # for the doomed batch and nothing is appended for it —
            # exactly the idempotent-by-batch-id discipline a real
            # overwrite sink needs (a naive mode("overwrite") parquet
            # snapshot would have been DESTROYED by the failed attempt:
            # overwrite deletes the previous snapshot before the write
            # that then crashes — observed in this test's first draft)
            snapshots.append((bid, batch_df.collect()))

        q = (
            agg.writeStream.foreachBatch(snap)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException):
        run()
    # batch 0 committed its complete-mode snapshot before the crash;
    # the doomed batch 1 appended nothing
    assert snapshots, "batch 0 never committed"
    mid = {r.user_id: (r.n, r.total) for r in snapshots[-1][1]}
    assert mid == {1: (1, 1.0), 2: (1, 2.0)}, mid

    os.remove(sentinel)
    run()
    # restart restored batch-0 aggregation state and applied batch 1
    # exactly once: user 1 counts 2 (not 3), 999 appears once
    got = {r.user_id: (r.n, r.total) for r in snapshots[-1][1]}
    assert got == {1: (2, 5.0), 2: (1, 2.0), 999: (1, 8.0)}, got


def test_midbatch_crash_recovery_custom_state(spark, tmp_path):
    """Custom applyInPandasWithState state: the state FUNCTION itself
    raises for one key mid-batch-2 (other groups in the same failed batch
    may have finished their tasks — their uncommitted state version must
    be discarded). After restart, last-wins over the update emissions of
    both runs must equal the batch group counts exactly; a double-applied
    batch 2 would show user 1 at n=3."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from dask_hivemetastore_spark.streaming.pipeline import (
        _COUNT_SCHEMA,
        _STATE_SCHEMA,
    )

    _write_batches(
        tmp_path / "src",
        {
            "f1.parquet": [(1, _T0, 1.0), (2, _T0 + _MIN, 1.0)],
            "f2.parquet": [(1, _T0 + 2 * _MIN, 1.0), (999, _T0 + 3 * _MIN, 1.0)],
        },
    )
    sentinel = str(tmp_path / "poison_on")
    open(sentinel, "w").close()
    ckpt = str(tmp_path / "ckpt")

    def counting_fn(key, pdf_iter, state):
        if key[0] == 999 and os.path.exists(sentinel):
            raise RuntimeError("injected stateful-fn crash")
        n = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    emissions: list = []

    def run():
        counts = (
            _stream_src(spark, tmp_path / "src")
            .groupBy("user_id")
            .applyInPandasWithState(
                counting_fn,
                outputStructType=_COUNT_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )

        def grab(batch_df, _bid):
            emissions.extend(batch_df.collect())

        q = (
            counts.writeStream.foreachBatch(grab)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException):
        run()
    os.remove(sentinel)
    run()

    final: dict[int, int] = {}
    for r in emissions:  # chronological; later emissions overwrite
        final[r.user_id] = r.n_events
    assert final == {1: 2, 2: 1, 999: 1}, final
