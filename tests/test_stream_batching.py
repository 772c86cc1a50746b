"""Micro-batch-boundary invariance for the registered streaming keys (r10).

VERDICT r9 "Next round #4": the r9 hostile-streaming gate fixed batch
CONTENT; the remaining degree of freedom is batch BOUNDARIES. A finite
fixture drains in ONE availableNow batch, so the registered keys never
exercised watermark advancement, state carry, or late-row eviction across
real micro-batches — the production shape.

Mechanism: split the REAL sf0.001 events table into K parquet part files
under an ``events.parquet`` directory (strictly increasing mtimes fix the
replay order), point the UNMODIFIED registered key at it, and set
``SPARK_GRAFT_STREAM_MAX_FILES=1`` (the knob ``read_events_stream`` added
for exactly this gate) so every file is its own micro-batch. Then:

- EXACT cohort (complete-mode aggregations, stateless sinks, final-state
  readback): the drained result must equal the single-batch baseline for
  ANY split — event-time-ordered or random — because complete mode never
  evicts and stateless rows pass through. Asserted as canonical-frame
  equality, both split shapes, seeded boundaries.
- stream_click_attribution (append, two-sided watermark interval join):
  exact under event-time-ordered splits (each side's buffered state
  outlives the other side's watermark by construction); under a RANDOM
  split, late rows are legitimately evictable — asserted as multiset
  CONTAINMENT (never an invented or duplicated pair) plus a witness that
  nothing exceeds the baseline.
- stream_stateful_counts (update mode): every micro-batch re-emits the
  running count, so the memory sink holds a HISTORY; the derived
  invariant is max-per-user == exact group count, any split shape.
- stream_sessionize (update mode): components re-emit as they change;
  superseded session starts emit tombstones (NULL n_events). Since r11
  the sessionizer's state is the full gap-component set (order-
  independent insertion with interval merging), so BOTH ordered and
  RANDOM splits are in-contract: max-n_events emission per (user,
  session_start) group, minus tombstoned groups, must equal the
  single-batch answer exactly. (The r10 version kept only the open
  session and required in-order arrival across batches.)
- stream_dedup_users (dropDuplicatesWithinWatermark): the WITHIN-
  WATERMARK contract allows re-emission of duplicates separated by more
  than the delay, so multi-batch output is legitimately a SUPERSET of
  DISTINCT user_id; asserted: distinct(output) == distinct(user_id) and
  re-emissions only ever add already-seen ids.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from .conftest import SF_SMOKE
from .oracle_harness import canon_frame

_EXACT_KEYS = [
    "stream_tumbling_1h",
    "stream_sliding_30m",
    "stream_static_enrich",
    "stream_filter_to_parquet",
    "statestore_event_counts",
]

_SPLITS = [("ordered", 3), ("ordered", 5), ("random", 4)]


def _split_events(base_dir: str, n_files: int, mode: str, seed: int = 7) -> None:
    """Write events as an ``events.parquet`` DIRECTORY of n_files parts
    with strictly increasing mtimes; symlink every other table."""
    pdf = pd.read_parquet(os.path.join(SF_SMOKE, "events.parquet"))
    rng = np.random.default_rng(seed)
    if mode == "ordered":
        pdf = pdf.sort_values("ts", kind="stable").reset_index(drop=True)
        # seeded interior cut points — the boundary positions are the
        # variable under test
        cuts = sorted(rng.choice(len(pdf) - 2, size=n_files - 1, replace=False) + 1)
    else:
        pdf = pdf.sample(frac=1.0, random_state=int(seed)).reset_index(drop=True)
        cuts = [len(pdf) * i // n_files for i in range(1, n_files)]
    bounds = [0, *cuts, len(pdf)]
    ev_dir = os.path.join(base_dir, "events.parquet")
    os.makedirs(ev_dir, exist_ok=True)
    t0 = 1_000_000_000
    for i in range(n_files):
        part = pdf.iloc[bounds[i]:bounds[i + 1]]
        p = os.path.join(ev_dir, f"part-{i:03d}.parquet")
        part.to_parquet(p, index=False)
        os.utime(p, (t0 + 60 * i, t0 + 60 * i))
    for f in os.listdir(SF_SMOKE):
        if f != "events.parquet":
            os.symlink(os.path.join(SF_SMOKE, f), os.path.join(base_dir, f))


@pytest.fixture(scope="module")
def split_dirs(tmp_path_factory):
    dirs = {}
    for mode, k in _SPLITS:
        d = tmp_path_factory.mktemp(f"split_{mode}_{k}")
        _split_events(str(d), k, mode)
        dirs[(mode, k)] = str(d)
    return dirs


@pytest.fixture(scope="module")
def baselines(spark):
    """Single-batch reference answers on the unsplit fixture."""
    from dask_hivemetastore_spark import plans

    out = {}
    for key in _EXACT_KEYS + ["stream_click_attribution"]:
        out[key] = canon_frame(plans.QUERIES[key](spark, SF_SMOKE).toPandas())
    return out


@pytest.fixture()
def one_file_per_batch(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_MAX_FILES", "1")


@pytest.mark.parametrize("split", _SPLITS, ids=[f"{m}{k}" for m, k in _SPLITS])
@pytest.mark.parametrize("key", _EXACT_KEYS)
def test_batching_invariance_exact(spark, key, split, split_dirs, baselines,
                                   one_file_per_batch):
    from dask_hivemetastore_spark import plans

    got = canon_frame(plans.QUERIES[key](spark, split_dirs[split]).toPandas())
    assert got == baselines[key], (
        f"{key} not invariant to micro-batch boundaries ({split})"
    )


def test_click_attribution_ordered_exact(spark, split_dirs, baselines,
                                         one_file_per_batch):
    from dask_hivemetastore_spark import plans

    for split in [("ordered", 3), ("ordered", 5)]:
        got = canon_frame(
            plans.QUERIES["stream_click_attribution"](
                spark, split_dirs[split]
            ).toPandas()
        )
        assert got == baselines["stream_click_attribution"], split


def test_click_attribution_random_containment(spark, split_dirs, baselines,
                                              one_file_per_batch):
    """Random arrival order may legitimately evict a buffered side before
    its match arrives (watermark passed) — pairs can DROP, but none may
    be invented and none may emit twice (append mode)."""
    from collections import Counter

    from dask_hivemetastore_spark import plans

    cols, base_rows = baselines["stream_click_attribution"]
    got_cols, got_rows = canon_frame(
        plans.QUERIES["stream_click_attribution"](
            spark, split_dirs[("random", 4)]
        ).toPandas()
    )
    assert got_cols == cols
    base_c, got_c = Counter(base_rows), Counter(got_rows)
    invented = got_c - base_c
    assert not invented, f"invented/duplicated pairs: {list(invented)[:3]}"


@pytest.mark.parametrize("split", _SPLITS, ids=[f"{m}{k}" for m, k in _SPLITS])
def test_stateful_counts_last_update_wins(spark, split, split_dirs,
                                          one_file_per_batch):
    """Update-mode sink holds one row per (user, batch-it-changed-in);
    the LAST (== max, the counter is monotone) per user is the answer."""
    from dask_hivemetastore_spark import plans
    from dask_hivemetastore_spark.catalog import load_table
    from pyspark.sql import functions as F

    sink = plans.QUERIES["stream_stateful_counts"](spark, split_dirs[split])
    got = {
        r.user_id: r.m
        for r in sink.groupBy("user_id").agg(F.max("n_events").alias("m")).collect()
    }
    exact = {
        r.user_id: r.n
        for r in load_table(spark, split_dirs[split], "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == exact


def _sessionize_final_state(sink: pd.DataFrame) -> set[tuple]:
    """Reconstruct the final upsert-sink state from the update-mode
    emission history by SEQUENTIAL upsert — the documented sink
    contract (operator docstring): rows arrive in batch order (the
    memory sink appends committed batches in sequence, and toPandas
    preserves it); a real row updates its (user_id, session_start) key,
    a tombstone (NULL n_events) deletes it. Within one batch a key never
    receives both — the operator suppresses tombstones for start strings
    that still have a live component — so intra-batch row order is
    immaterial."""
    state: dict[tuple, tuple] = {}
    for r in sink.itertuples(index=False):
        key = (r.user_id, r.session_start)
        if pd.isna(r.n_events):
            state.pop(key, None)
        else:
            state[key] = (r.n_events, r.total_value)
    return {(u, s, n, tv) for (u, s), (n, tv) in state.items()}


@pytest.mark.parametrize("split", _SPLITS + [("random", 7)],
                         ids=["ordered3", "ordered5", "random4", "random7"])
def test_sessionize_batching_exact(spark, split, split_dirs,
                                   one_file_per_batch, tmp_path_factory):
    """Sessions spanning micro-batch boundaries must merge through state
    — in EVERY arrival order (r11: the component-set sessionizer made
    random splits in-contract; VERDICT r10 #5). The reconstructed final
    sink state equals the single-batch gaps-and-islands answer exactly,
    tombstones excluded."""
    from dask_hivemetastore_spark import plans

    if split not in split_dirs:
        d = tmp_path_factory.mktemp(f"split_{split[0]}_{split[1]}b")
        _split_events(str(d), split[1], split[0], seed=23)
        split_dirs = {**split_dirs, split: str(d)}

    base = plans.QUERIES["stream_sessionize"](spark, SF_SMOKE).toPandas()
    assert not base["n_events"].isna().any()  # single batch: no tombstones
    base_set = set(map(tuple, base.itertuples(index=False, name=None)))

    sink = plans.QUERIES["stream_sessionize"](
        spark, split_dirs[split]
    ).toPandas()
    assert _sessionize_final_state(sink) == base_set, split


@pytest.mark.parametrize("split", [("ordered", 5), ("random", 4)],
                         ids=["ordered5", "random4"])
def test_dedup_users_within_watermark_contract(spark, split, split_dirs,
                                               one_file_per_batch):
    """dropDuplicatesWithinWatermark guarantees NO duplicates within the
    watermark delay — duplicates farther apart may legitimately re-emit
    once their first occurrence's state was evicted. Invariant under any
    batching: the distinct output ids are exactly the distinct input ids
    (nothing lost, nothing invented)."""
    from dask_hivemetastore_spark import plans
    from dask_hivemetastore_spark.catalog import load_table

    sink = plans.QUERIES["stream_dedup_users"](spark, split_dirs[split])
    got = {r.user_id for r in sink.collect()}
    exact = {
        r.user_id
        for r in load_table(spark, split_dirs[split], "events")
        .select("user_id")
        .distinct()
        .collect()
    }
    assert got == exact
