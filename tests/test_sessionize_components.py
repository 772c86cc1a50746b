"""Unit-level fuzz of the r11 component-set sessionizer (no Spark).

``_sessionize_fn`` became order-independent in r11 (VERDICT r10 #5):
state is the user's set of gap-components and insertion merges
intervals, so ANY partition of the event multiset into micro-batches, in
ANY batch order, must converge to the gaps-and-islands answer. The Spark
integration is covered by tests/test_stream_batching.py on the real
fixture; this file drives the FUNCTION directly with a FakeState across
seeded random corpora — thousands of (event-set, batching) combinations
the 0.001-SF fixture can't reach — and checks three things:

1. reconstructed final state (max-n emission per start, tombstones
   excluded) == an independent sorted-scan gaps-and-islands twin,
   including exact-gap merges and NULL-value SUM semantics;
2. tombstones are emitted exactly for starts that vanish, and no
   vanished start ever reappears;
3. the watermark eviction path seals only components that can no longer
   change and never drops a live one.
"""

from __future__ import annotations

import math
import random

import pandas as pd
import pytest

from dask_hivemetastore_spark.streaming.pipeline import _GAP_US, _sessionize_fn

_US = 1_000_000
_T0 = 1_700_000_000 * _US


class FakeState:
    def __init__(self, watermark_ms: int | None = None):
        self.exists = False
        self._val = None
        self._wm = watermark_ms

    @property
    def get(self):
        return self._val

    def update(self, v):
        self._val = tuple(list(c) for c in v)
        self.exists = True

    def remove(self):
        self._val = None
        self.exists = False

    def getCurrentWatermarkMs(self):
        if self._wm is None:
            raise RuntimeError("no watermark configured")
        return self._wm


def _batch_df(rows: list[tuple[int, float | None]]) -> pd.DataFrame:
    # model the REAL Arrow conversion: a NULL DoubleType cell reaches the
    # pandas batch as float NaN, never Python None
    return pd.DataFrame(
        {
            "ts": pd.Series(
                [pd.Timestamp(t, unit="us") for t, _ in rows],
                dtype="datetime64[us]",
            ),
            "value": pd.Series(
                [math.nan if v is None else v for _, v in rows],
                dtype="float64",
            ),
        }
    )


def _run_batches(batches, state=None):
    """Feed batches through _sessionize_fn, return (emissions, state)."""
    state = state or FakeState()
    emissions = []
    for rows in batches:
        (out,) = list(_sessionize_fn((1,), [_batch_df(rows)], state))
        emissions.append(out)
    return pd.concat(emissions, ignore_index=True), state


def _twin(rows: list[tuple[int, float | None]]) -> set[tuple]:
    """Independent gaps-and-islands: sorted scan, >gap splits."""
    rows = sorted(rows, key=lambda r: r[0])
    sessions = []
    for t, v in rows:
        if sessions and t - sessions[-1][1] <= _GAP_US:
            s = sessions[-1]
            s[1] = max(s[1], t)
            s[2] += 1
            if v is not None:
                s[3] = v if s[3] is None else s[3] + v
        else:
            sessions.append([t, t, 1, v])
    out = set()
    for st, _la, n, sm in sessions:
        key = pd.Timestamp(st, unit="us").strftime("%Y-%m-%d %H:%M:%S")
        out.add((key, n, None if sm is None else round(sm, 2)))
    return out


def _final_from_emissions(em: pd.DataFrame) -> set[tuple]:
    """Sequential upsert fold — the sink contract: rows arrive in batch
    order (concat preserves it); a real row UPDATES its session_start
    key, a tombstone DELETES it. Within one batch a key never receives
    both (the operator suppresses tombstones for strings with a live
    component), so intra-batch order doesn't matter."""
    sink: dict[str, tuple] = {}
    for r in em.itertuples(index=False):
        if r.n_events is None or (isinstance(r.n_events, float)
                                  and math.isnan(r.n_events)):
            sink.pop(r.session_start, None)
        else:
            tv = r.total_value
            sink[r.session_start] = (
                int(r.n_events),
                None if tv is None or (isinstance(tv, float)
                                       and math.isnan(tv)) else tv,
            )
    return {(s, n, tv) for s, (n, tv) in sink.items()}


@pytest.mark.parametrize("seed", range(12))
def test_random_batching_converges_to_twin(seed):
    rng = random.Random(seed)
    n = rng.randint(1, 60)
    # timestamps clustered so gaps straddle the 30-min boundary often;
    # ~1/8 NULL values; duplicates allowed
    rows = []
    t = _T0
    for _ in range(n):
        t += rng.choice([0, 1, 5 * 60 * _US, 25 * 60 * _US, _GAP_US,
                         _GAP_US + 1, 2 * _GAP_US + 7])
        rows.append((t, None if rng.random() < 0.125 else
                     round(rng.uniform(-5, 5), 2)))
    order = rows[:]
    rng.shuffle(order)
    k = rng.randint(1, min(6, n))
    cuts = sorted(rng.sample(range(1, n), k - 1)) if n > 1 and k > 1 else []
    bounds = [0, *cuts, n]
    batches = [order[bounds[i]:bounds[i + 1]] for i in range(len(bounds) - 1)]

    em, _ = _run_batches(batches)
    assert _final_from_emissions(em) == _twin(rows), (seed, batches)


def test_exact_gap_merges_across_batches_any_order():
    """last+gap arrivals coalesce (strict >) even when the bridging event
    arrives FIRST."""
    a, b, c = _T0, _T0 + _GAP_US, _T0 + 2 * _GAP_US
    for batches in ([[(b, 1.0)], [(a, 1.0)], [(c, 1.0)]],
                    [[(c, 1.0)], [(a, 1.0)], [(b, 1.0)]],
                    [[(a, 1.0), (c, 1.0)], [(b, 1.0)]]):
        em, _ = _run_batches(batches)
        assert _final_from_emissions(em) == _twin([(a, 1.0), (b, 1.0), (c, 1.0)])


def test_tombstone_exactly_when_start_vanishes():
    late_first = [[(_T0 + 40 * 60 * _US, 2.0)], [(_T0, 1.0)]]
    em, _ = _run_batches(late_first)
    # batch1 opens a session at T0+40min; batch2's earlier event is NOT
    # within gap (40min > 30min) -> two sessions, no tombstone
    assert em["n_events"].isna().sum() == 0

    bridge = [[(_T0 + 20 * 60 * _US, 2.0)], [(_T0, 1.0)]]
    em, _ = _run_batches(bridge)
    # batch2's earlier event absorbs the session -> old start tombstoned
    dead = em.loc[em["n_events"].isna(), "session_start"].tolist()
    assert dead == [pd.Timestamp(_T0 + 20 * 60 * _US, unit="us")
                    .strftime("%Y-%m-%d %H:%M:%S")]
    final = _final_from_emissions(em)
    assert final == _twin([(_T0, 1.0), (_T0 + 20 * 60 * _US, 2.0)])


def test_watermark_eviction_seals_only_dead_components():
    st = FakeState(watermark_ms=0)
    # batch 1: two sessions, far apart
    old_t, new_t = _T0, _T0 + 10 * 3600 * _US
    (out1,) = list(_sessionize_fn((1,), [_batch_df([(old_t, 1.0),
                                                    (new_t, 2.0)])], st))
    assert len(st.get[0]) == 2
    # watermark passes old session's last+gap -> evicted; newer survives
    st._wm = (old_t + _GAP_US) // 1000 + 1
    (out2,) = list(_sessionize_fn((1,), [_batch_df([(new_t + 60 * _US,
                                                     3.0)])], st))
    assert st.get[0] == [new_t]
    # eviction is silent (no tombstone): the old session's last emission
    # stands as final
    assert out2["n_events"].isna().sum() == 0
    em = pd.concat([out1, out2], ignore_index=True)
    assert _final_from_emissions(em) == _twin(
        [(old_t, 1.0), (new_t, 2.0), (new_t + 60 * _US, 3.0)]
    )


def test_all_null_values_session_emits_null_total():
    em, _ = _run_batches([[(_T0, None)], [(_T0 + 60 * _US, None)]])
    final = _final_from_emissions(em)
    assert final == {(pd.Timestamp(_T0, unit="us")
                      .strftime("%Y-%m-%d %H:%M:%S"), 2, None)}


def test_untouched_nan_sum_component_not_reemitted():
    """r12 ADVICE fix: change detection must be NaN-aware. A sealed
    all-NULL-value component (sum = NaN) that a later batch does NOT
    touch must produce ZERO emissions in that batch — the pre-fix tuple
    compare saw ``nan != nan`` and re-emitted it every batch, breaking
    the changed/new-components-only update-mode contract."""
    far = _T0 + 10 * 3600 * _US  # hours away — can't merge with _T0
    state = FakeState()
    (out1,) = list(_sessionize_fn((1,), [_batch_df([(_T0, None)])], state))
    assert len(out1) == 1  # the new NaN-sum component emits once
    (out2,) = list(_sessionize_fn((1,), [_batch_df([(far, 5.0)])], state))
    # only the NEW component may emit; the untouched NaN-sum one must not
    emitted_starts = set(out2["session_start"])
    assert emitted_starts == {
        pd.Timestamp(far, unit="us").strftime("%Y-%m-%d %H:%M:%S")
    }
    # and the final sink state is still exact
    em = pd.concat([out1, out2], ignore_index=True)
    assert _final_from_emissions(em) == _twin([(_T0, None), (far, 5.0)])
