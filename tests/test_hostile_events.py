"""Adversarial EVENTS corpus over the time/window/JSON operators (r8).

The documents hostile corpus (test_hostile_corpus.py) targeted text
edges; this one targets the classes that live in ``events``: window
boundary semantics (an event at exactly :00:00.000000, ±1µs around it),
session-gap-exactly-equal arrivals, as-of/range-join ties (duplicate
timestamps on both sides of a join), duplicate (user, ts) rows, and
hostile JSON in ``props`` (malformed, empty, NULL, nested, arrays,
duplicate keys, string-typed numbers, huge integers). Every registered
events-family query replays against its registered DuckDB oracle on
this corpus — inclusive/exclusive disagreements and JSON semantic gaps
become visible row diffs.

Values are kept ≤1e6 with few rows per aggregation group, so double
SUM reassociation stays far below the ROUND(,2) grain — any failure
here is semantic, not float-order.
"""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pytest

from .oracle_harness import compare

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(h: int, m: int = 0, s: int = 0, us: int = 0) -> dt.datetime:
    return _T0 + dt.timedelta(hours=h, minutes=m, seconds=s, microseconds=us)


# (ts, user_id, event_type, value, props)
_ROWS: list[tuple] = [
    # --- hour-boundary cluster (user 1): exact boundary, ±1µs ---
    (_ts(0, 59, 59, 999999), 1, "click",    1.0,    '{"k": 87}'),
    (_ts(1, 0, 0, 0),        1, "view",     0.125,  '{"k": 0}'),
    (_ts(1, 0, 0, 1),        1, "click",    -0.125, '{"k": 12}'),
    (_ts(1, 15),             1, "purchase", 2.675,  '{"k": 3}'),
    (_ts(1, 30),             1, "click",    0.0,    '{"k": 4}'),
    # --- session-gap exactness (user 2): gap == 30min and 30min+1µs ---
    (_ts(2, 0),              2, "click",    5.0,    '{"k": 1}'),
    (_ts(2, 30, 0, 0),       2, "view",     6.0,    '{"k": 2}'),
    (_ts(3, 0, 0, 1),        2, "click",    7.0,    '{"k": 3}'),
    (_ts(3, 10),             2, "signup",   8.0,    '{"k": 4}'),
    # --- as-of ties (user 3): purchase and click at the SAME instant,
    # --- plus a duplicate-ts purchase pair (right-side tie) ---
    (_ts(4, 0),              3, "purchase", 10.0,   '{"k": 5}'),
    (_ts(4, 0),              3, "click",    11.0,   '{"k": 6}'),
    (_ts(4, 5),              3, "purchase", 12.0,   '{"k": 7}'),
    (_ts(4, 5),              3, "purchase", 13.0,   '{"k": 8}'),
    (_ts(4, 6),              3, "click",    14.0,   '{"k": 9}'),
    (_ts(4, 10, 0, 0),       3, "click",    15.0,   '{"k": 10}'),
    # exactly at the 5-minute range-join edge (ts <= p.ts + 5min)
    (_ts(4, 15),             3, "view",     16.0,   '{"k": 11}'),
    # --- same ts across users (4 and 5) + duplicate (user, ts) rows ---
    (_ts(5, 0),              4, "signup",   20.0,   '{"k": 12}'),
    (_ts(5, 0),              5, "signup",   21.0,   '{"k": 13}'),
    (_ts(5, 1),              4, "purchase", 22.0,   '{"k": 14}'),
    (_ts(5, 1),              4, "purchase", 23.0,   '{"k": 15}'),
    (_ts(5, 9),              5, "purchase", 24.0,   '{"k": 16}'),
    # funnel boundary: purchase exactly 10 minutes after signup
    (_ts(5, 10),             4, "view",     25.0,   '{"k": 17}'),
    # --- hostile JSON (user 1, quiet hours so aggregates stay simple) ---
    (_ts(8, 0),              1, "click",    1.5,    "{}"),
    (_ts(8, 1),              1, "click",    1.5,    ""),
    (_ts(8, 2),              1, "click",    1.5,    None),
    (_ts(8, 3),              1, "click",    1.5,    "{k:1}"),          # bad
    (_ts(8, 4),              1, "click",    1.5,    '{"k": "7"}'),     # str
    (_ts(8, 5),              1, "click",    1.5,    '{"k": {"a": 1}}'),
    (_ts(8, 6),              1, "click",    1.5,    '{"k": [1, 2]}'),
    (_ts(8, 7),              1, "click",    1.5,    '{"k": 1, "k": 2}'),
    (_ts(8, 8),              1, "click",    1.5,    '{"K": 5}'),       # case
    (_ts(8, 9),              1, "click",    1.5,    '{"k": null}'),
    (_ts(8, 10),             1, "click",    1.5,    ' {"k": 30} '),
    (_ts(8, 11),             1, "click",    1.5,    '{"k": -0}'),
    # uint64-range integer (2^63 < v < 2^64): DuckDB json-types it
    # UBIGINT; Spark's bigint cannot hold it (from_json nulls the map,
    # try_cast nulls the scalar) — r8 review found this class untested
    (_ts(8, 12),             1, "click",    1.5,
     '{"k": 12345678901234567890}'),
    # --- dynamic-gap boundaries (user 6): next event EXACTLY at the
    # --- 15-min click gap, then EXACTLY at the 45-min purchase gap —
    # --- session_window merges touching windows in both cases ---
    (_ts(10, 0),             6, "click",    30.0,   '{"k": 20}'),
    (_ts(10, 15),            6, "view",     31.0,   '{"k": 21}'),
    (_ts(11, 0),             6, "purchase", 32.0,   '{"k": 22}'),
    (_ts(11, 45),            6, "view",     33.0,   '{"k": 23}'),
    (_ts(11, 45, 0, 1),      6, "error",    34.0,   '{"k": 24}'),
    # --- an isolated event days later (gapfill spine stress: big gap) ---
    (_ts(72, 0),             5, "error",    -3.25,  '{"k": 40}'),
    # --- NULL scalars (r8 round-end probe: no registered query crashes
    # --- on them; this pins that the ANSWERS agree too). NULL ts forms
    # --- its own window/sort group; NULL value is skipped by SUM/AVG;
    # --- NULL user_id is its own session/partition key. ---
    (None,                   1, "view",     2.0,    '{"k": 41}'),
    (_ts(9, 0),              1, "click",    None,   '{"k": 42}'),
    (_ts(9, 5),              None, "view",  4.0,    '{"k": 43}'),
]

_KEYS = [
    "events_tumbling_1h",
    "events_sliding",
    "events_sessionize",
    "sessionize_dynamic_gap",
    "stream_sessionize",
    "events_date_parts",
    "json_extract_props",
    "map_funcs_props",
    "variant_extract_props",
    "range_join_events",
    "range_join_banded",
    "interval_overlap_pairs",
    "asof_join_events",
    "asof_join_tolerance",
    "events_hourly_gapfill",
    "funnel_signup_purchase",
    "scd2_user_event_intervals",
    "interpolate_hourly_events",
    "interval_user_span",
    "lag_lead_events",
    "rolling_avg_value",
    "rolling_1h_events",
    "distinct_users",
    "value_counts_events",
    # r11 (r10 advisor): the sketch/partial-state aggregate keys over
    # events were never replayed on this corpus — the NULL-ts row is
    # exactly what diverges hll_sketch_merge's n_sketches_merged (engine
    # keeps to_date(ts)=NULL as a real per-day sketch group; COUNT
    # (DISTINCT ...) skips it).
    "hll_sketch_merge",
    "approx_distinct_users",
    "incremental_agg_merge",
]


def write_hostile_events(dirpath) -> None:
    """Write the hostile corpus as ``events.parquet`` under ``dirpath`` —
    the ONE corpus builder (the operator fuzzers reuse it; a private copy
    with non-nullable dtypes broke the moment NULL rows were added).
    Nullable Int64/Float64 on purpose: plain int64 can't hold None and
    plain float64 turns None into NaN, which parquet stores as a NaN
    VALUE, not a NULL."""
    pdf = pd.DataFrame(
        {
            "event_id": pd.array(range(len(_ROWS)), dtype="int64"),
            "ts": pd.array([r[0] for r in _ROWS], dtype="datetime64[us]"),
            "user_id": pd.array([r[1] for r in _ROWS], dtype="Int64"),
            "event_type": [r[2] for r in _ROWS],
            "value": pd.array([r[3] for r in _ROWS], dtype="Float64"),
            "props": pd.array([r[4] for r in _ROWS], dtype="object"),
        }
    )
    pdf.to_parquet(os.path.join(str(dirpath), "events.parquet"), index=False)


@pytest.fixture(scope="module")
def hostile_events_dir(tmp_path_factory) -> str:
    from .conftest import SF_SMOKE

    d = tmp_path_factory.mktemp("hostile_events_sf")
    write_hostile_events(d)
    for f in os.listdir(SF_SMOKE):
        if f != "events.parquet":
            os.symlink(os.path.join(SF_SMOKE, f), d / f)
    return str(d)


@pytest.fixture(scope="module")
def hostile_events_duck(hostile_events_dir):
    import duckdb

    from dask_hivemetastore_spark.catalog import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{hostile_events_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", _KEYS)
def test_hostile_events_parity(key, spark, hostile_events_dir,
                               hostile_events_duck):
    from dask_hivemetastore_spark import plans

    sdf = plans.QUERIES[key](spark, hostile_events_dir)
    problems = compare(key, sdf, hostile_events_duck.sql(plans.ORACLES[key]))
    assert not problems, "\n".join(problems)
