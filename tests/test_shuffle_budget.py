"""Quantitative plan-regression gate: shuffle volume (VERDICT r7 #4).

The plan audit greps operator trees; it cannot see a 10× shuffle-volume
regression that keeps the same operators (a filter no longer pushed below
an exchange, a projection widened before a shuffle). This gate replays the
20 heaviest-shuffling registry queries at sf0.01 and compares executed-plan
shuffle bytes/records against the committed snapshot at ±50%; the exchange
COUNT must match exactly.

If a failure is a deliberate plan change, re-run
``python scripts/make_shuffle_snapshot.py`` and commit the diff with the
explanation; an unexplained move is the regression this exists to catch.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(_HERE), "scripts"))

SNAPSHOT = os.path.join(_HERE, "shuffle_snapshot.json")


def _load():
    with open(SNAPSHOT) as f:
        return json.load(f)


_SNAP = _load()


@pytest.mark.parametrize("key", sorted(_SNAP["queries"]))
def test_shuffle_volume_pinned(key, spark):
    from plan_metrics import shuffle_profile

    from dask_hivemetastore_spark import plans

    assert (
        int(spark.conf.get("spark.sql.shuffle.partitions"))
        == _SNAP["shuffle_partitions"]
    ), "snapshot was recorded under a different shuffle partition count"

    got = shuffle_profile(plans.QUERIES[key](spark, _SNAP["sf_dir"]))
    want = _SNAP["queries"][key]

    assert got["n_shuffles"] == want["n_shuffles"], (
        f"{key}: exchange count moved {want['n_shuffles']} -> "
        f"{got['n_shuffles']} — a plan-shape change; inspect .explain() "
        "and re-snapshot only if deliberate"
    )
    for m in ("shuffle_bytes", "shuffle_records"):
        lo, hi = want[m] * 0.5, want[m] * 1.5
        assert lo <= got[m] <= hi, (
            f"{key}: {m} moved {want[m]} -> {got[m]} "
            f"(allowed ±50%); if deliberate, re-run "
            "scripts/make_shuffle_snapshot.py and commit the diff"
        )
