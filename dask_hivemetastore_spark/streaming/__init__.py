"""Structured Streaming surface (SURVEY.md §2-I) — see :mod:`.pipeline`."""

from .pipeline import (  # noqa: F401
    read_events_stream,
    run_to_memory,
    stream_dedup_users,
    stream_stateful_counts,
    stream_tumbling_1h,
)
