"""Registry mapping query keys → (Spark callable, DuckDB oracle SQL).

Contract (driver's ``__spark_entry__`` protocol):

- each callable: ``(spark, sf_dir) -> DataFrame``;
- the oracle SQL runs in DuckDB against pre-registered views named
  ``region nation customer supplier part orders lineitem events documents
  embeddings``;
- row-count + schema + order-insensitive value-hash must match, so every
  computed column is aliased identically on both sides, float aggregates are
  ROUNDed on both sides, and timestamps are µs-truncated on both sides
  (SURVEY.md §5.2).

Queries whose results are non-deterministic across engines by construction
(approx sketches, LSH candidates) register with ``oracle=None`` → the driver
records a weaker rows-only check.

Output-shape discipline (r7, learned from ``embedding_group_centroid``):
NO top-level array/map/struct column in a registered query's result. The
driver's canonicalizer ``sort_values`` the raw result columns before
hashing and cannot sort list cells (``TypeError: unhashable type: 'list'``
— the only red driver row across r1–r6). Explode to one scalar row per
element, or serialize with ``concat_ws`` on BOTH sides, before returning.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query and (optionally) its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            if "--" in oracle:
                # oracle text is flattened to one line; a `--` comment would
                # swallow the rest of the query
                raise ValueError(f"SQL line comment in oracle for {name!r}")
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco
