"""Public scalar/column-function API (the reference ecosystem's accessor
surface — pandas ``.str`` / ``.dt`` / ufuncs — maps 1:1 onto
``pyspark.sql.functions``, SURVEY.md §2-H, so this package is mostly a
curated façade: the few functions we *add* live with their operator family
and are re-exported here as the stable import point).

>>> from dask_hivemetastore_spark.functions import dot_f64, with_word_ngrams
"""

from __future__ import annotations

from ..operators.dedup import with_word_ngrams  # noqa: F401
from ..operators.similarity import (  # noqa: F401
    ORACLE_DOT,
    dot_f64,
    finite_vectors,
)
from ..operators.text import (  # noqa: F401
    lang_id,
    lang_id_oracle_expr,
    quality_features,
    token_counts,
)

__all__ = [
    "ORACLE_DOT",
    "dot_f64",
    "finite_vectors",
    "lang_id",
    "lang_id_oracle_expr",
    "quality_features",
    "token_counts",
    "with_word_ngrams",
    "sql_round",
]


def sql_round(x: float, digits: int = 2) -> float:
    """Round a double the way **Spark's** ``F.round`` does: round the
    SHORTEST DECIMAL REPR half-up (Spark goes through
    ``BigDecimal.valueOf(double)`` → HALF_UP), so ``3.674999…82`` reads as
    "3.675" and rounds to ``3.68``. Python's builtin ``round()`` uses the
    true binary value plus banker's ties (→ ``3.67``) — any Python-side
    operator (pandas UDF, stateful streaming fn) whose output is compared
    against an SQL twin must use THIS, not ``round()`` (r8 hostile-events
    find: the custom streaming sessionizer diverged from its oracle by
    exactly one cent).

    DuckDB (1.0.0) ``ROUND(double, n)`` does NOT share these semantics —
    it rounds the TRUE BINARY value, so ``ROUND(1.005, 2) = 1.00`` and
    ``ROUND(8194.925, 2) = 8194.92`` where Spark/this function give
    ``1.01``/``8194.93`` (~0.6% of random 3-decimal doubles diverge, r9
    advisor probe). When a DuckDB oracle must match a Spark-side round of
    a decimal-ish double, round via decimal in the oracle —
    ``ROUND(CAST(x AS DECIMAL(18,3)), 2)`` reproduces Spark's half-up on
    those edges — or avoid the cent edge entirely by comparing unrounded
    values."""
    import decimal

    q = decimal.Decimal(1).scaleb(-digits)
    return float(
        decimal.Decimal(repr(x)).quantize(q, rounding=decimal.ROUND_HALF_UP)
    )
