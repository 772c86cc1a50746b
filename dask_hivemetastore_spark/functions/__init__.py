"""Public scalar/column-function API (the reference ecosystem's accessor
surface — pandas ``.str`` / ``.dt`` / ufuncs — maps 1:1 onto
``pyspark.sql.functions``, SURVEY.md §2-H, so this package is mostly a
curated façade: the few functions we *add* live with their operator family
and are re-exported here as the stable import point).

>>> from dask_hivemetastore_spark.functions import dot_f64, with_word_ngrams
"""

from __future__ import annotations

from ..operators.dedup import with_word_ngrams  # noqa: F401
from ..operators.similarity import ORACLE_DOT, dot_f64  # noqa: F401
from ..operators.text import (  # noqa: F401
    lang_id,
    lang_id_oracle_expr,
    quality_features,
    token_counts,
)

__all__ = [
    "ORACLE_DOT",
    "dot_f64",
    "lang_id",
    "lang_id_oracle_expr",
    "quality_features",
    "token_counts",
    "with_word_ngrams",
]
