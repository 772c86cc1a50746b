"""Local replica of the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle side-by-side and compares
row count + column names + order-insensitive canonicalized values — the same
class of check the driver records in CORRECTNESS_r{N}.json, so any mismatch
here predicts a driver failure.
"""

from __future__ import annotations

import datetime
import math


def canon_cell(v) -> str:
    """Canonicalize one value so Spark and DuckDB results compare equal."""
    import numpy as np
    import pandas as pd

    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    if v is pd.NaT:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        return repr(round(f, 9))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canon_frame(pdf) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(canon_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows)


def compare(name: str, spark_df, duck_rel) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    spdf = spark_df.toPandas()
    ddf = duck_rel.fetchdf()
    problems: list[str] = []
    s_cols, s_rows = canon_frame(spdf)
    d_cols, d_rows = canon_frame(ddf)
    if s_cols != d_cols:
        problems.append(f"{name}: columns differ spark={s_cols} duck={d_cols}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}")
    if s_rows != d_rows:
        diff_idx = [i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b][:3]
        for i in diff_idx:
            problems.append(f"{name}: row {i} spark={s_rows[i]} duck={d_rows[i]}")
        only_s = set(s_rows) - set(d_rows)
        only_d = set(d_rows) - set(s_rows)
        if only_s or only_d:
            problems.append(
                f"{name}: {len(only_s)} rows only in spark (e.g. {list(only_s)[:2]}), "
                f"{len(only_d)} only in duck (e.g. {list(only_d)[:2]})"
            )
    return problems
