#!/usr/bin/env python
"""Dump .explain("formatted") for named registry keys to plans/<tag>/.

Usage: python scripts/dump_plans.py <tag> <suffix> key1 key2 ...
Writes plans/<tag>/<key>_<suffix>.txt for each key (repo-relative).
The r17 optimization round commits these as the judge-checkable record
of each touched query's plan shape before/after (guide §1/§7.2).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag, suffix, keys = sys.argv[1], sys.argv[2], sys.argv[3:]

    from dask_hivemetastore_spark import plans
    from dask_hivemetastore_spark.session import get_spark

    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(root, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    for key in keys:
        fn = plans.QUERIES.get(key)
        if fn is None:
            print(f"SKIP unknown key {key}")
            continue
        try:
            df = fn(spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted")
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"ERROR: {exc!r}"
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
