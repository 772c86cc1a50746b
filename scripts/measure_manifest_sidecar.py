#!/usr/bin/env python
"""Manifest centroid payload cost at a REALISTIC IVF shape (r14).

VERDICT r13 missing #2: the r13 manifest stored centroids as JSON inside
``_index_manifest/manifest.json``, parsed driver-side on every path-only
probe/append/drift check. At the fixture's 16x64 that is trivial; this
script measures the shape the design actually claims — **4096 cells x
768 dims** (a mid-size production IVF) — for the legacy inline format vs
the r14 parquet sidecar, on the three operations a serving path pays:

- ``config read`` — what a path-only append/drift check needs (config +
  drift stats, never the centroid matrix);
- ``centroid load`` — what a probe needs before ranking cells (r14:
  lazy parquet sidecar; legacy: it already paid the full JSON parse);
- ``manifest write`` — the one-time build/epoch-bump cost, plus the
  on-disk bytes of each format.

Invariant wired into the exit code: the sidecar round-trips the exact
centroid matrix (bit-identical float64), and a legacy inline manifest
still reads.

Usage: python scripts/measure_manifest_sidecar.py [--cells 4096]
       [--dim 768] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np
from pyspark.sql import SparkSession


def _best(n: int, fn) -> float:
    fn()  # warm rep
    return min(_timed(fn) for _ in range(n))


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=4096)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("measure-manifest-sidecar")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from dask_hivemetastore_spark.operators.similarity import (
        read_index_manifest,
        write_index_manifest,
    )

    rng = np.random.default_rng(42)
    C = rng.standard_normal((args.cells, args.dim))
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    base = {
        "kind": "ivf", "dim": args.dim, "n_cells": args.cells,
        "seed": 42, "vec_col": "embedding", "id_col": "vec_id",
        "drift": {"ref_mean": 0.42, "ref_sigma": 0.01,
                  "ref_max_share": 0.01, "n": 1_000_000},
    }
    out: dict = {"cells": args.cells, "dim": args.dim}

    with tempfile.TemporaryDirectory(prefix="manifest_ab_") as tmp:
        # ---- legacy inline-JSON format (the r13 layout) ----
        legacy = f"{tmp}/legacy"
        os.makedirs(f"{legacy}/_index_manifest")

        def write_legacy():
            payload = json.dumps(
                dict(base, centroids=C.tolist(), epoch=0), sort_keys=True
            )
            with open(f"{legacy}/_index_manifest/manifest.json", "w") as f:
                f.write(payload)

        out["legacy_write_s"] = round(_best(args.reps, write_legacy), 4)
        out["legacy_manifest_bytes"] = os.path.getsize(
            f"{legacy}/_index_manifest/manifest.json"
        )
        out["legacy_config_read_s"] = round(_best(
            args.reps, lambda: read_index_manifest(spark, legacy)["dim"]
        ), 4)
        out["legacy_centroid_load_s"] = round(_best(
            args.reps,
            lambda: np.asarray(
                read_index_manifest(spark, legacy)["centroids"],
                dtype=np.float64,
            ),
        ), 4)

        # ---- r14 sidecar format ----
        sidecar = f"{tmp}/sidecar"
        out["sidecar_write_s"] = round(_best(
            args.reps,
            lambda: write_index_manifest(
                spark, sidecar, dict(base, centroids=C.tolist())
            ),
        ), 4)
        out["sidecar_manifest_bytes"] = os.path.getsize(
            f"{sidecar}/_index_manifest/manifest.json"
        )
        # r17: sidecar generations are digest-named — resolve via the
        # manifest pointer instead of a fixed filename
        _raw = json.load(open(f"{sidecar}/_index_manifest/manifest.json"))
        out["sidecar_parquet_bytes"] = os.path.getsize(
            f"{sidecar}/{_raw['centroids_sidecar']}"
        )
        out["sidecar_config_read_s"] = round(_best(
            args.reps, lambda: read_index_manifest(spark, sidecar)["dim"]
        ), 4)
        out["sidecar_centroid_load_s"] = round(_best(
            args.reps,
            lambda: np.asarray(
                read_index_manifest(spark, sidecar)["centroids"],
                dtype=np.float64,
            ),
        ), 4)

        got = np.asarray(
            read_index_manifest(spark, sidecar)["centroids"],
            dtype=np.float64,
        )
        out["roundtrip_exact"] = bool(
            got.shape == C.shape and np.array_equal(got, C)
        )
        legacy_got = np.asarray(
            read_index_manifest(spark, legacy)["centroids"],
            dtype=np.float64,
        )
        out["legacy_still_reads"] = bool(np.allclose(legacy_got, C))

    out["config_read_speedup"] = round(
        out["legacy_config_read_s"] / max(out["sidecar_config_read_s"], 1e-9),
        1,
    )
    print(json.dumps(out))
    spark.stop()
    return 0 if (out["roundtrip_exact"] and out["legacy_still_reads"]) else 1


if __name__ == "__main__":
    sys.exit(main())
