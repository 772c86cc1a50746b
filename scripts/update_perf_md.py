#!/usr/bin/env python
"""Regenerate PERF.md's sweep table from PERF_sweep.json (+ prev round).

Keeps everything above the `| query |` table header, replaces the table.
Run after scripts/perf_sweep.py.
"""

from __future__ import annotations

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    cur = json.load(open(os.path.join(ROOT, "PERF_sweep.json")))["queries"]
    prev = json.load(open(os.path.join(ROOT, "PERF_r4.json")))["queries"]

    with open(os.path.join(ROOT, "PERF.md")) as f:
        lines = f.readlines()
    head_idx = next(i for i, l in enumerate(lines) if l.startswith("| query |"))
    out = lines[:head_idx]
    out.append("| query | r5 s | r4 s | Δ |\n")
    out.append("|---|---:|---:|---:|\n")
    for k in sorted(cur, key=cur.get, reverse=True):
        if k in prev and prev[k] > 0:
            out.append(
                f"| {k} | {cur[k]:.2f} | {prev[k]:.2f} |"
                f" {cur[k] / prev[k]:.1f}× |\n"
            )
        else:
            out.append(f"| {k} | {cur[k]:.2f} | — | new |\n")
    with open(os.path.join(ROOT, "PERF.md"), "w") as f:
        f.writelines(out)
    print(f"wrote {len(cur)} rows")


if __name__ == "__main__":
    main()
