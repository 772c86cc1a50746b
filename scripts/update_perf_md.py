#!/usr/bin/env python
"""Regenerate PERF.md's sweep table from PERF_sweep.json (+ prev round).

Keeps everything above the `| query |` table header, replaces the table.
Run after scripts/perf_sweep.py.

Usage:
    python scripts/update_perf_md.py [--prev PERF_rN.json]
                                     [--cur-label r6] [--prev-label r5]

Without --prev, the most recent PERF_r*.json (highest round number) is
used as the baseline, and the labels are derived from it (prev = rN,
cur = rN+1) — no hand-editing between rounds.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_prev() -> str:
    cands = glob.glob(os.path.join(ROOT, "PERF_r*.json"))
    if not cands:
        raise SystemExit("no PERF_r*.json baseline found; pass --prev")

    def roundno(p: str) -> int:
        m = re.search(r"PERF_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    return max(cands, key=roundno)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prev", default=None,
                    help="previous-round sweep JSON (default: latest PERF_r*.json)")
    ap.add_argument("--cur-label", default=None)
    ap.add_argument("--prev-label", default=None)
    args = ap.parse_args()

    prev_path = args.prev or _latest_prev()
    m = re.search(r"PERF_r(\d+)\.json$", os.path.basename(prev_path))
    prev_label = args.prev_label or (f"r{m.group(1)}" if m else "prev")
    cur_label = args.cur_label or (f"r{int(m.group(1)) + 1}" if m else "cur")

    cur = json.load(open(os.path.join(ROOT, "PERF_sweep.json")))["queries"]
    prev = json.load(open(prev_path))["queries"]

    with open(os.path.join(ROOT, "PERF.md")) as f:
        lines = f.readlines()
    head_idx = next(i for i, l in enumerate(lines) if l.startswith("| query |"))
    # preserve any prose AFTER the table too (r7: the regeneration used to
    # truncate at the header and silently dropped trailing spot-check
    # sections) — the table ends at the first non-`|` line after it
    tail_idx = head_idx
    while tail_idx < len(lines) and (
        lines[tail_idx].startswith("|") or not lines[tail_idx].strip()
    ):
        tail_idx += 1
    out = lines[:head_idx]
    out.append(f"| query | {cur_label} s | {prev_label} s | Δ |\n")
    out.append("|---|---:|---:|---:|\n")
    for k in sorted(cur, key=cur.get, reverse=True):
        if k in prev and prev[k] > 0:
            out.append(
                f"| {k} | {cur[k]:.2f} | {prev[k]:.2f} |"
                f" {cur[k] / prev[k]:.1f}× |\n"
            )
        else:
            out.append(f"| {k} | {cur[k]:.2f} | — | new |\n")
    if tail_idx < len(lines):
        out.append("\n")
        out.extend(lines[tail_idx:])
    with open(os.path.join(ROOT, "PERF.md"), "w") as f:
        f.writelines(out)
    print(f"wrote {len(cur)} rows vs {os.path.basename(prev_path)} "
          f"({prev_label} -> {cur_label})")


if __name__ == "__main__":
    main()
