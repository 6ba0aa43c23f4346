#!/usr/bin/env python
"""Freeze the current BENCH_FULL.json per-query timings as regression
budgets (round-6 verdict item 2: 'freeze medians as budgets in a
check; any headliner >1.5x its recorded median at matching calib
fails').

Usage:
    python tools/pin_budgets.py            # pin from BENCH_FULL.json
    python tools/pin_budgets.py a.json b.json ...
                                           # pin per-query MEDIANS
                                           # across several full runs

Writes tools/bench_budgets.json: {"cpu_calib_sec": ..., "budgets":
{query: sec}}. bench.py's check_budgets() consumes it on every run and
reports the violation count in the driver-visible summary line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def main(paths: list[str]) -> None:
    if not paths:
        paths = [os.path.join(ROOT, "BENCH_FULL.json")]
    runs = []
    for p in paths:
        with open(p) as fh:
            runs.append(json.load(fh))
    names = sorted({n for r in runs for n in r["queries"]})
    budgets = {
        n: round(
            statistics.median(
                [r["queries"][n] for r in runs if n in r["queries"]]
            ),
            3,
        )
        for n in names
    }
    out = {
        "pinned_from": [os.path.basename(p) for p in paths],
        "cpu_calib_sec": round(
            statistics.median([r["cpu_calib_sec"] for r in runs]), 4
        ),
        # Fixed per-job Spark scheduling overhead: the fastest pinned
        # query is essentially a pure noop job whose wall is all
        # scheduling floor. check_budgets() scales only the portion of
        # each budget ABOVE this with the CPU-calib ratio — the floor
        # does not vary with single-thread CPU speed.
        "overhead_sec": min(budgets.values()),
        "budgets": budgets,
    }
    dest = os.path.join(HERE, "bench_budgets.json")
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"pinned {len(budgets)} budgets -> {dest}")


if __name__ == "__main__":
    main(sys.argv[1:])
