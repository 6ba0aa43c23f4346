"""Refresh epl_cas_etl_2026_spark/plans/gate_ledger.json from recorded
facts. Run at ROUND START, before editing any plan, so each query's
working-tree source still equals the source the driver just gated.

What it does:
- records a fingerprint (plan source + oracle SQL) for every query that
  is hash-green in the latest CORRECTNESS round; keeps the previously
  recorded fingerprint for queries whose last green row is older (their
  gated source may predate the tree — never overwrite history with the
  present);
- drops fingerprints named via --assume-changed (for backfilling known
  plan changes that happened after a query's last green row);
- pins the current testdata fingerprint, bumping the data-generation id
  when the parquet files changed since the last ledger (which expires
  all prior-generation green rows via the policy's priority 2);
- maps every CORRECTNESS round file to the data generation it ran on
  (new rounds default to the current generation).

Usage: python tools/update_gate_ledger.py [--assume-changed a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epl_cas_etl_2026_spark.plans import ORACLES, QUERIES
from epl_cas_etl_2026_spark.plans.gate_policy import (
    LEDGER_PATH,
    _is_green,
    fingerprint_query,
    load_correctness_rounds,
    load_ledger,
    testdata_fingerprint,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--assume-changed",
        default="",
        help="comma-separated query names whose plans changed after "
        "their last green row (fingerprints dropped → re-gate)",
    )
    args = ap.parse_args()
    assume_changed = {s for s in args.assume_changed.split(",") if s}

    ledger = load_ledger()
    rounds = load_correctness_rounds()
    if not rounds:
        raise SystemExit("no CORRECTNESS_r*.json found — nothing to record")
    latest = max(rounds)

    current_fp = testdata_fingerprint()
    current_gen = ledger.get("current_data_gen", "g2")
    if ledger.get("testdata_fingerprint") not in (None, current_fp):
        current_gen = f"g{int(current_gen.lstrip('g')) + 1}"
        print(f"testdata changed → data generation bumped to {current_gen}")

    gen_by_round = dict(ledger.get("data_gen_by_round", {}))
    for r in rounds:
        gen_by_round.setdefault(str(r), current_gen)

    fingerprints = dict(ledger.get("fingerprints", {}))
    for name in assume_changed:
        fingerprints.pop(name, None)
    refreshed = 0
    for name, row in rounds[latest].items():
        if name in QUERIES and _is_green(row, name in ORACLES):
            fingerprints[name] = fingerprint_query(
                QUERIES[name], ORACLES.get(name)
            )
            refreshed += 1
    # drop entries for queries that no longer exist
    fingerprints = {n: fp for n, fp in fingerprints.items() if n in QUERIES}

    out = {
        "current_data_gen": current_gen,
        "data_gen_by_round": gen_by_round,
        "testdata_fingerprint": current_fp,
        "fingerprints": dict(sorted(fingerprints.items())),
    }
    with open(LEDGER_PATH, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"ledger written: round r{latest:02d}, gen {current_gen}, "
        f"{refreshed} fingerprints refreshed, "
        f"{len(fingerprints)} total"
    )


if __name__ == "__main__":
    main()
