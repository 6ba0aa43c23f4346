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

--assume-changed is STICKY since round 10: names are persisted in the
ledger (``assume_changed_pending``) and stay excluded from fingerprint
re-recording on every later run, until a NEWER CORRECTNESS round lands
(whose rows gated the changed code, so re-recording becomes correct
and the pending set clears automatically). This closes the r6/r10
"ledger trap" where a later plain run silently re-vouched an edited
query that happened to be green in the latest round's window.
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


def effective_assume_changed(
    cli_names: set[str], ledger: dict, latest: int
) -> set[str]:
    """CLI names ∪ the ledger's pending set — unless a CORRECTNESS
    round NEWER than the one the pending set was recorded against has
    landed (its rows gated the changed code, so prior exclusions are
    obsolete and only the fresh CLI names apply)."""
    pend = ledger.get("assume_changed_pending", {})
    if pend.get("as_of_round") == latest:
        return cli_names | set(pend.get("names", []))
    return cli_names


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--assume-changed",
        default="",
        help="comma-separated query names whose plans changed after "
        "their last green row (fingerprints dropped → re-gate); "
        "sticky via the ledger until the next CORRECTNESS round",
    )
    args = ap.parse_args()

    ledger = load_ledger()
    rounds = load_correctness_rounds()
    if not rounds:
        raise SystemExit("no CORRECTNESS_r*.json found — nothing to record")
    latest = max(rounds)
    assume_changed = effective_assume_changed(
        {s for s in args.assume_changed.split(",") if s}, ledger, latest
    )

    current_fp = testdata_fingerprint()
    current_gen = ledger.get("current_data_gen", "g2")
    if ledger.get("testdata_fingerprint") not in (None, current_fp):
        current_gen = f"g{int(current_gen.lstrip('g')) + 1}"
        print(f"testdata changed → data generation bumped to {current_gen}")

    gen_by_round = dict(ledger.get("data_gen_by_round", {}))
    for r in rounds:
        gen_by_round.setdefault(str(r), current_gen)

    # Helper-change detection: query fingerprints cover the query fn +
    # oracle only, so a semantic change inside a shared operator module
    # is invisible to them. Record a content hash per engine module
    # (shared with gate_policy.ledger_staleness, which a `gate` test
    # runs — a forgotten refresh fails pytest); when one changed since
    # the last ledger, list the queries whose SOURCE references that
    # module so the operator can re-run with --assume-changed on the
    # affected names.
    import inspect

    from epl_cas_etl_2026_spark.plans.gate_policy import current_module_hashes

    module_hashes = current_module_hashes()
    prev_hashes = ledger.get("module_hashes", {})
    changed_mods = sorted(
        rel
        for rel, h in module_hashes.items()
        if prev_hashes and prev_hashes.get(rel) != h
    )
    if changed_mods:
        print("engine modules changed since last ledger:")
        for rel in changed_mods:
            mod_token = rel[:-3].replace(os.sep, ".").replace(".__init__", "")
            users = []
            for qname, fn in QUERIES.items():
                try:
                    src = inspect.getsource(fn)
                except (OSError, TypeError):
                    continue
                if mod_token.split(".")[-1] in src or mod_token in src:
                    users.append(qname)
            print(f"  {rel} — queries referencing it: {', '.join(users) or '-'}")
        print(
            "review the diffs; re-run with --assume-changed "
            "<affected,query,names> if semantics moved"
        )

    fingerprints = dict(ledger.get("fingerprints", {}))
    for name in assume_changed:
        fingerprints.pop(name, None)
    refreshed = 0
    for name, row in rounds[latest].items():
        if name in assume_changed:
            # an assume-changed query must NOT have its fingerprint
            # re-recorded from the current tree even if it was green in
            # the latest round — the green predates the change
            continue
        if name in QUERIES and _is_green(row, name in ORACLES):
            fingerprints[name] = fingerprint_query(
                QUERIES[name], ORACLES.get(name)
            )
            refreshed += 1
    # drop entries for queries that no longer exist
    fingerprints = {n: fp for n, fp in fingerprints.items() if n in QUERIES}

    out = {
        "assume_changed_pending": {
            "as_of_round": latest,
            "names": sorted(assume_changed),
        },
        "current_data_gen": current_gen,
        "data_gen_by_round": gen_by_round,
        "testdata_fingerprint": current_fp,
        "module_hashes": dict(sorted(module_hashes.items())),
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
