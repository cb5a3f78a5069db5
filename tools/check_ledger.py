"""Executable driver-proof ledger (VERDICT r3 item 8).

The per-round driver records only the FIRST 50 registry entries in
CORRECTNESS_r{N}.json, so rows proven in an earlier round rotate below the
cap line. COVERAGE.md documents the mapping; this script is the mapping AS
A CHECK: every `__spark_entry__.queries()` row must be GREEN
(rows+schema+hash, no err) in at least one CORRECTNESS_r*.json — or be a
documented rows-only row (no oracle_sql entry), which the driver records
without a hash.

Also asserts the cap invariant that makes the rotation safe: every row that
has NEVER been driver-proven must sit inside the first 50 dict entries of
the registry (else the next driver run cannot prove it either).

Usage: python tools/check_ledger.py   (exit 1 on any unproven row)
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DRIVER_CAP = 50


def green_rows() -> dict[str, str]:
    """query name -> first round file in which the driver proved it green."""
    proven: dict[str, str] = {}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rec = json.load(open(path))
        rows = rec.get("queries", rec)
        for name, r in rows.items():
            if not isinstance(r, dict):
                continue
            ok = (
                r.get("err") in (None, "")
                and r.get("rows_match", False)
                and r.get("schema_match", False)
                # rows-only rows have no hash; hash_match=None counts as the
                # documented weaker check, False is a failure
                and r.get("hash_match", None) is not False
            )
            if ok and name not in proven:
                proven[name] = os.path.basename(path)
    return proven


def main() -> int:
    import __spark_entry__ as entrymod

    registry = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    proven = green_rows()

    unproven = [n for n in registry if n not in proven]
    # rows the driver has never proven MUST be within the recording cap
    misplaced = [n for n in unproven if registry.index(n) >= DRIVER_CAP]

    print(f"registry rows: {len(registry)}  oracles: {len(oracles)}")
    print(f"driver-proven green: {len(registry) - len(unproven)}")
    for n in registry:
        if n in proven:
            continue
        pos = registry.index(n)
        where = "INSIDE cap (provable next round)" if pos < DRIVER_CAP else "BELOW CAP — UNPROVABLE"
        print(f"  unproven: {n} at position {pos} — {where}")
    if misplaced:
        print(
            f"\nFAIL: {len(misplaced)} never-proven row(s) sit below the "
            f"{DRIVER_CAP}-entry driver cap: {misplaced}"
        )
        return 1
    print("ledger OK: every row is driver-proven or inside the cap")
    return 0


if __name__ == "__main__":
    sys.exit(main())
