#!/usr/bin/env python3
"""Regenerate the driver-certification ledger from CORRECTNESS_r*.json.

The correctness driver runs only the FIRST 50 entries of
``__spark_entry__.queries()`` per round, so dict order decides which
queries get a fresh driver row.  Rounds 2 and 3 rotated that window by
hand-reordering the QUERIES literal; this tool makes the policy
mechanical: it scans every ``CORRECTNESS_r*.json`` in the repo root and
writes ``amanogawa_spark/cert_ledger.json`` mapping each query name to
the LAST round in which the driver certified it green (rows + schema
matched, and the value hash matched whenever the driver computed one).
``amanogawa_spark.oracle_suite`` then orders QUERIES/ORACLE_SQL by
(last_certified_round, name) ascending, so never-certified and
least-recently-certified queries always occupy the driver's window —
any future addition queues automatically at round 0.

Run after each driver round lands a new CORRECTNESS file:

    python tools/update_cert_ledger.py
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
LEDGER = REPO / "amanogawa_spark" / "cert_ledger.json"


def _is_green(row: dict) -> bool:
    if not row.get("rows_match") or not row.get("schema_match"):
        return False
    hm = row.get("hash_match")
    return hm is None or hm is True


def build_ledger() -> dict[str, int]:
    ledger: dict[str, int] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        data = json.loads(path.read_text())
        for name, row in data.items():
            if _is_green(row):
                ledger[name] = max(ledger.get(name, 0), rnd)
    return ledger


def main() -> int:
    ledger = build_ledger()
    LEDGER.write_text(json.dumps(dict(sorted(ledger.items())), indent=1) + "\n")
    by_round: dict[int, int] = {}
    for rnd in ledger.values():
        by_round[rnd] = by_round.get(rnd, 0) + 1
    print(f"wrote {LEDGER} ({len(ledger)} certified queries)")
    for rnd in sorted(by_round):
        print(f"  last certified r{rnd}: {by_round[rnd]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
