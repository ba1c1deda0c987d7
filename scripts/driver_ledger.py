"""Build DRIVER_LEDGER.json: per-query cumulative driver-proof ledger.

Scans every CORRECTNESS_r{N}.json artifact in the repo root and records,
for each registry query, the first and latest round whose artifact holds a
fully green row (rows_match + schema_match + hash_match, err null), plus
the strength of that row ("hash" vs "rows_only" for oracle-less queries).

Re-run after each round's artifact lands:  python scripts/driver_ledger.py
The rotation rule in CLAUDE.md keys off this file: queries with no entry
here go first in the registry QUERIES dict.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> int:
    ledger: dict[str, dict] = {}
    rounds = sorted(
        ROOT.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    for path in rounds:
        rnd = int(re.search(r"r(\d+)", path.name).group(1))
        data = json.loads(path.read_text())
        for name, row in data.items():
            if not isinstance(row, dict) or row.get("err") is not None:
                continue
            if not (row.get("rows_match") and row.get("schema_match")):
                continue
            strength = "hash" if row.get("hash_match") else "rows_only"
            entry = ledger.setdefault(
                name, {"first_round": rnd, "latest_round": rnd, "strength": strength}
            )
            entry["latest_round"] = rnd
            if strength == "hash":
                entry["strength"] = "hash"

    try:
        from pda_spark.plans.registry import QUERIES

        registry = list(QUERIES)
    except Exception:
        registry = sorted(ledger)

    unproven = [q for q in registry if q not in ledger]
    out = {
        "queries": {q: ledger[q] for q in sorted(ledger)},
        "unproven": unproven,
        "proven_count": len([q for q in registry if q in ledger]),
        "registry_count": len(registry),
        # VERDICT r06 #4: stamp which artifacts this ledger reflects so a
        # pre-artifact rebuild can never silently contradict a newer
        # CORRECTNESS_r{N}.json (the r06 skew: ledger said 50 while the
        # r06 artifact proved 99).
        "reflects_artifacts_through_round": (
            int(re.search(r"r(\d+)", rounds[-1].name).group(1)) if rounds else 0
        ),
    }
    (ROOT / "DRIVER_LEDGER.json").write_text(json.dumps(out, indent=2) + "\n")
    print(
        f"proven {out['proven_count']}/{out['registry_count']}; "
        f"unproven: {len(unproven)}"
    )
    for q in unproven:
        print(f"  - {q}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
