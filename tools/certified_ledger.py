"""Regenerate CERTIFIED.json — the external-driver certification provenance
ledger (VERDICT r5 task 8).

For every query in the registry, record which rounds' external driver runs
(CORRECTNESS_r*.json) certified it hard-green (rows + schema + hash, no
err) and which certified it rows-only (the weaker gate for queries without
an oracle_sql entry).  Auditors should never need to re-derive the union of
the per-round files by hand.

Regenerate with:  python tools/certified_ledger.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build() -> dict:
    sys.path.insert(0, REPO)
    from delta_lake_spark.queries import ORACLE, QUERIES

    hard: dict[str, list[int]] = {}
    rows_only: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        for name, res in json.load(open(path)).items():
            if res.get("err"):
                continue
            if (
                res.get("rows_match")
                and res.get("schema_match")
                and res.get("hash_match")
            ):
                hard.setdefault(name, []).append(rnd)
            elif res.get("rows_match"):
                rows_only.setdefault(name, []).append(rnd)

    oracle_backed = sorted(n for n in QUERIES if n in ORACLE)
    never = [n for n in oracle_backed if n not in hard]
    ledger = {
        "generated_by": "python tools/certified_ledger.py",
        "inputs": sorted(
            os.path.basename(p)
            for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        ),
        "totals": {
            "registered_queries": len(QUERIES),
            "oracle_backed": len(oracle_backed),
            "hard_certified_cumulative": len(
                [n for n in hard if n in set(oracle_backed)]
            ),
            "never_hard_certified_oracle_backed": len(never),
        },
        "never_hard_certified_oracle_backed": never,
        "hard_certified_rounds": {n: sorted(r) for n, r in sorted(hard.items())},
        "rows_only_certified_rounds": {
            n: sorted(r) for n, r in sorted(rows_only.items())
        },
    }
    return ledger


def stalest(n: int = 50) -> list[str]:
    """The n oracle-backed queries whose latest external certification is
    oldest (VERDICT r7 task 2's recency ratchet).  Ties broken by name so
    the rotation is deterministic round-over-round."""
    ledger = build()
    latest = {q: max(r) for q, r in ledger["hard_certified_rounds"].items()}
    return sorted(latest, key=lambda q: (latest[q], q))[:n]


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--stalest":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
        for q in stalest(n):
            print(q)
        return
    ledger = build()
    out = os.path.join(REPO, "CERTIFIED.json")
    with open(out, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=False)
        f.write("\n")
    t = ledger["totals"]
    print(
        f"CERTIFIED.json: {t['hard_certified_cumulative']}/{t['oracle_backed']} "
        f"oracle-backed hard-certified; "
        f"{t['never_hard_certified_oracle_backed']} never certified"
    )


if __name__ == "__main__":
    main()
