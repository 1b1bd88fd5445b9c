"""The certification provenance ledger (tools/certified_ledger.py) must stay
internally consistent and cover every CORRECTNESS_r0*.json present."""

from __future__ import annotations

import glob
import json
import os

from tools.certified_ledger import REPO, build


def test_ledger_build_invariants():
    ledger = build()
    t = ledger["totals"]
    assert t["oracle_backed"] <= t["registered_queries"]
    assert (
        t["hard_certified_cumulative"] + t["never_hard_certified_oracle_backed"]
        == t["oracle_backed"]
    )
    # every hard-certified round list is sorted, non-empty, and within r1..r99
    for name, rounds in ledger["hard_certified_rounds"].items():
        assert rounds == sorted(rounds) and rounds, name
        assert all(1 <= r <= 99 for r in rounds), name
    # the never-certified list must not intersect the certified map
    never = set(ledger["never_hard_certified_oracle_backed"])
    assert not (never & set(ledger["hard_certified_rounds"]))


def test_checked_in_ledger_covers_all_rounds_on_disk():
    """CERTIFIED.json must list every CORRECTNESS file that exists — a new
    round's driver output means the ledger needs `python
    tools/certified_ledger.py` re-run before the round closes."""
    path = os.path.join(REPO, "CERTIFIED.json")
    assert os.path.exists(path), "run: python tools/certified_ledger.py"
    ledger = json.load(open(path))
    on_disk = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r0*.json"))
    )
    assert ledger["inputs"] == on_disk, (
        "CERTIFIED.json is stale — regenerate with: python tools/certified_ledger.py"
    )
