"""Fixture-change ⇒ sweep-rerun guard for the degenerate (planted-hazard)
suites (VERDICT r8 task 2).

THE RULE: any edit to a ``tests/test_degenerate_*.py`` file — they contain
the planted adversarial fixtures AND the engine-vs-oracle sweeps over them —
must be committed together with a green run of those same suites.  Round 8
ended red precisely because the final snapshot commit planted three new
NULL-timestamp rows without re-running the sweep.

MECHANISM: ``tests/degenerate_fixtures.stamp`` is a committed JSON map of
{file: sha256} over every degenerate suite file.  This tool re-runs the
full degenerate sweep and rewrites the stamp ONLY on green:

    python tools/stamp_degenerate.py            # run sweep, stamp on green
    python tools/stamp_degenerate.py --check    # hash compare only (fast)
    python tools/stamp_degenerate.py --force    # stamp without running
                                                # (ONLY when the same session
                                                # already ran the sweep green)

The fast, Spark-free test ``tests/test_degenerate_stamp.py`` asserts the
committed stamp matches the files on disk, so an unstamped fixture edit
turns the suite red in the first seconds of any pytest run instead of
surfacing as a judge-found divergence a round later.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STAMP = os.path.join(REPO, "tests", "degenerate_fixtures.stamp")


def suite_files() -> list[str]:
    return sorted(glob.glob(os.path.join(REPO, "tests", "test_degenerate_*.py")))


def current_hashes() -> dict[str, str]:
    return {
        os.path.basename(p): hashlib.sha256(open(p, "rb").read()).hexdigest()
        for p in suite_files()
    }


def read_stamp() -> dict[str, str]:
    if not os.path.exists(STAMP):
        return {}
    return json.load(open(STAMP)).get("sha256", {})


def check() -> list[str]:
    """Names of suite files whose hash differs from the committed stamp
    (or that are missing from it). Empty list == stamp is current."""
    now, stamped = current_hashes(), read_stamp()
    return sorted(
        name for name, h in now.items() if stamped.get(name) != h
    ) + sorted(name for name in stamped if name not in now)


def write_stamp() -> None:
    payload = {
        "rule": (
            "any diff to tests/test_degenerate_*.py requires the full "
            "degenerate sweep green in the same session; regenerate with "
            "python tools/stamp_degenerate.py (runs the sweep first)"
        ),
        "sha256": current_hashes(),
    }
    with open(STAMP, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
        fh.write("\n")


def main() -> int:
    if "--check" in sys.argv:
        stale = check()
        if stale:
            print(f"STALE stamp for: {', '.join(stale)}")
            return 1
        print("stamp current")
        return 0
    if "--force" not in sys.argv:
        cmd = [sys.executable, "-m", "pytest", "-q", *suite_files()]
        print("# running degenerate sweep:", " ".join(cmd))
        rc = subprocess.call(cmd, cwd=REPO)
        if rc != 0:
            print("sweep RED — stamp NOT updated")
            return rc
    write_stamp()
    print(f"stamped {len(suite_files())} suite files -> {STAMP}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
