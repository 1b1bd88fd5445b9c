"""Structural fixture-change ⇒ sweep-rerun tripwire (VERDICT r8 task 2).

Round 8's only red: the final snapshot commit planted new adversarial rows
in tests/test_degenerate_relational.py WITHOUT re-running the sweep, and
four real engine-vs-oracle divergences shipped silently.  This Spark-free
test makes that failure mode impossible to commit quietly: the committed
``tests/degenerate_fixtures.stamp`` must match the sha256 of every
``tests/test_degenerate_*.py`` file, and the stamp is only (re)written by
``python tools/stamp_degenerate.py``, which runs the full degenerate sweep
first and refuses to stamp on red.
"""

from __future__ import annotations

from tools.stamp_degenerate import STAMP, check, suite_files


def test_degenerate_suites_exist():
    names = [p.rsplit("/", 1)[-1] for p in suite_files()]
    # the three standing planted-hazard programs (r7 corpus, r8 relational,
    # r8 streaming); extending the program adds to this floor
    for required in (
        "test_degenerate_corpus.py",
        "test_degenerate_relational.py",
        "test_degenerate_streaming.py",
    ):
        assert required in names, f"degenerate suite vanished: {required}"


def test_stamp_matches_fixture_files():
    stale = check()
    assert not stale, (
        f"degenerate suite files changed without a stamped green sweep: "
        f"{stale}. Run `python tools/stamp_degenerate.py` (it re-runs the "
        f"sweep and stamps {STAMP} only on green), then commit the stamp "
        f"together with the fixture change."
    )
