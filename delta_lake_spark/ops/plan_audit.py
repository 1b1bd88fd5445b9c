"""Physical-plan linter: mechanical detection of the plan shapes that do not
survive a 100x scale-up.

The repo's scale discipline (COVERAGE.md, test_plans.py) is enforced point-wise
per query; this module makes it a reusable operator so ANY DataFrame — user
queries included — can be audited before it ships to a large cluster:

- ``audit(df)``        -> list of :class:`Finding` (severity high/medium/info)
- ``assert_scalable``  -> raise if any high-severity finding (CI-friendly)
- ``scan_report(df)``  -> per-scan (pushed filters, read schema) for pushdown
                          / pruning checks

Checks are string-level over Spark's explain output — the same evidence a
human reads — so they work on any DataFrame without private APIs.

Severity model (what kills a 1000-executor job vs what merely warrants a look):

- ``cartesian``   high   CartesianProduct — O(n*m) row explosion.
- ``row_udf``     high   BatchEvalPython — row-at-a-time Python in the hot
                         path (10-100x slower than Arrow; pickling per row).
- ``global_funnel`` high Exchange SinglePartition feeding a Window or Sort —
                         every row through ONE task (the reference's own
                         global-window hazard, SURVEY.md §2.5).
- ``nested_loop`` medium BroadcastNestedLoopJoin — legitimate for one-row /
                         bounded broadcast sides (global scalars, small query
                         sets), quadratic otherwise; needs a human eye.
- ``shuffles``    info   Exchange count — not wrong, but the number to watch.

An Exchange SinglePartition under a final HashAggregate / TakeOrderedAndProject
is NOT flagged: partial aggregation has already reduced each partition to one
row, so the funnel carries partition-count rows, not data-sized rows.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Finding:
    code: str
    severity: str  # "high" | "medium" | "info"
    message: str


def explain_str(df: DataFrame, mode: str = "simple") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _indent(line: str) -> int:
    """Tree depth of a simple-mode plan line (prefix before the node name)."""
    m = re.match(r"^[\s:+\-*()0-9]*", line)
    return len(m.group(0)) if m else 0


def _single_partition_consumers(plan: str) -> list[str]:
    """Node names that CONSUME an ``Exchange SinglePartition`` — the parent is
    the nearest preceding line with strictly smaller tree indentation."""
    lines = plan.splitlines()
    consumers = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        here = _indent(line)
        for j in range(i - 1, -1, -1):
            if lines[j].strip() and _indent(lines[j]) < here:
                consumers.append(lines[j].strip().lstrip("+-*: ("))
                break
    return consumers


def audit(df: DataFrame) -> list[Finding]:
    """Lint ``df``'s physical plan for scale smells.  Static (pre-AQE) plan:
    joins that AQE would convert to broadcast still show as SortMergeJoin —
    that is fine and unflagged (the shuffle count reflects the worst case)."""
    plan = explain_str(df, "simple")
    findings: list[Finding] = []

    n_cart = plan.count("CartesianProduct")
    if n_cart:
        findings.append(
            Finding(
                "cartesian",
                "high",
                f"{n_cart} CartesianProduct node(s): O(n*m) row explosion — "
                "factor an equi-conjunct into the join key, bin the ranges "
                "(ops.range_join), or bucket candidates (LSH) instead",
            )
        )
    n_row_udf = plan.count("BatchEvalPython")
    if n_row_udf:
        findings.append(
            Finding(
                "row_udf",
                "high",
                f"{n_row_udf} BatchEvalPython node(s): row-at-a-time Python "
                "UDF in the plan — rewrite with built-in functions or an "
                "Arrow-batched pandas_udf / mapInPandas",
            )
        )
    funnels = [
        c
        for c in _single_partition_consumers(plan)
        # SortAggregate is an AGGREGATE (Spark's sort-based fallback when an
        # agg buffer isn't hash-friendly, e.g. typed min/max structs) — a
        # keyless final SortAggregate over SinglePartition is the same
        # sees-only-partials final-aggregate shape as HashAggregate(keys=[])
        # and is exempt; Sort/SortMergeJoin/Window consumers still flag.
        if c.startswith(("Window", "Sort", "WindowGroupLimit"))
        and not c.startswith("SortAggregate")
    ]
    if funnels:
        findings.append(
            Finding(
                "global_funnel",
                "high",
                "Exchange SinglePartition feeds "
                f"{sorted(set(f.split(' ')[0] for f in funnels))}: an "
                "unpartitioned window/sort routes EVERY row through one "
                "task — add partitionBy (ops.windows) or push the sort "
                "into a per-group top-k",
            )
        )
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    if n_bnlj:
        findings.append(
            Finding(
                "nested_loop",
                "medium",
                f"{n_bnlj} BroadcastNestedLoopJoin node(s): fine when the "
                "broadcast side is provably tiny (one-row scalar, bounded "
                "query set); quadratic otherwise — verify the build side",
            )
        )
    n_shuffles = plan.count("Exchange ")
    findings.append(
        Finding(
            "shuffles",
            "info",
            f"{n_shuffles} Exchange node(s) in the static plan (AQE may "
            "remove some at runtime)",
        )
    )
    return findings


def assert_scalable(
    df: DataFrame, allow: tuple[str, ...] = ()
) -> list[Finding]:
    """Raise ``AssertionError`` listing every high-severity finding not in
    ``allow``; return the full findings list otherwise (info included)."""
    findings = audit(df)
    bad = [f for f in findings if f.severity == "high" and f.code not in allow]
    if bad:
        raise AssertionError(
            "plan fails scale lint:\n"
            + "\n".join(f"- [{f.code}] {f.message}" for f in bad)
        )
    return findings


_SCAN_RE = re.compile(
    r"Scan parquet[^\n]*\n(?:.*\n)*?.*?PushedFilters: \[(?P<pushed>[^\]]*)\]"
    r"(?:.*\n)*?.*?ReadSchema: (?P<schema>\S+)",
    re.MULTILINE,
)


def scan_report(df: DataFrame) -> list[dict]:
    """Per-parquet-scan pushdown/pruning evidence from the formatted plan:
    ``[{"pushed": [...], "columns": [...]}]`` — empty ``pushed`` on a scan
    below a filter, or a ``columns`` list wider than the projection, means
    the scan reads more than the query needs."""
    plan = explain_str(df, "formatted")
    out = []
    for m in _SCAN_RE.finditer(plan):
        pushed = [p.strip() for p in m.group("pushed").split(",") if p.strip()]
        cols = re.findall(r"(\w+):", m.group("schema"))
        out.append({"pushed": pushed, "columns": cols})
    return out
