"""Binned range join: point-in-interval joins that survive 100 TB.

The naive plan for ``p.join(i, (p.x >= i.s) & (p.x <= i.e))`` is a
BroadcastNestedLoopJoin (or a full cartesian product when neither side fits
in memory) — every point compared against every interval.  The reference has
no range join at all (SURVEY.md §2.3 notes the engine should exceed its
left/inner/anti surface); engines that do (e.g. the interval-join pattern in
stream processors) all use the same trick implemented here:

1. Quantize the join axis into fixed-width bins.
2. A point falls into exactly one bin; an interval is exploded into every
   bin it overlaps (``sequence(floor(s/w), floor(e/w))``).
3. Equi-join on the bin id — a plain shuffled hash / sort-merge join that
   partitions across the cluster — then re-check the exact predicate.

Because each point exists in exactly one bin, a (point, interval) pair can
only meet in that bin: no duplicate matches, no post-join dedup needed.

Cost model: intervals are replicated ``len/bin_width + 1`` times, and a bin
holds ``bin_width`` worth of points — pick ``bin_width`` near the typical
interval length to balance replication against per-bin fanout.  Intervals
longer than the bin width stay CORRECT (they just replicate into more bins).
Skewed axes (all points in one hot bin) degrade like any hot key and
compose with ops.skew salting if needed.

Only inner semantics: with a left join on the bin key, a point whose bin
matched some interval but failed the exact range check would be dropped by
the post-filter rather than preserved null-extended, silently corrupting
left-join semantics — so that shape is not offered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "_rj_bin"


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
) -> DataFrame:
    """Inner-join ``points`` to every interval with start <= point <= end.

    ``point_col`` (on points) and ``start_col``/``end_col`` (on intervals)
    must be integral columns on a shared axis (days, seconds, ids...); use
    ``F.unix_date`` / ``catalog.epoch_seconds`` to get there from temporals.
    Output has all columns of both inputs.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be a positive integer")
    p = points.withColumn(_BIN, F.floor(F.col(point_col) / bin_width))
    i = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bin_width),
                F.floor(F.col(end_col) / bin_width),
            )
        ),
    )
    return (
        p.join(i, _BIN)
        .filter((F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col)))
        .drop(_BIN)
    )
