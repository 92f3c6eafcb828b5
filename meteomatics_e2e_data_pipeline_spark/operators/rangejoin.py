"""Interval (range) join — points ⋈ [start, end] intervals, bucketed.

A naive range join plans as BroadcastNestedLoopJoin (O(points ×
intervals) comparisons — a scale-killer). The standard fix: chop time
into fixed buckets, expand each interval to the buckets it covers, tag
each point with its bucket, and equi-join on (keys, bucket) with the
BETWEEN as a cheap residual filter. The join becomes a hash join whose
fan-out is bounded by interval length / bucket size, not table sizes.

No duplicates: a point has exactly one bucket, so even an interval
spanning many buckets meets each point at most once. Overlapping
intervals legitimately yield one row per overlap (standard interval-join
semantics).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(points: DataFrame, intervals: DataFrame,
                  keys: Sequence[str], point_ts: str,
                  start_col: str, end_col: str,
                  how: str = "inner") -> DataFrame:
    """Join point rows to interval rows on shared ``keys`` where
    ``start_col <= point_ts <= end_col``. Day-granularity buckets — pick
    the bucket size ~ the typical interval length; day matches the
    daylight/business-hours shape this engine needs.
    """
    import functools

    # Only inner/left are sound here: points carry exactly one bucket, but
    # intervals are EXPLODED one row per covered day — a right/full outer
    # join would emit an unmatched 5-day interval five times (once per
    # bucket row with NULL point columns). Re-deduping those is
    # interval-grain work the caller should do on the un-exploded side.
    if how not in ("inner", "left"):
        raise ValueError(
            f"interval_join supports how='inner'|'left', got {how!r}: "
            "unmatched intervals would duplicate per day bucket")

    keys = list(keys)
    expanded = intervals.alias("__iv").withColumn(
        "__bucket",
        F.explode(F.expr(
            f"sequence(to_date({start_col}), to_date({end_col}), interval 1 day)")),
    )
    tagged = points.alias("__pt").withColumn("__bucket",
                                             F.to_date(F.col(point_ts)))
    # The BETWEEN is part of the JOIN CONDITION, not a post-filter —
    # otherwise outer joins degenerate to inner (an unmatched left row's
    # NULL start/end would fail the filter and be dropped).
    cond = functools.reduce(
        lambda a, b: a & b,
        [tagged[k] == expanded[k] for k in keys]
        + [tagged["__bucket"] == expanded["__bucket"],
           tagged[point_ts].between(expanded[start_col],
                                    expanded[end_col])],
    )
    joined = tagged.join(expanded, on=cond, how=how)
    payload = [c for c in intervals.columns if c not in keys]
    return joined.select(
        *[tagged[c] for c in points.columns],
        *[expanded[c] for c in payload],
    )
