"""Mergeable distinct-count sketches (Apache DataSketches HLL, built into
Spark 4 as ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``).

The pattern this enables at 100 TB: materialize one small sketch per
(grain, partition) — e.g. per (event_type, day) — once, at ingest time;
answer any later "distinct users over range X" question by UNIONING the
relevant sketches, never re-scanning raw events. Union cost is
∝ sketches touched (bytes each), not rows; sketches merge associatively,
so daily → monthly → yearly rollups compose losslessly (an HLL union is
exactly the sketch the union of the inputs would have produced at the
same lgK).

Engine-specific binary output ⇒ no DuckDB oracle form; covered by pytest
instead: merge-consistency (union of per-day sketches estimates the same
as one sketch over all days) and a 5% accuracy bound vs exact distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# DataSketches lgConfigK: 2^12 registers ≈ 0.8% relative standard error —
# the same default Spark uses; exposed so pipelines can trade bytes for
# accuracy per deployment.
DEFAULT_LGK = 12


def sketch_rollup(df: DataFrame, value_col: str,
                  grain_cols: tuple[str, ...],
                  lgk: int = DEFAULT_LGK) -> DataFrame:
    """One HLL sketch of ``value_col`` per ``grain_cols`` group — the
    ingest-time pre-aggregation. One map-side-combinable hash aggregate;
    output rows are grain-cardinality, each carrying a ~KB binary sketch.
    """
    return (df.groupBy(*grain_cols)
            .agg(F.hll_sketch_agg(F.col(value_col), F.lit(lgk))
                 .alias("sketch")))


def sketch_union(sketches: DataFrame,
                 group_cols: tuple[str, ...]) -> DataFrame:
    """Merge sketches up a coarser grain (e.g. (type, day) → type) and
    estimate: the range-query path that replaces a raw re-scan. The
    union aggregate is associative/commutative — partial-aggregatable —
    and its input is the tiny sketch table, never the raw events."""
    out = (sketches.groupBy(*group_cols)
           .agg(F.hll_union_agg("sketch").alias("merged")))
    return out.select(
        *group_cols,
        F.hll_sketch_estimate("merged").alias("approx_distinct"))
