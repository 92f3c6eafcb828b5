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


# ---------------------------------------------------------------------------
# Count-min sketch: a d×w integer grid; every key increments one cell
# per row (hash_d(key) % w), a point query reads the MINIMUM of its d
# cells — never an underestimate, overestimate bounded by collisions
# (≤ εN with w = ⌈e/ε⌉ at failure probability δ = e^-d). Cells are
# mergeable by plain addition, so per-partition sketches compose like
# the HLL rollups above. Unlike HLL's engine-specific binary, the grid
# is DETERMINISTIC integers under the repo's md5-derived hashing — the
# estimates are fully oracle-checkable.
# ---------------------------------------------------------------------------

CMS_DEPTH = 3
CMS_WIDTH = 256
CMS_SALT = "cms0"


def cms_cells(df: DataFrame, key_col: str, depth: int = CMS_DEPTH,
              width: int = CMS_WIDTH, salt: str = CMS_SALT) -> DataFrame:
    """Build the count-min grid: one row per touched (depth, idx) cell
    with its count. Row-local ×depth fan-out then ONE map-side-
    combinable aggregate — the grid is ≤ depth·width rows no matter the
    input size, and two grids merge by summing matching cells."""
    from .textops import base_hash48

    rows = df.select(F.col(key_col).cast("string").alias("__k"))
    exploded = rows.select(
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("depth"),
        F.col("__k"))
    idx = (base_hash48(F.concat_ws("|", F.col("__k"), F.lit(salt),
                                   F.col("depth").cast("string")))
           % width).cast("int")
    return (exploded.withColumn("idx", idx)
            .groupBy("depth", "idx")
            .agg(F.count(F.lit(1)).alias("cell_n")))


def cms_point_estimate(cells: DataFrame, keys: DataFrame, key_col: str,
                       depth: int = CMS_DEPTH, width: int = CMS_WIDTH,
                       salt: str = CMS_SALT) -> DataFrame:
    """Point-query the grid for each key in ``keys``: min over the d
    cells the key hashes to. The keys frame is question-sized (dozens),
    broadcast against the ≤ d·w-row grid — the query path never touches
    raw data. Output: (key, cms_estimate)."""
    from .textops import base_hash48

    k = keys.select(F.col(key_col).cast("string").alias("__k")).distinct()
    probes = k.select(
        "__k",
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("depth"))
    idx = (base_hash48(F.concat_ws("|", F.col("__k"), F.lit(salt),
                                   F.col("depth").cast("string")))
           % width).cast("int")
    return (
        probes.withColumn("idx", idx)
        .join(cells, ["depth", "idx"])
        .groupBy("__k")
        .agg(F.min("cell_n").alias("cms_estimate"))
        .select(F.col("__k").alias(key_col), "cms_estimate")
    )
