"""Bucketed table layout for co-located (shuffle-free) joins.

At 100 TB the dominant cost of a fact-to-fact join (lineitem ⋈ orders)
is the shuffle. Writing both sides bucketed + sorted on the join key
fixes the partitioning at write time: Spark's scan reports the hash
distribution, so the join planner skips both Exchanges — each task joins
bucket i with bucket i, repeatedly, across every downstream query that
joins on the key. This is the parquet equivalent of the reference
warehouse's clustered storage, applied to join keys instead of dates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, path: str,
                   bucket_cols: Sequence[str], n_buckets: int,
                   sort_cols: Sequence[str] | None = None) -> None:
    """Persist as a bucketed (+ optionally sorted) external parquet table.

    Sorting within buckets additionally lets sort-merge join skip its
    sort. Bucket count is a layout contract: pick it for the target
    cluster's parallelism (buckets ≥ cores you want busy) and keep it
    identical on both join sides.
    """
    writer = (df.write.mode("overwrite").format("parquet")
              .option("path", path)
              .bucketBy(n_buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def cobucketed_join(spark: SparkSession, left_table: str, right_table: str,
                    on: Sequence[str], how: str = "inner") -> DataFrame:
    """Join two co-bucketed tables on their bucket key — plans with zero
    Exchange nodes when both sides share bucketing (verify with
    ``.explain``; tests assert it)."""
    return spark.table(left_table).join(spark.table(right_table),
                                        on=list(on), how=how)


def write_range_clustered(df: DataFrame, path: str,
                          cluster_cols: Sequence[str],
                          n_files: int | None = None) -> None:
    """Range-clustered parquet layout — the vanilla-parquet cousin of
    warehouse clustering / Z-ordering for ONE sort dimension: globally
    range-partition on ``cluster_cols`` and sort within each output file,
    so every file covers a narrow, non-overlapping slice of the cluster
    key. Parquet then stores tight min/max stats per file and row group,
    and any reader filtering on the key skips whole files — the layout
    pays one shuffle at write time to make every future selective scan
    prune.

    ``repartitionByRange`` samples the key distribution, so skewed keys
    still give balanced files (unlike hash-bucketing by a skewed key).
    Use for the one dominant filter column (event time, date); for
    multi-key pruning, layer hive partitioning on the coarse key above
    this on the fine key.
    """
    cols = [df[c] for c in cluster_cols]
    writer = df.repartitionByRange(*( [n_files] if n_files else [] ), *cols) \
        .sortWithinPartitions(*cols)
    writer.write.mode("overwrite").parquet(path)


def zorder_key(cols, bits: int = 16):
    """Morton (Z-order) interleave of ``len(cols)`` integer columns'
    low ``bits`` bits — the multi-dimensional clustering key behind
    warehouse ZORDER layouts: sorting/range-partitioning on the z-value
    keeps rows close in EVERY interleaved dimension close on disk, so
    parquet min/max stats prune selective scans on any of the dimensions
    (single-column range clustering only prunes its one sort key).

    All shift amounts are compile-time literals, so the whole key is one
    codegen'd integer expression — row-local, zero shuffles; pair with
    ``write_range_clustered`` on the z column to realize the layout.
    Inputs are masked to ``bits`` bits (a layout key needs ordering
    locality, not injectivity); k·bits must stay under 63 for a signed
    BIGINT z-value.
    """
    from pyspark.sql import functions as F
    k = len(cols)
    if k * bits > 63:
        raise ValueError("z-value would overflow a signed 64-bit long")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * k + i)
    return z


def zorder_key_sql(col_exprs, bits: int = 16) -> str:
    """The identical Morton interleave as portable SQL text (DuckDB /
    ANSI bit operators), generated from the same loop so the oracle and
    the Spark plan can never drift."""
    terms = []
    for b in range(bits):
        for i, c in enumerate(col_exprs):
            # full-term parens matter: SQL's << binds LOOSER than +, so
            # an unparenthesized term would shift by the rest of the sum
            terms.append(
                f"(((({c}) >> {b}) & 1) << {b * len(col_exprs) + i})")
    return "(" + " + ".join(terms) + ")"
