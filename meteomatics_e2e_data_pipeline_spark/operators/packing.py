"""Sequence packing: map every document to its position in the
concatenated token stream a trainer would build (GPT-style
concat-and-chunk into fixed-length sequences).

The pack order must be DETERMINISTIC and engine-independent — the same
requirement as sampling (see ``sampling.py``), solved the same way: the
global order key is ``(sample_bucket(id, salt), id)``, a pure function of
the row. Given that order, a document whose running total ends at
``cum`` occupies sequences ``floor((cum - w) / L) .. floor((cum - 1) /
L)`` and starts at offset ``(cum - w) % L`` — pure integer arithmetic,
so the DuckDB oracle matches bit-for-bit.

100 TB shape — the naive form is a single global window (one partition,
one task: a non-starter). This implements the textbook **two-level
distributed prefix sum** instead:

1. the hash-bucket axis is cut into ``n_ranges`` contiguous ranges, so
   range id is a row-local expression and ranges partition the global
   order;
2. each range computes its local running total in parallel (one window
   per range partition);
3. per-range totals — ``n_ranges`` rows, config-sized — get a tiny
   driver-free window for exclusive range offsets, broadcast back;
4. global cumsum = range offset + local cumsum: row-local.

Cost: one shuffle of (id, weight) pairs on the range key + one
broadcast; nothing global ever sorts. The oracle's single-window form is
the semantic spec; this plan is the one that survives 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import SAMPLE_BUCKETS, sample_bucket


def pack_sequences(df: DataFrame, seq_len: int,
                   weight_col: str = "n_chars", id_col: str = "doc_id",
                   salt: str = "pack0", n_ranges: int = 256) -> DataFrame:
    """Assign each document its sequence span in the packed stream.

    Returns ``(id_col, first_seq, last_seq, seq_offset)``: the first and
    last fixed-length sequence the document's tokens land in, and the
    offset of its first token within ``first_seq``. Zero-weight rows are
    excluded (they occupy no position in the stream).
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if n_ranges <= 0:
        raise ValueError(f"n_ranges must be positive, got {n_ranges}")
    base = (
        df.select(id_col, weight_col)
        .filter(F.col(weight_col) > 0)
        .withColumn("__sb", sample_bucket(F.col(id_col), salt))
        .withColumn("__rng",
                    F.floor(F.col("__sb") * n_ranges / SAMPLE_BUCKETS))
    )
    w_local = (Window.partitionBy("__rng")
               .orderBy("__sb", id_col)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = base.withColumn("__cum_local", F.sum(weight_col).over(w_local))
    # Exclusive prefix over the n_ranges per-range totals: config-sized
    # by construction, so the single-partition window is over a frame
    # that fits in one cache line, not the corpus.
    totals = base.groupBy("__rng").agg(F.sum(weight_col).alias("__tot"))
    w_off = (Window.orderBy("__rng")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (totals
               .withColumn("__off",
                           F.coalesce(F.sum("__tot").over(w_off), F.lit(0)))
               .select("__rng", "__off"))
    cum = F.col("__off") + F.col("__cum_local")
    return (
        local.join(F.broadcast(offsets), "__rng")
        .select(
            id_col,
            F.floor((cum - F.col(weight_col)) / seq_len)
            .cast("bigint").alias("first_seq"),
            F.floor((cum - 1) / seq_len).cast("bigint").alias("last_seq"),
            ((cum - F.col(weight_col)) % seq_len)
            .cast("bigint").alias("seq_offset"),
        )
    )
