"""Skew-resistant aggregation via salting (two-phase partial combine).

AQE's skew-join handling covers joins; a groupBy whose key distribution
is dominated by a handful of hot keys still funnels each hot key's whole
partition through one task at the final aggregate. Salting splits every
key into ``n_salts`` sub-keys for the first (heavy, map-side-combined)
aggregate, then re-combines the small salted partials — the hot key's
work spreads across ``n_salts`` tasks and the second shuffle moves only
``|keys| × n_salts`` rows.

Results are exactly the aggregate's value for sum/count/min/max (the
combiners are associative); avg is decomposed into sum+count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def bucket_by_quantiles(df: DataFrame, col: str, n_buckets: int,
                        out_col: str = "bucket") -> DataFrame:
    """Distributed alternative to a global-ORDER-BY ``ntile``: compute
    the n−1 exact interpolated cut points with one aggregate, broadcast
    them, and assign buckets with a comparison chain. No global sort, no
    single-partition window — the scalable form of quantile bucketing
    (boundary rows may differ from ntile by one bucket when values tie
    exactly on a cut point; counts per bucket are equal only up to value
    ties, which is inherent to value-based cuts)."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts_row = df.agg(*[
        F.expr(f"percentile({col}, {p})").alias(f"c{i}")
        for i, p in enumerate(probs)
    ]).first()
    cuts = [cuts_row[f"c{i}"] for i in range(len(probs))]
    expr = F.lit(n_buckets)
    for i in range(len(cuts) - 1, -1, -1):
        expr = F.when(F.col(col) <= F.lit(cuts[i]), F.lit(i + 1)) \
            .otherwise(expr)
    # NULL never satisfies any `<=` cut, so without this guard it would
    # fall through every WHEN into the top bucket — a silent
    # misclassification of missing values as maximal ones. NULL in,
    # NULL bucket out (matching ntile over a NULLS-excluded frame).
    expr = F.when(F.col(col).isNull(), F.lit(None)).otherwise(expr)
    return df.withColumn(out_col, expr.cast("int"))


_PARTIAL = {
    "sum": F.sum, "count": F.count, "min": F.min, "max": F.max,
}
_COMBINE = {
    "sum": F.sum, "count": F.sum, "min": F.min, "max": F.max,
}


def salted_agg(df: DataFrame, keys: Sequence[str],
               aggs: dict[str, tuple[str, str]],
               n_salts: int = 16) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column → (function, input column) with function
    in {sum, count, min, max, avg}. Example::

        salted_agg(li, ["l_returnflag"],
                   {"qty": ("sum", "l_quantity"),
                    "n": ("count", "l_quantity"),
                    "avg_qty": ("avg", "l_quantity")})
    """
    keys = list(keys)
    plan: dict[str, tuple[str, str]] = {}
    avg_outputs: dict[str, tuple[str, str]] = {}
    for out, (fn, col) in aggs.items():
        if fn == "avg":
            plan[f"__{out}_sum"] = ("sum", col)
            plan[f"__{out}_cnt"] = ("count", col)
            avg_outputs[out] = (f"__{out}_sum", f"__{out}_cnt")
        elif fn in _PARTIAL:
            plan[out] = (fn, col)
        else:
            raise ValueError(f"unsupported aggregate {fn!r}")

    # Round-robin salt, NOT a row hash: identical duplicate rows (the
    # canonical skew input — retries, log duplication) would all hash to
    # one bucket and defeat the spread. monotonically_increasing_id is
    # nondeterministic across runs, which is fine — every salt assignment
    # yields the same final aggregate (the combiners are associative).
    salted = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "__salt").agg(*[
        _PARTIAL[fn](col).alias(out) for out, (fn, col) in plan.items()
    ])
    final = partial.groupBy(*keys).agg(*[
        _COMBINE[fn](out).alias(out) for out, (fn, _) in plan.items()
    ])
    for out, (s, c) in avg_outputs.items():
        final = final.withColumn(out, F.col(s) / F.col(c))
    return final.drop(*[c for c in final.columns if c.startswith("__")])


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Skew-proof equi-join by salting: the big (skewed) side gets a
    round-robin salt in [0, n_salts); the small side is replicated
    ``n_salts``× with every salt value; the join keys on (key, salt),
    spreading one hot key across ``n_salts`` tasks. Result is
    VALUE-identical to the plain join (each big row meets exactly one
    replica of its match), which is how the oracle checks it.

    Use when a handful of keys dominate (the `events_heavy_hitters`
    / `docs_dup_degree_histogram` diagnostics say which) and AQE's
    runtime skew-join isn't available or isn't splitting hard enough —
    e.g. a deliberately-partitioned ingest or a non-AQE engine tier.
    Cost: the small side's shuffle volume ×n_salts — size n_salts to
    the observed hot-key multiplicity, not higher. Round-robin (not
    row-hash) salting spreads identical duplicate rows too, same
    rationale as :func:`salted_agg`.

    Only join modes whose semantics survive the small-side replication
    are accepted: with the small side repeated ``n_salts``×, an
    unmatched small row under ``right``/``full`` would emit once per
    replica, so those modes raise instead of silently multiplying.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi",
               "left_anti", "leftanti", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} (small-side "
            f"replication breaks right/full semantics), got {how!r}")
    salted_big = big.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    salted_small = small.withColumn("__salt", salts)
    out = salted_big.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")


def bloom_pruned_join(big: DataFrame, small: DataFrame, key: str,
                      how: str = "inner") -> DataFrame:
    """Equi-join with an explicit Bloom runtime filter: the small
    side's key set compresses into the fixed-size filter from the
    decontamination family (operators/neardup.py sizing constants), the
    big side is pruned ROW-LOCALLY before any shuffle, and the real
    join then removes the bounded false positives — so the result is
    EXACTLY the plain join while the shuffle carries only probable
    matches. This is the hand-rolled analog of engine runtime filters
    (DPP / bloom pushdown) for when the planner can't infer one — e.g.
    the small side is the output of an arbitrary computation rather
    than a filtered dim. The filter build's collect is bounded by the
    word count (8 KB), never the small side's row count.

    Because the big side is pre-filtered, any outer ``how`` that must
    keep unmatched big rows ('left'/'full'/'right') would silently drop
    the pruned rows — those modes raise; the prune is lossless exactly
    for the modes that only ever emit matched big rows.
    """
    allowed = {"inner", "left_semi", "leftsemi", "semi"}
    if how not in allowed:
        raise ValueError(
            f"bloom_pruned_join supports {sorted(allowed)} (the Bloom "
            f"prefilter drops unmatched big rows, so outer modes would "
            f"lose them), got {how!r}")
    return bloom_key_prefilter(big, small, key).join(small, key, how)


def bloom_key_prefilter(big: DataFrame, small: DataFrame,
                        key: str) -> DataFrame:
    """The row-local half of :func:`bloom_pruned_join`: big-side rows
    whose key the small side's Bloom filter reports as a probable
    match (no false negatives; bounded false positives). Exposed
    separately so selectivity is observable and the filter reusable.
    """
    from .neardup import BLOOM_BITS, BLOOM_K, BLOOM_WORD_BITS, _bloom_pos
    from .textops import base_hash48

    hv = base_hash48(F.col(key).cast("string"))
    pos = (small.select(hv.alias("hv")).distinct()
           .select(F.explode(F.array(
               *[_bloom_pos(F.col("hv"), j) for j in range(BLOOM_K)]))
               .alias("pos")))
    words = (
        pos.select((F.col("pos") / BLOOM_WORD_BITS).cast("int").alias("word"),
                   F.call_function(
                       "shiftleft", F.lit(1).cast("long"),
                       (F.col("pos") % BLOOM_WORD_BITS).cast("int"))
                   .alias("mask"))
        .groupBy("word").agg(F.bit_or("mask").alias("mask"))
        .collect()
    )
    dense = [0] * (BLOOM_BITS // BLOOM_WORD_BITS)
    for r in words:
        dense[r["word"]] = r["mask"]
    filt = F.lit("".join(f"{w:08x}" for w in dense))
    probe_hv = base_hash48(F.col(key).cast("string"))
    hit = F.lit(1)
    for j in range(BLOOM_K):
        p = _bloom_pos(probe_hv, j)
        word = (p / BLOOM_WORD_BITS).cast("int")
        bit = (p % BLOOM_WORD_BITS).cast("int")
        mask = F.conv(
            F.call_function("substring", filt, word * 8 + 1, F.lit(8)),
            16, 10).cast("long")
        hit = hit * F.call_function("shiftright", mask, bit) \
            .bitwiseAND(F.lit(1))
    return big.filter(hit == 1)
