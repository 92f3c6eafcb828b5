"""As-of (temporal) join — an operator Spark lacks natively, built as a
composition of existing DataFrame ops (the brief's preferred path (a)).

Semantics: for every left row, attach the payload of the right row with
the greatest ``right_ts`` that is < (strict, default) or <= the left
row's timestamp, within the same key group — the market-data
"trade joins the prevailing quote" pattern, also what DuckDB's native
``ASOF JOIN`` computes.

Implementation is the scalable union-window formulation, NOT a range
self-join: tag both sides, union, and take ``last(payload, ignorenulls)``
over an ordered window per key. One shuffle on the join keys, linear
scan within each — no quadratic candidate pairs, no per-row subquery.
At equal timestamps the sort places left rows before right rows for the
strict variant (the equal-ts quote is not yet visible) and after them
for ``allow_exact=True``.

The payload travels as ONE struct column so a multi-column match is
picked atomically (no mixed-row artifacts when right rows tie on ts).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, keys: Sequence[str],
              left_ts: str, right_ts: str,
              payload_cols: Sequence[str],
              allow_exact: bool = False,
              prefix: str = "asof_") -> DataFrame:
    """Backward as-of join; returns all left columns plus
    ``{prefix}{col}`` for each payload column (NULL when no prior right
    row exists for the key)."""
    keys = list(keys)
    payload = F.struct(*[F.col(c) for c in payload_cols])
    # side ordering at equal ts: strict -> right AFTER left (invisible);
    # allow_exact -> right BEFORE left (visible)
    left_side, right_side = (0, 1) if not allow_exact else (1, 0)

    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(left_side).alias("__side"),
        F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType
        ).alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(right_side).alias("__side"),
        payload.alias("__payload"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns])
                        .alias("r")).schema["r"].dataType).alias("__row"),
    )
    w = (Window.partitionBy(*keys).orderBy("__ts", "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__row").isNotNull())
    )
    out_cols = [F.col(f"__row.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__match.{c}").alias(f"{prefix}{c}")
                 for c in payload_cols]
    return matched.select(*out_cols)
