"""Z-order (Morton) clustering layout — the multi-dimensional data-
skipping technique behind Delta's OPTIMIZE ZORDER and Hudi/Iceberg
sort-order clustering: interleave the bits of two dimension keys so
that rows close in BOTH dimensions land in the same contiguous key
range, then bucket the curve into fixed runs. Every bucket of
2^(2m) consecutive z-values is an ALIGNED 2^m x 2^m square in
(x, y) space — so a min/max footer per bucket prunes a rectangle
predicate on either or both dimensions, which a single-column sort
can only do for its leading column.

Scale shape: the z-value is a pure row-local integer expression
(2*bits shift/mask/or terms, whole-stage codegen, no UDF); writing
`df.repartitionByRange(n, zvalue).sortWithinPartitions(zvalue)` gives
the clustered physical layout at any scale, and the per-bucket
min/max stats here are ONE map-side-combinable aggregate. Nothing
here depends on data size; the curve math is per-row.

No counterpart in the reference (its dbt models inherit warehouse
micro-partitioning); semantics follow the public Morton-code /
Z-order literature and the Delta OPTIMIZE ZORDER docs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def zvalue(x: Column, y: Column, bits: int = 12) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer columns: x's bit i lands at position 2i, y's at 2i+1.
    Built from shift/mask/add terms only — bit-identical in any
    engine, so the DuckDB oracle reproduces it with the same
    arithmetic. Inputs must sit in [0, 2**bits); a row outside that
    domain RAISES (per-row guard below) rather than silently masking
    its high bits — masking would collapse distinct points onto one
    z-value and break the aligned-square / min-max-pruning invariant
    the layout stats and file-skipping proofs rely on. The guard is a
    row-local codegen'd branch; the error path never fires on valid
    data, so the oracle twin (zvalue_sql) needs no counterpart."""
    z: Column | None = None
    for i in range(bits):
        xb = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        yb = F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        term = xb + yb
        z = term if z is None else z + term
    lim = F.lit(1 << bits).cast("long")
    in_domain = ((x >= 0) & (x < lim) & (y >= 0) & (y < lim))
    return (
        F.when(in_domain, z.cast("long"))
        .otherwise(F.raise_error(F.format_string(
            "zvalue: input (%s, %s) outside [0, 2^" + str(bits)
            + ") — pick bits from the dimension domain",
            x.cast("string"), y.cast("string"))))
        .cast("long"))


def zorder_write(df, path: str, x_col: str, y_col: str, *,
                 bits: int = 12, n_files: int = 16,
                 mode: str = "overwrite") -> None:
    """Realize the clustered layout on disk — the OPTIMIZE ZORDER
    write path: ``repartitionByRange(n_files, z)`` makes each output
    file one contiguous run of the Morton curve (range partitioning on
    the z-value), ``sortWithinPartitions(z)`` orders rows inside the
    file so parquet row-group stats are tight, and the helper z-column
    is dropped before the write (the layout, not the column, is the
    product — same contract as Delta's OPTIMIZE ZORDER BY).

    Because every contiguous z-run is a union of aligned squares, each
    file's (x, y) min/max footer is a bounded box — a reader with a
    rectangle predicate on EITHER dimension skips every file whose box
    misses the rectangle (proven against real footers in
    tests/test_scale_features.py::test_zorder_write_path_prunes_files).
    At scale, n_files scales with data volume; the range exchange is
    the one shuffle this costs, identical to any clustered write."""
    z = zvalue(F.col(x_col), F.col(y_col), bits=bits)
    (df.withColumn("__z", z)
       .repartitionByRange(n_files, "__z")
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode(mode).parquet(path))


def zvalue_sql(x: str, y: str, bits: int = 12) -> str:
    """The identical interleave as engine-portable SQL text (DuckDB
    oracle twin of :func:`zvalue`)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
