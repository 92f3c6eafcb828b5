"""Local mirror of the driver's DuckDB correctness gate.

Runs a Spark DataFrame and the matching DuckDB SQL over the same parquet
tables, then compares row count + column names + order-insensitive values.
Values are compared exactly after canonicalization (floats are expected to
be pre-rounded inside the queries themselves — that is the parity contract).
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # queries pre-round (to <= 6 dp); compare at fixed DECIMAL places,
        # not significant digits — %.9g would collapse large sums (e.g.
        # revenue ~5.9e9) to whole-dollar precision and mask cent-level
        # drift the driver's value-hash gate would catch.
        return f"{v + 0.0:.6f}"
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


# Type-family check mirroring the driver's value-hash gate.  The round-2
# evidence pins down its sensitivity: int-width differences pass (spark int vs
# duck BIGINT was hash-green) but DuckDB HUGEINT fails — pandas has no int128,
# so fetchdf() coerces it to float64 and the hashed values drift (1234 vs
# 1234.0).  So we compare representation FAMILIES (int vs float vs text...),
# and hard-fail any type pandas can't round-trip (HUGEINT, wide DECIMAL).
_DUCK_FAMILY = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "HUGEINT": "!int128-coerces-to-float64", "UHUGEINT": "!uint128",
    "FLOAT": "float", "DOUBLE": "float", "VARCHAR": "str",
    "BOOLEAN": "bool", "DATE": "date", "TIMESTAMP": "ts",
    "TIMESTAMP WITH TIME ZONE": "ts",
    # force oracles to cast DECIMAL outputs to ::DOUBLE/::BIGINT
    # explicitly — the driver's pandas fetch coerces Decimal objects and
    # the hash diverges from Spark's native type, same class as HUGEINT
    "DECIMAL": "!decimal-cast-explicitly",
}
_SPARK_FAMILY = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float", "string": "str", "boolean": "bool",
    "date": "date", "timestamp": "ts", "timestamp_ntz": "ts",
}


def _type_mismatches(con, sql: str, spark_dtypes: dict[str, str]) -> list[str]:
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception:
        return []  # DESCRIBE can't wrap every statement shape; values still compared
    problems = []
    for name, duck_type, *_ in desc:
        fam = _DUCK_FAMILY.get(duck_type.upper().split("(")[0].strip())
        if fam is None:
            continue
        if fam.startswith("!"):
            problems.append(f"{name}: oracle returns {duck_type} (cast it — the "
                            f"driver's pandas fetch coerces it and the value "
                            f"hash will mismatch Spark)")
            continue
        spark_fam = _SPARK_FAMILY.get(spark_dtypes.get(name, ""))
        if spark_fam is not None and spark_fam != fam:
            problems.append(f"{name}: spark family={spark_fam} duck={duck_type}")
    return problems


def compare(spark_df, sql: str, sf_dir: str) -> tuple[bool, str]:
    con = duck_con(sf_dir)
    try:
        type_probs = _type_mismatches(con, sql, dict(spark_df.dtypes))
        duck = con.execute(sql)
        duck_cols = [d[0] for d in duck.description]
        duck_rows = duck.fetchall()
    finally:
        con.close()

    if type_probs:
        return False, f"type mismatch (driver hashes types): {type_probs}"

    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"

    s = rows_to_multiset(spark_rows, spark_cols)
    d = rows_to_multiset(duck_rows, duck_cols)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:3]
        return False, f"values differ; first diffs: {diffs}"
    return True, "ok"
