"""Surrogate-key generation with dbt_utils parity.

The reference builds every dim/fact key with
``dbt_utils.generate_surrogate_key([cols])`` (reference ``dim_location.sql:4``,
``dim_weather_condition.sql:4``, ``fact_weather_params_history.sql:37-38``),
which expands to::

    md5(cast(coalesce(cast(c1 as varchar), '_dbt_utils_surrogate_key_null_')
        || '-' || ... as varchar))

Key parity requires the exact NULL sentinel and '-' delimiter. Pure built-in
expression — JVM-side, whole-stage-codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NULL_SENTINEL = "_dbt_utils_surrogate_key_null_"


def surrogate_key(*cols: Column | str) -> Column:
    """md5 hex surrogate key over the given columns, dbt_utils-compatible."""
    parts = [
        F.coalesce(F.col(c).cast("string") if isinstance(c, str) else c.cast("string"),
                   F.lit(NULL_SENTINEL))
        for c in cols
    ]
    return F.md5(F.concat_ws("-", *parts))


def surrogate_key_sql(*cols: str) -> str:
    """The equivalent ANSI-SQL expression (DuckDB-compatible) for oracles."""
    parts = ", ".join(
        f"coalesce(cast({c} as varchar), '{NULL_SENTINEL}')" for c in cols
    )
    return f"md5(concat_ws('-', {parts}))"
