"""Date/calendar functions with Snowflake-semantics parity.

Each maps a scalar used by the reference's dbt models (``dim_date.sql``,
``fact_*.sql``) onto built-in Spark expressions — no UDFs, so every one of
these stays inside whole-stage codegen.

Parity traps handled here (SURVEY.md §2.9):
- C6 weekday name: Snowflake ``to_char(d,'Day')`` blank-pads to 9 chars; we
  normalize to the unpadded English name (``date_format(d,'EEEE')``) — pinned
  as the engine's documented behavior.
- C7 weekend flag: Snowflake ``extract(dow)`` is 0=Sun..6=Sat; Spark
  ``dayofweek`` is 1=Sun..7=Sat. Weekend == Saturday|Sunday either way.
- C9 week number: Snowflake ``datediff(week, a, b)`` counts week boundaries;
  we compute ``floor(days_between_monday_truncs / 7) + 1`` which matches the
  reference's "weeks since Monday-of-week containing Jan 1, +1".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def date_key(d: Column) -> Column:
    """C4: integer yyyyMMdd key (``to_char(d,'YYYYMMDD')::int``)."""
    return F.date_format(d, "yyyyMMdd").cast("int")


def weekday_name(d: Column) -> Column:
    """C6: full English weekday name, unpadded (e.g. 'Monday')."""
    return F.date_format(d, "EEEE")


def is_weekend(d: Column) -> Column:
    """C7: true for Saturday/Sunday (Spark dayofweek: 1=Sun..7=Sat)."""
    return F.dayofweek(d).isin(1, 7)


def week_number(d: Column, year_anchor: Column | None = None) -> Column:
    """C9: 1-based week number relative to the Monday-of-week containing
    Jan 1 of ``d``'s year (reference ``dim_date.sql:22-26``)."""
    if year_anchor is None:
        year_anchor = F.to_date(F.concat(F.year(d).cast("string"), F.lit("-01-01")))
    monday_of = F.to_date(F.date_trunc("week", d))
    monday_anchor = F.to_date(F.date_trunc("week", year_anchor))
    return (F.floor(F.datediff(monday_of, monday_anchor) / 7) + 1).cast("int")


def date_spine(spark: SparkSession, start: str = "2020-01-01",
               n_days: int = 3653) -> DataFrame:
    """S11/F4: row-generator date spine, ``spark.range``-based (distributed —
    no driver-side list materialization; reference ``dim_date.sql:4-7``)."""
    return (
        spark.range(n_days)
        .select(F.date_add(F.to_date(F.lit(start)), F.col("id").cast("int"))
                .alias("date_day"))
    )
