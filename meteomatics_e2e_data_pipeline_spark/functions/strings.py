"""String scalar functions (SURVEY.md §2.9 C1, C13)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_part_compat(c: Column, delim: str, n: int) -> Column:
    """C1: Snowflake ``split_part(c, delim, n)`` (1-indexed; '' when absent).

    Uses the built-in ``split_part`` (Spark >= 3.5) — JVM-side.
    """
    return F.split_part(c, F.lit(delim), F.lit(n))


def slugify(c: Column) -> Column:
    """C13: reference ``meteomatics_get_data.py:55-61`` normalization:
    ``strip().lower().replace(' ', '_')``."""
    return F.regexp_replace(F.lower(F.trim(c)), " ", "_")
