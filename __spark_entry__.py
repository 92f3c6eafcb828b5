"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pricing-summary query on sf0.001.
``queries()`` — one entry per implemented operator family (SURVEY.md §2 +
LLM-data-pipeline extensions); each callable takes (spark, sf_dir).
``oracle_sql()`` — matching DuckDB SQL; omitted keys are rows-only checked.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from meteomatics_e2e_data_pipeline_spark.plans import analytics, llmdata, weather
from meteomatics_e2e_data_pipeline_spark.sources.fixtures import ensure_fixtures

# Bronze fixtures must exist before the driver runs the weather oracle SQL
# (DuckDB reads the same JSON files); generation is idempotent and cheap.
ensure_fixtures()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return analytics.q_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = dict(analytics.QUERIES)
    out.update(weather.WEATHER_QUERIES)
    out.update(llmdata.LLM_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out = dict(analytics.ORACLE)
    out.update(weather.weather_oracle())
    out.update(llmdata.llm_oracle())
    return out
