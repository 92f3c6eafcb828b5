"""Bronze JSON reader (S6): typed nested scan + file metadata.

Snowflake reads the raw lake through an external stage —
``SELECT METADATA$FILENAME, METADATA$FILE_LAST_MODIFIED, $1 FROM @stage``
(reference ``stg_weather_raw.sql:12-19``). The Spark-native equivalent is a
schema'd ``spark.read.json`` plus the ``_metadata`` struct column. The
schema is always explicit (never inferred in production — inference is a
full extra pass over 100 TB and can drift per batch); strings stay strings
here and are cast lazily downstream, mirroring VARIANT semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, StringType, StructField, StructType,
)

# Pydantic contract at reference helper_validate_response.py:5-33 +
# enrichment at meteomatics_get_data.py:82-88. `dateGenerated` and the
# reading `date`/`value` stay StringType — the lazy-cast (VARIANT) pattern.
READING = StructType([
    StructField("date", StringType()),
    StructField("value", StringType()),
])
COORDINATE = StructType([
    StructField("lat", DoubleType()),
    StructField("lon", DoubleType()),
    StructField("dates", ArrayType(READING)),
])
PARAMETER_BLOCK = StructType([
    StructField("parameter", StringType()),
    StructField("coordinates", ArrayType(COORDINATE)),
])
WEATHER = StructType([
    StructField("version", StringType()),
    StructField("user", StringType()),
    StructField("dateGenerated", StringType()),
    StructField("status", StringType()),
    StructField("data", ArrayType(PARAMETER_BLOCK)),
])
RAW_WEATHER_SCHEMA = StructType([
    StructField("city", StringType()),
    StructField("country", StringType()),
    StructField("latitude", DoubleType()),
    StructField("longitude", DoubleType()),
    StructField("weather", WEATHER),
])


def read_bronze(spark: SparkSession, path: str) -> DataFrame:
    """Scan the bronze lake with the explicit nested schema and surface the
    file-metadata columns the incremental logic keys on.

    ``file_path`` is normalized to the lake-relative form (everything after
    ``bronze/``) so downstream keys are storage-scheme independent —
    ``file:///...`` locally, ``s3a://...`` on a cluster, same key either way.
    """
    df = spark.read.schema(RAW_WEATHER_SCHEMA).json(path)
    return df.select(
        F.regexp_replace(F.col("_metadata.file_path"), r"^.*/bronze/", "")
        .alias("file_path"),
        F.col("_metadata.file_modification_time").alias("file_modified"),
        "*",
    )
