"""PySpark-native analytics engine with the query and data-processing
capabilities of the Kozhay/meteomatics-e2e-data-pipeline reference.

The reference (read-only at /root/reference) is an Airflow + dbt/Snowflake
weather ETL; this package re-expresses its dataflow — nested-JSON ingest,
file-grain incremental staging, a Kimball star schema with window-based
latest-record dedupe and md5 surrogate keys — idiomatically on the Spark
DataFrame / Catalyst stack, and extends it with LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) designed for
100 TB scale.

Layout:
  session     — SparkSession factory (AQE, UTC, local tuning)
  functions/  — scalar function library with Snowflake-semantics parity
  sources/    — parquet table loader, bronze JSON reader (typed nested
                schema + _metadata), fixture generator, ingest layer
                (fetcher interface, geocode lookup, from_json validation
                with corrupt channel, bronze sinks)
  operators/  — reusable DataFrame operators: flatten, dedupe,
                incremental (anti-join / upsert / sinks), text analysis,
                MinHash+LSH / SimHash near-dup, cosine kNN + IVF ANN,
                multimodal binary plumbing (decode stubbed)
  plans/      — analytics queries, the weather pipeline (staging, dims,
                facts), LLM-data queries, topological runner + checks
  streaming   — Structured Streaming availableNow bronze→staging ingest
"""

__version__ = "0.2.0"
