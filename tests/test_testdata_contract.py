"""Schema contract between the driver's testdata parquet and the engine's
loader assumptions (sources/tables.py).

Round 4 regression: the testdata's ``events.ts`` silently changed from
parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and ``load_table``'s
unconditional nanos→micros conversion broke 16 queries at analysis time —
while every unit test monkeypatched the loader and stayed green. This file
reads the REAL parquet at sf0.001 (no fixtures, no patching) and asserts
the post-load schema the rest of the engine depends on, so the next data
regeneration fails loudly in-repo instead of in the driver's gate.
"""

from __future__ import annotations

import os

import pytest

from meteomatics_e2e_data_pipeline_spark.sources.tables import (
    TABLE_NAMES, load_table)

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present")


def test_all_tables_load_and_are_nonempty(spark):
    for name in TABLE_NAMES:
        df = load_table(spark, SF_DIR, name)
        assert df.limit(1).count() == 1, f"{name} is empty"


def test_events_ts_loads_as_timestamp(spark):
    """The contract every events consumer assumes: after load_table,
    ``ts`` is a plain TIMESTAMP (not NTZ, not BIGINT) regardless of the
    parquet physical type (NANOS and MICROS generations both occur)."""
    ev = load_table(spark, SF_DIR, "events")
    dtypes = dict(ev.dtypes)
    assert dtypes["ts"] == "timestamp", dtypes
    assert dtypes["event_id"] == "bigint"
    assert dtypes["user_id"] == "bigint"
    assert dtypes["event_type"] == "string"
    assert dtypes["value"] == "double"
    assert dtypes["props"] == "string"
    # the conversion must preserve a sane epoch range (a wrong ns/us
    # branch lands thousands of years away)
    row = ev.selectExpr("min(year(ts)) AS lo", "max(year(ts)) AS hi").first()
    assert 2000 <= row["lo"] <= row["hi"] <= 2100


def test_embeddings_contract(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    dtypes = dict(emb.dtypes)
    assert dtypes["vec_id"] == "bigint"
    assert dtypes["label"] == "int"
    assert dtypes["embedding"] in ("array<float>", "array<double>")
    from pyspark.sql import functions as F
    dims = emb.select(F.size("embedding").alias("d")).distinct().collect()
    assert {r["d"] for r in dims} == {64}, "embedding dim drifted from 64"


def test_documents_contract(spark):
    docs = load_table(spark, SF_DIR, "documents")
    dtypes = dict(docs.dtypes)
    for col in ("doc_id", "text", "lang", "source"):
        assert col in dtypes, f"documents lost column {col}"
    assert dtypes["doc_id"] == "bigint"
    assert dtypes["text"] == "string"
