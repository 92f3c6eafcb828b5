"""Small-file compaction semantics and the HTTP fetcher's request/error
handling (requests stubbed — no network in this environment)."""

from __future__ import annotations

import sys
import types

import pytest
from pyspark.sql import functions as F

from meteomatics_e2e_data_pipeline_spark.operators.maintenance import compact_parquet


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    p = str(tmp_path / "tbl")
    df = spark.createDataFrame([(i, i % 3) for i in range(300)], "v int, k int")
    # accrete many small files the way incremental appends do
    for _ in range(5):
        df.repartition(8).write.mode("append").parquet(p)
    before = sorted(tuple(r) for r in spark.read.parquet(p).collect())

    stats = compact_parquet(spark, p, target_files=2)
    assert stats["files_before"] == 40
    assert stats["files_after"] <= 2
    assert stats["rows"] == 1500
    assert sorted(tuple(r) for r in spark.read.parquet(p).collect()) == before


def test_compaction_partitioned_layout(spark, tmp_path):
    p = str(tmp_path / "ptbl")
    df = spark.createDataFrame([(i, f"d{i % 2}") for i in range(100)],
                               "v int, day string")
    for _ in range(4):
        df.repartition(6).write.mode("append").partitionBy("day").parquet(p)
    stats = compact_parquet(spark, p, target_files=1)
    assert stats["files_after"] < stats["files_before"]
    back = spark.read.parquet(p)
    assert back.count() == 400
    assert set(r["day"] for r in back.select("day").distinct().collect()) \
        == {"d0", "d1"}  # partition columns survive the rewrite


@pytest.fixture()
def fake_requests(monkeypatch):
    calls = {}

    class Resp:
        def __init__(self, status, payload):
            self.status_code, self._payload, self.text = status, payload, "err"

        def json(self):
            return self._payload

    mod = types.ModuleType("requests")

    def get(url, auth=None):
        calls["url"], calls["auth"] = url, auth
        return Resp(calls.get("status", 200), {"status": "OK", "data": []})

    mod.get = get
    monkeypatch.setitem(sys.modules, "requests", mod)
    return calls


def test_http_fetcher_url_and_enrichment(fake_requests):
    from meteomatics_e2e_data_pipeline_spark.sources.ingest import HttpFetcher
    f = HttpFetcher("https://api.example.com", "u", "p",
                    ["t_2m:C", "uv:idx"])
    out = f("tallinn", "estonia", 59.4, 24.8, "2025-03-26")
    assert fake_requests["url"] == (
        "https://api.example.com/2025-03-25T00:00:00Z--2025-04-02T00:00:00Z:"
        "PT1H/t_2m:C,uv:idx/59.4,24.8/json")
    assert fake_requests["auth"] == ("u", "p")
    assert out["city"] == "tallinn" and out["weather"] == {"status": "OK",
                                                           "data": []}


def test_http_fetcher_raises_on_non_200(fake_requests):
    from meteomatics_e2e_data_pipeline_spark.sources.ingest import HttpFetcher
    fake_requests["status"] = 503
    f = HttpFetcher("https://api.example.com", "u", "p", ["t_2m:C"])
    with pytest.raises(ConnectionError, match="503"):
        f("tallinn", "estonia", 59.4, 24.8, "2025-03-26")


def test_compaction_multilevel_partitions(spark, tmp_path):
    """A two-level hive layout (country=/city=) must survive compaction
    with BOTH partition columns as directories — detecting only the first
    level would collapse city into data files and lose its pruning."""
    p = str(tmp_path / "ml")
    df = spark.createDataFrame(
        [(i, f"c{i % 2}", f"t{i % 3}") for i in range(60)],
        "v int, country string, city string")
    for _ in range(3):
        df.repartition(4).write.mode("append") \
            .partitionBy("country", "city").parquet(p)
    stats = compact_parquet(spark, p, target_files=1)
    assert stats["files_after"] < stats["files_before"]
    assert stats["rows"] == 180
    # inner level still a directory layout after the rewrite
    inner = [q.name for q in (tmp_path / "ml" / "country=c0").iterdir()
             if q.is_dir()]
    assert sorted(inner) == ["city=t0", "city=t1", "city=t2"]
    assert spark.read.parquet(p).count() == 180


def test_conform_schema_handles_evolution(spark, tmp_path):
    """Old files lacking a column + new files carrying extras must both
    conform to one target contract: typed NULLs for missing, casts for
    present, extras dropped, order fixed."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (DoubleType, LongType, StringType,
                                   StructField, StructType)

    from meteomatics_e2e_data_pipeline_spark.operators.maintenance import (
        conform_schema,
    )

    old = spark.createDataFrame([(1, "a")], "id long, name string")
    old.write.parquet(str(tmp_path / "t" / "p=old"))
    new = spark.createDataFrame(
        [(2, "b", 1.5, "extra")],
        "id long, name string, score double, junk string")
    new.write.parquet(str(tmp_path / "t" / "p=new"))

    merged = spark.read.option("mergeSchema", "true") \
        .parquet(str(tmp_path / "t"))
    target = StructType([
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
    ])
    out = conform_schema(merged, target)
    assert [f.name for f in out.schema.fields] == ["id", "name", "score"]
    assert dict(out.dtypes)["score"] == "double"
    rows = {r.id: r for r in out.collect()}
    assert rows[1].score is None and rows[2].score == 1.5
    assert not hasattr(rows[2], "junk")
