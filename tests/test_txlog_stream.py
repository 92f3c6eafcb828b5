"""Streaming change-data-feed source (sources/txlog_stream.py): each
micro-batch is exactly read_changes((committed, latest]); version offsets
make restarts resume at the commit boundary with no replay and no loss."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from meteomatics_e2e_data_pipeline_spark.operators.txlog import TxTable
from meteomatics_e2e_data_pipeline_spark.sources.txlog_stream import (
    TxLogCdcStreamReader,
    register,
)


def _kv(spark, lo, hi, mul=2):
    return (spark.range(lo, hi)
            .selectExpr("id as k", f"id*{mul} as v").coalesce(1))


def _ms(df):
    return Counter((r["k"], r["v"], r["_change_type"]) for r in df.collect())


def _reader_rows(r, parts):
    # read() yields Arrow RecordBatches; flatten to row tuples
    return [tuple(row.values()) for pt in parts
            for b in r.read(pt) for row in b.to_pylist()]


def test_stream_cdc_batches_follow_commits_exactly_once(spark, tmp_path):
    register(spark)
    p = str(tmp_path / "t")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    t = TxTable.create(spark, _kv(spark, 0, 40), p, stat_cols=["k"])   # v0
    t.append(_kv(spark, 40, 50))                                       # v1
    t.merge_upsert(_kv(spark, 35, 45, mul=9), ["k"], update=True)      # v2

    def run():
        q = (spark.readStream.format("txlog_cdc").option("path", p)
             .option("startingVersion", 0).load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).outputMode("append").start())
        q.awaitTermination()

    run()
    got = spark.read.parquet(out)
    want = t.read_changes(0)
    assert _ms(got) == _ms(want)
    # fold invariant against the live snapshot
    ins = Counter((k, v) for k, v, c in _ms(got) if c == "insert")
    dels = Counter((k, v) for k, v, c in _ms(got) if c == "delete")
    base = Counter((r["k"], r["v"]) for r in t.read(version=0).collect())
    now = Counter((r["k"], r["v"]) for r in t.read().collect())
    assert base + ins - dels == now

    # more commits, restart from the checkpoint: ONLY the new versions
    t.merge_upsert(_kv(spark, 100, 110, mul=7), ["k"])                 # v3
    run()
    got2 = spark.read.parquet(out)
    assert _ms(got2) == _ms(t.read_changes(0))   # no dupes, no loss
    assert (_ms(got2) - _ms(got)) == _ms(t.read_changes(2, 3))

    # restart with NO new commits is a clean no-op
    run()
    assert _ms(spark.read.parquet(out)) == _ms(got2)


def test_stream_cdc_reader_unit_contract(spark, tmp_path):
    p = str(tmp_path / "t")
    t = TxTable.create(spark, _kv(spark, 0, 10), p, stat_cols=["k"])
    t.append(_kv(spark, 10, 20))
    r = TxLogCdcStreamReader(None, {"path": p})
    assert r.initialOffset() == {"version": 0}
    assert r.latestOffset() == {"version": 1}
    parts = r.partitions({"version": 0}, {"version": 1})
    assert parts and all(pt.change_type == "insert" for pt in parts)
    rows = _reader_rows(r, parts)
    assert sorted(rows) == [(k, 2 * k, "insert") for k in range(10, 20)]
    assert r.partitions({"version": 1}, {"version": 1}) == []
    with pytest.raises(ValueError, match="out of range"):
        TxLogCdcStreamReader(None, {"path": p, "startingVersion": "9"})
    with pytest.raises(ValueError, match="not a txlog table"):
        TxLogCdcStreamReader(None, {"path": str(tmp_path / "nope")})
