"""Batch txlog DataSource (sources/txlog_batch.py): snapshot reads as
``spark.read.format("txlog")`` with log-stat file pruning pushed into
scan planning — the Delta/Iceberg data-skipping contract, one-sided by
construction (pruning only ever skips provably-unmatchable files; every
filter is handed back to Spark for row-level re-application)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql.datasource import (
    EqualTo, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan,
    LessThanOrEqual, StringStartsWith,
)

from meteomatics_e2e_data_pipeline_spark.operators.txlog import TxTable
from meteomatics_e2e_data_pipeline_spark.sources.txlog_batch import (
    TxLogBatchReader,
    register,
)


def _kv(spark, lo, hi, mul=2):
    return (spark.range(lo, hi)
            .selectExpr("id as k", f"id*{mul} as v").coalesce(1))


def _ms(df):
    return Counter(tuple(r) for r in df.collect())


def _striped(spark, tmp_path, stripes=8, rows=16):
    """One file per contiguous k-stripe → perfectly prunable stats."""
    p = str(tmp_path / "t")
    t = TxTable.create(spark, _kv(spark, 0, rows), p, stat_cols=["k"])
    for i in range(1, stripes):
        t.append(_kv(spark, i * rows, (i + 1) * rows))
    assert len(t.live_files()) == stripes
    return p, t


def test_format_txlog_reads_snapshots_and_time_travel(spark, tmp_path):
    register(spark)
    p, t = _striped(spark, tmp_path, stripes=3)
    t.merge_upsert(_kv(spark, 10, 20, mul=9), ["k"], update=True)

    got = spark.read.format("txlog").option("path", p).load()
    assert got.columns == ["k", "v"]
    assert _ms(got) == _ms(t.read())
    for v in range(t.version + 1):
        tv = (spark.read.format("txlog").option("path", p)
              .option("versionAsOf", str(v)).load())
        assert _ms(tv) == _ms(t.read(version=v)), v
    with pytest.raises(Exception, match="out of range"):
        (spark.read.format("txlog").option("path", p)
         .option("versionAsOf", "99").load().collect())


def test_pushdown_prunes_files_one_sided(spark, tmp_path):
    """Unit contract on the reader: range/equality/IN filters on a stat
    column prune exactly the unmatchable stripes; unknown filter shapes
    and stat-less columns prune nothing."""
    p, t = _striped(spark, tmp_path, stripes=8, rows=16)  # k: 0..127

    def planned(filters):
        r = TxLogBatchReader({"path": p})
        leftover = list(r.pushFilters(filters))
        assert leftover == filters          # every filter handed back
        return len(r.partitions())

    assert planned([]) == 8
    assert planned([EqualTo(("k",), 5)]) == 1
    assert planned([In(("k",), (5, 100))]) == 2
    assert planned([GreaterThan(("k",), 95)]) == 2          # stripes 6,7
    assert planned([GreaterThanOrEqual(("k",), 96)]) == 2
    assert planned([LessThan(("k",), 16)]) == 1
    assert planned([LessThanOrEqual(("k",), 16)]) == 2
    assert planned([GreaterThan(("k",), 31), LessThan(("k",), 48)]) == 1
    assert planned([EqualTo(("k",), -1)]) == 0               # nothing can match
    # v has no stats; IsNotNull/StringStartsWith are unknown shapes: keep all
    assert planned([EqualTo(("v",), 10)]) == 8
    assert planned([IsNotNull(("k",))]) == 8
    assert planned([StringStartsWith(("k",), "1")]) == 8

    # end-to-end: the engine's answer is exact despite the skipping
    register(spark)
    df = spark.read.format("txlog").option("path", p).load()
    assert _ms(df.filter("k = 5")) == Counter({(5, 10): 1})
    assert (df.filter("k >= 96 and v % 2 = 0").count()
            == t.read().filter("k >= 96").count())


def test_format_txlog_nullfills_pre_evolution_files(spark, tmp_path):
    register(spark)
    p = str(tmp_path / "t")
    t = TxTable.create(spark, _kv(spark, 0, 10), p, stat_cols=["k"])
    t.append(spark.range(10, 15).selectExpr(
        "id as k", "id*2 as v", "id*3 as w").coalesce(1),
        merge_schema=True)
    df = spark.read.format("txlog").option("path", p).load()
    assert df.columns == ["k", "v", "w"]
    assert _ms(df) == _ms(t.read())
    assert df.filter("w is null").count() == 10
    # pre-evolution snapshot still reads with its own 2-column schema
    old = (spark.read.format("txlog").option("path", p)
           .option("versionAsOf", "0").load())
    assert old.columns == ["k", "v"]


def test_write_format_txlog_append_is_atomic_and_stat_pruned(spark, tmp_path):
    """df.write.format("txlog").mode("append"): every task stages one
    file, ONE commit publishes them all (version bumps exactly once),
    per-file stats computed in-task feed the same pruning as TxTable
    staging, and a schema-name mismatch fails before any task runs."""
    register(spark)
    p = str(tmp_path / "t")
    t = TxTable.create(spark, _kv(spark, 0, 16), p, stat_cols=["k"])

    (spark.range(16, 48).selectExpr("id as k", "id*2 as v")
     .repartition(4)
     .write.format("txlog").option("path", p).mode("append").save())

    assert t.version == 1
    assert _ms(t.read()) == Counter({(k, 2 * k): 1 for k in range(48)})
    adds = [a["add"] for a in t.history()[1] if "add" in a]
    assert len(adds) == 4                       # one file per task
    assert all(a["stats"]["k"][0] is not None for a in adds)
    assert sum(a["numRecords"] for a in adds) == 32
    # the written files' stats prune like any other txlog file
    r = TxLogBatchReader({"path": p})
    list(r.pushFilters([EqualTo(("k",), 0)]))
    assert len(r.partitions()) == 1             # only the create file

    with pytest.raises(Exception, match="schema mismatch"):
        (spark.range(5).selectExpr("id as wrong")
         .write.format("txlog").option("path", p).mode("append").save())
    assert t.version == 1                       # nothing published

    # empty append publishes nothing
    (spark.range(0).selectExpr("id as k", "id as v")
     .write.format("txlog").option("path", p).mode("append").save())
    assert t.version == 1


def test_write_format_txlog_overwrite_and_time_travel(spark, tmp_path):
    register(spark)
    p = str(tmp_path / "t")
    t = TxTable.create(spark, _kv(spark, 0, 10), p, stat_cols=["k"])
    (spark.range(100, 105).selectExpr("id as k", "id*3 as v").coalesce(1)
     .write.format("txlog").option("path", p).mode("overwrite").save())
    assert t.version == 1
    assert _ms(t.read()) == Counter({(k, 3 * k): 1 for k in range(100, 105)})
    assert _ms(t.read(version=0)) == Counter(
        {(k, 2 * k): 1 for k in range(10)})
    # round-trip through the reader too
    got = (spark.read.format("txlog").option("path", p).load())
    assert _ms(got) == _ms(t.read())


def test_writer_commit_retries_past_concurrent_append(spark, tmp_path):
    """The V2 commit races a TxTable append for the next version: the
    append claims it first, the writer's publish retries onto the
    following version — both commits survive, no rows lost."""
    from meteomatics_e2e_data_pipeline_spark.sources.txlog_batch import (
        TxLogBatchWriter, TxWriteMessage,
    )

    p = str(tmp_path / "t")
    t = TxTable.create(spark, _kv(spark, 0, 10), p, stat_cols=["k"])
    w = TxLogBatchWriter({"path": p}, t.schema(), overwrite=False)
    msgs = [w.write(iter([(50, 100), (51, 102)]))]
    t.append(_kv(spark, 20, 25))            # concurrent writer wins v1
    w.commit(msgs)                          # retries, lands at v2
    assert t.version == 2
    assert _ms(t.read()) == (
        Counter({(k, 2 * k): 1 for k in range(10)})
        + Counter({(k, 2 * k): 1 for k in range(20, 25)})
        + Counter({(50, 100): 1, (51, 102): 1}))
    # overwrite mode with the same race REFUSES instead
    w2 = TxLogBatchWriter({"path": p}, t.schema(), overwrite=True)
    m2 = [w2.write(iter([(1, 1)]))]
    t.append(_kv(spark, 30, 31))
    with pytest.raises(RuntimeError, match="raced a concurrent commit"):
        w2.commit(m2)
    w2.abort(m2)                            # staged file cleaned up
    staged = m2[0].add["path"]
    import os
    assert not os.path.exists(os.path.join(p, staged))
