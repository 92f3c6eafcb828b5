"""TxTable.convert — in-place adoption of a plain-parquet directory
(the public Delta ``CONVERT TO DELTA`` semantics): no rewrite, one
stats job, one commit referencing the existing files; every txlog
capability applies afterwards. At 100 TB this is the difference
between adopting a directory for one scan and rewriting it."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from meteomatics_e2e_data_pipeline_spark.operators.txlog import TxTable


def _plain(spark, path, n=300, files=3):
    (spark.range(n).selectExpr("id as k", "id * 2 as v")
     .repartitionByRange(files, "k").write.parquet(path))


def _heavy_test_convert_adopts_files_in_place_then_full_dml(spark, tmp_path):
    p = str(tmp_path / "plain")
    _plain(spark, p)
    names_before = sorted(f for f in os.listdir(p) if f.endswith(".parquet"))
    t = TxTable.convert(spark, p, stat_cols=["k"])

    assert t.version == 0
    # zero data movement: the adopted files are bit-identical in place
    assert sorted(f for f in os.listdir(p)
                  if f.endswith(".parquet")) == names_before
    assert sorted(t._snapshot()[2]) == names_before
    assert sorted((r["k"], r["v"]) for r in t.read().collect()) \
        == [(i, 2 * i) for i in range(300)]
    audit = t.fsck(verify_row_counts=True)
    assert audit["ok"] and audit["live_files"] == 3
    assert audit["unreferenced_files"] == []

    # full DML on the adopted table; v0 time travel = the plain dir
    t.append(spark.createDataFrame([(900, 1800)], "k long, v long")
             .coalesce(1))
    t.delete(spark.createDataFrame([(0,)], "k long"), ["k"])
    assert t.read().count() == 300
    assert t.read(version=0).count() == 300
    assert {r["k"] for r in t.read().collect()} == set(range(1, 300)) | {900}
    feed = t.read_changes(0, 1)  # CDC starts at the adopted snapshot
    assert feed.filter("_change_type = 'insert'").count() == 1


def _heavy_test_convert_keeps_stat_pruning(spark, tmp_path):
    """repartitionByRange gives disjoint per-file k ranges; a keyed
    delete after convert must rewrite ONLY the file whose stats cover
    the key — the adoption recorded real min/max, not placeholders."""
    p = str(tmp_path / "pruned")
    _plain(spark, p)
    t = TxTable.convert(spark, p, stat_cols=["k"])
    v = t.delete(spark.createDataFrame([(5,)], "k long"), ["k"])
    removed = [a["remove"]["path"] for a in t.history()[v]
               if "remove" in a]
    assert len(removed) == 1  # two of the three files stat-pruned away
    assert t.read().count() == 299


def _heavy_test_convert_vacuum_reclaims_superseded_adopted_files(spark, tmp_path):
    p = str(tmp_path / "vac")
    _plain(spark, p, n=60, files=1)
    t = TxTable.convert(spark, p, stat_cols=["k"])
    adopted = sorted(t._snapshot()[2])
    t.update("k >= 0", {"v": "v + 1"})  # copy-on-write supersedes all
    gone = t.vacuum(retention_seconds=0)
    assert adopted[0] in gone  # non part-* names are reclaimable too
    assert t.read().count() == 60


def _heavy_test_describe_history_records_operation_provenance(spark, tmp_path):
    """Every commit carries a commitInfo-shaped provenance action;
    describe_history surfaces op + action tallies newest-first — the
    DESCRIBE HISTORY parity view, and the audit trail fsck findings
    get interpreted against."""
    p = str(tmp_path / "hist")
    _plain(spark, p, n=60, files=1)
    t = TxTable.convert(spark, p, stat_cols=["k"])
    t.append(spark.createDataFrame([(900, 0)], "k long, v long")
             .coalesce(1))
    t.update("k = 900", {"v": "7"})
    t.delete(spark.createDataFrame([(900,)], "k long"), ["k"])
    t.append(spark.createDataFrame([(901, 1)], "k long, v long")
             .coalesce(1))   # fragment so OPTIMIZE has files to pack
    assert t.optimize(target_rows=1_000_000) == 5
    t.restore(1)
    hist = t.describe_history()
    assert [h["operation"] for h in hist] \
        == ["restore", "optimize", "append", "delete", "update",
            "append", "convert"]
    assert [h["version"] for h in hist] == [6, 5, 4, 3, 2, 1, 0]
    assert hist[-1]["info"]["files"] == 1          # convert records size
    assert all(h["timestamp"] is not None for h in hist)
    assert hist[1]["n_adds"] >= 1                  # optimize repacked
    # a repaired commit drops the dead writer's provenance -> unknown
    torn = t.version + 1
    with open(f"{t.log_dir}/{torn:020d}.json", "w"):
        pass
    t.repair_torn_commit(torn)
    assert t.describe_history()[0] == {
        "version": torn, "operation": "unknown", "timestamp": None,
        "n_adds": 0, "n_removes": 0, "rows_added": 0,
        "rows_removed": 0, "rows_tombstoned": 0, "info": {}}


def _heavy_test_convert_rejects_hive_layout_txlog_and_empty(spark, tmp_path):
    # hive layouts ADOPT now (round 13 — tests/test_txlog_partitioned.py
    # covers them); what stays refused is an AMBIGUOUS mix of flat and
    # partitioned files in one directory (Spark's own scan refuses too)
    hive = str(tmp_path / "hive")
    (spark.range(10).selectExpr("id as k", "id % 2 as d")
     .write.partitionBy("d").parquet(hive))
    t = TxTable.convert(spark, hive)
    assert t.detail()["partition_cols"] == ["d"]
    assert t.read().count() == 10

    mixed = str(tmp_path / "mixed")
    (spark.range(5).selectExpr("id as k", "id % 2 as d")
     .write.partitionBy("d").parquet(mixed))
    (spark.range(5).selectExpr("id as k", "id % 2 as d")
     .coalesce(1).write.mode("append").parquet(mixed))
    with pytest.raises(ValueError, match="mixes partition layouts"):
        TxTable.convert(spark, mixed)

    p = str(tmp_path / "already")
    _plain(spark, p, n=10, files=1)
    TxTable.convert(spark, p)
    with pytest.raises(ValueError, match="already a txlog table"):
        TxTable.convert(spark, p)

    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="no parquet files"):
        TxTable.convert(spark, str(empty))


def _heavy_test_detail_summarizes_table_surface(spark, tmp_path):
    """DESCRIBE DETAIL parity: one log fold reports version, files,
    log-recorded rows, and the declared stat/bloom/constraint surface —
    no data scan (the audits are what VERIFY the log; detail reports
    it)."""
    t = TxTable.create(
        spark, spark.createDataFrame([(i, i) for i in range(10)],
                                     "k int, v int").coalesce(2),
        str(tmp_path / "d"), stat_cols=["k"], bloom_cols=["k"],
        constraints={"k_nn": "k IS NOT NULL"})
    t.append(spark.createDataFrame([(99, 9)], "k int, v int").coalesce(1))
    d = t.detail()
    assert d["version"] == 1 and d["num_files"] == 3
    assert d["num_rows"] == 11
    assert d["schema_fields"] == ["k", "v"]
    assert d["stat_cols"] == ["k"]
    assert d["bloom"]["cols"] == ["k"]
    assert d["constraints"] == {"k_nn": "k IS NOT NULL"}
    assert d["checkpoints"] == []


# Pooled heavy bodies (see conftest.pool_bodies): independent tmp-table
# bodies drain concurrently under the session pool, one pytest row each.
_POOLED = {n: fn for n, fn in [
    ("test_convert_adopts_files_in_place_then_full_dml", _heavy_test_convert_adopts_files_in_place_then_full_dml),
    ("test_convert_keeps_stat_pruning", _heavy_test_convert_keeps_stat_pruning),
    ("test_convert_vacuum_reclaims_superseded_adopted_files", _heavy_test_convert_vacuum_reclaims_superseded_adopted_files),
    ("test_describe_history_records_operation_provenance", _heavy_test_describe_history_records_operation_provenance),
    ("test_convert_rejects_hive_layout_txlog_and_empty", _heavy_test_convert_rejects_hive_layout_txlog_and_empty),
    ("test_detail_summarizes_table_surface", _heavy_test_detail_summarizes_table_surface),
]}


import pytest as _pytest


@_pytest.fixture(scope="module")
def convert_pool(_heavy_pool):
    futs = {n: _heavy_pool["tests.test_txlog_convert::" + n]
            for n in _POOLED}
    return {n: f.result() for n, f in futs.items()}


def _shim(name):
    def test(convert_pool):
        ex = convert_pool[name]
        if ex is not None:
            raise ex
    test.__name__ = name
    return test


for _n in _POOLED:
    globals()[_n] = _shim(_n)
del _n
