"""CHECK constraints on the txlog tier (the public Delta
``ADD CONSTRAINT ... CHECK`` semantics): declared SQL expressions must
not evaluate to FALSE for any written row (NULL passes — SQL
standard). Enforcement rides the staging stats aggregation, so every
write path validates at ZERO extra job cost; a violation cleans up its
staged files and leaves the table untouched."""

from __future__ import annotations

import pytest

from meteomatics_e2e_data_pipeline_spark.operators.txlog import (
    TxConflict, TxTable)


def _t(spark, tmp_path, **kw):
    return TxTable.create(
        spark, spark.createDataFrame([(1, 10), (2, 20)], "k int, v int"),
        str(tmp_path / "c"), stat_cols=["k"],
        constraints={"v_pos": "v > 0", "k_not_null": "k IS NOT NULL"},
        **kw)


def _heavy_test_violating_writes_rejected_table_untouched(spark, tmp_path):
    t = _t(spark, tmp_path)
    before = sorted(map(tuple, t.read().collect()))
    with pytest.raises(ValueError, match="v_pos.*1 row"):
        t.append(spark.createDataFrame([(3, -5)], "k int, v int"))
    with pytest.raises(ValueError, match="k_not_null"):
        t.merge_upsert(spark.createDataFrame([(None, 5)], "k int, v int"),
                       ["v"], update=True)
    assert sorted(map(tuple, t.read().collect())) == before
    assert t.version == 0                      # nothing committed
    audit = t.fsck()
    assert audit["ok"] and audit["unreferenced_files"] == []  # staged
    # files from the rejected writes were cleaned up, not leaked


def _heavy_test_null_check_result_passes_and_conforming_writes_land(
        spark, tmp_path):
    t = _t(spark, tmp_path)
    # v IS NULL -> "v > 0" evaluates NULL -> passes (SQL semantics);
    # k stays NOT NULL so the row is otherwise legal
    t.append(spark.createDataFrame([(7, None)], "k int, v int"))
    t.update("k = 1", {"v": "v + 1"})          # rewrite revalidates too
    assert {(r["k"], r["v"]) for r in t.read().collect()} \
        == {(1, 11), (2, 20), (7, None)}


def _heavy_test_add_constraint_validates_existing_data(spark, tmp_path):
    t = _t(spark, tmp_path)
    with pytest.raises(ValueError, match="existing rows"):
        t.add_constraint("v_small", "v < 15")  # row (2, 20) violates
    v = t.add_constraint("v_cap", "v < 1000")
    assert t.describe_history()[0]["operation"] == "add_constraint"
    with pytest.raises(ValueError, match="v_cap"):
        t.append(spark.createDataFrame([(9, 5000)], "k int, v int"))
    t.drop_constraint("v_cap")
    t.append(spark.createDataFrame([(9, 5000)], "k int, v int"))
    assert t.read().count() == 3
    with pytest.raises(ValueError, match="already exists"):
        t.add_constraint("v_pos", "v >= 0")
    with pytest.raises(ValueError, match="no constraint"):
        t.drop_constraint("ghost")
    assert v == 1


def test_add_constraint_conflicts_with_concurrent_data(spark, tmp_path):
    """The validation scan must cover every row the constraint commits
    over: data landing between snapshot and publish forces a re-run."""
    t = _t(spark, tmp_path)
    rv = t.version
    # another writer lands data after the snapshot add_constraint reads
    other = TxTable(spark, t.path)
    real_snapshot = TxTable._snapshot

    def racing_snapshot(self_, version=None):
        out = real_snapshot(self_, version)
        if self_ is t and not getattr(t, "_raced", False):
            t._raced = True
            other.append(spark.createDataFrame([(5, 50)], "k int, v int"))
        return out

    try:
        TxTable._snapshot = racing_snapshot
        with pytest.raises(TxConflict, match="re-run"):
            t.add_constraint("v_cap", "v < 1000")
    finally:
        TxTable._snapshot = real_snapshot
    assert t.version == rv + 1  # only the racer's append landed


def test_staged_write_conflicts_with_concurrent_constraint(spark, tmp_path):
    """The MIRROR of the race above (Delta's MetadataChanged rule): rows
    staged against a pre-constraint snapshot must not publish after a
    concurrent add_constraint lands — they were never validated under
    the new rule. The commit layer conflicts on ANY intervening meta
    action for data-staging commits; the re-run then validates (and
    here refuses) under the fresh constraint set."""
    t = _t(spark, tmp_path)
    other = TxTable(spark, t.path)
    real_stage = TxTable._stage

    def racing_stage(self_, *a, **kw):
        out = real_stage(self_, *a, **kw)
        if self_ is t and not getattr(t, "_raced_meta", False):
            t._raced_meta = True
            other.add_constraint("v_cap", "v < 25")
        return out

    try:
        TxTable._stage = racing_stage
        with pytest.raises(TxConflict, match="metadata"):
            t.append(spark.createDataFrame([(3, 30)], "k int, v int"))
    finally:
        TxTable._stage = real_stage
    # the unvalidated row never landed; the re-run enforces the new rule
    with pytest.raises(ValueError, match="v_cap"):
        t.append(spark.createDataFrame([(3, 30)], "k int, v int"))
    t.append(spark.createDataFrame([(3, 3)], "k int, v int"))
    assert {(r["k"], r["v"]) for r in t.read().collect()} \
        == {(1, 10), (2, 20), (3, 3)}


def _heavy_test_datasource_writer_enforces_constraints(spark, tmp_path):
    """The V2 DataSource writer ENFORCES CHECK constraints (round-14):
    the constraint set is handed to tasks at plan time and each Arrow
    chunk validates before a byte is staged — valid rows land, a
    violation fails loudly NAMING the constraint, and the table is
    untouched either way."""
    from meteomatics_e2e_data_pipeline_spark.sources.txlog_batch import (
        register)
    t = _t(spark, tmp_path)
    register(spark)
    ok = spark.createDataFrame([(3, 30)], "k int, v int")
    (ok.write.format("txlog").mode("append")
     .option("path", t.path).save())
    assert {(r["k"], r["v"]) for r in t.read().collect()} \
        == {(1, 10), (2, 20), (3, 30)}
    bad = spark.createDataFrame([(4, 40), (5, -1)], "k int, v int")
    with pytest.raises(Exception, match="v_pos"):
        (bad.write.format("txlog").mode("append")
         .option("path", t.path).save())
    assert t.read().count() == 3  # violating batch fully rejected
    # NULL check results pass (SQL CHECK semantics), same as TxTable
    (spark.createDataFrame([(6, None)], "k int, v int")
     .write.format("txlog").mode("append")
     .option("path", t.path).save())
    assert t.read().count() == 4
    assert t.fsck(verify_row_counts=True)["ok"]


def _heavy_test_datasource_writer_constraint_race_conflicts(
        spark, tmp_path):
    """A concurrent add_constraint between the V2 writer's plan and its
    publish forces the conflict path (the MetadataChanged rule): the
    staged rows were validated under the OLD rules and must not land."""
    from meteomatics_e2e_data_pipeline_spark.sources.txlog_batch import (
        TxLogBatchWriter)
    t = _t(spark, tmp_path)
    w = TxLogBatchWriter({"path": t.path},
                         spark.createDataFrame([], "k int, v int").schema,
                         overwrite=False)
    msg = w.write(iter([(7, 70)]))  # task-side: validates + stages
    TxTable(spark, t.path).add_constraint("v_cap", "v < 50")
    with pytest.raises(RuntimeError, match="changed under this write"):
        w.commit([msg])
    assert t.read().count() == 2  # the raced batch never landed


# Pooled heavy bodies (see conftest.pool_bodies). The concurrent-data
# race test monkeypatches TxTable._snapshot (process-global) and stays
# unpooled by the pool_bodies contract.
_POOLED = {n: fn for n, fn in [
    ("test_violating_writes_rejected_table_untouched", _heavy_test_violating_writes_rejected_table_untouched),
    ("test_null_check_result_passes_and_conforming_writes_land", _heavy_test_null_check_result_passes_and_conforming_writes_land),
    ("test_add_constraint_validates_existing_data", _heavy_test_add_constraint_validates_existing_data),
    ("test_datasource_writer_enforces_constraints", _heavy_test_datasource_writer_enforces_constraints),
    ("test_datasource_writer_constraint_race_conflicts", _heavy_test_datasource_writer_constraint_race_conflicts),
]}


@pytest.fixture(scope="module")
def constraints_pool(_heavy_pool):
    futs = {n: _heavy_pool["tests.test_txlog_constraints::" + n]
            for n in _POOLED}
    return {n: f.result() for n, f in futs.items()}


def _shim(name):
    def test(constraints_pool):
        ex = constraints_pool[name]
        if ex is not None:
            raise ex
    test.__name__ = name
    return test


for _n in _POOLED:
    globals()[_n] = _shim(_n)
del _n
