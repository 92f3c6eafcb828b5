"""Shallow CLONE (the public Delta CLONE semantics): a new table whose
commit 0 references the source's live files by absolute path — zero
data copied, one KB commit at any size. Contract:

- clone reads ≡ source snapshot (current or time-traveled), stats /
  bloom / constraints / live deletion vectors carried;
- full independence: DML on either side never touches the other
  (copy-on-write writes NEW local files on the clone);
- OPTIMIZE gradually "unclones" (local materialization);
- the documented Delta caveat: vacuuming the SOURCE past versions a
  clone references breaks the clone, loudly (fsck missing_files);
- partitioned sources clone too: per-root basePath grouping keeps
  partition materialization and pruning exact across mixed roots.
"""

from __future__ import annotations

from collections import Counter

import pytest

from meteomatics_e2e_data_pipeline_spark.operators.txlog import TxTable


def _kv(spark, n=20, parts=2):
    return spark.createDataFrame([(i, i * 10) for i in range(n)],
                                 "k long, v long").repartition(parts)


def _multiset(df):
    return Counter(map(tuple, df.collect()))


def _local_files(t):
    return [p for p in t.live_files()
            if not p.startswith("/") and "://" not in p]


def _heavy_test_clone_is_zero_copy_and_independent(spark, tmp_path):
    src = TxTable.create(spark, _kv(spark), str(tmp_path / "src"),
                         stat_cols=["k"], bloom_cols=["k"])
    src.append(spark.createDataFrame([(50, 500)], "k long, v long"))
    cl = src.clone(str(tmp_path / "cl"))
    # zero-copy: no data files at the clone root, content identical
    assert _local_files(cl) == []
    assert _multiset(cl.read()) == _multiset(src.read())
    assert cl.detail()["num_rows"] == 21
    assert cl.fsck(verify_row_counts=True)["ok"]
    # provenance recorded
    assert cl.describe_history()[-1]["info"]["source"] == src.path
    # independence, clone -> source: copy-on-write lands LOCAL files
    cl.merge_upsert(spark.createDataFrame([(3, 999)], "k long, v long"),
                    ["k"], update=True)
    cl.delete(spark.createDataFrame([(7,)], "k long"), ["k"])
    assert src.read().filter("k = 3").collect()[0]["v"] == 30
    assert src.read().count() == 21
    got = {r["k"]: r["v"] for r in cl.read().collect()}
    assert got[3] == 999 and 7 not in got
    assert _local_files(cl)  # the rewrite materialized locally
    # independence, source -> clone: later source DML is invisible
    before = _multiset(cl.read())
    src.append(spark.createDataFrame([(60, 600)], "k long, v long"))
    assert _multiset(cl.read()) == before
    # the clone's own CDC fold invariant holds across its history
    end = _multiset(cl.read())
    for frm in range(cl.version + 1):
        ch = cl.read_changes(frm)
        ins = _multiset(ch.filter("_change_type = 'insert'")
                        .drop("_change_type"))
        dels = _multiset(ch.filter("_change_type = 'delete'")
                         .drop("_change_type"))
        assert _multiset(cl.read(version=frm)) + ins - dels == end, frm


def _heavy_test_clone_carries_dv_and_time_travel(spark, tmp_path):
    src = TxTable.create(spark, _kv(spark), str(tmp_path / "src"),
                         stat_cols=["k"])
    src.delete(spark.createDataFrame([(4,), (9,)], "k long"), ["k"],
               mode="dv")
    # clone AT the tombstoned head: vectors carry
    cl = src.clone(str(tmp_path / "cl"))
    assert sorted(r["k"] for r in cl.read().collect()) \
        == [i for i in range(20) if i not in (4, 9)]
    assert cl.detail()["dv_tombstones"] == 2
    assert cl.detail()["protocol"]["minReader"] == 3
    # point reads on the clone respect the carried vectors
    probe = spark.createDataFrame([(4,), (5,)], "k long")
    assert [r["k"] for r in cl.read_keys(probe, ["k"]).collect()] == [5]
    # historical clone: the PRE-delete snapshot, rows intact
    cl0 = src.clone(str(tmp_path / "cl0"), version=0)
    assert cl0.read().count() == 20
    # OPTIMIZE "unclones": all live files local afterwards, rows equal
    before = _multiset(cl.read())
    cl.optimize(target_rows=1000)
    assert set(cl.live_files()) == set(_local_files(cl))
    assert _multiset(cl.read()) == before
    assert cl.fsck(verify_row_counts=True)["ok"]


def _heavy_test_clone_partitioned_source(spark, tmp_path):
    """Partitioned sources clone too: partition pruning works across
    ROOTS (source-rooted clones + locally rewritten files each scan
    under their own basePath ancestor), and clone DML lands local
    files in their partitions while the source stays untouched."""
    src = TxTable.create(
        spark, spark.createDataFrame(
            [("a", i, i * 10) for i in range(6)]
            + [("b", i, i * 10) for i in range(6, 12)],
            "p string, k long, v long"),
        str(tmp_path / "part"), stat_cols=["k"], partition_cols=["p"])
    cl = src.clone(str(tmp_path / "cl"))
    assert _local_files(cl) == []
    assert _multiset(cl.read()) == _multiset(src.read())
    # partition pruning on the clone (absolute source-rooted files)
    a = cl.read(partition_values={"p": "a"})
    assert sorted(r["k"] for r in a.collect()) == list(range(6))
    assert all("/p=a/" in f for f in a.inputFiles())
    # clone DML: rewrite lands LOCALLY in its partition; source intact
    cl.merge_upsert(spark.createDataFrame([("a", 2, 999)],
                                          "p string, k long, v long"),
                    ["k"], update=True)
    assert cl.read().filter("k = 2").collect()[0]["v"] == 999
    assert src.read().filter("k = 2").collect()[0]["v"] == 20
    local = _local_files(cl)
    assert local and all(p.startswith("p=") for p in local)
    # mixed-root partition-pruned read: partition a is now part source
    # files, part local rewrite — one logical scan, grouped by root
    a2 = cl.read(partition_values={"p": "a"})
    assert sorted(r["k"] for r in a2.collect()) == list(range(6))
    assert cl.fsck(verify_row_counts=True)["ok"]
    # dv delete on the partitioned clone composes
    cl.delete(spark.createDataFrame([(8,)], "k long"), ["k"], mode="dv")
    assert sorted(r["k"] for r in cl.read().collect())         == [i for i in range(12) if i != 8]
    assert src.read().count() == 12


def _heavy_test_clone_guardrails_and_vacuum_caveat(spark, tmp_path):
    # round-14: the Delta vacuum caveat is now GUARDED — every clone
    # registers itself in the source's log (clone_ref info action), and
    # the source's vacuum SKIPS files a registered clone still
    # references, warning by name. respect_clones=False opts back into
    # the raw Delta behavior (delete anyway, clone fsck reports it).
    import warnings
    src = TxTable.create(spark, _kv(spark, parts=1),
                         str(tmp_path / "src"), stat_cols=["k"])
    cl = src.clone(str(tmp_path / "cl"))
    src.overwrite(_kv(spark, 5, parts=1))
    # record via a pass-through wrapper, NOT catch_warnings: the heavy
    # pool runs bodies concurrently and catch_warnings swaps
    # process-global state (another thread's context can swallow the
    # capture — observed once as a spurious red, the warning itself
    # attributed to a neighboring test's output)
    seen: list[str] = []
    orig_warn = warnings.warn

    def rec(message, *a, **k):
        seen.append(str(message))
        return orig_warn(message, *a, **k)

    warnings.warn = rec
    try:
        deleted = src.vacuum(retention_seconds=0)
    finally:
        warnings.warn = orig_warn
    assert deleted == []  # every candidate was clone-referenced
    assert any("shallow clone" in m for m in seen)
    assert cl.fsck()["ok"]  # the clone SURVIVED the source vacuum
    assert sorted(map(tuple, cl.read().collect())) \
        == [(i, i * 10) for i in range(20)]
    # a DELETED clone stops protecting: its files become reclaimable
    import shutil
    shutil.rmtree(str(tmp_path / "cl"))
    assert src.vacuum(retention_seconds=0)  # now they go
    # opt-out: respect_clones=False restores the raw Delta behavior
    src2 = TxTable.create(spark, _kv(spark, parts=1),
                          str(tmp_path / "src2"), stat_cols=["k"])
    cl2 = src2.clone(str(tmp_path / "cl2"))
    src2.overwrite(_kv(spark, 5, parts=1))
    assert src2.vacuum(retention_seconds=0, respect_clones=False)
    audit = cl2.fsck()
    assert not audit["ok"] and audit["missing_files"]


_POOLED = {n: fn for n, fn in [
    ("test_clone_is_zero_copy_and_independent",
     _heavy_test_clone_is_zero_copy_and_independent),
    ("test_clone_carries_dv_and_time_travel",
     _heavy_test_clone_carries_dv_and_time_travel),
    ("test_clone_partitioned_source",
     _heavy_test_clone_partitioned_source),
    ("test_clone_guardrails_and_vacuum_caveat",
     _heavy_test_clone_guardrails_and_vacuum_caveat),
]}


@pytest.fixture(scope="module")
def clone_pool(_heavy_pool):
    futs = {n: _heavy_pool["tests.test_txlog_clone::" + n]
            for n in _POOLED}
    return {n: f.result() for n, f in futs.items()}


def _shim(name):
    def test(clone_pool):
        ex = clone_pool[name]
        if ex is not None:
            raise ex
    test.__name__ = name
    return test


for _n in _POOLED:
    globals()[_n] = _shim(_n)
del _n
