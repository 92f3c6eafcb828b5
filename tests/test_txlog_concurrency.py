"""Concurrent-writer stress on the txlog tier (r11 directive #8): N
threads race mixed DML (appends + updating merges + keyed deletes in
both copy-on-write and deletion-vector modes + an optimize) against ONE
table through independent TxTable handles; every
committed history must be SERIALIZABLE — the final content equals
replaying the successful commits' operations in commit order on a fresh
table — and a conflicting writer may only ever be REJECTED
(TxConflict), never corrupt state. The hypothesis sweep lives in the
slow lane; a fixed-seed two-writer exemplar runs in the default lane."""

from __future__ import annotations

from collections import Counter
from concurrent.futures import ThreadPoolExecutor

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hs

from meteomatics_e2e_data_pipeline_spark.operators.txlog import (
    TxConflict,
    TxTable,
)


def _kv(spark, lo, hi, mul=2):
    return (spark.range(lo, hi)
            .selectExpr("id as k", f"id*{mul} as v").coalesce(1))


def _apply(spark, table: TxTable, op) -> int:
    kind, lo, hi, mul = op
    if kind == "append":
        return table.append(_kv(spark, lo, hi, mul))
    if kind == "merge":
        return table.merge_upsert(_kv(spark, lo, hi, mul), ["k"],
                                  update=True)
    if kind == "delete":
        return table.delete(
            spark.range(lo, hi).selectExpr("id as k"), ["k"])
    if kind == "dv_delete":
        # merge-on-read: tombstones instead of rewrites — must compose
        # serializably with every rewriting op (the dv/remove clash
        # rules in _commit are what this sweep exercises)
        return table.delete(
            spark.range(lo, hi).selectExpr("id as k"), ["k"], mode="dv")
    return table.optimize(target_rows=1_000_000)  # content no-op


def _race_and_check(spark, tmp_base: str, ops: list, n_workers: int):
    path = f"{tmp_base}/t"
    t0 = TxTable.create(spark, _kv(spark, 0, 10), path, stat_cols=["k"])

    committed: list[tuple[int, tuple]] = []
    rejected: list[tuple] = []

    def worker(op):
        # Each racer folds the log through its OWN handle (fresh
        # snapshot reads), like independent jobs on a shared lake table.
        table = TxTable(spark, path)
        try:
            v = _apply(spark, table, op)
            committed.append((v, op))
        except TxConflict:
            rejected.append(op)  # rejection is the ONLY legal failure

    with ThreadPoolExecutor(max_workers=n_workers) as pool:
        list(pool.map(worker, ops))

    def ms(table):
        return Counter((r["k"], r["v"]) for r in table.read().collect())

    # Serial replay: the commit log IS the serial order. Two racers can
    # observe the same returned version only if one was a content no-op
    # (e.g. a delete matching nothing publishes no commit) — sort is
    # stable on (version, insertion), and no-ops replay as no-ops.
    replay = TxTable.create(spark, _kv(spark, 0, 10),
                            f"{tmp_base}/replay", stat_cols=["k"])
    for _v, op in sorted(committed, key=lambda c: c[0]):
        _apply(spark, replay, op)

    racing = ms(TxTable(spark, path))
    assert racing == ms(replay), (
        f"history not serializable: committed={committed} "
        f"rejected={rejected}")
    # sanity: every version in the log is readable (no torn state)
    final = TxTable(spark, path)
    assert final.read(version=final.version).count() == sum(
        racing.values())


_OP = hs.tuples(
    hs.sampled_from(["append", "merge", "delete", "dv_delete",
                     "optimize"]),
    hs.integers(min_value=0, max_value=30),
    hs.integers(min_value=1, max_value=15),
    hs.integers(min_value=1, max_value=9),
).map(lambda o: (o[0], o[1], o[1] + o[2], o[3]))


def test_two_writer_mixed_dml_race_is_serializable(spark, tmp_path):
    """Fixed exemplar in the default lane: overlapping merge + delete +
    append + optimize across two workers."""
    ops = [("merge", 5, 15, 3), ("dv_delete", 8, 12, 1),
           ("append", 40, 50, 2), ("optimize", 0, 0, 1)]
    _race_and_check(spark, str(tmp_path), ops, n_workers=2)


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(hs.data())
def test_concurrent_mixed_dml_history_is_serializable(spark, data):
    """Randomized interleavings of 3-6 mixed-DML ops across 3 racing
    writers: the committed history always replays to the same content;
    conflicts only ever reject."""
    import tempfile

    ops = data.draw(hs.lists(_OP, min_size=3, max_size=6))
    with tempfile.TemporaryDirectory(prefix="txrace_") as base:
        _race_and_check(spark, base, ops, n_workers=3)
