"""Torn-commit detection and repair on the claim-then-write publish path.

Local publishes are atomic (tmp + hard link) and cannot tear; the
non-local branch (``file://`` here, S3A/HDFS in production) claims the
version with ``create(overwrite=False)`` and then streams the payload —
the documented Delta-on-HDFS crash window. These tests inject a writer
death INSIDE that window for each tear signature the wire protocol
distinguishes (empty file, mid-record truncation, line-boundary tear),
then prove the format's contract: every reader fails LOUDLY (no silent
wrong snapshot), ``repair_torn_commit`` restores the log to the unique
history consistent with what callers observed, and the dead writer's
retry lands cleanly after repair.
"""

from __future__ import annotations

import json
import os

import pytest

from meteomatics_e2e_data_pipeline_spark.operators.txlog import TxTable
from meteomatics_e2e_data_pipeline_spark.operators.txproto import (
    TxCorruption, commit_payload, is_torn, parse_commit_lines)
from meteomatics_e2e_data_pipeline_spark.sources import txlog_stream


# ---------------------------------------------------------------- protocol
# (stdlib-only unit tests: the same parser runs inside executor workers)

def test_commit_payload_round_trips_with_trailer():
    actions = [{"meta": {"schema": {}}}, {"add": {"path": "a.parquet"}}]
    payload = commit_payload(actions)
    lines = payload.splitlines()
    assert json.loads(lines[-1]) == {"commit": {"actions": 2}}
    assert parse_commit_lines(lines, "t") == actions


@pytest.mark.parametrize("shape,lines", [
    ("empty", []),
    ("whitespace-only", ["   ", ""]),
    ("mid-record", ['{"add": {"path": "a.parquet"}}', '{"add": {"pa']),
    ("line-boundary (trailer lost)", ['{"add": {"path": "a.parquet"}}']),
    ("count-mismatch", ['{"add": {"path": "a.parquet"}}',
                        '{"commit": {"actions": 2}}']),
])
def test_every_tear_signature_is_detected(shape, lines):
    assert is_torn(lines), shape
    with pytest.raises(TxCorruption, match="repair_torn_commit"):
        parse_commit_lines(lines, "t")


def test_intact_commit_is_not_torn():
    assert not is_torn(commit_payload([{"add": {"path": "x"}}]).splitlines())


# ---------------------------------------------------------------- e2e

def _crash_publish(table: TxTable, version: int, partial: str) -> None:
    """Reproduce the exact file state a writer death inside the
    claim-then-write window leaves: the version claimed, ``partial``
    (possibly empty) bytes flushed, writer gone."""
    with open(table.log_dir[len("file://"):] + f"/{version:020d}.json",
              "w", encoding="utf-8") as fh:
        fh.write(partial)


def _make_table(spark, tmp_path, name):
    path = f"file://{tmp_path}/{name}"
    df = spark.createDataFrame([(i, i * 10) for i in range(6)],
                               "k int, v int")
    t = TxTable.create(spark, df.coalesce(1), path, stat_cols=["k"])
    t.append(spark.createDataFrame([(10, 100), (11, 110)],
                                   "k int, v int").coalesce(1))
    return t


@pytest.mark.parametrize("partial", [
    "",                                               # died at the claim
    '{"add": {"path": "data/part-junk.parq',          # died mid-record
])
def test_torn_commit_fails_loudly_then_repairs(spark, tmp_path, partial):
    t = _make_table(spark, tmp_path, "torn")
    rows_before = sorted((r["k"], r["v"]) for r in t.read().collect())
    victim = t.version + 1
    _crash_publish(t, victim, partial)

    # every reader path refuses to fold a wrong snapshot
    with pytest.raises(TxCorruption, match="repair_torn_commit"):
        t.read().collect()
    with pytest.raises(TxCorruption):
        t.read_changes(0).collect()
    with pytest.raises(TxCorruption):  # the executor-side parser too
        txlog_stream._read_commit(str(tmp_path / "torn"), victim)

    # refusal guard: an intact commit is never "repairable"
    with pytest.raises(ValueError, match="refusing"):
        t.repair_torn_commit(victim - 1)

    t.repair_torn_commit(victim)
    assert sorted((r["k"], r["v"]) for r in t.read().collect()) \
        == rows_before                       # no acknowledged write lost
    feed = t.read_changes(victim - 1, victim)
    assert feed.count() == 0                 # CDC: repaired == no-op

    # the dead writer's retry republishes AFTER the repaired version
    t.append(spark.createDataFrame([(12, 120)], "k int, v int").coalesce(1))
    assert t.version == victim + 1
    assert sorted((r["k"], r["v"]) for r in t.read().collect()) \
        == rows_before + [(12, 120)]


def test_line_boundary_tear_detected_by_required_trailer(spark, tmp_path):
    """The subtle tear: whole JSON lines survive but the trailer is gone.
    Without a REQUIRED trailer this parses as a valid shorter commit and
    silently drops the tail actions — the hole 'legacy acceptance' would
    reopen."""
    t = _make_table(spark, tmp_path, "boundary")
    victim = t.version + 1
    # a plausible flushed prefix: two intact action lines, no trailer
    _crash_publish(t, victim,
                   '{"add": {"path": "data/f1.parquet", "rows": 3}}\n'
                   '{"add": {"path": "data/f2.parquet", "rows": 4}}')
    with pytest.raises(TxCorruption, match="no count trailer"):
        t.read().collect()
    t.repair_torn_commit(victim)
    raw = open(f"{tmp_path}/boundary/_txlog/{victim:020d}.json").read()
    assert json.loads(raw) == {"commit": {"actions": 0, "repaired": True}}
    assert t.read().count() == 8


def test_repair_is_idempotent_and_bounds_checked(spark, tmp_path):
    t = _make_table(spark, tmp_path, "idem")
    victim = t.version + 1
    _crash_publish(t, victim, "")
    t.repair_torn_commit(victim)
    with pytest.raises(ValueError, match="refusing"):
        t.repair_torn_commit(victim)  # already repaired == intact
    with pytest.raises(ValueError, match="out of range"):
        t.repair_torn_commit(victim + 7)


def test_concurrent_commit_surfaces_torn_intervening_version(spark, tmp_path):
    """A writer validating intervening commits must also refuse to build
    on a torn one — optimistic concurrency reads the same wire format."""
    t = _make_table(spark, tmp_path, "conc")
    stale_version = t.version  # snapshot read BEFORE the tear appears
    _crash_publish(t, t.version + 1, "")
    inc = spark.createDataFrame([(99, 990)], "k int, v int").coalesce(1)
    staged = t._stage(inc, ["k"])
    with pytest.raises(TxCorruption):
        t._commit(staged, read_version=stale_version)
