"""Batch reads of a transaction-log table as a first-class source:
``spark.read.format("txlog").option("path", ...)``.

:meth:`~..operators.txlog.TxTable.read` already gives snapshot reads,
but it hands Spark an explicit file list — data skipping happens only
inside MERGE's planner. This Spark 4 Python DataSource moves the
log's per-file min/max stats INTO scan planning via ``pushFilters``:
a predicate on any stat column prunes files before a single task
launches, composing with whatever the query does downstream. Options:

* ``path`` (required) — table root.
* ``versionAsOf`` — time travel to that snapshot (default: latest).

Filter pushdown is PRUNING-ONLY and therefore always sound: every
pushed filter is yielded back to Spark (rows are re-filtered
post-scan), the reader merely refuses to schedule files whose
[min, max] range provably cannot contain a matching row — the same
one-sided contract as parquet row-group skipping. Equality, IN, and
all four range comparators participate; anything else (or a column
without stats) degrades to "read the file".

Everything planner-side is plain IO over the KB-sized JSON log
(checkpoint-accelerated — same O(interval) bound as
``TxTable._snapshot``); each partition is ONE live data file read
with pyarrow on an executor, null-filling columns added after the
file was written (schema evolution). No SparkSession is touched
anywhere in the source, so it works identically under driver-owned
and factory sessions.

Follows the PUBLIC Delta/Iceberg stat-pruning design; reference has
no counterpart (its warehouse prunes micro-partitions server-side).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

from .txlog_stream import _LOG_DIR, _latest_version, _read_commit

_CKPT = ".checkpoint.json"


def _fold_snapshot(table: str, version: int | None = None):
    """Plain-IO twin of ``TxTable._snapshot``: (version, meta, live),
    folding forward from the newest checkpoint at-or-before the target
    version. Kept session-free so scan planning never needs a JVM."""
    latest = _latest_version(table)
    v = latest if version is None else version
    if not 0 <= v <= latest:
        raise ValueError(f"versionAsOf {v} out of range 0..{latest}")
    log = os.path.join(table, _LOG_DIR)
    ckpts = [int(f[:-len(_CKPT)]) for f in os.listdir(log)
             if f.endswith(_CKPT) and f[:-len(_CKPT)].isdigit()
             and int(f[:-len(_CKPT)]) <= v]
    meta: dict = {}
    live: dict[str, dict] = {}
    start = 0
    if ckpts:
        cv = max(ckpts)
        with open(os.path.join(log, f"{cv:020d}{_CKPT}"),
                  encoding="utf-8") as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "meta" in action:
                    meta = action["meta"]
                elif "add" in action:
                    live[action["add"]["path"]] = action["add"]
        start = cv + 1
    for i in range(start, v + 1):
        for action in _read_commit(table, i):
            if "meta" in action:
                meta = action["meta"]
            elif "add" in action:
                live[action["add"]["path"]] = action["add"]
            elif "remove" in action:
                live.pop(action["remove"]["path"], None)
    if not meta:
        raise ValueError(f"{table}: no meta action found in the log")
    return v, meta, live


def _range_can_match(lo, hi, f: Filter) -> bool:
    """Can a file whose column spans [lo, hi] hold a row matching f?
    Any uncertainty (absent stats, unknown filter) answers True — the
    pruning is one-sided by contract."""
    if lo is None or hi is None:
        return True
    try:
        if isinstance(f, EqualTo):
            return lo <= f.value <= hi
        if isinstance(f, In):
            return any(lo <= val <= hi for val in f.value)
        if isinstance(f, GreaterThan):
            return hi > f.value
        if isinstance(f, GreaterThanOrEqual):
            return hi >= f.value
        if isinstance(f, LessThan):
            return lo < f.value
        if isinstance(f, LessThanOrEqual):
            return lo <= f.value
    except TypeError:
        return True  # incomparable literal (e.g. cross-type): keep
    return True


@dataclass
class TxFilePartition(InputPartition):
    file_path: str


class TxLogBatchReader(DataSourceReader):
    """One partition per live file surviving stat pruning."""

    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("txlog requires option 'path'")
        self.table = path.rstrip("/")
        version = options.get("versionAsOf")
        v = int(version) if version is not None else None
        _, meta, live = _fold_snapshot(self.table, v)
        self.fields = [f.name for f in
                       StructType.fromJson(meta["schema"]).fields]
        self.live = live

    def pushFilters(self, filters: "list[Filter]") -> "Iterator[Filter]":
        """Record every filter for file pruning, and hand every filter
        straight back to Spark: the scan only ever SKIPS files whose
        stat range cannot match, never claims to have applied a
        predicate row-level."""
        self._filters = [f for f in filters
                         if len(f.attribute) == 1]  # no nested paths
        yield from filters

    def partitions(self) -> Sequence[TxFilePartition]:
        keep = []
        for path in sorted(self.live):
            stats = self.live[path].get("stats") or {}
            ok = True
            for f in getattr(self, "_filters", []):
                col = f.attribute[0]
                if col not in stats:
                    continue
                lo, hi = stats[col]
                if not _range_can_match(lo, hi, f):
                    ok = False
                    break
            if ok:
                keep.append(TxFilePartition(
                    os.path.join(self.table, path)))
        return keep

    def read(self, partition: TxFilePartition) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        table = pq.read_table(partition.file_path)
        present = set(table.column_names)
        cols = [table.column(name).to_pylist() if name in present
                else [None] * table.num_rows for name in self.fields]
        yield from zip(*cols)


class TxLogDataSource(DataSource):
    """``format("txlog")`` — snapshot reads with log-stat file skipping."""

    @classmethod
    def name(cls) -> str:
        return "txlog"

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("txlog requires option 'path'")
        version = self.options.get("versionAsOf")
        _, meta, _ = _fold_snapshot(
            path.rstrip("/"),
            int(version) if version is not None else None)
        return StructType.fromJson(meta["schema"])

    def reader(self, schema) -> TxLogBatchReader:
        return TxLogBatchReader(self.options)


def register(spark) -> None:
    """Make ``spark.read.format("txlog")`` available on this session
    (and enable Python-source filter pushdown, the same runtime conf
    the weather API source flips)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(TxLogDataSource)
