"""End-to-end engine-native ingest: the reference's whole extract→stage
contract (``extract_weather_from_meteomatics.py:43-44`` — fetch per
(location, run_date) — composed with ``stg_weather_raw.sql:3-25`` — keyed
MERGE into the staging table) as ONE package call
(:func:`sources.ingest.stream_ingest_to_txlog`):

    spark.readStream.format("weather_api")      (bounded backfill stream)
      → typed payload validation (RAW_WEATHER_SCHEMA parse + status gate)
      → TxTable.merge_upsert                    (atomic keyed MERGE)

with a crash INJECTED BETWEEN the table commit and the stream checkpoint
commit — the exact window where a naive sink duplicates. Restart replays
the uncommitted batch; the keyed MERGE makes the replay idempotent, so
exactly-once holds at the TABLE level (no duplicate
(city, run_date, parameter, reading_datetime) keys, no lost days, and a
deterministic version history).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from meteomatics_e2e_data_pipeline_spark.operators.txlog import TxTable
from meteomatics_e2e_data_pipeline_spark.sources.fixtures import (
    FLOAT_PARAMS,
    LOCATIONS,
    RUN_DATES,
    SUN_PARAMS,
)
from meteomatics_e2e_data_pipeline_spark.sources.ingest import (
    READING_KEYS,
    stream_ingest_to_txlog,
)

# per payload: hourly readings over day-1..day+7 inclusive for each float
# param, daily for each sun param (sources/fixtures.py:_payload)
READINGS_PER_PAYLOAD = len(FLOAT_PARAMS) * 193 + len(SUN_PARAMS) * 9


def _capture_on_failure(fn):
    """Failure-artifact hook (round-14 verdict #5): these two e2e
    streaming tests each went red ONCE to a load transient in round 13
    and the detail was lost to output trimming. On any failure this
    wrapper preserves everything a post-mortem needs — the full
    traceback, the stacks of every live thread (a hang/timeout shows
    WHERE), the box-load counters (the transient hypothesis needs
    exactly these), and the complete tmp_path tree (txlog commit logs +
    stream checkpoint offsets/commits — the ground truth of which
    commits/batches landed) — under /tmp/spark_graft_failures/<test>-
    <pid>-<seq>/, and re-raises with the artifact dir NAMED in the
    message so even a trimmed pytest tail points at it."""
    import functools

    @functools.wraps(fn)
    def wrapped(spark, tmp_path):
        try:
            return fn(spark, tmp_path)
        except BaseException as exc:
            import faulthandler
            import io
            import os
            import shutil
            import traceback
            base = "/tmp/spark_graft_failures"
            seq = 0
            while True:
                dest = (f"{base}/{fn.__name__.removeprefix('_heavy_')}"
                        f"-{os.getpid()}-{seq}")
                if not os.path.exists(dest):
                    break
                seq += 1
            os.makedirs(dest, exist_ok=True)
            with open(f"{dest}/traceback.txt", "w") as fh:
                fh.write(traceback.format_exc())
            buf = io.StringIO()
            try:
                faulthandler.dump_traceback(file=buf)
            except Exception:
                pass
            with open(f"{dest}/thread_stacks.txt", "w") as fh:
                fh.write(buf.getvalue())
            for proc in ("loadavg", "meminfo"):
                try:
                    shutil.copy(f"/proc/{proc}", f"{dest}/{proc}")
                except OSError:
                    pass
            try:
                shutil.copytree(str(tmp_path), f"{dest}/state",
                                dirs_exist_ok=True)
            except OSError:
                pass
            msg = (f"{exc} [failure artifacts preserved at {dest}: "
                   f"traceback, all-thread stacks, loadavg/meminfo, "
                   f"full checkpoint+table state]")
            try:
                new = type(exc)(msg)
            except Exception:  # exotic ctor (Py4J etc.): keep the info
                new = RuntimeError(msg)
            raise new.with_traceback(exc.__traceback__) from None
    return wrapped


@_capture_on_failure
def _heavy_test_stream_validate_merge_survives_crash_between_commits(
        spark, tmp_path):
    ckpt, table = str(tmp_path / "ckpt"), str(tmp_path / "table")
    crash = {"armed": False}

    def maybe_crash(batch_id: int) -> None:
        if crash["armed"]:
            crash["armed"] = False
            # the table commit IS published; the stream checkpoint commit
            # for this batch is not — the engine replays it on restart
            raise RuntimeError("injected crash after table commit")

    def run(end_date):
        return stream_ingest_to_txlog(
            spark, table, ckpt, RUN_DATES[0], end_date,
            after_batch=maybe_crash)

    # phase 1: first two days, crash AFTER the merge publishes
    crash["armed"] = True
    exc = run(RUN_DATES[1])
    assert exc is not None and "injected crash" in str(exc)
    t = TxTable(spark, table)
    assert (t.read().select("city", "run_date").distinct().count()
            == len(LOCATIONS) * 2)
    v_after_crash = t.version

    # phase 2: restart, same range — the engine REPLAYS the uncommitted
    # batch; the keyed MERGE must drop every replayed row
    assert run(RUN_DATES[1]) is None
    t = TxTable(spark, table)
    assert t.read().count() == len(LOCATIONS) * 2 * READINGS_PER_PAYLOAD
    v_after_replay = t.version
    # the replayed batch is 100% duplicate keys → insert-only MERGE stages
    # nothing and publishes NO commit: the replay is a true no-op
    assert v_after_replay == v_after_crash

    # phase 3: extend the backfill — only the NEW days stream
    assert run(RUN_DATES[-1]) is None
    t = TxTable(spark, table)
    rows = t.read()
    n = rows.count()
    assert n == len(LOCATIONS) * len(RUN_DATES) * READINGS_PER_PAYLOAD
    # exactly-once at the TABLE level: the key set is exactly the grain
    assert rows.select(*READING_KEYS).distinct().count() == n
    assert (rows.select("run_date").distinct().count() == len(RUN_DATES))
    # deterministic history: create (v0) + the crash-run merge (v1) + the
    # extension merge (v2); the replay published nothing
    assert t.version == v_after_replay + 1 == 2
    # time travel still reaches the pre-extension snapshot
    assert (t.read(version=v_after_replay).count()
            == len(LOCATIONS) * 2 * READINGS_PER_PAYLOAD)


@_capture_on_failure
def _heavy_test_full_relay_api_stream_to_txlog_to_cdc_consumer(spark, tmp_path):
    """The whole lakehouse relay from round 10's pieces: the weather API
    streams INTO the transaction-log table (stream_ingest_to_txlog),
    and a second, independent streaming query follows the SAME table
    OUT via the txlog_cdc change feed into a downstream store — after
    each leg, the maintained downstream per-(city, parameter) counts
    equal a full recompute over the table snapshot, across a backfill
    extension (new commits stream incrementally, no recompute)."""
    from meteomatics_e2e_data_pipeline_spark.sources import txlog_stream

    txlog_stream.register(spark)
    table = str(tmp_path / "table")
    ck_in, ck_out = str(tmp_path / "ck_in"), str(tmp_path / "ck_out")
    out = str(tmp_path / "downstream")

    def relay(end_date):
        assert stream_ingest_to_txlog(
            spark, table, ck_in, RUN_DATES[0], end_date) is None
        q = (spark.readStream.format("txlog_cdc").option("path", table)
             .option("startingVersion", 0).load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ck_out)
             .trigger(availableNow=True).outputMode("append").start())
        q.awaitTermination()

    for end in (RUN_DATES[1], RUN_DATES[-1]):
        relay(end)
        feed = spark.read.parquet(out)
        # insert-only MERGE ⇒ the feed is pure inserts; maintained counts
        # from the feed alone must equal the snapshot recompute
        assert feed.filter("_change_type <> 'insert'").count() == 0
        maintained = {(r["city"], r["parameter"]): r["n"] for r in
                      feed.groupBy("city", "parameter")
                      .agg(F.count(F.lit(1)).alias("n")).collect()}
        full = {(r["city"], r["parameter"]): r["n"] for r in
                TxTable(spark, table).read().groupBy("city", "parameter")
                .agg(F.count(F.lit(1)).alias("n")).collect()}
        assert maintained == full and maintained

    # table maintenance mid-pipeline: the per-leg merges left one file
    # each — compact them. A further relay drain must see NOTHING from
    # the compaction (dataChange=false): the downstream store is not
    # re-fed because the table's layout improved.
    t = TxTable(spark, table)
    assert len(t.live_files()) > 1
    v = t.optimize(target_rows=1_000_000)
    assert v == t.version and len(t.live_files()) == 1
    rows_before = spark.read.parquet(out).count()
    relay(RUN_DATES[-1])
    assert spark.read.parquet(out).count() == rows_before
    full = {(r["city"], r["parameter"]): r["n"] for r in
            t.read().groupBy("city", "parameter")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert full == maintained

# ---------------------------------------------------------------------------
# Pooled heavy bodies (runtime-budget lever; see conftest.pool_bodies):
# independent bodies run concurrently under one module fixture, each
# keeping its own pytest row. Tests that mutate process-global state
# (class attributes, spark conf) are deliberately NOT pooled.
# ---------------------------------------------------------------------------

_POOLED = {
    "test_stream_validate_merge_survives_crash_between_commits": _heavy_test_stream_validate_merge_survives_crash_between_commits,
    "test_full_relay_api_stream_to_txlog_to_cdc_consumer": _heavy_test_full_relay_api_stream_to_txlog_to_cdc_consumer,
}


@pytest.fixture(scope="module")
def e2e_pool(_heavy_pool):
    # touch all (submits on targeted runs), then join only
    # THIS module futures; the rest keep draining
    futs = {n: _heavy_pool["tests.test_e2e_ingest::" + n]
            for n in _POOLED}
    return {n: f.result() for n, f in futs.items()}


def test_stream_validate_merge_survives_crash_between_commits(e2e_pool):
    ex = e2e_pool["test_stream_validate_merge_survives_crash_between_commits"]
    if ex is not None:
        raise ex


def test_full_relay_api_stream_to_txlog_to_cdc_consumer(e2e_pool):
    ex = e2e_pool["test_full_relay_api_stream_to_txlog_to_cdc_consumer"]
    if ex is not None:
        raise ex

