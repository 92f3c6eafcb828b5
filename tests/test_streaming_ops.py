"""Streaming operators beyond ingest: watermarked windowed aggregation and
the applyInPandasWithState custom stateful operator — each cross-checked
against its batch twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meteomatics_e2e_data_pipeline_spark.sources.tables import load_table
from meteomatics_e2e_data_pipeline_spark.streaming import (
    stream_bronze_upsert, stream_events_hourly, stream_user_event_totals,
    stream_user_sessions,
)

EVENTS_DIR = "/root/testdata/sf0.001"


def _split_events(tmp_path, n_files: int = 6, remap_user: bool = False):
    """Write the events table as ``n_files`` chronological parquet files
    with increasing mtimes (the file source orders new files by
    modification time) — with ``maxFilesPerTrigger=1`` an availableNow
    run becomes genuinely MULTI-batch, exercising cross-batch state and
    watermark advancement that a single-file source structurally cannot
    (the watermark is 0 during the only batch). ``remap_user`` swaps
    user_id for the unique event_id so per-window distinct counts never
    saturate (the sf0.001 table has only 15 users). Returns the source
    dir path."""
    import os

    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    tbl = pq.read_table(f"{EVENTS_DIR}/events.parquet").sort_by(
        [("ts", "ascending"), ("event_id", "ascending")])
    if remap_user:
        tbl = tbl.set_column(tbl.schema.get_field_index("user_id"),
                             "user_id", tbl.column("event_id"))
    n = tbl.num_rows
    cuts = [round(i * n / n_files) for i in range(n_files + 1)]
    for i in range(n_files):
        path = str(src / f"events_{i:02d}.parquet")
        pq.write_table(tbl.slice(cuts[i], cuts[i + 1] - cuts[i]), path)
        os.utime(path, (1_000_000 + i * 60, 1_000_000 + i * 60))
    return str(src)


def _n_commits(tmp_path) -> int:
    import os
    return len([f for f in os.listdir(tmp_path / "ck" / "commits")
                if not f.startswith(".")])


def test_stream_hourly_matches_batch_for_closed_windows(spark, tmp_path):
    target, ckpt = str(tmp_path / "agg"), str(tmp_path / "ck")
    stream_events_hourly(spark, EVENTS_DIR, target, ckpt)
    got = spark.read.parquet(target)

    batch = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
    )
    # Append mode emits only windows the watermark has passed; everything
    # emitted must equal the batch result for those windows, and only the
    # trailing windows (within the 1h watermark of max ts) may be pending.
    max_ts = batch.agg(F.max("hour")).first()[0]
    emitted = {tuple(r) for r in got.collect()}
    closed = {tuple(r) for r in batch.collect()
              if (max_ts - r["hour"]).total_seconds() > 2 * 3600}
    assert closed <= emitted
    assert emitted <= {tuple(r) for r in batch.collect()}
    assert len(emitted) > 0


def test_session_windows_match_batch_sessionize(spark, tmp_path):
    """Closed native session windows must agree with the batch lag+cumsum
    sessionization: same per-user session count over the closed range."""
    name = "sessions_test"
    # Multi-batch: sessions spanning batch boundaries must merge in
    # state and close only once the watermark passes their end.
    stream_user_sessions(spark, _split_events(tmp_path),
                         str(tmp_path / "ck"), name,
                         max_files_per_trigger=1)
    assert _n_commits(tmp_path) >= 6
    got = spark.sql(f"SELECT * FROM {name}")
    assert got.count() > 0

    from meteomatics_e2e_data_pipeline_spark.plans.analytics import (
        q_sessionize_events,
    )
    batch = q_sessionize_events(spark, EVENTS_DIR)
    ev = load_table(spark, EVENTS_DIR, "events")
    max_ts = ev.agg(F.max("ts")).first()[0]
    # sessions that end well before the watermark horizon must match
    import datetime as dt
    horizon = max_ts - dt.timedelta(hours=2)
    closed_stream = got.filter(F.col("session_end") < horizon)
    # batch: session count per user over events strictly before horizon
    batch_sessions = (
        ev.join(batch, ["user_id", "event_id"])
        .filter(F.col("ts") < F.lit(horizon) - F.expr("INTERVAL 30 MINUTES"))
        .select("user_id", "session_id").distinct()
        .groupBy("user_id").count()
    )
    stream_counts = {r["user_id"]: r["count"] for r in
                     closed_stream.groupBy("user_id").count().collect()}
    batch_counts = {r["user_id"]: r["count"] for r in
                    batch_sessions.collect()}
    # closed-session counts may differ by the boundary session per user;
    # assert they are within 1 for every user and mostly equal
    diffs = [abs(stream_counts.get(u, 0) - batch_counts[u])
             for u in batch_counts]
    assert all(d <= 1 for d in diffs)
    assert sum(1 for d in diffs if d == 0) >= len(diffs) * 0.8


def test_stream_upsert_dedupes_renamed_redelivery(spark, tmp_path):
    """foreachBatch + upsert: a reading redelivered under a DIFFERENT
    file name (new fetch of the same content) must not duplicate records
    when the upsert keys exclude file_path."""
    import shutil

    from meteomatics_e2e_data_pipeline_spark.sources.fixtures import (
        ensure_fixtures,
    )
    lake = tmp_path / "lake"
    ensure_fixtures(lake)
    target, ckpt = str(tmp_path / "stg"), str(tmp_path / "ck")
    keys = ["city", "parameter", "reading_datetime", "date_generated"]

    stream_bronze_upsert(spark, f"{lake}/*/*/*.json", target, ckpt, keys)
    n1 = spark.read.parquet(target).count()
    assert n1 > 0

    # redeliver one file under a new name -> new file-log entry, same keys
    src = next((lake / "estonia" / "tallinn").glob("*.json"))
    shutil.copy(src, src.with_name("weather_raw_redelivered.json"))
    stream_bronze_upsert(spark, f"{lake}/*/*/*.json", target, ckpt, keys)
    assert spark.read.parquet(target).count() == n1  # record grain held


def test_stateful_totals_match_batch(spark, tmp_path):
    """Multi-batch run: each user emits one row per batch with the
    cumulative total so far — the FINAL (max-n) emission must equal the
    batch rollup, proving state genuinely carries across batches (the
    state.exists branch a single-batch run never takes)."""
    name = "user_totals_test"
    stream_user_event_totals(spark, _split_events(tmp_path),
                             str(tmp_path / "ck"), name,
                             max_files_per_trigger=1)
    assert _n_commits(tmp_path) >= 6
    got = {}
    for r in spark.sql(f"SELECT * FROM {name}").collect():
        u = r["user_id"]
        if u not in got or r["n_events"] > got[u][0]:
            got[u] = (r["n_events"], r["total_value"])

    batch = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 2).alias("t"))
    )
    expected = {r["user_id"]: (r["n"], r["t"]) for r in batch.collect()}
    assert set(got) == set(expected)
    mismatches = {u: (got[u], expected[u]) for u in expected
                  if got[u][0] != expected[u][0]
                  or abs(got[u][1] - expected[u][1]) > 0.01}
    assert not mismatches


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs the protobuf package for "
           "its state-server protocol (its driver worker dies with "
           "ImportError: google.protobuf otherwise) — absent in this "
           "container and pip installs are barred; the op targets the "
           "API for protobuf-equipped clusters",
)
def test_stateful_totals_tws_matches_batch(spark, tmp_path):
    """transformWithStateInPandas twin (Spark 4 typed-state API): the
    final per-user emission across a multi-batch run must equal the
    batch rollup — same contract as the applyInPandasWithState twin,
    proving the ValueState genuinely carries across batches."""
    from meteomatics_e2e_data_pipeline_spark.streaming import (
        stream_user_event_totals_tws,
    )

    name = "user_totals_tws_test"
    stream_user_event_totals_tws(spark, _split_events(tmp_path),
                                 str(tmp_path / "ck"), name,
                                 max_files_per_trigger=1)
    assert _n_commits(tmp_path) >= 6
    got = {}
    for r in spark.sql(f"SELECT * FROM {name}").collect():
        u = r["user_id"]
        if u not in got or r["n_events"] > got[u][0]:
            got[u] = (r["n_events"], r["total_value"])

    batch = (
        load_table(spark, EVENTS_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 2).alias("t"))
    )
    expected = {r["user_id"]: (r["n"], r["t"]) for r in batch.collect()}
    assert set(got) == set(expected)
    assert all(got[u][0] == expected[u][0]
               and abs(got[u][1] - expected[u][1]) <= 0.01
               for u in expected)


def test_stream_dedup_exact_drops_redelivery(spark, tmp_path):
    """Duplicate content (even with different doc ids / whitespace) is
    dropped within the watermark; distinct content survives."""
    import datetime as dt

    from meteomatics_e2e_data_pipeline_spark.streaming import (
        stream_dedup_exact,
    )

    import os
    import time

    src = tmp_path / "docs_in"
    src.mkdir()
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows0 = [
        (1, "hello world", t0),
        (2, "  Hello   WORLD ", t0 + dt.timedelta(minutes=1)),  # dup, msgy ws
        (3, "something else", t0 + dt.timedelta(minutes=2)),
        (4, "hello world", t0 + dt.timedelta(minutes=3)),       # dup again
        (5, "third text", t0 + dt.timedelta(minutes=4)),
    ]
    # Second FILE = second micro-batch (maxFilesPerTrigger=1): a
    # redelivery arriving a batch later but inside the watermark must
    # be dropped from dedupe STATE, not just batch-locally; one new
    # content proves the state isn't over-dropping either.
    rows1 = [
        (6, "HELLO  world", t0 + dt.timedelta(minutes=6)),      # late dup
        (7, "fourth text", t0 + dt.timedelta(minutes=7)),
    ]
    for i, rows in enumerate([rows0, rows1]):
        spark.createDataFrame(
            rows, "doc_id long, text string, ingest_ts timestamp") \
            .coalesce(1).write.parquet(str(src / f"batch{i}"))
        for root, _, files in os.walk(str(src / f"batch{i}")):
            for f in files:
                os.utime(os.path.join(root, f),
                         (1_000_000 + i * 60, 1_000_000 + i * 60))

    stream = (spark.readStream
              .schema("doc_id long, text string, ingest_ts timestamp")
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src)))
    out = stream_dedup_exact(stream, "ingest_ts", watermark="10 minutes")
    q = (out.writeStream.format("parquet")
         .option("path", str(tmp_path / "deduped"))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .outputMode("append")
         .start())
    q.awaitTermination()

    got = spark.read.parquet(str(tmp_path / "deduped"))
    texts = sorted(r["text"].strip().lower() for r in got.collect())
    assert len(texts) == 4                       # one per distinct content
    assert "something else" in texts and "third text" in texts
    assert "fourth text" in texts                # new content passes
    assert sum(1 for t in texts
               if " ".join(t.split()) == "hello world") == 1  # x-batch drop
    commits = [f for f in os.listdir(tmp_path / "ckpt" / "commits")
               if not f.startswith(".")]
    assert len(commits) >= 2                     # genuinely multi-batch


def test_stream_enrich_against_static_dim(spark, tmp_path):
    from meteomatics_e2e_data_pipeline_spark.streaming import stream_enrich

    src = tmp_path / "ev"
    src.mkdir()
    spark.createDataFrame(
        [(1, "berlin"), (2, "paris"), (3, "atlantis")],
        "event_id long, city string").write.parquet(str(src / "b0"))
    dim = spark.createDataFrame(
        [("berlin", 52.52), ("paris", 48.86)], "city string, lat double")

    stream = (spark.readStream.schema("event_id long, city string")
              .option("recursiveFileLookup", "true").parquet(str(src)))
    q = (stream_enrich(stream, dim, ["city"])
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).outputMode("append").start())
    q.awaitTermination()

    got = {r["city"]: r["lat"] for r in
           spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got == {"berlin": 52.52, "paris": 48.86, "atlantis": None}


def test_stream_stratified_sample_matches_batch_sample(spark, tmp_path):
    """The streaming sample admits EXACTLY the rows the batch sample
    admits (same salt) — the reconcilability contract that makes a
    mixed batch/streaming mix-building pipeline sound."""
    from meteomatics_e2e_data_pipeline_spark.operators.sampling import (
        stratified_sample,
    )
    from meteomatics_e2e_data_pipeline_spark.streaming import (
        stream_stratified_sample,
    )

    rows = [(i, f"txt {i}", ["en", "de"][i % 2], "src0") for i in range(300)]
    schema = "doc_id long, text string, lang string, source string"
    batch = spark.createDataFrame(rows, schema)
    rates = {("en", "src0"): 0.5, ("de", "src0"): 0.2}

    src = tmp_path / "docs"
    src.mkdir()
    batch.coalesce(1).write.parquet(str(src / "b0"))
    stream = (spark.readStream.schema(schema)
              .option("recursiveFileLookup", "true").parquet(str(src)))
    q = (stream_stratified_sample(stream, rates, salt="sX")
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).outputMode("append").start())
    q.awaitTermination()

    got = {r["doc_id"] for r in
           spark.read.parquet(str(tmp_path / "out")).collect()}
    want = {r["doc_id"] for r in
            stratified_sample(batch, rates, salt="sX").collect()}
    assert got == want and 0 < len(want) < 300


def test_stream_contamination_flags_match_batch_operator(spark, tmp_path):
    """The streaming decontamination twin must flag EXACTLY the docs the
    batch operator counts, with the same hit counts, and clean docs get
    n_hits = 0 (filterable stateless-ly)."""
    from meteomatics_e2e_data_pipeline_spark.operators.neardup import (
        contamination_hits, shingle_hashes,
    )
    from meteomatics_e2e_data_pipeline_spark.streaming import (
        stream_contamination_flags,
    )

    bench = spark.createDataFrame(
        [(900, "alpha beta gamma delta epsilon")],
        "doc_id long, text string")
    rows = [(1, "x alpha beta gamma y"), (2, "clean words only here"),
            (3, "beta gamma delta epsilon tail")]
    schema = "doc_id long, text string"
    batch = spark.createDataFrame(rows, schema)

    bench_hvs = {r["hv"] for r in
                 shingle_hashes(bench, "doc_id", "text", 3).collect()}
    src = tmp_path / "docs"
    src.mkdir()
    batch.coalesce(1).write.parquet(str(src / "b0"))
    stream = (spark.readStream.schema(schema)
              .option("recursiveFileLookup", "true").parquet(str(src)))
    q = (stream_contamination_flags(stream, bench_hvs)
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).outputMode("append").start())
    q.awaitTermination()

    got = {r["doc_id"]: r["n_hits"] for r in
           spark.read.parquet(str(tmp_path / "out")).collect()}
    want = {r["doc_id"]: r["n_hits"] for r in
            contamination_hits(batch, bench).collect()}
    assert {k: v for k, v in got.items() if v > 0} == want
    assert got[2] == 0


def test_stream_ewma_matches_batch(spark, tmp_path):
    from meteomatics_e2e_data_pipeline_spark.plans.timeseries import (
        q_events_ewma)
    from meteomatics_e2e_data_pipeline_spark.streaming import stream_ewma

    name = "ewma_stream_test"
    # Multi-batch: late batches add counts to already-seen days and the
    # dependent EWMA tail re-emits — the cross-batch state-merge path a
    # single-batch run never takes.
    stream_ewma(spark, _split_events(tmp_path), str(tmp_path / "ck"), name,
                max_files_per_trigger=1)
    assert _n_commits(tmp_path) >= 6
    # update-mode memory sink: the sink does not guarantee row order
    # across micro-batches, so take the max-seq emission per (type, day)
    got, got_seq = {}, {}
    for r in spark.sql(f"SELECT * FROM {name}").collect():
        k = (r["event_type"], r["day"])
        if k not in got_seq or r["seq"] > got_seq[k]:
            got_seq[k] = r["seq"]
            got[k] = (r["n"], r["ewma"])

    expected = {(r["event_type"], str(r["day"])): (r["n"], r["ewma"])
                for r in q_events_ewma(spark,
                                       "/root/testdata/sf0.001").collect()}
    assert set(got) == set(expected)
    mismatches = {k: (got[k], expected[k]) for k in expected
                  if got[k][0] != expected[k][0]
                  or abs(got[k][1] - expected[k][1]) > 1e-6}
    assert not mismatches


def _mg_final_rows(spark, name):
    """Max-seq emission per shard (update-mode sink read protocol)."""
    by_shard = {}
    for r in spark.sql(f"SELECT * FROM {name}").collect():
        by_shard.setdefault(r["shard"], []).append(r)
    out = []
    for shard, rows in by_shard.items():
        top = max(r["seq"] for r in rows)
        out.extend(r for r in rows if r["seq"] == top)
    return out


def test_stream_heavy_hitters_exact_when_capacity_suffices(spark, tmp_path):
    from meteomatics_e2e_data_pipeline_spark.sources.tables import load_table
    from meteomatics_e2e_data_pipeline_spark.streaming import (
        stream_heavy_hitters)

    # Multi-batch: the MG summary must merge correctly across batches
    # (no decrements at this capacity → exact regardless of batching).
    name = "mg_exact_test"
    stream_heavy_hitters(spark, _split_events(tmp_path),
                         str(tmp_path / "ck"), name,
                         capacity=64, n_shards=4, max_files_per_trigger=1)
    assert _n_commits(tmp_path) >= 6
    rows = _mg_final_rows(spark, name)
    truth = {r["user_id"]: r["n"] for r in
             load_table(spark, EVENTS_DIR, "events")
             .groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    assert all(r["decrements"] == 0 for r in rows)
    got = {r["user_id"]: r["mg_count"] for r in rows}
    assert got == truth                 # capacity >= distinct/shard → exact
    # shard totals partition the stream
    n_by_shard = {r["shard"]: r["n_shard"] for r in rows}
    assert sum(n_by_shard.values()) == sum(truth.values())


def test_stream_heavy_hitters_bounded_state_invariants(spark, tmp_path):
    """capacity=2 forces the Misra-Gries decrement path; the summary
    must keep its guarantees: counts underestimate by at most the
    decrement total, and every key more frequent than the decrement
    total is still tracked."""
    from meteomatics_e2e_data_pipeline_spark.sources.tables import load_table
    from meteomatics_e2e_data_pipeline_spark.streaming import (
        stream_heavy_hitters)

    sf = "/root/testdata/sf0.001"
    name = "mg_bounded_test"
    stream_heavy_hitters(spark, sf, str(tmp_path / "ck"), name,
                         capacity=2, n_shards=1)
    rows = _mg_final_rows(spark, name)
    assert len(rows) <= 2               # state truly bounded
    truth = {r["user_id"]: r["n"] for r in
             load_table(spark, sf, "events")
             .groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    dec = rows[0]["decrements"]
    assert dec > 0                      # the lossy path actually ran
    got = {r["user_id"]: r["mg_count"] for r in rows}
    for u, c in got.items():
        assert c <= truth[u]                      # never overestimates
        assert truth[u] - c <= dec                # bounded underestimate
    for u, c in truth.items():
        if c > dec:
            assert u in got                       # heavy keys survive


def _heavy_test_stream_stream_join_matches_batch_interval_join(spark, tmp_path):
    """Inner stream-stream joins emit every match (watermarks only gate
    state eviction), so an availableNow pass must equal the batch
    interval join exactly — including across MULTIPLE batches, where a
    click may arrive a batch after its view (the view must still be in
    state: chronological arrival + the 1 h watermark guarantee every
    view outlives its 30 min match horizon)."""
    from meteomatics_e2e_data_pipeline_spark.streaming import (
        stream_click_attribution,
    )

    name = "attribution_test"
    stream_click_attribution(spark, _split_events(tmp_path),
                             str(tmp_path / "ck"), name,
                             max_files_per_trigger=1)
    assert _n_commits(tmp_path) >= 6
    got = {tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()}

    ev = load_table(spark, EVENTS_DIR, "events")
    views = (ev.filter(F.col("event_type") == "view")
             .select(F.col("event_id").alias("view_id"), "user_id",
                     F.col("ts").alias("view_ts")))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_id"),
                      F.col("user_id").alias("click_user"),
                      F.col("ts").alias("click_ts")))
    batch = (
        views.join(clicks,
                   (F.col("user_id") == F.col("click_user"))
                   & (F.col("click_ts") >= F.col("view_ts"))
                   & (F.col("click_ts")
                      <= F.col("view_ts") + F.expr("INTERVAL 30 minutes")))
        .select("user_id", "view_id", "view_ts", "click_id", "click_ts")
    )
    want = {tuple(r) for r in batch.collect()}
    assert len(want) > 0
    assert got == want


def _heavy_test_stream_outer_join_matches_batch_left_join(spark, tmp_path):
    """LEFT OUTER stream-stream interval join: matched rows emit like
    the inner twin, and a view's NULL row emits only once the watermark
    proves no future click can match (state eviction IS the null
    emission). Drive a multi-batch availableNow run (4 chronological
    files, maxFilesPerTrigger=1) and assert (a) the matched slice
    equals the batch inner join exactly and (b) for views old enough
    that the final watermark closed them, the full outer result —
    nulls included — equals the batch LEFT JOIN."""
    import datetime as dt

    from meteomatics_e2e_data_pipeline_spark.streaming import (
        stream_view_attribution_outer,
    )

    src = _split_events(tmp_path, n_files=4)
    name = "attribution_outer_test"
    stream_view_attribution_outer(spark, src, str(tmp_path / "ck"),
                                  name, max_files_per_trigger=1)
    assert _n_commits(tmp_path) >= 4
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    got = {tuple(r) for r in rows}
    got_matched = {t for t in got if t[3] is not None}

    ev = load_table(spark, EVENTS_DIR, "events")
    views = (ev.filter(F.col("event_type") == "view")
             .select(F.col("event_id").alias("view_id"), "user_id",
                     F.col("ts").alias("view_ts")))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_id"),
                      F.col("user_id").alias("click_user"),
                      F.col("ts").alias("click_ts")))
    cond = ((F.col("user_id") == F.col("click_user"))
            & (F.col("click_ts") >= F.col("view_ts"))
            & (F.col("click_ts")
               <= F.col("view_ts") + F.expr("INTERVAL 30 minutes")))
    batch = (views.join(clicks, cond, "left")
             .select("user_id", "view_id", "view_ts", "click_id",
                     "click_ts"))
    want = {tuple(r) for r in batch.collect()}
    want_matched = {t for t in want if t[3] is not None}
    assert len(want_matched) > 0
    assert got_matched == want_matched

    # Closed horizon: final watermark = max event ts - 1 h; a view is
    # resolved once watermark > view_ts + 30 min. Stay 1 min clear of
    # the boundary.
    max_ts = ev.agg(F.max("ts")).first()[0]
    horizon = max_ts - dt.timedelta(hours=1, minutes=31)
    got_closed = {t for t in got if t[2] <= horizon}
    want_closed = {t for t in want if t[2] <= horizon}
    closed_nulls = {t for t in want_closed if t[3] is None}
    assert len(closed_nulls) > 0          # the test must exercise nulls
    assert got_closed == want_closed


def test_stream_sliding_reach_tracks_batch_exact(spark, tmp_path):
    """Closed sliding windows must land within the HLL error envelope of
    the exact batch trailing-7d distinct count for the same day."""
    import datetime as dt

    from meteomatics_e2e_data_pipeline_spark.plans.analytics import (
        q_events_sliding_reach_7d,
    )
    from meteomatics_e2e_data_pipeline_spark.streaming import (
        stream_sliding_reach,
    )

    name = "sliding_reach_test"
    stream_sliding_reach(spark, EVENTS_DIR, str(tmp_path / "ck"), name)
    got = {r.day: r.approx_users_7d
           for r in spark.sql(f"SELECT * FROM {name}").collect()}
    assert len(got) > 0

    exact = {r.day: r.users_7d
             for r in q_events_sliding_reach_7d(spark, EVENTS_DIR).collect()}
    ev = load_table(spark, EVENTS_DIR, "events")
    max_day = ev.agg(F.max(F.to_date("ts"))).first()[0]
    # append mode: only windows closed by the watermark are emitted, and
    # the streaming frame also covers days before the data start (the
    # batch query restricts to observed days) — compare the overlap
    checked = 0
    for day, approx in got.items():
        if day in exact and day < max_day - dt.timedelta(days=2):
            assert abs(approx - exact[day]) / exact[day] <= 0.05, day
            checked += 1
    assert checked > 0


def _heavy_test_stream_sliding_reach_exact_equals_batch(spark, tmp_path):
    """The EXACT streaming twin (dedupe → windowed count, two chained
    stateful operators): every closed window must equal the batch
    trailing-7d distinct count bit-for-bit — no error envelope.

    The source is split into 15 chronological ~2-day files processed
    with maxFilesPerTrigger=1, so availableNow runs MULTIPLE batches
    with the watermark advancing between them — the shape that caught
    the wend_ts watermark defect (a 1-day delay on a column fanned up
    to 6 days ahead closed each window before most of its contributing
    days arrived, silently undercounting). Strictness was verified
    empirically: the batch span must be SHORTER than the fan-out shift
    minus the delay for the defect to surface (4 ~7.5-day files hide
    it — each batch outruns the watermark's 5-day lead; 15 2-day files
    with the old 1-day delay mismatch 27 of 34 closed windows, while
    the 7-day default mismatches zero). A single-batch run can never
    detect it because the watermark is 0 during the only batch. EVERY
    emitted window (append mode emits only closed, final windows) must
    match the batch value — no skipped tail, no overlap-only
    comparison."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from meteomatics_e2e_data_pipeline_spark.plans.analytics import (
        q_events_sliding_reach_7d,
    )
    from meteomatics_e2e_data_pipeline_spark.streaming import (
        stream_sliding_reach_exact,
    )

    # 15 chronological ~2-day files, user_id remapped to the unique
    # event_id (the sf0.001 table has only 15 users, so every 7-day
    # window would saturate at 15 and hide a dropped-late-row
    # undercount; with unique users each window's distinct-count equals
    # its event count and ANY dropped row shows up as a deficit).
    n_files = 15
    src = _split_events(tmp_path, n_files=n_files, remap_user=True)
    tbl = pq.read_table(src)
    batch_dir = tmp_path / "batch"
    batch_dir.mkdir()
    pq.write_table(tbl, str(batch_dir / "events.parquet"))

    name = "sliding_reach_exact_test"
    stream_sliding_reach_exact(spark, src, str(tmp_path / "ck"), name,
                               max_files_per_trigger=1)
    got = {r.day: r.users_7d
           for r in spark.sql(f"SELECT * FROM {name}").collect()}
    assert len(got) > 0
    assert _n_commits(tmp_path) >= n_files

    exact = {r.day: r.users_7d
             for r in q_events_sliding_reach_7d(
                 spark, str(batch_dir)).collect()}
    # The batch query restricts window-end days to days observed in the
    # data; the streaming fan-out also emits unobserved in-between days
    # (trailing windows whose end day had no events) — those must agree
    # with a direct pair count, while every observed closed day must
    # match the batch query exactly.
    pairs = {(u, d) for u, d in zip(
        tbl.column("user_id").to_pylist(),
        pc.cast(tbl.column("ts"), "date32").to_pylist())}
    import datetime as dt
    checked_observed = 0
    for day, users in got.items():
        want = len({u for u, d in pairs
                    if day - dt.timedelta(days=6) <= d <= day})
        assert users == want, (day, users, want)
        if day in exact:
            assert users == exact[day], day
            checked_observed += 1
    assert checked_observed >= 5
    # No closed observed day may be missing from the emission: every
    # observed day at or below the latest closed day must have emitted.
    horizon = max(got)
    for day in exact:
        if day <= horizon:
            assert day in got, day


def test_stream_daily_reach_hll_equals_batch_sketch(spark, tmp_path):
    """The streaming per-day HLL (mergeable sketch state, unioned
    across batches by the state store) must equal the batch
    hll_sketch_agg estimate BIT-FOR-BIT on every closed window of a
    genuinely multi-batch run — register union is order-insensitive,
    so any deviation means state was lost or double-counted."""
    from meteomatics_e2e_data_pipeline_spark.streaming import (
        stream_daily_reach_hll,
    )

    n_files = 8
    src = _split_events(tmp_path, n_files=n_files, remap_user=True)

    name = "daily_reach_hll_test"
    stream_daily_reach_hll(spark, src, str(tmp_path / "ck"), name,
                           max_files_per_trigger=1)
    got = {r.day: r.approx_users
           for r in spark.sql(f"SELECT * FROM {name}").collect()}
    assert len(got) >= 3
    assert _n_commits(tmp_path) >= n_files

    batch = (spark.read.parquet(src)
             .select(F.col("ts").cast("date").alias("day"), "user_id")
             .groupBy("day")
             .agg(F.hll_sketch_estimate(
                 F.hll_sketch_agg("user_id")).alias("approx_users")))
    want = {r.day: r.approx_users for r in batch.collect()}
    for day, est in got.items():
        assert est == want[day], (day, est, want[day])
    # every batch day at or below the latest closed day must have emitted
    horizon = max(got)
    for day in want:
        if day <= horizon:
            assert day in got, day
    # sanity: with unique users per event the estimate tracks volume
    assert sum(got.values()) > 0


def test_stream_cms_grid_equals_batch_grid(spark, tmp_path):
    """The streaming count-min grid (bounded state: <= depth*width
    cells) must equal the batch grid cell-for-cell after one
    availableNow pass — the cells are deterministic integers."""
    from meteomatics_e2e_data_pipeline_spark.operators.sketches import (
        cms_cells,
    )
    from meteomatics_e2e_data_pipeline_spark.streaming import (
        stream_cms_cells,
    )

    name = "cms_stream_test"
    stream_cms_cells(spark, _split_events(tmp_path), str(tmp_path / "ck"),
                     name, max_files_per_trigger=1)
    assert _n_commits(tmp_path) >= 6
    got = {(r.depth, r.idx): r.cell_n
           for r in spark.sql(f"SELECT * FROM {name}").collect()}
    ev = load_table(spark, EVENTS_DIR, "events")
    want = {(r.depth, r.idx): r.cell_n
            for r in cms_cells(ev, "user_id").collect()}
    assert got == want and len(got) > 0


def test_stream_type_runs_emits_closed_batch_runs(spark, tmp_path):
    """Every run the streaming collapse closes must match the batch
    gaps-and-islands result; only each user's final (still-open) run
    may be missing from the emission."""
    from meteomatics_e2e_data_pipeline_spark.plans.analytics import (
        q_events_type_runs,
    )
    from meteomatics_e2e_data_pipeline_spark.streaming import (
        stream_type_runs,
    )

    name = "type_runs_stream_test"
    # Multi-batch, chronologically split (the op's documented in-order
    # arrival contract): runs spanning a batch boundary must survive in
    # the open-run state and close correctly in a LATER batch.
    stream_type_runs(spark, _split_events(tmp_path), str(tmp_path / "ck"),
                     name, max_files_per_trigger=1)
    assert _n_commits(tmp_path) >= 6
    got = {(r.user_id, r.event_type, r.run_start, r.run_end, r.run_length)
           for r in spark.sql(f"SELECT * FROM {name}").collect()}

    batch = q_events_type_runs(spark, EVENTS_DIR).collect()
    fmt = "%Y-%m-%d %H:%M:%S.%f"
    allruns = {(r.user_id, r.event_type, r.run_start.strftime(fmt),
                r.run_end.strftime(fmt), r.run_length) for r in batch}
    last_per_user = {}
    for r in batch:
        cur = last_per_user.get(r.user_id)
        if cur is None or r.run_start > cur.run_start:
            last_per_user[r.user_id] = r
    open_runs = {(r.user_id, r.event_type, r.run_start.strftime(fmt),
                  r.run_end.strftime(fmt), r.run_length)
                 for r in last_per_user.values()}
    assert got == allruns - open_runs
    assert len(got) > 0


def test_stream_quality_scores_bit_equal_batch(spark, tmp_path):
    """Train-offline / serve-online skew check: every document's
    streaming score equals its batch score BIT-FOR-BIT (same weights
    artifact, same shared expression tree), across multiple
    micro-batches."""
    from meteomatics_e2e_data_pipeline_spark.operators.classifier import (
        FEATURE_COLS, logreg_score, logreg_train, text_feature_exprs,
    )
    from meteomatics_e2e_data_pipeline_spark.operators.textops import (
        LANG_STOPWORDS,
    )
    from meteomatics_e2e_data_pipeline_spark.sources.tables import load_table
    from meteomatics_e2e_data_pipeline_spark.streaming import (
        stream_quality_scores,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text")
    fx = text_feature_exprs(F.col("text"), LANG_STOPWORDS["en"])
    feat = docs.select(
        "doc_id", (fx["x2"] > 0.5).cast("double").alias("y"),
        *[fx[c].alias(c) for c in FEATURE_COLS])
    weights = logreg_train(feat, list(FEATURE_COLS), "y", iters=3, lr=2.0)

    batch_scores = {r["doc_id"]: r["score"] for r in feat.select(
        "doc_id",
        logreg_score(feat, weights, list(FEATURE_COLS)).alias("score"))
        .collect()}

    src = tmp_path / "docs"
    src.mkdir()
    half = docs.count() // 2
    docs.filter(F.col("doc_id") < half).coalesce(1) \
        .write.parquet(str(src / "b0"))
    docs.filter(F.col("doc_id") >= half).coalesce(1) \
        .write.parquet(str(src / "b1"))
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (stream_quality_scores(stream, weights)
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).outputMode("append").start())
    q.awaitTermination()

    got = {r["doc_id"]: r["score"] for r in
           spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got == batch_scores          # exact float equality, all docs
    assert len(got) == docs.count()


def _heavy_test_stream_training_gate_composition_matches_batch(spark, tmp_path):
    """The composed online admission gate (quality threshold →
    decontamination → near-dup flag → stratified sample) admits
    EXACTLY the (doc_id, score) set the same four operators admit on
    the static frame, across multiple micro-batches — and every stage
    does real work on this fixture (each strictly shrinks the set)."""
    from meteomatics_e2e_data_pipeline_spark.operators.classifier import (
        FEATURE_COLS, logreg_train, text_feature_exprs,
    )
    from meteomatics_e2e_data_pipeline_spark.operators.neardup import (
        band_rows, minhash_signatures, shingle_hashes,
    )
    from meteomatics_e2e_data_pipeline_spark.operators.textops import (
        LANG_STOPWORDS,
    )
    from meteomatics_e2e_data_pipeline_spark.sources.tables import load_table
    from meteomatics_e2e_data_pipeline_spark.streaming import (
        stream_training_gate,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text", "lang", "source")

    # batch-produced artifacts: weights, benchmark n-grams, prior index
    fx = text_feature_exprs(F.col("text"), LANG_STOPWORDS["en"])
    feat = docs.select(
        "doc_id", (fx["x2"] > 0.5).cast("double").alias("y"),
        *[fx[c].alias(c) for c in FEATURE_COLS])
    weights = logreg_train(feat, list(FEATURE_COLS), "y", iters=3, lr=2.0)
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    bench_hvs = [r["hv"] for r in
                 shingle_hashes(bench, "doc_id", "text", 3)
                 .select("hv").distinct().collect()]
    prior = docs.filter(F.col("doc_id") % 5 == 0)
    prior_keys = [f"{r['band_id']}|{r['band_hash']}" for r in
                  band_rows(minhash_signatures(prior)).collect()]
    rates = {("en", "web"): 0.9}
    kw = dict(score_threshold=0.5, salt="gate0", default_rate=0.5)

    # static reference: the SAME composition over the batch frame
    want = {(r["doc_id"], r["score"]) for r in stream_training_gate(
        docs, weights, bench_hvs, prior_keys, rates, **kw).collect()}

    src = tmp_path / "docs"
    src.mkdir()
    half = 250
    docs.filter(F.col("doc_id") < half).coalesce(1) \
        .write.parquet(str(src / "b0"))
    docs.filter(F.col("doc_id") >= half).coalesce(1) \
        .write.parquet(str(src / "b1"))
    stream = (spark.readStream
              .schema("doc_id long, text string, lang string, source string")
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (stream_training_gate(stream, weights, bench_hvs, prior_keys,
                              rates, **kw)
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).outputMode("append").start())
    q.awaitTermination()

    got = {(r["doc_id"], r["score"]) for r in
           spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got == want
    assert 0 < len(want) < docs.count()

    # every stage does real work on this fixture: re-run the static
    # composition stage by stage and require strict shrinkage
    from meteomatics_e2e_data_pipeline_spark.streaming import (
        stream_contamination_flags,
        stream_near_dup_flags,
        stream_quality_scores,
        stream_stratified_sample,
    )
    n0 = docs.count()
    s1 = stream_quality_scores(docs, weights).filter(F.col("score") >= 0.5)
    n1 = s1.count()
    s2 = (stream_contamination_flags(s1, bench_hvs)
          .filter(F.col("n_hits") == 0).drop("n_hits"))
    n2 = s2.count()
    s3 = (stream_near_dup_flags(s2, prior_keys)
          .filter(~F.col("near_dup")).drop("n_band_hits", "near_dup"))
    n3 = s3.count()
    n4 = stream_stratified_sample(s3, rates, salt="gate0",
                                  default_rate=0.5).count()
    assert n0 > n1 > n2 > n3 > n4 > 0, (n0, n1, n2, n3, n4)
    assert n4 == len(want)


def _heavy_test_stream_near_dup_flags_match_batch_lsh(spark, tmp_path):
    """The streaming flag must mark EXACTLY the arriving docs whose
    band keys collide with the prior corpus index — the same candidate
    semantics the batch LSH self-join computes — across multiple
    micro-batches, with non-colliding docs passing through unflagged."""
    from meteomatics_e2e_data_pipeline_spark.operators.neardup import (
        band_rows, minhash_signatures,
    )
    from meteomatics_e2e_data_pipeline_spark.streaming import (
        stream_near_dup_flags,
    )

    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep dark forest tonight again and again")
    prior = spark.createDataFrame(
        [(100, base), (101, "completely different text about spark "
                            "catalyst shuffles and broadcast joins ok")],
        "doc_id long, text string")
    arrivals = spark.createDataFrame(
        [(1, base.replace("lazy", "sleepy")),      # near-dup of 100
         (2, "unrelated fresh words nobody wrote before in any doc "
             "zeta eta theta iota kappa lambda mu nu xi omicron pi"),
         (3, base)],                               # exact dup of 100
        "doc_id long, text string")

    prior_keys = [f"{r['band_id']}|{r['band_hash']}" for r in
                  band_rows(minhash_signatures(prior)).collect()]

    # batch reference: which arrivals share a band with the prior index
    arr_bands = band_rows(minhash_signatures(arrivals))
    pk = spark.createDataFrame([(k,) for k in prior_keys], "k string")
    want = {r["doc_id"] for r in arr_bands.withColumn(
        "k", F.concat_ws("|", "band_id", "band_hash"))
        .join(pk, "k", "left_semi").select("doc_id").distinct().collect()}
    assert 3 in want            # exact dup always collides

    src = tmp_path / "docs"
    src.mkdir()
    arrivals.filter(F.col("doc_id") <= 1).coalesce(1) \
        .write.parquet(str(src / "b0"))
    arrivals.filter(F.col("doc_id") > 1).coalesce(1) \
        .write.parquet(str(src / "b1"))
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (stream_near_dup_flags(stream, prior_keys)
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).outputMode("append").start())
    q.awaitTermination()

    got = {r["doc_id"]: r for r in
           spark.read.parquet(str(tmp_path / "out")).collect()}
    assert set(got) == {1, 2, 3}
    assert {d for d, r in got.items() if r["near_dup"]} == want
    assert got[2]["n_band_hits"] == 0


def test_stream_dup_coverage_gate_matches_static_and_never_underestimates(
        spark, tmp_path):
    """The streaming ExactSubstr admission gate: (1) multi-batch
    streaming decisions EQUAL the same function applied statically;
    (2) the Bloom estimate never UNDERestimates the true window-hit
    fraction against the reference dup set (FP bias is one-sided), so
    the gate can spuriously reject but never wrongly admit; (3) the
    gate does real work on this fixture (some docs rejected, some
    admitted)."""
    from meteomatics_e2e_data_pipeline_spark.operators import neardup
    from meteomatics_e2e_data_pipeline_spark.sources.tables import load_table
    from meteomatics_e2e_data_pipeline_spark.streaming import (
        stream_dup_coverage_gate,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text")

    # batch-built artifact: the corpus's count>=2 window-hash set → Bloom
    sp = docs.select(
        "doc_id",
        F.explode(neardup.shingle_hash_array(F.col("text"), 8)).alias("hv"))
    dup_set = (sp.groupBy("hv").agg(F.count(F.lit(1)).alias("c"))
               .filter(F.col("c") >= 2).select("hv").localCheckpoint())
    words = neardup.bloom_words_from_hv(dup_set)
    thresh = 0.2

    # static reference: the SAME function over the batch frame
    static = stream_dup_coverage_gate(docs, words, thresh)
    want = {(r["doc_id"], r["est_dup_coverage"]) for r in static.collect()}
    assert 0 < len(want) < docs.count()      # real admits AND rejects

    # one-sided error: estimate >= true hit fraction for EVERY doc
    true_frac = (sp.join(dup_set.withColumnRenamed("hv", "hv2"),
                         F.col("hv") == F.col("hv2"), "left")
                 .groupBy("doc_id")
                 .agg(F.round(F.sum(F.col("hv2").isNotNull().cast("int"))
                              / F.count(F.lit(1)), 6).alias("tf")))
    est_all = stream_dup_coverage_gate(docs, words, 2.0)  # no rejection
    joined = est_all.join(true_frac, "doc_id", "left") \
        .select("doc_id", "est_dup_coverage",
                F.coalesce("tf", F.lit(0.0)).alias("tf"))
    bad = joined.filter(F.col("est_dup_coverage")
                        < F.col("tf") - 1e-9).count()
    assert bad == 0

    # streaming twin across micro-batches
    src = tmp_path / "docs"
    src.mkdir()
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1) \
        .write.parquet(str(src / "b0"))
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1) \
        .write.parquet(str(src / "b1"))
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (stream_dup_coverage_gate(stream, words, thresh)
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).outputMode("append").start())
    q.awaitTermination()
    got = {(r["doc_id"], r["est_dup_coverage"]) for r in
           spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got == want

# ---------------------------------------------------------------------------
# Pooled heavy bodies (runtime-budget lever; see conftest.pool_bodies):
# independent availableNow streams with private checkpoints run
# concurrently under one module fixture, each keeping its own pytest row.
# ---------------------------------------------------------------------------

_POOLED = {
    "test_stream_training_gate_composition_matches_batch": _heavy_test_stream_training_gate_composition_matches_batch,
    "test_stream_sliding_reach_exact_equals_batch": _heavy_test_stream_sliding_reach_exact_equals_batch,
    "test_stream_stream_join_matches_batch_interval_join": _heavy_test_stream_stream_join_matches_batch_interval_join,
    "test_stream_near_dup_flags_match_batch_lsh": _heavy_test_stream_near_dup_flags_match_batch_lsh,
    "test_stream_outer_join_matches_batch_left_join": _heavy_test_stream_outer_join_matches_batch_left_join,
}


@pytest.fixture(scope="module")
def sops_pool(_heavy_pool):
    # touch all (submits on targeted runs), then join only
    # THIS module futures; the rest keep draining
    futs = {n: _heavy_pool["tests.test_streaming_ops::" + n]
            for n in _POOLED}
    return {n: f.result() for n, f in futs.items()}


def test_stream_training_gate_composition_matches_batch(sops_pool):
    ex = sops_pool["test_stream_training_gate_composition_matches_batch"]
    if ex is not None:
        raise ex


def test_stream_sliding_reach_exact_equals_batch(sops_pool):
    ex = sops_pool["test_stream_sliding_reach_exact_equals_batch"]
    if ex is not None:
        raise ex


def test_stream_stream_join_matches_batch_interval_join(sops_pool):
    ex = sops_pool["test_stream_stream_join_matches_batch_interval_join"]
    if ex is not None:
        raise ex


def test_stream_near_dup_flags_match_batch_lsh(sops_pool):
    ex = sops_pool["test_stream_near_dup_flags_match_batch_lsh"]
    if ex is not None:
        raise ex


def test_stream_outer_join_matches_batch_left_join(sops_pool):
    ex = sops_pool["test_stream_outer_join_matches_batch_left_join"]
    if ex is not None:
        raise ex

