"""S1 as a Python Data Source: planning, pushdown, quarantine, streaming.

The pushdown tests prove pruning at two levels: (1) unit — the reader's
``pushFilters``/``partitions`` contract without Spark; (2) end-to-end — a
chaos fetcher that RAISES for every non-allowed city, so a filtered query
can only succeed if the pushed filter removed those partitions before any
fetch ran (post-scan filtering would still have executed the failing
fetch and produced quarantine rows, which the test also distinguishes).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, In, IsNotNull

from meteomatics_e2e_data_pipeline_spark.sources.api_datasource import (
    WeatherApiReader,
    WeatherApiStreamReader,
    register,
)
from meteomatics_e2e_data_pipeline_spark.sources.fixtures import (
    LOCATIONS,
    RUN_DATES,
    _payload,
)

FETCHER_MOD = "meteomatics_e2e_data_pipeline_spark.sources.api_datasource"


# --------------------------------------------------------------------------
# Unit: partition planning + pushdown contract (no Spark session needed)
# --------------------------------------------------------------------------


def test_partitions_are_location_x_date_grain():
    r = WeatherApiReader({"start_date": RUN_DATES[0],
                          "end_date": RUN_DATES[-1]})
    parts = r.partitions()
    assert len(parts) == len(LOCATIONS) * len(RUN_DATES)
    assert len({(p.city, p.run_date) for p in parts}) == len(parts)


def test_pushdown_consumes_prunable_filters_and_returns_rest():
    r = WeatherApiReader({"start_date": RUN_DATES[0],
                          "end_date": RUN_DATES[-1]})
    residual = list(r.pushFilters([
        EqualTo(("city",), "tallinn"),
        In(("run_date",), (RUN_DATES[0], RUN_DATES[1])),
        IsNotNull(("raw",)),                  # not prunable -> returned
        EqualTo(("latitude",), 59.437),       # not partition-grain -> returned
    ]))
    assert {type(f) for f in residual} == {IsNotNull, EqualTo}
    parts = r.partitions()
    assert {(p.city, p.run_date) for p in parts} == {
        ("tallinn", RUN_DATES[0]), ("tallinn", RUN_DATES[1])}


def test_pushdown_intersects_conflicting_filters_to_empty():
    r = WeatherApiReader({"run_date": RUN_DATES[0]})
    list(r.pushFilters([EqualTo(("city",), "tallinn"),
                        EqualTo(("city",), "berlin")]))
    assert r.partitions() == []


def test_bad_options_raise():
    with pytest.raises(ValueError, match="run_date or start_date"):
        WeatherApiReader({})
    with pytest.raises(ValueError, match="precedes"):
        WeatherApiReader({"start_date": RUN_DATES[1],
                          "end_date": RUN_DATES[0]})


# --------------------------------------------------------------------------
# End-to-end through Spark
# --------------------------------------------------------------------------


def test_batch_read_yields_exact_fixture_payloads(spark):
    register(spark)
    df = (spark.read.format("weather_api")
          .option("run_date", RUN_DATES[0]).load())
    rows = {r["city"]: r for r in df.collect()}
    assert set(rows) == {c for c, _, _, _ in LOCATIONS}
    for city, country, lat, lon in LOCATIONS:
        r = rows[city]
        assert (r["country"], r["latitude"], r["longitude"],
                r["run_date"]) == (country, lat, lon, RUN_DATES[0])
        # byte-identical to the fixture payload (and thus the lake files)
        assert json.loads(r["raw"]) == _payload(city, country, lat, lon,
                                                RUN_DATES[0])


def test_pushdown_prunes_before_fetch_chaos_proof(spark):
    """city='tallinn' must never fetch berlin/amsterdam: the chaos
    fetcher raises for them, so success + zero quarantine rows proves
    the filter reached partition planning (post-scan filtering would
    yield rows whose raw is a fetch_error payload for 'tallinn' only
    AFTER having fetched — and errored — the other cities' partitions,
    observable below via the unfiltered read)."""
    register(spark)
    reader = (spark.read.format("weather_api")
              .option("run_date", RUN_DATES[0])
              .option("fetcher", f"{FETCHER_MOD}:SelectiveFailFetcher")
              .option("fetcher_args", '{"allow": ["tallinn"]}'))
    got = reader.load().filter(F.col("city") == "tallinn").collect()
    assert len(got) == 1
    assert "fetch_error" not in got[0]["raw"]

    # unfiltered: every partition fetches; failures become quarantine rows
    all_rows = reader.load().collect()
    errs = {r["city"] for r in all_rows if "fetch_error" in r["raw"]}
    assert errs == {c for c, *_ in LOCATIONS} - {"tallinn"}
    assert len(all_rows) == len(LOCATIONS)   # no task failures either way


def test_quarantine_channel_composes_with_validation(spark):
    """A failing fetch flows through validate_payloads into quarantine —
    the data source preserves ingest.fetch_distributed's error contract."""
    from meteomatics_e2e_data_pipeline_spark.sources.ingest import (
        validate_payloads,
    )

    register(spark)
    raw = (spark.read.format("weather_api")
           .option("run_date", RUN_DATES[0])
           .option("fetcher", f"{FETCHER_MOD}:SelectiveFailFetcher")
           .option("fetcher_args", '{"allow": ["tallinn", "berlin"]}')
           .load())
    valid, quarantine = validate_payloads(spark, raw)
    assert sorted(r["city"] for r in valid.select("city").collect()) == \
        ["berlin", "tallinn"]
    q = quarantine.collect()
    assert len(q) == 1 and "amsterdam" in q[0]["corrupt_record"]


# --------------------------------------------------------------------------
# Streaming: one micro-batch per run_date, drained by processAllAvailable
# --------------------------------------------------------------------------


def _heavy_test_stream_drains_full_backfill_range(spark, tmp_path):
    register(spark)
    df = (spark.readStream.format("weather_api")
          .option("start_date", RUN_DATES[0])
          .option("end_date", RUN_DATES[-1]).load())
    q = (df.writeStream.format("memory").queryName("api_stream")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(processingTime="0 seconds").start())
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT city, run_date FROM api_stream").collect()
    finally:
        q.stop()
    assert len(got) == len(LOCATIONS) * len(RUN_DATES)
    assert {r["run_date"] for r in got} == set(RUN_DATES)
    # every (location, day) fetch unit lands exactly once
    assert len({(r["city"], r["run_date"]) for r in got}) == len(got)


def test_stream_restart_from_checkpoint_extends_backfill_exactly_once(
        spark, tmp_path):
    """The documented restart semantics (api_datasource.py stream
    reader): a fresh reader's cursor restarts at 0 BELOW the committed
    offset, the engine schedules batches only past the checkpoint, and
    extending end_date on restart resumes the backfill where it left
    off — every (location, run_date) lands EXACTLY once in the file
    sink across both runs (no loss, no duplicates)."""
    register(spark)
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def run(end_date):
        df = (spark.readStream.format("weather_api")
              .option("start_date", RUN_DATES[0])
              .option("end_date", end_date).load())
        q = (df.writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(processingTime="0 seconds").start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(RUN_DATES[1])                      # first 2 days
    mid = spark.read.parquet(out).collect()
    assert {r["run_date"] for r in mid} == set(RUN_DATES[:2])
    assert len(mid) == len(LOCATIONS) * 2

    run(RUN_DATES[-1])                     # restart, extended range
    got = spark.read.parquet(out).select("city", "run_date").collect()
    assert len(got) == len(LOCATIONS) * len(RUN_DATES)
    pairs = {(r["city"], r["run_date"]) for r in got}
    assert len(pairs) == len(got)          # exactly once
    assert {d for _, d in pairs} == set(RUN_DATES)


def test_stream_reader_offsets_are_monotone_and_restart_safe():
    r = WeatherApiStreamReader({"start_date": RUN_DATES[0],
                                "end_date": RUN_DATES[-1]})
    assert r.initialOffset() == {"n_dates": 0, "start_date": RUN_DATES[0]}
    # the full bounded range is available immediately and NEVER moves
    # backward — a fresh reader (restart) reports the same offset, so
    # a checkpointed query can only plan forward deltas
    seen = [r.latestOffset()["n_dates"] for _ in range(3)]
    assert seen == [len(RUN_DATES)] * 3
    fresh = WeatherApiStreamReader({"start_date": RUN_DATES[0],
                                    "end_date": RUN_DATES[-1]})
    assert fresh.latestOffset() == {"n_dates": len(RUN_DATES),
                                    "start_date": RUN_DATES[0]}
    # (start, end] delta planning is pure in its arguments
    parts = r.partitions({"n_dates": 1}, {"n_dates": 3})
    assert {p.run_date for p in parts} == {RUN_DATES[1], RUN_DATES[2]}
    assert len(parts) == len(LOCATIONS) * 2
    assert r.partitions({"n_dates": 2}, {"n_dates": 2}) == []
    # a checkpointed offset committed under a DIFFERENT start_date is a
    # hard error, not a silent remap of day counts onto different days
    moved = WeatherApiStreamReader({"start_date": RUN_DATES[1],
                                    "end_date": RUN_DATES[-1]})
    with pytest.raises(ValueError, match="committed under start_date"):
        moved.partitions({"n_dates": 1, "start_date": RUN_DATES[0]},
                         moved.latestOffset())
    # pre-upgrade checkpoints (no start_date key) stay readable
    assert r.partitions({"n_dates": 0}, {"n_dates": 1}) != []

# ---------------------------------------------------------------------------
# Pooled heavy bodies (runtime-budget lever; see conftest.pool_bodies):
# independent bodies run concurrently under one module fixture, each
# keeping its own pytest row. Tests that mutate process-global state
# (sys.modules monkeypatching, class attributes) stay unpooled.
# ---------------------------------------------------------------------------

_POOLED = {
    "test_stream_drains_full_backfill_range": _heavy_test_stream_drains_full_backfill_range,
}


@pytest.fixture(scope="module")
def api_pool(_heavy_pool):
    # touch all (submits on targeted runs), then join only
    # THIS module futures; the rest keep draining
    futs = {n: _heavy_pool["tests.test_api_datasource::" + n]
            for n in _POOLED}
    return {n: f.result() for n, f in futs.items()}


def test_stream_drains_full_backfill_range(api_pool):
    ex = api_pool["test_stream_drains_full_backfill_range"]
    if ex is not None:
        raise ex

