"""S1 as a native PySpark Python Data Source (Spark 4 ``DataSource`` API).

The reference's HTTP extract is a driver-side loop inside an Airflow task
(``meteomatics_get_data.py:63-99``); :mod:`.ingest` already re-expresses it
as ``mapInPandas`` fan-out. This module goes one step further and makes the
weather API a first-class *source*: ``spark.read.format("weather_api")`` /
``spark.readStream.format("weather_api")``, so the fetch participates in
Catalyst planning like any file source —

- **one input partition per (location, run_date)**: fetches run on
  EXECUTORS, the driver only plans; 10k locations = 10k independent tasks
  with no driver loop and no ``createDataFrame`` of payloads;
- **filter pushdown to the fetch planner** (``pushFilters``): an
  ``EqualTo``/``In`` predicate on ``city``, ``country`` or ``run_date``
  prunes partitions BEFORE any HTTP call happens — the API-call analogue
  of parquet partition pruning. Unsupported filters are returned to Spark
  and re-applied post-scan, so consuming a filter is never lossy;
- **a bounded streaming source**: the backfill loop (``catchup=True``
  in the reference DAG) expressed as offsets over the
  ``start_date``..``end_date`` run_date range, with exactly-once
  progression owned by the engine's checkpoint, not by task
  bookkeeping — a restarted query resumes at the committed day, and
  extending ``end_date`` on restart streams only the delta.

The fetcher stays injectable (same contract as :mod:`.ingest`): options are
flat strings, so it is named by import path ``"module:Class"`` and
constructed with JSON kwargs — resolved lazily inside ``read`` ON THE
EXECUTOR, so the HTTP client library is only imported where the fetch runs.
A fetch failure yields a quarantine-shaped row (``fetch_error`` payload,
exactly like ``ingest.fetch_distributed``) instead of failing the task.

NOTE ``pushFilters`` requires ``spark.sql.python.filterPushdown.enabled``;
:func:`register` sets it on the live session (runtime-settable SQL conf),
so driver-owned plain sessions work — never rely on factory-only configs.

NOTE (engine caveat, shared with the txlog batch source and pinned in
``tests/test_txlog_batch_source.py::test_scan_reuse_caveat``): Spark 4.1
caches the planned partitions on the relation and re-plans only for
scans that push filters, so an UNFILTERED re-scan of the same DataFrame
object reuses the previous filtered scan's pruned partition list.
``load()`` a fresh DataFrame per query; filtered re-scans are always
exact.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from datetime import datetime, timedelta
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
)

API_SCHEMA = ("city string, country string, latitude double, "
              "longitude double, run_date string, raw string")

_DATE_FMT = "%Y-%m-%d"


def _dates_between(start: str, end: str) -> list[str]:
    """Inclusive run_date range, validated (P10-style: bad input raises)."""
    s = datetime.strptime(start, _DATE_FMT)
    e = datetime.strptime(end, _DATE_FMT)
    if e < s:
        raise ValueError(f"end_date {end} precedes start_date {start}")
    out, d = [], s
    while d <= e:
        out.append(d.strftime(_DATE_FMT))
        d += timedelta(days=1)
    return out


def _resolve_fetcher(path: str, kwargs_json: str):
    """``"pkg.mod:Class"`` + JSON kwargs → fetcher instance. Runs on the
    executor, so import cost / HTTP deps live where the fetch does."""
    import importlib

    mod_name, _, attr = path.partition(":")
    if not attr:
        raise ValueError(f"fetcher must be 'module:Class', got {path!r}")
    cls = getattr(importlib.import_module(mod_name), attr)
    return cls(**(json.loads(kwargs_json) if kwargs_json else {}))


def _parse_locations(options) -> list[tuple[str, str, float, float]]:
    """Options → (city, country, lat, lon) rows. ``locations`` is a
    semicolon-joined list of 'City, Country' names geocoded driver-side at
    PLANNING time (distinct names only — U1's cardinality argument);
    absent, the fixture set is used."""
    from .fixtures import LOCATIONS
    from .ingest import FIXTURE_GEOCODES, slug_location

    names = options.get("locations")
    if not names:
        return list(LOCATIONS)
    out = []
    for name in names.split(";"):
        city, country = slug_location(name)
        lat, lon = FIXTURE_GEOCODES[name.strip()]
        out.append((city, country, float(lat), float(lon)))
    return out


@dataclass(frozen=True)
class FetchPartition(InputPartition):
    """One (location, run_date) fetch unit — the task grain."""

    city: str
    country: str
    latitude: float
    longitude: float
    run_date: str


class SelectiveFailFetcher:
    """Chaos fetcher: raises for every city NOT in ``allow``. Two jobs:
    the quarantine-channel e2e (a failing location must become a
    quarantine row, not a task failure) and the pushdown PROOF — a query
    filtered to an allowed city succeeds only if pruning removed the
    failing partitions before any fetch ran."""

    def __init__(self, allow: Sequence[str] = ()):
        self.allow = set(allow)

    def __call__(self, city: str, country: str, lat: float, lon: float,
                 run_date: str) -> dict:
        if city not in self.allow:
            raise ConnectionError(f"chaos: refusing fetch for {city}")
        from .fixtures import _payload

        return _payload(city, country, lat, lon, run_date)


def _fetch_rows(parts: Sequence[FetchPartition], options
                ) -> "Iterator[tuple]":
    """Shared batch/stream fetch: one row per partition, quarantine-shaped
    on failure (mirrors ``ingest.fetch_distributed``)."""
    fetcher = _resolve_fetcher(
        options.get("fetcher",
                    "meteomatics_e2e_data_pipeline_spark.sources.ingest"
                    ":FixtureFetcher"),
        options.get("fetcher_args", ""))
    for p in parts:
        try:
            raw = json.dumps(fetcher(p.city, p.country, p.latitude,
                                     p.longitude, p.run_date))
        except Exception as exc:  # noqa: BLE001 - becomes quarantine row
            raw = json.dumps({"city": p.city, "country": p.country,
                              "fetch_error": str(exc)})
        yield (p.city, p.country, p.latitude, p.longitude, p.run_date, raw)


class WeatherApiReader(DataSourceReader):
    """Batch reader: plans locations × run_dates, prunes on pushed
    filters, fetches one partition per task."""

    _PRUNABLE = {("city",): "city", ("country",): "country",
                 ("run_date",): "run_date"}

    def __init__(self, options):
        self.options = options
        self.locations = _parse_locations(options)
        start = options.get("run_date") or options.get("start_date")
        if not start:
            raise ValueError("weather_api requires run_date or start_date")
        self.run_dates = _dates_between(
            start, options.get("end_date", start))
        # attribute index (in the partition tuple) → allowed value set
        self._keep: dict[int, set] = {}

    def pushFilters(self, filters: "list[Filter]") -> "Iterator[Filter]":
        """Consume EqualTo/In on the partition-grain columns; everything
        else is returned to Spark (re-applied post-scan). Consuming is
        sound because each partition yields only rows of its own
        (city, country, run_date)."""
        for f in filters:
            values = None
            if isinstance(f, EqualTo):
                values = {f.value}
            elif isinstance(f, In):
                values = set(f.value)
            if values is not None and f.attribute in self._PRUNABLE:
                field = self._PRUNABLE[f.attribute]
                prev = self._keep.get(field)
                self._keep[field] = values if prev is None else prev & values
            else:
                yield f

    def partitions(self) -> Sequence[FetchPartition]:
        parts = [FetchPartition(c, co, la, lo, d)
                 for c, co, la, lo in self.locations
                 for d in self.run_dates]
        for field, allowed in self._keep.items():
            parts = [p for p in parts if getattr(p, field) in allowed]
        return parts

    def read(self, partition: FetchPartition) -> "Iterator[tuple]":
        return _fetch_rows([partition], self.options)


class WeatherApiStreamReader(DataSourceStreamReader):
    """Backfill-as-stream: the offset is "how many of the configured
    run_dates are released", and ``latestOffset`` reports the WHOLE
    configured range immediately — the honest answer for a bounded
    backfill, and the only restart-safe one in this API. Within a
    batch the partition grain is the same (location, run_date) unit as
    the batch reader, so fetches still fan out to executors.

    Restart semantics (exactly-once, pytest-proven by
    ``test_stream_restart_from_checkpoint_extends_backfill_exactly_once``):
    on restart the engine resumes from the checkpointed offset and
    plans one batch per (committed, latest] delta — so extending
    ``end_date`` on a restarted query streams ONLY the new days.
    A per-call pacing cursor (one day per ``latestOffset`` call) was
    tried first and is a restart CORRUPTION: a fresh reader's cursor
    restarts below the committed offset, the engine logs the backward
    offset as a new batch end, and the next trigger replays an
    already-committed day under a NEW batch id — which the sink's
    exactly-once log cannot deduplicate. Offsets must never move
    backward; without admission-control support in the Python
    ``DataSourceStreamReader`` API, monotone == report everything.
    """

    def __init__(self, options):
        self.options = options
        self.locations = _parse_locations(options)
        start = options.get("start_date") or options.get("run_date")
        if not start:
            raise ValueError("weather_api stream requires start_date")
        self.dates = _dates_between(start, options.get("end_date", start))

    def initialOffset(self) -> dict:
        return {"n_dates": 0, "start_date": self.dates[0]}

    def latestOffset(self) -> dict:
        return {"n_dates": len(self.dates), "start_date": self.dates[0]}

    def partitions(self, start: dict, end: dict
                   ) -> Sequence[FetchPartition]:
        # Offsets are COUNTS into self.dates, so they are only meaningful
        # against the start_date they were committed under: restarting a
        # checkpointed query with a changed start_date would silently remap
        # the committed count to different days (replaying or skipping).
        # The committed offset therefore carries its start_date and a
        # mismatch is a hard error; only end_date extension is restart-safe.
        for off in (start, end):
            if off.get("start_date", self.dates[0]) != self.dates[0]:
                raise ValueError(
                    "weather_api stream restarted with start_date="
                    f"{self.dates[0]!r} but the checkpointed offset was "
                    f"committed under start_date={off['start_date']!r}; "
                    "offsets are day counts and cannot be remapped — keep "
                    "start_date fixed (only end_date may be extended) or "
                    "use a fresh checkpoint location")
        released = self.dates[start["n_dates"]:end["n_dates"]]
        return [FetchPartition(c, co, la, lo, d)
                for c, co, la, lo in self.locations for d in released]

    def read(self, partition: FetchPartition) -> "Iterator[tuple]":
        return _fetch_rows([partition], self.options)

    def commit(self, end: dict) -> None:  # engine owns progression
        pass


class WeatherApiDataSource(DataSource):
    """``format("weather_api")`` — batch and streaming weather ingest."""

    @classmethod
    def name(cls) -> str:
        return "weather_api"

    def schema(self) -> str:
        return API_SCHEMA

    def reader(self, schema) -> WeatherApiReader:
        return WeatherApiReader(self.options)

    def streamReader(self, schema) -> WeatherApiStreamReader:
        return WeatherApiStreamReader(self.options)


def register(spark) -> None:
    """Register the source and enable Python filter pushdown on the LIVE
    session (both idempotent; re-registration only logs a warning)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(WeatherApiDataSource)
