"""The HTTP surface over a REAL socket: a localhost threading server
speaks the Meteomatics URL/auth contract and the public Nominatim
geocode shape, and the engine's fetch paths are driven through actual
TCP — driver-side (``HttpFetcher``), executor-side (``fetch_distributed``
tasks and the native ``weather_api`` DataSource resolve the fetcher and
open sockets inside Python workers), and the geocode retry policy.

This closes the one gap the stubbed tests could not: every prior HTTP
test monkeypatched ``requests`` (``test_maintenance_and_http.py``), so
URL building, basic-auth headers, status handling, and the
executor-process → server round trip were never exercised end-to-end.
The server replies from the SAME deterministic generator as
``FixtureFetcher`` (``sources/fixtures._payload``), so socket results are
checked for exact payload equality, not just shape.

Reference parity: ``meteomatics_get_data.py:63-99`` (GET + basic auth +
non-200 → error), ``helper_geocoders.py:5-13`` (Nominatim + retries).
"""

from __future__ import annotations

import base64
import json
import threading
import time
from collections import Counter
from datetime import datetime, timedelta
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

import pytest

from meteomatics_e2e_data_pipeline_spark.sources.fixtures import (
    FLOAT_PARAMS, LOCATIONS, SUN_PARAMS, _payload)
from meteomatics_e2e_data_pipeline_spark.sources.ingest import (
    FIXTURE_GEOCODES, FixtureFetcher, HttpFetcher, NominatimGeocoder,
    fetch_distributed, geocode_locations, validate_payloads, with_retries)

USER, PASSWORD = "socket_user", "socket_pw"
ALL_PARAMS = list(FLOAT_PARAMS) + list(SUN_PARAMS)
RUN_DATE = "2025-03-26"
_BY_COORD = {(lat, lon): (city, country) for city, country, lat, lon in LOCATIONS}


class _MeteomaticsHandler(BaseHTTPRequestHandler):
    """Meteomatics-shaped GET + Nominatim ``/search`` on one server.

    Mutable class-level knobs (reset by the fixture per test):
      ``fail_cities``   — cities answered with 500 (quarantine channel);
      ``flaky_names``   — geocode names whose FIRST attempt gets 503;
      ``seen``          — Counter of request keys (assertable call log).
    """

    fail_cities: set = set()
    flaky_names: set = set()
    slow_names: set = set()  # geocode names answered only after a long nap
    seen: Counter = Counter()
    _lock = threading.Lock()

    def log_message(self, *args):  # keep pytest output clean
        pass

    def _send_json(self, status: int, payload) -> None:
        body = json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 - http.server contract
        parsed = urlparse(self.path)
        if parsed.path == "/search":
            return self._geocode(parse_qs(parsed.query))
        return self._weather(parsed.path)

    def _geocode(self, qs) -> None:
        name = (qs.get("q") or [""])[0]
        with self._lock:
            self.seen[f"geocode:{name}"] += 1
            first = self.seen[f"geocode:{name}"] == 1
        if name in self.flaky_names and first:
            return self._send_json(503, {"error": "transient"})
        if name in self.slow_names:
            time.sleep(1.0)  # a hung upstream: client timeout must fire
        coords = FIXTURE_GEOCODES.get(name)
        if coords is None:
            return self._send_json(200, [])  # Nominatim: empty hit list
        lat, lon = coords
        return self._send_json(
            200, [{"lat": str(lat), "lon": str(lon), "display_name": name}])

    def _weather(self, path: str) -> None:
        auth = self.headers.get("Authorization", "")
        expected = "Basic " + base64.b64encode(
            f"{USER}:{PASSWORD}".encode()).decode()
        if auth != expected:
            return self._send_json(401, {"error": "unauthorized"})
        try:
            # /{start}--{end}:{step}/{p1,p2}/{lat},{lon}/{fmt}
            window, params, coord, _fmt = unquote(path).strip("/").split("/")
            start = window.split("--")[0]
            run_date = (datetime.strptime(start, "%Y-%m-%dT%H:%M:%SZ")
                        + timedelta(days=1)).strftime("%Y-%m-%d")
            lat, lon = (float(x) for x in coord.split(","))
            requested = params.split(",")
        except ValueError:
            return self._send_json(400, {"error": f"bad path {path!r}"})
        city, country = _BY_COORD.get((lat, lon), (None, None))
        if city is None:
            return self._send_json(404, {"error": f"unknown coord {coord}"})
        with self._lock:
            self.seen[f"fetch:{city}:{run_date}"] += 1
        if city in self.fail_cities:
            return self._send_json(500, {"error": "server exploded"})
        weather = _payload(city, country, lat, lon, run_date)["weather"]
        weather["data"] = [d for d in weather["data"]
                           if d["parameter"] in requested]
        return self._send_json(200, weather)


@pytest.fixture(scope="module")
def api_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _MeteomaticsHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    t.join(timeout=5)


@pytest.fixture(autouse=True)
def _reset_server_state():
    _MeteomaticsHandler.fail_cities = set()
    _MeteomaticsHandler.flaky_names = set()
    _MeteomaticsHandler.slow_names = set()
    _MeteomaticsHandler.seen = Counter()
    yield


def _http_fetcher(base_url: str) -> HttpFetcher:
    return HttpFetcher(base_url, USER, PASSWORD, ALL_PARAMS)


def test_http_fetcher_socket_payload_equals_fixture(api_server):
    """A real GET through the wire returns byte-identical payloads to the
    in-process fixture fetcher — URL formatting, auth header, JSON decode
    and enrichment all crossing an actual TCP connection."""
    city, country, lat, lon = LOCATIONS[0]
    got = _http_fetcher(api_server)(city, country, lat, lon, RUN_DATE)
    assert got == FixtureFetcher()(city, country, lat, lon, RUN_DATE)
    assert _MeteomaticsHandler.seen[f"fetch:{city}:{RUN_DATE}"] == 1


def test_http_fetcher_param_projection_reaches_server(api_server):
    """The parameter list is encoded in the URL and honored server-side —
    a 2-parameter fetcher gets exactly those series back (the API-call
    analogue of column pruning)."""
    city, country, lat, lon = LOCATIONS[1]
    f = HttpFetcher(api_server, USER, PASSWORD, ["t_2m:C", "sunrise:sql"])
    got = f(city, country, lat, lon, RUN_DATE)
    assert [d["parameter"] for d in got["weather"]["data"]] \
        == ["t_2m:C", "sunrise:sql"]


def test_http_fetcher_bad_credentials_raise(api_server):
    f = HttpFetcher(api_server, USER, "wrong-password", ALL_PARAMS)
    with pytest.raises(ConnectionError, match="401"):
        f(*LOCATIONS[0][:2], LOCATIONS[0][2], LOCATIONS[0][3], RUN_DATE)


def test_fetch_distributed_executor_sockets_and_quarantine(spark, api_server):
    """``fetch_distributed`` tasks open sockets from EXECUTOR python
    workers: all three locations round-trip the wire in one job, a
    server-side 500 becomes a quarantine row (not a task failure), and
    the healthy payloads equal the fixture generator's."""
    _MeteomaticsHandler.fail_cities = {"berlin"}
    geo = geocode_locations(spark, list(FIXTURE_GEOCODES))
    raw = fetch_distributed(geo, RUN_DATE, _http_fetcher(api_server),
                            parallelism=3)
    valid, quarantine = validate_payloads(spark, raw)
    bad = quarantine.collect()
    assert len(bad) == 1 and "500" in bad[0]["corrupt_record"]
    got = {json.loads(r["raw"])["city"] for r in raw.collect()
           if "fetch_error" not in json.loads(r["raw"])}
    assert got == {"tallinn", "amsterdam"}
    assert valid.count() == 2
    # every location was fetched over the wire (the 500 still hit the server)
    fetches = {k for k in _MeteomaticsHandler.seen if k.startswith("fetch:")}
    assert fetches == {f"fetch:{c}:{RUN_DATE}"
                       for c, _, _, _ in LOCATIONS}


def test_api_datasource_fetches_over_socket_with_pruning(spark, api_server):
    """The native ``weather_api`` source resolves ``HttpFetcher`` from its
    import path ON THE EXECUTOR and fetches through the wire; a pushed
    city filter prunes partitions BEFORE any HTTP call, so the server's
    request log shows exactly one fetch."""
    from meteomatics_e2e_data_pipeline_spark.sources.api_datasource import (
        register)
    register(spark)
    fetcher_args = json.dumps({
        "base_url": api_server, "username": USER, "password": PASSWORD,
        "parameters": ALL_PARAMS})
    rows = (spark.read.format("weather_api")
            .option("start_date", RUN_DATE).option("end_date", RUN_DATE)
            .option("fetcher",
                    "meteomatics_e2e_data_pipeline_spark.sources.ingest"
                    ":HttpFetcher")
            .option("fetcher_args", fetcher_args)
            .load()
            .filter("city = 'tallinn'")
            .collect())
    assert len(rows) == 1
    payload = json.loads(rows[0]["raw"])
    assert payload == FixtureFetcher()("tallinn", "estonia",
                                       59.437, 24.7536, RUN_DATE)
    fetches = [k for k in _MeteomaticsHandler.seen if k.startswith("fetch:")]
    assert fetches == [f"fetch:tallinn:{RUN_DATE}"]  # pruned pre-socket


def test_nominatim_geocoder_retries_over_socket(spark, api_server):
    """The geocode path over the wire: a transient 503 on the first
    attempt is absorbed by ``with_retries`` (reference
    ``helper_geocoders.py:5-13``), each distinct name is resolved exactly
    once per attempt-chain, and the resulting frame matches the fixture
    coordinates."""
    _MeteomaticsHandler.flaky_names = {"Berlin, Germany"}
    naps: list[float] = []
    fn = with_retries(NominatimGeocoder(api_server), retries=3,
                      backoff_s=0.01, sleep=naps.append)
    geo = geocode_locations(spark, list(FIXTURE_GEOCODES), fn)
    got = {r["location_name"]: (r["latitude"], r["longitude"])
           for r in geo.collect()}
    assert got == {n: (lat, lon) for n, (lat, lon) in FIXTURE_GEOCODES.items()}
    assert naps == [0.01]  # exactly one retry, for the flaky name
    assert _MeteomaticsHandler.seen["geocode:Berlin, Germany"] == 2
    assert _MeteomaticsHandler.seen["geocode:Tallinn, Estonia"] == 1


def test_nominatim_geocoder_timeout_bounds_a_hung_server(api_server):
    """A server that accepts the connection and never answers must not
    wedge the ingest thread: each attempt is capped (the reference
    geocoder passes timeout=5, helper_geocoders.py) so requests.Timeout
    feeds with_retries' attempt chain — the failure is loud and bounded
    instead of an indefinite block with retries never reached."""
    import requests

    _MeteomaticsHandler.slow_names = {"Berlin, Germany"}
    assert NominatimGeocoder(api_server).timeout_s == 5.0  # reference value
    fn = with_retries(NominatimGeocoder(api_server, timeout_s=0.15),
                      retries=2, backoff_s=0.0, sleep=lambda s: None)
    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="2 attempts") as exc:
        fn("Berlin, Germany")
    assert isinstance(exc.value.__cause__, requests.Timeout)
    assert time.monotonic() - t0 < 5  # 2 x 0.15s caps, not 2 x 1s naps


def test_nominatim_geocoder_empty_hits_fail_loudly(api_server):
    """An unknown name is a definitive empty Nominatim answer — retries
    re-raise identically and the caller gets a loud LookupError-rooted
    failure, never a silent (0, 0) coordinate."""
    fn = with_retries(NominatimGeocoder(api_server), retries=2,
                      backoff_s=0.0, sleep=lambda s: None)
    with pytest.raises(RuntimeError, match="Atlantis"):
        fn("Atlantis, Nowhere")
    assert _MeteomaticsHandler.seen["geocode:Atlantis, Nowhere"] == 2
