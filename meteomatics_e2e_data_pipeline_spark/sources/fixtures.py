"""Deterministic bronze-JSON fixture generator for the weather pipeline.

Reproduces the reference's raw-file lake shape (one JSON document per
(location, run_date), laid out ``{country}/{city}/weather_raw_{city}_
{country}_{run_date}.json`` — reference ``meteomatics_get_data.py:108,116``)
with the payload schema of the pydantic contract
(``helper_validate_response.py:5-33``) and the enrichment fields added at
``meteomatics_get_data.py:82-88``.

Key properties (FIXTURES.md §1):
- **Deterministic**: every value is an md5-keyed function of
  (city, parameter, timestamp, run_date) — no RNG, so regeneration is
  byte-stable and both Spark and the DuckDB oracle read identical inputs.
- **Overlapping run_dates**: consecutive runs re-deliver the same reading
  timestamps with a newer ``weather.dateGenerated`` *and different values*,
  which is exactly what exercises the latest-issuance-wins window dedupe
  (reference ``fact_weather_params_history.sql:17-24,32``).
- **Union-typed value**: all values are JSON strings — floats rendered to
  2 decimals for the 8 numeric parameters, ISO datetime strings for
  ``sunrise:sql``/``sunset:sql`` (reference keeps VARIANT uncast in staging,
  casts per-fact).
"""

from __future__ import annotations

import hashlib
import json
import os
from datetime import date, datetime, timedelta
from pathlib import Path

LOCATIONS = [
    # (city, country, lat, lon) — slugs per meteomatics_get_data.py:55-61
    ("tallinn", "estonia", 59.437, 24.7536),
    ("amsterdam", "netherlands", 52.3676, 4.9041),
    ("berlin", "germany", 52.52, 13.405),
]

RUN_DATES = ["2025-03-26", "2025-03-27", "2025-03-28", "2025-03-29"]

# The 10 parameters of api_config.yaml:3-13, with plausible value ranges
# for the 8 numeric ones.
FLOAT_PARAMS = {
    "wind_speed_10m:ms": (0.0, 25.0),
    "wind_dir_10m:d": (0.0, 360.0),
    "wind_gusts_10m_1h:ms": (0.0, 35.0),
    "t_2m:C": (-15.0, 30.0),
    "msl_pressure:hPa": (980.0, 1040.0),
    "precip_1h:mm": (0.0, 8.0),
    "weather_symbol_1h:idx": (1.0, 27.0),
    "uv:idx": (0.0, 9.0),
}
SUN_PARAMS = ("sunrise:sql", "sunset:sql")

_ISO = "%Y-%m-%dT%H:%M:%SZ"
# Fixed mtime so _metadata.file_modification_time is stable across
# regeneration (2023-11-14T22:13:20Z).
_FIXED_MTIME = 1_700_000_000


def _frac(key: str) -> float:
    """Deterministic uniform-ish fraction in [0, 1] from an md5 of the key."""
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) / 0xFFFFFFFF


def _payload(city: str, country: str, lat: float, lon: float,
             run_date: str) -> dict:
    run = datetime.strptime(run_date, "%Y-%m-%d")
    start, end = run - timedelta(days=1), run + timedelta(days=7)
    data = []
    for param, (lo, hi) in FLOAT_PARAMS.items():
        readings = []
        t = start
        while t <= end:  # hourly, inclusive both ends -> 193 readings
            f = _frac(f"{city}|{param}|{t:{_ISO}}|{run_date}")
            readings.append({"date": t.strftime(_ISO),
                             "value": f"{lo + f * (hi - lo):.2f}"})
            t += timedelta(hours=1)
        data.append({"parameter": param,
                     "coordinates": [{"lat": lat, "lon": lon, "dates": readings}]})
    for param in SUN_PARAMS:
        readings = []
        d = start
        while d <= end:  # daily, 9 readings
            f = _frac(f"{city}|{param}|{d:%Y-%m-%d}|{run_date}")
            base_h = 5.0 + f * 2.5 if param.startswith("sunrise") else 17.5 + f * 3.0
            event = d + timedelta(minutes=round(base_h * 60))
            readings.append({"date": d.strftime(_ISO),
                             "value": event.strftime(_ISO)})
            d += timedelta(days=1)
        data.append({"parameter": param,
                     "coordinates": [{"lat": lat, "lon": lon, "dates": readings}]})
    return {
        "city": city,
        "country": country,
        "latitude": lat,
        "longitude": lon,
        "weather": {
            "version": "3.0",
            "user": "fixture_user",
            "dateGenerated": f"{run_date}T02:00:00Z",
            "status": "OK",
            "data": data,
        },
    }


def default_bronze_root() -> Path:
    return Path(__file__).resolve().parents[2] / "fixtures" / "bronze"


def ensure_fixtures(root: str | os.PathLike | None = None,
                    locations: list[tuple[str, str, float, float]] | None = None,
                    run_dates: list[str] | None = None) -> Path:
    """Write the bronze fixture lake if absent; idempotent and cheap when
    it already exists. Returns the root path. ``locations``/``run_dates``
    default to the committed fixture set; pass larger lists (e.g. from
    ``synthetic_locations``) for stress-scale lakes."""
    rootp = Path(root) if root is not None else default_bronze_root()
    marker = rootp / ".complete"
    locs = locations or LOCATIONS
    dates = run_dates or RUN_DATES
    # the marker records WHICH parameter set produced the lake — asking
    # for a different set against an existing root is a caller bug that
    # must not silently return mismatched data
    param_sig = hashlib.md5(
        repr((sorted(locs), sorted(dates))).encode()).hexdigest()
    if marker.exists():
        if marker.read_text().strip() != param_sig:
            raise ValueError(
                f"fixture lake at {rootp} was generated with different "
                "locations/run_dates; use a fresh root")
        return rootp
    for city, country, lat, lon in locs:
        d = rootp / country / city
        d.mkdir(parents=True, exist_ok=True)
        for run_date in dates:
            p = d / f"weather_raw_{city}_{country}_{run_date}.json"
            with open(p, "w") as f:
                json.dump(_payload(city, country, lat, lon, run_date), f)
            os.utime(p, (_FIXED_MTIME, _FIXED_MTIME))
    marker.write_text(param_sig + "\n")
    return rootp


def synthetic_locations(n: int) -> list[tuple[str, str, float, float]]:
    """Deterministic synthetic location list for stress-scale lakes."""
    out = []
    for i in range(n):
        f1 = _frac(f"lat|{i}")
        f2 = _frac(f"lon|{i}")
        out.append((f"city{i:03d}", f"country{i % 20:02d}",
                    round(-60 + 120 * f1, 4), round(-180 + 360 * f2, 4)))
    return out


def corrupt_payloads() -> list[str]:
    """Negative fixtures (FIXTURES.md §1): raw JSON lines that must fail
    schema validation — used by the validation-channel tests."""
    good = _payload("tallinn", "estonia", 59.437, 24.7536, RUN_DATES[0])
    missing_data = {k: v for k, v in good.items()}
    missing_data["weather"] = {k: v for k, v in good["weather"].items()
                               if k != "data"}
    return [
        json.dumps(missing_data),       # weather.data absent
        '{"city": "x", not json',       # syntactically corrupt
    ]
