"""Config source (S2): the reference's ``api_config.yaml`` shape
(``meteomatics_get_data.py:38-43``; ``api_config.yaml:1-11``).

Defaults mirror the reference's checked-in config so the engine runs
without any file; a YAML file with the same keys overrides them.
"""

from __future__ import annotations

DEFAULT_CONFIG = {
    "base_url": "https://api.meteomatics.com",
    "time_step": "PT1H",
    "output_format": "json",
    "parameters": [
        "wind_speed_10m:ms", "wind_dir_10m:d", "wind_gusts_10m_1h:ms",
        "t_2m:C", "msl_pressure:hPa", "precip_1h:mm",
        "weather_symbol_1h:idx", "uv:idx", "sunrise:sql", "sunset:sql",
    ],
}


def load_api_config(path: str | None = None) -> dict:
    """Load API config, falling back to the reference-parity defaults.
    YAML import is lazy so the engine has no hard dependency on pyyaml."""
    if path is None:
        return dict(DEFAULT_CONFIG)
    import yaml  # lazy: only needed when a file is supplied

    with open(path) as f:
        loaded = yaml.safe_load(f) or {}
    out = dict(DEFAULT_CONFIG)
    out.update(loaded)
    return out
