"""Machine-readable dataset specs — the engine's analog of the reference's
docs/specs/schema_*.parquet.json contract files (ref src/datalake/specs.py:5-18
descriptor model; each JSON declares ts_semantics, range_contract,
primary_key, dedupe_on).

``write_specs`` emits one JSON per timeframe plus the levels spec into
docs/specs/; ``load_spec``/``SPECS`` give programmatic access. A pytest
(tests/test_specs.py) mirrors the reference's test_specs_smoke.py.
"""

from __future__ import annotations

import json
import pathlib

TIMEFRAMES = ["M1", "M5", "M15", "M30", "H1", "D1"]

_CANDLE_PROPERTIES = {
    "ts": {"dtype": "timestamp[us, tz=UTC]", "nullable": False,
           "description": "UTC bar_end timestamp (ts marks the END of the bar)"},
    "open": {"dtype": "float64", "nullable": False},
    "high": {"dtype": "float64", "nullable": False},
    "low": {"dtype": "float64", "nullable": False},
    "close": {"dtype": "float64", "nullable": False},
    "volume": {"dtype": "float64", "nullable": True},
    "source": {"dtype": "string", "nullable": False},
    "market": {"dtype": "string", "nullable": False},
    "timeframe": {"dtype": "string", "nullable": False},
    "symbol": {"dtype": "string", "nullable": False},
    "exchange": {"dtype": "string", "nullable": True},
    "what_to_show": {"dtype": "string", "nullable": True},
    "vendor": {"dtype": "string", "nullable": True},
    "tz": {"dtype": "string", "nullable": True},
    "is_synth": {"dtype": "bool", "nullable": True,
                 "description": "True for synthetic gap-fill bars"},
}


def candle_spec(tf: str) -> dict:
    return {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "version": 1,
        "dataset": "crypto.candles",
        "timeframe": tf,
        "description": (
            f"Canonical {tf} candle schema. UTC bar_end timestamps; "
            "half-open [from, to) read contract; engine: Spark DataFrames "
            "over a Hive-partitioned parquet tree."
        ),
        "layout": (
            "data/source={source}/market={market}/timeframe={tf}/"
            "symbol={symbol}/year={YYYY}/month={MM}/*.parquet"
        ),
        "ts_semantics": "bar_end",
        "range_contract": "[from, to) in UTC",
        "primary_key": ["source", "symbol", "timeframe", "ts"],
        "dedupe_on": ["source", "symbol", "timeframe", "ts"],
        "properties": _CANDLE_PROPERTIES,
    }


def levels_spec() -> dict:
    return {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "version": 1,
        "dataset": "crypto.levels_daily",
        "description": (
            "Opening-range daily levels (break & retest). One row per "
            "(session_date, symbol); retest searched over ALL post-OR bars "
            "(documented reference quirk)."
        ),
        "layout": "levels/symbol={symbol}/year={YYYY}/*.parquet",
        "primary_key": ["session_date", "symbol"],
        "dedupe_on": ["session_date", "symbol"],
        "properties": {
            "session_date": {"dtype": "date32", "nullable": False},
            "tz": {"dtype": "string", "nullable": False},
            "or_start": {"dtype": "timestamp[us, tz=UTC]", "nullable": False},
            "or_end": {"dtype": "timestamp[us, tz=UTC]", "nullable": False},
            "or_high": {"dtype": "float64", "nullable": False},
            "or_low": {"dtype": "float64", "nullable": False},
            "break_dir": {"dtype": "string", "nullable": False,
                          "enum": ["UP", "DOWN", "NONE"]},
            "break_ts": {"dtype": "timestamp[us, tz=UTC]", "nullable": True},
            "retest_ts": {"dtype": "timestamp[us, tz=UTC]", "nullable": True},
            "retest_price": {"dtype": "float64", "nullable": True},
            "symbol": {"dtype": "string", "nullable": False},
        },
    }


def all_specs() -> dict[str, dict]:
    out = {f"schema_{tf.lower()}.parquet.json": candle_spec(tf)
           for tf in TIMEFRAMES}
    out["schema_levels_daily.parquet.json"] = levels_spec()
    return out


def write_specs(root: str | pathlib.Path) -> list[pathlib.Path]:
    dest = pathlib.Path(root)
    dest.mkdir(parents=True, exist_ok=True)
    written = []
    for name, spec in all_specs().items():
        p = dest / name
        p.write_text(json.dumps(spec, indent=2) + "\n")
        written.append(p)
    return written
