"""Timeframe-token normalization and durations.

ref src/bridge/backtest_crew/provider.py:12-23 (_TF_RULE) and
src/datalake/read/mtf.py:5 (TF_ORDER). Plain Python (driver-side planning
values), plus a Column variant for per-row normalization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ref provider.py:12-18
_TF_RULE = {
    "1min": "M1", "m1": "M1",
    "5mins": "M5", "5min": "M5", "m5": "M5",
    "15mins": "M15", "15min": "M15", "m15": "M15",
    "30mins": "M30", "30min": "M30", "m30": "M30",
    "1hour": "H1", "60min": "H1", "h1": "H1",
    "1day": "D1", "d1": "D1",
}

TF_SECONDS = {"M1": 60, "M5": 300, "M15": 900, "M30": 1800,
              "H1": 3600, "H4": 14400, "D1": 86400}

# ref mtf.py:5 — ordering used to apply as-of contexts fine→coarse.
TF_ORDER = {"M1": 1, "M5": 5, "M15": 15, "M30": 30, "H1": 60, "H4": 240, "D1": 1440}

# Expected complete-day bar counts per timeframe (QC target,
# ref src/datalake/ingestors/binance/ingest_cli.py:29-35).
EXPECTED_BARS_PER_DAY = {"M1": 1440, "M5": 288, "M15": 96, "M30": 48, "H1": 24, "D1": 1}


def normalize_tf(tf: str) -> str:
    """'1 min'/'5 mins'/'m5'/'1hour' -> 'M1'/'M5'/'H1' (ref provider.py:21-23)."""
    return _TF_RULE.get(tf.strip().lower().replace(" ", ""), tf.upper())


def normalize_tf_col(tf: Column) -> Column:
    """Per-row variant as a when-chain (JVM-side)."""
    key = F.regexp_replace(F.lower(F.trim(tf)), " ", "")
    expr: Column = F.upper(tf)
    for k, v in _TF_RULE.items():
        expr = F.when(key == k, F.lit(v)).otherwise(expr)
    return expr


def tf_seconds(tf: str) -> int:
    return TF_SECONDS[normalize_tf(tf)]
