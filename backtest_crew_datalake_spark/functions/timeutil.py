"""Date/time scalar helpers (the reference's densest function area, SURVEY §2.8).

All pure Column expressions; session timezone is pinned UTC by session.py so
`cast("timestamp")` never silently localizes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ref src/datalake/ingestors/ibkr/timeutil.py:4-6
EXCHANGE_TZ = {"PAXOS": "America/New_York"}


def to_utc(ts: Column, exchange: Column | str | None = None) -> Column:
    """Naive vendor timestamp in the exchange's tz -> UTC timestamp.

    ref src/datalake/ingestors/ibkr/timeutil.py:8-17 (PAXOS -> America/New_York,
    default UTC).
    """
    ts = ts.cast("timestamp")
    if exchange is None:
        return ts
    if isinstance(exchange, str):
        tz = F.lit(EXCHANGE_TZ.get(exchange, "UTC"))
    else:
        tz = exchange
        for k, v in EXCHANGE_TZ.items():
            tz = F.when(exchange == k, F.lit(v)).otherwise(tz)
    return F.to_utc_timestamp(ts, tz)


def to_bar_end(ts: Column, minutes: int = 1) -> Column:
    """bar_start -> bar_end shift (+1 minute for M1).

    IB reports bar START; the lake stores bar END
    (ref src/datalake/ingestors/ibkr/normalize.py:6-18, shift at line 11).
    """
    return ts.cast("timestamp") + F.expr(f"INTERVAL {int(minutes)} MINUTE")


def minute_grid(start: Column, end: Column) -> Column:
    """Array of minute timestamps [start, end] inclusive (ref gaps.py:53
    pd.date_range(freq='1min')); explode() it to get grid rows."""
    return F.sequence(start.cast("timestamp"), end.cast("timestamp"),
                      F.expr("INTERVAL 1 MINUTE"))


def session_local(ts: Column, tz: str) -> Column:
    """UTC ts rendered in a local timezone (for session masks, ref
    or_levels.py:26)."""
    return F.from_utc_timestamp(ts, tz)


def epoch_ms(ts: Column) -> Column:
    """datetime -> epoch milliseconds (ref providers/binance/client.py:32-33)."""
    return F.unix_millis(ts.cast("timestamp"))


def from_epoch_ms(ms: Column) -> Column:
    """epoch milliseconds -> timestamp (ref client.py:112)."""
    return F.timestamp_millis(ms.cast("long"))
