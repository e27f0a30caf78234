"""Rate-limited Binance landing-dir poller — the live-ingest bridge
(ROADMAP streaming item).

Structured Streaming has no REST-polling source, and the right shape for a
rate-limited vendor API is exactly what the reference does for backfills:
a driver-side paced fetch loop. This poller closes the loop for LIVE data:

    poll_binance_to_landing  ──parquet──▶  landing/   ──readStream──▶
    streaming/ingest.stream_ingest_candles  ──foreachBatch MERGE──▶  lake/

Each poll fetches (cursor, now], appends to the landing dir, and advances a
cursor persisted under ``landing/_cursor/`` (underscore-prefixed paths are
invisible to Spark's file-stream source, so the cursor lives next to the
data without polluting the stream). Crash-safe by construction: the cursor
is written AFTER the append, so a crash between the two replays an overlap
that the downstream keyed upsert dedupes — at-least-once into the landing
dir, exactly-once in the lake (same idempotence contract as ref
README.md:176's re-ingest semantics).

The TokenBucket throttle and the HTTP client are both injectable — offline
tests drive the whole path with a fake; production passes the real ones
(Binance weight budget 5000/min, ref tools/fill_binance_month.py:57-84).
"""

from __future__ import annotations

import json
import math
import os
import time
from datetime import datetime, timezone

from pyspark.sql import SparkSession, functions as F

from ..functions.timeframes import tf_seconds
from ..sources.connectors import PAGE_LIMIT, TokenBucket, fetch_binance_klines


def _cursor_path(landing_dir: str, symbol: str) -> str:
    return os.path.join(landing_dir, "_cursor", f"{symbol}.json")


def _read_cursor(landing_dir: str, symbol: str) -> datetime | None:
    p = _cursor_path(landing_dir, symbol)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return datetime.fromisoformat(json.load(f)["cursor"])


def _write_cursor(landing_dir: str, symbol: str, cur: datetime) -> None:
    p = _cursor_path(landing_dir, symbol)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"cursor": cur.isoformat()}, f)
    os.replace(tmp, p)


def poll_binance_to_landing(
    spark: SparkSession,
    symbol: str,
    landing_dir: str,
    start: datetime,
    tf: str = "M1",
    iterations: int = 1,
    interval_s: float = 0.0,
    http_get=None,
    bucket: TokenBucket | None = None,
    now=None,
    sleep=time.sleep,
) -> int:
    """Run ``iterations`` polls; returns total rows appended to the landing
    dir. ``now``/``sleep``/``http_get``/``bucket`` are injectable for
    offline tests. The first poll starts at the persisted cursor if one
    exists, else ``start`` (so restarts resume where they left off)."""
    now = now or (lambda: datetime.now(timezone.utc).replace(tzinfo=None))
    secs = tf_seconds(tf)
    total = 0
    for i in range(iterations):
        cur = _read_cursor(landing_dir, symbol) or start
        end = now()
        if end <= cur:
            sleep(interval_s)
            continue
        if bucket is not None:
            # weight ≈ pages needed for the span (1 request per 1000 bars)
            span_bars = max(1, int((end - cur).total_seconds() // secs))
            bucket.acquire(max(1.0, math.ceil(span_bars / PAGE_LIMIT)))
        df = fetch_binance_klines(spark, symbol, cur, end, tf,
                                  http_get=http_get, sleep=sleep)
        n = df.count()
        if n:
            df.write.mode("append").parquet(landing_dir)
            last_ts = df.agg(F.max("ts")).collect()[0][0]
            _write_cursor(landing_dir, symbol, last_ts)
            total += n
        if i + 1 < iterations:
            sleep(interval_s)
    return total
