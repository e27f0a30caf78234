"""Connectors (fake-HTTP Binance pagination/backoff, IBKR synth switch) and
the provider facade's materialized-aggregate routing."""

import json
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from backtest_crew_datalake_spark.provider import (
    build_aggregates, load_exec_and_filter,
)
from backtest_crew_datalake_spark.schemas import enforce_schema
from backtest_crew_datalake_spark.sources.connectors import (
    fetch_binance_klines, fetch_ibkr_bars, parallel_fetch_plan,
)
from backtest_crew_datalake_spark.sources.synth import make_m1
from backtest_crew_datalake_spark.sources.writer import upsert_candles


def _fake_binance(n_min=1440, day="2024-01-01", fail_first=0):
    """Fake klines endpoint: serves a full UTC day of 1-min bars, honoring
    startTime/limit pagination; optionally 429s the first calls."""
    day0 = int(datetime.fromisoformat(day).replace(tzinfo=timezone.utc)
               .timestamp() * 1000)
    calls = {"n": 0}

    def http_get(url):
        calls["n"] += 1
        if calls["n"] <= fail_first:
            return 429, b""
        qs = dict(kv.split("=") for kv in url.split("?")[1].split("&"))
        start = int(qs["startTime"])
        limit = int(qs["limit"])
        out = []
        t = max(start, day0)
        while len(out) < limit and t < day0 + n_min * 60_000:
            px = 100.0 + ((t - day0) // 60_000) * 0.01
            out.append([t, str(px), str(px + 1), str(px - 1), str(px + 0.5),
                        "10.0", t + 59_999, "0", 0, "0", "0", "0"])
            t += 60_000
        return 200, json.dumps(out).encode()

    return http_get, calls


def test_binance_pagination_and_bar_end(spark):
    http_get, calls = _fake_binance()
    df = fetch_binance_klines(
        spark, "BTC-USD",
        datetime(2024, 1, 1, tzinfo=timezone.utc),
        datetime(2024, 1, 2, tzinfo=timezone.utc),
        http_get=http_get,
    )
    assert df.count() == 1440
    assert calls["n"] >= 2  # 1440 bars at 1000/page → ≥2 pages
    r = df.orderBy("ts").limit(1).collect()[0]
    # bar_start 00:00 shifted to bar_end 00:01 (ref normalize.py:11)
    assert str(r["ts"]) == "2024-01-01 00:01:00"
    assert r["open"] == 100.0
    assert r["source"] == "binance" and r["timeframe"] == "M1"


def test_binance_backoff_retries(spark):
    http_get, calls = _fake_binance(n_min=60, fail_first=2)
    sleeps = []
    df = fetch_binance_klines(
        spark, "ETH-USD",
        datetime(2024, 1, 1, tzinfo=timezone.utc),
        datetime(2024, 1, 1, 1, tzinfo=timezone.utc),
        http_get=http_get, sleep=sleeps.append,
    )
    assert df.count() == 60
    assert sleeps == [1.0, 2.0]  # 2^0, 2^1 backoff before success


def test_binance_gives_up_after_max_retries(spark):
    def always_429(url):
        return 429, b""
    with pytest.raises(RuntimeError, match="after 5 tries"):
        fetch_binance_klines(
            spark, "BTC-USD",
            datetime(2024, 1, 1, tzinfo=timezone.utc),
            datetime(2024, 1, 1, 1, tzinfo=timezone.utc),
            http_get=always_429, sleep=lambda s: None,
        )


def test_ibkr_synth_switch(spark, monkeypatch):
    monkeypatch.delenv("SPARKLAKE_SYNTH", raising=False)
    with pytest.raises(NotImplementedError):
        fetch_ibkr_bars(spark, "BTC-USD", "2024-01-01", "2024-01-01")
    monkeypatch.setenv("SPARKLAKE_SYNTH", "1")
    df = fetch_ibkr_bars(spark, "BTC-USD", "2024-01-01", "2024-01-01")
    assert df.count() == 1440


def test_parallel_fetch_plan(spark):
    plan = parallel_fetch_plan(
        spark, ["BTC-USD", "ETH-USD"],
        datetime(2024, 1, 1, tzinfo=timezone.utc),
        datetime(2024, 1, 2, tzinfo=timezone.utc),
        window_hours=8,
    )
    assert plan.count() == 6  # 2 symbols × 3 chunks/day (ref ingest_cli.py:17)


def test_ingest_binance_range_end_to_end(spark, tmp_path):
    """S6→S4 composition: fetch (fake HTTP, paced) → enforce → upsert; read
    back through the lake contract; idempotent on re-ingest."""
    from backtest_crew_datalake_spark.sources.connectors import (
        ingest_binance_range,
    )
    from backtest_crew_datalake_spark.sources.lake import read_range

    root = str(tmp_path / "lake")
    http_get, _ = _fake_binance()
    args = (spark, root, "BTC-USD",
            datetime(2024, 1, 1, tzinfo=timezone.utc),
            datetime(2024, 1, 2, tzinfo=timezone.utc))
    n = ingest_binance_range(*args, http_get=http_get)
    assert n == 1440
    got = read_range(spark, root, symbol="BTC-USD", source="binance")
    assert got.count() == 1440
    ingest_binance_range(*args, http_get=http_get)  # idempotent
    assert read_range(spark, root, symbol="BTC-USD",
                      source="binance").count() == 1440


def test_token_bucket_pacing():
    from backtest_crew_datalake_spark.sources.connectors import TokenBucket

    clock = {"t": 0.0}
    sleeps = []

    def fake_sleep(s):
        sleeps.append(s)
        clock["t"] += s

    tb = TokenBucket(budget_per_window=3, window_s=60,
                     clock=lambda: clock["t"], sleep=fake_sleep)
    for _ in range(3):
        assert tb.acquire(1) == 0.0  # budget available, no wait
    slept = tb.acquire(1)            # budget exhausted → waits for window
    assert slept > 0 and abs(clock["t"] - 60.0) < 1.0
    assert tb.acquire(1) == 0.0 or clock["t"] >= 60.0


def test_repair_ladder_shrinks_windows(spark):
    """Ranges unfillable at 3600 s are retried at smaller steps
    (ref ingest_cli.py:324-366); recovered bars are deduped + clipped."""
    from backtest_crew_datalake_spark.sources.connectors import (
        repair_ranges_with_fallback,
    )

    calls = []

    def fetch(start, end):
        calls.append((start, end, int((end - start).total_seconds())))
        span = (end - start).total_seconds()
        if span > 600:  # vendor refuses big windows → forces the ladder down
            return None
        rows, cur = [], start
        while cur <= end:
            rows.append((cur.replace(tzinfo=None), 1.0, 1.0, 1.0, 1.0, 0.0))
            cur += __import__("datetime").timedelta(minutes=1)
        return spark.createDataFrame(
            rows, "ts timestamp, open double, high double, low double, "
                  "close double, volume double")

    rng = (datetime(2024, 1, 1, 0, 0, tzinfo=timezone.utc),
           datetime(2024, 1, 1, 0, 59, tzinfo=timezone.utc))
    out = repair_ranges_with_fallback(spark, fetch, [rng])
    assert out is not None and out.count() == 60
    steps_used = sorted({c[2] for c in calls}, reverse=True)
    assert steps_used[0] > 600  # tried the big window first
    assert any(s <= 600 for s in steps_used)  # then fell back


def test_provider_routing(spark, tmp_path):
    root = str(tmp_path / "lake")
    m1 = enforce_schema(
        make_m1(spark, ["BTC-USD"], "2024-01-01", "2024-01-01", seed=42),
        timeframe="M1",
    )
    upsert_candles(spark, m1, root)

    # no aggregates tree yet → on-the-fly resample
    ex, fl = load_exec_and_filter(
        spark, root, "BTC-USD", "2024-01-01", "2024-01-02",
        exec_tf="1 min", filter_tf="5 mins",
    )
    assert ex.count() == 1440 and fl.count() == 288

    # materialize and route through the pre-aggregated tree
    build_aggregates(spark, root, "BTC-USD", "2024-01-01", "2024-01-02",
                     ["M5"])
    ex2, fl2 = load_exec_and_filter(
        spark, root, "BTC-USD", "2024-01-01", "2024-01-02",
        exec_tf="1 min", filter_tf="5 mins",
    )
    assert fl2.count() == 288
    a = fl.select("ts", "close").orderBy("ts").toPandas()
    b = fl2.select("ts", "close").orderBy("ts").toPandas()
    assert (a.close.values == b.close.values).all()

    # same tf → same frame
    ex3, fl3 = load_exec_and_filter(
        spark, root, "BTC-USD", "2024-01-01", "2024-01-02",
        exec_tf="1 min", filter_tf="M1",
    )
    assert fl3.count() == ex3.count() == 1440


def test_cli_read_csv_sink(spark, tmp_path, capsys):
    """End-to-end CLI drive: synth-ingest then read --out-csv (S5 sink);
    the CSV round-trips the row count and the half-open range."""
    import glob

    import pandas as pd

    from backtest_crew_datalake_spark.cli import main

    lake = str(tmp_path / "lake")
    out = str(tmp_path / "out_csv")
    main(["synth-ingest", "--lake-root", lake, "--symbols", "BTC-USD",
          "--date-from", "2024-01-01", "--date-to", "2024-01-01",
          "--seed", "3"])
    main(["read", "--lake-root", lake, "--symbol", "BTC-USD",
          "--date-from", "2024-01-01", "--date-to", "2024-01-02",
          "--out-csv", out, "--head", "0"])
    files = glob.glob(f"{out}/*.csv")
    assert files
    pdf = pd.concat([pd.read_csv(f) for f in files])
    assert len(pdf) == 1440
    assert pdf["ts"].min().startswith("2024-01-01T00:00")
    assert pdf["ts"].max().startswith("2024-01-01T23:59")
