"""Scalar functions (symbols, timeframes, timeutil) and QC operators."""

import pandas as pd
from pyspark.sql import functions as F

from backtest_crew_datalake_spark.functions.symbols import (
    split_symbol, to_binance_symbol,
)
from backtest_crew_datalake_spark.functions.timeframes import (
    normalize_tf, normalize_tf_col,
)
from backtest_crew_datalake_spark.functions.timeutil import to_bar_end, to_utc
from backtest_crew_datalake_spark.operators.qc import (
    bars_per_hour, completeness_check,
)
from backtest_crew_datalake_spark.operators.sessionize import sessionize
from backtest_crew_datalake_spark.sources.synth import make_m1


def test_to_binance_symbol(spark):
    df = spark.createDataFrame(
        [("BTC-USD",), ("ETH-USD",), ("SOL-USD",), ("ADA-EUR",), ("BTCUSDT",)],
        ["s"],
    ).select(to_binance_symbol("s").alias("m"))
    assert [r.m for r in df.collect()] == \
        ["BTCUSDT", "ETHUSDT", "SOLUSDT", "ADAEUR", "BTCUSDT"]


def test_split_symbol(spark):
    df = spark.createDataFrame(
        [("BTC-USD",), ("BTCUSD",), ("ETHUSDT",), ("BTC/USD",), ("XYZ",)], ["s"]
    ).select(split_symbol("s").alias("p"))
    got = [(r.p.base, r.p.quote) for r in df.collect()]
    assert got == [("BTC", "USD"), ("BTC", "USD"), ("ETH", "USDT"),
                   ("BTC", "USD"), ("XYZ", None)]


def test_normalize_tf():
    assert normalize_tf("1 min") == "M1"
    assert normalize_tf("5 mins") == "M5"
    assert normalize_tf("m15") == "M15"
    assert normalize_tf("1hour") == "H1"
    assert normalize_tf("1day") == "D1"
    assert normalize_tf("H4") == "H4"  # pass-through upper


def test_normalize_tf_col(spark):
    df = spark.createDataFrame([("1 min",), ("5 mins",), ("h1",)], ["tf"]) \
        .select(normalize_tf_col(F.col("tf")).alias("n"))
    assert [r.n for r in df.collect()] == ["M1", "M5", "H1"]


def test_bar_end_shift_and_exchange_tz(spark):
    df = spark.createDataFrame([("2024-01-01 09:30:00",)], ["raw"]).select(
        to_bar_end(F.col("raw").cast("timestamp")).alias("end"),
        to_utc(F.col("raw"), "PAXOS").alias("utc"),
    )
    r = df.collect()[0]
    assert r.end == pd.Timestamp("2024-01-01 09:31:00")
    # America/New_York is UTC-5 in January
    assert r.utc == pd.Timestamp("2024-01-01 14:30:00")


def test_completeness_check(spark):
    m1 = make_m1(spark, ["BTC-USD"], "2024-01-01", "2024-01-01", seed=4) \
        .withColumn("timeframe", F.lit("M1"))
    full = completeness_check(m1).collect()[0]
    assert full.n_bars == 1440 and full.n_expected == 1440 and full.complete
    gappy = completeness_check(m1.limit(1000)).collect()[0]
    assert not gappy.complete


def test_bars_per_hour_zero_fill(spark):
    m1 = make_m1(spark, ["BTC-USD"], "2024-01-01", "2024-01-01", seed=4) \
        .where(F.hour("ts") != 3)
    out = bars_per_hour(m1, by=["symbol"]).orderBy("hour").toPandas()
    assert len(out) == 24
    assert out[out.hour == 3].iloc[0].n_bars == 0
    assert out[out.hour == 4].iloc[0].n_bars == 60


def test_monotonicity_violations(spark):
    from backtest_crew_datalake_spark.operators.qc import (
        monotonicity_violations,
    )

    rows = [
        ("S", "2024-01-01 00:01:00"), ("S", "2024-01-01 00:02:00"),
        ("S", "2024-01-01 00:02:00"),  # duplicate ts → violation
        ("T", "2024-01-01 00:05:00"),
    ]
    df = spark.createDataFrame(rows, ["symbol", "ts"]) \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    bad = monotonicity_violations(df)
    assert bad.count() == 1
    # sorted + deduped series is clean
    from backtest_crew_datalake_spark.operators.dedup import dedupe_keep
    clean = dedupe_keep(df, key=["symbol", "ts"], order=None, keep="first")
    assert monotonicity_violations(clean).count() == 0


def test_entry_under_non_utc_session_tz(spark):
    """Driver-env hardening: queries must produce UTC-correct results even
    if the caller's session tz is not UTC (load() re-pins it)."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    spark.conf.set("spark.sql.session.timeZone", "America/Chicago")
    try:
        df = entrymod.queries()["q_evt_minmax"](spark, "/root/testdata/sf0.001")
        row = df.where(F.col("event_type") == "click").collect()[0]
        # epoch-ms values are tz-independent; sanity: January 2024 range
        assert 1704000000000 < row.first_ts_ms < 1706750000000
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_sessionize(spark):
    rows = [
        (1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:10:00"),
        (1, "2024-01-01 01:10:00"),  # > 30min gap → new session
        (2, "2024-01-01 05:00:00"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"]) \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = sessionize(df, timeout_seconds=1800).orderBy("user_id", "session_id") \
        .toPandas()
    assert len(out) == 3
    u1 = out[out.user_id == 1]
    assert list(u1.n_events) == [2, 1]
    assert u1.iloc[0].duration_sec == 600


def test_funnel_ground_truth(spark, tmp_path):
    """Constructed funnel truth: user 1 fully converts in order; user 2
    clicks BEFORE signing up (must not count past step 1); user 3 signs up
    and clicks but never purchases; user 4 only clicks (not in step 1)."""
    import datetime as dt

    import pandas as pd

    from backtest_crew_datalake_spark.queries import all_queries

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, uid, typ, minutes):
        return (i, t0 + dt.timedelta(minutes=minutes), uid, typ, 1.0, "{}")

    rows = [
        ev(1, 1, "signup", 0), ev(2, 1, "click", 10), ev(3, 1, "purchase", 20),
        ev(4, 2, "click", 0), ev(5, 2, "signup", 10),
        ev(6, 3, "signup", 0), ev(7, 3, "click", 5),
        ev(8, 4, "click", 0),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value",
                       "props"])
    pdf.to_parquet(f"{tmp_path}/events.parquet")

    out = {r["event_type"]: r["n_users"]
           for r in all_queries()["q_evt_funnel"]
           .build(spark, str(tmp_path)).collect()}
    assert out == {"signup": 3, "click": 2, "purchase": 1}


def test_retention_ground_truth(spark, tmp_path):
    """Constructed cohorts: users 1-2 first active in week 0 (user 1 also
    active in week 1), user 3 first active in week 1. Weeks are Monday
    date_trunc buckets."""
    import datetime as dt

    import pandas as pd

    from backtest_crew_datalake_spark.queries import all_queries

    w0 = dt.datetime(2024, 1, 1)   # a Monday
    w1 = w0 + dt.timedelta(days=7)
    rows = [
        (1, w0, 1, "click", 1.0, "{}"),
        (2, w0 + dt.timedelta(days=2), 2, "view", 1.0, "{}"),
        (3, w1 + dt.timedelta(days=1), 1, "click", 1.0, "{}"),
        (4, w1, 3, "signup", 1.0, "{}"),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value",
                       "props"])
    pdf.to_parquet(f"{tmp_path}/events.parquet")

    got = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in all_queries()["q_evt_retention"]
           .build(spark, str(tmp_path)).collect()}
    assert got == {
        ("2024-01-01", 0): 2,   # users 1, 2 in their cohort week
        ("2024-01-01", 1): 1,   # user 1 retained one week later
        ("2024-01-08", 0): 1,   # user 3's own cohort week
    }


def test_load_memo_hard_cap_evicts_stale_apps(spark):
    """The load() memo is hard-capped: once it reaches 256 entries,
    plans recorded under OTHER application ids (dead sessions) are
    evicted; if none are stale the whole memo resets rather than grow."""
    from backtest_crew_datalake_spark import queries as Q

    saved = dict(Q._LOAD_MEMO)
    try:
        Q._LOAD_MEMO.clear()
        for i in range(256):
            Q._LOAD_MEMO[("dead-app", f"/dir{i}", "t")] = object()
        df = Q.load(spark, "/root/testdata/sf0.001", "region")
        app = spark.sparkContext.applicationId
        assert all(k[0] == app for k in Q._LOAD_MEMO)
        assert Q._LOAD_MEMO[(app, "/root/testdata/sf0.001", "region")] is df
        assert len(Q._LOAD_MEMO) == 1

        # live-app-only overflow: resets instead of growing unbounded
        for i in range(256):
            Q._LOAD_MEMO[(app, f"/dir{i}", "t")] = object()
        Q.load(spark, "/root/testdata/sf0.001", "nation")
        assert len(Q._LOAD_MEMO) == 1
    finally:
        Q._LOAD_MEMO.clear()
        Q._LOAD_MEMO.update(saved)


def test_cli_curate_e2e(spark, tmp_path):
    from backtest_crew_datalake_spark import cli

    docs = str(tmp_path / "docs")
    bench = str(tmp_path / "bench")
    out = str(tmp_path / "curated")
    good = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu")
    rows = [
        (0, good, "a"),
        (1, good, "a"),                      # exact dup of 0
        (2, " ".join(["x"] * 12), "b"),      # repetitive + low quality
        (3, "leak one two three four five six seven eight nine ten more "
            "tail words", "b"),              # contaminated
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.parquet(docs)
    spark.createDataFrame(
        [(9, "leak one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    ).write.parquet(bench)
    cli.main(["curate", "--docs", docs, "--benchmark", bench,
              "--out", out])
    led = {r.doc_id: r.status
           for r in spark.read.parquet(f"{out}/ledger").collect()}
    assert led[0] == "kept" and led[1] == "duplicate"
    assert led[2] in ("low_quality", "repetitive")
    assert led[3] == "contaminated"
    acc = spark.read.parquet(f"{out}/accepted").collect()
    assert [r.doc_id for r in acc] == [0]
    assert set(acc[0].asDict()) == {"doc_id", "text", "source"}
