"""OR-levels vs an independent pandas oracle implementing the reference
semantics (ref or_levels.py:19-64), including the documented retest quirk:
retests are searched over ALL post-OR bars, so a retest can precede the break."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from backtest_crew_datalake_spark.operators.levels import build_or_levels
from backtest_crew_datalake_spark.sources.synth import make_m1


def pandas_oracle(pdf: pd.DataFrame, or_window: str, tz: str, symbol: str):
    """Fresh reimplementation of the reference's per-day loop semantics."""
    pdf = pdf.copy()
    pdf["ts"] = pd.to_datetime(pdf["ts"], utc=True)
    local = pdf["ts"].dt.tz_convert(tz)
    s_hm, e_hm = or_window.split("-")
    out = []
    for day, chunk_idx in pdf.groupby(local.dt.date).groups.items():
        chunk = pdf.loc[chunk_idx]
        loc = local.loc[chunk_idx]
        day_start = pd.Timestamp(f"{day} {s_hm}", tz=tz)
        day_end = pd.Timestamp(f"{day} {e_hm}", tz=tz)
        in_or = chunk[(loc >= day_start) & (loc < day_end)]
        if in_or.empty:
            continue
        or_high, or_low = in_or.high.max(), in_or.low.min()
        post = chunk[loc >= day_end].sort_values("ts")
        bdir, bts, rts, rprice = "NONE", pd.NaT, pd.NaT, np.nan
        ups = post[post.close > or_high]
        dns = post[post.close < or_low]
        cands = []
        if len(ups):
            cands.append(("UP", ups.iloc[0].ts))
        if len(dns):
            cands.append(("DOWN", dns.iloc[0].ts))
        if cands:
            cands.sort(key=lambda x: x[1])
            bdir, bts = cands[0]
            rt = post[post.low <= or_high] if bdir == "UP" \
                else post[post.high >= or_low]
            if len(rt):
                rts, rprice = rt.iloc[0].ts, rt.iloc[0].close
        out.append(dict(session_date=day, or_high=or_high, or_low=or_low,
                        break_dir=bdir, break_ts=bts, retest_ts=rts,
                        retest_price=rprice, symbol=symbol))
    return pd.DataFrame(out).sort_values("session_date").reset_index(drop=True)


@pytest.mark.parametrize("tz,or_window", [
    ("UTC", "00:00-01:00"),
    ("America/New_York", "09:30-10:00"),
])
def test_levels_vs_oracle(spark, tz, or_window):
    m1 = make_m1(spark, ["BTC-USD"], "2024-03-01", "2024-03-03", seed=42)
    got = (
        build_or_levels(m1, or_window=or_window, tz=tz, by=["symbol"])
        .orderBy("session_date")
        .toPandas()
    )
    oracle = pandas_oracle(m1.toPandas(), or_window, tz, "BTC-USD")
    assert len(got) == len(oracle)
    for g, o in zip(got.itertuples(), oracle.itertuples()):
        assert str(g.session_date) == str(o.session_date)
        assert g.break_dir == o.break_dir
        assert abs(g.or_high - o.or_high) < 1e-9
        assert abs(g.or_low - o.or_low) < 1e-9
        for a, b in ((g.break_ts, o.break_ts), (g.retest_ts, o.retest_ts)):
            if pd.isna(b):
                assert pd.isna(a)
            else:
                assert pd.Timestamp(a, tz="UTC") == b
        if pd.isna(o.retest_price):
            assert pd.isna(g.retest_price)
        else:
            assert abs(g.retest_price - o.retest_price) < 1e-9


def test_levels_crafted_cases(spark):
    """Crafted UP-break day: flat OR window then a ramp through or_high."""
    rows = []
    base = pd.Timestamp("2024-01-01 00:00:00")
    # OR window 00:00-00:05: high=101, low=99
    for i in range(5):
        rows.append(("S", base + pd.Timedelta(minutes=i), 100.0, 101.0, 99.0, 100.0))
    # post-OR: first close above 101 at minute 7; low dips to 100.5 at minute 6
    rows.append(("S", base + pd.Timedelta(minutes=5), 100.0, 100.9, 100.2, 100.5))
    rows.append(("S", base + pd.Timedelta(minutes=6), 100.5, 101.5, 100.5, 100.9))
    rows.append(("S", base + pd.Timedelta(minutes=7), 101.0, 102.5, 101.0, 102.0))
    df = spark.createDataFrame(
        [(s, t.to_pydatetime(), o, h, l, c) for s, t, o, h, l, c in rows],
        ["symbol", "ts", "open", "high", "low", "close"],
    ).withColumn("volume", F.lit(1.0))
    got = build_or_levels(df, or_window="00:00-00:05", tz="UTC",
                          by=["symbol"]).toPandas().iloc[0]
    assert got.or_high == 101.0 and got.or_low == 99.0
    assert got.break_dir == "UP"
    assert pd.Timestamp(got.break_ts) == base + pd.Timedelta(minutes=7)
    # retest quirk: first post-OR bar with low <= or_high is minute 5 —
    # BEFORE the break — and retest_price is that bar's close
    assert pd.Timestamp(got.retest_ts) == base + pd.Timedelta(minutes=5)
    assert got.retest_price == 100.5
