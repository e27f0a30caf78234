"""As-of join vs pandas merge_asof oracle (the reference's flagship join,
ref api.py:87 / mtf.py:24-26; shape invariant ref test_join_mtf_shapes.py)."""

import pandas as pd
from pyspark.sql import functions as F

from backtest_crew_datalake_spark.operators.asof import asof_join, join_mtf
from backtest_crew_datalake_spark.operators.resample import resample_ohlcv
from backtest_crew_datalake_spark.sources.synth import make_m1


def test_backward_matches_merge_asof(spark):
    exec_df = make_m1(spark, ["BTC-USD"], "2024-01-01", "2024-01-01", seed=42)
    ctx = resample_ohlcv(exec_df, "M5").select("symbol", "ts", "close")

    got = (
        asof_join(exec_df, ctx, on="ts", by=["symbol"],
                  right_cols=["close"], suffix="_M5")
        .orderBy("ts").toPandas()
    )
    assert len(got) == 1440  # row preservation

    e = exec_df.orderBy("ts").toPandas()
    c = ctx.orderBy("ts").toPandas().rename(columns={"close": "close_M5"})
    oracle = pd.merge_asof(
        e, c[["ts", "close_M5"]], on="ts", direction="backward"
    )
    pd.testing.assert_series_equal(
        got["close_M5"].reset_index(drop=True), oracle["close_M5"],
        check_names=False,
    )
    # tie: a ctx row at exactly ts IS a backward match
    tie = got[got.ts == pd.Timestamp("2024-01-01 00:05:00")].iloc[0]
    c5 = c[c.ts == pd.Timestamp("2024-01-01 00:05:00")].iloc[0]
    assert tie["close_M5"] == c5["close_M5"]


def test_forward_direction(spark):
    exec_df = make_m1(spark, ["BTC-USD"], "2024-01-01", "2024-01-01", seed=1)
    ctx = resample_ohlcv(exec_df, "M15").select("symbol", "ts", "open")
    got = (
        asof_join(exec_df, ctx, on="ts", by=["symbol"],
                  right_cols=["open"], suffix="_nx", direction="forward")
        .orderBy("ts").toPandas()
    )
    e = exec_df.orderBy("ts").toPandas()
    c = ctx.orderBy("ts").toPandas().rename(columns={"open": "open_nx"})
    oracle = pd.merge_asof(e, c[["ts", "open_nx"]], on="ts", direction="forward")
    pd.testing.assert_series_equal(
        got["open_nx"].reset_index(drop=True), oracle["open_nx"],
        check_names=False,
    )


def test_multi_symbol_partitioning(spark):
    exec_df = make_m1(spark, ["BTC-USD", "ETH-USD"], "2024-01-01",
                      "2024-01-01", seed=3)
    ctx = resample_ohlcv(exec_df, "H1").select("symbol", "ts", "close")
    got = asof_join(exec_df, ctx, on="ts", by=["symbol"],
                    right_cols=["close"], suffix="_H1")
    assert got.count() == 2880
    # per-symbol independence: each symbol's 00:30 row joins its own H1 close
    pdf = got.where(F.col("ts") == "2024-01-01 01:30:00").toPandas()
    cp = ctx.where(F.col("ts") == "2024-01-01 01:00:00").toPandas()
    for _, r in pdf.iterrows():
        expect = cp[cp.symbol == r.symbol].iloc[0].close
        assert r.close_H1 == expect


def test_join_mtf_cascade_shapes(spark):
    """Ref tests/test_join_mtf_shapes.py:14-24: output len == exec len and
    each ctx contributes its suffixed column(s)."""
    exec_df = make_m1(spark, ["BTC-USD"], "2024-01-01", "2024-01-01", seed=9)
    ctxs = {tf: resample_ohlcv(exec_df, tf).select("symbol", "ts", "open",
                                                   "high", "low", "close",
                                                   "volume")
            for tf in ("M5", "M15")}
    out = join_mtf(exec_df, ctxs, by=["symbol"], close_only=False)
    assert out.count() == 1440
    for tf in ("M5", "M15"):
        for c in ("open", "high", "low", "close", "volume"):
            assert f"{c}_{tf}" in out.columns

    out_close = join_mtf(exec_df, ctxs, by=["symbol"], close_only=True)
    assert "close_M5" in out_close.columns
    assert "open_M5" not in out_close.columns


def test_tolerance(spark):
    exec_df = make_m1(spark, ["BTC-USD"], "2024-01-01", "2024-01-01", seed=5)
    ctx = resample_ohlcv(exec_df, "H1").select("symbol", "ts", "close")
    got = (
        asof_join(exec_df, ctx, on="ts", by=["symbol"], right_cols=["close"],
                  suffix="_t", tolerance_seconds=300)
        .orderBy("ts").toPandas()
    )
    # minutes more than 5min past the hour bucket get NULL
    row = got[got.ts == pd.Timestamp("2024-01-01 02:30:00")].iloc[0]
    assert pd.isna(row["close_t"])
    row2 = got[got.ts == pd.Timestamp("2024-01-01 02:04:00")].iloc[0]
    assert not pd.isna(row2["close_t"])
