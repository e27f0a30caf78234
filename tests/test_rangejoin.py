"""Interval join: bin-bucketed result must equal the naive BETWEEN join;
left mode keeps unmatched points; plan avoids BroadcastNestedLoop."""

import pandas as pd
from pyspark.sql import functions as F

from backtest_crew_datalake_spark.operators.rangejoin import interval_join


def _data(spark):
    b = pd.Timestamp("2024-01-01")
    pts = spark.createDataFrame(
        [(i, (b + pd.Timedelta(minutes=7 * i)).to_pydatetime())
         for i in range(200)],
        "pid long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(k, (b + pd.Timedelta(hours=k)).to_pydatetime(),
          (b + pd.Timedelta(hours=k, minutes=25)).to_pydatetime())
         for k in range(0, 24, 2)],
        "iid long, start timestamp, end timestamp",
    )
    return pts, iv


def test_matches_naive_between_join(spark):
    pts, iv = _data(spark)
    got = interval_join(pts, iv, bin_seconds=1800).orderBy("pid", "iid") \
        .toPandas()
    naive = (
        pts.join(iv, (pts.ts >= iv.start) & (pts.ts <= iv.end))
        .orderBy("pid", "iid").toPandas()
    )
    assert len(got) == len(naive) > 0
    assert (got.pid.values == naive.pid.values).all()
    assert (got.iid.values == naive.iid.values).all()


def test_left_keeps_unmatched(spark):
    pts, iv = _data(spark)
    got = interval_join(pts, iv, how="left", bin_seconds=900)
    assert got.count() >= pts.count()
    matched_pids = got.where(F.col("iid").isNotNull()).select("pid").distinct()
    unmatched = got.where(F.col("iid").isNull()).select("pid").distinct()
    assert matched_pids.count() + unmatched.count() == pts.count()


def test_binned_join_is_equi_not_nested_loop(spark):
    pts, iv = _data(spark)
    p = interval_join(pts, iv, bin_seconds=3600) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_spanning_interval_all_bins(spark):
    """An interval spanning many bins still matches points in each bin."""
    b = pd.Timestamp("2024-01-01")
    pts = spark.createDataFrame(
        [(i, (b + pd.Timedelta(hours=i)).to_pydatetime()) for i in range(12)],
        "pid long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(0, b.to_pydatetime(), (b + pd.Timedelta(hours=11)).to_pydatetime())],
        "iid long, start timestamp, end timestamp",
    )
    assert interval_join(pts, iv, bin_seconds=3600).count() == 12
