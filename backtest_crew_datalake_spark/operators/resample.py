"""Time-bucket OHLCV rollup ("resample") — the reference's flagship aggregation.

Semantics of ref src/datalake/aggregates/aggregate.py:28-45 (pandas
``resample(rule, label='left', closed='left')``):

- dedupe input on ``ts`` keep-last (aggregate.py:40);
- bucket bars into tumbling windows labeled by the bucket START
  (``label='left', closed='left'`` — note the provider docstring at
  provider.py:56 claims bar_end labeling; the CODE always uses label='left';
  we replicate the code, SURVEY §2.4 A1);
- agg open=first, high=max, low=min, close=last, volume=sum;
- generate the complete bucket grid between min and max bucket, forward-fill
  OHLC across empty buckets (volume of an empty bucket is 0.0, pandas
  sum-of-empty), drop rows whose OHLC is still null (aggregate.py:43-44).

Spark shape: groupBy(window) with min_by/max_by (JVM-side, no Python);
grid via per-group sequence+explode; ffill via last(ignorenulls) window.
Shuffles: one for the groupBy keyed (by, bucket), one window keyed (by) —
at 100 TB both are keyed by symbol so they are narrow and skew-free (symbols
are roughly uniform); no global sort anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeframes import tf_seconds
from .dedup import dedupe_keep

OHLC = ["open", "high", "low", "close"]


def resample_ohlcv(
    df: DataFrame,
    tf: str,
    by: Sequence[str] = ("symbol",),
    ts_col: str = "ts",
    fill_gaps: bool = True,
) -> DataFrame:
    """Roll M1 (or finer) bars up to ``tf``; returns ts (bucket start, left
    label) + OHLCV + the ``by`` columns, sorted within partitions.

    ``fill_gaps=True`` reproduces the pandas resample contract where empty
    interior buckets exist (ffilled OHLC, volume 0.0).
    """
    secs = tf_seconds(tf)
    by = list(by)
    dur = f"{secs} seconds"

    base = dedupe_keep(df, key=[*by, ts_col], order=None, keep="last")
    bucket = F.window(F.col(ts_col), dur).start.alias("__bucket")
    agged = (
        base.select(*by, bucket, *OHLC, "volume", F.col(ts_col).alias("__ts"))
        .groupBy(*by, "__bucket")
        .agg(
            F.min_by("open", "__ts").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", "__ts").alias("close"),
            F.sum("volume").alias("volume"),
        )
    )
    if not fill_gaps:
        return agged.withColumnRenamed("__bucket", ts_col)

    # Complete per-group bucket grid [min_bucket, max_bucket] (pandas resample
    # materializes every bucket in between; ref aggregate.py:41-44).
    grid = (
        agged.groupBy(*by)
        .agg(F.min("__bucket").alias("__b0"), F.max("__bucket").alias("__b1"))
        .select(
            *by,
            F.explode(
                F.sequence("__b0", "__b1", F.expr(f"INTERVAL {secs} SECOND"))
            ).alias("__bucket"),
        )
    )
    w = (
        Window.partitionBy(*by)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = grid.join(agged, on=[*by, "__bucket"], how="left")
    for c in OHLC:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return (
        filled.withColumn("volume", F.coalesce("volume", F.lit(0.0)))
        .na.drop(subset=OHLC)
        .withColumnRenamed("__bucket", ts_col)
    )
