"""Deterministic synthetic M1 bar source (SURVEY §2.1 S8).

Same generative model as ref tools/synth_gen.py:9-43: per-day 1440-minute UTC
grid of bar_end timestamps, price = 100_000 + cumsum(gaussian σ=10) random
walk continuing across days, high/low = open ± uniform(0,5), close = open +
gaussian(0,2), volume = uniform_int(0,100). Seeded and reproducible.

Spark-native: the grid comes from sequence()+explode and the walk from a
running sum window — per-symbol partitioned, so generating a million symbol-
days parallelizes. randn/rand are seeded per-column; determinism holds for a
fixed (seed, partitioning), which the generator pins by repartitioning on
symbol before the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def make_m1(
    spark: SparkSession,
    symbols: list[str],
    day_from: str,
    day_to: str,
    seed: int = 42,
    price0: float = 100_000.0,
) -> DataFrame:
    """M1 bars for [day_from, day_to] inclusive (bar_end stamps 00:00…23:59
    shifted +1min? No — the reference stamps the minute grid directly
    (synth_gen.py:18-20), so we do too).
    Columns: ts, open, high, low, close, volume, symbol (+ caller adds
    metadata via enforce_schema)."""
    syms = spark.createDataFrame([(s,) for s in symbols], ["symbol"])
    grid = syms.select(
        "symbol",
        F.explode(
            F.sequence(
                F.lit(f"{day_from} 00:00:00").cast("timestamp"),
                F.lit(f"{day_to} 23:59:00").cast("timestamp"),
                F.expr("INTERVAL 1 MINUTE"),
            )
        ).alias("ts"),
    ).repartition("symbol")

    w = (
        Window.partitionBy("symbol")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    walk = grid.select(
        "symbol", "ts",
        (F.lit(price0) + F.sum(F.randn(seed) * 10.0).over(w)).alias("open"),
        F.rand(seed + 1).alias("__u_hi"),
        F.rand(seed + 2).alias("__u_lo"),
        F.randn(seed + 3).alias("__g_cl"),
        F.rand(seed + 4).alias("__u_vol"),
    )
    return walk.select(
        F.col("ts"),
        F.col("open"),
        (F.col("open") + F.col("__u_hi") * 5.0).alias("high"),
        (F.col("open") - F.col("__u_lo") * 5.0).alias("low"),
        (F.col("open") + F.col("__g_cl") * 2.0).alias("close"),
        F.floor(F.col("__u_vol") * 100).cast("double").alias("volume"),
        F.col("symbol"),
    )
