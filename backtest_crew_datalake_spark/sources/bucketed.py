"""Symbol-bucketed candle tables — the co-location strategy for the candle
lake at scale (ROADMAP: 'bucketed tables for co-located joins', complementing
the fact-fact demo in tests/test_bucketing.py).

The Hive-partitioned tree (sources/lake.py) prunes by (source, market, tf,
symbol) but every per-symbol shuffle op — resample's groupBy(symbol, bucket),
the as-of window's partitionBy(symbol), gaps-and-islands — still pays an
Exchange. Writing the lake as a table bucketed by ``symbol`` pre-hashes rows
into N stable buckets, so scans report HashPartitioning(symbol) and Catalyst
elides those Exchanges entirely: at 100 TB the per-symbol pipeline becomes
scan → (in-bucket sort) → agg with zero data movement. sortBy(symbol, ts)
additionally lets the in-bucket sort read pre-sorted runs.

Bucket count guidance: buckets are fixed at write time and each bucket is a
file per (partition, bucket) — pick ~2-4× the executor count and far fewer
than the symbol count so buckets stay balanced (skewed single symbols are a
salting problem, operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_candles(
    df: DataFrame,
    table: str,
    path: str,
    n_buckets: int = 8,
    partition_cols: list[str] | None = None,
) -> None:
    """Save candles as an external table bucketed by symbol and sorted by
    (symbol, ts) within buckets. ``partition_cols`` (e.g. ["year","month"])
    adds Hive partitioning on top — pruning AND co-location compose."""
    w = (
        df.write.bucketBy(n_buckets, "symbol")
        .sortBy("symbol", "ts")
        .option("path", path)
        .mode("overwrite")
    )
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.saveAsTable(table)


def read_bucketed_candles(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed candle table (bucket metadata applies automatically
    when spark.sql.sources.bucketing.enabled is true, the default)."""
    return spark.table(table)
