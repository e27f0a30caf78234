"""Data-quality checks (SURVEY §2.4 A4/A5, §2.7 F4).

ref src/datalake/ingestors/binance/ingest_cli.py:29-35,104-112 (bars/day vs
expected), ingest_cli.py:681-686 / tools/check_day.py:54-56 (per-hour
histogram reindexed to 24 buckets), src/datalake/validate_layout.py:7-29
(layout regex).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.timeframes import EXPECTED_BARS_PER_DAY

# ref validate_layout.py:7-10
LAYOUT_RE = re.compile(
    r".*/data/source=[^/]+/market=[^/]+/timeframe=[^/]+/symbol=[^/]+"
    r"/year=\d{4}/month=\d{2}/[^/]+\.parquet$"
)


def bars_per_day(
    df: DataFrame, by: Sequence[str] = ("symbol", "timeframe"), ts_col: str = "ts"
) -> DataFrame:
    """Row counts per (by..., UTC day)."""
    return (
        df.groupBy(*by, F.to_date(ts_col).alias("day"))
        .agg(F.count("*").alias("n_bars"))
    )


def completeness_check(
    df: DataFrame,
    tf_col: str = "timeframe",
    by: Sequence[str] = ("symbol",),
    ts_col: str = "ts",
) -> DataFrame:
    """Per (by..., day): observed vs expected bars and a boolean `complete`
    (expected = {M1:1440, M5:288, M15:96, M30:48, H1:24, D1:1})."""
    expected = F.create_map(
        *[x for k, v in EXPECTED_BARS_PER_DAY.items() for x in (F.lit(k), F.lit(v))]
    )
    counts = bars_per_day(df, by=[*by, tf_col], ts_col=ts_col)
    return counts.select(
        *by, tf_col, "day", "n_bars",
        expected[F.col(tf_col)].alias("n_expected"),
    ).withColumn("complete", F.col("n_bars") == F.col("n_expected"))


def bars_per_hour(
    df: DataFrame, by: Sequence[str] = ("symbol",), ts_col: str = "ts"
) -> DataFrame:
    """Bars per hour-of-day, zero-filled to all 24 buckets per group
    (ref check_day.py:54-56 reindex(range(24), fill_value=0))."""
    spark = df.sparkSession
    hours = spark.range(24).select(F.col("id").cast("int").alias("hour"))
    groups = df.select(*by).distinct()
    full = groups.crossJoin(F.broadcast(hours))
    counts = (
        df.groupBy(*by, F.hour(ts_col).alias("hour"))
        .agg(F.count("*").alias("n_bars"))
    )
    return (
        full.join(counts, on=[*by, "hour"], how="left")
        .withColumn("n_bars", F.coalesce("n_bars", F.lit(0)))
    )


def monotonicity_violations(
    df: DataFrame, by: Sequence[str] = ("symbol",), ts_col: str = "ts"
) -> DataFrame:
    """Rows whose ts is NOT strictly greater than the previous row's within
    the group — the guard the reference runs before as-of joins
    (ref mtf.py:21-23 is_monotonic_increasing). Empty result == monotone
    (after the read contract's sort+dedupe it always is; this is the QC
    check for externally-supplied frames)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*by).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    return (
        df.withColumn("__prev_ts", prev)
        .where(F.col("__prev_ts").isNotNull()
               & (F.col(ts_col) <= F.col("__prev_ts")))
        .drop("__prev_ts")
    )


def validate_layout(spark: SparkSession, lake_root: str) -> list[str]:
    """Return parquet paths under <root>/data that violate the layout regex
    (driver-side filesystem walk — metadata-scale, not data-scale)."""
    import pathlib

    bad = []
    root = pathlib.Path(lake_root) / "data"
    for p in root.rglob("*.parquet"):
        if not LAYOUT_RE.match(str(p)):
            bad.append(str(p))
    return sorted(bad)
