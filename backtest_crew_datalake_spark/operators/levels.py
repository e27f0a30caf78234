"""Opening-range levels + break & retest — the reference's derived analytic (D1).

Semantics of ref src/datalake/levels/or_levels.py:19-64, per (symbol, local
session day):

- OR window  : local-tz [or_start, or_end) from an 'HH:MM-HH:MM' spec;
  or_high = max(high), or_low = min(low) over the window; sessions with no OR
  rows are skipped (or_levels.py:38-40).
- Break      : among bars with local ts >= or_end, the earliest close > or_high
  (UP) vs earliest close < or_low (DOWN); earliest of the two wins
  (or_levels.py:43-48).
- Retest     : first post-OR bar with low <= or_high (after UP) / high >= or_low
  (after DOWN); retest_price is that bar's CLOSE (or_levels.py:49-54).
  ⚠ Documented quirk preserved: the reference searches retests over ALL
  post-OR bars — not only bars after break_ts — so a retest can precede the
  break. We replicate the code.

Spark shape (SURVEY §2.10): ONE keyed shuffle, no per-day Python loop —
the OR levels are conditional min/max WINDOW aggregates over the
(by..., session_date) partition, computed in place on every row, and the
break/retest pass is a groupBy on the SAME keys, so it reuses the window's
partitioning without a second exchange. (An earlier shape aggregated the
levels separately and joined them back — a second full shuffle of the base,
and with a broadcast hint it pinned an OOM plan: the levels table is one
row per session, which grows linearly with the data.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_or_levels(
    df: DataFrame,
    or_window: str = "00:00-01:00",
    tz: str = "UTC",
    by: Sequence[str] = ("symbol",),
    ts_col: str = "ts",
) -> DataFrame:
    """Emit one row per (by..., session_date): or_high/or_low, break_dir/ts,
    retest_ts/price (schema per or_levels.py:55-62 / schemas.LEVELS_SCHEMA)."""
    start_hm, end_hm = or_window.split("-")
    by = list(by)

    local = F.from_utc_timestamp(F.col(ts_col), tz)
    hm = F.date_format(local, "HH:mm")
    base = df.select(
        *by,
        F.col(ts_col).alias("ts"),
        "open", "high", "low", "close",
        F.to_date(local).alias("session_date"),
        (hm >= start_hm).alias("__ge_start"),
        (hm < end_hm).alias("__lt_end"),
    )
    in_or = F.col("__ge_start") & F.col("__lt_end")
    after = ~F.col("__lt_end")  # local ts >= or_end (or_levels.py:41)

    wses = Window.partitionBy(*by, "session_date")
    joined = (
        base.withColumn(
            "or_high", F.max(F.when(in_or, F.col("high"))).over(wses))
        .withColumn(
            "or_low", F.min(F.when(in_or, F.col("low"))).over(wses))
        .where(F.col("or_high").isNotNull())  # skip sessions w/o OR rows
    )
    up_break = after & (F.col("close") > F.col("or_high"))
    dn_break = after & (F.col("close") < F.col("or_low"))
    up_retest = after & (F.col("low") <= F.col("or_high"))
    dn_retest = after & (F.col("high") >= F.col("or_low"))
    ts_close = F.struct(F.col("ts"), F.col("close"))

    agg = joined.groupBy(*by, "session_date").agg(
        F.first("or_high").alias("or_high"),
        F.first("or_low").alias("or_low"),
        F.min(F.when(up_break, F.col("ts"))).alias("__up_ts"),
        F.min(F.when(dn_break, F.col("ts"))).alias("__dn_ts"),
        F.min(F.when(up_retest, ts_close)).alias("__rt_up"),
        F.min(F.when(dn_retest, ts_close)).alias("__rt_dn"),
    )

    up_first = F.col("__up_ts").isNotNull() & (
        F.col("__dn_ts").isNull() | (F.col("__up_ts") <= F.col("__dn_ts"))
    )
    dn_first = F.col("__dn_ts").isNotNull() & ~up_first
    break_dir = (
        F.when(up_first, F.lit("UP"))
        .when(dn_first, F.lit("DOWN"))
        .otherwise(F.lit("NONE"))
    )
    rt = F.when(up_first, F.col("__rt_up")).when(dn_first, F.col("__rt_dn"))

    or_start_utc = F.to_utc_timestamp(
        F.concat_ws(" ", F.col("session_date").cast("string"), F.lit(start_hm)), tz
    )
    or_end_utc = F.to_utc_timestamp(
        F.concat_ws(" ", F.col("session_date").cast("string"), F.lit(end_hm)), tz
    )

    return agg.select(
        F.col("session_date"),
        F.lit(tz).alias("tz"),
        or_start_utc.alias("or_start"),
        or_end_utc.alias("or_end"),
        F.col("or_high"),
        F.col("or_low"),
        break_dir.alias("break_dir"),
        F.when(up_first, F.col("__up_ts"))
        .when(dn_first, F.col("__dn_ts")).alias("break_ts"),
        rt.getField("ts").alias("retest_ts"),
        rt.getField("close").alias("retest_price"),
        *by,
    )
