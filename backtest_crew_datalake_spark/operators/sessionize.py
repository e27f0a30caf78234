"""Event sessionization (gaps-and-islands) — extension operator for the
`events` table (SURVEY §7.1 extensions; the reference itself is batch-only,
SURVEY §2.11).

A session is a run of events for one user where consecutive gaps are
< timeout. Classic two-window formulation: flag session starts with lag(),
running-sum the flags to number sessions, then aggregate. Both windows and
the final groupBy are keyed by user — one shuffle total (the second window
and groupBy reuse the first shuffle's hash partitioning).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    by: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    timeout_seconds: int = 1800,
) -> DataFrame:
    """Assign session ids and aggregate one row per session:
    (by..., session_id, session_start, session_end, n_events, duration_sec)."""
    by = list(by)
    w = Window.partitionBy(*by).orderBy(ts_col)
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    flagged = df.withColumn(
        "__new_session",
        F.when(gap.isNull() | (gap >= timeout_seconds), F.lit(1)).otherwise(F.lit(0)),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("__new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        numbered.groupBy(*by, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .withColumn(
            "duration_sec",
            F.col("session_end").cast("long") - F.col("session_start").cast("long"),
        )
    )
