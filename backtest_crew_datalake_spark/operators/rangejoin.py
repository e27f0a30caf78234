"""Interval (range) join — points joined to the intervals containing them.

Naive `p.ts BETWEEN i.start AND i.end` forces Catalyst into a
BroadcastNestedLoopJoin (fine for tiny interval sets, quadratic otherwise).
The scale formulation is BIN BUCKETING: quantize time into fixed bins, explode
each interval into the bins it overlaps, equi-join points to intervals on the
bin, then apply the exact range predicate. Cost drops from O(P×I) to
O(P + Σ interval_bins) with a plain shuffle-partitionable equi-join — the
standard approach for interval overlap at scale.

Bin width trades replication (long intervals × narrow bins) against join
selectivity (short bins = fewer false candidates); set it near the median
interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point_ts <= end`` (closed interval).

    Returns points columns + intervals columns. ``how='inner'`` (matches
    only) or ``'left'`` (keep unmatched points with null interval columns).
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    b = F.lit(int(bin_seconds))
    p = points.withColumn("__bin", F.floor(F.col(point_ts).cast("long") / b))
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("long") / b),
                F.floor(F.col(end_col).cast("long") / b),
            )
        ),
    )
    cond = (
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) <= F.col(end_col))
    )
    if how == "inner":
        return p.join(i, "__bin").where(cond).drop("__bin")
    # left: bin-join inner candidates, then re-attach unmatched points
    matched = p.join(i, "__bin").where(cond).drop("__bin")
    unmatched = p.drop("__bin").join(
        matched.select(*points.columns).distinct(), points.columns, "left_anti"
    )
    return matched.unionByName(unmatched, allowMissingColumns=True)
