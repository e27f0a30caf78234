"""Count-min sketch as pure DataFrame operations.

A CMS is depth×width counters; item x increments cell (d, xxhash64(x, d) mod
width) for each depth d; the estimate is the MIN over depths. Built as a
groupBy over exploded (depth, cell) pairs — fully distributed, mergeable
(sketches from different partitions/days union+sum), and the sketch itself
is a tiny DataFrame that broadcasts.

Use over exact counts when the key cardinality is huge (URL/doc frequency at
100 TB): the sketch is O(depth×width) memory regardless of cardinality, and
the build is one map-side-combinable aggregation. Overestimates only;
error ≤ e/width × N with prob ≥ 1 − (1/2)^depth (standard CMS bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build the sketch: one row per (depth, cell) with its counter."""
    pairs = F.array(*[
        F.struct(
            F.lit(d).alias("d"),
            F.pmod(F.xxhash64(F.col(key_col), F.lit(d)), F.lit(width))
            .alias("cell"),
        )
        for d in range(depth)
    ])
    return (
        df.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.d").alias("d"), F.col("p.cell").alias("cell"))
        .agg(F.count("*").alias("n"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Estimate the frequency of each key in ``keys``: min over depths of the
    addressed counters (missing cell ⇒ 0). The sketch side broadcasts."""
    probes = keys.select(
        F.col(key_col),
        F.explode(F.array(*[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(F.xxhash64(F.col(key_col), F.lit(d)), F.lit(width))
                .alias("cell"),
            )
            for d in range(depth)
        ])).alias("p"),
    ).select(key_col, F.col("p.d").alias("d"), F.col("p.cell").alias("cell"))
    return (
        probes.join(F.broadcast(sketch), ["d", "cell"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("est_count"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches of identical (depth, width): cell-wise sum."""
    return (
        a.unionByName(b)
        .groupBy("d", "cell")
        .agg(F.sum("n").alias("n"))
    )
