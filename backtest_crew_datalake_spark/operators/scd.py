"""Slowly-changing-dimension Type 2: build versioned dimension history from
a change stream, and point-in-time (PIT) join facts to the version valid at
their timestamp.

The reference keeps no dimension history (its lake is candle-only), but any
lakehouse serving features/backtests needs PIT correctness: joining a fact to
the dimension row that was CURRENT at fact time, never a later one (lookahead
leakage — the exact hazard the reference's as-of join exists to avoid on
prices, ref src/datalake/read/api.py:87, lifted here to dimension versions).

Design:
- ``scd2_build`` is window-only — one shuffle on the natural key; the
  keep-last-per-timestamp dedupe, the change-detection filter (a new version
  ONLY when a tracked attribute actually changed — consecutive identical
  snapshots collapse), and the validity chaining (eff_to = next eff_from,
  open tail = current) all ride the same partitioning, so Catalyst plans a
  single Exchange however long the history is.
- ``pit_join`` reuses the as-of kernel (operators/asof.asof_join): versions
  are non-overlapping and right-closed-open per key, so "latest eff_from <=
  fact ts" IS interval containment — one union+LOCF shuffle, no range join,
  no broadcast of the fact side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .asof import asof_join


def scd2_build(
    df: DataFrame,
    key: Sequence[str],
    attrs: Sequence[str],
    ts_col: str = "ts",
    order_col: str | None = None,
) -> DataFrame:
    """Collapse a change stream (key..., ts, attrs...) into SCD2 versions.

    Returns one row per (key..., version): key cols, attrs, ``eff_from``,
    ``eff_to`` (null for the open tail), ``is_current``.

    Rules (applied deterministically, in order):
    1. keep-last per (key, ts): if several updates share a timestamp the
       highest ``order_col`` (or last by attrs tuple when absent) wins —
       zero-length versions never exist;
    2. change detection: a row opens a new version only when its attrs
       tuple differs from the previous version's (null-safe comparison);
    3. validity: eff_to = next version's eff_from within the key.
    """
    key = list(key)
    attrs = list(attrs)
    astruct = F.struct(*[F.col(a) for a in attrs])

    # keep-last per (key, ts) WITHOUT a (key, ts)-partitioned window — that
    # would hash on a different key and cost a second Exchange. Ordered by
    # (ts ASC, tiebreak DESC) within the key partition, the winner of each
    # equal-ts run is exactly its FIRST row (= previous row has another ts).
    tie = F.col(order_col).desc() if order_col else astruct.desc()
    w_tie = Window.partitionBy(*key).orderBy(F.col(ts_col).asc(), tie)
    latest = (
        df.withColumn("__prev_ts", F.lag(F.col(ts_col)).over(w_tie))
        .where(
            F.col("__prev_ts").isNull()
            | (F.col("__prev_ts") != F.col(ts_col))
        )
        .drop("__prev_ts")
    )

    w = Window.partitionBy(*key).orderBy(ts_col)
    changed = (
        latest.withColumn("__prev", F.lag(astruct).over(w))
        .where(F.col("__prev").isNull() | ~F.col("__prev").eqNullSafe(astruct))
        .drop("__prev")
    )

    w2 = Window.partitionBy(*key).orderBy(ts_col)
    return (
        changed.withColumn("eff_to", F.lead(F.col(ts_col)).over(w2))
        .withColumn("is_current", F.col("eff_to").isNull())
        .withColumnRenamed(ts_col, "eff_from")
        .select(*key, *attrs, "eff_from", "eff_to", "is_current")
    )


def pit_join(
    fact: DataFrame,
    dim: DataFrame,
    key: Sequence[str],
    fact_ts: str = "ts",
    dim_cols: Sequence[str] | None = None,
    suffix: str = "",
) -> DataFrame:
    """Attach to each fact row the dimension version valid at its timestamp
    (eff_from <= fact_ts < eff_to, open tail matches everything after).
    Facts before the key's first version (or with no dimension key at all)
    carry nulls — the caller decides the unattributed policy."""
    key = list(key)
    dim_cols = list(
        dim_cols
        or [c for c in dim.columns
            if c not in (*key, "eff_from", "eff_to", "is_current")]
    )
    right = dim.select(*key, F.col("eff_from").alias(fact_ts), *dim_cols)
    return asof_join(
        fact, right, on=fact_ts, by=key, right_cols=dim_cols, suffix=suffix
    )
