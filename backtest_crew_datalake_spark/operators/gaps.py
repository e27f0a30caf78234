"""Gap detection, run-length gap ranges, and synthetic gap fill.

ref src/datalake/tools/gaps.py:18-68 (expected minute grid MINUS observed,
then run-length collapse) and src/datalake/ingestors/ibkr/ingest_cli.py:229-267
(synthetic flat-bar fill: price = last known close, else next open, else 0.0;
volume 0; is_synth=True).

Spark shapes:
- grid MINUS observed  -> sequence+explode grid, left_anti join (SURVEY J3);
- run-length ranges    -> gaps-and-islands via ts - row_number * interval
  (SURVEY W4) — no per-minute Python loop;
- synth fill           -> grid anti-join, as-of backward for prev close, as-of
  forward for next open, coalesce (SURVEY M1/W7).

Scale: everything is keyed by the ``by`` columns (symbol); the grid is
generated per group from min/max, never collected to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .asof import asof_join


def expected_grid(
    df_bounds: DataFrame,
    by: Sequence[str],
    start_col: str = "__g0",
    end_col: str = "__g1",
    step_seconds: int = 60,
) -> DataFrame:
    """Explode per-group [start, end] inclusive grids at step_seconds."""
    return df_bounds.select(
        *by,
        F.explode(
            F.sequence(
                F.col(start_col).cast("timestamp"),
                F.col(end_col).cast("timestamp"),
                F.expr(f"INTERVAL {int(step_seconds)} SECOND"),
            )
        ).alias("ts"),
    )


def missing_minutes(
    df: DataFrame,
    by: Sequence[str] = ("symbol",),
    ts_col: str = "ts",
    start=None,
    end=None,
    step_seconds: int = 60,
) -> DataFrame:
    """Expected grid MINUS observed timestamps (ref gaps.py:53-54).

    start/end: optional literal bounds; default = per-group observed min/max
    (the reference checks a full day [00:00, 23:59] — pass those bounds).
    Returns (by..., ts) rows for each missing instant.
    """
    by = list(by)
    bounds = df.groupBy(*by).agg(
        (F.lit(start).cast("timestamp") if start is not None
         else F.min(ts_col)).alias("__g0"),
        (F.lit(end).cast("timestamp") if end is not None
         else F.max(ts_col)).alias("__g1"),
    )
    grid = expected_grid(bounds, by, step_seconds=step_seconds)
    obs = df.select(*by, F.col(ts_col).alias("ts")).distinct()
    return grid.join(obs, on=[*by, "ts"], how="left_anti")


def gap_ranges(
    missing: DataFrame,
    by: Sequence[str] = ("symbol",),
    ts_col: str = "ts",
    step_seconds: int = 60,
) -> DataFrame:
    """Collapse consecutive missing instants into (gap_start, gap_end, n_missing)
    rows (ref gaps.py:57-68 run-length loop → gaps-and-islands here)."""
    by = list(by)
    w = Window.partitionBy(*by).orderBy(ts_col)
    grp = (
        F.col(ts_col).cast("long")
        - F.row_number().over(w) * F.lit(int(step_seconds))
    ).alias("__island")
    return (
        missing.select(*by, ts_col, grp)
        .groupBy(*by, "__island")
        .agg(
            F.min(ts_col).alias("gap_start"),
            F.max(ts_col).alias("gap_end"),
            F.count("*").alias("n_missing"),
        )
        .drop("__island")
    )


def synth_fill_gaps(
    df: DataFrame,
    by: Sequence[str] = ("symbol",),
    ts_col: str = "ts",
    start=None,
    end=None,
    step_seconds: int = 60,
) -> DataFrame:
    """Fill missing minutes with flat synthetic bars (ref ingest_cli.py:229-267).

    Fill price: last known close before the gap, else next open after, else 0.0
    (ingest_cli.py:242-250); O=H=L=C=price, volume=0.0, is_synth=True; real rows
    get is_synth=False. Output = real ∪ synth, all original columns preserved
    (non-OHLCV extras are null on synth rows).
    """
    by = list(by)
    miss = missing_minutes(df, by=by, ts_col=ts_col, start=start, end=end,
                           step_seconds=step_seconds)
    obs = df.select(*by, ts_col, "open", "close")
    prev = asof_join(miss, obs, on=ts_col, by=by, right_cols=["close"],
                     suffix="__prev", direction="backward")
    both = asof_join(prev, obs, on=ts_col, by=by, right_cols=["open"],
                     suffix="__next", direction="forward")
    price = F.coalesce(F.col("close__prev"), F.col("open__next"), F.lit(0.0))
    synth = both.select(
        *by,
        F.col(ts_col),
        *[price.alias(c) for c in ("open", "high", "low", "close")],
        F.lit(0.0).alias("volume"),
        F.lit(True).alias("is_synth"),
    )
    real = df.withColumn("is_synth", F.lit(False))
    return real.unionByName(synth, allowMissingColumns=True)
