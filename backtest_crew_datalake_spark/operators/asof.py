"""As-of join — the reference's flagship join (pandas ``merge_asof``).

Semantics of ref src/datalake/read/api.py:87 and src/datalake/read/mtf.py:24-26:
for each left ("exec") row attach the most recent right ("context") row with
``right.ts <= left.ts`` (direction='backward'; equal ts IS a match). Output has
exactly len(left) rows (ref tests/test_join_mtf_shapes.py:20-24).

Spark-first implementation (SURVEY §2.3 J1, option 1): tag both sides, UNION,
then ``last(value, ignorenulls=True)`` over a window partitioned by the ``by``
keys ordered by (ts, side) — right rows sort before left rows at equal ts so
backward ties match. One shuffle on ``by``; no range-explosion, no broadcast of
the big side; scales to arbitrarily many rows per key because the window is a
running LOCF, not a self-join.

Why not a range join: ``left.ts BETWEEN right.ts AND right.next_ts`` needs an
extra window for next_ts AND a range-join that Catalyst executes as
BroadcastNestedLoop without bucketing — strictly worse at 100 TB.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_PREF = "__asof_r__"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] | None = None,
    right_cols: Sequence[str] | None = None,
    suffix: str = "",
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Attach to each left row the nearest right row at-or-before (backward)
    or at-or-after (forward) its ``on`` timestamp, per ``by`` group.

    right_cols: right value columns to carry (default: all non-key columns).
    suffix: appended to carried right column names (ref mtf.py:8-12 suffixing).
    tolerance_seconds: like merge_asof's tolerance — matches further away are
    nulled out.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = list(by or [])
    rcols = list(right_cols or [c for c in right.columns if c not in (*by, on)])

    lcols = left.columns
    l_tag = left.select(
        *lcols,
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(_PREF + c) for c in rcols],
        F.lit(None).cast(right.schema[on].dataType).alias(_PREF + on),
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in (*by,) else F.col(c)
          for c in lcols if c != on],
        F.col(on),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(_PREF + c) for c in rcols],
        F.col(on).alias(_PREF + on),
    ).select(*lcols, _SIDE, *[_PREF + c for c in rcols], _PREF + on)

    unioned = l_tag.unionByName(r_tag)
    if direction == "backward":
        order = [F.col(on).asc(), F.col(_SIDE).asc()]
    else:
        order = [F.col(on).desc(), F.col(_SIDE).asc()]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned
    for c in [*rcols, on]:
        filled = filled.withColumn(
            _PREF + c, F.last(_PREF + c, ignorenulls=True).over(w)
        )

    out = filled.where(F.col(_SIDE) == 1)
    if tolerance_seconds is not None:
        dist = F.abs(
            F.col(on).cast("long") - F.col(_PREF + on).cast("long")
        )
        keep = dist <= F.lit(int(tolerance_seconds))
        for c in rcols:
            out = out.withColumn(
                _PREF + c, F.when(keep, F.col(_PREF + c))
            )
    out = out.drop(_SIDE, _PREF + on)
    for c in rcols:
        out = out.withColumnRenamed(_PREF + c, c + suffix)
    return out


def join_mtf(
    exec_df: DataFrame,
    ctx_dfs: Mapping[str, DataFrame],
    on: str = "ts",
    by: Sequence[str] | None = None,
    close_only: bool = True,
) -> DataFrame:
    """Multi-timeframe cascade as-of join (ref api.py:76-88, mtf.py:15-27).

    Contexts are applied fine→coarse per TF_ORDER; each contributes columns
    suffixed ``_{TF}`` (close-only by default, ref api.py:85). Empty contexts
    are skipped (ref api.py:82-83).
    """
    from ..functions.timeframes import TF_ORDER

    out = exec_df
    for tf in sorted(ctx_dfs, key=lambda t: TF_ORDER.get(t, 999)):
        ctx = ctx_dfs[tf]
        cols = ["close"] if close_only else ["open", "high", "low", "close", "volume"]
        cols = [c for c in cols if c in ctx.columns]
        if not cols:
            continue
        out = asof_join(
            out, ctx, on=on, by=by, right_cols=cols, suffix=f"_{tf}",
            direction="backward",
        )
    return out
