"""Keyed dedup with explicit keep-first / keep-last semantics.

The reference deduplicates with pandas ``drop_duplicates(subset=key, keep=...)``
— read path keeps FIRST (ref src/datalake/read/api.py:70), write path keeps
LAST (ref src/datalake/ingestors/ibkr/writer.py:199,
binance/ingest_cli.py:75-77). Spark's ``dropDuplicates`` keeps an *arbitrary*
row, so we make the choice explicit with ``row_number`` over an ordering.

Scale: one shuffle on ``key``; with the lake partitioned by symbol the shuffle
is small and AQE coalesces post-shuffle partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_ROW = "__dedup_rn"


def dedupe_keep(
    df: DataFrame,
    key: Sequence[str],
    order: Sequence[str | Column] | None = None,
    keep: str = "last",
) -> DataFrame:
    """Keep one row per ``key``: the first/last by ``order``.

    ``order=None`` means "input priority" is irrelevant (all candidates equal)
    and any row may win — still deterministic per Spark task ordering when the
    caller tags a priority column.
    """
    if keep not in ("first", "last"):
        raise ValueError("keep must be 'first' or 'last'")
    cols = [F.col(c) if isinstance(c, str) else c for c in (order or [F.lit(0)])]
    if keep == "last":
        cols = [c.desc() for c in cols]
    w = Window.partitionBy(*key).orderBy(*cols)
    return (
        df.withColumn(_ROW, F.row_number().over(w))
        .where(F.col(_ROW) == 1)
        .drop(_ROW)
    )
