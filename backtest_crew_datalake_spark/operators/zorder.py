"""Z-order (Morton) multi-dimensional clustering for scan locality.

A lakehouse layout operator, not reference parity (the reference lays out by
(symbol, timeframe, year, month) only — SURVEY §3): when queries filter on
TWO OR MORE columns (e.g. events by user_id AND time-of-day), a linear sort
clusters only the leading column; interleaving the columns' bits gives every
filter dimension locality, so parquet row-group min/max stats prune files on
any of them. Same idea as Delta/Iceberg OPTIMIZE ZORDER BY (public docs) —
implemented here as pure Column bit-math + a range-partitioned sorted write.

All JVM-side built-ins (shiftleft/bitwise-or loops unrolled at plan build);
the only shuffle in write_zordered is the repartitionByRange on the z-key —
exactly the shuffle any clustered write needs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column | str], bits: int = 10) -> Column:
    """Morton-interleave the low ``bits`` bits of each column into one long.

    Columns are first clamped into [0, 2^bits) (callers bucketize real
    domains — e.g. ``F.hour(ts)`` or ``user_id % 1024`` — so the clamp is a
    guard, not the bucketizer). Bit i of column j lands at position
    i·ncols + j: dimensions alternate, so a prefix of the key constrains
    EVERY dimension — the property that makes min/max pruning work on all
    filter columns at once.
    """
    ncols = len(cols)
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        v = F.greatest(
            F.lit(0).cast("long"),
            F.least(col.cast("long"), F.lit((1 << bits) - 1).cast("long")),
        )
        for i in range(bits):
            # bit i of v -> bit i*ncols + j of the key
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftright(v, i).bitwiseAND(F.lit(1).cast("long")),
                    i * ncols + j,
                )
            )
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 10,
    n_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``:
    range-partition on the z-key (one shuffle — contiguous key ranges per
    output file, so row-group min/max stats are tight on every dimension),
    sort within partitions, drop the helper key.

    ``n_files`` pins the output file count (defaults to Spark's range
    partitioning choice). At 100 TB this is the standard OPTIMIZE-style
    compaction pass: the z-shuffle is the whole cost, and every later
    multi-dimension filter pays it back in pruned row groups.
    """
    keyed = df.withColumn("__z", zorder_key(list(cols), bits))
    parts = (
        keyed.repartitionByRange(n_files, "__z")
        if n_files
        else keyed.repartitionByRange("__z")
    )
    parts.sortWithinPartitions("__z").drop("__z").write.mode(
        "overwrite"
    ).parquet(path)
