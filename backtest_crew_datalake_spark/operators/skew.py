"""Skew-mitigation join: key salting.

AQE's skew-join splitting (on in session.py) handles most sort-merge skew at
runtime; salting is the explicit fallback for pathological hot keys (one
symbol = 40% of the lake, one user = half the events) or for engines/paths
AQE can't rewrite (e.g. aggregations feeding a window).

``salted_join``: the big (skewed) side gets a random salt in [0, salt); the
small side is replicated salt times; the join key becomes (key, salt). Each
hot key's rows spread over ``salt`` shuffle partitions instead of one.
Correctness is unchanged for one-to-many joins (big side many, small side
one row per key) — each big row still meets exactly its key's replica.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Join a skewed ``big`` side against a per-key-unique ``small`` side,
    spreading each hot key over ``salt`` partitions.

    ``small`` must be unique per join key (dimension-like) — replication
    would otherwise duplicate matches. Only inner/left are valid: for
    right/outer joins each unmatched small-side replica would surface as
    ``salt`` duplicate null-extended rows.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left' only")
    on = list(on)
    big_salted = big.withColumn(
        _SALT, (F.pmod(F.floor(F.rand(seed) * salt), F.lit(salt))).cast("int")
    )
    small_rep = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))
    )
    return big_salted.join(small_rep, [*on, _SALT], how).drop(_SALT)


def salted_group_count(
    df: DataFrame, key: Sequence[str], salt: int = 16, seed: int = 42
) -> DataFrame:
    """Two-stage aggregation for hot grouping keys: partial count per
    (key, salt) then final sum per key — the map-side-combine pattern made
    explicit for counts (Spark already partial-aggregates, but the first
    shuffle still hashes the hot key to ONE partition; salting splits it)."""
    key = list(key)
    salted = df.withColumn(
        _SALT, (F.pmod(F.floor(F.rand(seed) * salt), F.lit(salt))).cast("int")
    )
    partial = salted.groupBy(*key, _SALT).agg(F.count("*").alias("__pc"))
    return partial.groupBy(*key).agg(F.sum("__pc").alias("count"))
