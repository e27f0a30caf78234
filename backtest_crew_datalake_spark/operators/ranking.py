"""Distributed exact global ranking — the bounded-domain replacement for
``ROW_NUMBER()/NTILE() OVER (ORDER BY ...)`` on corpus-scaling frames.

scale.md rule 4 bans unpartitioned windows over unbounded input: a global
sort of a |users|-row frame is one task's sort at 1e9 users no matter how
many executors exist. This module computes the SAME ranks from bounded
pieces (the histogram-cut method q_evt_winsorize pioneered for percentile
cuts, extended to exact row ranks):

    rank(row) = rows_before(value) + tie_rank(value, tiebreak)

* ``rows_before`` comes from the value HISTOGRAM, cumulated in two
  bounded levels: within each of ``n_buckets`` equi-width value buckets
  (a keyed window whose partitions hold at most the distinct values of
  one bucket), then across the n_buckets bucket totals. The input frame
  is never sorted.
* ``tie_rank`` is a keyed row_number partitioned by (value, tiebreak
  bucket), offset by cumulated per-(value, bucket) counts — so a tie
  group of ANY size (1e8 users tied at frequency=1) splits across
  buckets instead of landing in one sort task.

Every unpartitioned window in this module runs over per-bucket aggregate
rows (≤ n_buckets), per rule 4. Exactness is value-gated against the
plain window functions at 3 SFs (tests/test_round11_queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_rank(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    out: str = "rk",
    ascending: bool = True,
    n_buckets: int = 4096,
) -> DataFrame:
    """Append ``out`` = exact ``ROW_NUMBER() OVER (ORDER BY value_col
    [ASC|DESC], tiebreak_col ASC)`` (1-based, bigint) without any
    unpartitioned window over ``df``. Both columns must be integral
    (the catalog's metrics are exact cents/counts/days by rule 12);
    DESC negates the value internally so bucket ids stay monotone."""
    v = F.col(value_col).cast("bigint")
    if not ascending:
        v = -v
    tb = F.col(tiebreak_col).cast("bigint")
    work = df.withColumn("__v", v).withColumn("__tb", tb)

    bounds = work.agg(
        F.min("__v").alias("__vmin"), F.max("__v").alias("__vmax"),
        F.min("__tb").alias("__tmin"), F.max("__tb").alias("__tmax"),
    )
    # equi-width bucket ids; width >= 1 so ids stay in [0, n_buckets)
    work = (
        work.crossJoin(F.broadcast(bounds))
        .withColumn(
            "__w_v",
            F.greatest(
                F.lit(1).cast("bigint"),
                ((F.col("__vmax") - F.col("__vmin")) / n_buckets + 1)
                .cast("bigint"),
            ),
        )
        .withColumn(
            "__w_t",
            F.greatest(
                F.lit(1).cast("bigint"),
                ((F.col("__tmax") - F.col("__tmin")) / n_buckets + 1)
                .cast("bigint"),
            ),
        )
        .withColumn(
            "__vb", F.expr("CAST((__v - __vmin) DIV __w_v AS BIGINT)")
        )
        .withColumn(
            "__ub", F.expr("CAST((__tb - __tmin) DIV __w_t AS BIGINT)")
        )
        .drop("__vmin", "__vmax", "__tmin", "__tmax", "__w_v", "__w_t")
    )

    # rows strictly before each distinct value: two-level bounded cumsum
    hist = work.groupBy("__vb", "__v").agg(F.count("*").alias("__c"))
    w_in = (
        Window.partitionBy("__vb").orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_bkt = (
        Window.orderBy("__vb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bt = (
        hist.groupBy("__vb").agg(F.sum("__c").alias("__bc"))
        .withColumn("__before_b", F.sum("__bc").over(w_bkt) - F.col("__bc"))
        .select("__vb", "__before_b")
    )
    before = (
        hist
        .withColumn("__cum_in", F.sum("__c").over(w_in) - F.col("__c"))
        .join(F.broadcast(bt), "__vb")
        .select(
            "__vb", "__v",
            (F.col("__before_b") + F.col("__cum_in")).alias("__before"),
        )
    )

    # tie rank: keyed row_number within (value, tiebreak bucket), offset
    # by the cumulated counts of the earlier buckets of the same value
    w_tie = Window.partitionBy("__v", "__ub").orderBy("__tb")
    w_off = (
        Window.partitionBy("__v").orderBy("__ub")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = (
        work.groupBy("__v", "__ub").agg(F.count("*").alias("__tc"))
        .withColumn("__off", F.sum("__tc").over(w_off) - F.col("__tc"))
        .select("__v", "__ub", "__off")
    )
    ranked = (
        work
        .withColumn("__rn", F.row_number().over(w_tie).cast("bigint"))
        .join(offs, ["__v", "__ub"])
        .join(before, ["__vb", "__v"])
        .withColumn(
            out,
            (F.col("__before") + F.col("__off") + F.col("__rn"))
            .cast("bigint"),
        )
    )
    return ranked.drop("__v", "__tb", "__vb", "__ub", "__rn", "__off",
                       "__before")


def ntile_from_rank(rank_col: str, total_col: str, n: int) -> F.Column:
    """``NTILE(n)`` recovered from an exact 1-based row rank and the
    frame's total row count — NTILE assigns the first ``total % n``
    tiles ``total DIV n + 1`` rows each and the rest ``total DIV n``,
    by row position, so the tile is a pure function of (rank, total).
    All arithmetic is integer (DIV), guarded for total < n."""
    r, t = rank_col, total_col
    q = f"({t} DIV {n})"
    rem = f"({t} % {n})"
    cut = f"(({q} + 1) * {rem})"
    return F.expr(
        f"CAST(CASE WHEN {r} <= {cut}"
        f" THEN ({r} - 1) DIV ({q} + 1) + 1"
        f" ELSE {rem} + ({r} - 1 - {cut}) DIV GREATEST({q}, 1) + 1"
        f" END AS BIGINT)"
    )
