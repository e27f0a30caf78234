"""Round-11 gates: the distributed-rank replacement for the catalog's
last rule-4 edge (r10 verdict #2).

operators/ranking.global_row_rank must equal ROW_NUMBER() OVER (ORDER BY
value [DESC], tiebreak) EXACTLY — including inside arbitrarily large tie
groups — and ntile_from_rank must equal NTILE(n) over the same order;
q_evt_rfm / q_evt_user_gini must produce byte-identical answers to their
former plain-window implementations. The oracle hash gate proves Spark ==
DuckDB; these tests prove new-plan == old-plan on the SAME engine, so a
drift in either direction is attributable.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from backtest_crew_datalake_spark.operators.ranking import (
    global_row_rank,
    ntile_from_rank,
)
from backtest_crew_datalake_spark.queries import all_queries, load

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _rank_frame(spark, n=5000, seed=7, heavy_ties=False):
    df = spark.range(n).select(
        F.col("id").alias("user_id"),
        (F.xxhash64(F.col("id") + seed) % (3 if heavy_ties else 97))
        .alias("metric"),
    )
    return df


@pytest.mark.parametrize("ascending", [True, False])
@pytest.mark.parametrize("heavy_ties", [False, True])
def test_global_row_rank_equals_window(spark, ascending, heavy_ties):
    df = _rank_frame(spark, heavy_ties=heavy_ties)
    order = (F.col("metric").asc() if ascending
             else F.col("metric").desc())
    want = df.withColumn(
        "rk", F.row_number().over(Window.orderBy(order, F.col("user_id")))
        .cast("bigint"),
    )
    got = global_row_rank(df, "metric", "user_id", out="rk",
                          ascending=ascending)
    assert got.count() == df.count()
    diff = (
        got.select("user_id", "rk")
        .join(want.select("user_id", F.col("rk").alias("want")), "user_id")
        .where(F.col("rk") != F.col("want"))
        .count()
    )
    assert diff == 0


@pytest.mark.parametrize("n_tiles", [4, 5, 7])
def test_ntile_from_rank_equals_ntile(spark, n_tiles):
    df = _rank_frame(spark, n=1003)  # total % n_tiles != 0 on purpose
    w = Window.orderBy("metric", "user_id")
    want = df.select(
        "user_id",
        F.ntile(n_tiles).over(w).cast("bigint").alias("want"),
    )
    tot = df.agg(F.count("*").cast("bigint").alias("__n"))
    got = (
        global_row_rank(df, "metric", "user_id", out="rk")
        .crossJoin(F.broadcast(tot))
        .select("user_id", ntile_from_rank("rk", "__n", n_tiles)
                .alias("got"))
    )
    diff = want.join(got, "user_id") \
        .where(F.col("want") != F.col("got")).count()
    assert diff == 0


def test_ntile_from_rank_total_below_n(spark):
    """total < n: NTILE gives each row its own tile (1..total)."""
    df = spark.range(3).select(F.col("id").alias("user_id"),
                               F.lit(0).alias("metric"))
    tot = df.agg(F.count("*").cast("bigint").alias("__n"))
    got = sorted(
        r["t"] for r in global_row_rank(df, "metric", "user_id", out="rk")
        .crossJoin(F.broadcast(tot))
        .select(ntile_from_rank("rk", "__n", 5).alias("t")).collect()
    )
    assert got == [1, 2, 3]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_rfm_histogram_rank_equals_plain_ntile(spark, sf_dir):
    """The rewritten q_evt_rfm (distributed rank) == the former
    plain-NTILE-window implementation, row for row, at 2 SFs (the third
    SF is the driver's own oracle gate at sf0.01 + the full mirror)."""
    got = sorted(
        tuple(r) for r in all_queries()["q_evt_rfm"].build(spark, sf_dir)
        .collect()
    )
    evt = load(spark, sf_dir, "events")
    ms = F.unix_millis("ts")
    mx = evt.agg(F.max(ms).alias("__mts"))
    u = (
        evt.crossJoin(F.broadcast(mx))
        .groupBy("user_id", "__mts")
        .agg(
            F.floor((F.col("__mts") - F.max(ms)) / 86400000)
            .cast("bigint").alias("recency_d"),
            F.count("*").cast("bigint").alias("frequency"),
            F.sum(F.round(F.coalesce(F.col("value"), F.lit(0)) * 100)
                  .cast("bigint")).cast("bigint").alias("monetary_c"),
        )
        .drop("__mts")
    )
    scored = (
        u.withColumn("r_score", F.ntile(5).over(
            Window.orderBy("recency_d", "user_id")).cast("bigint"))
        .withColumn("f_score", F.ntile(5).over(
            Window.orderBy(F.col("frequency").desc(), "user_id"))
            .cast("bigint"))
        .withColumn("m_score", F.ntile(5).over(
            Window.orderBy(F.col("monetary_c").desc(), "user_id"))
            .cast("bigint"))
    )
    want = sorted(
        tuple(r) for r in scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count("*").cast("bigint").alias("n_users"),
             F.sum("frequency").cast("bigint").alias("n_events"),
             F.sum("monetary_c").cast("bigint").alias("monetary_c"))
        .collect()
    )
    assert got == want


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_gini_histogram_fold_equals_rank_identity(spark, sf_dir):
    """The rewritten q_evt_user_gini (tie-invariant histogram fold) ==
    the former explicit ROW_NUMBER rank identity."""
    got = all_queries()["q_evt_user_gini"].build(spark, sf_dir).collect()[0]
    evt = load(spark, sf_dir, "events")
    u = evt.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("x"))
    r = u.select(
        "x",
        F.row_number().over(Window.orderBy("x", "user_id"))
        .cast("bigint").alias("rk"),
    )
    s = r.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("t"),
        F.sum(F.col("rk").cast("decimal(38,0)")
              * F.col("x").cast("decimal(38,0)"))
        .cast("decimal(38,0)").alias("rx"),
    )
    want = s.select(
        "n", "t",
        F.expr(
            "CAST((2 * CAST(rx AS DECIMAL(38,0)) * 1000000)"
            " DIV (n * CAST(t AS DECIMAL(38,0)))"
            " - ((n + 1) * CAST(1000000 AS DECIMAL(38,0))) DIV n"
            " AS BIGINT)"
        ).alias("gini_micro"),
    ).collect()[0]
    assert (got["n"], got["t"], got["gini_micro"]) == \
        (want["n"], want["t"], want["gini_micro"])
