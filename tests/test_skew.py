"""Salted-join / salted-aggregation correctness vs the unsalted equivalents."""

from pyspark.sql import functions as F

from backtest_crew_datalake_spark.operators.skew import (
    salted_group_count, salted_join,
)


def test_salted_join_matches_plain_join(spark):
    # pathological skew: 90% of rows share key 'hot'
    big = spark.createDataFrame(
        [("hot" if i % 10 else f"k{i}", i) for i in range(1000)], ["k", "v"]
    )
    small = spark.createDataFrame(
        [("hot", 1.0)] + [(f"k{i}", float(i)) for i in range(0, 1000, 10)],
        ["k", "w"],
    )
    got = salted_join(big, small, on=["k"], salt=8).orderBy("v").toPandas()
    exp = big.join(small, "k").orderBy("v").toPandas()
    assert len(got) == len(exp)
    assert (got.v.values == exp.v.values).all()
    assert (got.w.values == exp.w.values).all()


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    small = spark.createDataFrame([("a", 9.0)], ["k", "w"])
    got = salted_join(big, small, on=["k"], how="left", salt=4) \
        .orderBy("v").toPandas()
    assert len(got) == 2
    assert got.iloc[1].k == "b" and got.iloc[1].isna().w


def test_salted_group_count(spark):
    df = spark.createDataFrame(
        [("hot" if i % 5 else f"k{i}",) for i in range(500)], ["k"]
    )
    got = {r.k: r["count"] for r in salted_group_count(df, ["k"]).collect()}
    exp = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    assert got == exp
