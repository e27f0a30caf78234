"""Bucketed tables for co-located joins — the 100 TB shuffle-elimination
path (SURVEY §7.1 'bucketing for co-located joins'): writing both join sides
bucketed by the join key lets the sort-merge join read pre-hashed buckets
with NO Exchange on either side."""

from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    o = spark.read.parquet(f"{sf}/orders.parquet")

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    # external tables (explicit path) — the warehouse dir is a static conf
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .option("path", str(tmp_path / "li_b"))
       .mode("overwrite").saveAsTable("li_b"))
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .option("path", str(tmp_path / "o_b"))
       .mode("overwrite").saveAsTable("o_b"))

    # disable auto-broadcast so the join would otherwise be a shuffle SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("li_b")
            .join(spark.table("o_b"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan \
            else plan
        # no hash-partition exchange feeds the join: buckets are co-located
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # sanity: same result as the unbucketed join
        plain = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus").agg(F.sum("l_quantity").alias("q"))
        )
        got = {r.o_orderstatus: r.q for r in j.collect()}
        exp = {r.o_orderstatus: r.q for r in plain.collect()}
        assert got.keys() == exp.keys()
        for k in got:
            assert abs(got[k] - exp[k]) < 1e-6
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_symbol_bucketed_lake_elides_exchanges(spark, tmp_path):
    """A symbol-bucketed candle table runs the per-symbol hot paths —
    resample-shaped groupBy(symbol, bucket) and the LOCF window
    partitionBy(symbol) — with NO Exchange in the plan, and produces the
    same values as the unbucketed DataFrame."""
    from backtest_crew_datalake_spark.sources.bucketed import (
        read_bucketed_candles, write_bucketed_candles,
    )
    from backtest_crew_datalake_spark.sources.synth import make_m1

    m1 = make_m1(spark, ["BTC-USD", "ETH-USD", "SOL-USD"],
                 "2024-01-01", "2024-01-01", seed=3)
    spark.sql("DROP TABLE IF EXISTS candles_b")
    write_bucketed_candles(m1, "candles_b", str(tmp_path / "candles_b"),
                           n_buckets=4)
    t = read_bucketed_candles(spark, "candles_b")
    try:
        agg = (
            t.groupBy("symbol", F.window("ts", "5 minutes"))
            .agg(F.max("high").alias("h"), F.min("low").alias("l"))
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan

        from pyspark.sql import Window
        w = (Window.partitionBy("symbol").orderBy("ts")
             .rowsBetween(Window.unboundedPreceding, 0))
        locf = t.withColumn("c_ff", F.last("close", True).over(w))
        plan2 = locf._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan2, plan2

        # values identical to the plain (unbucketed) computation
        plain = (
            m1.groupBy("symbol", F.window("ts", "5 minutes"))
            .agg(F.max("high").alias("h"), F.min("low").alias("l"))
        )
        got = {(r.symbol, r.window.start): (r.h, r.l) for r in agg.collect()}
        exp = {(r.symbol, r.window.start): (r.h, r.l) for r in plain.collect()}
        assert got == exp and len(got) == 3 * 288
    finally:
        spark.sql("DROP TABLE IF EXISTS candles_b")
