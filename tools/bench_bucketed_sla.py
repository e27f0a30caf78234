"""Bucketed fact-fact join growth row (r10 verdict #6): q_ship_sla_
percentiles' honest cost at 200x is the lineitem⋈orders shuffle (120 M x
30 M rows on orderkey — measured 13.7 s vs DuckDB 2.45 s = 5.6x). At a
real deployment both facts are BUCKETED on orderkey and the join is
shuffle-free (the layout tests/test_bucketing.py pins); this tool writes
the scaled facts bucketed and measures the same query over that layout,
so the ROADMAP dossier row shows the plan the 100 TB lake would run, not
the worst-case ad-hoc one.

Usage: python tools/bench_bucketed_sla.py [scale_dir] [n_buckets]
Prints one JSON line: plain vs bucketed seconds (drop-first median of 3)
plus the no-exchange plan proof.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sla(li, o):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    d = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff("l_shipdate", "o_orderdate").cast("bigint")
        .alias("lag_d"),
    )
    h = d.groupBy("priority", "lag_d").agg(
        F.count("*").cast("bigint").alias("n"))
    wc = (Window.partitionBy("priority").orderBy("lag_d")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    c = h.select(
        "priority", "lag_d", "n",
        F.sum("n").over(wc).cast("bigint").alias("cum"),
        F.sum("n").over(Window.partitionBy("priority")).cast("bigint")
        .alias("nt"),
    )

    def pct(q):
        return F.min(
            F.when(F.col("cum") * 100 >= F.col("nt") * q, F.col("lag_d"))
        ).cast("bigint")

    return c.groupBy("priority").agg(
        F.max("nt").cast("bigint").alias("n_lines"),
        pct(50).alias("p50_days"), pct(90).alias("p90_days"),
        pct(99).alias("p99_days"),
        F.max("lag_d").cast("bigint").alias("max_days"),
    )


def _median3(fn):
    fn()  # warm (drop-first)
    times = []
    for _ in range(3):
        t0 = time.monotonic()
        fn()
        times.append(time.monotonic() - t0)
    return sorted(times)[1]


def main():
    from backtest_crew_datalake_spark.session import get_spark

    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale200"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    broot = f"/tmp/bucketed_sla_{os.path.basename(scale_dir)}_{n_buckets}"

    spark = get_spark(app_name="bench_bucketed_sla")
    li = spark.read.parquet(f"{scale_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{scale_dir}/orders.parquet")

    spark.sql("DROP TABLE IF EXISTS sla_li_b")
    spark.sql("DROP TABLE IF EXISTS sla_o_b")
    if os.path.isdir(broot):
        shutil.rmtree(broot)
    t0 = time.monotonic()
    # repartition on the bucket key first: ONE file per bucket, so the
    # sortBy order is global within each bucket and the SMJ elides its
    # Sort as well as its Exchange (multi-file buckets force a re-sort)
    (li.select("l_orderkey", "l_shipdate")
       .repartition(n_buckets, "l_orderkey")
       .write.bucketBy(n_buckets, "l_orderkey").sortBy("l_orderkey")
       .option("path", f"{broot}/li").mode("overwrite")
       .saveAsTable("sla_li_b"))
    (o.select("o_orderkey", "o_orderdate", "o_orderpriority")
       .repartition(n_buckets, "o_orderkey")
       .write.bucketBy(n_buckets, "o_orderkey").sortBy("o_orderkey")
       .option("path", f"{broot}/o").mode("overwrite")
       .saveAsTable("sla_o_b"))
    layout_sec = time.monotonic() - t0

    # no broadcast: force the join strategy question to bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = _median3(lambda: _sla(li, o).collect())
        lib, ob = spark.table("sla_li_b"), spark.table("sla_o_b")
        q = _sla(lib, ob)
        plan = q._jdf.queryExecution().executedPlan().toString()
        no_exchange = (
            "Exchange hashpartitioning(l_orderkey" not in plan
            and "Exchange hashpartitioning(o_orderkey" not in plan
        )
        bucketed = _median3(lambda: _sla(lib, ob).collect())
        same = sorted(map(tuple, _sla(lib, ob).collect())) == \
            sorted(map(tuple, _sla(li, o).collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS sla_li_b")
        spark.sql("DROP TABLE IF EXISTS sla_o_b")
        shutil.rmtree(broot, ignore_errors=True)

    print(json.dumps({
        "scale_dir": scale_dir, "n_buckets": n_buckets,
        "plain_sec": round(plain, 3), "bucketed_sec": round(bucketed, 3),
        "layout_write_sec": round(layout_sec, 3),
        "join_exchange_elided": no_exchange, "results_match": same,
    }))


if __name__ == "__main__":
    main()
