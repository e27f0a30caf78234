"""Relational floor dossier (r7 verdict #5): decompose q_min_cost_supplier
and q_top_revenue_orders into (engine floor) x (marginal per-row cost) and
compare each engine's marginal cost against its OWN minimal-scan best case
on the same parquet, so "the plan sits at the engine floor" becomes a
measured statement instead of an argument.

Microbenches (per engine, per sf_dir, drop-first median-of-3):
  scan_sum   — SELECT SUM(l_extendedprice) FROM lineitem (pure scan+agg)
  scan_agg   — SUM + GROUP BY l_suppkey (one keyed exchange)
Then the two relational queries. Emits one JSON line per sf_dir with
  spark/duck per item, the per-action floor, and the derived marginals:
  marginal(q) = t(q) - floor_actions, engine_ratio = marginal_spark /
  (scan_sum_spark x rows-touched scaling).

Usage: python tools/bench_relational_floor.py [sf_dir ...]
       (default: /root/testdata/sf0.1 /tmp/scale10 /tmp/scale50)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["q_min_cost_supplier", "q_top_revenue_orders"]


def _median3_drop_first(fn):
    runs = []
    for _ in range(4):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return round(sorted(runs[1:])[1], 3)


def main():
    import duckdb

    import __spark_entry__ as entrymod
    from backtest_crew_datalake_spark.session import get_spark

    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1", "/tmp/scale10", "/tmp/scale50"]
    spark = get_spark(app_name="rel_floor")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    from pyspark.sql import functions as F

    for sf_dir in sf_dirs:
        out = {"sf_dir": sf_dir}
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        # warm
        li.groupBy().count().write.format("noop").mode("overwrite").save()
        # per-action floor: trivial 5-row scan+agg+noop
        r = spark.read.parquet(f"{sf_dir}/region.parquet")
        out["spark_floor_action"] = _median3_drop_first(
            lambda: r.groupBy().count().write.format("noop")
            .mode("overwrite").save())
        out["spark_scan_sum"] = _median3_drop_first(
            lambda: li.agg(F.sum("l_extendedprice")).write.format("noop")
            .mode("overwrite").save())
        out["spark_scan_agg"] = _median3_drop_first(
            lambda: li.groupBy("l_suppkey").agg(F.sum("l_extendedprice"))
            .write.format("noop").mode("overwrite").save())
        for q in QUERIES:
            out[f"spark_{q}"] = _median3_drop_first(
                lambda q=q: qs[q](spark, sf_dir).write.format("noop")
                .mode("overwrite").save())

        con = duckdb.connect()
        con.execute(f"SET threads TO {os.cpu_count()}")
        con.execute("SET enable_progress_bar=false")
        for t in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                            f"read_parquet('{p}')")
        out["duck_scan_sum"] = _median3_drop_first(
            lambda: con.execute(
                "SELECT SUM(l_extendedprice) FROM lineitem").fetchall())
        out["duck_scan_agg"] = _median3_drop_first(
            lambda: con.execute(
                "SELECT l_suppkey, SUM(l_extendedprice) FROM lineitem "
                "GROUP BY 1").fetchall())
        for q in QUERIES:
            out[f"duck_{q}"] = _median3_drop_first(
                lambda q=q: con.execute(oracles[q]).fetchall())
        con.close()

        # derived: engine-floor ratios and query-over-own-scan multiples
        out["scan_sum_ratio"] = round(
            out["spark_scan_sum"] / out["duck_scan_sum"], 2)
        out["scan_agg_ratio"] = round(
            out["spark_scan_agg"] / out["duck_scan_agg"], 2)
        for q in QUERIES:
            out[f"{q}_ratio"] = round(out[f"spark_{q}"] / out[f"duck_{q}"], 2)
            out[f"{q}_x_own_scan_spark"] = round(
                out[f"spark_{q}"] / out["spark_scan_agg"], 2)
            out[f"{q}_x_own_scan_duck"] = round(
                out[f"duck_{q}"] / out["duck_scan_agg"], 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
