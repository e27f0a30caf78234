"""parallelismFirst A/B probe (r12 verdict #2): bench-protocol timings for
the two r11 regression-suspect queries plus the FINAL (post-AQE) executed
plan under the current SPARK_GRAFT_PARALLELISM_FIRST setting.

Usage: SPARK_GRAFT_PARALLELISM_FIRST={true|false} python tools/pf_ab.py \
           [out_suffix] [q_name ...]
Prints one JSON line; writes plans/r12/<query>_pf_<out_suffix>.txt.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # noqa: F401 — pandas_udf type hints resolve here

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["q_evt_rollup_cascade", "q_top_revenue_orders"]


def main():
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from backtest_crew_datalake_spark.queries import all_queries
    from backtest_crew_datalake_spark.session import get_spark

    suffix = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_PARALLELISM_FIRST", "false")
    names = sys.argv[2:] or QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"pf_ab_{suffix}")
    spark.sparkContext.setLogLevel("ERROR")

    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    (n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
     .groupBy("r_name").agg(F.count("*").alias("c"))
     .write.format("noop").mode("overwrite").save())

    @pandas_udf("double")
    def __warm(s: pd.Series) -> pd.Series:
        return s

    r.select(__warm(F.lit(1.0))).write.format("noop").mode(
        "overwrite").save()

    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        r.groupBy().count().write.format("noop").mode("overwrite").save()
        floors.append(time.perf_counter() - t0)

    registry = all_queries()
    timings = {}
    for name in names:
        build = registry[name].build
        runs = []
        df = None
        for _ in range(4):
            df = build(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs[1:])[1], 3)
        # final adaptive plan: execute THIS DataFrame's own QueryExecution
        # (the noop write above runs a separate one), then dump — the
        # AQEShuffleRead coalesced partition specs become visible
        df.collect()
        p = df._jdf.queryExecution().executedPlan().toString()
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "plans", "r12",
            f"{name}_pf_{suffix}.txt")
        with open(out, "w") as fh:
            fh.write(p)
    print(json.dumps({
        "parallelism_first": os.environ.get(
            "SPARK_GRAFT_PARALLELISM_FIRST", "false"),
        "floor": round(sorted(floors)[2], 3),
        "queries": timings,
    }))


if __name__ == "__main__":
    main()
