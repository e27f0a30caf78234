"""Bench-protocol measurement for a subset of queries: same session conf,
same warm-up, same 4-runs-drop-first-median-of-3 timing as bench.py, but
only for the queries named on the command line. For A/B experiments during
optimization rounds — NOT the driver's bench (bench.py is unchanged).

Usage: python tools/minibench.py q_name [q_name ...]
"""

import json
import os
import sys
import time

import pandas as pd  # noqa: F401 — pandas_udf type hints resolve here

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from backtest_crew_datalake_spark.session import get_spark
    from backtest_crew_datalake_spark.queries import all_queries
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    spark = get_spark(app_name="minibench")
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
    floor = round(sorted(floors)[2], 3)

    registry = all_queries()
    timings = {}
    for name in names:
        build = registry[name].build
        runs = []
        for _ in range(4):
            t0 = time.perf_counter()
            build(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs[1:])[1], 3)
    print(json.dumps({"floor": floor, "queries": timings,
                      "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
