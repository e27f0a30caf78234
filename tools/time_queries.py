"""Time individual catalog queries (median of 3, noop sink) and, when the
query has an oracle, the same SQL in DuckDB (32 threads, median of 3) on the
same parquet dir — prints per-query spark_sec / duck_sec / ratio.

Usage: python tools/time_queries.py <sf_dir> <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    import duckdb

    from backtest_crew_datalake_spark.session import get_spark
    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    spark = get_spark(app_name="time_queries")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    # warm the JVM (codegen/shuffle/noop) once
    from pyspark.sql import functions as F
    spark.read.parquet(f"{sf_dir}/region.parquet").groupBy("r_name").agg(
        F.count("*")).write.format("noop").mode("overwrite").save()

    for name in names:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        s = sorted(runs)[1]
        line = f"{name}: spark={s:.3f}s"
        if name in oracles:
            druns = []
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(oracles[name]).fetchall()
                druns.append(time.perf_counter() - t0)
            d = sorted(druns)[1]
            line += f" duck={d:.3f}s ratio={s / d:.2f}x"
        print(line)


if __name__ == "__main__":
    main()
