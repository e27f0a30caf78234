"""Interactive measurement helpers for the optimization round.

Run inside `python -i tools/measure_repl.py` (tmux session): builds a
local[32] session once, then `t('q_name')` times a query with the noop
sink (drop-first median-of-3 by default) and reports the job count,
`ex('q_name')` dumps the formatted plan, `jobs('q_name')` counts Spark
jobs triggered by one build+noop run.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from backtest_crew_datalake_spark.session import get_spark  # noqa: E402
from backtest_crew_datalake_spark.queries import all_queries  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="measure")
REG = all_queries()


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def warm():
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    r = spark.read.parquet(f"{SF}/region.parquet")
    n = spark.read.parquet(f"{SF}/nation.parquet")
    _noop(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
          .groupBy("r_name").agg(F.count("*").alias("c")))

    @pandas_udf("double")
    def __warm(s):
        return s

    _noop(r.select(__warm(F.lit(1.0))))


def t(name, runs=4, sf=None):
    """Time query `name`: drop first, median of rest. Prints each run."""
    build = REG[name].build
    times = []
    for i in range(runs):
        t0 = time.perf_counter()
        _noop(build(spark, sf or SF))
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"  run{i}: {dt:.3f}s")
    med = sorted(times[1:])[len(times[1:]) // 2]
    print(f"{name}: median-of-rest {med:.3f}s")
    return med


def jobs(name, sf=None):
    """Count jobs + stages for one build+noop run."""
    st = spark.sparkContext.statusTracker()
    before = set(st.getJobIdsForGroup(None) or [])
    t0 = time.perf_counter()
    _noop(REG[name].build(spark, sf or SF))
    dt = time.perf_counter() - t0
    after = set(st.getJobIdsForGroup(None) or [])
    new = sorted(after - before)
    nstages = 0
    for j in new:
        ji = st.getJobInfo(j)
        if ji:
            nstages += len(ji.stageIds)
    print(f"{name}: {dt:.3f}s, {len(new)} jobs, {nstages} stages")
    return new


def ex(name, path=None, sf=None):
    """Formatted plan; optionally write to path."""
    p = REG[name].build(spark, sf or SF)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    if path:
        with open(path, "w") as f:
            f.write(p)
        print(f"wrote {path} ({len(p.splitlines())} lines)")
    else:
        print(p)
    return p


warm()
print("ready: t(name), jobs(name), ex(name, path)  SF=", SF)
