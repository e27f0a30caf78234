"""Decompose the per-query scheduling floor (r7 verdict #2).

For each named query at $SPARK_GRAFT_SF_DIR, measures median-of-3:
  build_sec  — Python-side plan construction (the py4j round-trips in
               build(spark, sf_dir); no job runs here),
  exec_sec   — the noop-sink write (analysis + optimization + jobs),
  n_jobs     — Spark jobs launched by the write (via per-query job group),
  n_tasks    — total tasks across those jobs.

Usage: python tools/profile_floor.py [query ...]   (default: floor suspects)
Prints one JSON line per query plus a footer with the engine's measured
per-job floor (noop scan+agg microbench).
"""

# NO `from __future__ import annotations` here: the warm-up pandas_udf's
# type hints must resolve at decoration time (the bench.py PEP 563 pitfall)
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLOOR_SUSPECTS = [
    "q_emb_linear_probe", "q_emb_lsh_buckets", "q_evt_retention",
    "q_doc_pack_bins", "q_doc_weighted_sample", "q_evt_funnel",
    "q_doc_zipf_fit", "q_doc_char_entropy", "q_evt_hll_distinct",
    "q_doc_bloom_scrub", "q_emb_cosine_topk", "q_doc_bpe_merges",
]


def main():
    from backtest_crew_datalake_spark.session import get_spark
    from backtest_crew_datalake_spark.queries import all_queries

    names = sys.argv[1:] or FLOOR_SUSPECTS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_floor")
    sc = spark.sparkContext
    registry = all_queries()

    # warm: JVM + Python worker pool (same as bench.py)
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    import pandas as pd

    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    r.groupBy("r_name").count().write.format("noop").mode("overwrite").save()

    @pandas_udf("double")
    def __warm(s: pd.Series) -> pd.Series:
        return s

    r.select(__warm(F.lit(1.0))).write.format("noop").mode("overwrite").save()

    tracker = sc.statusTracker()

    def jobs_tasks(group: str):
        ids = tracker.getJobIdsForGroup(group)
        ntasks = 0
        for jid in ids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None:
                    ntasks += si.numTasks
        return len(ids), ntasks

    for name in names:
        qd = registry.get(name)
        if qd is None:
            print(json.dumps({"query": name, "error": "unknown"}))
            continue
        builds, execs, jobs, tasks = [], [], 0, 0
        for i in range(3):
            t0 = time.perf_counter()
            df = qd.build(spark, sf_dir)
            t1 = time.perf_counter()
            group = f"pf-{name}-{i}"
            sc.setJobGroup(group, name)
            df.write.format("noop").mode("overwrite").save()
            sc.setJobGroup("", "")
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            if i == 2:
                jobs, tasks = jobs_tasks(group)
        print(json.dumps({
            "query": name,
            "build_sec": round(sorted(builds)[1], 3),
            "exec_sec": round(sorted(execs)[1], 3),
            "n_jobs": jobs,
            "n_tasks": tasks,
        }), flush=True)

    # engine floor microbench: the cheapest possible scan+agg+noop write,
    # median of 5 — this is what ONE trivial job costs on this box
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        r.groupBy().count().write.format("noop").mode("overwrite").save()
        floors.append(time.perf_counter() - t0)
    print(json.dumps({"engine_job_floor_sec": round(sorted(floors)[2], 3)}))


if __name__ == "__main__":
    main()
