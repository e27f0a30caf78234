"""ACID maintenance cost profile (r12 verdict #7): build a deliberately
fragmented partitioned table (the r10 stress shape: base write + many small
appends + equality deletes), then profile the maintenance paths —
acid_compact (plain + purge_deletes), acid_vacuum, acid_clone — with
wall-clock, Spark job/stage counts, and bytes rewritten.

Usage: python tools/profile_compaction.py [n_rows] [n_parts] [n_appends]
Prints one JSON line.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _table_bytes(root):
    return sum(os.path.getsize(p) for p in glob.glob(
        os.path.join(root, "**", "*.parquet"), recursive=True))


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_appends = int(sys.argv[3]) if len(sys.argv) > 3 else 24

    from pyspark.sql import functions as F

    from backtest_crew_datalake_spark.session import get_spark
    from backtest_crew_datalake_spark.sources.acid import (
        acid_clone, acid_compact, acid_delete_mor, acid_read, acid_upsert,
        acid_vacuum, acid_write, latest_version,
    )

    spark = get_spark(app_name="profile_compaction")
    spark.sparkContext.setLogLevel("ERROR")
    st = spark.sparkContext.statusTracker()

    def profiled(label, fn):
        before = set(st.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        ret = fn()
        dt = time.perf_counter() - t0
        new = sorted(set(st.getJobIdsForGroup(None) or []) - before)
        nstages = sum(
            len(st.getJobInfo(j).stageIds) for j in new if st.getJobInfo(j)
        )
        out[label] = {"sec": round(dt, 3), "jobs": len(new),
                      "stages": nstages}
        return ret

    out: dict = {"n_rows": n_rows, "n_parts": n_parts,
                 "n_appends": n_appends}
    tmp = tempfile.mkdtemp(prefix="compact_prof_")
    try:
        root = os.path.join(tmp, "t")
        base = spark.range(n_rows).select(
            (F.col("id") % n_parts).cast("string").alias("p"),
            F.col("id").alias("k"),
            (F.col("id") * 7 % 1000).cast("double").alias("v"),
        )
        acid_write(spark, base, root, partition_by=("p",))
        # fragment: n_appends small upserts touching every partition
        per = max(n_parts * 50, n_rows // 2000)
        for i in range(n_appends):
            inc = spark.range(n_rows + i * per, n_rows + (i + 1) * per).select(
                (F.col("id") % n_parts).cast("string").alias("p"),
                F.col("id").alias("k"),
                (F.col("id") * 11 % 1000).cast("double").alias("v"),
            )
            acid_upsert(spark, inc, root, key=("p", "k"),
                        partition_by=("p",))
        # an equality delete so purge mode has work
        keys = spark.range(0, n_rows, 9973).select(
            (F.col("id") % n_parts).cast("string").alias("p"),
            F.col("id").alias("k"),
        )
        acid_delete_mor(spark, root, keys, key=("p", "k"))
        out["pre_files"] = len(glob.glob(
            os.path.join(root, "**", "*.parquet"), recursive=True))
        out["pre_bytes"] = _table_bytes(root)
        pre_v = latest_version(root)

        profiled("compact", lambda: acid_compact(spark, root, target_mb=128))
        out["post_compact_files"] = len(glob.glob(
            os.path.join(root, "**", "*.parquet"), recursive=True))

        profiled("compact_purge",
                 lambda: acid_compact(spark, root, target_mb=128,
                                      purge_deletes=True))

        profiled("vacuum", lambda: acid_vacuum(root, keep_versions=1))
        out["post_vacuum_files"] = len(glob.glob(
            os.path.join(root, "**", "*.parquet"), recursive=True))
        out["post_vacuum_bytes"] = _table_bytes(root)

        dst = os.path.join(tmp, "c")
        profiled("clone", lambda: acid_clone(spark, root, dst))

        n = profiled("read_after", lambda: acid_read(spark, root).count())
        out["rows_after"] = n
        out["versions"] = {"pre_compact": pre_v,
                           "final": latest_version(root)}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
