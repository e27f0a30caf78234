"""ACID table layer micro-bench: commit latency, upsert throughput, and
reader resolution cost vs plain parquet.

Usage: python tools/bench_acid.py [n_rows] [n_partitions]

Prints one JSON line with:
- write_commit_sec      : initial bulk write (data + manifest commit)
- upsert_commit_sec     : incremental upsert touching 1 partition
- multi_upsert_sec      : upsert touching ALL partitions in one commit
- read_resolve_ms       : manifest load + file-list bind (driver-side)
- read_full_sec         : full-table read+count through the manifest
- read_plain_sec        : same data read+count as a plain parquet dir
- compact_sec           : compaction commit after fragmentation
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from pyspark.sql import functions as F

    from backtest_crew_datalake_spark.session import get_spark
    from backtest_crew_datalake_spark.sources.acid import (
        acid_compact, acid_read, acid_upsert, acid_write, latest_version,
        _load_manifest,
    )

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    out = {"n_rows": n_rows, "n_partitions": n_parts}
    tmp = tempfile.mkdtemp(prefix="acid_bench_")
    try:
        root = os.path.join(tmp, "t")
        plain = os.path.join(tmp, "plain")
        df = spark.range(n_rows).select(
            (F.col("id") % n_parts).cast("string").alias("p"),
            F.col("id").alias("k"),
            (F.col("id") * 2).cast("double").alias("v"),
        )

        t0 = time.time()
        acid_write(spark, df, root, partition_by=("p",))
        out["write_commit_sec"] = round(time.time() - t0, 3)

        one = spark.range(1000).select(
            F.lit("0").alias("p"), F.col("id").alias("k"),
            F.lit(-1.0).alias("v"),
        )
        t0 = time.time()
        acid_upsert(spark, one, root, ("p", "k"), ("p",))
        out["upsert_commit_sec"] = round(time.time() - t0, 3)

        allp = spark.range(n_parts * 10).select(
            (F.col("id") % n_parts).cast("string").alias("p"),
            F.col("id").alias("k"), F.lit(-2.0).alias("v"),
        )
        t0 = time.time()
        acid_upsert(spark, allp, root, ("p", "k"), ("p",))
        out["multi_upsert_sec"] = round(time.time() - t0, 3)

        t0 = time.time()
        for _ in range(20):
            _load_manifest(root, latest_version(root))
        out["read_resolve_ms"] = round((time.time() - t0) / 20 * 1000, 2)

        t0 = time.time()
        n1 = acid_read(spark, root).count()
        out["read_full_sec"] = round(time.time() - t0, 3)

        acid_read(spark, root).write.mode("overwrite") \
            .partitionBy("p").parquet(plain)
        t0 = time.time()
        n2 = spark.read.parquet(plain).count()
        out["read_plain_sec"] = round(time.time() - t0, 3)
        assert n1 == n2, (n1, n2)

        # fragment with small appends, then compact
        for i in range(5):
            acid_write(
                spark,
                spark.range(100).select(
                    F.lit("0").alias("p"),
                    (F.col("id") + 10_000_000 + i * 1000).alias("k"),
                    F.lit(0.0).alias("v"),
                ),
                root, partition_by=("p",),
            )
        t0 = time.time()
        acid_compact(spark, root, target_mb=512)
        out["compact_sec"] = round(time.time() - t0, 3)
        out["rows"] = n1
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
