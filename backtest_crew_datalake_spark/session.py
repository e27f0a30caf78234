"""SparkSession factory.

The session timezone is pinned to UTC — the reference's global contract is
"ts is UTC, bar_end" (ref src/datalake/config.py:13, docs/specs/schema_m1.parquet.json
``ts_semantics``), and every localization in the engine is explicit
(``from_utc_timestamp`` / ``to_utc_timestamp``).

Scale posture (100 TB / 1000 executors): AQE on (runtime coalesce + skew-join
splitting), shuffle partitions sized from the env for local runs but expected to
be overridden by the cluster conf; dynamic partition overwrite so upserts never
rewrite unrelated partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "backtest_crew_datalake_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # guide §2.2 — fewer, larger reduce partitions: let AQE coalesce
        # to the advisory size instead of preserving default parallelism.
        # parallelismFirst=true padded every tiny post-shuffle stage to
        # ~core-count near-empty tasks; false derives the partition count
        # from DATA SIZE (the scale-adaptive posture — at 100 TB the
        # advisory still yields thousands of partitions). Measured r11:
        # wins 9/14 small-exchange queries (~9% subset total, both A/B
        # orders), a wash on the shuffle-heavy subset.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                os.environ.get("SPARK_GRAFT_PARALLELISM_FIRST", "false"))
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                os.environ.get("SPARK_GRAFT_ADVISORY_BYTES", "67108864"))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Scan-split sizing. Spark's 128 MB default is tuned for many-file
        # cluster lakes; the local testdata layout is ONE file per table, so
        # a 100 MB fact table would scan as a single task and serialize the
        # whole pre-shuffle pipeline (measured: q_min_cost_supplier at the
        # 10x corpus ran its 6 M-row scan+partial-agg 1-way). 8 MB fans a
        # single-file scan out across the local cores (split granularity is
        # still the file's row groups) and is a no-op for files under 8 MB;
        # cluster deployments should override back up via the env.
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "8388608"))
        # Join strategy (guide §3.1): sort-merge is Spark's safe default;
        # shuffled-hash skips both sorts when a per-partition build side
        # fits. Parameterized for A/B and cluster override.
        .config("spark.sql.join.preferSortMergeJoin",
                os.environ.get("SPARK_GRAFT_PREFER_SMJ", "true"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
