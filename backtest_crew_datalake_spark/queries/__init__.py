"""Query catalog — the declared operator surface (SURVEY §2 inventory plus
the LLM-pipeline extensions), each as a named (spark, sf_dir) -> DataFrame
builder with, where SQL-expressible, an equivalent DuckDB oracle.

Normalization contract shared by every query and its oracle (so the driver's
order-insensitive value-hash matches):
- every aggregate / computed column aliased identically on both sides;
- timestamps emitted as epoch milliseconds BIGINT (`unix_millis` / `epoch_ms`);
- dates emitted as 'yyyy-MM-dd' strings;
- doubles rounded (ROUND(x, n)) on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL or None (rows-only check)


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = QueryDef(name, fn, oracle)
        return fn
    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one testdata table, normalizing timestamp physical types:

    - parquet TIMESTAMP(NANOS) (events.ts) is unreadable by Spark's vectorized
      reader — read via the legacy nanos-as-long mode and floor-divide to µs;
    - TIMESTAMP_NTZ columns are cast to session-tz TIMESTAMP (session tz is
      pinned UTC, so wall-clock values are unchanged) so `unix_millis` etc.
      accept them.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # Warm-cache hook: if the session pre-registered this table (bench.py's
    # load phase — repartitioned + cached in memory, the single-row-group
    # testdata files are otherwise 1-task scans), serve it from there.
    try:
        return spark.table(f"__sparklake_cached_{table}")
    except Exception:
        pass

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Calendar functions (date_trunc/hour/to_date) are session-tz dependent;
    # pin UTC so results match the oracle regardless of the caller's session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    for f in df.schema.fields:
        if isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def all_queries() -> dict[str, QueryDef]:
    # import for side effect of registration
    from . import relational, events, text, embeddings, scalars  # noqa: F401

    return REGISTRY
