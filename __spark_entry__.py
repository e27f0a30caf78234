"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``   : flagship query at sf0.001 (multi-operator pipeline).
- ``queries()``      : every implemented operator from SURVEY §2 + the
  LLM-pipeline extensions, as (spark, sf_dir) -> DataFrame builders.
- ``oracle_sql()``   : DuckDB-equivalent SQL per query (omitted only for
  genuinely non-SQL-expressible ops).

Implementation lives in ``backtest_crew_datalake_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from backtest_crew_datalake_spark.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: as-of join of each click event to the user's most recent
    purchase (the engine's signature operator, J1) at sf0.001."""
    q = all_queries()["q_evt_asof_join"]
    return q.build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.build for name, qd in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: qd.oracle
        for name, qd in all_queries().items()
        if qd.oracle is not None
    }
