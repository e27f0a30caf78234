"""backtest_crew_datalake_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of the reference market-data lake
(Nelsonf09/backtest_crew-datalake), re-expressed Spark-first.

Layers
------
- ``session``    : SparkSession factory (UTC session tz, AQE on).
- ``schemas``    : schema registry + coercing enforcement (ref src/datalake/read/schemas.py).
- ``sources``    : partitioned-parquet lake reader/writer, synthetic bar generator,
                   driver-side vendor connectors.
- ``operators``  : resample (time-bucket OHLCV rollup), as-of join, gap
                   detection/repair, dedup, opening-range levels, QC, sessionization.
- ``functions``  : scalar Column helpers (symbols, timeframes, time).
- ``pipeline``   : LLM-training-data operators (dedup exact/MinHash/SimHash,
                   similarity search, text analysis, multimodal plumbing).
- ``streaming``  : Structured Streaming ingest path (idiomatic upgrade of the
                   reference's idempotent day-batch loop).

Everything is built only on public PySpark APIs; no RDD usage anywhere.
"""

__version__ = "0.1.0"
