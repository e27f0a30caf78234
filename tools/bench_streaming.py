"""Streaming throughput micro-bench: drive N parquet micro-batches through
(a) streaming_resample (watermarked tumbling OHLCV rollup) and (b)
stateful_funnel (applyInPandasWithState ordered funnel) and report end-to-end
rows/s per operator. Sinks are parquet (resample: append; funnel: append) so
the measurement includes real sink I/O, matching how the operators deploy.
The only driver-side reads are the StreamingQuery progress polls — no
per-batch collect anywhere.

Usage: python tools/bench_streaming.py [n_batches] [rows_per_batch]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mk_batches(spark, src, n_batches, rows, kind):
    """Write n_batches parquet files of synthetic rows into the landing dir.

    kind='candles': (symbol, ts, open, high, low, close, volume) minutes.
    kind='events' : (user_id, ts, event_type) funnel walks.
    """
    from pyspark.sql import functions as F

    for b in range(n_batches):
        base = spark.range(rows).withColumn(
            "ts", F.expr(
                f"timestamp_micros(cast(1704067200000000 + "
                f"({b} * {rows} + id) * 60000000 as long))"),
        )
        if kind == "candles":
            df = base.select(
                F.concat(F.lit("SYM"), (F.col("id") % 8).cast("string"))
                .alias("symbol"),
                "ts",
                (F.col("id") % 97 + 100.0).alias("open"),
                (F.col("id") % 97 + 101.0).alias("high"),
                (F.col("id") % 97 + 99.0).alias("low"),
                (F.col("id") % 97 + 100.5).alias("close"),
                F.lit(1.0).alias("volume"),
            )
        else:
            df = base.select(
                (F.col("id") % (rows // 4)).alias("user_id"),
                "ts",
                F.element_at(
                    F.array(F.lit("signup"), F.lit("click"),
                            F.lit("purchase"), F.lit("view")),
                    (F.col("id") % 4 + 1).cast("int"),
                ).alias("event_type"),
            )
        df.coalesce(4).write.mode("append").parquet(src)


def _drain(writer, ckpt, out):
    q = (
        writer.option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sum(p["numInputRows"] for p in
               (q.recentProgress or []))
    return rows


def main():
    from backtest_crew_datalake_spark.session import get_spark
    from backtest_crew_datalake_spark.streaming.ingest import (
        streaming_resample,
    )
    from backtest_crew_datalake_spark.streaming.stateful import (
        stateful_funnel,
    )

    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    work = tempfile.mkdtemp(prefix="stream_bench_")
    spark = get_spark(app_name="bench_streaming")
    try:
        # ---- streaming_resample over candle micro-batches
        src = f"{work}/candles_src"
        _mk_batches(spark, src, n_batches, rows, "candles")
        stream = spark.readStream.schema(
            "symbol string, ts timestamp, open double, high double, "
            "low double, close double, volume double"
        ).option("maxFilesPerTrigger", 4).parquet(src)
        res = streaming_resample(stream, tf="M5")
        t0 = time.perf_counter()
        n = _drain(
            res.writeStream.outputMode("append").format("parquet"),
            f"{work}/r_ckpt", f"{work}/r_out",
        )
        dt = time.perf_counter() - t0
        print(f"streaming_resample: {n} rows in {dt:.2f}s = "
              f"{n / dt:,.0f} rows/s")

        # ---- stateful_funnel over event micro-batches
        src = f"{work}/events_src"
        _mk_batches(spark, src, n_batches, rows, "events")
        stream = spark.readStream.schema(
            "user_id long, ts timestamp, event_type string"
        ).option("maxFilesPerTrigger", 4).parquet(src)
        fun = stateful_funnel(stream)
        t0 = time.perf_counter()
        n = _drain(
            fun.writeStream.outputMode("append").format("parquet"),
            f"{work}/f_ckpt", f"{work}/f_out",
        )
        dt = time.perf_counter() - t0
        print(f"stateful_funnel:    {n} rows in {dt:.2f}s = "
              f"{n / dt:,.0f} rows/s")

        # ---- stateful_retention over the same event micro-batches (the
        # minute-spaced ts span multiple weeks at the default sizes, so
        # cohort/week-offset state actually exercises)
        from backtest_crew_datalake_spark.streaming.stateful import (
            stateful_retention,
        )

        stream = spark.readStream.schema(
            "user_id long, ts timestamp, event_type string"
        ).option("maxFilesPerTrigger", 4).parquet(src)
        ret = stateful_retention(stream)
        t0 = time.perf_counter()
        n = _drain(
            ret.writeStream.outputMode("append").format("parquet"),
            f"{work}/c_ckpt", f"{work}/c_out",
        )
        dt = time.perf_counter() - t0
        print(f"stateful_retention: {n} rows in {dt:.2f}s = "
              f"{n / dt:,.0f} rows/s")

        # ---- streaming_curation over synthetic document micro-batches
        # (text derived from id: ~1/8 exact dups, 1/16 repetitive)
        from pyspark.sql import functions as F

        from backtest_crew_datalake_spark.streaming.ingest import (
            streaming_curation,
        )

        src = f"{work}/docs_src"
        words = ("alpha beta gamma delta epsilon zeta eta theta iota "
                 "kappa lam mu nu xi omicron pi")
        for b in range(n_batches):
            (spark.range(rows)
             .select(
                 (F.lit(b * rows) + F.col("id")).alias("doc_id"),
                 F.when(F.col("id") % 16 == 0,
                        F.lit("loop loop loop loop loop loop loop loop "
                              "loop loop loop loop"))
                 .otherwise(F.concat(
                     F.lit(words + " tok"),
                     ((F.col("id") + F.lit(b * rows)) % 8000)
                     .cast("string")))
                 .alias("text"),
                 F.concat(F.lit("src"), (F.col("id") % 4).cast("string"))
                 .alias("source"))
             .coalesce(4).write.mode("append").parquet(src))
        bench_docs = spark.createDataFrame(
            [(0, "holdout eval suite words nothing in the corpus shares")],
            "doc_id long, text string")
        t0 = time.perf_counter()
        streaming_curation(
            spark, src, bench_docs, f"{work}/cur_out", f"{work}/cur_ckpt")
        dt = time.perf_counter() - t0
        n = n_batches * rows
        kept = spark.read.parquet(f"{work}/cur_out/accepted").count()
        print(f"streaming_curation: {n} rows in {dt:.2f}s = "
              f"{n / dt:,.0f} rows/s (accepted {kept})")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
