"""CLI mirroring the reference's console scripts (ref pyproject.toml:23-31:
datalake-read / join-mtf / datalake-aggregates / datalake-levels / QC tools).

Usage: python -m backtest_crew_datalake_spark.cli <command> [options]
Commands: read | join-mtf | aggregate | levels | qc | synth-ingest
"""

from __future__ import annotations

import argparse
import sys


def _spark():
    from .session import get_spark

    return get_spark(app_name="sparklake-cli")


def _cmd_read(a):
    """ref src/datalake/read/cli.py read: range read, head print / CSV sink."""
    from .sources.lake import read_range

    spark = _spark()
    df = read_range(
        spark, a.lake_root, market=a.market, timeframe=a.tf, symbol=a.symbol,
        date_from=a.date_from, date_to=a.date_to, source=a.source,
    )
    if a.out_csv:
        df.orderBy("ts").write.mode("overwrite").option("header", True).csv(a.out_csv)
        print(f"wrote {a.out_csv}")
    else:
        df.orderBy("ts").show(a.head)


def _cmd_join_mtf(a):
    """ref read/cli.py join-mtf: exec TF + as-of context TFs."""
    from .operators.asof import join_mtf
    from .sources.lake import read_range

    spark = _spark()
    kw = dict(market=a.market, symbol=a.symbol, date_from=a.date_from,
              date_to=a.date_to, source=a.source)
    exec_df = read_range(spark, a.lake_root, timeframe=a.exec_tf, **kw)

    def _ctx(tf):
        # context TFs live in the main tree if ingested directly, else in
        # the materialized aggregates tree (ref provider.py:74-78 routing)
        df = read_range(spark, a.lake_root, timeframe=tf, **kw)
        if df.isEmpty():
            df = read_range(spark, a.lake_root, timeframe=tf,
                            dataset="aggregates", **kw)
        return df

    ctxs = {tf: _ctx(tf) for tf in a.ctx_tfs.split(",")}
    ctxs = {tf: df for tf, df in ctxs.items() if not df.isEmpty()}
    out = join_mtf(exec_df, ctxs, by=["symbol"],
                   close_only=not a.full_ohlcv)
    if a.out_csv:
        out.orderBy("ts").write.mode("overwrite").option("header", True).csv(a.out_csv)
        print(f"wrote {a.out_csv}")
    else:
        out.orderBy("ts").show(a.head)


def _cmd_aggregate(a):
    """ref aggregates/cli.py: QC the M1 base then materialize coarser TFs."""
    from .provider import build_aggregates

    spark = _spark()
    if not a.skip_qc:
        from pyspark.sql import functions as F

        from .operators.qc import completeness_check
        from .sources.lake import read_range

        base = read_range(
            spark, a.lake_root, symbol=a.symbol, timeframe="M1",
            date_from=a.date_from, date_to=a.date_to, source=a.source,
        ).withColumn("timeframe", F.lit("M1"))
        bad = completeness_check(base).where("NOT complete").count()
        if bad:
            print(f"ABORT: {bad} incomplete M1 day(s); use --skip-qc to force",
                  file=sys.stderr)
            sys.exit(2)
    build_aggregates(spark, a.lake_root, a.symbol, a.date_from, a.date_to,
                     a.tfs.split(","), source=a.source)
    print(f"aggregates built: {a.tfs}")


def _cmd_levels(a):
    """ref levels/cli.py: OR levels build + yearly upsert."""
    from .operators.levels import build_or_levels
    from .sources.lake import read_range
    from .sources.writer import write_levels

    spark = _spark()
    base = read_range(
        spark, a.lake_root, symbol=a.symbol, timeframe="M1",
        date_from=a.date_from, date_to=a.date_to, source=a.source,
    )
    lv = build_or_levels(base, or_window=a.or_window, tz=a.tz, by=["symbol"])
    write_levels(spark, lv, a.lake_root)
    lv.orderBy("session_date").show(a.head)


def _cmd_qc(a):
    """ref tools/check_day.py: completeness + per-hour histogram + gaps."""
    from pyspark.sql import functions as F

    from .operators.gaps import gap_ranges, missing_minutes
    from .operators.qc import bars_per_hour, completeness_check
    from .sources.lake import read_day

    spark = _spark()
    df = read_day(spark, a.lake_root, symbol=a.symbol, day=a.day,
                  timeframe=a.tf, source=a.source)
    df = df.withColumn("timeframe", F.lit(a.tf))
    completeness_check(df).show()
    bars_per_hour(df, by=["symbol"]).orderBy("hour").show(24)
    miss = missing_minutes(
        df, by=["symbol"],
        start=f"{a.day} 00:00:00", end=f"{a.day} 23:59:00",
    )
    gap_ranges(miss, by=["symbol"]).orderBy("gap_start").show()


def _cmd_binance_ingest(a):
    """ref datalake-binance-ingest console script: fetch klines → upsert."""
    from datetime import datetime, timezone

    from .sources.connectors import ingest_binance_range

    spark = _spark()
    n = ingest_binance_range(
        spark, a.lake_root, a.symbol,
        datetime.fromisoformat(a.date_from).replace(tzinfo=timezone.utc),
        datetime.fromisoformat(a.date_to).replace(tzinfo=timezone.utc),
        tf=a.tf,
    )
    print(f"ingested {n} bars for {a.symbol}")


def _cmd_synth_ingest(a):
    """Offline synthetic ingest (ref DATALAKE_SYNTH mode / tools/synth_gen.py)."""
    from .schemas import enforce_schema
    from .sources.synth import make_m1
    from .sources.writer import upsert_candles

    spark = _spark()
    df = enforce_schema(
        make_m1(spark, a.symbols.split(","), a.date_from, a.date_to, seed=a.seed),
        timeframe="M1",
    )
    upsert_candles(spark, df, a.lake_root)
    print(f"ingested {a.symbols} {a.date_from}..{a.date_to} into {a.lake_root}")


def _cmd_acid(a):
    """ACID table maintenance: history / compact / vacuum / rollback
    (the OPTIMIZE/VACUUM/RESTORE console surface of sources/acid.py)."""
    from .sources.acid import (
        acid_compact, acid_history, acid_rollback, acid_vacuum,
    )

    if a.op == "history":
        for h in acid_history(a.table_root):
            print(f"v{h['version']:>6} parent={h['parent']:>6} "
                  f"{h['operation']:<14} files={h['n_files']:>5} "
                  f"rows={h['n_rows']}")
    elif a.op == "compact":
        v = acid_compact(_spark(), a.table_root, target_mb=a.target_mb)
        print(f"compacted -> v{v}" if v else "nothing to compact")
    elif a.op == "vacuum":
        removed = acid_vacuum(a.table_root, keep_versions=a.keep_versions)
        print(f"removed {len(removed)} unreachable files")
    elif a.op == "rollback":
        if a.version is None:
            raise SystemExit("rollback requires --version")
        print(f"restored as v{acid_rollback(a.table_root, a.version)}")


def _cmd_curate(a):
    """Batch corpus curation over a documents parquet dir: the
    q_doc_curation 4-stage gate (quality -> repetition -> exact dedup
    keep-lowest-id -> benchmark decontamination) applied to every doc,
    accepted docs written to --out/accepted, the per-doc ledger to
    --out/ledger (parquet), stage totals printed."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from .pipeline.dedup import spread_partitions
    from .pipeline.sampling import contamination
    from .pipeline.text import dup_ngram_frac, quality_score

    spark = _spark()
    d = spark.read.parquet(a.docs)
    bench = spark.read.parquet(a.benchmark) if a.benchmark else d.limit(0)
    flagged = (
        contamination(d, bench).select("doc_id", F.lit(1).alias("__c"))
        if a.benchmark else
        d.select("doc_id", F.lit(None).cast("int").alias("__c")).limit(0)
    )
    base = (
        quality_score(spread_partitions(d, "doc_id"))
        .withColumn("dup_frac", dup_ngram_frac())
        .withColumn("digest", F.md5("text"))
        .join(flagged, "doc_id", "left")
    )
    gates = (F.col("quality") >= a.quality_min) & (
        F.col("dup_frac") <= a.dup_frac_max
    )
    canon = F.min(F.when(gates, F.col("doc_id"))).over(
        W.partitionBy("digest")
    )
    status = (
        F.when(F.col("quality") < a.quality_min, F.lit("low_quality"))
        .when(F.col("dup_frac") > a.dup_frac_max, F.lit("repetitive"))
        .when(F.col("doc_id") != canon, F.lit("duplicate"))
        .when(F.col("__c").isNotNull(), F.lit("contaminated"))
        .otherwise(F.lit("kept"))
    )
    ledger = base.withColumn("status", status).localCheckpoint(eager=False)
    ledger.drop("__c").write.mode("overwrite").parquet(f"{a.out}/ledger")
    (
        ledger.where(F.col("status") == "kept")
        .select(*d.columns)
        .write.mode("overwrite")
        .parquet(f"{a.out}/accepted")
    )
    for r in sorted(
        ledger.groupBy("status").count().collect(), key=lambda r: r.status
    ):
        print(f"{r['status']:<13} {r['count']}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="sparklake")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--lake-root", required=True)
        sp.add_argument("--symbol", required=True)
        sp.add_argument("--source", default="ibkr")
        sp.add_argument("--market", default="crypto")
        sp.add_argument("--head", type=int, default=10)

    sp = sub.add_parser("read")
    common(sp)
    sp.add_argument("--tf", default="M1")
    sp.add_argument("--date-from")
    sp.add_argument("--date-to")
    sp.add_argument("--out-csv")
    sp.set_defaults(fn=_cmd_read)

    sp = sub.add_parser("join-mtf")
    common(sp)
    sp.add_argument("--exec-tf", default="M1")
    sp.add_argument("--ctx-tfs", default="M5,M15")
    sp.add_argument("--date-from")
    sp.add_argument("--date-to")
    sp.add_argument("--full-ohlcv", action="store_true")
    sp.add_argument("--out-csv")
    sp.set_defaults(fn=_cmd_join_mtf)

    sp = sub.add_parser("aggregate")
    common(sp)
    sp.add_argument("--date-from", required=True)
    sp.add_argument("--date-to", required=True)
    sp.add_argument("--tfs", default="M5,M15,H1,D1")
    sp.add_argument("--skip-qc", action="store_true")
    sp.set_defaults(fn=_cmd_aggregate)

    sp = sub.add_parser("levels")
    common(sp)
    sp.add_argument("--date-from", required=True)
    sp.add_argument("--date-to", required=True)
    sp.add_argument("--or-window", default="00:00-01:00")
    sp.add_argument("--tz", default="UTC")
    sp.set_defaults(fn=_cmd_levels)

    sp = sub.add_parser("qc")
    common(sp)
    sp.add_argument("--day", required=True)
    sp.add_argument("--tf", default="M1")
    sp.set_defaults(fn=_cmd_qc)

    sp = sub.add_parser("binance-ingest")
    sp.add_argument("--lake-root", required=True)
    sp.add_argument("--symbol", required=True)
    sp.add_argument("--tf", default="M1")
    sp.add_argument("--date-from", required=True)
    sp.add_argument("--date-to", required=True)
    sp.set_defaults(fn=_cmd_binance_ingest)

    sp = sub.add_parser("synth-ingest")
    sp.add_argument("--lake-root", required=True)
    sp.add_argument("--symbols", default="BTC-USD")
    sp.add_argument("--date-from", required=True)
    sp.add_argument("--date-to", required=True)
    sp.add_argument("--seed", type=int, default=42)
    sp.set_defaults(fn=_cmd_synth_ingest)

    sp = sub.add_parser("curate")
    sp.add_argument("--docs", required=True)
    sp.add_argument("--benchmark")
    sp.add_argument("--out", required=True)
    sp.add_argument("--quality-min", type=float, default=0.5)
    sp.add_argument("--dup-frac-max", type=float, default=0.2)
    sp.set_defaults(fn=_cmd_curate)

    sp = sub.add_parser("acid")
    sp.add_argument("op", choices=["history", "compact", "vacuum",
                                   "rollback"])
    sp.add_argument("--table-root", required=True)
    sp.add_argument("--target-mb", type=int, default=128)
    sp.add_argument("--keep-versions", type=int, default=2)
    sp.add_argument("--version", type=int)
    sp.set_defaults(fn=_cmd_acid)

    a = p.parse_args(argv)
    a.fn(a)


if __name__ == "__main__":
    main()
