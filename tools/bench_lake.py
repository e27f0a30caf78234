"""Reference-parity workload benchmark: the candle pipeline end-to-end at a
configurable synthetic scale — ingest (S8→S4), read (S1/P1), resample (A1),
multi-TF as-of join (J1/J2), OR-levels (D1), gap scan (J3/W4).

This is the workload the reference actually runs (its whole surface), sized
beyond its single-symbol-month norm. Usage:

    python tools/bench_lake.py [n_symbols] [n_days]

Prints one JSON line with per-stage seconds and row counts.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_symbols = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    n_days = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    from backtest_crew_datalake_spark.operators import (
        build_or_levels, gap_ranges, join_mtf, missing_minutes, resample_ohlcv,
    )
    from backtest_crew_datalake_spark.schemas import enforce_schema
    from backtest_crew_datalake_spark.session import get_spark
    from backtest_crew_datalake_spark.sources import (
        make_m1, read_range, upsert_candles,
    )

    spark = get_spark(app_name="bench_lake")
    root = tempfile.mkdtemp() + "/lake"
    symbols = [f"SYM{i:03d}-USD" for i in range(n_symbols)]
    day_to = f"2024-01-{min(n_days, 28):02d}" if n_days <= 28 else "2024-02-26"

    stages: dict[str, float] = {}

    def stage(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()
            def __exit__(self, *a):
                stages[name] = round(time.perf_counter() - self.t0, 3)
        return _T()

    with stage("ingest"):
        bars = enforce_schema(
            make_m1(spark, symbols, "2024-01-01", day_to, seed=42),
            timeframe="M1",
        )
        upsert_candles(spark, bars, root)

    with stage("read"):
        m1 = read_range(spark, root, symbol=symbols[0],
                        date_from="2024-01-01")
        n_read = m1.count()

    # operate on the whole lake (all symbols) for the heavy stages
    with stage("read_all"):
        all_m1 = read_range(spark, root, symbol=symbols).cache()
        n_total = all_m1.count()

    with stage("resample_m5"):
        m5 = resample_ohlcv(all_m1, "M5", by=["symbol"])
        n_m5 = m5.count()

    with stage("asof_mtf"):
        joined = join_mtf(
            all_m1,
            {"M5": m5, "H1": resample_ohlcv(all_m1, "H1", by=["symbol"])},
            by=["symbol"],
        )
        n_joined = joined.count()

    with stage("or_levels"):
        lv = build_or_levels(all_m1, or_window="00:00-01:00", tz="UTC",
                             by=["symbol"])
        n_levels = lv.count()

    with stage("gap_scan"):
        miss = missing_minutes(all_m1, by=["symbol"])
        n_gap_ranges = gap_ranges(miss, by=["symbol"]).count()

    total = round(sum(stages.values()), 3)
    print(json.dumps({
        "metric": "candle_pipeline_total_sec",
        "value": total,
        "unit": "sec",
        "stages": stages,
        "rows": {"per_symbol_m1": n_read, "lake_m1": n_total, "m5": n_m5,
                 "joined": n_joined, "levels": n_levels,
                 "gap_ranges": n_gap_ranges},
        "n_symbols": n_symbols,
        "n_days": n_days,
    }))


if __name__ == "__main__":
    main()
