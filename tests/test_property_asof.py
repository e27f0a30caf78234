"""Property-based differential tests: the as-of join must match pandas
merge_asof on arbitrary inputs (the reference's oracle, SURVEY §7.4 calls
this the highest-risk operator), and keyed dedup must be idempotent."""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from backtest_crew_datalake_spark.operators.asof import asof_join
from backtest_crew_datalake_spark.operators.dedup import dedupe_keep

_ts = st.integers(min_value=0, max_value=500)
_sides = st.tuples(
    st.lists(_ts, min_size=1, max_size=30),          # exec seconds
    st.lists(st.tuples(_ts, st.integers(0, 99)),     # ctx (seconds, value)
             min_size=0, max_size=30),
    st.booleans(),                                   # direction backward/fwd
)


def _mk(spark, exec_s, ctx_sv):
    base = pd.Timestamp("2024-01-01")
    e = pd.DataFrame({
        "symbol": "S",
        "ts": [base + pd.Timedelta(seconds=s) for s in sorted(set(exec_s))],
    })
    c = pd.DataFrame({
        "symbol": "S",
        "ts": [base + pd.Timedelta(seconds=s) for s, _ in ctx_sv],
        "v": [float(v) for _, v in ctx_sv],
    }).drop_duplicates("ts").sort_values("ts")
    c = c.astype({"ts": "datetime64[ns]", "v": "float64"})
    return e, c


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=_sides)
def test_asof_matches_merge_asof(spark, data):
    exec_s, ctx_sv, backward = data
    e, c = _mk(spark, exec_s, ctx_sv)
    direction = "backward" if backward else "forward"

    se = spark.createDataFrame(e)
    sc = spark.createDataFrame(c) if len(c) else spark.createDataFrame(
        [], "symbol string, ts timestamp, v double")
    got = (
        asof_join(se, sc, on="ts", by=["symbol"], right_cols=["v"],
                  direction=direction)
        .orderBy("ts").toPandas()
    )
    oracle = pd.merge_asof(e.sort_values("ts"), c[["ts", "v"]],
                           on="ts", direction=direction)
    assert len(got) == len(oracle)
    pd.testing.assert_series_equal(
        got["v"].reset_index(drop=True), oracle["v"].reset_index(drop=True),
        check_names=False,
    )


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(drop=st.sets(st.integers(0, 119), max_size=60))
def test_resample_matches_pandas_on_random_gaps(spark, drop):
    """Resample with arbitrary missing minutes must equal the pandas
    resample(label='left', closed='left') + ffill + dropna oracle."""
    from pyspark.sql import functions as F

    from backtest_crew_datalake_spark.operators.resample import resample_ohlcv

    base = pd.Timestamp("2024-01-01")
    rows = [
        ("S", base + pd.Timedelta(minutes=i),
         100.0 + i, 101.0 + i, 99.0 + i, 100.5 + i, float(i % 7))
        for i in range(120) if i not in drop
    ]
    if not rows:
        return
    pdf = pd.DataFrame(rows, columns=["symbol", "ts", "open", "high",
                                      "low", "close", "volume"])
    df = spark.createDataFrame(pdf)
    got = resample_ohlcv(df, "M5", by=["symbol"]).orderBy("ts").toPandas()

    oracle = (
        pdf.set_index("ts")
        .resample("5min", label="left", closed="left")
        .agg({"open": "first", "high": "max", "low": "min",
              "close": "last", "volume": "sum"})
    )
    oracle[["open", "high", "low", "close"]] = (
        oracle[["open", "high", "low", "close"]].ffill()
    )
    oracle = oracle.dropna(subset=["open"]).reset_index()
    assert len(got) == len(oracle)
    for c in ("open", "high", "low", "close", "volume"):
        assert (got[c].values == oracle[c].values).all(), c


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 3), st.integers(0, 99)),
    min_size=1, max_size=40))
def test_dedup_idempotent_and_minimal(spark, rows):
    df = spark.createDataFrame(
        [(f"k{k}", t, float(v)) for k, t, v in rows], ["key", "ord", "v"]
    )
    once = dedupe_keep(df, key=["key"], order=["ord", "v"], keep="last")
    twice = dedupe_keep(once, key=["key"], order=["ord", "v"], keep="last")
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b                       # idempotent
    keys = [r[0] for r in a]
    assert len(keys) == len(set(keys))  # exactly one row per key
    # keep-last == max by (ord, v) per key
    import collections
    best = collections.defaultdict(lambda: (-1, -1.0))
    for k, t, v in rows:
        best[f"k{k}"] = max(best[f"k{k}"], (t, float(v)))
    assert {(k, t, v) for k, t, v in a} == {
        (k, t, v) for k, (t, v) in best.items()
    }
