"""Round-11 session-2 gates: the robust/nonparametric stats family
(Mann-Kendall, Theil-Sen, Mann-Whitney).

The oracle hash gate proves Spark == DuckDB on the same histogram/pair
algebra; these tests prove the algebra itself against INDEPENDENT
brute-force computations (numpy pairwise matrices, pure-Python midranks),
so an error shared by both SQL spellings would still be caught. Plus the
one cross-engine arithmetic pin the family leans on: integer division
truncates toward zero in BOTH engines (negative Theil-Sen slopes).
"""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from backtest_crew_datalake_spark.queries import all_queries, load

SF = "/root/testdata/sf0.001"
Q = all_queries()


def test_div_truncates_toward_zero_in_both_engines(spark):
    # q_evt_theilsen / q_evt_mannwhitney divide possibly-NEGATIVE exact
    # integers; the micro-unit contract requires Spark DIV and DuckDB //
    # to agree on every sign combination.
    cases = [(-7, 2), (7, 2), (-7, -2), (7, -2), (-1, 3), (1, -3)]
    got_spark = [
        spark.sql(f"SELECT {a} DIV {b}").collect()[0][0] for a, b in cases
    ]
    got_duck = [
        duckdb.sql(f"SELECT {a} // {b}").fetchone()[0] for a, b in cases
    ]
    assert got_spark == got_duck == [-3, 3, 3, -3, 0, 0]


def _daily_counts(spark):
    return (
        load(spark, SF, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("x"))
        .orderBy("event_type", "day")
        .collect()
    )


def test_mann_kendall_matches_bruteforce(spark):
    rows = _daily_counts(spark)
    series = {}
    for r in rows:
        series.setdefault(r["event_type"], []).append(r["x"])
    got = {r["event_type"]: r for r in
           Q["q_evt_mann_kendall"].build(spark, SF).collect()}
    assert set(got) == set(series)
    for et, xs in series.items():
        x = np.asarray(xs, dtype=np.int64)
        n = len(x)
        s = int(np.sign(x[None, :] - x[:, None])[
            np.triu_indices(n, k=1)].sum())
        _, t = np.unique(x, return_counts=True)
        var18 = n * (n - 1) * (2 * n + 5) - int(
            (t * (t - 1) * (2 * t + 5)).sum())
        r = got[et]
        assert r["n_days"] == n
        assert r["s_stat"] == s
        assert r["var18"] == var18
        # truncation toward zero, matching DIV on a possibly-negative S
        tau = int(2 * s * 1000000 / (n * (n - 1)))
        assert r["tau_a_micro"] == tau


def test_theilsen_matches_bruteforce(spark):
    rows = _daily_counts(spark)
    series = {}
    for r in rows:
        series.setdefault(r["event_type"], []).append(r)
    got = {r["event_type"]: r for r in
           Q["q_evt_theilsen"].build(spark, SF).collect()}
    for et, rs in series.items():
        d0 = min(r["day"] for r in rs)
        pts = sorted(((r["day"] - d0).days, r["x"]) for r in rs)
        # exact trunc-toward-zero in pure python
        slopes = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                dy = pts[j][1] - pts[i][1]
                dx = pts[j][0] - pts[i][0]
                q = abs(dy) * 1000000 // dx
                slopes.append((q if dy >= 0 else -q, dy, dx))
        slopes.sort()
        npairs = len(slopes)
        lo = slopes[(npairs + 1) // 2 - 1][0]
        hi = slopes[(npairs + 2) // 2 - 1][0]
        want = (lo + hi) // 2 if (lo + hi) >= 0 else -((-(lo + hi)) // 2)
        r = got[et]
        assert r["n_pairs"] == npairs
        assert r["ts_slope_micro"] == want


def test_mannwhitney_matches_bruteforce(spark):
    evt = load(spark, SF, "events")
    vals = (
        evt.where(F.col("event_type").isin("click", "purchase"))
        .select("event_type",
                F.round(F.col("value") * 100).cast("bigint").alias("c"))
        .collect()
    )
    a = np.asarray([r["c"] for r in vals if r["event_type"] == "click"],
                   dtype=np.int64)
    b = np.asarray([r["c"] for r in vals if r["event_type"] == "purchase"],
                   dtype=np.int64)
    # doubled U by direct pair counting: 2U = 2·#(a>b) + #(a==b)
    gt = (a[:, None] > b[None, :]).sum()
    eq = (a[:, None] == b[None, :]).sum()
    u2 = int(2 * gt + eq)
    r = Q["q_evt_mannwhitney"].build(spark, SF).collect()[0]
    assert r["n_a"] == len(a) and r["n_b"] == len(b)
    assert r["u_a_x2"] == u2
    allv = np.concatenate([a, b])
    _, t = np.unique(allv, return_counts=True)
    assert r["tie_term"] == int((t.astype(object) ** 3 - t).sum())
    na, nb = len(a), len(b)
    num = u2 - na * nb
    q = abs(num) * 1000000 // (na * nb)
    assert r["rank_biserial_micro"] == (q if num >= 0 else -q)


def test_ks_two_sample_matches_bruteforce(spark):
    evt = load(spark, SF, "events")
    from pyspark.sql import functions as F2
    vals = (
        evt.where(F2.col("event_type").isin("view", "purchase"))
        .select("event_type",
                F2.round(F2.col("value") * 100).cast("bigint").alias("c"))
        .collect()
    )
    a = np.sort([r["c"] for r in vals if r["event_type"] == "view"])
    b = np.sort([r["c"] for r in vals if r["event_type"] == "purchase"])
    na, nb = len(a), len(b)
    support = np.unique(np.concatenate([a, b]))
    cuma = np.searchsorted(a, support, side="right").astype(object)
    cumb = np.searchsorted(b, support, side="right").astype(object)
    dnum = np.abs(cuma * nb - cumb * na)
    best = int(dnum.max())
    at = int(support[np.argmax(dnum)])  # argmax -> first (smallest cents)
    r = Q["q_evt_ks_two_sample"].build(spark, SF).collect()[0]
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert r["d_num"] == best
    assert r["d_at_cents"] == at
    assert r["d_micro"] == best * 1000000 // (na * nb)
