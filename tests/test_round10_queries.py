"""Value-law gates for the round-10 second-session query families.

Each new query is oracle-gated (tools/check_oracles.py mirrors the driver at
3 SFs); these tests pin the SEMANTIC LAWS the hash gate can't express as a
law — Shapley efficiency, Benford share closure, the seasonality weighted
identity, the Flesch formula identity — so a future refactor that stays
self-consistent on both engines but breaks the math still fails loudly.
"""

import pytest
from pyspark.sql import functions as F

from backtest_crew_datalake_spark.queries import REGISTRY, load

SF_DIR = "/root/testdata/sf0.001"


def _run(spark, name):
    return REGISTRY[name].build(spark, SF_DIR)


def test_shapley_efficiency_law(spark):
    """Sum of Shapley values == v(universe) - v(empty) (Shapley 1953,
    efficiency axiom). v(empty)=0 by the query's model, so
    sum(phi_12micro) must equal 12 * v(U)_micro, where v(U) is the
    observed conversion rate of full-universe journeys (0 if the mask-15
    coalition is unobserved)."""
    rows = _run(spark, "q_evt_attribution_shapley").collect()
    assert len(rows) == 4
    total = sum(r["phi_12micro"] for r in rows)

    evt = load(spark, SF_DIR, "events")
    e = evt.select("user_id", "event_type", F.unix_millis("ts").alias("ms"))
    fp = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "purchase", F.col("ms")))
        .alias("fp_ms")
    )
    tou = (
        e.join(fp, "user_id")
        .where(
            (F.col("event_type") != "purchase")
            & (F.col("fp_ms").isNull() | (F.col("ms") < F.col("fp_ms")))
        )
        .groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("k"))
    )
    full = tou.where(F.col("k") == 4).join(fp, "user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("fp_ms").isNotNull(), 1).otherwise(0))
        .alias("n_conv"),
    ).first()
    v_full = (full["n_conv"] * 1000000) // full["n"] if full["n"] else 0
    assert total == 12 * v_full


def test_benford_shares_close_per_type(spark):
    """Truncating integer shares must sum to 1e6 within 9 micro-units of
    floor loss per event type (<=9 digits, each DIV drops <1)."""
    rows = _run(spark, "q_evt_benford").collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert by_type
    for t, rs in by_type.items():
        s = sum(r["share_micro"] for r in rs)
        assert 1000000 - 9 <= s <= 1000000, (t, s)
        for r in rs:
            assert 1 <= r["digit"] <= 9
            assert r["dev_micro"] == abs(r["share_micro"]
                                         - r["benford_micro"])


def test_seasonality_weighted_identity(spark):
    """The n-weighted mean of the seasonal index is 1e6 up to the per-cell
    floor truncation: sum(n*idx_micro) in [1e6*N - N, 1e6*N]."""
    rows = _run(spark, "q_evt_seasonality").collect()
    n_total = sum(r["n"] for r in rows)
    weighted = sum(r["n"] * r["idx_micro"] for r in rows)
    assert 1000000 * n_total - n_total <= weighted <= 1000000 * n_total


def test_ab_test_counts_and_variances(spark):
    rows = _run(spark, "q_evt_ab_test").collect()
    evt = load(spark, SF_DIR, "events")
    per_type = {
        r["event_type"]: r["c"]
        for r in evt.groupBy("event_type").agg(F.count("*").alias("c"))
        .collect()
    }
    assert rows
    for r in rows:
        assert r["n_a"] + r["n_b"] == per_type[r["event_type"]]
        assert r["var_a_c2"] >= 0 and r["var_b_c2"] >= 0
        assert isinstance(r["significant"], bool)


def test_collocations_support_floor_and_order(spark):
    rows = _run(spark, "q_doc_collocations").collect()
    assert 0 < len(rows) <= 20
    assert all(r["n_xy"] >= 5 for r in rows)
    scores = [r["pmi_ratio_micro"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_readability_flesch_identity(spark):
    rows = _run(spark, "q_doc_readability").collect()
    assert rows
    for r in rows:
        wps = r["words_total"] * 1000 // r["n_docs"]
        spw = r["syll_total"] * 1000 // r["words_total"]
        assert r["wps_milli"] == wps
        assert r["spw_milli"] == spw
        assert r["flesch_milli"] == 206835 - (1015 * wps + 84600 * spw) // 1000
        # word-salad corpora still have >=1 syllable per word
        assert r["spw_milli"] >= 1000
