"""Property-based differential tests for round-5 pipeline ops: exact
quantiles vs a python type-1 reference on arbitrary integer data, and
TF-IDF top-k vs a plain-python reference on arbitrary tiny corpora."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from backtest_crew_datalake_spark.pipeline.text import (
    length_quantiles,
    tfidf_topk,
)

_vals = st.lists(st.integers(0, 50), min_size=1, max_size=60)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=_vals)
def test_length_quantiles_matches_type1_reference(spark, vals):
    rows = [(i, "g", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "n_chars"])
    got = length_quantiles(df).collect()[0]

    def type1(q):
        s = sorted(vals)
        return s[max(0, math.ceil(q * len(s)) - 1)]

    assert got.n_rows == len(vals)
    assert (got.q_0_5, got.q_0_9, got.q_0_99) == (
        type1(0.5), type1(0.9), type1(0.99))


_corpus = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d", "e"]),
             min_size=1, max_size=8),
    min_size=1, max_size=8,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_corpus)
def test_tfidf_topk_matches_python_reference(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {}
    for r in tfidf_topk(df, k=2).collect():
        got.setdefault(r.doc_id, []).append((r.rank, r.token, r.tf, r.score))

    n = len(docs)
    dfreq = {}
    for toks in docs:
        for t in set(toks):
            dfreq[t] = dfreq.get(t, 0) + 1
    for i, toks in enumerate(docs):
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        scored = sorted(
            ((round(c * round(math.log((n + 1.0) / (dfreq[t] + 1.0)), 8), 6),
              t, c) for t, c in tf.items()),
            key=lambda x: (-x[0], x[1]),
        )[:2]
        want = [(rk + 1, t, c, s) for rk, (s, t, c) in enumerate(scored)]
        assert sorted(got[i]) == want, (i, toks)
