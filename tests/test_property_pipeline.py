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
        def r_half_up(x, nd):
            # Spark/DuckDB ROUND is half-away-from-zero; python round() is
            # half-even — they differ on exact .5 boundaries (hypothesis
            # found one: 2·round(ln(8/3), 8) ends in ...6585)
            import decimal
            return float(decimal.Decimal(repr(x)).quantize(
                decimal.Decimal(1).scaleb(-nd),
                rounding=decimal.ROUND_HALF_UP))

        scored = sorted(
            ((r_half_up(
                c * r_half_up(math.log((n + 1.0) / (dfreq[t] + 1.0)), 8), 6),
              t, c) for t, c in tf.items()),
            key=lambda x: (-x[0], x[1]),
        )[:2]
        want = [(rk + 1, t, c, s) for rk, (s, t, c) in enumerate(scored)]
        assert sorted(got[i]) == want, (i, toks)


_edges = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] != e[1]),
    min_size=1, max_size=20,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=_edges)
def test_pagerank_matches_numpy_power_iteration(spark, edges):
    import numpy as np

    from backtest_crew_datalake_spark.pipeline.dedup import pagerank

    norm = sorted({(min(a, b), max(a, b)) for a, b in edges})
    df = spark.createDataFrame(norm, ["id_a", "id_b"])
    got = {r.id: r.pr for r in pagerank(df).collect()}

    nodes = sorted({x for e in norm for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    nbrs = [[] for _ in range(n)]
    for a, b in norm:
        deg[idx[a]] += 1; deg[idx[b]] += 1
        nbrs[idx[a]].append(idx[b]); nbrs[idx[b]].append(idx[a])
    r = np.full(n, 1.0 / n)
    for _ in range(5):
        new = np.full(n, 0.15 / n)
        for i in range(n):
            for j in nbrs[i]:
                new[j] += 0.85 * r[i] / deg[i]
        r = new
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - round(float(r[idx[v]]), 6)) <= 1e-6, v


_docs = st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=5, max_size=12),
    min_size=1, max_size=5,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_docs)
def test_incremental_dedup_guarantees(spark, docs):
    from backtest_crew_datalake_spark.pipeline.dedup import (
        incremental_neardup_flags,
    )

    corpus = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)], ["doc_id", "text"])
    # new batch: exact copies of every corpus doc (must ALL be flagged with
    # all 8 bands) + one doc over a disjoint vocabulary (never flagged)
    new_rows = [(100 + i, " ".join(t)) for i, t in enumerate(docs)]
    new_rows.append((999, "zz yy xx ww vv uu tt ss"))
    new = spark.createDataFrame(new_rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in
           incremental_neardup_flags(new, corpus).collect()}
    for i in range(len(docs)):
        assert out[100 + i].n_collisions >= 8, i   # >= 8: other matches add
    assert 999 not in out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(members=st.lists(st.text(min_size=1, max_size=12), min_size=1,
                        max_size=40, unique=True),
       probes=st.lists(st.text(min_size=1, max_size=12), min_size=1,
                       max_size=40, unique=True))
def test_bloom_never_false_negative(spark, members, probes):
    """Property: every inserted member probes true, for ANY member set —
    the Bloom guarantee that makes might_contain a safe pre-filter."""
    from backtest_crew_datalake_spark.pipeline.sketch import (
        bloom_build, bloom_might_contain,
    )

    mdf = spark.createDataFrame([(x,) for x in members], ["k"])
    sk = bloom_build(mdf, "k", m_bits=1024, k=3)
    hits = {
        r.k: r.might_contain
        for r in bloom_might_contain(
            sk, spark.createDataFrame(
                [(x,) for x in set(members) | set(probes)], ["k"]
            ), "k", m_bits=1024, k=3
        ).collect()
    }
    for x in members:
        assert hits[x] is True


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(split=st.integers(1, 99), n=st.integers(2, 100))
def test_hll_merge_equals_whole(spark, split, n):
    """Property: register-wise MAX merge of two arbitrary slices equals the
    sketch of the union — the law that lets per-partition/per-day sketches
    roll up without rescanning."""
    from pyspark.sql import functions as F
    from backtest_crew_datalake_spark.pipeline.sketch import hll_build

    cut = max(1, (split * n) // 100)
    a = spark.range(0, cut).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"))
    b = spark.range(cut, n).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"))
    merged = (
        hll_build(a, "k", p=5).unionByName(hll_build(b, "k", p=5))
        .groupBy("reg").agg(F.max("rho").alias("rho"))
    )
    whole = hll_build(a.unionByName(b), "k", p=5)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, whole.collect()))


_pp_corpus = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=12),
    min_size=2, max_size=10,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_pp_corpus, th=st.sampled_from([0.4, 0.6, 0.8]))
def test_ppjoin_complete_and_exact(spark, docs, th):
    """Prefix filtering must be COMPLETE: on arbitrary tiny corpora and
    thresholds, ppjoin_pairs returns exactly the brute-force answer —
    every Jaccard >= t pair (no candidate escapes the prefix join) with
    exact intersection counts."""
    import itertools

    from backtest_crew_datalake_spark.pipeline.dedup import ppjoin_pairs

    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def sh(toks, n=3):
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    sets = {i: sh(d) for i, d in enumerate(docs)}
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        ni = len(sets[a] & sets[b])
        if ni:
            ratio = ni / (len(sets[a]) + len(sets[b]) - ni)
            if ratio >= th - 1e-9:  # unrounded threshold (display rounds)
                want[(a, b)] = (ni, round(ratio, 6))
    got = {(r.id_a, r.id_b): (r.n_inter, r.jaccard)
           for r in ppjoin_pairs(df, threshold=th).collect()}
    assert got == want


_doclens = st.lists(st.integers(1, 23), min_size=1, max_size=20)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lens=_doclens)
def test_seq_pack_matches_simulation_on_arbitrary_lengths(spark, lens):
    from backtest_crew_datalake_spark.pipeline.sampling import seq_pack

    seq = 7
    rows = [(i, " ".join(["t"] * n), "xx") for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = seq_pack(df, seq_len=seq).collect()[0]

    off, boundary, seq_docs = 0, 0, {}
    for n in lens:
        first, last = off // seq, (off + n - 1) // seq
        boundary += last > first
        for s in range(first, last + 1):
            seq_docs[s] = seq_docs.get(s, 0) + 1
        off += n
    n_seqs = -(-off // seq)
    assert (got.n_docs, got.n_tokens, got.n_seqs) == (
        len(lens), off, n_seqs)
    assert got.n_boundary_docs == boundary
    assert got.max_docs_per_seq == max(seq_docs.values())
    assert got.last_fill == off - (n_seqs - 1) * seq
    # reference rounding must be HALF_UP like Spark/DuckDB ROUND —
    # python's round() is banker's and disagrees on exact ties
    # (hypothesis found 49/32 = 1.53125 -> 1.5313 vs 1.5312)
    from decimal import ROUND_HALF_UP, Decimal

    want = float(
        Decimal(sum(seq_docs.values()) / len(seq_docs)).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP)
    )
    assert abs(got.avg_docs_per_seq - want) < 1e-9
    # conservation: every sequence index 0..n_seqs-1 is touched
    assert set(seq_docs) == set(range(n_seqs))


_dsir_corpus = st.lists(
    st.tuples(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),
                 min_size=1, max_size=6),
        st.sampled_from(["t", "w"]),
    ),
    min_size=2, max_size=12,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_dsir_corpus)
def test_dsir_weights_invariant_to_partitioning(spark, docs):
    """The scaled-integer design promise: per-doc DSIR weights are EXACT,
    so repartitioning (different aggregation order) changes nothing —
    not even the last bit of the emitted double."""
    from backtest_crew_datalake_spark.pipeline.sampling import dsir_weights

    rows = [(i, " ".join(toks), src) for i, (toks, src) in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    a = {r.doc_id: (r.n_bigrams, r.weight_e8, r.weight)
         for r in dsir_weights(df, ["t"]).collect()}
    b = {r.doc_id: (r.n_bigrams, r.weight_e8, r.weight)
         for r in dsir_weights(df.repartition(7), ["t"]).collect()}
    assert a == b
    assert len(a) == len(rows)


_ppl_corpus = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
             min_size=1, max_size=8),
    min_size=3, max_size=15,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_ppl_corpus)
def test_ppl_buckets_matches_python_cutoff_rule(spark, docs):
    """ppl_buckets' histogram inverse-CDF tertiles equal a python replica
    driven by unigram_nll's own per-doc scores (one language)."""
    import math

    from backtest_crew_datalake_spark.pipeline.text import (
        ppl_buckets,
        unigram_nll,
    )

    rows = [(i, " ".join(toks), "xx") for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    nll = {r.doc_id: (r.nll, r.n_tokens)
           for r in unigram_nll(df).collect()}

    vals = sorted(v for v, _ in nll.values())
    n = len(vals)
    cum, t1, t2 = 0, None, None
    for v in sorted(set(vals)):
        cum += vals.count(v)
        if t1 is None and cum >= math.ceil(n / 3.0):
            t1 = v
        if t2 is None and cum >= math.ceil(2.0 * n / 3.0):
            t2 = v
    want: dict[str, list[int]] = {}
    for d, (v, _) in nll.items():
        b = "head" if v <= t1 else ("middle" if v <= t2 else "tail")
        want.setdefault(b, []).append(d)

    got = {r.bucket: r for r in ppl_buckets(df).collect()}
    assert set(got) == set(want)
    for b, ids in want.items():
        assert got[b].n_docs == len(ids)
        assert got[b].n_tokens == sum(nll[d][1] for d in ids)
        assert got[b].min_nll == min(nll[d][0] for d in ids)
        assert got[b].max_nll == max(nll[d][0] for d in ids)


_events = st.lists(
    st.tuples(
        st.integers(0, 86_399),            # second offset within one day
        st.sampled_from(["a", "b"]),       # event_type
        st.integers(1, 50_000),            # value in cents
    ),
    min_size=1, max_size=80,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(evs=_events)
def test_rollup_cascade_equals_python_direct(spark, evs):
    """Re-aggregation invariant on arbitrary event streams (including
    same-timestamp ties, single-event minutes, and hour boundaries):
    the minute→5min→hour cascade must equal a direct python rollup."""
    from datetime import datetime as DT
    from datetime import timedelta, timezone

    from backtest_crew_datalake_spark.queries.events import (
        q_evt_rollup_cascade,
    )

    base = DT(2024, 3, 1, tzinfo=timezone.utc)
    rows = [
        (i, (base + timedelta(seconds=sec)).replace(tzinfo=None),
         1, et, cents / 100.0, "")
        for i, (sec, et, cents) in enumerate(evs)
    ]
    sch = ("event_id long, ts timestamp, user_id long, event_type string, "
           "value double, props string")
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, sch).write.mode("overwrite") \
            .parquet(f"{d}/events.parquet")
        got = {(r.event_type, r.bucket_ms):
               (r.open, r.high, r.low, r.close, r.volume_cents,
                r.n_events, r.n_minutes)
               for r in q_evt_rollup_cascade(spark, d).collect()}

    want = {}
    groups = {}
    for i, (sec, et, cents) in enumerate(evs):
        ms = int((base + timedelta(seconds=sec)).timestamp() * 1000)
        groups.setdefault((et, ms // 3_600_000 * 3_600_000), []) \
            .append((ms, i, cents / 100.0))
    for k, g in groups.items():
        g.sort()
        want[k] = (
            round(g[0][2], 6), round(max(v for _, _, v in g), 6),
            round(min(v for _, _, v in g), 6), round(g[-1][2], 6),
            sum(round(v * 100) for _, _, v in g), len(g),
            len({ms // 60_000 for ms, _, _ in g}),
        )
    assert got == want


_scd_events = st.lists(
    st.tuples(
        st.integers(1, 3),                      # key
        st.integers(0, 20),                     # ts (collisions likely)
        st.sampled_from(["x", "y", "z"]),       # attr
    ),
    min_size=1, max_size=25,
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=_scd_events)
def test_scd2_build_matches_python_model(spark, events):
    """scd2_build == a direct python model: per key keep the highest-seq
    row per ts, collapse consecutive equal attrs, chain validity."""
    from backtest_crew_datalake_spark.operators.scd import scd2_build

    rows = [(k, ts, i, a) for i, (k, ts, a) in enumerate(events)]
    df = spark.createDataFrame(
        rows, "k int, ts int, seq int, attr string"
    )
    got = sorted(
        (r.k, r.eff_from, r.attr, r.eff_to, bool(r.is_current))
        for r in scd2_build(
            df, key=["k"], attrs=["attr"], order_col="seq"
        ).collect()
    )

    want = []
    for k in sorted({r[0] for r in rows}):
        mine = [r for r in rows if r[0] == k]
        latest = {}
        for _, ts, seq, attr in sorted(mine, key=lambda r: (r[1], r[2])):
            latest[ts] = attr                     # highest seq per ts wins
        versions = []
        for ts in sorted(latest):
            if not versions or versions[-1][1] != latest[ts]:
                versions.append((ts, latest[ts]))
        for i, (ts, attr) in enumerate(versions):
            nxt = versions[i + 1][0] if i + 1 < len(versions) else None
            want.append((k, ts, attr, nxt, nxt is None))
    assert got == sorted(want)
