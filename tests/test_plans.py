"""Physical-plan quality gates (SURVEY §4): these assertions pin the
scale-critical plan properties — filter pushdown, column pruning, broadcast
dimension joins, and the as-of join's single-shuffle shape — so a regression
that silently de-optimizes a plan fails CI, not the 100 TB run."""

import pytest

from backtest_crew_datalake_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = all_queries()[name].build(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_column_pruning(spark):
    p = _plan(spark, "q_pricing_summary")
    scan = next(l for l in p.splitlines() if "FileScan parquet" in l)
    # only the 7 referenced columns reach the scan
    assert "l_shipdate" in scan and "l_quantity" in scan
    assert "l_orderkey" not in scan and "l_partkey" not in scan
    # the date filter reaches the data source
    assert "PushedFilters" in p and "l_shipdate" in p.split("PushedFilters", 1)[1][:200]


def test_star_join_broadcasts_dimensions(spark):
    p = _plan(spark, "q_nation_revenue")
    assert p.count("BroadcastHashJoin") >= 2  # nation+region always broadcast
    assert "CartesianProduct" not in p


def test_asof_join_single_shuffle(spark):
    p = _plan(spark, "q_evt_asof_join")
    # union + LOCF window: exactly one hash-partition exchange (on user_id)
    assert p.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_resample_no_global_sort(spark):
    p = _plan(spark, "q_evt_resample")
    # tumbling rollup must not introduce a global range exchange
    assert "Exchange rangepartitioning" not in p


def test_cosine_topk_broadcasts_queries_not_corpus(spark):
    p = _plan(spark, "q_emb_cosine_topk")
    # the query side is broadcast; corpus must stream (no shuffle of corpus
    # before the join)
    assert "BroadcastNestedLoopJoin" in p


def test_ivf_broadcasts_centroids(spark):
    p = _plan(spark, "q_emb_ivf_topk")
    # centroid assignment: broadcast nested-loop (centroids tiny); the
    # probe→list candidate join is a hash/broadcast equi-join, never a
    # cartesian product over the corpus
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_lake_read_prunes_partitions(spark, tmp_path):
    from backtest_crew_datalake_spark.schemas import enforce_schema
    from backtest_crew_datalake_spark.sources.lake import read_range
    from backtest_crew_datalake_spark.sources.synth import make_m1
    from backtest_crew_datalake_spark.sources.writer import upsert_candles

    root = str(tmp_path / "lake")
    m1 = enforce_schema(
        make_m1(spark, ["BTC-USD", "ETH-USD"], "2024-01-31", "2024-02-01",
                seed=42),
        timeframe="M1",
    )
    upsert_candles(spark, m1, root)
    df = read_range(spark, root, symbol="BTC-USD",
                    date_from="2024-02-01", date_to="2024-02-02")
    p = df._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in p.splitlines() if "FileScan parquet" in l)
    # partition filters present → only (symbol=BTC-USD, 2024/02) directory
    # is read: 1 of the 4 written partitions
    assert "PartitionFilters" in p
    import re
    m = re.search(r"(\d+) paths", scan)
    # month pruning: the ym predicate restricts the file index at planning
    assert df.count() == 1440


def test_winnow_pairs_plan_no_cartesian(spark):
    p = _plan(spark, "q_doc_winnow_pairs")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # pairing and rare-filter are keyed equi-joins on the fingerprint
    assert "Exchange hashpartitioning(fingerprint" in p


def test_winnow_pairs_single_winnow_subtree(spark):
    # bucket-local pair generation consumes the winnow table exactly once:
    # the plan holds ONE parquet scan of documents. Two or more scans mean
    # the pairing regressed to a self-join that recomputes the expensive
    # tokenize→md5→window subplan per side.
    p = _plan(spark, "q_doc_winnow_pairs")
    assert p.count("FileScan parquet") == 1


def test_funnel_retention_repetition_plans(spark):
    # funnel/retention: every join and agg keyed (user_id / cohort pair) —
    # no cartesian, no nested-loop, no global sort at any scale
    for q in ("q_evt_funnel", "q_evt_retention"):
        p = _plan(spark, q)
        assert "CartesianProduct" not in p, q
        assert "BroadcastNestedLoopJoin" not in p, q
        assert "Exchange rangepartitioning" not in p, q
    # repetition: row-local scoring + one per-language aggregation — the
    # whole query is a map stage plus a single keyed exchange
    p = _plan(spark, "q_doc_repetition")
    assert p.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in p


def test_blame_suppliers_decorrelated_plan(spark):
    # Q21 shape: EXISTS/NOT EXISTS must decorrelate to keyed semi/anti
    # joins on l_orderkey — never a nested-loop over lineitem
    p = _plan(spark, "q_blame_suppliers")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Exchange rangepartitioning" not in p


def test_shared_spans_plan_keyed_joins(spark):
    for q in ("q_doc_shared_spans", "q_doc_shared_spans_exact"):
        p = _plan(spark, q)
        # anchor + extension joins are keyed equi-joins; the islands window
        # is keyed by the pair — never a cartesian or a global sort
        assert "CartesianProduct" not in p, q
        assert "BroadcastNestedLoopJoin" not in p, q
        assert "Exchange rangepartitioning" not in p, q


def test_kmeans_plan_broadcast_only_centroids(spark):
    p = _plan(spark, "q_emb_kmeans_clusters")
    # assignment is a row-local Arrow kernel against the DRIVER-HELD k-row
    # centroid matrix (the MLlib shape): NO join of any kind touches the
    # corpus — the k-means training subtree collapsed to map stages
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "ArrowEvalPython" in p  # the vectorized assignment kernel
    # per-dim means: keyed partial aggregation, no global sort
    assert "Exchange rangepartitioning" not in p


def test_bilateral_volume_plan(spark):
    p = _plan(spark, "q_bilateral_volume")
    assert p.count("BroadcastHashJoin") >= 2  # both nation roles broadcast
    assert "CartesianProduct" not in p


def test_minhash_portable_plan_no_cartesian(spark):
    p = _plan(spark, "q_doc_minhash_portable")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_no_forced_broadcast_of_sf_scaled_tables():
    """Broadcast hints override AQE's size threshold, so a hint on a table
    that grows with scale factor (customer/part/orders/lineitem/supplier,
    or the events/documents/embeddings facts) is an OOM at sf100 even if it
    worked at sf0.1. Bounded inputs (nation, region, one-row cutoffs,
    HAVING-filtered aggregates, sketches) may keep their hints. This gate
    scans the query source for `F.broadcast(<name>)` and rejects any hint
    whose target is named like an SF-scaled input."""
    import pathlib
    import re

    qdir = pathlib.Path(__file__).parent.parent / (
        "backtest_crew_datalake_spark"
    )
    sf_scaled = {
        "c", "customer", "p", "part", "o", "orders", "li", "l", "lineitem",
        "s", "supplier", "e", "events", "d", "docs", "documents", "emb",
        "embeddings", "corpus",
        # derived-but-SF-scaled: tables with one row per group of an
        # SF-scaled input (per-session levels, per-doc fingerprints, ...)
        # grow linearly with the data and must not be hint-broadcast either
        "levels", "f", "fk", "base", "joined", "sessions", "fingerprints",
    }
    offenders = []
    for path in qdir.rglob("*.py"):
        src = path.read_text()
        for m in re.finditer(r"F\.broadcast\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*[),]", src):
            if m.group(1) in sf_scaled:
                line = src[: m.start()].count("\n") + 1
                offenders.append(f"{path.name}:{line} broadcast({m.group(1)})")
    assert not offenders, f"forced broadcast of SF-scaled inputs: {offenders}"


@pytest.mark.parametrize("q", ["q_evt_or_levels", "q_evt_or_levels_nyc"])
def test_or_levels_no_forced_broadcast(spark, q):
    """Plan-level gate (stronger than the name heuristic above): the
    per-session levels table has one row per (symbol, session_date) — it
    scales with the input (~rows/1440; ~1e9 sessions at 100 TB) and must
    never carry a broadcast hint. AQE may still choose to broadcast it at
    runtime while small; a hint would pin the OOM plan at scale."""
    df = all_queries()[q].build(spark, SF)
    lp = df._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in lp
    # the whole analytic is ONE keyed shuffle: window levels + same-key
    # break/retest aggregate (a second exchange means the agg+join-back
    # shape regressed)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange hashpartitioning") == 1


def test_q18_broadcasts_filtered_agg_not_customer(spark):
    p = _plan(spark, "q_large_volume_customers")
    # the HAVING-filtered aggregate (bounded) is the broadcast side; customer
    # joins by shuffle or AQE's runtime choice — never a forced broadcast
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_contamination_plan_broadcasts_benchmark(spark):
    p = _plan(spark, "q_doc_contamination")
    # benchmark shingle set broadcasts; the corpus-side scan must stay
    # map-side (semi join against the broadcast, no corpus cartesian)
    assert "BroadcastExchange" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_pack_bins_single_keyed_window_shuffle(spark):
    p = _plan(spark, "q_doc_pack_bins")
    # one keyed shuffle (the lang window); never a global range sort
    assert "Exchange rangepartitioning" not in p
    assert "CartesianProduct" not in p


def test_vocab_topk_uses_distributed_topk(spark):
    p = _plan(spark, "q_doc_vocab_topk")
    # orderBy+limit must compile to TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in p


def test_cms_plan_broadcasts_sketch(spark):
    p = _plan(spark, "q_evt_cms_user_counts")
    # the 4x256-cell sketch is the broadcast side of the probe join
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_min_cost_supplier_no_correlated_rescan(spark):
    # Q2 decorrelation: ONE lineitem scan feeds the (part,supp) hash agg;
    # the per-part argmin is a struct-min over the reduced offers (never a
    # second lineitem scan joined back, never a cartesian, never a window
    # over the fact). r12 (verdict #5): the EUROPE nation-key lookup rides
    # INSIDE the lazy plan as a broadcast LEFT-SEMI on the supplier scan —
    # no driver collect, no memo — so region+nation appear as FileScans;
    # supplier feeds the fact join (semi-sliced) AND the winner-attribute
    # join (unsliced — winners are EUROPE by construction).
    p = _plan(spark, "q_min_cost_supplier")
    assert p.count("lineitem.parquet") == 1
    # li + supplier x2 + nation x2 + region + part
    assert p.count("FileScan parquet") == 7
    assert p.count("LeftSemi") == 1  # the in-plan nation-key slice
    assert "CartesianProduct" not in p
    assert "Window" not in p


def test_important_parts_single_pass(spark):
    # Q11 decorrelation: the per-part agg is localCheckpoint'ed, so both the
    # scalar threshold and the filter read the materialized result — the
    # 3-way join subtree must appear ONCE (as checkpoint scans), not twice.
    p = _plan(spark, "q_important_parts")
    assert p.count("FileScan parquet") == 0  # both consumers read the checkpoint
    assert "Scan ExistingRDD" in p


def test_promo_candidates_no_window_over_facts(spark):
    # Q20 decorrelation: two keyed hash aggregates joined on partkey — no
    # window function over raw lineitem, no nested-loop join.
    p = _plan(spark, "q_promo_candidate_suppliers")
    assert "Window" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_len_quantiles_single_scan_histogram_window(spark):
    # exact-quantile pick must run on the aggregated histogram: ONE
    # documents scan, and the cumulative window sits above a hash aggregate,
    # never over raw rows.
    p = _plan(spark, "q_doc_len_quantiles")
    assert p.count("FileScan parquet") == 1
    assert "Exchange rangepartitioning" not in p  # no global sort


def test_hard_negatives_broadcasts_queries_not_corpus(spark):
    p = _plan(spark, "q_emb_hard_negatives")
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_silhouette_broadcasts_centroids(spark):
    # per-vector distance pass joins a bounded (#labels) broadcast side
    p = _plan(spark, "q_emb_label_silhouette")
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_source_mix_no_full_shuffle(spark):
    # the row filter must be a hash-local predicate against a broadcast
    # threshold table: no exchange of the documents table itself
    p = _plan(spark, "q_doc_source_mix")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_ppjoin_plan_keyed_joins_single_scan(spark):
    p = _plan(spark, "q_doc_ppjoin_pairs")
    # every join is an equi-join (prefix shingle / pair ids) — a cartesian
    # or nested-loop here would be the quadratic shape prefix filtering
    # exists to avoid. At sf0.001 AQE legitimately broadcasts the tiny
    # sides (no forced hints — the source-level gate covers that); the
    # keyed pair exchange is still present.
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Exchange hashpartitioning(id_a" in p
    # the docs subtree (window + ordered-set build) is persisted
    # (serialized): every consumer reads the cache — the plan text repeats
    # the cached relation's own FileScan per InMemoryRelation block, so
    # the structural invariant is "as many cache blocks as scans" (a scan
    # OUTSIDE a cache block would mean a consumer recomputes the subtree)
    assert p.count("InMemoryTableScan") >= 2
    assert p.count("FileScan parquet") == p.count("InMemoryRelation")


def test_semantic_dedup_plan_broadcast_only_centroids(spark):
    p = _plan(spark, "q_emb_semantic_dedup")
    assert "CartesianProduct" not in p
    # the cluster-local pair join must be a keyed equi-join on centroid_id,
    # never a corpus-side broadcast (assigned corpus is SF-scaled)
    assert "Exchange hashpartitioning(centroid_id" in p


def test_curation_plan_single_corpus_pass(spark):
    # r11 optimization: ALL four stage signals (quality, repetition,
    # digest, contamination overlap) come out of ONE corpus pass — the
    # bounded benchmark shingle set is a LAZY 1-row aggregate broadcast
    # (a second, doc_id<20-pruned scan in the SAME plan; it used to be
    # an eager collect whose scan job the returned plan simply hid), so
    # the plan scans the CORPUS once, the suite once, and the canonical
    # choice is a keyed window, not a self-join, with no cartesian
    p = _plan(spark, "q_doc_curation")
    assert "CartesianProduct" not in p
    # the sole BNLJ is the 1-row bench-array attach (bounded),
    # mirroring weighted_jaccard's 1-row N-aggregate pattern
    assert p.count("BroadcastNestedLoopJoin") <= 1
    assert "Window" in p                       # conditional-min canonical
    # one corpus pass + the bounded eval-suite subtree, nothing more
    assert p.count("documents.parquet") <= 2
    # the suite scan must stay pruned to the 20 fixed docs
    assert "LessThan(doc_id,20)" in p


def test_dsir_plan_single_explode_broadcast_ratios(spark):
    p = _plan(spark, "q_doc_dsir_weights")
    # the bigram explode+hash subtree is persisted (serialized): every
    # consumer (bucket models and the per-doc score join) must read the
    # cache, never re-run the explode — the plan text repeats the cached
    # relation's own FileScan in each InMemoryRelation block, so the
    # correct invariant is "InMemoryTableScan everywhere a consumer sits",
    # with exactly one explode (Generate) in the whole tree (inside the
    # cached plan), not one per consumer
    assert p.count("InMemoryTableScan") >= 2
    # every Generate belongs to a printed cache block — an explode OUTSIDE
    # an InMemoryRelation would mean a consumer recomputes the stream
    assert p.count("Generate explode") == p.count("InMemoryRelation")
    # the ≤1024-row log-ratio table joins back broadcast — never a shuffle
    # of the feature stream against it
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_ppl_buckets_plan_no_per_doc_window(spark):
    p = _plan(spark, "q_doc_ppl_buckets")
    # tertile cutoffs come from the (lang, nll) HISTOGRAM window — the
    # window partitions by lang over histogram rows; there must be no
    # window keyed by doc and no cartesian; the threshold join broadcasts
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p
    # the scored (NLL) subtree is checkpointed: histogram + final agg both
    # consume it without re-running the two token passes
    assert p.count("Exchange hashpartitioning(token") <= 2


def test_seq_pack_single_group_window(spark):
    p = _plan(spark, "q_doc_seq_pack")
    # ONE cumulative-offset window keyed by the group column; the
    # docs-per-seq explode must not re-sort globally
    assert "Exchange rangepartitioning" not in p
    assert "CartesianProduct" not in p


def test_kcenter_assignment_no_join_over_corpus(spark):
    p = _plan(spark, "q_emb_kcenter_coreset")
    # assignment folds over a literal k-entry array: the only joins are
    # the bounded 8-row order table broadcast; never a corpus-side
    # shuffle join or cartesian
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_sq8_broadcasts_queries_corpus_streams(spark):
    p = _plan(spark, "q_emb_sq8_topk")
    # both scans (quantized + exact) stream the corpus; the 10-query side
    # is broadcast (BNLJ like cosine_topk); reconstruction is row-local
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_bigram_nll_vocab_join_never_broadcasts_stream(spark):
    p = _plan(spark, "q_doc_bigram_nll")
    # the vocab (lp) join is a forced shuffle-hash: LogicalRDD stats are
    # unreliable and the planner was measured broadcasting the 13M-row
    # bigram STREAM as the build side (scale.md rule 13)
    assert "ShuffledHashJoin [__bg" in p
    assert "BroadcastHashJoin [__bg" not in p


def test_source_overlap_pair_join_never_broadcasts_shingles(spark):
    p = _plan(spark, "q_doc_source_overlap")
    # the shingle self-join must exchange on __sh, never broadcast the
    # (source, shingle) table (scale.md rule 13); the two bounded
    # per-source count joins MAY broadcast (forced, ≤|sources| rows)
    assert "ShuffledHashJoin [__sh" in p
    assert "BroadcastHashJoin [__sh" not in p


def test_weighted_jaccard_plan_gates(spark):
    p = _plan(spark, "q_doc_weighted_jaccard")
    # the idf join is pinned shuffle_hash (rule 13 — a corpus-derived
    # weight table must never be a broadcast build side); the only
    # nested-loop is the forced broadcast of the 1-row N aggregate
    assert "ShuffledHashJoin [sh" in p
    assert "BroadcastHashJoin [sh#" not in p
    assert "CartesianProduct" not in p
    # bands table persisted + both verify sides read the candidate cache
    assert p.count("InMemoryTableScan") >= 2


def test_mmr_topk_plan_bounded_working_set(spark):
    # r11 optimization: candidate generation (cosine scan) and the pair
    # sims run as two bounded collect jobs inside build(); the greedy over
    # the ≤50-row candidate set is driver-side (scale.md rule 3), so the
    # RETURNED frame is a local relation — no distributed greedy rounds,
    # no cartesian, nothing SF-scaled left in the final plan
    df = all_queries()["q_emb_mmr_topk"].build(spark, SF)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "FileScan" not in p  # all corpus work happened in build()
    assert df.count() <= 5 * 5  # ≤ |queries| * 5 picks


def test_knn_eval_plan_is_cosine_scan(spark):
    p = _plan(spark, "q_emb_knn_eval")
    # the corpus must stream through the broadcast-query scan — a corpus
    # exchange before ranking would be the wrong shape at 100 TB
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p  # broadcast(q) x corpus scan


def test_rollup_cascade_single_scan_no_joins(spark):
    p = _plan(spark, "q_evt_rollup_cascade")
    # the cascade reads raw events ONCE; every coarser tier re-aggregates
    # the tier below (three keyed agg levels), with no join anywhere —
    # a second events scan would mean a tier cheated back to raw
    assert p.count("FileScan parquet") == 1
    for op in ("Join", "CartesianProduct"):
        assert op not in p
    # minute -> 5min -> hour: at least three aggregate levels survive
    # (the finest tier is a SortAggregate — min_by over a struct order key;
    # the re-agg tiers order by the finer bucket's LONG and stay hash)
    assert p.count("HashAggregate") + p.count("SortAggregate") >= 6


def test_bq_topk_broadcasts_queries_corpus_streams(spark):
    p = _plan(spark, "q_emb_bq_topk")
    # sign-bit packing is row-local; both the Hamming scan and the exact
    # scan stream the corpus against the broadcast 10-query side
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_doremi_iteration_stays_bounded(spark):
    p = _plan(spark, "q_doc_doremi_weights")
    # the corpus is touched by the token explode + vocab join only; the
    # multiplicative-weight rounds run on the |sources|-row table as one
    # chained single-partition window pass — no cartesian, no corpus
    # rescan beyond the two token passes, and no checkpoint
    # materialization (r11: the g/s1/s2 1-row broadcast-back aggregates
    # and the localCheckpoint they required are gone)
    assert "CartesianProduct" not in p
    assert p.count("FileScan parquet") <= 3
    assert "Scan ExistingRDD" not in p


def test_minhash_tuning_banded_joins_never_broadcast(spark):
    p = _plan(spark, "q_doc_minhash_tuning")
    # three banding configs, each a banded equi-join over the SHARED
    # persisted signature table — pinned shuffle_hash (rule 13: cached
    # corpus-derived tables must never become a broadcast build side)
    assert p.count("ShuffledHashJoin [band") >= 3
    assert "BroadcastHashJoin [band" not in p
    assert "CartesianProduct" not in p


def test_ivf_probe_sweep_keyed_candidate_joins(spark):
    # r11 single-window fold: the keyed __cid join runs ONCE, all three
    # probe budgets are conditional running counts over ONE window pass
    # (no per-config branches, no localCheckpoint materializations), and
    # the three hit counts come out of one aggregate + stack
    p = _plan(spark, "q_emb_ivf_probe_sweep")
    assert "CartesianProduct" not in p
    assert "Scan ExistingRDD" not in p               # no checkpoints
    assert p.count("Window [") == 2                  # exact top-5 + sweep
    assert p.count("probe_rank") >= 3                # budget-filter carve
    # ... and the candidate subtree itself is a keyed equi-join on the
    # centroid id with the corpus never fanned out (gate the inner plan
    # directly — it's what the checkpoint pins)
    from backtest_crew_datalake_spark.pipeline.similarity import (
        _norm, kmeans_assign,
    )
    from backtest_crew_datalake_spark.queries import load
    from pyspark.sql import functions as F

    emb = load(spark, SF, "embeddings")
    cent = emb.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding"))
    corpus = emb.where(F.col("vec_id") >= 16)
    lists = kmeans_assign(
        corpus.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        cent, id_col="neighbor_id", vec_col="embedding",
    ).select("neighbor_id", _norm(F.col("embedding")).alias("__cn"),
             F.col("centroid_id").alias("__cid"))
    probes = kmeans_assign(
        emb.where((F.col("vec_id") >= 16) & (F.col("vec_id") < 26))
        .select(F.col("vec_id").alias("query_id"), "embedding"),
        cent, id_col="query_id", vec_col="embedding",
        topn=4, rank_col="probe_rank",
    ).select("query_id", F.col("centroid_id").alias("__cid"), "probe_rank")
    inner = probes.join(lists, "__cid")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in inner.replace(
        "BroadcastNestedLoopJoin", "")  # the bounded broadcast side only
    assert ("hashpartitioning(__cid" in inner
            or "BroadcastHashJoin [__cid" in inner
            or "ShuffledHashJoin [__cid" in inner)


def test_winsorize_single_events_scan(spark):
    p = _plan(spark, "q_evt_winsorize")
    # the (event_type, cents) histogram is persisted serialized and feeds
    # BOTH consumers (the cumulative-window cut finder and the __n-weighted
    # clamp aggregation); the raw events are scanned exactly once, inside
    # the cached subtree — a second FileScan would mean the clamp pass
    # re-reads the raw rows (the two-pass shape this query replaced)
    assert p.count("InMemoryTableScan") >= 2
    assert p.count("FileScan parquet") == p.count("InMemoryRelation")
    # cuts table joins back broadcast; never a shuffle of the histogram
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_ewma_single_exchange_few_partitions(spark):
    p = _plan(spark, "q_evt_ewma")
    # the repartition(8, user_id) IS the window's exchange (its
    # ClusteredDistribution is satisfied by any hash partitioning on
    # user_id) — a second exchange would mean the hint stacked a shuffle
    # on top of the window's own instead of replacing it
    assert p.count("Exchange hashpartitioning") == 1
    assert "REPARTITION_BY_NUM" in p


def test_bm25_single_explode_all_consumers_cached(spark):
    p = _plan(spark, "q_doc_bm25_topk")
    # ONE token explode: tf is persisted serialized and df/dl/the scoring
    # join all read the cache — a Generate outside a cache block would
    # mean a consumer re-runs the explode
    assert p.count("Generate explode") == p.count("InMemoryRelation") or \
        p.count("Generate explode") <= p.count("InMemoryRelation")
    assert p.count("FileScan parquet") <= p.count("InMemoryRelation")
    # the 8-term query table and 1-row stats broadcast; no cartesian on
    # the corpus-sized stream
    assert "CartesianProduct" not in p
    assert p.count("BroadcastHashJoin") >= 1


def test_cusum_windows_share_one_exchange(spark):
    p = _plan(spark, "q_evt_cusum")
    # centering agg + walk join-back = 2 keyed exchanges max; all three
    # window passes (prefix sum, running min, per-type max) share the
    # (event_type) partitioning — a third exchange would mean a window
    # re-shuffled
    assert p.count("Exchange hashpartitioning") <= 2
    assert "Exchange SinglePartition" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p   # the |types|-row centering table


def test_attribution_single_scan_single_window_exchange(spark):
    p = _plan(spark, "q_evt_attribution")
    assert p.count("FileScan parquet") == 1
    # the click/purchase filter reaches the scan
    assert "PushedFilters" in p
    scan = next(l for l in p.splitlines() if "FileScan parquet" in l)
    assert "event_type" in scan
    # one keyed window (user) + the final lag-bucket agg
    assert p.count("Exchange hashpartitioning") == 2
    assert "CartesianProduct" not in p


def test_concurrency_sessionize_runs_once(spark):
    p = _plan(spark, "q_evt_concurrency")
    # sessions persisted: every events scan sits inside a cache block;
    # the cross-day carry is a broadcast of the bounded day table, and
    # the only single-partition exchange is that bounded carry window
    assert p.count("FileScan parquet") <= p.count("InMemoryRelation")
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p


def test_seasonality_single_data_exchange(spark):
    """dow×hour seasonality: one hash exchange for the 168-cell agg; the
    grand total rides a broadcast, never a second data-scale shuffle."""
    p = _plan(spark, "q_evt_seasonality")
    assert "BroadcastExchange" in p
    assert "CartesianProduct" not in p
    # the only hash exchanges are over the 168-cell aggregate state
    # (cell agg + its 1-row rollup), never a join key over raw events
    assert "SortMergeJoin" not in p


def test_ab_test_single_pass_no_join(spark):
    """The cohort split is a projection: no join, no window — one scan,
    one agg exchange."""
    p = _plan(spark, "q_evt_ab_test")
    assert "Join" not in p
    assert p.count("Exchange hashpartitioning") == 1


def test_shapley_data_scale_is_one_key(spark):
    """Everything after the per-user window+agg is literal-range
    arithmetic on broadcast tables — no shuffle keyed on anything but
    user_id at data scale, no cartesian product."""
    p = _plan(spark, "q_evt_attribution_shapley")
    assert "CartesianProduct" not in p
    assert p.count("Exchange hashpartitioning(user_id") <= 2


def test_collocations_marginals_over_count_table(spark):
    """The bigram count groupBy is the only data-scale exchange; the
    marginal windows re-key the vocab²-bounded count table."""
    p = _plan(spark, "q_doc_collocations")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_quantile_norm_one_source_keyed_window(spark):
    """Rank and per-source count share one source-keyed exchange; no
    global (empty-key) sort of data."""
    p = _plan(spark, "q_doc_quantile_norm")
    assert p.count("Exchange hashpartitioning(source") == 1
    assert "Exchange rangepartitioning" not in p


def test_rolling_dau_equi_join_not_nl(spark):
    """The trailing-week membership must plan as explode + equi join —
    a BETWEEN range join here is |days| x |pairs| nested-loop
    comparisons (5.4e9 at the 200x corpus; measured 18.5 s -> 8.0 s)."""
    p = _plan(spark, "q_evt_rolling_dau")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_rfm_no_global_ntile_window(spark):
    """r10 verdict #2: q_evt_rfm's quintiles come from the distributed
    rank (histogram rows-before + bucketed tie row_number), NOT from an
    NTILE window over the |users| frame — the only unpartitioned
    windows left run over per-bucket aggregate rows (<= n_buckets)."""
    p = _plan(spark, "q_evt_rfm")
    assert "ntile(" not in p
    assert "CartesianProduct" not in p
    # every row_number rides a partitioned spec: its window lines name
    # the (__v, __ub) partition columns, never a SinglePartition sort of
    # the per-user frame
    for line in p.splitlines():
        if "row_number()" in line:
            assert "windowspecdefinition(__v" in line, line


def test_gini_no_rank_window(spark):
    """q_evt_user_gini folds Σ(rank·x) out of the activity histogram —
    no row_number/rank window anywhere in the plan; the only window is
    the cumulative sum over the |activity-levels| histogram."""
    p = _plan(spark, "q_evt_user_gini")
    assert "row_number()" not in p
    assert "ntile(" not in p


def test_bootstrap_one_scan_no_shuffle_before_replica_agg(spark):
    """q_orders_bootstrap_ci: the 64x replica expansion is a row-local
    flat map (generator explode) feeding ONE partial-aggregated exchange
    on the 64 replica keys — no join, no pre-agg shuffle of the
    expanded frame, no cartesian."""
    p = _plan(spark, "q_orders_bootstrap_ci")
    assert "CartesianProduct" not in p
    assert p.count("FileScan parquet") <= 2  # replica pass + full-stats
    assert "Generate explode" in p
    assert "SortMergeJoin" not in p


def test_cooc_sim_vocab_broadcast_no_cartesian(spark):
    """q_doc_cooc_sim: the 100-word vocab filter must reach the token
    stream as a BROADCAST join (bounding per-doc fanout at vocab^2);
    the pair/dot joins run on the bounded co-occurrence matrix."""
    p = _plan(spark, "q_doc_cooc_sim")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p


def test_xcorr_daily_agg_collapses_before_lag_join(spark):
    """q_evt_xcorr_lag: exactly one corpus-sized aggregate (the daily
    groupBy); the 15-lag pairing joins the bounded daily frame, never
    the raw events (no second events scan, no nested loop over rows)."""
    p = _plan(spark, "q_evt_xcorr_lag")
    # the daily frame is localCheckpoint'd: the corpus scan ran once at
    # build; the final plan joins the pinned rows (0 parquet scans)
    assert p.count("FileScan parquet") == 0
    assert "CartesianProduct" not in p


def test_stats_trio_single_corpus_pass(spark):
    """Spearman/Kendall/ANOVA each collapse the corpus with ONE
    map-side-combinable aggregate; everything after runs on bounded
    aggregate state (days / k types)."""
    for name, scans in (("q_evt_spearman", 1), ("q_evt_kendall_tau", 0),
                        ("q_evt_anova_f", 1)):
        # kendall's daily frame is localCheckpoint'd (both pair sides)
        p = _plan(spark, name)
        assert p.count("FileScan parquet") == scans, name
        assert "CartesianProduct" not in p, name


def test_hll_rollup_grouping_sets_no_persist_no_grid(spark):
    p = _plan(spark, "q_evt_hll_rollup")
    # r11: both merge hops + widths ride ONE grouping-sets pass (Expand)
    # over the finest-grain sketch rows; the 64-register zero-fill grid
    # is algebraic (no crossJoin/range join-back) and nothing persists
    assert "InMemoryRelation" not in p
    assert "Expand" in p
    assert "CartesianProduct" not in p
    assert "Exchange rangepartitioning" not in p
    # events is scanned once per tier (sketch + exact), never more
    assert p.count("FileScan parquet") <= 3
