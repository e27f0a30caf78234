"""Similarity-search queries over `embeddings` (vec_id, embedding:
array<float>, label): exact brute-force cosine top-k, sign-bit LSH bucketing
(the ANN scale path), and per-label vector stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load, register
from ..pipeline.similarity import cosine_topk, lsh_sign_buckets


@register(
    "q_emb_cosine_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
          FROM embeddings WHERE vec_id >= 10),
    s AS (SELECT query_id, neighbor_id,
                 list_cosine_similarity(qv, cv) AS sim
          FROM q CROSS JOIN c),
    r AS (SELECT query_id, neighbor_id, sim,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, neighbor_id) AS rank
          FROM s)
    SELECT query_id, neighbor_id, ROUND(sim, 4) AS cos_sim, rank
    FROM r WHERE rank <= 5
    """,
)
def q_emb_cosine_topk(spark, sf_dir):
    """Exact brute-force cosine top-5 for 10 query vectors vs the rest of the
    corpus. Query side broadcast; corpus streams (no corpus shuffle)."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    c = emb.where(F.col("vec_id") >= 10)
    return cosine_topk(q, c, k=5)


@register(
    "q_emb_lsh_buckets",
    oracle="""
    WITH b AS (
        SELECT vec_id, label,
               (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
             + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
             + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
             + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)
             + (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END)
             + (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END)
             + (CASE WHEN embedding[7] > 0 THEN 64 ELSE 0 END)
             + (CASE WHEN embedding[8] > 0 THEN 128 ELSE 0 END) AS bucket
        FROM embeddings
    )
    SELECT bucket, COUNT(*) AS n_vectors,
           COUNT(DISTINCT label) AS n_labels
    FROM b GROUP BY 1
    """,
)
def q_emb_lsh_buckets(spark, sf_dir):
    """Sign-bit LSH bucketing (8 bits): occupancy per bucket — the blocking
    structure the ANN path joins on instead of cross-joining the corpus."""
    emb = lsh_sign_buckets(load(spark, sf_dir, "embeddings"), bits=8)
    return emb.groupBy("bucket").agg(
        F.count("*").alias("n_vectors"),
        F.countDistinct("label").alias("n_labels"),
    )


@register(
    "q_emb_ivf_topk",
    oracle="""
    WITH cent AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
                  FROM embeddings WHERE vec_id < 16),
    corpus AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS nv
               FROM embeddings WHERE vec_id >= 16),
    qs AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id >= 16 AND vec_id < 26),
    assign AS (
        SELECT nid, nv, cid FROM (
            SELECT c.nid, c.nv, t.cid,
                   ROW_NUMBER() OVER (PARTITION BY c.nid
                       ORDER BY list_distance(c.nv, t.cv), t.cid) AS rk
            FROM corpus c CROSS JOIN cent t
        ) WHERE rk = 1
    ),
    probes AS (
        SELECT qid, qv, cid FROM (
            SELECT q.qid, q.qv, t.cid,
                   ROW_NUMBER() OVER (PARTITION BY q.qid
                       ORDER BY list_distance(q.qv, t.cv), t.cid) AS rk
            FROM qs q CROSS JOIN cent t
        ) WHERE rk <= 2
    ),
    scored AS (
        SELECT p.qid AS query_id, a.nid AS neighbor_id,
               list_cosine_similarity(p.qv, a.nv) AS sim
        FROM probes p JOIN assign a USING (cid)
    ),
    ranked AS (
        SELECT query_id, neighbor_id, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, ROUND(sim, 4) AS cos_sim, rank
    FROM ranked WHERE rank <= 5
    """,
)
def q_emb_ivf_topk(spark, sf_dir):
    """IVF ANN scale path: 16 fixed coarse centroids (vec_id < 16), corpus
    assigned to nearest list, queries probe their 2 nearest lists, cosine
    top-5 among candidates. Deterministic (L2 assignment, ties → lowest
    centroid id) hence oracle-checkable."""
    from ..pipeline.similarity import ivf_topk

    emb = load(spark, sf_dir, "embeddings")
    cent = emb.where(F.col("vec_id") < 16)
    corpus = emb.where(F.col("vec_id") >= 16)
    qs = emb.where((F.col("vec_id") >= 16) & (F.col("vec_id") < 26))
    return ivf_topk(qs, corpus, cent, k=5, nprobe=2)


@register(
    "q_emb_near_dup_pairs",
    oracle="""
    WITH b AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
             + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
             + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
             + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS bucket
        FROM embeddings
    )
    SELECT a.vec_id AS id_a, c.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.v, c.v), 4) AS cos_sim
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE ROUND(list_cosine_similarity(a.v, c.v), 4) >= 0.35
    """,
)
def q_emb_near_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs with LSH blocking: candidates
    restricted to the same 4-bit sign bucket (the blocking an exact
    O(N²) pass can't afford at scale), exact cosine filter >= 0.35.
    Oracle replicates the identical deterministic blocking."""
    from ..pipeline.similarity import _dot, _norm, lsh_sign_buckets

    emb = lsh_sign_buckets(load(spark, sf_dir, "embeddings"), bits=4)
    a = emb.select(F.col("vec_id").alias("id_a"),
                   F.col("embedding").alias("__va"), "bucket")
    b = emb.select(F.col("vec_id").alias("id_b"),
                   F.col("embedding").alias("__vb"), "bucket")
    sim = F.round(
        _dot(F.col("__va"), F.col("__vb"))
        / (_norm(F.col("__va")) * _norm(F.col("__vb"))),
        4,
    )
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cos_sim"))
        .where(F.col("cos_sim") >= 0.35)
    )


@register(
    "q_emb_dim_stats",
    oracle="""
    SELECT dim,
           ROUND(AVG(v), 4) AS mean_v,
           ROUND(STDDEV_SAMP(v), 4) AS std_v,
           ROUND(MIN(v), 4) AS min_v,
           ROUND(MAX(v), 4) AS max_v
    FROM (
        SELECT d - 1 AS dim, CAST(embedding[d] AS DOUBLE) AS v
        FROM embeddings,
             (SELECT UNNEST(generate_series(1, 8)) AS d)
    )
    GROUP BY 1
    """,
)
def q_emb_dim_stats(spark, sf_dir):
    """Lateral explode surface: posexplode the embedding array → per-dimension
    distribution stats for the first 8 dims."""
    emb = load(spark, sf_dir, "embeddings")
    ex = emb.select(F.posexplode("embedding").alias("dim", "v")) \
        .where(F.col("dim") < 8) \
        .withColumn("v", F.col("v").cast("double"))
    return ex.groupBy("dim").agg(
        F.round(F.avg("v"), 4).alias("mean_v"),
        F.round(F.stddev_samp("v"), 4).alias("std_v"),
        F.round(F.min("v"), 4).alias("min_v"),
        F.round(F.max("v"), 4).alias("max_v"),
    )


@register(
    "q_emb_label_stats",
    oracle="""
    SELECT label, COUNT(*) AS n_vectors,
           ROUND(AVG(SQRT(list_dot_product(embedding, embedding))), 6)
               AS avg_norm,
           ROUND(AVG(embedding[1]), 6) AS avg_dim0
    FROM embeddings GROUP BY 1
    """,
)
def q_emb_label_stats(spark, sf_dir):
    """Per-label vector statistics (norms via zip-free self dot product)."""
    emb = load(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            "embedding", F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return emb.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.round(F.avg(norm), 6).alias("avg_norm"),
        F.round(F.avg(F.col("embedding").getItem(0).cast("double")), 6)
        .alias("avg_dim0"),
    )


@register(
    "q_emb_kmeans_clusters",
    oracle="""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c0 AS (SELECT vec_id AS cid, v AS cv FROM emb WHERE vec_id < 8),
    a1 AS (SELECT vec_id, v, cid FROM (
             SELECT e.vec_id, e.v, c.cid,
                    ROW_NUMBER() OVER (PARTITION BY e.vec_id
                        ORDER BY list_distance(e.v, c.cv), c.cid) AS rk
             FROM emb e CROSS JOIN c0 c) WHERE rk = 1),
    m1 AS (SELECT cid, dim, AVG(v[dim]) AS mv
           FROM a1, range(1, 65) t(dim) GROUP BY 1, 2),
    n1 AS (SELECT cid, list(mv ORDER BY dim) AS nv FROM m1 GROUP BY cid),
    c1 AS (SELECT c0.cid, COALESCE(n1.nv, c0.cv) AS cv
           FROM c0 LEFT JOIN n1 USING (cid)),
    a2 AS (SELECT vec_id, v, cid FROM (
             SELECT e.vec_id, e.v, c.cid,
                    ROW_NUMBER() OVER (PARTITION BY e.vec_id
                        ORDER BY list_distance(e.v, c.cv), c.cid) AS rk
             FROM emb e CROSS JOIN c1 c) WHERE rk = 1),
    m2 AS (SELECT cid, dim, AVG(v[dim]) AS mv
           FROM a2, range(1, 65) t(dim) GROUP BY 1, 2),
    n2 AS (SELECT cid, list(mv ORDER BY dim) AS nv FROM m2 GROUP BY cid),
    c2 AS (SELECT c1.cid, COALESCE(n2.nv, c1.cv) AS cv
           FROM c1 LEFT JOIN n2 USING (cid)),
    a3 AS (SELECT vec_id, v, cid FROM (
             SELECT e.vec_id, e.v, c.cid,
                    ROW_NUMBER() OVER (PARTITION BY e.vec_id
                        ORDER BY list_distance(e.v, c.cv), c.cid) AS rk
             FROM emb e CROSS JOIN c2 c) WHERE rk = 1)
    SELECT cid AS centroid_id, COUNT(*) AS n_members,
           ROUND(AVG(v[1]), 4) AS mean_d0, ROUND(AVG(v[2]), 4) AS mean_d1,
           ROUND(AVG(v[3]), 4) AS mean_d2, ROUND(AVG(v[4]), 4) AS mean_d3
    FROM a3 GROUP BY 1
    """,
)
def q_emb_kmeans_clusters(spark, sf_dir):
    """K-means-refined IVF coarse quantizer (ROADMAP item): 2 Lloyd
    iterations as pure DataFrame ops (broadcast assignment + posexplode
    per-dim means — see pipeline/similarity.kmeans_centroids), then the
    final cluster occupancy + first-4-dim means. The oracle unrolls the
    same two iterations as DuckDB CTEs, so the entire iterative algorithm
    is value-checked, not just row counts."""
    from ..pipeline.similarity import kmeans_assign, kmeans_centroids

    emb = load(spark, sf_dir, "embeddings")
    cent = kmeans_centroids(emb, k=8, iters=2)
    assigned = kmeans_assign(emb, cent)
    v = F.col("embedding")
    return assigned.groupBy("centroid_id").agg(
        F.count("*").alias("n_members"),
        F.round(F.avg(v.getItem(0).cast("double")), 4).alias("mean_d0"),
        F.round(F.avg(v.getItem(1).cast("double")), 4).alias("mean_d1"),
        F.round(F.avg(v.getItem(2).cast("double")), 4).alias("mean_d2"),
        F.round(F.avg(v.getItem(3).cast("double")), 4).alias("mean_d3"),
    )


@register("q_emb_pq_topk", oracle=None)
def q_emb_pq_topk(spark, sf_dir):
    """Product-quantization ANN (rows-only: the 3-stage PQ pipeline —
    grouped Lloyd codebooks, m-byte encoding, ADC lookup-table top-k — is
    not reasonably SQL-expressible; correctness is covered by the numpy
    differential in tests/test_pipeline.py::test_pq_matches_numpy_and_recall
    and the k-means stage itself is oracle-gated via q_emb_kmeans_clusters)."""
    from ..pipeline.pq import pq_codebooks, pq_encode, pq_topk

    emb = load(spark, sf_dir, "embeddings")
    cb = pq_codebooks(emb, m=8, ksub=16, iters=2, dim=64)
    codes = pq_encode(emb, cb, m=8, dim=64)
    qs = emb.where(F.col("vec_id") < 10)
    return pq_topk(qs, codes, cb, k=5, m=8, dim=64)


@register("q_emb_ivfpq_topk", oracle=None)
def q_emb_ivfpq_topk(spark, sf_dir):
    """IVF-PQ ANN (rows-only: composition of the oracle-gated k-means coarse
    quantizer and the numpy-differentialed PQ fine quantizer; containment and
    degeneracy properties proven in
    tests/test_pipeline.py::test_ivf_pq_recall_and_shortlist_containment)."""
    from ..pipeline.pq import ivf_pq_topk

    emb = load(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 10)
    return ivf_pq_topk(qs, emb, k=5, nlist=8, nprobe=2, m=8, ksub=16, iters=1)


@register("q_emb_ann_recall", oracle=None)
def q_emb_ann_recall(spark, sf_dir):
    """Recall@5 scoreboard of every ANN variant vs brute-force cosine, in
    one DataFrame job (rows-only: the ground truth is itself a query-side
    computation, so the check that matters is the measured recall, which
    tests/test_pipeline.py bounds). One row per variant:
    (variant, n_queries, n_hits, recall)."""
    from ..pipeline.pq import ivf_pq_topk, pq_codebooks, pq_encode, pq_topk
    from ..pipeline.similarity import (
        cosine_topk, cosine_topk_bucketed, ivf_topk, kmeans_centroids,
    )

    emb = load(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 10)

    truth = cosine_topk(qs, emb, k=5).select(
        "query_id", F.col("neighbor_id").alias("true_id")
    )

    variants = {
        "lsh_bucketed": cosine_topk_bucketed(qs, emb, k=5, bits=8),
        "ivf_fixed": ivf_topk(qs, emb, emb.where(F.col("vec_id") < 16), k=5,
                              nprobe=2),
        "ivf_kmeans": ivf_topk(
            qs, emb,
            kmeans_centroids(emb, k=8, iters=1)
            .select(F.col("centroid_id").alias("vec_id"), "embedding"),
            k=5, nprobe=2),
        "ivf_pq": ivf_pq_topk(qs, emb, k=5, nlist=8, nprobe=2, m=8,
                              ksub=16, iters=1),
        "ivf_pq_residual": ivf_pq_topk(qs, emb, k=5, nlist=8, nprobe=2,
                                       m=8, ksub=16, iters=1, residual=True),
    }
    cb = pq_codebooks(emb, m=8, ksub=16, iters=1)
    variants["pq_adc"] = pq_topk(qs, pq_encode(emb, cb, m=8), cb, k=5, m=8)

    truth_stats = truth.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count("*").alias("__n_truth"),
    )
    out = None
    for name, approx in variants.items():
        hits = (
            truth.join(
                approx.select("query_id",
                              F.col("neighbor_id").alias("got_id")),
                ["query_id"],
            )
            .where(F.col("true_id") == F.col("got_id"))
            .agg(F.count("*").alias("n_hits"))
            .crossJoin(F.broadcast(truth_stats))
            .select(
                F.lit(name).alias("variant"),
                F.col("n_queries").cast("long").alias("n_queries"),
                "n_hits",
                F.round(F.col("n_hits") / F.col("__n_truth"), 4)
                .alias("recall"),
            )
        )
        out = hits if out is None else out.unionByName(hits)
    return out
