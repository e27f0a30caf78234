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
    # norm is per-VECTOR: computed once per row here, not re-folded per
    # pair inside the bucket join (the semantic-dedup hoist, same shape)
    emb = emb.withColumn("__nrm", _norm(F.col("embedding")))
    a = emb.select(F.col("vec_id").alias("id_a"),
                   F.col("embedding").alias("__va"),
                   F.col("__nrm").alias("__na"), "bucket")
    b = emb.select(F.col("vec_id").alias("id_b"),
                   F.col("embedding").alias("__vb"),
                   F.col("__nrm").alias("__nb"), "bucket")
    sim = F.round(
        _dot(F.col("__va"), F.col("__vb"))
        / (F.col("__na") * F.col("__nb")),
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
    from ..pipeline.similarity import kmeans_assign_kernel, kmeans_centroids

    emb = load(spark, sf_dir, "embeddings")
    cent = kmeans_centroids(emb, k=8, iters=2)
    assigned = kmeans_assign_kernel(emb, cent)
    v = F.col("embedding")
    return assigned.groupBy("centroid_id").agg(
        F.count("*").alias("n_members"),
        F.round(F.avg(v.getItem(0).cast("double")), 4).alias("mean_d0"),
        F.round(F.avg(v.getItem(1).cast("double")), 4).alias("mean_d1"),
        F.round(F.avg(v.getItem(2).cast("double")), 4).alias("mean_d2"),
        F.round(F.avg(v.getItem(3).cast("double")), 4).alias("mean_d3"),
    )


# PQ oracle building blocks (shared by the pq/ivfpq/ann-recall oracles):
# squared distances as explicit index-order sums matching similarity._sqdist.
_SQD8 = ("list_aggregate(list_transform(range(1, 9), "
         "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), 'sum')")
_SUBS = ("SELECT vec_id, s.sub_id, v[s.sub_id * 8 + 1 : s.sub_id * 8 + 8] "
         "AS sub FROM {src}, (SELECT UNNEST(range(0, 8)) AS sub_id) s")


def _pq_train_sql(iters: int, src: str = "emb") -> str:
    """CTE chain training m=8 × ksub=16 PQ codebooks on ``src`` with
    ``iters`` Lloyd rounds (init = subvectors of the 16 lowest-id rows,
    empty cells keep their centroid). Emits CTEs ``subs`` … ``pcb``
    (the final codebook) for embedding in a WITH clause."""
    parts = [
        f"subs AS ({_SUBS.format(src=src)})",
        "pseed AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1"
        " AS pcid FROM (SELECT vec_id FROM emb ORDER BY vec_id LIMIT 16))",
        "pcb0 AS (SELECT s.sub_id, p.pcid, s.sub AS cent"
        " FROM subs s JOIN pseed p USING (vec_id))",
    ]
    prev = "pcb0"
    for it in range(1, iters + 1):
        d2 = _SQD8.format(a="s.sub", b="c.cent")
        parts.append(
            f"pa{it} AS (SELECT vec_id, sub_id, sub, code FROM ("
            f"SELECT s.vec_id, s.sub_id, s.sub, c.pcid AS code,"
            f" ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub_id"
            f" ORDER BY {d2}, c.pcid) AS rk"
            f" FROM subs s JOIN {prev} c USING (sub_id)) WHERE rk = 1)")
        parts.append(
            f"pm{it} AS (SELECT sub_id, code, dim, AVG(sub[dim]) AS mv"
            f" FROM pa{it}, range(1, 9) t(dim) GROUP BY 1, 2, 3)")
        parts.append(
            f"pn{it} AS (SELECT sub_id, code, list(mv ORDER BY dim) AS nv"
            f" FROM pm{it} GROUP BY 1, 2)")
        nxt = "pcb" if it == iters else f"pcb{it}"
        parts.append(
            f"{nxt} AS (SELECT b.sub_id, b.pcid, COALESCE(n.nv, b.cent)"
            f" AS cent FROM {prev} b LEFT JOIN pn{it} n"
            f" ON n.sub_id = b.sub_id AND n.code = b.pcid)")
        prev = nxt
    return ",\n".join(parts)


_PQ_CODES_LUT_SQL = f"""
codes AS (SELECT vec_id, sub_id, code FROM (
           SELECT s.vec_id, s.sub_id, c.pcid AS code,
                  ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub_id
                      ORDER BY {_SQD8.format(a='s.sub', b='c.cent')},
                               c.pcid) AS rk
           FROM subs s JOIN pcb c USING (sub_id)) WHERE rk = 1),
qlut AS (SELECT s.vec_id AS query_id, s.sub_id, c.pcid AS code,
                {_SQD8.format(a='s.sub', b='c.cent')} AS d2
         FROM subs s JOIN pcb c USING (sub_id) WHERE s.vec_id < 10)
"""


@register(
    "q_emb_pq_topk",
    oracle=f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_pq_train_sql(2)},
{_PQ_CODES_LUT_SQL},
adc AS (SELECT l.query_id, c.vec_id AS neighbor_id, SUM(l.d2) AS dist
        FROM codes c JOIN qlut l
          ON l.sub_id = c.sub_id AND l.code = c.code
        GROUP BY 1, 2)
SELECT query_id, neighbor_id, ROUND(dist, 4) AS approx_d2, rank FROM (
    SELECT query_id, neighbor_id, dist,
           ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY dist, neighbor_id) AS rank
    FROM adc) WHERE rank <= 5
""",
)
def q_emb_pq_topk(spark, sf_dir):
    """Product-quantization ANN top-k: 2-Lloyd-round grouped codebooks,
    m-byte encoding, ADC lookup-table ranking. ORACLE-GATED: the whole
    3-stage pipeline is unrolled as DuckDB CTEs (deterministic init/ties),
    so codes, LUT distances and ranking are value-checked; the numpy
    differential in tests/test_pipeline.py covers it independently."""
    from ..pipeline.pq import pq_codebooks, pq_encode, pq_topk

    emb = load(spark, sf_dir, "embeddings")
    cb = pq_codebooks(emb, m=8, ksub=16, iters=2, dim=64)
    codes = pq_encode(emb, cb, m=8, dim=64)
    qs = emb.where(F.col("vec_id") < 10)
    return pq_topk(qs, codes, cb, k=5, m=8, dim=64)


@register(
    "q_emb_ivfpq_topk",
    oracle=f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
qs AS (SELECT vec_id, v FROM emb WHERE vec_id < 10),
c0 AS (SELECT vec_id AS cid, v AS cv FROM emb WHERE vec_id < 8),
ka1 AS (SELECT vec_id, v, cid FROM (
         SELECT e.vec_id, e.v, c.cid,
                ROW_NUMBER() OVER (PARTITION BY e.vec_id
                    ORDER BY list_distance(e.v, c.cv), c.cid) AS rk
         FROM emb e CROSS JOIN c0 c) WHERE rk = 1),
km1 AS (SELECT cid, dim, AVG(v[dim]) AS mv
        FROM ka1, range(1, 65) t(dim) GROUP BY 1, 2),
kn1 AS (SELECT cid, list(mv ORDER BY dim) AS nv FROM km1 GROUP BY cid),
kc1 AS (SELECT c0.cid, COALESCE(kn1.nv, c0.cv) AS cv
        FROM c0 LEFT JOIN kn1 USING (cid)),
ka AS (SELECT vec_id, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY list_distance(e.v, c.cv), c.cid) AS rk
        FROM emb e CROSS JOIN kc1 c) WHERE rk = 1),
kp AS (SELECT vec_id, cid FROM (
        SELECT q.vec_id, q.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY list_distance(q.v, c.cv), c.cid) AS rk
        FROM qs q CROSS JOIN kc1 c) WHERE rk <= 2),
{_pq_train_sql(1)},
{_PQ_CODES_LUT_SQL},
ip_adc AS (SELECT l.query_id, c.vec_id AS neighbor_id, SUM(l.d2) AS dist
           FROM kp p
           JOIN ka a ON a.cid = p.cid
           JOIN codes c ON c.vec_id = a.vec_id
           JOIN qlut l ON l.query_id = p.vec_id
                      AND l.sub_id = c.sub_id AND l.code = c.code
           GROUP BY 1, 2)
SELECT query_id, neighbor_id, ROUND(dist, 4) AS approx_d2, rank FROM (
    SELECT query_id, neighbor_id, dist,
           ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY dist, neighbor_id) AS rank
    FROM ip_adc) WHERE rank <= 5
""",
)
def q_emb_ivfpq_topk(spark, sf_dir):
    """IVF-PQ ANN top-k: 1-Lloyd-round coarse quantizer shortlists by
    probed list, PQ/ADC ranks the shortlist. ORACLE-GATED end to end
    (coarse k-means + PQ training + encode + probe-restricted ADC unrolled
    as DuckDB CTEs); containment/degeneracy properties additionally proven
    in tests/test_pipeline.py."""
    from ..pipeline.pq import ivf_pq_topk

    emb = load(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 10)
    return ivf_pq_topk(qs, emb, k=5, nlist=8, nprobe=2, m=8, ksub=16, iters=1)


# Recall scoreboard oracle: every ANN variant unrolled as DuckDB CTEs —
# ground truth (brute-force cosine top-5), LSH bucketing, IVF with fixed and
# k-means centroids (1 Lloyd iteration, same unrolling as the
# q_emb_kmeans_clusters oracle), PQ codebooks/encode/ADC (1 Lloyd iteration
# per subspace), IVF-PQ, and residual IVF-PQ. Squared distances are explicit
# index-order sums (matching similarity._sqdist, via the shared _SQD8/_SUBS
# helpers above) rather than list_distance()^2, so ADC sums agree with
# Spark to the last ulp.
_ANN_RECALL_ORACLE = f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
qs AS (SELECT vec_id, v FROM emb WHERE vec_id < 10),
-- ground truth: exact cosine top-5 (query is part of the corpus)
tr AS (
    SELECT query_id, true_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS true_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.v, c.v) DESC,
                            c.vec_id) AS rk
        FROM qs q CROSS JOIN emb c) WHERE rk <= 5
),
tstat AS (SELECT COUNT(DISTINCT query_id) AS nq, COUNT(*) AS nt FROM tr),
-- variant lsh_bucketed: candidates restricted to the same 8-bit sign bucket
bk AS (
    SELECT vec_id, v,
           (CASE WHEN v[1] > 0 THEN 1 ELSE 0 END)
         + (CASE WHEN v[2] > 0 THEN 2 ELSE 0 END)
         + (CASE WHEN v[3] > 0 THEN 4 ELSE 0 END)
         + (CASE WHEN v[4] > 0 THEN 8 ELSE 0 END)
         + (CASE WHEN v[5] > 0 THEN 16 ELSE 0 END)
         + (CASE WHEN v[6] > 0 THEN 32 ELSE 0 END)
         + (CASE WHEN v[7] > 0 THEN 64 ELSE 0 END)
         + (CASE WHEN v[8] > 0 THEN 128 ELSE 0 END) AS bucket
    FROM emb
),
l5 AS (
    SELECT query_id, got_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS got_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.v, c.v) DESC,
                            c.vec_id) AS rk
        FROM bk q JOIN bk c USING (bucket) WHERE q.vec_id < 10)
    WHERE rk <= 5
),
-- variant ivf_fixed: 16 fixed centroids (vec_id < 16), nprobe=2
cf AS (SELECT vec_id AS cid, v AS cv FROM emb WHERE vec_id < 16),
af AS (SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY list_distance(e.v, c.cv), c.cid) AS rk
        FROM emb e CROSS JOIN cf c) WHERE rk = 1),
pf AS (SELECT vec_id, v, cid FROM (
        SELECT q.vec_id, q.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY list_distance(q.v, c.cv), c.cid) AS rk
        FROM qs q CROSS JOIN cf c) WHERE rk <= 2),
if5 AS (
    SELECT query_id, got_id FROM (
        SELECT p.vec_id AS query_id, a.vec_id AS got_id,
               ROW_NUMBER() OVER (PARTITION BY p.vec_id
                   ORDER BY list_cosine_similarity(p.v, a.v) DESC,
                            a.vec_id) AS rk
        FROM pf p JOIN af a USING (cid)) WHERE rk <= 5
),
-- variant ivf_kmeans: k=8 centroids refined by ONE Lloyd iteration
-- (init = the 8 lowest-id vectors; empty clusters keep their centroid)
c0 AS (SELECT vec_id AS cid, v AS cv FROM emb WHERE vec_id < 8),
ka1 AS (SELECT vec_id, v, cid FROM (
         SELECT e.vec_id, e.v, c.cid,
                ROW_NUMBER() OVER (PARTITION BY e.vec_id
                    ORDER BY list_distance(e.v, c.cv), c.cid) AS rk
         FROM emb e CROSS JOIN c0 c) WHERE rk = 1),
km1 AS (SELECT cid, dim, AVG(v[dim]) AS mv
        FROM ka1, range(1, 65) t(dim) GROUP BY 1, 2),
kn1 AS (SELECT cid, list(mv ORDER BY dim) AS nv FROM km1 GROUP BY cid),
kc1 AS (SELECT c0.cid, COALESCE(kn1.nv, c0.cv) AS cv
        FROM c0 LEFT JOIN kn1 USING (cid)),
ka AS (SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY list_distance(e.v, c.cv), c.cid) AS rk
        FROM emb e CROSS JOIN kc1 c) WHERE rk = 1),
kp AS (SELECT vec_id, v, cid FROM (
        SELECT q.vec_id, q.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY list_distance(q.v, c.cv), c.cid) AS rk
        FROM qs q CROSS JOIN kc1 c) WHERE rk <= 2),
ik5 AS (
    SELECT query_id, got_id FROM (
        SELECT p.vec_id AS query_id, a.vec_id AS got_id,
               ROW_NUMBER() OVER (PARTITION BY p.vec_id
                   ORDER BY list_cosine_similarity(p.v, a.v) DESC,
                            a.vec_id) AS rk
        FROM kp p JOIN ka a USING (cid)) WHERE rk <= 5
),
-- PQ codebooks on the raw corpus: m=8 subspaces x 8 dims, ksub=16,
-- ONE Lloyd iteration (init = subvectors of the 16 lowest-id rows)
subs AS ({_SUBS.format(src='emb')}),
pseed AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS pcid
          FROM (SELECT vec_id FROM emb ORDER BY vec_id LIMIT 16)),
pcb0 AS (SELECT s.sub_id, p.pcid, s.sub AS cent
         FROM subs s JOIN pseed p USING (vec_id)),
pa1 AS (SELECT vec_id, sub_id, sub, code FROM (
         SELECT s.vec_id, s.sub_id, s.sub, c.pcid AS code,
                ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub_id
                    ORDER BY {_SQD8.format(a='s.sub', b='c.cent')},
                             c.pcid) AS rk
         FROM subs s JOIN pcb0 c USING (sub_id)) WHERE rk = 1),
pm1 AS (SELECT sub_id, code, dim, AVG(sub[dim]) AS mv
        FROM pa1, range(1, 9) t(dim) GROUP BY 1, 2, 3),
pn1 AS (SELECT sub_id, code, list(mv ORDER BY dim) AS nv
        FROM pm1 GROUP BY 1, 2),
pcb AS (SELECT b.sub_id, b.pcid, COALESCE(n.nv, b.cent) AS cent
        FROM pcb0 b LEFT JOIN pn1 n
          ON n.sub_id = b.sub_id AND n.code = b.pcid),
codes AS (SELECT vec_id, sub_id, code FROM (
           SELECT s.vec_id, s.sub_id, c.pcid AS code,
                  ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub_id
                      ORDER BY {_SQD8.format(a='s.sub', b='c.cent')},
                               c.pcid) AS rk
           FROM subs s JOIN pcb c USING (sub_id)) WHERE rk = 1),
qlut AS (SELECT s.vec_id AS query_id, s.sub_id, c.pcid AS code,
                {_SQD8.format(a='s.sub', b='c.cent')} AS d2
         FROM subs s JOIN pcb c USING (sub_id) WHERE s.vec_id < 10),
-- variant pq_adc: full-corpus ADC over the PQ codes
adc AS (SELECT l.query_id, c.vec_id AS got_id, SUM(l.d2) AS dist
        FROM codes c JOIN qlut l
          ON l.sub_id = c.sub_id AND l.code = c.code
        GROUP BY 1, 2),
pq5 AS (SELECT query_id, got_id FROM (
         SELECT query_id, got_id,
                ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY dist, got_id) AS rk
         FROM adc) WHERE rk <= 5),
-- variant ivf_pq: ADC restricted to the query's 2 probed k-means lists
ip_adc AS (SELECT l.query_id, c.vec_id AS got_id, SUM(l.d2) AS dist
           FROM kp p
           JOIN ka a ON a.cid = p.cid
           JOIN codes c ON c.vec_id = a.vec_id
           JOIN qlut l ON l.query_id = p.vec_id
                      AND l.sub_id = c.sub_id AND l.code = c.code
           GROUP BY 1, 2),
ip5 AS (SELECT query_id, got_id FROM (
         SELECT query_id, got_id,
                ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY dist, got_id) AS rk
         FROM ip_adc) WHERE rk <= 5),
-- variant ivf_pq_residual: PQ trained/encoded on (v - list centroid)
-- residuals; one LUT per (query, probed list) against (q - centroid)
rv AS (SELECT a.vec_id,
              list_transform(range(1, 65), i -> a.v[i] - k.cv[i]) AS v
       FROM ka a JOIN kc1 k USING (cid)),
rsubs AS ({_SUBS.format(src='rv')}),
rcb0 AS (SELECT s.sub_id, p.pcid, s.sub AS cent
         FROM rsubs s JOIN pseed p USING (vec_id)),
ra1 AS (SELECT vec_id, sub_id, sub, code FROM (
         SELECT s.vec_id, s.sub_id, s.sub, c.pcid AS code,
                ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub_id
                    ORDER BY {_SQD8.format(a='s.sub', b='c.cent')},
                             c.pcid) AS rk
         FROM rsubs s JOIN rcb0 c USING (sub_id)) WHERE rk = 1),
rm1 AS (SELECT sub_id, code, dim, AVG(sub[dim]) AS mv
        FROM ra1, range(1, 9) t(dim) GROUP BY 1, 2, 3),
rn1 AS (SELECT sub_id, code, list(mv ORDER BY dim) AS nv
        FROM rm1 GROUP BY 1, 2),
rcb AS (SELECT b.sub_id, b.pcid, COALESCE(n.nv, b.cent) AS cent
        FROM rcb0 b LEFT JOIN rn1 n
          ON n.sub_id = b.sub_id AND n.code = b.pcid),
rcodes AS (SELECT vec_id, sub_id, code FROM (
            SELECT s.vec_id, s.sub_id, c.pcid AS code,
                   ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub_id
                       ORDER BY {_SQD8.format(a='s.sub', b='c.cent')},
                                c.pcid) AS rk
            FROM rsubs s JOIN rcb c USING (sub_id)) WHERE rk = 1),
qres AS (SELECT p.vec_id AS query_id, p.cid,
                list_transform(range(1, 65), i -> p.v[i] - k.cv[i]) AS v
         FROM kp p JOIN kc1 k USING (cid)),
qrsubs AS (SELECT query_id, cid, s.sub_id,
                  v[s.sub_id * 8 + 1 : s.sub_id * 8 + 8] AS sub
           FROM qres, (SELECT UNNEST(range(0, 8)) AS sub_id) s),
rlut AS (SELECT q.query_id, q.cid, q.sub_id, c.pcid AS code,
                {_SQD8.format(a='q.sub', b='c.cent')} AS d2
         FROM qrsubs q JOIN rcb c USING (sub_id)),
ir_adc AS (SELECT l.query_id, a.vec_id AS got_id, SUM(l.d2) AS dist
           FROM ka a
           JOIN rcodes c ON c.vec_id = a.vec_id
           JOIN rlut l ON l.cid = a.cid
                      AND l.sub_id = c.sub_id AND l.code = c.code
           GROUP BY 1, 2),
ir5 AS (SELECT query_id, got_id FROM (
         SELECT query_id, got_id,
                ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY dist, got_id) AS rk
         FROM ir_adc) WHERE rk <= 5)
SELECT v.variant, t.nq AS n_queries, v.n_hits,
       ROUND(v.n_hits / t.nt, 4) AS recall
FROM tstat t CROSS JOIN (
    SELECT 'lsh_bucketed' AS variant, COUNT(*) AS n_hits
    FROM tr JOIN l5 ON tr.query_id = l5.query_id AND tr.true_id = l5.got_id
    UNION ALL
    SELECT 'ivf_fixed', COUNT(*)
    FROM tr JOIN if5 ON tr.query_id = if5.query_id AND tr.true_id = if5.got_id
    UNION ALL
    SELECT 'ivf_kmeans', COUNT(*)
    FROM tr JOIN ik5 ON tr.query_id = ik5.query_id AND tr.true_id = ik5.got_id
    UNION ALL
    SELECT 'pq_adc', COUNT(*)
    FROM tr JOIN pq5 ON tr.query_id = pq5.query_id AND tr.true_id = pq5.got_id
    UNION ALL
    SELECT 'ivf_pq', COUNT(*)
    FROM tr JOIN ip5 ON tr.query_id = ip5.query_id AND tr.true_id = ip5.got_id
    UNION ALL
    SELECT 'ivf_pq_residual', COUNT(*)
    FROM tr JOIN ir5 ON tr.query_id = ir5.query_id AND tr.true_id = ir5.got_id
) v
"""


@register("q_emb_ann_recall", oracle=_ANN_RECALL_ORACLE)
def q_emb_ann_recall(spark, sf_dir):
    """Recall@5 scoreboard of every ANN variant vs brute-force cosine, in
    one DataFrame job. ORACLE-GATED: every variant — LSH bucketing, IVF
    (fixed + 1-Lloyd-iteration k-means centroids), PQ/ADC, IVF-PQ, and
    residual IVF-PQ — is deterministic (L2 ties → lowest id, fixed seeds =
    lowest-id vectors), so the whole scoreboard is value-checked against a
    DuckDB unrolling of the same algorithms. One row per variant:
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


@register(
    "q_emb_hard_negatives",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, label AS query_label,
                      embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, label AS neighbor_label,
                 embedding::DOUBLE[] AS cv
          FROM embeddings WHERE vec_id >= 10),
    s AS (SELECT query_id, query_label, neighbor_id, neighbor_label,
                 list_cosine_similarity(qv, cv) AS sim
          FROM q CROSS JOIN c
          WHERE query_label != neighbor_label),
    r AS (SELECT s.*, ROW_NUMBER() OVER (
                     PARTITION BY query_id ORDER BY sim DESC, neighbor_id
                 ) AS rank
          FROM s)
    SELECT query_id, query_label, neighbor_id, neighbor_label,
           ROUND(sim, 4) AS cos_sim, rank
    FROM r WHERE rank <= 5
    """,
)
def q_emb_hard_negatives(spark, sf_dir):
    """Contrastive hard-negative mining (pipeline/similarity.hard_negatives):
    top-5 most-similar DIFFERENT-label vectors for each of 10 query vectors.
    Query side broadcast, corpus streams; the label filter lands before the
    ranking window."""
    from ..pipeline.similarity import hard_negatives

    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    c = emb.where(F.col("vec_id") >= 10)
    return hard_negatives(q, c, k=5)


@register(
    "q_emb_label_silhouette",
    oracle="""
    WITH e AS (SELECT vec_id, label, d - 1 AS dim,
                      CAST(embedding[d] AS DOUBLE) AS v
               FROM embeddings, (SELECT UNNEST(generate_series(1, 64)) AS d)),
    cent AS (SELECT label AS cent_label, dim, AVG(v) AS cv
             FROM e GROUP BY 1, 2),
    d2 AS (SELECT e.vec_id, e.label, c.cent_label,
                  SQRT(SUM((e.v - c.cv) * (e.v - c.cv))) AS dist
           FROM e JOIN cent c ON e.dim = c.dim GROUP BY 1, 2, 3),
    per_vec AS (SELECT vec_id, label,
                       MAX(CASE WHEN cent_label = label THEN dist END) AS a,
                       MIN(CASE WHEN cent_label != label THEN dist END) AS b
                FROM d2 GROUP BY 1, 2)
    SELECT label, ROUND(AVG((b - a) / GREATEST(a, b)), 4) AS silhouette,
           COUNT(*) AS n_vecs
    FROM per_vec GROUP BY 1
    """,
)
def q_emb_label_silhouette(spark, sf_dir):
    """Per-label simplified silhouette (pipeline/similarity.label_silhouette):
    embedding-space label-quality score. One posexplode+keyed-mean pass
    builds centroids, folded back to arrays and broadcast; per-vector
    distances are a broadcast loop over #labels rows — never corpus×corpus."""
    from ..pipeline.similarity import label_silhouette

    emb = load(spark, sf_dir, "embeddings")
    return label_silhouette(emb)


@register(
    "q_emb_matryoshka_recall",
    oracle="""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qs AS (SELECT vec_id, v FROM emb WHERE vec_id < 10),
    tr AS (
        SELECT query_id, true_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS true_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.v, c.v) DESC,
                                c.vec_id) AS rk
            FROM qs q CROSS JOIN emb c) WHERE rk <= 5
    ),
    t16 AS (
        SELECT query_id, true_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS true_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.v[1:16],
                                                       c.v[1:16]) DESC,
                                c.vec_id) AS rk
            FROM qs q CROSS JOIN emb c) WHERE rk <= 5
    ),
    t32 AS (
        SELECT query_id, true_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS true_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.v[1:32],
                                                       c.v[1:32]) DESC,
                                c.vec_id) AS rk
            FROM qs q CROSS JOIN emb c) WHERE rk <= 5
    ),
    stats AS (
        SELECT 16 AS dims,
               (SELECT COUNT(*) FROM t16 SEMI JOIN tr
                USING (query_id, true_id)) AS n_hits
        UNION ALL
        SELECT 32, (SELECT COUNT(*) FROM t32 SEMI JOIN tr
                    USING (query_id, true_id))
    )
    SELECT dims, n_hits,
           ROUND(CAST(n_hits AS DOUBLE)
                 / (SELECT COUNT(*) FROM tr), 4) AS recall
    FROM stats
    """,
)
def q_emb_matryoshka_recall(spark, sf_dir):
    """Matryoshka truncation evaluation: recall@5 of cosine top-k computed
    on the first 16 / 32 dimensions against the full-64-dim ground truth —
    the standard check before shipping truncated embeddings to cut ANN
    index cost (Kusupati et al., 'Matryoshka Representation Learning',
    NeurIPS 2022). Reuses the cosine_topk core per dim budget: query side
    broadcast, corpus streams, so each variant is one scan — and the
    truncated scans read FEWER bytes, exactly the production win being
    measured. Extension surface (no reference analogue)."""
    from ..pipeline.similarity import cosine_topk

    emb = load(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 10)

    def top5(dims):
        sl = lambda df: df.select(  # noqa: E731
            "vec_id", F.slice(F.col("embedding"), 1, dims).alias("embedding")
        )
        return cosine_topk(sl(qs), sl(emb), k=5).select(
            "query_id", F.col("neighbor_id")
        )

    truth = top5(64)
    out = None
    for dims in (16, 32):
        hits = (
            top5(dims).join(truth, ["query_id", "neighbor_id"], "left_semi")
            .agg(F.count("*").alias("n_hits"))
            .select(F.lit(dims).alias("dims"), "n_hits")
        )
        out = hits if out is None else out.unionByName(hits)
    n_truth = truth.agg(F.count("*").alias("__nt"))
    return out.crossJoin(n_truth).select(
        "dims", "n_hits",
        F.round(F.col("n_hits").cast("double") / F.col("__nt"), 4)
        .alias("recall"),
    )


@register(
    "q_emb_linear_probe",
    oracle="""
    WITH w AS (
        SELECT list_transform(range(0, 64),
                              i -> (((i * 37) % 21) - 10) / 10.0) AS wv
    ),
    s AS (
        SELECT label,
               ROUND(1.0 / (1.0 + EXP(-(0.1 + list_dot_product(
                   embedding::DOUBLE[], wv)))), 6) AS prob
        FROM embeddings CROSS JOIN w
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN prob >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pos,
           ROUND(AVG(prob), 6) AS avg_prob
    FROM s GROUP BY 1
    """,
)
def q_emb_linear_probe(spark, sf_dir):
    """Batch model inference over the embedding column: apply a trained
    linear probe (fixed-weight logistic classifier, the fasttext/quality-
    classifier deployment shape) to every vector and report per-label
    positive rates. The weight vector is a LITERAL (broadcast-free: it is
    inlined into the row-local expression), the dot product runs JVM-side
    via zip_with/aggregate in double precision, and the whole query is one
    map stage + one keyed agg — the exact shape batch inference should
    have at 100 TB (no shuffle before the per-label rollup, no UDF).
    Per-row probs are rounded BEFORE aggregation so both engines aggregate
    identical doubles (libm vs Math.exp last-ulp noise cannot reach the
    output). Extension surface (no reference analogue)."""
    emb = load(spark, sf_dir, "embeddings")
    weights = F.expr(
        "transform(sequence(0, 63), "
        "i -> (double(((i * 37) % 21) - 10)) / 10.0)"
    )
    logit = F.lit(0.1) + F.aggregate(
        F.zip_with(F.col("embedding"), weights,
                   lambda x, w: x.cast("double") * w),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6)
    return (
        emb.select("label", prob.alias("__p"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.sum(F.when(F.col("__p") >= 0.5, 1).otherwise(0))
            .cast("bigint").alias("n_pos"),
            F.round(F.avg("__p"), 6).alias("avg_prob"),
        )
    )


@register(
    "q_emb_semantic_dedup",
    oracle="""
    WITH RECURSIVE
    emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c0 AS (SELECT vec_id AS cid, v AS cv FROM emb WHERE vec_id < 8),
    ka1 AS (SELECT vec_id, v, cid FROM (
             SELECT e.vec_id, e.v, c.cid,
                    ROW_NUMBER() OVER (PARTITION BY e.vec_id
                        ORDER BY list_distance(e.v, c.cv), c.cid) AS rk
             FROM emb e CROSS JOIN c0 c) WHERE rk = 1),
    km1 AS (SELECT cid, dim, AVG(v[dim]) AS mv
            FROM ka1, range(1, 65) t(dim) GROUP BY 1, 2),
    kn1 AS (SELECT cid, list(mv ORDER BY dim) AS nv FROM km1 GROUP BY cid),
    kc1 AS (SELECT c0.cid, COALESCE(kn1.nv, c0.cv) AS cv
            FROM c0 LEFT JOIN kn1 USING (cid)),
    ka AS (SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                       ORDER BY list_distance(e.v, c.cv), c.cid) AS rk
            FROM emb e CROSS JOIN kc1 c) WHERE rk = 1),
    pairs AS (
        SELECT a.cid, a.vec_id AS id_a, b.vec_id AS id_b
        FROM ka a JOIN ka b ON a.cid = b.cid AND a.vec_id < b.vec_id
        WHERE ROUND(list_cosine_similarity(a.v, b.v), 4) >= 0.3
    ),
    sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT src AS id FROM sym),
    walk(id, comp) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT s.dst, w.comp FROM walk w JOIN sym s ON s.src = w.id
    ),
    cc AS (SELECT id, MIN(comp) AS component FROM walk GROUP BY id),
    mem AS (SELECT cid, COUNT(*) AS n_vectors FROM ka GROUP BY 1),
    pc AS (SELECT cid, COUNT(*) AS n_dup_pairs FROM pairs GROUP BY 1),
    gr AS (
        SELECT ka.cid, COUNT(*) AS n_dup_members,
               COUNT(DISTINCT cc.component) AS n_groups
        FROM cc JOIN ka ON ka.vec_id = cc.id GROUP BY 1
    )
    SELECT mem.cid AS centroid_id,
           CAST(mem.n_vectors AS BIGINT) AS n_vectors,
           CAST(COALESCE(pc.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs,
           CAST(COALESCE(gr.n_dup_members, 0) AS BIGINT) AS n_dup_members,
           CAST(COALESCE(gr.n_groups, 0) AS BIGINT) AS n_groups,
           CAST(COALESCE(gr.n_dup_members, 0)
                - COALESCE(gr.n_groups, 0) AS BIGINT) AS n_pruned
    FROM mem
    LEFT JOIN pc USING (cid)
    LEFT JOIN gr USING (cid)
    """,
)
def q_emb_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic deduplication (Abbas et al., 'SemDeDup:
    Data-efficient learning at web-scale through semantic deduplication',
    2023): cluster the embedding space (k-means, the oracle-tested coarse
    quantizer), find near-duplicate pairs ONLY within each cluster (exact
    cosine >= tau over cluster-local candidates — the blocking that makes
    semantic dedup tractable at corpus scale), collapse pairs into
    duplicate groups (connected components, min-id representative), and
    report the per-cluster pruning ledger: vectors, dup pairs, dup-group
    members, groups, and how many vectors pruning would remove.

    Scale shape: centroids broadcast (bounded by k); the pair join is
    keyed by centroid_id so fan-out is cluster-local; components run the
    iterative min-label loop (per-round checkpoint, scalar convergence
    witness); every summary agg is keyed by centroid_id. The whole
    pipeline composes three independently oracle-proven pieces."""
    from ..pipeline.dedup import connected_components
    from ..pipeline.similarity import (
        _dot, _norm, kmeans_assign, kmeans_centroids,
    )

    emb = load(spark, sf_dir, "embeddings")
    cent = kmeans_centroids(emb, k=8, iters=1)
    # assigned feeds the pair join (both sides), the membership rollup,
    # and the component attribution join — checkpoint: one compute
    # the norm is a per-VECTOR quantity: compute it once per row here,
    # not inside the pair expression where it would be re-folded per PAIR
    # (measured 107 s -> 51 s median at the 10x corpus — the pair join evaluates
    # O(cluster^2) cosines and the two norm folds tripled its work)
    assigned = (
        kmeans_assign(emb, cent)
        .withColumn("__nrm", _norm(F.col("embedding")))
        .localCheckpoint(eager=False)
    )
    a = assigned.select("centroid_id", F.col("vec_id").alias("id_a"),
                        F.col("embedding").alias("__va"),
                        F.col("__nrm").alias("__na"))
    b = assigned.select("centroid_id", F.col("vec_id").alias("id_b"),
                        F.col("embedding").alias("__vb"),
                        F.col("__nrm").alias("__nb"))
    cs = F.round(
        _dot(F.col("__va"), F.col("__vb"))
        / (F.col("__na") * F.col("__nb")), 4,
    )
    pairs = (
        a.join(b, "centroid_id")
        .where(F.col("id_a") < F.col("id_b"))
        .select("centroid_id", "id_a", "id_b", cs.alias("__cs"))
        .where(F.col("__cs") >= 0.3)
        .localCheckpoint(eager=False)  # feeds edge list + pair rollup
    )
    cc = connected_components(pairs.select("id_a", "id_b"))
    members = assigned.groupBy("centroid_id").agg(
        F.count("*").alias("n_vectors"))
    pair_counts = pairs.groupBy("centroid_id").agg(
        F.count("*").alias("n_dup_pairs"))
    groups = (
        cc.join(assigned.select(F.col("vec_id").alias("id"), "centroid_id"),
                "id")
        .groupBy("centroid_id")
        .agg(F.count("*").alias("n_dup_members"),
             F.countDistinct("component").alias("n_groups"))
    )
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("bigint")  # noqa: E731
    return (
        members
        .join(pair_counts, "centroid_id", "left")
        .join(groups, "centroid_id", "left")
        .select(
            "centroid_id",
            F.col("n_vectors").cast("bigint").alias("n_vectors"),
            z("n_dup_pairs").alias("n_dup_pairs"),
            z("n_dup_members").alias("n_dup_members"),
            z("n_groups").alias("n_groups"),
            (z("n_dup_members") - z("n_groups")).alias("n_pruned"),
        )
    )


# 64-dim squared distance as an explicit index-order sum (the _SQD8 pattern
# at full width) — matches similarity._sqdist's left-associated fold exactly.
_SQD64 = ("list_aggregate(list_transform(range(1, 65), "
          "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), 'sum')")


def _kcenter_sql(k: int) -> str:
    """CTE chain for greedy k-center selection (seed = lowest vec_id; each
    round adds the farthest-from-selected point, ties → lowest id).
    Emits CTEs ``sel0`` … ``sel{k-1}``; the final selection is
    ``sel{k-1}`` (ord, cid, cv)."""
    d2 = _SQD64.format(a="e.v", b="s.cv")
    parts = [
        "sel0 AS (SELECT 0 AS ord, vec_id AS cid, v AS cv FROM emb"
        " WHERE vec_id = (SELECT MIN(vec_id) FROM emb))",
    ]
    for r in range(1, k):
        parts.append(
            f"md{r} AS (SELECT e.vec_id, MIN({d2}) AS md"
            f" FROM emb e CROSS JOIN sel{r - 1} s GROUP BY 1)")
        parts.append(
            f"pk{r} AS (SELECT vec_id FROM md{r}"
            f" ORDER BY md DESC, vec_id LIMIT 1)")
        parts.append(
            f"sel{r} AS (SELECT * FROM sel{r - 1} UNION ALL"
            f" SELECT {r} AS ord, e.vec_id, e.v FROM emb e"
            f" JOIN pk{r} USING (vec_id))")
    return ",\n".join(parts)


@register(
    "q_emb_kcenter_coreset",
    oracle=f"""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    {_kcenter_sql(8)},
    assign AS (
        SELECT vec_id, d2, cid FROM (
            SELECT e.vec_id, {_SQD64.format(a='e.v', b='s.cv')} AS d2, s.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                       ORDER BY {_SQD64.format(a='e.v', b='s.cv')}, s.cid
                   ) AS rk
            FROM emb e CROSS JOIN sel7 s) WHERE rk = 1
    )
    SELECT s.ord AS selection_order, s.cid AS vec_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           ROUND(SQRT(MAX(a.d2)), 4) AS radius
    FROM assign a JOIN sel7 s USING (cid)
    GROUP BY 1, 2
    """,
)
def q_emb_kcenter_coreset(spark, sf_dir):
    """Greedy k-center coreset selection (pipeline/similarity.
    kcenter_select, Gonzalez 1985): 8 maximally-diverse vectors picked
    farthest-point-first, then every corpus vector assigned to its nearest
    selected point (ties → lowest id) — per-cell occupancy and covering
    radius. The oracle unrolls all 7 greedy rounds as CTEs with the exact
    left-associated index-order distance sum, so the full iterative
    selection is value-checked. Scale shape: the selected set is
    driver-held (bounded-collect family), min-distance and assignment are
    row-local folds over a ≤k literal array — k corpus scans, no join, no
    window.

    Precondition: the corpus must hold >= 8 DISTINCT vectors. The engine
    guards the degenerate case (kcenter_select stops early when the max
    min-distance hits 0 rather than re-selecting a duplicate), but the
    oracle's 7 unrolled CTE rounds do not — on a corpus with < 8 distinct
    vectors the two sides would legitimately disagree. All shipped
    testdata SFs satisfy it (the driver corpus has thousands of distinct
    embeddings)."""
    from ..pipeline.similarity import _sqdist, kcenter_select

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("__v")
    )
    sel = kcenter_select(emb, k=8, vec_col="__v")
    rows = sorted(sel.collect(), key=lambda r: r["selection_order"])
    scents = F.array(*[
        F.struct(
            F.lit(r["vec_id"]).alias("cid"),
            F.array(*[F.lit(float(x)) for x in r["__v"]]).alias("cv"),
        )
        for r in rows
    ])
    m = F.array_min(
        F.transform(
            scents,
            lambda c: F.struct(
                _sqdist(F.col("__v"), c["cv"]).alias("d2"),
                c["cid"].alias("cid"),
            ),
        )
    )
    order = spark.createDataFrame(
        [(r["selection_order"], r["vec_id"]) for r in rows],
        "selection_order int, cid bigint",
    )
    return (
        emb.select("vec_id", m["d2"].alias("__d2"), m["cid"].alias("cid"))
        .groupBy("cid")
        .agg(
            F.count("*").alias("n_members"),
            F.round(F.sqrt(F.max("__d2")), 4).alias("radius"),
        )
        .join(F.broadcast(order), "cid")
        .select(
            "selection_order",
            F.col("cid").alias("vec_id"),
            "n_members",
            "radius",
        )
    )


def _pca_power_sql(iters: int) -> str:
    """CTE chain mirroring pipeline/similarity.pca_power: centered matrix,
    ``iters`` matrix-free power rounds with per-dim sums rounded to 6 at
    each round boundary, index-order normalization folds. Emits
    ``xc`` / ``nn`` / per-round ``v{r}`` / ``nrm{iters}``."""
    parts = [
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM emb)",
        "mu AS (SELECT dim, ROUND(AVG(v[dim]), 6) AS m"
        " FROM emb, range(1, 65) t(dim) GROUP BY 1)",
        "muv AS (SELECT list(m ORDER BY dim) AS mu FROM mu)",
        "xc AS (SELECT list_transform(range(1, 65), i -> v[i] - mu[i]) AS x"
        " FROM emb, muv)",
        "v0 AS (SELECT list_transform(range(1, 65),"
        " i -> CASE WHEN i = 1 THEN 1.0 ELSE 0.0 END) AS v)",
    ]
    for r in range(1, iters + 1):
        parts.append(
            f"s{r} AS (SELECT x, list_aggregate(list_transform("
            f"range(1, 65), i -> x[i] * v[i]), 'sum') AS s"
            f" FROM xc, v{r - 1})")
        parts.append(
            f"ud{r} AS (SELECT dim, ROUND(SUM(s * x[dim]) / ANY_VALUE(n),"
            f" 6) AS u FROM s{r}, nn, range(1, 65) t(dim) GROUP BY 1)")
        parts.append(
            f"u{r} AS (SELECT list(u ORDER BY dim) AS u FROM ud{r})")
        parts.append(
            f"nrm{r} AS (SELECT u, SQRT(list_aggregate(list_transform(u,"
            f" y -> y * y), 'sum')) AS nm FROM u{r})")
        parts.append(
            f"v{r} AS (SELECT list_transform(u, y -> y / nm) AS v"
            f" FROM nrm{r})")
    return ",\n".join(parts)


@register(
    "q_emb_pca_power",
    oracle=f"""
    WITH emb AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
    {_pca_power_sql(3)},
    vard AS (SELECT dim, ROUND(AVG(x[dim] * x[dim]), 6) AS vr
             FROM xc, range(1, 65) t(dim) GROUP BY 1),
    tot AS (SELECT list_aggregate(list(vr ORDER BY dim), 'sum') AS tv
            FROM vard)
    SELECT t.dim, ROUND(v3.v[t.dim], 4) AS loading,
           ROUND(nrm3.nm, 6) AS eigenvalue,
           ROUND(nrm3.nm / tot.tv, 4) AS ev_share
    FROM range(1, 65) t(dim), v3, nrm3, tot
    """,
)
def q_emb_pca_power(spark, sf_dir):
    """Top principal component by matrix-free power iteration
    (pipeline/similarity.pca_power; Mu & Viswanath 2018 dominant-direction
    hygiene): 3 rounds of v ← normalize(Cv) with per-dim sums rounded at
    every round boundary so the whole iteration is engine-reproducible;
    the oracle unrolls all 3 rounds, the centering pass, and the variance
    total as CTEs with index-order folds. Output: per-dim loading of the
    unit eigenvector + the eigenvalue and its share of total variance."""
    from ..pipeline.similarity import pca_power

    emb = load(spark, sf_dir, "embeddings")
    return pca_power(emb, iters=3)


@register(
    "q_emb_sq8_topk",
    oracle=f"""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    rng AS (SELECT dim, MIN(v[dim]) AS lo, MAX(v[dim]) AS hi
            FROM emb, range(1, 65) t(dim) GROUP BY 1),
    rv AS (SELECT list(lo ORDER BY dim) AS lov, list(hi ORDER BY dim) AS hiv
           FROM rng),
    rec AS (
        SELECT vec_id, list_transform(range(1, 65),
            i -> CASE WHEN hiv[i] = lov[i] THEN lov[i]
                 ELSE lov[i] + ROUND((v[i] - lov[i]) / (hiv[i] - lov[i])
                      * 255, 0) * (hiv[i] - lov[i]) / 255 END) AS r
        FROM emb, rv
    ),
    q AS (SELECT vec_id AS query_id, v FROM emb WHERE vec_id < 10),
    sq AS (
        SELECT query_id, neighbor_id, d2, rk FROM (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   {_SQD64.format(a='q.v', b='c.r')} AS d2,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                       ORDER BY {_SQD64.format(a='q.v', b='c.r')},
                                c.vec_id) AS rk
            FROM q CROSS JOIN rec c) WHERE rk <= 5
    ),
    ex AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                       ORDER BY {_SQD64.format(a='q.v', b='c.v')},
                                c.vec_id) AS rk
            FROM q CROSS JOIN emb c) WHERE rk <= 5
    ),
    rc AS (
        SELECT s.query_id, CAST(COUNT(e.neighbor_id) AS BIGINT) AS recall5
        FROM sq s LEFT JOIN ex e
          ON s.query_id = e.query_id AND s.neighbor_id = e.neighbor_id
        GROUP BY 1
    )
    SELECT s.query_id, CAST(s.rk AS INT) AS rank, s.neighbor_id,
           ROUND(s.d2, 4) AS sq_d2, rc.recall5
    FROM sq s JOIN rc USING (query_id)
    """,
)
def q_emb_sq8_topk(spark, sf_dir):
    """SQ8 scalar-quantization ANN (the faiss-SQ8 family member, completing
    LSH/IVF/PQ/IVF-PQ): per-dim [min,max] trained on the corpus (exact —
    MIN/MAX are order-independent, no rounding anywhere in training),
    vectors quantized to 256 levels, candidates ranked by asymmetric
    query-to-reconstruction L2 (ties → lowest id), with in-query recall@5
    vs the exact scan. Reconstruction is a row-local transform over
    broadcast-literal range arrays — codes live next to the vectors at
    scale, the scan shape is cosine_topk's (bounded query side broadcast,
    corpus streams). Oracle mirrors the quantize→reconstruct→rank chain
    with index-order distance folds."""
    from pyspark.sql import Window

    from ..pipeline.dedup import spread_partitions
    from ..pipeline.similarity import _sqdist

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("__x")
    )
    rng_rows = (
        emb.select(F.posexplode("__x").alias("__d", "__val"))
        .groupBy("__d")
        .agg(F.min("__val").alias("lo"), F.max("__val").alias("hi"))
        .collect()
    )
    dims = max(r["__d"] for r in rng_rows) + 1
    lo = [0.0] * dims
    hi = [0.0] * dims
    for r in rng_rows:
        lo[r["__d"]], hi[r["__d"]] = r["lo"], r["hi"]
    lo_lit = F.array(*[F.lit(x) for x in lo])
    hi_lit = F.array(*[F.lit(x) for x in hi])

    def _rec(x, i):
        l_ = F.element_at(lo_lit, i + 1)
        h = F.element_at(hi_lit, i + 1)
        return F.when(h == l_, l_).otherwise(
            l_ + F.round((x - l_) / (h - l_) * 255, 0) * (h - l_) / 255
        )

    rec = spread_partitions(emb, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform("__x", _rec).alias("__r"),
    )
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("__x").alias("__qv")
    )
    w = Window.partitionBy("query_id").orderBy("__d2", "neighbor_id")
    sq = (
        F.broadcast(q).crossJoin(rec)
        .select("query_id", "neighbor_id",
                _sqdist(F.col("__qv"), F.col("__r")).alias("__d2"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
    )
    ex = (
        F.broadcast(q).crossJoin(
            spread_partitions(emb, "vec_id").select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("__x").alias("__cv"),
            )
        )
        .select("query_id", "neighbor_id",
                _sqdist(F.col("__qv"), F.col("__cv")).alias("__d2"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("query_id", "neighbor_id")
    )
    rc = (
        sq.join(ex, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("recall5"))
    )
    # a query whose sq8 top-5 shares nothing with exact would drop out of
    # the semi-join count — restore it at 0 via the query side
    rc = (
        q.select("query_id")
        .join(rc, "query_id", "left")
        .select("query_id", F.coalesce("recall5", F.lit(0)).alias("recall5"))
    )
    return sq.select(
        "query_id", F.col("rank").cast("int").alias("rank"), "neighbor_id",
        F.round("__d2", 4).alias("sq_d2"),
    ).join(rc, "query_id")


@register(
    "q_emb_abtt_whiten",
    oracle=f"""
    WITH emb AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
    {_pca_power_sql(3)},
    uvec AS (SELECT list_transform(v, y -> ROUND(y, 4)) AS u FROM v3),
    sc AS (
        SELECT x, list_aggregate(list_transform(range(1, 65),
                   i -> x[i] * u[i]), 'sum') AS s
        FROM xc, uvec
    ),
    vd AS (
        SELECT dim,
               ROUND(SUM(x[dim] * x[dim]) / ANY_VALUE(n), 6) AS vb,
               ROUND(SUM((x[dim] - s * u[dim]) * (x[dim] - s * u[dim]))
                     / ANY_VALUE(n), 6) AS va
        FROM sc, uvec, nn, range(1, 65) t(dim) GROUP BY 1
    ),
    an AS (
        SELECT MAX(vb) / (list_aggregate(list(vb ORDER BY dim), 'sum')
                          / 64) AS ab,
               MAX(va) / (list_aggregate(list(va ORDER BY dim), 'sum')
                          / 64) AS aa
        FROM vd
    )
    SELECT vd.dim, vd.vb AS var_before, vd.va AS var_after,
           an.ab AS anis_before, an.aa AS anis_after
    FROM vd, an
    """,
)
def q_emb_abtt_whiten(spark, sf_dir):
    """All-but-the-top whitening diagnostics (pipeline/similarity.
    abtt_whiten; Mu & Viswanath 2018): project out pca_power's top
    direction and report per-dim variance before/after plus the
    anisotropy ratio both ways — the isotropy check before cosine
    retrieval. Composes the value-checked pca chain; BOTH variance
    totals come from one Arrow kernel pass; the ratios are unrounded
    index-order arithmetic over rounded per-dim variances (engine-exact
    by construction)."""
    from ..pipeline.similarity import abtt_whiten

    emb = load(spark, sf_dir, "embeddings")
    return abtt_whiten(emb, iters=3)


def _logreg_sql(iters: int, lr: float = 0.5) -> str:
    """CTE chain mirroring pipeline/similarity.logreg_train: augmented
    (x ‖ [1.0]) vectors, zero-init weights, per-step σ rounded to 8 and
    per-row per-dim gradient contributions as 1e8-scaled BIGINTs (exact
    sums), weight updates with the same IEEE op order the driver applies.
    Emits ``aug`` / ``nn`` / per-step ``w{r}`` CTEs."""
    z = "list_aggregate(list_transform(range(1, 66), i -> x[i] * w[i])," \
        " 'sum')"
    parts = [
        "aug AS (SELECT list_concat(embedding::DOUBLE[], [1.0]) AS x,"
        " CAST(label % 2 AS DOUBLE) AS y FROM embeddings)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM aug)",
        "w0 AS (SELECT list_transform(range(1, 66), i -> 0.0) AS w)",
    ]
    for r in range(1, iters + 1):
        parts.append(
            f"p{r} AS (SELECT x, y,"
            f" ROUND(1 / (1 + EXP(-({z}))), 8) AS p"
            f" FROM aug, w{r - 1})")
        parts.append(
            f"g{r} AS (SELECT dim, SUM(CAST(ROUND(x[dim] * (p - y) * 1e8,"
            f" 0) AS BIGINT)) AS g8"
            f" FROM p{r}, range(1, 66) t(dim) GROUP BY 1)")
        parts.append(
            f"w{r} AS (SELECT list(wv ORDER BY dim) AS w FROM"
            f" (SELECT g.dim, w[g.dim] - {lr} *"
            f" (CAST(g.g8 AS DOUBLE) / 1e8 / n) AS wv"
            f" FROM g{r} g, w{r - 1}, nn))")
    return ",\n".join(parts)


@register(
    "q_emb_logreg_train",
    oracle=f"""
    WITH {_logreg_sql(3)},
    pf AS (SELECT y, ROUND(1 / (1 + EXP(-(list_aggregate(
               list_transform(range(1, 66), i -> x[i] * w[i]), 'sum')))),
               8) AS p
           FROM aug, w3),
    acc AS (SELECT SUM(CASE WHEN CAST(p >= 0.5 AS INT) = CAST(y AS INT)
                            THEN 1 ELSE 0 END) / ANY_VALUE(nn.n) AS a
            FROM pf, nn)
    SELECT t.dim, w3.w[t.dim] AS weight, acc.a AS accuracy
    FROM range(1, 66) t(dim), w3, acc
    """,
)
def q_emb_logreg_train(spark, sf_dir):
    """In-engine quality-classifier TRAINING (pipeline/similarity.
    logreg_train): 3 full-batch gradient-descent steps of binary logistic
    regression over the embedding column (y = label % 2, bias as an
    augmented constant dim). Per step: one corpus fold + one keyed (dim)
    agg collected to the driver — the MLlib shape; σ rounded to 8 (libm),
    gradient contributions carried as 1e8-scaled BIGINTs (rule 12), so
    the oracle's 3 unrolled CTE steps reproduce the weights BIT-FOR-BIT
    (emitted unrounded, like the accuracy ratio)."""
    from ..pipeline.similarity import logreg_train

    emb = load(spark, sf_dir, "embeddings")
    return logreg_train(emb, iters=3)


@register(
    "q_emb_knn_eval",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, label AS true_label,
                      embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 50),
    c AS (SELECT vec_id AS neighbor_id, label AS neighbor_label,
                 embedding::DOUBLE[] AS cv
          FROM embeddings WHERE vec_id >= 50),
    r AS (SELECT query_id, true_label, neighbor_label,
                 ROW_NUMBER() OVER (
                     PARTITION BY query_id
                     ORDER BY list_cosine_similarity(qv, cv) DESC,
                              neighbor_id) AS rank
          FROM q CROSS JOIN c),
    v AS (SELECT query_id, true_label, neighbor_label, COUNT(*) AS cnt
          FROM r WHERE rank <= 5 GROUP BY 1, 2, 3),
    p AS (SELECT query_id, true_label, neighbor_label AS pred FROM (
            SELECT v.*, ROW_NUMBER() OVER (
                PARTITION BY query_id
                ORDER BY cnt DESC, neighbor_label) AS rn
            FROM v) WHERE rn = 1)
    SELECT true_label AS label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN pred = true_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           ROUND(CAST(SUM(CASE WHEN pred = true_label THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 4) AS accuracy
    FROM p GROUP BY 1
    """,
)
def q_emb_knn_eval(spark, sf_dir):
    """Leave-out kNN label-accuracy evaluation — the standard embedding-
    quality probe (kNN eval in retrieval/representation-learning papers;
    the classifier-free twin of q_emb_logreg_train): each held-out query
    vector (vec_id < 50) is classified by the majority label of its 5
    cosine-nearest corpus vectors, and the per-label accuracy is the
    value-checked output. Deterministic end to end: neighbor rank breaks
    ties (sim desc, neighbor_id asc), the vote breaks ties
    (count desc, label asc) — no randomness, no float thresholds.

    Scale shape: the bounded query side broadcasts through the shared
    _cosine_ranked core (corpus streams, no corpus shuffle — the
    q_emb_cosine_topk scan); the vote and the accuracy rollup are keyed
    aggs over ≤ |queries|·5 rows."""
    from pyspark.sql import Window

    from ..pipeline.similarity import _cosine_ranked

    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 50)
    c = emb.where(F.col("vec_id") >= 50)
    nn = _cosine_ranked(
        q, c, 5, "vec_id", "embedding", 4,
        extra_q={"label": "true_label"},
        extra_c={"label": "neighbor_label"},
    )
    votes = nn.groupBy("query_id", "true_label", "neighbor_label").agg(
        F.count("*").alias("cnt"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cnt").desc(), F.col("neighbor_label").asc())
    pred = votes.withColumn("rn", F.row_number().over(w)) \
                .where(F.col("rn") == 1)
    correct = F.when(F.col("neighbor_label") == F.col("true_label"), 1) \
               .otherwise(0)
    return pred.groupBy(F.col("true_label").alias("label")).agg(
        F.count("*").cast("bigint").alias("n_queries"),
        F.sum(correct).cast("bigint").alias("n_correct"),
        F.round(F.sum(correct).cast("double") / F.count("*"), 4)
        .alias("accuracy"),
    )


def _mmr_sql(rounds: int = 5, lam: float = 0.5) -> str:
    """CTE chain mirroring q_emb_mmr_topk's greedy: cand (top-10 cosine,
    simq rounded 4), pair (candidate-candidate sims rounded 4), then
    ``rounds`` unrolled picks — round 1 maximizes simq, round t maximizes
    lam*simq - (1-lam)*max(sim to selected), ties -> lowest nid. All
    greedy arithmetic runs over the ROUNDED sims, so both engines compute
    bit-identical scores (0.5*a - 0.5*b of identical doubles)."""
    parts = [
        """q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 5)""",
        """c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv
               FROM embeddings WHERE vec_id >= 5)""",
        """cand AS (SELECT query_id, nid, simq FROM (
            SELECT q.query_id, c.nid,
                   ROUND(list_cosine_similarity(q.qv, c.cv), 4) AS simq,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.qv, c.cv) DESC,
                                c.nid) AS rk
            FROM q CROSS JOIN c) WHERE rk <= 10)""",
        """pair AS (SELECT a.query_id, a.nid AS ida, b.nid AS idb,
                   ROUND(list_cosine_similarity(ea.cv, eb.cv), 4) AS sab
            FROM cand a
            JOIN cand b ON a.query_id = b.query_id AND a.nid <> b.nid
            JOIN c ea ON ea.nid = a.nid
            JOIN c eb ON eb.nid = b.nid)""",
        f"""pick1 AS (SELECT query_id, nid, simq,
                   {lam} * simq AS mmr_score, 1 AS pick_rank FROM (
            SELECT cand.*, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY simq DESC, nid) AS rn FROM cand) WHERE rn = 1)""",
        "acc1 AS (SELECT * FROM pick1)",
    ]
    for t in range(2, rounds + 1):
        parts.append(f"""sc{t} AS (
            SELECT c.query_id, c.nid, c.simq,
                   {lam} * c.simq - {1 - lam} * MAX(pr.sab) AS mmr_score
            FROM cand c
            ANTI JOIN acc{t - 1} s
              ON s.query_id = c.query_id AND s.nid = c.nid
            JOIN acc{t - 1} sel ON sel.query_id = c.query_id
            JOIN pair pr ON pr.query_id = c.query_id
                        AND pr.ida = c.nid AND pr.idb = sel.nid
            GROUP BY 1, 2, 3)""")
        parts.append(f"""pick{t} AS (
            SELECT query_id, nid, simq, mmr_score, {t} AS pick_rank FROM (
                SELECT sc{t}.*, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY mmr_score DESC, nid) AS rn
                FROM sc{t}) WHERE rn = 1)""")
        parts.append(f"""acc{t} AS (
            SELECT * FROM acc{t - 1} UNION ALL SELECT * FROM pick{t})""")
    return ",\n".join(parts)


@register(
    "q_emb_mmr_topk",
    oracle=f"""
    WITH {_mmr_sql(5)}
    SELECT query_id, CAST(pick_rank AS INT) AS pick_rank,
           nid AS neighbor_id, ROUND(mmr_score, 5) AS mmr_score, simq
    FROM acc5
    """,
)
def q_emb_mmr_topk(spark, sf_dir):
    """Maximal-marginal-relevance diversified retrieval (Carbonell &
    Goldstein 1998) — the re-rank step between ANN candidate generation
    and serving: 5 query vectors take their top-10 cosine candidates,
    then greedily pick 5 with score = λ·sim(q,d) − (1−λ)·max_{{s∈S}}
    sim(d,s), λ=0.5 — relevance minus redundancy. Deterministic: both
    sims round to 4 BEFORE the greedy (the arithmetic over identical
    rounded doubles is bit-identical in any engine), ties → lowest
    neighbor id; the oracle unrolls all 5 picks as CTEs. The emitted
    score rounds at FIVE decimals: 0.5·(4dp value) is a multiple of
    5e-5 — a 5-decimal grid point — whereas rounding it back to 4
    decimals sits exactly ON the half-way tie whenever simq's last
    digit is odd (hit at sf0.1: 0.5·0.4065, HALF_UP vs binary
    round-half-away disagreed).

    Scale shape: candidate generation is the cosine_topk scan (bounded
    query side broadcast, corpus streams); everything after operates on
    ≤ |queries|·10 rows (candidate-pair sims are 10×10 per query,
    computed once), so the greedy runs over a bounded-by-construction
    working set — the shape of any production re-ranker.

    OPTIMIZED (r11 optimization round, guide §8 "decide with small
    rows"): the 5 greedy rounds used to be UNROLLED as distributed ops
    (5× anti-join + pair join + window + union over ≤50 rows), a ~20-
    stage lineage whose planning + tiny-data exchanges cost ~5 s at
    sf0.1 while the actual corpus work (candidate scan) is 0.4 s. The
    greedy is inherently sequential and its working set is bounded by
    construction (≤ |queries|·10 candidates, ≤ |queries|·10·9 pair
    sims), so per scale.md rule 3 it now runs driver-side over the two
    collected tables. ALL float arithmetic that feeds the result stays
    in Spark or is IEEE-exact: simq/sab are Spark-rounded BEFORE
    collect, the greedy computes only 0.5*x - 0.5*max(...) (identical
    IEEE doubles in either runtime), and the emitted 5-decimal round is
    applied by Spark on the returned frame. Measured: 5.3 s → ~0.8 s
    standalone; the oracle (rows+schema+hash) gates equality at 3 SFs."""
    from ..pipeline.similarity import _cosine_ranked, _dot, _norm

    lam = 0.5
    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    c = emb.where(F.col("vec_id") >= 5)
    cand_rows = (
        _cosine_ranked(q, c, 10, "vec_id", "embedding", 4)
        .select("query_id", F.col("neighbor_id").alias("nid"),
                F.col("cos_sim").alias("simq"))
        .collect()  # bounded: ≤ |queries|·10 = 50 rows (rule 3)
    )
    by_q: dict = {}
    for r in cand_rows:
        by_q.setdefault(r.query_id, []).append((r.nid, r.simq))
    nids = sorted({r.nid for r in cand_rows})
    pair_list = [
        (qid, a2, b2)
        for qid, cands in by_q.items()
        for a2, _ in cands
        for b2, _ in cands
        if a2 != b2
    ]
    # candidate-candidate sims: fetch the ≤50 candidate vectors with one
    # pushed-down point scan, expand the bounded pair list locally, and
    # run the SAME Spark expressions (zip_with/aggregate fold + HALF_UP
    # round) over the local relation — Spark arithmetic, zero shuffles,
    # never a Python float-rounding reimplementation
    vec_rows = (
        c.where(F.col("vec_id").isin(nids))
        .select("vec_id", "embedding").collect()  # bounded: ≤50 rows
    )
    vec = {r.vec_id: r.embedding for r in vec_rows}
    sab_rows = spark.createDataFrame(
        [(qid, a2, b2, vec[a2], vec[b2]) for qid, a2, b2 in pair_list],
        "query_id long, ida long, idb long, "
        "va array<float>, vb array<float>",
    ).select(
        "query_id", "ida", "idb",
        F.round(
            _dot(F.col("va").cast("array<double>"),
                 F.col("vb").cast("array<double>"))
            / (_norm(F.col("va")) * _norm(F.col("vb"))), 4).alias("sab"),
    ).collect()  # bounded: ≤ |queries|·10·9 = 450 rows
    sab = {(r.query_id, r.ida, r.idb): r.sab for r in sab_rows}
    out = []
    for qid in by_q:
        cands = by_q[qid]
        nid, simq = max(cands, key=lambda t: (t[1], -t[0]))
        out.append((qid, 1, nid, lam * simq, simq))
        sel = [nid]
        for t in range(2, 6):
            best = None
            for n, s in cands:
                if n in sel:
                    continue
                score = lam * s - (1 - lam) * max(
                    sab[(qid, n, b2)] for b2 in sel)
                if best is None or (score, -n) > (best[0], -best[1]):
                    best = (score, n, s)
            if best is None:
                break
            out.append((qid, t, best[1], best[0], best[2]))
            sel.append(best[1])
    res = spark.createDataFrame(
        out, "query_id long, pick_rank int, neighbor_id long, "
             "mmr_score double, simq double")
    return res.select(
        "query_id", "pick_rank", "neighbor_id",
        F.round("mmr_score", 5).alias("mmr_score"), "simq",
    )


_BQ_PACK = ("CAST(list_aggregate(list_transform(range(1, 33), "
            "i -> CASE WHEN {v}[i + {off}] > 0 THEN (1::BIGINT << (i - 1)) "
            "ELSE 0::BIGINT END), 'sum') AS BIGINT)")


@register(
    "q_emb_bq_topk",
    oracle=f"""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pk AS (
        SELECT vec_id, v,
               COALESCE({_BQ_PACK.format(v='v', off=0)}, 0) AS w0,
               COALESCE({_BQ_PACK.format(v='v', off=32)}, 0) AS w1
        FROM emb
    ),
    q AS (SELECT vec_id AS query_id, v, w0, w1 FROM pk WHERE vec_id < 10),
    cand AS (
        SELECT query_id, neighbor_id, hamming, cv FROM (
            SELECT q.query_id, c.vec_id AS neighbor_id, c.v AS cv,
                   CAST(bit_count(xor(q.w0, c.w0))
                        + bit_count(xor(q.w1, c.w1)) AS INT) AS hamming,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                       ORDER BY bit_count(xor(q.w0, c.w0))
                                + bit_count(xor(q.w1, c.w1)),
                                c.vec_id) AS rk
            FROM q CROSS JOIN pk c) WHERE rk <= 20
    ),
    rr AS (
        SELECT query_id, neighbor_id, hamming, d2, rk FROM (
            SELECT cand.query_id, cand.neighbor_id, cand.hamming,
                   {_SQD64.format(a='q.v', b='cand.cv')} AS d2,
                   ROW_NUMBER() OVER (PARTITION BY cand.query_id
                       ORDER BY {_SQD64.format(a='q.v', b='cand.cv')},
                                cand.neighbor_id) AS rk
            FROM cand JOIN q USING (query_id)) WHERE rk <= 5
    ),
    ex AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                       ORDER BY {_SQD64.format(a='q.v', b='c.v')},
                                c.vec_id) AS rk
            FROM q CROSS JOIN emb c) WHERE rk <= 5
    ),
    rc AS (
        SELECT r.query_id, CAST(COUNT(e.neighbor_id) AS BIGINT) AS recall5
        FROM rr r LEFT JOIN ex e
          ON r.query_id = e.query_id AND r.neighbor_id = e.neighbor_id
        GROUP BY 1
    )
    SELECT r.query_id, CAST(r.rk AS INT) AS rank, r.neighbor_id, r.hamming,
           ROUND(r.d2, 4) AS bq_d2, rc.recall5
    FROM rr r JOIN rc USING (query_id)
    """,
)
def q_emb_bq_topk(spark, sf_dir):
    """Binary-quantization ANN (the modern vector-DB BQ trick: 1 bit/dim):
    sign bits packed into two 32-bit words per vector, candidates ranked by
    Hamming distance (JVM-side xor + bit_count — 64 dims compare in two
    integer ops), top-20 Hamming candidates re-ranked by exact L2, top-5
    emitted with in-query recall@5 vs the exact scan. 64x compression and
    the cheapest possible distance kernel; the rerank stage restores most
    of the recall the 1-bit code loses.

    Scale shape: packing is a row-local map (codes live next to vectors);
    the scan is cosine_topk's (bounded query side broadcast, corpus
    streams, never materialized per-query beyond the top-k windows). The
    sign-bit packs sum 32 disjoint powers of two — exact integer math in
    both engines, no float anywhere before the rerank."""
    from pyspark.sql import Window

    from ..pipeline.dedup import spread_partitions
    from ..pipeline.similarity import _sqdist

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("__x")
    )

    def _pack(off):
        return F.coalesce(F.expr(
            "aggregate(transform(sequence(0, 31), "
            f"i -> IF(__x[i + {off}] > 0D, shiftleft(1L, i), 0L)), "
            "0L, (a, b) -> a + b)"
        ), F.lit(0).cast("long"))

    pk = spread_partitions(emb, "vec_id").select(
        "vec_id", "__x", _pack(0).alias("__w0"), _pack(32).alias("__w1")
    )
    q = pk.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("__x").alias("__qv"),
        F.col("__w0").alias("__q0"), F.col("__w1").alias("__q1"),
    )
    ham = (
        F.bit_count(F.col("__q0").bitwiseXOR(F.col("__w0")))
        + F.bit_count(F.col("__q1").bitwiseXOR(F.col("__w1")))
    )
    wh = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    cand = (
        F.broadcast(q).crossJoin(pk.withColumnRenamed("vec_id",
                                                      "neighbor_id"))
        .select("query_id", "neighbor_id", "__qv",
                F.col("__x").alias("__cv"), ham.cast("int").alias("hamming"))
        .withColumn("__rk", F.row_number().over(wh))
        .where(F.col("__rk") <= 20)
    )
    wd = Window.partitionBy("query_id").orderBy("__d2", "neighbor_id")
    rr = (
        cand.select("query_id", "neighbor_id", "hamming",
                    _sqdist(F.col("__qv"), F.col("__cv")).alias("__d2"))
        .withColumn("rank", F.row_number().over(wd))
        .where(F.col("rank") <= 5)
    )
    ex = (
        F.broadcast(q).crossJoin(
            spread_partitions(emb, "vec_id").select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("__x").alias("__cv"),
            )
        )
        .select("query_id", "neighbor_id",
                _sqdist(F.col("__qv"), F.col("__cv")).alias("__d2"))
        .withColumn("rank", F.row_number().over(wd))
        .where(F.col("rank") <= 5)
        .select("query_id", "neighbor_id")
    )
    rc = (
        rr.join(ex, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("recall5"))
    )
    rc = (
        q.select("query_id")
        .join(rc, "query_id", "left")
        .select("query_id", F.coalesce("recall5", F.lit(0)).alias("recall5"))
    )
    return rr.select(
        "query_id", F.col("rank").cast("int").alias("rank"), "neighbor_id",
        "hamming", F.round("__d2", 4).alias("bq_d2"),
    ).join(rc, "query_id")


def _ivf_probe_sweep_sql() -> str:
    """Parameterized CTE generator for the nprobe sweep: shared centroid
    assignment + exact truth, one (nprobe, recall) row per config."""
    head = """
    cent AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
             FROM embeddings WHERE vec_id < 16),
    corpus AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS nv
               FROM embeddings WHERE vec_id >= 16),
    qs AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id >= 16 AND vec_id < 26),
    nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_queries FROM qs),
    assign AS (
        SELECT nid, nv, cid FROM (
            SELECT c.nid, c.nv, t.cid,
                   ROW_NUMBER() OVER (PARTITION BY c.nid
                       ORDER BY list_distance(c.nv, t.cv), t.cid) AS rk
            FROM corpus c CROSS JOIN cent t
        ) WHERE rk = 1
    ),
    pr AS (
        SELECT qid, qv, cid, rk FROM (
            SELECT q.qid, q.qv, t.cid,
                   ROW_NUMBER() OVER (PARTITION BY q.qid
                       ORDER BY list_distance(q.qv, t.cv), t.cid) AS rk
            FROM qs q CROSS JOIN cent t
        ) WHERE rk <= 4
    ),
    exact AS (
        SELECT qid, nid FROM (
            SELECT q.qid, c.nid,
                   ROW_NUMBER() OVER (PARTITION BY q.qid
                       ORDER BY list_cosine_similarity(q.qv, c.nv) DESC,
                                c.nid) AS rk
            FROM qs q CROSS JOIN corpus c
        ) WHERE rk <= 5
    )"""
    parts, rows = [head], []
    for np_ in (1, 2, 4):
        parts.append(f"""
    ivf{np_} AS (
        SELECT qid, nid FROM (
            SELECT p.qid, a.nid,
                   ROW_NUMBER() OVER (PARTITION BY p.qid
                       ORDER BY list_cosine_similarity(p.qv, a.nv) DESC,
                                a.nid) AS rk
            FROM pr p JOIN assign a USING (cid) WHERE p.rk <= {np_}
        ) WHERE rk <= 5
    ),
    hit{np_} AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM ivf{np_} i SEMI JOIN exact e
          ON i.qid = e.qid AND i.nid = e.nid
    )""")
        rows.append(
            f"SELECT CAST({np_} AS INT) AS nprobe, nq.n_queries,"
            f" hit{np_}.n_hits,"
            f" ROUND(CAST(hit{np_}.n_hits AS DOUBLE)"
            f" / (5 * nq.n_queries), 4) AS recall5"
            f" FROM hit{np_}, nq")
    return "WITH " + ",".join(parts) + "\n" + "\nUNION ALL\n".join(rows)


@register("q_emb_ivf_probe_sweep", oracle=_ivf_probe_sweep_sql())
def q_emb_ivf_probe_sweep(spark, sf_dir):
    """IVF probe-budget tuning sweep (the ANN twin of q_doc_minhash_tuning):
    recall@5 vs the exact scan for nprobe in {1, 2, 4} over the same 16
    fixed coarse lists — the latency/recall trade-off curve that picks a
    probe budget before an index rollout. Monotone by construction
    (nprobe=4 candidates ⊇ nprobe=2 ⊇ nprobe=1), which the value gate
    re-proves numerically.

    Scale shape: the exact-truth scan is cosine_topk's (bounded query
    side broadcast, corpus streams). The swept side is computed ONCE at
    the LARGEST budget: corpus assignment + the nprobe=4 candidate join
    land in one candidate table carrying each pair's 1-based probe rank
    (kmeans_assign rank_col) — candidates(nprobe=j) is exactly
    probe_rank <= j by the same (d2, cid) total order ivf_topk ranks
    probes with. r11 (guide §2.4): the three per-config branches (each a
    window + semi-join + count + broadcast-nq cross) collapsed into ONE
    window pass — rank-within-config-j is the conditional RUNNING COUNT
    of probe_rank<=j rows over the shared (sim desc, neighbor_id) order,
    identical to row_number over the filtered subset because filtering
    preserves relative order — one broadcast hit-flag join against the
    bounded exact top-5, ONE global aggregation producing all three hit
    counts, and a stack() to rows. 21 jobs / 2 localCheckpoints -> one
    linear chain, no checkpoints. At 100 TB the corpus assignment
    materializes once next to the vectors and only the probe joins
    vary."""
    from pyspark.sql import Window

    from ..pipeline.similarity import (
        _dot, _norm, cosine_topk, kmeans_assign,
    )

    emb = load(spark, sf_dir, "embeddings")
    cent = emb.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding")
    )
    corpus = emb.where(F.col("vec_id") >= 16)
    qs = emb.where((F.col("vec_id") >= 16) & (F.col("vec_id") < 26))
    exact = cosine_topk(qs, corpus, k=5).select("query_id", "neighbor_id")
    nq = qs.agg(F.count("*").alias("n_queries"))

    lists = kmeans_assign(
        corpus.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        cent, id_col="neighbor_id", vec_col="embedding",
    ).select("neighbor_id", F.col("embedding").alias("__cv2"),
             _norm(F.col("embedding")).alias("__cn"),
             F.col("centroid_id").alias("__cid"))
    probes = kmeans_assign(
        qs.select(F.col("vec_id").alias("query_id"), "embedding"),
        cent, id_col="query_id", vec_col="embedding",
        topn=4, rank_col="probe_rank",
    ).select("query_id", F.col("embedding").alias("__qv"),
             _norm(F.col("embedding")).alias("__qn"),
             F.col("centroid_id").alias("__cid"), "probe_rank")
    sim = _dot(F.col("__qv"), F.col("__cv2")) / (
        F.col("__qn") * F.col("__cn")
    )
    # each (query, neighbor) pair appears once (a neighbor lives in ONE
    # list) with the probe rank of its list — the shared candidate table
    cand = probes.join(lists, "__cid").select(
        "query_id", "neighbor_id", sim.alias("__sim"), "probe_rank"
    )

    w = (
        Window.partitionBy("query_id")
        .orderBy(F.col("__sim").desc(), F.col("neighbor_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rk = {
        j: F.sum((F.col("probe_rank") <= j).cast("int")).over(w)
        for j in (1, 2, 4)
    }
    ranked = cand.select(
        "query_id", "neighbor_id", "probe_rank",
        *[rk[j].alias(f"__r{j}") for j in (1, 2, 4)],
    )
    hit = ranked.join(
        F.broadcast(exact.withColumn("__hit", F.lit(1))),
        ["query_id", "neighbor_id"], "left",
    )
    counts = hit.agg(*[
        F.coalesce(
            F.sum(F.when(
                (F.col("__hit") == 1)
                & (F.col("probe_rank") <= j)
                & (F.col(f"__r{j}") <= 5), F.lit(1),
            )), F.lit(0),
        ).cast("bigint").alias(f"__h{j}")
        for j in (1, 2, 4)
    ])
    return (
        F.broadcast(nq).crossJoin(counts)
        .select(
            "n_queries",
            F.expr("stack(3, 1, __h1, 2, __h2, 4, __h4)")
            .alias("nprobe", "n_hits"),
        )
        .select(
            F.col("nprobe").cast("int").alias("nprobe"),
            "n_queries", "n_hits",
            F.round(
                F.col("n_hits").cast("double")
                / (F.lit(5) * F.col("n_queries")), 4,
            ).alias("recall5"),
        )
    )


@register(
    "q_emb_prototypicality",
    oracle="""
    WITH cent AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
                  FROM embeddings WHERE vec_id < 16),
    corpus AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS nv
               FROM embeddings WHERE vec_id >= 16),
    assign AS (
        SELECT nid, nv, cid FROM (
            SELECT c.nid, c.nv, t.cid,
                   ROW_NUMBER() OVER (PARTITION BY c.nid
                       ORDER BY list_distance(c.nv, t.cv), t.cid) AS rk
            FROM corpus c CROSS JOIN cent t
        ) WHERE rk = 1
    ),
    scored AS (
        SELECT a.cid, a.nid,
               list_cosine_similarity(a.nv, t.cv) AS sim
        FROM assign a JOIN cent t USING (cid)
    ),
    ranked AS (
        SELECT cid, nid, sim,
               ROW_NUMBER() OVER (PARTITION BY cid
                   ORDER BY sim DESC, nid) AS rnk,
               COUNT(*) OVER (PARTITION BY cid) AS n_members
        FROM scored
    ),
    kept AS (
        SELECT * FROM ranked
        WHERE rnk <= CAST(CEIL(0.75 * n_members) AS BIGINT)
    )
    SELECT cid,
           CAST(MAX(n_members) AS BIGINT) AS n_members,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           ROUND(MIN(sim), 4) AS cut_sim,
           CAST(SUM(CAST(ROUND(sim * 1000000) AS BIGINT)) AS BIGINT)
               AS kept_sim_sum6
    FROM kept GROUP BY 1
    """,
)
def q_emb_prototypicality(spark, sf_dir):
    """Prototypicality curation (SSL-Prototypes, Sorscher et al. 2022 —
    the data-pruning family SemDeDup cites as its complement): every
    corpus vector is assigned to its nearest coarse centroid (the fixed
    vec_id<16 convention shared with the IVF family; L2 assignment, ties
    to lowest cid), scored by cosine to that centroid, and each cluster
    keeps its top ceil(75%) most prototypical members — dropping the
    outlier tail that hurts training more than it helps. Emits per
    cluster: size, kept count, the similarity at the cut, and the kept
    similarity mass (per-element 1e6-scaled integers summed, so the
    value hash is addition-order-proof).

    Scale shape: centroids broadcast (16 rows), the corpus is scanned
    once and never shuffled until the per-cluster window (one Exchange on
    cid); the keep rule is a window rank against a window count — no
    second pass, no driver collect. At 100 TB this is exactly the
    SemDeDup/prototypes pruning plan: broadcast codebook, one keyed
    window."""
    from pyspark.sql import Window

    from ..pipeline.similarity import kmeans_assign

    emb = load(spark, sf_dir, "embeddings")
    cent = emb.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    corpus = emb.where(F.col("vec_id") >= 16).select(
        F.col("vec_id").alias("nid"), "embedding"
    )
    # row-local argmin assignment (broadcast codebook, no corpus fan-out)
    assigned = kmeans_assign(corpus, cent, id_col="nid").select(
        "nid", F.col("embedding").cast("array<double>").alias("nv"),
        F.col("centroid_id").alias("cid"),
    )
    cv = F.broadcast(cent.select(
        F.col("centroid_id").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cv"),
    ))
    dot = F.aggregate(
        F.zip_with("nv", "cv", lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x,
    ))
    scored = assigned.join(cv, "cid").select(
        "cid", "nid",
        (dot / (norm(F.col("nv")) * norm(F.col("cv")))).alias("sim"),
    )
    w_rank = Window.partitionBy("cid").orderBy(
        F.col("sim").desc(), F.col("nid").asc()
    )
    w_all = Window.partitionBy("cid")
    kept = (
        scored.withColumn("rnk", F.row_number().over(w_rank))
        .withColumn("n_members", F.count("*").over(w_all))
        .where(
            F.col("rnk")
            <= F.ceil(F.lit(0.75) * F.col("n_members")).cast("bigint")
        )
    )
    return kept.groupBy("cid").agg(
        F.max("n_members").cast("bigint").alias("n_members"),
        F.count("*").cast("bigint").alias("n_kept"),
        F.round(F.min("sim"), 4).alias("cut_sim"),
        F.sum(F.round(F.col("sim") * 1000000).cast("bigint"))
        .alias("kept_sim_sum6"),
    )


@register(
    "q_emb_contamination",
    oracle="""
    WITH bench AS (SELECT vec_id AS bid, embedding::DOUBLE[] AS bv
                   FROM embeddings WHERE vec_id < 20),
    corpus AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings WHERE vec_id >= 20),
    best AS (
        SELECT c.vec_id, c.label,
               MAX(ROUND(list_cosine_similarity(c.v, b.bv), 4)) AS max_sim
        FROM corpus c CROSS JOIN bench b
        GROUP BY 1, 2
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_corpus,
           CAST(SUM(CASE WHEN max_sim >= 0.35 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated,
           ROUND(SUM(CASE WHEN max_sim >= 0.35 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS contaminated_share
    FROM best GROUP BY 1
    """,
)
def q_emb_contamination(spark, sf_dir):
    """SEMANTIC benchmark decontamination — the embedding-space
    counterpart of q_doc_contamination's n-gram overlap (the two are run
    together in practice: n-grams catch verbatim leaks, embeddings catch
    paraphrased ones): every corpus vector's max cosine against a held-out
    benchmark set (vec_id < 20), flagged past 0.35, aggregated per label.
    Sims are rounded to 4 dp BEFORE the max/threshold on both engines so
    the flag can never flip on float drift.

    Scale shape: the benchmark collapses to ONE broadcast row holding an
    array of (bid, vector) structs and the max-sim evaluates ROW-LOCALLY
    with higher-order functions (the kmeans_assign shape) — the corpus is
    never fanned out x|benchmark|, never shuffled until the |labels|-row
    aggregate. At 100 TB: one map stage over the corpus scan."""
    emb = load(spark, sf_dir, "embeddings")
    _n = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x,
    ))
    # benchmark norms precomputed INTO the broadcast struct: recomputing
    # them inside the per-row lambda would cost |benchmark| norms per
    # corpus row (rule 14)
    bench = F.broadcast(
        emb.where(F.col("vec_id") < 20)
        .select(
            F.col("vec_id").alias("bid"),
            F.col("embedding").cast("array<double>").alias("bv"),
        )
        .withColumn("bn", _n(F.col("bv")))
        .agg(
            F.collect_list(
                F.struct("bid", "bv", "bn")
            ).alias("__bench")
        )
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x,
    ))
    # rule 14: the row's own norm is hoisted to a named column — an
    # expression referenced inside the per-benchmark lambda re-evaluates
    # per element (|benchmark| times per row)
    corpus = emb.where(F.col("vec_id") >= 20).select(
        "vec_id", "label",
        F.col("embedding").cast("array<double>").alias("v"),
    ).withColumn("vn", norm(F.col("v")))
    max_sim = F.array_max(
        F.transform(
            F.col("__bench"),
            lambda b: F.round(
                dot(F.col("v"), b["bv"]) / (F.col("vn") * b["bn"]), 4,
            ),
        )
    )
    best = corpus.crossJoin(bench).select(
        "label", max_sim.alias("max_sim")
    )
    return best.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_corpus"),
        F.sum((F.col("max_sim") >= 0.35).cast("bigint"))
        .alias("n_contaminated"),
        F.round(
            F.sum((F.col("max_sim") >= 0.35).cast("int"))
            / F.count("*"), 6,
        ).alias("contaminated_share"),
    )


# NDCG@10 gain constants: w6[r] = round(1e6 / log2(r+1)) for rank r=1..10,
# and prefix sums for the ideal DCG — INLINED AS LITERALS in both engines
# (libm log2 is not contractually bit-identical across engines; integers
# are)
_NDCG_W6 = (1000000, 630930, 500000, 430677, 386853,
            356207, 333333, 315465, 301030, 289065)
_NDCG_P6 = (0, 1000000, 1630930, 2130930, 2561607, 2948460,
            3304667, 3638000, 3953465, 4254495, 4543560)


@register(
    "q_emb_ndcg_eval",
    oracle=f"""
    WITH cent AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
                  FROM embeddings WHERE vec_id < 16),
    corpus AS (SELECT vec_id AS nid, label AS nlabel,
                      embedding::DOUBLE[] AS nv
               FROM embeddings WHERE vec_id >= 16),
    qs AS (SELECT vec_id AS qid, label AS qlabel, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id >= 16 AND vec_id < 26),
    assign AS (
        SELECT nid, nlabel, nv, cid FROM (
            SELECT c.nid, c.nlabel, c.nv, t.cid,
                   ROW_NUMBER() OVER (PARTITION BY c.nid
                       ORDER BY list_distance(c.nv, t.cv), t.cid) AS rk
            FROM corpus c CROSS JOIN cent t
        ) WHERE rk = 1
    ),
    probes AS (
        SELECT qid, qlabel, qv, cid FROM (
            SELECT q.qid, q.qlabel, q.qv, t.cid,
                   ROW_NUMBER() OVER (PARTITION BY q.qid
                       ORDER BY list_distance(q.qv, t.cv), t.cid) AS rk
            FROM qs q CROSS JOIN cent t
        ) WHERE rk <= 2
    ),
    ranked AS (
        SELECT qid, qlabel, nid, nlabel, rank FROM (
            SELECT p.qid, p.qlabel, a.nid, a.nlabel,
                   ROW_NUMBER() OVER (PARTITION BY p.qid
                       ORDER BY list_cosine_similarity(p.qv, a.nv) DESC,
                                a.nid) AS rank
            FROM probes p JOIN assign a USING (cid)
            WHERE a.nid <> p.qid
        ) WHERE rank <= 10
    ),
    w AS (SELECT UNNEST(range(1, 11)) AS rank,
                 UNNEST({list(_NDCG_W6)}) AS w6),
    dcg AS (
        SELECT qid,
               CAST(SUM(CASE WHEN nlabel = qlabel THEN w.w6
                             ELSE 0 END) AS BIGINT) AS dcg6
        FROM ranked JOIN w USING (rank) GROUP BY 1
    ),
    nrel AS (
        SELECT q.qid,
               CAST(COUNT(*) AS BIGINT) AS n_relevant
        FROM qs q JOIN corpus c ON c.nlabel = q.qlabel AND c.nid <> q.qid
        GROUP BY 1
    ),
    pfx AS (SELECT UNNEST(range(0, 11)) AS k,
                   UNNEST({list(_NDCG_P6)}) AS p6)
    SELECT d.qid AS query_id, n.n_relevant, d.dcg6,
           CAST(p.p6 AS BIGINT) AS idcg6,
           ROUND(d.dcg6 * 1.0 / p.p6, 6) AS ndcg10
    FROM dcg d JOIN nrel n USING (qid)
    JOIN pfx p ON p.k = LEAST(n.n_relevant, 10)
    """,
)
def q_emb_ndcg_eval(spark, sf_dir):
    """Retrieval-quality EVAL metric: NDCG@10 of the IVF ANN ranking
    (16 fixed coarse lists, nprobe=2 — the q_emb_ivf_topk system) against
    label relevance — the graded companion to q_emb_ann_recall's recall@k
    and q_emb_knn_eval's accuracy (what an index rollout actually reports
    on its eval set). Gains 1/log2(rank+1) are INLINED as 1e6-scaled
    integer literals in BOTH engines (libm log2 is not contractually
    bit-identical; integers are), so DCG/IDCG are exact integer sums and
    NDCG is one identical division. The ideal DCG uses the prefix-sum
    literal at min(n_relevant, 10). Self-hits excluded (queries are drawn
    from the corpus).

    Scale shape: the ranking is the IVF plan (broadcast centroids,
    candidate equi-join on list id); relevance counting is one keyed
    label join; the metric itself touches 10 x k rows."""
    from pyspark.sql import Window

    from ..pipeline.similarity import ivf_topk

    emb = load(spark, sf_dir, "embeddings")
    cent = emb.where(F.col("vec_id") < 16)
    corpus = emb.where(F.col("vec_id") >= 16)
    qs = emb.where((F.col("vec_id") >= 16) & (F.col("vec_id") < 26))
    ranked = ivf_topk(qs, corpus, cent, k=11, nprobe=2).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    # re-rank after the self-hit drop so ranks stay 1..10 dense
    w_q = Window.partitionBy("query_id").orderBy("rank")
    ranked = (
        ranked.withColumn("rank", F.row_number().over(w_q))
        .where(F.col("rank") <= 10)
    )
    labels = emb.select("vec_id", "label")
    ranked = (
        ranked.join(
            labels.select(F.col("vec_id").alias("neighbor_id"),
                          F.col("label").alias("nlabel")), "neighbor_id")
        .join(
            F.broadcast(
                qs.select(F.col("vec_id").alias("query_id"),
                          F.col("label").alias("qlabel"))), "query_id")
    )
    w6 = F.element_at(
        F.array(*[F.lit(x) for x in _NDCG_W6]), F.col("rank")
    ).cast("bigint")
    dcg = ranked.groupBy("query_id").agg(
        F.sum(F.when(F.col("nlabel") == F.col("qlabel"), w6)
              .otherwise(F.lit(0).cast("bigint"))).alias("dcg6")
    )
    nrel = (
        qs.select(F.col("vec_id").alias("query_id"),
                  F.col("label").alias("qlabel"))
        .join(corpus.select(F.col("vec_id").alias("nid"),
                            F.col("label").alias("nlabel")),
              F.col("nlabel") == F.col("qlabel"))
        .where(F.col("nid") != F.col("query_id"))
        .groupBy("query_id")
        .agg(F.count("*").cast("bigint").alias("n_relevant"))
    )
    p6 = F.element_at(
        F.array(*[F.lit(x) for x in _NDCG_P6]),
        (F.least(F.col("n_relevant"), F.lit(10)) + 1).cast("int"),
    ).cast("bigint")
    return (
        dcg.join(nrel, "query_id")
        .select(
            "query_id", "n_relevant", "dcg6", p6.alias("idcg6"),
            F.round(F.col("dcg6") * 1.0 / p6, 6).alias("ndcg10"),
        )
    )


@register(
    "q_emb_split_drift",
    oracle="""
    WITH ex AS (
        SELECT label, vec_id % 2 AS half, d - 1 AS dim,
               CAST(embedding[d] AS DOUBLE) AS v
        FROM embeddings,
             (SELECT UNNEST(generate_series(1, 64)) AS d)
    ),
    m AS (
        SELECT label, dim,
               ROUND(AVG(CASE WHEN half = 0 THEN v END), 6) AS ma,
               ROUND(AVG(CASE WHEN half = 1 THEN v END), 6) AS mb
        FROM ex GROUP BY 1, 2
    ),
    c AS (
        SELECT label,
               SUM(ma * mb) AS dot,
               SUM(ma * ma) AS na2,
               SUM(mb * mb) AS nb2,
               SUM((ma - mb) * (ma - mb)) AS d2
        FROM m GROUP BY 1
    ),
    n AS (
        SELECT label,
               CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_b
        FROM embeddings GROUP BY 1
    )
    SELECT c.label, n.n_a, n.n_b,
           ROUND(c.dot / SQRT(c.na2 * c.nb2), 6) AS centroid_cos,
           ROUND(SQRT(c.d2), 6) AS centroid_l2
    FROM c JOIN n USING (label)
    """,
)
def q_emb_split_drift(spark, sf_dir):
    """EMBEDDING DISTRIBUTION DRIFT between two deterministic corpus
    halves (vec_id parity — the train/holdout or old-batch/new-batch
    split check every embedding pipeline runs before trusting an index
    rebuild): per label, the cosine similarity and L2 distance between
    the two halves' CENTROIDS. Per-dimension means are rounded to 6dp
    BEFORE the dot products on BOTH engines, so everything downstream of
    the one float aggregation is arithmetic over identical doubles —
    the same round-then-derive discipline as q_emb_contamination's
    rounded sims. Healthy same-distribution halves read cos ≈ 1 / L2 ≈ 0;
    a label whose halves diverge flags ingestion drift.

    Scale shape: one posexplode + ONE map-side-combinable (label, dim)
    agg — 64·|labels| cells of state regardless of corpus size (the
    conditional-agg half split is a projection, not a key, the
    q_evt_ab_test shape) — then per-label rollups over that state. No
    window, no join at data scale; the |labels|-row count join is
    broadcast."""
    emb = load(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("dim", "v"),
    ).withColumn("v", F.col("v").cast("double"))
    m = ex.groupBy("label", "dim").agg(
        F.round(F.avg(F.when(F.col("half") == 0, F.col("v"))), 6)
        .alias("ma"),
        F.round(F.avg(F.when(F.col("half") == 1, F.col("v"))), 6)
        .alias("mb"),
    )
    c = m.groupBy("label").agg(
        F.sum(F.col("ma") * F.col("mb")).alias("dot"),
        F.sum(F.col("ma") * F.col("ma")).alias("na2"),
        F.sum(F.col("mb") * F.col("mb")).alias("nb2"),
        F.sum((F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb")))
        .alias("d2"),
    )
    n = emb.groupBy("label").agg(
        F.sum(F.when(F.col("vec_id") % 2 == 0, 1).otherwise(0))
        .cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("vec_id") % 2 == 1, 1).otherwise(0))
        .cast("bigint").alias("n_b"),
    )
    return c.join(F.broadcast(n), "label").select(
        "label", "n_a", "n_b",
        F.round(F.col("dot") / F.sqrt(F.col("na2") * F.col("nb2")), 6)
        .alias("centroid_cos"),
        F.round(F.sqrt("d2"), 6).alias("centroid_l2"),
    )


@register(
    "q_emb_centroid_margin",
    oracle="""
    WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                 FROM embeddings),
    dims AS (
        SELECT label, UNNEST(generate_series(1, LEN(v))) AS i,
               UNNEST(v) AS x
        FROM emb
    ),
    cd AS (SELECT label, i, AVG(x) AS m FROM dims GROUP BY 1, 2),
    cent AS (SELECT label AS clabel, LIST(m ORDER BY i) AS c
             FROM cd GROUP BY 1),
    d AS (
        SELECT e.vec_id, e.label, cent.clabel,
               list_dot_product(e.v, e.v)
               - 2 * list_dot_product(e.v, cent.c)
               + list_dot_product(cent.c, cent.c) AS d2
        FROM emb e CROSS JOIN cent
    ),
    m AS (
        SELECT vec_id, label,
               MIN(CASE WHEN clabel = label THEN d2 END) AS d_own,
               MIN(CASE WHEN clabel <> label THEN d2 END) AS d_other
        FROM d GROUP BY 1, 2
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND(AVG(d_other - d_own), 6) AS avg_margin,
           CAST(SUM(CASE WHEN ROUND(d_other - d_own, 6) < 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_misassigned
    FROM m GROUP BY 1
    """,
)
def q_emb_centroid_margin(spark, sf_dir):
    """CLASSIFICATION MARGIN per label — the embedding-quality read
    behind 'are these labels linearly separable by nearest-centroid':
    per-label centroids (one per-dimension mean aggregate), each
    vector's squared-L2 distance to its OWN centroid vs the NEAREST
    OTHER centroid via ‖x‖² − 2x·c + ‖c‖², and per label the average
    margin plus the count of nearest-centroid misassignments
    (margin < 0, tested on the once-rounded value so both engines flip
    together).

    Scale shape: centroids are |labels|×dim STATE (one
    map-side-combinable per-dim aggregate, broadcast back); the
    vector×centroid expansion is |vectors|×|labels| with labels
    bounded — the brute-force-topk class with a k=|labels| fan-out,
    never vector×vector."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cd = (
        emb.select("label", F.posexplode("v").alias("i", "x"))
        .groupBy("label", "i").agg(F.avg("x").alias("m"))
    )
    cent = cd.groupBy(F.col("label").alias("clabel")).agg(
        F.expr("transform(array_sort(collect_list(struct(i, m))),"
               " s -> s.m)").alias("c")
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
        lambda acc, x: acc + x,
    )
    d = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "label", "clabel",
        (dot(F.col("v"), F.col("v")) - 2 * dot(F.col("v"), F.col("c"))
         + dot(F.col("c"), F.col("c"))).alias("d2"),
    )
    m = d.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("clabel") == F.col("label"), F.col("d2")))
        .alias("d_own"),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("d2")))
        .alias("d_other"),
    )
    return m.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_vectors"),
        F.round(F.avg(F.col("d_other") - F.col("d_own")), 6)
        .alias("avg_margin"),
        F.sum((F.round(F.col("d_other") - F.col("d_own"), 6) < 0)
              .cast("int")).cast("bigint").alias("n_misassigned"),
    )


@register(
    "q_emb_cluster_ari",
    oracle="""
    WITH a AS (
        SELECT centroid_id AS cid, label
        FROM read_parquet(
            '/tmp/sparkgraft_oracle_bridge/q_emb_cluster_ari/*.parquet')
    ),
    cells AS (
        SELECT cid, label, CAST(COUNT(*) AS BIGINT) AS n
        FROM a GROUP BY 1, 2
    ),
    rowm AS (SELECT cid, CAST(SUM(n) AS BIGINT) AS rn
             FROM cells GROUP BY 1),
    colm AS (SELECT label, CAST(SUM(n) AS BIGINT) AS cn
             FROM cells GROUP BY 1),
    s AS (
        SELECT
            (SELECT CAST(SUM(n) AS BIGINT) FROM cells) AS n_points,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM rowm) AS n_clusters,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM colm) AS n_labels,
            (SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT) FROM cells)
                AS sum_pairs_cells,
            (SELECT CAST(SUM(rn * (rn - 1) // 2) AS BIGINT) FROM rowm)
                AS sum_pairs_clusters,
            (SELECT CAST(SUM(cn * (cn - 1) // 2) AS BIGINT) FROM colm)
                AS sum_pairs_labels
    )
    SELECT n_points, n_clusters, n_labels, sum_pairs_cells,
           sum_pairs_clusters, sum_pairs_labels,
           ROUND(CAST(CAST(n_points AS HUGEINT) * (n_points - 1) // 2
                      * sum_pairs_cells
                      - CAST(sum_pairs_clusters AS HUGEINT)
                        * sum_pairs_labels AS DOUBLE)
                 / CAST(CAST(n_points AS HUGEINT) * (n_points - 1) // 2
                        * (sum_pairs_clusters + sum_pairs_labels)
                        - CAST(sum_pairs_clusters AS HUGEINT)
                          * sum_pairs_labels * 2 AS DOUBLE) * 2, 6)
               AS ari
    FROM s
    """,
)
def q_emb_cluster_ari(spark, sf_dir):
    """ADJUSTED RAND INDEX between k-means clusters and ground-truth
    labels (Hubert & Arabie 1985 — THE chance-corrected external
    clustering-quality metric): 2 Lloyd iterations (the
    q_emb_kmeans_clusters quantizer, pipeline/similarity), then ARI from
    the cluster×label contingency table. ARI is purely combinatorial —
    every term is an exact pair count C(n,2) in BIGINT/HUGEINT — so
    unlike NMI there is NO logarithm anywhere: the one float is the
    final num/den division of exact integers, identical on both
    engines. ORACLE BRIDGE (r10 verdict #7 pattern): the iterative
    assignment materializes to parquet; the oracle re-derives the
    entire contingency + ARI arithmetic relationally from those bytes
    (the Lloyd loop itself is value-gated by the kmeans oracle's
    unrolled-CTE twin).

    Scale shape: assignment is a broadcast-codebook map stage (no
    shuffle); the contingency table is one map-side-combinable groupBy
    bounded at k x |labels| cells; ARI arithmetic runs on that bounded
    state. Pair counts use int128 (C(n,2) overflows int64 past n~6e9)."""
    from . import bridge_write
    from ..pipeline.similarity import kmeans_assign_kernel, kmeans_centroids

    emb = load(spark, sf_dir, "embeddings")
    cent = kmeans_centroids(emb, k=8, iters=2)
    assigned = kmeans_assign_kernel(emb, cent).select(
        "vec_id", "centroid_id", "label")
    bridge_write(assigned, "q_emb_cluster_ari")

    cells = assigned.groupBy("centroid_id", "label").agg(
        F.count("*").cast("bigint").alias("n"))
    rowm = cells.groupBy("centroid_id").agg(
        F.sum("n").cast("bigint").alias("rn"))
    colm = cells.groupBy("label").agg(
        F.sum("n").cast("bigint").alias("cn"))
    pair = lambda c: (F.col(c) * (F.col(c) - 1) / 2).cast("bigint")  # noqa: E731
    s = (
        cells.agg(F.sum("n").cast("bigint").alias("n_points"),
                  F.sum(pair("n")).cast("bigint").alias("sum_pairs_cells"))
        .crossJoin(F.broadcast(rowm.agg(
            F.count("*").cast("bigint").alias("n_clusters"),
            F.sum(pair("rn")).cast("bigint").alias("sum_pairs_clusters"))))
        .crossJoin(F.broadcast(colm.agg(
            F.count("*").cast("bigint").alias("n_labels"),
            F.sum(pair("cn")).cast("bigint").alias("sum_pairs_labels"))))
    )
    dec = "decimal(38,0)"
    tot_pairs = (F.col("n_points").cast(dec) * (F.col("n_points") - 1) / 2)
    num = (tot_pairs * F.col("sum_pairs_cells")
           - F.col("sum_pairs_clusters").cast(dec)
           * F.col("sum_pairs_labels"))
    den = (tot_pairs * (F.col("sum_pairs_clusters")
                        + F.col("sum_pairs_labels"))
           - F.col("sum_pairs_clusters").cast(dec)
           * F.col("sum_pairs_labels") * 2)
    return s.select(
        "n_points", "n_clusters", "n_labels", "sum_pairs_cells",
        "sum_pairs_clusters", "sum_pairs_labels",
        F.round(num.cast("double") / den.cast("double") * 2, 6)
        .alias("ari"),
    )
