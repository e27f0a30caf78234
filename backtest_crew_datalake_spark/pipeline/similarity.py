"""Similarity search over embedding columns (array<float>).

- cosine_topk      : brute-force exact top-k — the correctness baseline.
  Dot products via zip_with/aggregate in double precision (JVM-side, no
  Python). The query side is broadcast (queries are small by construction);
  the corpus streams — so the plan is scan + broadcast-nested-loop + per-query
  top-k window, no shuffle of the corpus.
- lsh_sign_buckets : sign-bit LSH bucketing (axis-aligned hyperplanes) — the
  scale path: bucket the corpus once, then only compare within buckets.
  At 100 TB the bucketed variant turns an O(Q×N) scan into O(Q×N/2^bits)
  with a plain equi-join on bucket id (shuffle-partitionable, AQE-skew-safe).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves _assign_kernel_udf's type hints

from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def _cosine_ranked(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    round_to: int,
    extra_q: dict[str, str] | None = None,
    extra_c: dict[str, str] | None = None,
    pair_filter=None,
) -> DataFrame:
    """Shared top-k cosine core: bounded query side broadcast, corpus
    streams through the dot-product scan, optional pre-rank pair filter,
    rank on raw similarity with (sim desc, neighbor_id) tie-break, round
    only on emit. cosine_topk and hard_negatives are thin wrappers."""
    from pyspark.sql import Window

    from .dedup import spread_partitions

    # norms are per-VECTOR quantities: fold them once per row on each
    # side, never inside the pair expression (which evaluates per PAIR)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"),
        _norm(F.col(vec_col)).alias("__qn"),
        *[F.col(c).alias(a) for c, a in (extra_q or {}).items()],
    )
    c = spread_partitions(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"),
        _norm(F.col(vec_col)).alias("__cn"),
        *[F.col(col).alias(a) for col, a in (extra_c or {}).items()],
    )
    sim = _dot(F.col("__qv"), F.col("__cv")) / (
        F.col("__qn") * F.col("__cn")
    )
    scored = F.broadcast(q).crossJoin(c)
    if pair_filter is not None:
        scored = scored.where(pair_filter)
    keep = ["query_id", *(extra_q or {}).values(), "neighbor_id",
            *(extra_c or {}).values()]
    scored = scored.select(*keep, sim.alias("__sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(*keep, F.round("__sim", round_to).alias("cos_sim"), "rank")
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact cosine top-k: for each query vector the k nearest corpus vectors.

    Output: (query_id, neighbor_id, cos_sim, rank). Deterministic tie-break:
    (cos_sim desc, neighbor_id asc).
    """
    return _cosine_ranked(queries, corpus, k, id_col, vec_col, round_to)


def lsh_sign_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Sign-bit LSH bucket id from the first ``bits`` dimensions:
    bucket = Σ 2^i · [v_i > 0]. Exact float comparisons — deterministic and
    reproducible in any engine (used by the ANN scale path and its oracle)."""
    v = F.col(vec_col)
    bucket = F.lit(0).cast("long")
    for i in range(bits):
        bucket = bucket + F.when(
            v.getItem(i) > 0, F.lit(1 << i)
        ).otherwise(F.lit(0)).cast("long")
    return df.withColumn("bucket", bucket)


def _sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """IVF-style ANN top-k: assign the corpus to its nearest coarse centroid
    (L2, tie → lowest centroid id), probe each query's ``nprobe`` nearest
    lists, rank candidates by cosine. Same output schema as cosine_topk;
    recall < 1.0 by design.

    Scale shape: centroids broadcast twice (corpus assignment is a single
    streaming pass — the inverted lists are a plain column, no index build);
    the candidate join is an equi-join on centroid id, shuffle-partitionable.
    At 100 TB the corpus assignment is materialized once (write the `list_id`
    column next to the vectors) and only the probe join runs per query batch.
    """
    from pyspark.sql import Window

    # single assignment implementation for the whole module: kmeans_assign
    # (L2, ties → lowest centroid id, topn for probing)
    cent = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col)
    )
    lists = kmeans_assign(
        corpus.select(F.col(id_col).alias("neighbor_id"), vec_col),
        cent, id_col="neighbor_id", vec_col=vec_col,
    ).select("neighbor_id", F.col(vec_col).alias("__cv2"),
             _norm(F.col(vec_col)).alias("__cn"),
             F.col("centroid_id").alias("__cid"))
    probes = kmeans_assign(
        queries.select(F.col(id_col).alias("query_id"), vec_col),
        cent, id_col="query_id", vec_col=vec_col, topn=nprobe,
    ).select("query_id", F.col(vec_col).alias("__qv"),
             _norm(F.col(vec_col)).alias("__qn"),
             F.col("centroid_id").alias("__cid"))

    sim = _dot(F.col("__qv"), F.col("__cv2")) / (
        F.col("__qn") * F.col("__cn")
    )
    scored = probes.join(lists, "__cid").select(
        "query_id", "neighbor_id", sim.alias("__sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round("__sim", round_to).alias("cos_sim"), "rank")
    )


def cosine_topk_bucketed(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    round_to: int = 4,
) -> DataFrame:
    """ANN top-k restricted to same-LSH-bucket candidates (recall < 1.0 by
    design; the benchmark-scale variant). Same output schema as cosine_topk."""
    from pyspark.sql import Window

    from .dedup import spread_partitions

    qb = lsh_sign_buckets(queries, vec_col, bits).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"),
        _norm(F.col(vec_col)).alias("__qn"), "bucket"
    )
    cb = lsh_sign_buckets(spread_partitions(corpus), vec_col, bits).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"),
        _norm(F.col(vec_col)).alias("__cn"), "bucket"
    )
    sim = _dot(F.col("__qv"), F.col("__cv")) / (
        F.col("__qn") * F.col("__cn")
    )
    scored = qb.join(cb, "bucket").select(
        "query_id", "neighbor_id", sim.alias("__sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round("__sim", round_to).alias("cos_sim"), "rank")
    )


def kmeans_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    topn: int = 1,
) -> DataFrame:
    """Assign every row to its ``topn`` nearest centroids (L2; ties → lowest
    centroid_id). Input centroids must have (centroid_id, ``vec_col``).
    Output: the input rows + ``centroid_id`` (one row per assignment;
    topn=1 is plain k-means assignment, topn>1 is IVF probing).

    Scale shape: the centroid table collapses to ONE broadcast row holding
    a cid-sorted array of (cid, vector) structs, and the argmin runs
    ROW-LOCALLY with higher-order functions (transform + array_min over
    (d2, cid) structs) — the corpus is never fanned out ×k, never
    shuffled, and never re-grouped: assignment is a pure map stage
    appended to whatever scan produced the input. Ties → lowest cid
    because struct comparison is lexicographic, so equal d2 resolves by
    the smaller cid. topn>1 (IVF probing) sorts the k-length (d2, cid)
    struct array row-locally and explodes the first ``topn`` — same total
    order as a rank window, no shuffle. An empty centroid table yields an
    empty result (matching the pre-broadcast crossJoin behavior), not
    NULL assignments."""
    from .dedup import spread_partitions

    df = spread_partitions(df, id_col)  # N×k distance evals: CPU-heavy
    cents = F.broadcast(
        centroids.agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("centroid_id").alias("cid"),
                        F.col(vec_col).cast("array<double>").alias("cv"),
                    )
                )
            ).alias("__cents")
        )
    )
    dstructs = F.transform(
        F.col("__cents"),
        lambda c: F.struct(
            _sqdist(F.col(vec_col), c["cv"]).alias("d2"),
            c["cid"].alias("cid"),
        ),
    )
    if topn == 1:
        # array_min over (d2, cid) structs IS the argmin with ties → lowest
        # cid, and evaluates the distance array exactly once (see
        # pq._codes_udf's docstring for the measured cost of the
        # alternatives). The isNotNull filter only fires for an empty
        # centroid table (array_min([]) is NULL) — empty in, empty out.
        return (
            df.crossJoin(cents)
            .withColumn("centroid_id", F.array_min(dstructs)["cid"])
            .where(F.col("centroid_id").isNotNull())
            .drop("__cents")
        )
    top = F.slice(F.array_sort(dstructs), 1, topn)
    return (
        df.crossJoin(cents)
        .withColumn("__t", F.explode(top))
        .withColumn("centroid_id", F.col("__t.cid"))
        .drop("__cents", "__t")
    )


def _assign_kernel_udf(C, cids, id_type: str):
    """Arrow-batched nearest-centroid assignment against a DRIVER-HELD
    k×dim centroid matrix — the MLlib shape (Spark's own KMeans collects
    centroids each round and ships them to a map stage). Value-exact vs
    the expression path: squared distance accumulates (x_i − c_i)² with
    i ascending via `acc +=` — the same left-associated order as _sqdist's
    aggregate fold — and np.argmin takes the FIRST minimum, so ties break
    to the lowest centroid id exactly like array_min over (d2, cid)
    structs (``cids`` is sorted ascending by construction). See
    pq._codes_udf for the measured HOF-vs-kernel rationale (interpreted
    µs-per-invocation lambdas vs one vectorized batch op)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ids = np.asarray(cids, dtype=object)

    @pandas_udf(id_type)
    def assign(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        X = np.array(vs.tolist(), dtype=np.float64)
        acc = np.zeros((X.shape[0], C.shape[0]), dtype=np.float64)
        for i in range(X.shape[1]):
            diff = X[:, i, None] - C[None, :, i]
            acc += diff * diff
        return pd.Series(ids[np.argmin(acc, axis=1)])

    return assign


def kmeans_assign_kernel(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """kmeans_assign(topn=1) via the Arrow kernel: collects the k-row
    centroid table (bounded — the same collect family as pq's codebook)
    and appends ``centroid_id`` in ONE vectorized map stage. Same result
    as kmeans_assign to the bit (see _assign_kernel_udf); preferable when
    the corpus is large enough that the interpreted per-element HOF cost
    dominates (measured: the 3-pass kmeans query went 2.7× → ~1.9× DuckDB
    at the 10× corpus when its passes moved to the kernel, with the warm
    per-pass cost ~0.5 s vs ~1 s interpreted)."""
    import numpy as np

    rows = sorted(
        centroids.select("centroid_id", F.col(vec_col).cast("array<double>")
                         .alias(vec_col)).collect(),
        key=lambda r: r["centroid_id"],
    )
    if not rows:
        return df.withColumn("centroid_id", F.lit(None)).where(F.lit(False))
    C = np.array([r[vec_col] for r in rows], dtype=np.float64)
    cids = [r["centroid_id"] for r in rows]
    id_type = dict(centroids.dtypes)["centroid_id"]
    # no spread here, unlike the HOF path: the kernel is one vectorized
    # batch op per partition, so a small input runs fastest as ONE Arrow
    # batch (32-way spread = 32 python tasks of ~60 rows, measured pure
    # overhead), and at scale the scan is already multi-partition
    return df.withColumn(
        "centroid_id",
        _assign_kernel_udf(C, cids, id_type)(
            F.col(vec_col).cast("array<double>")
        ),
    )


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means refinement, MLlib-style: the ONLY driver state is
    the k×dim centroid matrix (a bounded collect, same family as pq's
    codebook and the HLL registers — never corpus rows). Deterministic
    end to end: init = the k lowest-id vectors, L2 assignment with
    ties → lowest centroid id, means in double precision (computed by the
    distributed keyed aggregation, collected exactly). Clusters that go
    empty keep their previous centroid. Returns (centroid_id, ``vec_col``:
    array<double>) as a LITERAL local relation — downstream broadcasts
    (IVF probing, semantic dedup) start from k in-memory rows instead of
    re-running the whole training subtree.

    Scale shape per iteration: ONE job — a corpus map stage (Arrow-kernel
    assignment, see _assign_kernel_udf; the earlier per-element HOF argmin
    was measured 2.7× DuckDB at the 10× corpus purely on interpreted
    lambda overhead) feeding lloyd_means' keyed (centroid, dim) partial
    aggregation, k×dim groups collected to the driver. No per-round
    broadcast-build jobs, no checkpoint materializations, no coalesce
    join: plan depth is constant and jobs = 1 init + ``iters``."""
    import numpy as np

    emb = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias(vec_col),
    )
    # rounds are separate jobs — pin the projection once so each reads
    # materialized partitions instead of re-running the scan (no spread:
    # the kernel vectorizes within a partition, and splitting a tiny
    # input 32 ways was measured pure python-task overhead)
    emb = emb.localCheckpoint(eager=False)
    spark = corpus.sparkSession
    id_type = dict(emb.dtypes)["__id"]
    schema = f"centroid_id {id_type}, {vec_col} array<double>"
    init = emb.orderBy("__id").limit(k).collect()  # k rows, bounded
    if not init:
        return spark.createDataFrame([], schema)
    cids = [r["__id"] for r in init]  # ascending by construction
    C = np.array([r[vec_col] for r in init], dtype=np.float64)
    for _ in range(iters):
        assigned = emb.withColumn(
            "centroid_id", _assign_kernel_udf(C, cids, id_type)(F.col(vec_col))
        )
        got = {
            r["centroid_id"]: r["__nv"]
            for r in lloyd_means(
                assigned, ["centroid_id"], vec_col, "__nv"
            ).collect()  # ≤ k rows, bounded
        }
        # empty clusters keep their previous centroid
        C = np.array(
            [got.get(cid, C[i]) for i, cid in enumerate(cids)],
            dtype=np.float64,
        )
    return spark.createDataFrame(
        [(cid, [float(x) for x in C[i]]) for i, cid in enumerate(cids)],
        schema,
    )


def lloyd_means(
    df: DataFrame, keys: list[str], vec_col: str, out_col: str
) -> DataFrame:
    """Per-``keys`` element-wise mean of an array column, rebuilt in
    position order — the Lloyd 'recompute centroids' step, shared by
    kmeans_centroids (keys=[centroid_id]) and pq.pq_codebooks
    (keys=[sub_id, centroid_id]). Shuffle is keyed (``keys`` × dim) —
    tiny regardless of input size thanks to map-side partial aggregation."""
    return (
        df.select(*keys, F.posexplode(vec_col).alias("__pos", "__val"))
        .groupBy(*keys, "__pos")
        .agg(F.avg("__val").alias("__mv"))
        .groupBy(*keys)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__mv"))),
                lambda s: s["__mv"],
            ).alias(out_col)
        )
    )


def hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int = 4,
) -> DataFrame:
    """Contrastive hard-negative mining: for each query vector, the k most
    cosine-similar corpus vectors carrying a DIFFERENT label (the pairs a
    contrastive trainer wants as in-batch negatives).

    Same execution shape as cosine_topk (both delegate to _cosine_ranked —
    bounded query side broadcast, corpus streams through the dot-product
    scan), plus the label-inequality filter applied BEFORE the ranking
    window so excluded same-label rows never reach the shuffle.
    Deterministic: rank on raw sim, tie-break neighbor_id asc, round only
    the emitted value.
    """
    return _cosine_ranked(
        queries, corpus, k, id_col, vec_col, round_to,
        extra_q={label_col: "query_label"},
        extra_c={label_col: "neighbor_label"},
        pair_filter=F.col("query_label") != F.col("neighbor_label"),
    )


def label_silhouette(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int = 4,
) -> DataFrame:
    """Per-label simplified-silhouette score — embedding-space label quality
    (how separable each label's cluster is before training on it).

    For each vector: a = euclidean distance to its OWN label centroid,
    b = min distance to any OTHER centroid, s = (b-a)/max(a,b); output is
    avg(s) per label. Centroids come from one posexplode + (label, dim)
    mean — the only full-corpus shuffle — then fold back to arrays and
    broadcast (#labels rows), so the per-vector distance pass is a
    broadcast nested loop over a bounded side, never a corpus×corpus join.
    """
    ex = df.select(
        F.col(label_col).alias("__l"), F.posexplode(vec_col).alias("__d", "__v")
    ).withColumn("__v", F.col("__v").cast("double"))
    cent = (
        ex.groupBy("__l", "__d")
        .agg(F.avg("__v").alias("__cv"))
        .groupBy("__l")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__d", "__cv"))),
                lambda s: s["__cv"],
            ).alias("__cvec")
        )
        .select(F.col("__l").alias("cent_label"), "__cvec")
    )
    dist = F.sqrt(_sqdist(F.col(vec_col), F.col("__cvec")))
    per_vec = (
        df.select(id_col, F.col(label_col).alias("label"), vec_col)
        .crossJoin(F.broadcast(cent))
        .select(id_col, "label", "cent_label", dist.alias("__dist"))
        .groupBy(id_col, "label")
        .agg(
            F.max(
                F.when(F.col("cent_label") == F.col("label"), F.col("__dist"))
            ).alias("__a"),
            F.min(
                F.when(F.col("cent_label") != F.col("label"), F.col("__dist"))
            ).alias("__b"),
        )
    )
    s = (F.col("__b") - F.col("__a")) / F.greatest(F.col("__a"), F.col("__b"))
    return (
        per_vec.groupBy("label")
        .agg(
            F.round(F.avg(s), round_to).alias("silhouette"),
            F.count("*").alias("n_vecs"),
        )
    )


def kcenter_select(
    corpus: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center (farthest-point-first, Gonzalez 1985) coreset
    selection — the geometric data-selection staple: pick the ``k`` points
    that 2-approximate the minimal covering radius, i.e. a maximally
    diverse subset for labeling / distillation / eval-set construction.

    Deterministic: seed = the lowest-id vector; each round adds the point
    with the LARGEST distance to its nearest selected point (ties → lowest
    id). Returns (selection_order, ``id_col``, ``vec_col``) as a LITERAL
    local relation (same contract as kmeans_centroids — downstream
    assignment broadcasts k rows, never the selection subtree).

    Scale shape per round: the selected set is driver-held (≤k rows — the
    bounded-collect family), so min-distance-to-selected is a ROW-LOCAL
    fold over a k-entry literal array appended to the corpus scan, and the
    argmax is a 1-row `max(struct(d2, -id))` aggregate (map-side
    combinable). k rounds = k scans of a localCheckpoint'd projection; no
    join, no window, no shuffle beyond the 1-row agg.
    """
    emb = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).localCheckpoint(eager=False)
    spark = corpus.sparkSession
    id_type = dict(emb.dtypes)["__id"]
    schema = (f"selection_order int, {id_col} {id_type}, "
              f"{vec_col} array<double>")
    seed = emb.orderBy("__id").limit(1).collect()
    if not seed:
        return spark.createDataFrame([], schema)
    sel = [(seed[0]["__id"], seed[0]["__v"])]
    for _ in range(1, k):
        cents = F.array(*[
            F.array(*[F.lit(float(x)) for x in v]) for _, v in sel
        ])
        mind2 = F.array_min(
            F.transform(cents, lambda c: _sqdist(F.col("__v"), c))
        )
        far = (
            emb.select(
                F.max(
                    F.struct(
                        mind2.alias("d2"),
                        (-F.col("__id")).alias("nid"),
                    )
                ).alias("m")
            ).collect()[0]["m"]
        )
        if far["d2"] == 0.0:
            # max min-distance 0 ⇒ every point coincides with a selected
            # one (k > #distinct vectors) — stop instead of re-selecting
            break
        pick = emb.where(F.col("__id") == -far["nid"]).collect()[0]
        sel.append((pick["__id"], pick["__v"]))
    return spark.createDataFrame(
        [(i, sid, [float(x) for x in v]) for i, (sid, v) in enumerate(sel)],
        schema,
    )


def pca_power(
    corpus: DataFrame,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top principal component of the embedding matrix by power iteration
    on the covariance operator — the embedding-hygiene staple (dominant-
    direction removal / ABTT "all-but-the-top", Mu & Viswanath 2018;
    whitening diagnostics). Deterministic: start vector = e_0, ``iters``
    rounds of v ← normalize(Cv) with C = (1/n)·Σ x_c x_cᵀ applied as two
    streaming passes (never materializing C: s_i = x_c_i·v row-local, then
    per-dim Σ s_i·x_c_i — the standard matrix-free power step).

    Engine-reproducible by construction: the per-dim means and each
    round's per-dim sums round to 6 decimals at the driver collect, so
    aggregation-order ulp noise dies at every round boundary; the
    normalization is a left-associated index-order fold over those
    rounded values (identical IEEE ops in any engine). The per-row work
    (center, s = x_c·v, s-weighted per-dim partials) runs as an Arrow
    mapInPandas kernel emitting ≤dims partial rows per batch — the
    measured carve-out boundary (the per-element HOF fold was 16.7 s at
    the 10× corpus on interpreted-lambda overhead alone; the kernel does
    the same flops vectorized). s accumulates (x_i−µ_i)·v_i with i
    ascending — the fold's left-associated order — and partial-sum
    association is irrelevant because totals round AFTER full
    aggregation (the oracle's own row order is arbitrary too).

    Returns one row per dimension: (dim 1-based, loading = final unit
    eigenvector component rounded 4, eigenvalue = ‖Cv‖ of the last round
    rounded 6, ev_share = eigenvalue / total variance rounded 4).

    Scale shape: mean pass + per-round (map + keyed (dim) agg of 64
    groups, 64-row collect) + one variance pass — all map-side
    combinable; driver state is one dim-length vector (bounded-collect
    family, like kmeans' k×dim matrix)."""
    import math

    emb = corpus.select(
        F.col(vec_col).cast("array<double>").alias("__x")
    ).localCheckpoint(eager=False)
    spark = corpus.sparkSession
    schema = "dim int, loading double, eigenvalue double, ev_share double"
    # ONE pass yields means, n, and the dimensionality (no separate
    # count()/head() jobs — per-dim COUNT(*) is n by construction)
    mu_rows = (
        emb.select(F.posexplode("__x").alias("__d", "__val"))
        .groupBy("__d")
        .agg(F.round(F.avg("__val"), 6).alias("__m"),
             F.count("*").alias("__n"))
        .collect()
    )
    if not mu_rows:
        return spark.createDataFrame([], schema)
    dims = max(r["__d"] for r in mu_rows) + 1
    n = mu_rows[0]["__n"]
    mu = [0.0] * dims
    for r in mu_rows:
        mu[r["__d"]] = r["__m"]
    import numpy as np
    import pandas as pd

    MU = np.array(mu, dtype=np.float64)

    def _partials(weights):
        # weights=None -> per-dim sum of xc^2 (variance pass); else
        # per-dim sum of (xc·weights)*xc (power step). One partial row
        # per (batch, dim): the shuffle is bounded by dims × batches.
        W = None if weights is None else np.array(weights, dtype=np.float64)

        def gen(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.array(pdf["__x"].tolist(), dtype=np.float64) - MU
                if W is None:
                    part = (X * X).sum(axis=0)
                else:
                    # index-ascending accumulation = the fold's
                    # left-associated order for each row's s
                    sv = np.zeros(len(X), dtype=np.float64)
                    for i in range(X.shape[1]):
                        sv += X[:, i] * W[i]
                    part = sv @ X
                yield pd.DataFrame(
                    {"__d": np.arange(X.shape[1], dtype=np.int32),
                     "__p": part}
                )

        return gen

    def _dim_totals(weights, denom):
        rows = (
            emb.mapInPandas(_partials(weights), "__d int, __p double")
            .groupBy("__d")
            .agg(F.round(F.sum("__p") / denom, 6).alias("__t"))
            .collect()
        )
        out = [0.0] * dims
        for r in rows:
            out[r["__d"]] = r["__t"]
        return out

    v = [1.0] + [0.0] * (dims - 1)
    eig = 0.0
    for _ in range(iters):
        u = _dim_totals(v, n)
        # left-associated index-order norm: identical fold in any engine
        acc = 0.0
        for x in u:
            acc = acc + x * x
        eig = math.sqrt(acc)
        if eig == 0.0:  # degenerate input (all-constant dims): keep v
            break
        v = [x / eig for x in u]

    tv = _dim_totals(None, n)
    acc = 0.0
    for x in tv:
        acc = acc + x
    total_var = acc
    rows = [
        (d + 1, round(v[d], 4), round(eig, 6),
         round(eig / total_var, 4) if total_var > 0 else 0.0)
        for d in range(dims)
    ]
    return spark.createDataFrame(rows, schema)


def abtt_whiten(
    corpus: DataFrame,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-but-the-top whitening diagnostics (Mu & Viswanath 2018): remove
    the top principal direction from the centered embeddings and report
    per-dimension variance BEFORE and AFTER plus the anisotropy ratio
    (max per-dim variance / mean per-dim variance) both ways — the
    standard check that dominant-direction removal actually isotropized
    the space before cosine retrieval.

    Deterministic composition: the direction is pca_power's ROUNDED
    loading vector (already value-checked), the means are the same
    rounded-6 per-dim means, and both variance totals come from ONE Arrow
    kernel pass (per-batch partial sums; totals rounded 6 after full
    aggregation). The anisotropy ratios are emitted UNROUNDED — they are
    pure index-order arithmetic over the rounded per-dim variances, so
    any engine reproduces them bit-for-bit.
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    schema = ("dim int, var_before double, var_after double, "
              "anis_before double, anis_after double")
    pca = pca_power(corpus, iters=iters, id_col=id_col, vec_col=vec_col)
    prows = pca.collect()
    if not prows:
        return spark.createDataFrame([], schema)
    dims = len(prows)
    U = np.zeros(dims)
    for r in prows:
        U[r["dim"] - 1] = r["loading"]
    emb = corpus.select(
        F.col(vec_col).cast("array<double>").alias("__x")
    ).localCheckpoint(eager=False)
    mu_rows = (
        emb.select(F.posexplode("__x").alias("__d", "__val"))
        .groupBy("__d")
        .agg(F.round(F.avg("__val"), 6).alias("__m"),
             F.count("*").alias("__n"))
        .collect()
    )
    n = mu_rows[0]["__n"]
    MU = np.zeros(dims)
    for r in mu_rows:
        MU[r["__d"]] = r["__m"]

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf["__x"].tolist(), dtype=np.float64) - MU
            sv = np.zeros(len(X), dtype=np.float64)
            for i in range(X.shape[1]):
                sv += X[:, i] * U[i]
            R = X - sv[:, None] * U[None, :]
            yield pd.DataFrame({
                "__d": np.arange(X.shape[1], dtype=np.int32),
                "__b": (X * X).sum(axis=0),
                "__a": (R * R).sum(axis=0),
            })

    tot = (
        emb.mapInPandas(gen, "__d int, __b double, __a double")
        .groupBy("__d")
        .agg(F.round(F.sum("__b") / n, 6).alias("__vb"),
             F.round(F.sum("__a") / n, 6).alias("__va"))
        .collect()
    )
    vb = [0.0] * dims
    va = [0.0] * dims
    for r in tot:
        vb[r["__d"]], va[r["__d"]] = r["__vb"], r["__va"]

    def _anis(vs):
        acc = 0.0
        for x in vs:       # left-associated index-order sum — matches the
            acc = acc + x  # oracle's list_aggregate fold exactly
        return max(vs) / (acc / len(vs)) if acc != 0.0 else 0.0

    ab, aa = _anis(vb), _anis(va)
    return spark.createDataFrame(
        [(d + 1, vb[d], va[d], ab, aa) for d in range(dims)], schema
    )


def logreg_train(
    corpus: DataFrame,
    iters: int = 3,
    lr: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Train a binary logistic-regression probe on the embedding column by
    full-batch gradient descent — the fasttext-style quality-classifier
    TRAINING step (q_emb_linear_probe is its inference twin). Target
    y = label % 2; weights init 0 with the bias carried as an augmented
    constant dimension (x ‖ [1.0]), so one fold/agg handles both.

    Engine-reproducible iteration (the pca_power recipe): z = w·x is a
    left-associated index-order fold over literal weights; σ(z) rounds to
    8 decimals (libm exp is not correctly rounded — same cure as
    linear_probe); each per-row per-dim gradient contribution
    x_d·(σ−y) becomes a 1e8-SCALED BIGINT so the gradient sum is exact
    and order-free (scale.md rule 12); the weight update runs at the
    driver with the same IEEE ops any engine applies to those exact
    integers. Returns one row per augmented dim: (dim 1-based, 65 =
    bias, weight UNROUNDED — bit-identical by construction) plus the
    final training accuracy (exact-count ratio, unrounded).

    Scale shape per step: one corpus map (fold) + one keyed (dim) agg of
    ≤dims+1 groups collected to the driver — the MLlib shape; driver
    state is one weight vector (bounded-collect family).
    """
    spark = corpus.sparkSession
    schema = "dim int, weight double, accuracy double"
    emb = corpus.select(
        F.concat(
            F.col(vec_col).cast("array<double>"), F.array(F.lit(1.0))
        ).alias("__x"),
        (F.col(label_col) % 2).cast("double").alias("__y"),
    ).localCheckpoint(eager=False)
    head = emb.select(
        F.size("__x").alias("d"), F.lit(1).alias("__one")
    ).groupBy("__one").agg(F.max("d").alias("d"), F.count("*").alias("n")) \
     .collect()
    if not head:
        return spark.createDataFrame([], schema)
    dims, n = head[0]["d"], head[0]["n"]
    import numpy as np
    import pandas as pd

    # Arrow kernel per GD step (the pca_power carve-out: the per-row
    # fold + posexplode shape measured 21.9 s at the 10x corpus on
    # interpreted-lambda overhead). z accumulates x_i*w_i with i
    # ascending (the fold's left-associated order); numpy rounding
    # differs from HALF_UP only at exact decimal ties (measure-zero for
    # sigmoid outputs / float products — the pq._codes_udf precedent).
    def _grad_partials(wv):
        W = np.array(wv, dtype=np.float64)

        def gen(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.array(pdf["__x"].tolist(), dtype=np.float64)
                z = np.zeros(len(X), dtype=np.float64)
                for i in range(X.shape[1]):
                    z += X[:, i] * W[i]
                pr = np.round(1.0 / (1.0 + np.exp(-z)), 8)
                e = pr - pdf["__y"].to_numpy(dtype=np.float64)
                g8 = np.round(X * e[:, None] * 1e8).astype(np.int64)
                yield pd.DataFrame({
                    "__d": np.arange(X.shape[1], dtype=np.int32),
                    "__g8": g8.sum(axis=0),
                })

        return gen

    w = [0.0] * dims
    for _ in range(iters):
        g_rows = (
            emb.mapInPandas(_grad_partials(w), "__d int, __g8 long")
            .groupBy("__d").agg(F.sum("__g8").alias("__g8"))
            .collect()
        )
        g8 = [0] * dims
        for r in g_rows:
            g8[r["__d"]] = r["__g8"]
        w = [w[d] - lr * (float(g8[d]) / 1e8 / n) for d in range(dims)]

    def _acc_partials(wv):
        W = np.array(wv, dtype=np.float64)

        def gen(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.array(pdf["__x"].tolist(), dtype=np.float64)
                z = np.zeros(len(X), dtype=np.float64)
                for i in range(X.shape[1]):
                    z += X[:, i] * W[i]
                pr = np.round(1.0 / (1.0 + np.exp(-z)), 8)
                yy = pdf["__y"].to_numpy(dtype=np.float64)
                yield pd.DataFrame(
                    {"__c": [int(((pr >= 0.5) == (yy == 1.0)).sum())]}
                )

        return gen

    correct = (
        emb.mapInPandas(_acc_partials(w), "__c long")
        .agg(F.sum("__c").alias("c")).collect()[0]["c"]
    )
    acc = correct / n
    return spark.createDataFrame(
        [(d + 1, w[d], acc) for d in range(dims)], schema
    )
