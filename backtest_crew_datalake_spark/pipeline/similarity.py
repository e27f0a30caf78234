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
    rank_col: str | None = None,
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
    res = (
        df.crossJoin(cents)
        .select("*", F.posexplode(top).alias("__pr", "__t"))
        .withColumn("centroid_id", F.col("__t.cid"))
    )
    if rank_col is not None:
        # 1-based probe rank (1 = nearest list): lets a probe-budget
        # sweep compute the topn=N candidate table ONCE and carve the
        # smaller budgets out by filter — candidates(topn=j) is exactly
        # rank <= j by the same total order
        res = res.withColumn(rank_col, (F.col("__pr") + 1).cast("int"))
    return res.drop("__cents", "__t", "__pr")


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
        # ≤ k×dim rows, bounded; one exchange (see collect_lloyd_means)
        got = collect_lloyd_means(assigned, ["centroid_id"], vec_col)
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
    position order — the Lloyd 'recompute centroids' step. Shuffle is
    keyed (``keys`` × dim) — tiny regardless of input size thanks to
    map-side partial aggregation. The training loops collect
    ``lloyd_mean_rows`` instead (one exchange, driver-side assembly);
    this array-building form stays for callers that keep the means
    distributed."""
    return (
        lloyd_mean_rows(df, keys, vec_col)
        .groupBy(*keys)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__mv"))),
                lambda s: s["__mv"],
            ).alias(out_col)
        )
    )


def lloyd_mean_rows(df: DataFrame, keys: list[str], vec_col: str) -> DataFrame:
    """The flat (keys..., __pos, __mv) form of lloyd_means — ONE keyed
    exchange; a training loop that collects the means anyway (bounded at
    k×dim rows) assembles the centroid matrix driver-side and skips
    lloyd_means' second exchange (collect_list re-grouping), which under
    AQE costs a whole extra query-stage job per Lloyd round."""
    return (
        df.select(*keys, F.posexplode(vec_col).alias("__pos", "__val"))
        .groupBy(*keys, "__pos")
        .agg(F.avg("__val").alias("__mv"))
    )


def collect_lloyd_means(df: DataFrame, keys: list[str], vec_col: str) -> dict:
    """Collect lloyd_mean_rows into {key_tuple_or_scalar: [mean_0..mean_d]}
    (absent key = empty cell; caller keeps the previous centroid).
    Value-exact vs collecting lloyd_means' arrays: the per-(key, pos)
    doubles are the same aggregation outputs, only the array assembly
    moved driver-side."""
    acc: dict = {}
    for r in lloyd_mean_rows(df, keys, vec_col).collect():
        k = r[keys[0]] if len(keys) == 1 else tuple(r[c] for c in keys)
        acc.setdefault(k, {})[r["__pos"]] = r["__mv"]
    return {
        k: [pos[i] for i in range(len(pos))] for k, pos in acc.items()
    }


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


def _round_half_up(x: float, scale: int) -> float:
    """Driver-side replica of Spark SQL ``round()`` on DOUBLE:
    BigDecimal.valueOf(d) (= shortest decimal repr, exactly python's
    ``repr``) then setScale(scale, HALF_UP). Used when a rounding that
    the oracle expresses as ROUND(…, n) happens at the driver instead of
    inside a Spark expression — python's builtin ``round`` is banker's
    and disagrees on exact decimal ties (the hypothesis-found 49/32
    case, tests/test_property_pipeline.py)."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-scale)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def _pca_core(
    corpus: DataFrame,
    iters: int,
    vec_col: str,
):
    """Shared power-iteration core for pca_power / abtt_whiten: ``iters``
    corpus passes TOTAL (one Arrow kernel pass per power round — the mean
    pass, the variance pass, and the dimensionality probe of the previous
    shape are all folded into round 1's kernel).

    The fold trick: every centered statistic the iteration needs is a
    linear combination of RAW moments (Σx_d, Σx_d², Σ x_d·(x·v)) plus
    driver-held constants, so round 1's kernel emits the raw first/second
    moments alongside its power-step partials and the driver applies the
    exact centering algebra:

        Σ (x_d−µ̂_d)·((x−µ̂)·v) = Σ x_d·t − c·Σx_d − µ̂_d·T + n·c·µ̂_d
        with t = x·v (row-local), c = µ̂·v, T = Σ_i v_i·Σx_i
        Σ (x_d−µ̂_d)²          = Σx_d² − 2µ̂_d·Σx_d + n·µ̂_d²

    Values are identical to the two-pass centered formulation after the
    round-to-6 boundary each total passes through (fp association noise
    is ~1e-15 relative vs the 5e-7 rounding quantum; the round-boundary
    contract already declares aggregation order irrelevant), so the
    unrolled DuckDB oracles — which keep the centered formulation —
    are unchanged. Verified value-identical to the previous 5-pass
    implementation at sf0.001/0.01/0.1 and the 10×/50× corpora.

    Returns None on empty input, else a dict with the checkpointed
    ``emb``, per-dim lists ``mu`` (rounded 6) / ``sx`` (raw Σx) /
    ``var6`` (rounded per-dim variance), scalars ``n``/``dims``/
    ``total_var``/``eig``, and the final unit vector ``v``."""
    import math

    import numpy as np
    import pandas as pd

    emb = corpus.select(
        F.col(vec_col).cast("array<double>").alias("__x")
    ).localCheckpoint(eager=False)

    def gen1(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf["__x"].tolist(), dtype=np.float64)
            yield pd.DataFrame({
                "__d": np.arange(X.shape[1], dtype=np.int32),
                "__sx": X.sum(axis=0),
                "__sxx": (X * X).sum(axis=0),
                # round-1 power step: v = e_0, so t = x·v = x_0
                "__sxv": (X * X[:, 0][:, None]).sum(axis=0),
                "__n": np.full(X.shape[1], len(X), dtype=np.int64),
            })

    rows = (
        emb.mapInPandas(
            gen1, "__d int, __sx double, __sxx double, __sxv double, __n long"
        )
        .groupBy("__d")
        .agg(F.sum("__sx").alias("__sx"), F.sum("__sxx").alias("__sxx"),
             F.sum("__sxv").alias("__sxv"), F.sum("__n").alias("__n"))
        .collect()
    )
    if not rows:
        return None
    dims = max(r["__d"] for r in rows) + 1
    n = rows[0]["__n"]
    sx = [0.0] * dims
    sxx = [0.0] * dims
    sxv = [0.0] * dims
    for r in rows:
        sx[r["__d"]], sxx[r["__d"]], sxv[r["__d"]] = (
            r["__sx"], r["__sxx"], r["__sxv"])
    mu = [_round_half_up(sx[d] / n, 6) for d in range(dims)]
    var6 = [
        _round_half_up(
            (sxx[d] - 2.0 * mu[d] * sx[d] + n * mu[d] * mu[d]) / n, 6)
        for d in range(dims)
    ]
    acc = 0.0
    for x in var6:  # left-associated index-order fold (oracle parity)
        acc = acc + x
    total_var = acc

    def _power_kernel(weights):
        W = np.array(weights, dtype=np.float64)

        def gen(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.array(pdf["__x"].tolist(), dtype=np.float64)
                t = np.zeros(len(X), dtype=np.float64)
                for i in range(X.shape[1]):
                    t += X[:, i] * W[i]
                yield pd.DataFrame({
                    "__d": np.arange(X.shape[1], dtype=np.int32),
                    "__a": t @ X,
                })

        return gen

    def _centered_round(raw, weights):
        # c = µ̂·v and T = Σ_rows t = Σ_i v_i·Σx_i, both index-order folds
        c = 0.0
        t_tot = 0.0
        for i in range(dims):
            c = c + mu[i] * weights[i]
            t_tot = t_tot + weights[i] * sx[i]
        return [
            _round_half_up(
                (raw[d] - c * sx[d] - mu[d] * t_tot + n * c * mu[d]) / n, 6)
            for d in range(dims)
        ]

    def _norm(u):
        acc = 0.0
        for x in u:
            acc = acc + x * x
        return math.sqrt(acc)

    # round 1 came free with the moment pass (v = e_0 → raw = Σ x_d·x_0)
    v = [1.0] + [0.0] * (dims - 1)
    eig = 0.0
    u = _centered_round(sxv, v)
    eig = _norm(u)
    if eig != 0.0:
        v = [x / eig for x in u]
        for _ in range(iters - 1):
            raw_rows = (
                emb.mapInPandas(_power_kernel(v), "__d int, __a double")
                .groupBy("__d").agg(F.sum("__a").alias("__a"))
                .collect()
            )
            raw = [0.0] * dims
            for r in raw_rows:
                raw[r["__d"]] = r["__a"]
            u = _centered_round(raw, v)
            eig = _norm(u)
            if eig == 0.0:  # degenerate (all-constant dims): keep v
                break
            v = [x / eig for x in u]

    return {
        "emb": emb, "mu": mu, "sx": sx, "sxx": sxx, "var6": var6, "n": n,
        "dims": dims, "total_var": total_var, "eig": eig, "v": v,
    }


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
    rounds of v ← normalize(Cv) with C = (1/n)·Σ x_c x_cᵀ applied
    matrix-free; per-round per-dim totals round to 6 decimals at the
    driver so aggregation-order ulp noise dies at every round boundary,
    and the normalization is a left-associated index-order fold over
    those rounded values (identical IEEE ops in any engine).

    Returns one row per dimension: (dim 1-based, loading = final unit
    eigenvector component rounded 4, eigenvalue = ‖Cv‖ of the last round
    rounded 6, ev_share = eigenvalue / total variance rounded 4).

    Scale shape (r7 verdict #4): ``iters`` corpus passes TOTAL — the
    mean pass, the variance pass, and round 1 are ONE fused Arrow-kernel
    moment pass (see _pca_core; was mean + iters + variance = 5 passes).
    Each pass is a map + keyed (dim) agg of ≤dims groups; driver state
    is one dim-length vector (bounded-collect family, like kmeans'
    k×dim matrix)."""
    spark = corpus.sparkSession
    schema = "dim int, loading double, eigenvalue double, ev_share double"
    core = _pca_core(corpus, iters, vec_col)
    if core is None:
        return spark.createDataFrame([], schema)
    v, eig, total_var = core["v"], core["eig"], core["total_var"]
    rows = [
        (d + 1, round(v[d], 4), round(eig, 6),
         round(eig / total_var, 4) if total_var > 0 else 0.0)
        for d in range(core["dims"])
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
    rounded-6 per-dim means, and both variance totals derive from raw
    moments rounded 6 after full aggregation (the _pca_core algebra).
    The anisotropy ratios are emitted UNROUNDED — they are pure
    index-order arithmetic over the rounded per-dim variances, so any
    engine reproduces them bit-for-bit.

    Scale shape (r7 verdict #4): iters+1 corpus passes TOTAL — the pca
    chain's fused ``iters`` passes plus ONE residual-moment kernel pass
    (was pca's 5 + a redundant mean pass + the variance pass = 7):
    var_before comes free from the core's moment pass, and var_after
    expands to  Σx_cd² − 2·U_d·Σx_cd·s + U_d²·Σs²  whose two new terms
    (per-dim Σ x_d·t and the scalar Σt², t = x·U row-local) are this
    pass's partials; the driver applies the exact centering algebra.
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    schema = ("dim int, var_before double, var_after double, "
              "anis_before double, anis_after double")
    core = _pca_core(corpus, iters, vec_col)
    if core is None:
        return spark.createDataFrame([], schema)
    emb, dims, n = core["emb"], core["dims"], core["n"]
    mu, sx, vb = core["mu"], core["sx"], core["var6"]
    U = [round(x, 4) for x in core["v"]]
    UV = np.array(U, dtype=np.float64)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf["__x"].tolist(), dtype=np.float64)
            t = np.zeros(len(X), dtype=np.float64)
            for i in range(X.shape[1]):
                t += X[:, i] * UV[i]
            yield pd.DataFrame({
                "__d": np.arange(X.shape[1] + 1, dtype=np.int32) - 1,
                "__a": np.concatenate(([float(t @ t)], t @ X)),
            })

    tot = (
        emb.mapInPandas(gen, "__d int, __a double")
        .groupBy("__d").agg(F.sum("__a").alias("__a"))
        .collect()
    )
    a = [0.0] * dims
    st2 = 0.0  # Σ t² (sentinel row __d = -1)
    for r in tot:
        if r["__d"] < 0:
            st2 = r["__a"]
        else:
            a[r["__d"]] = r["__a"]
    # c = µ̂·U, T = Σ_rows t = Σ_i U_i·Σx_i (index-order folds);
    # Σs² = Σt² − 2cT + nc², M_d = Σ x_cd·s = a_d − c·sx_d − µ̂_d·T + ncµ̂_d
    c = 0.0
    t_tot = 0.0
    for i in range(dims):
        c = c + mu[i] * U[i]
        t_tot = t_tot + U[i] * sx[i]
    ss2 = st2 - 2.0 * c * t_tot + n * c * c
    sxx = core["sxx"]
    va = [0.0] * dims
    for d in range(dims):
        # Σ x_cd·s  and  Σ x_cd² from raw moments (exact centering algebra)
        m_d = a[d] - c * sx[d] - mu[d] * t_tot + n * c * mu[d]
        xc2 = sxx[d] - 2.0 * mu[d] * sx[d] + n * mu[d] * mu[d]
        va[d] = _round_half_up(
            (xc2 - 2.0 * U[d] * m_d + U[d] * U[d] * ss2) / n, 6)

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
    state is one weight vector (bounded-collect family). iters+1 corpus
    passes TOTAL (r7 verdict #4): the former dims/n head job is fused
    into step 1's kernel — with w₀ = 0, z = 0 and σ(z) = 0.5 exactly, so
    the kernel needs no weight vector, and it emits the row count
    alongside the gradient partials (dims fall out of the collect).
    """
    spark = corpus.sparkSession
    schema = "dim int, weight double, accuracy double"
    emb = corpus.select(
        F.concat(
            F.col(vec_col).cast("array<double>"), F.array(F.lit(1.0))
        ).alias("__x"),
        (F.col(label_col) % 2).cast("double").alias("__y"),
    ).localCheckpoint(eager=False)
    import numpy as np
    import pandas as pd

    # Arrow kernel per GD step (the pca_power carve-out: the per-row
    # fold + posexplode shape measured 21.9 s at the 10x corpus on
    # interpreted-lambda overhead). z accumulates x_i*w_i with i
    # ascending (the fold's left-associated order); numpy rounding
    # differs from HALF_UP only at exact decimal ties (measure-zero for
    # sigmoid outputs / float products — the pq._codes_udf precedent).
    def _grad_partials(wv):
        W = None if wv is None else np.array(wv, dtype=np.float64)

        def gen(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.array(pdf["__x"].tolist(), dtype=np.float64)
                if W is None:  # step 1: w = 0 ⇒ σ(z) = 0.5 exactly
                    pr = np.full(len(X), 0.5, dtype=np.float64)
                else:
                    z = np.zeros(len(X), dtype=np.float64)
                    for i in range(X.shape[1]):
                        z += X[:, i] * W[i]
                    pr = np.round(1.0 / (1.0 + np.exp(-z)), 8)
                e = pr - pdf["__y"].to_numpy(dtype=np.float64)
                g8 = np.round(X * e[:, None] * 1e8).astype(np.int64)
                yield pd.DataFrame({
                    "__d": np.arange(X.shape[1], dtype=np.int32),
                    "__g8": g8.sum(axis=0),
                    "__n": np.full(X.shape[1], len(X), dtype=np.int64),
                })

        return gen

    if iters < 1:
        raise ValueError("logreg_train needs iters >= 1")
    w = None  # step-1 sentinel: implicit zero vector of unknown dims
    dims = n = 0
    for _ in range(iters):
        g_rows = (
            emb.mapInPandas(_grad_partials(w), "__d int, __g8 long, __n long")
            .groupBy("__d").agg(F.sum("__g8").alias("__g8"),
                                F.sum("__n").alias("__n"))
            .collect()
        )
        if not g_rows:
            return spark.createDataFrame([], schema)
        if w is None:  # dims and n fall out of the fused first pass
            dims = max(r["__d"] for r in g_rows) + 1
            n = g_rows[0]["__n"]
            w = [0.0] * dims
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
