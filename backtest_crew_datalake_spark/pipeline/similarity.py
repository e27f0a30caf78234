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
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    sim = _dot(F.col("__qv"), F.col("__cv")) / (
        _norm(F.col("__qv")) * _norm(F.col("__cv"))
    )
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id", "neighbor_id", sim.alias("__sim")
    )
    # rank on the raw similarity; round only the emitted value
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round("__sim", round_to).alias("cos_sim"), "rank")
    )


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

    cent = F.broadcast(centroids.select(
        F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cv")
    ))

    def assign(df, ident, topn):
        d2 = _sqdist(F.col(vec_col), F.col("__cv"))
        w = Window.partitionBy(ident).orderBy(d2.asc(), F.col("__cid").asc())
        return (
            df.crossJoin(cent)
            .withColumn("__crank", F.row_number().over(w))
            .where(F.col("__crank") <= topn)
            .drop("__cv", "__crank")
        )

    lists = assign(
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("__nv")).withColumnRenamed(
                          "__nv", vec_col),
        "neighbor_id", 1,
    ).select("neighbor_id", F.col(vec_col).alias("__cv2"), "__cid")
    probes = assign(
        queries.select(F.col(id_col).alias("query_id"), vec_col),
        "query_id", nprobe,
    ).select("query_id", F.col(vec_col).alias("__qv"), "__cid")

    sim = _dot(F.col("__qv"), F.col("__cv2")) / (
        _norm(F.col("__qv")) * _norm(F.col("__cv2"))
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

    qb = lsh_sign_buckets(queries, vec_col, bits).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"), "bucket"
    )
    cb = lsh_sign_buckets(corpus, vec_col, bits).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"), "bucket"
    )
    sim = _dot(F.col("__qv"), F.col("__cv")) / (
        _norm(F.col("__qv")) * _norm(F.col("__cv"))
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
