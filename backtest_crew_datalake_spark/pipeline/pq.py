"""Product quantization (PQ) for ANN at scale — the classic IVF-PQ building
block (Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011), expressed entirely as DataFrame ops.

- pq_codebooks : per-subspace k-means codebooks (Lloyd iterations over the
  exploded (sub_id, subvector) table — all subspaces trained in ONE grouped
  flow, not m separate jobs).
- pq_encode    : corpus → m small codes per vector (the 100 TB win: a
  64-dim float vector compresses to m bytes, so the candidate scan reads
  codes, not vectors).
- pq_topk      : asymmetric distance computation (ADC): the query builds an
  m×ksub lookup table of exact subspace distances, candidates sum m lookups.
  As joins: LUT ⋈ codes on (sub_id, code) then groupBy(query, vec) SUM.

Everything is deterministic (init = the ksub lowest-id vectors' subvectors,
ties → lowest centroid id) so tests can differential against numpy.

Scale shape: codebooks are m·ksub rows (broadcast); encoding is one
streaming pass over the corpus (broadcast join + per-(vec,sub) top-1);
ADC's shuffle is keyed (query_id, vec_id) over candidate×m rows — at scale
you first block candidates with IVF lists (similarity.ivf_topk) or LSH
buckets and ADC only the shortlist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .similarity import _sqdist


def _subvectors(df: DataFrame, id_col: str, vec_col: str, m: int, d: int):
    """(id, sub_id, sub) — the vector split into m contiguous d-dim chunks."""
    chunks = F.array(*[
        F.slice(F.col(vec_col).cast("array<double>"), j * d + 1, d)
        for j in range(m)
    ])
    return df.select(
        F.col(id_col).alias("__id"), F.posexplode(chunks).alias("sub_id", "sub")
    )


def _assign_codes(subs: DataFrame, codebooks: DataFrame) -> DataFrame:
    """Nearest centroid per (row, subspace): L2, ties → lowest centroid_id.

    Argmin as a hash aggregate over min(struct(d2, cid)) — same result as
    a rank-1 window (struct ordering compares d2 then cid) but the ×ksub
    fan-out collapses map-side in partial aggregation, so the shuffle
    carries one row per (vector, subspace) instead of window-sorting
    N·m·ksub rows."""
    cb = F.broadcast(
        codebooks.select(
            "sub_id", F.col("centroid_id").alias("__cid"),
            F.col("centroid").alias("__cv"),
        )
    )
    d2 = _sqdist(F.col("sub"), F.col("__cv"))
    return (
        subs.join(cb, "sub_id")
        .withColumn("__sc", F.struct(d2.alias("d2"), F.col("__cid").alias("cid")))
        .groupBy("__id", "sub_id", "sub")
        .agg(F.min("__sc").alias("__m"))
        .select("__id", "sub_id", "sub", F.col("__m.cid").alias("code"))
    )


def pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train per-subspace codebooks: (sub_id, centroid_id, centroid).

    Init: subvectors of the ksub lowest-id corpus rows (centroid_id =
    0..ksub-1 in that id order). Then ``iters`` Lloyd rounds over ALL
    subspaces at once — the grouped analogue of similarity.kmeans_centroids;
    empty cells keep their previous centroid."""
    d = dim // m
    subs = _subvectors(corpus, id_col, vec_col, m, d)

    from pyspark.sql import Window

    # Unpartitioned window is safe here: it runs AFTER the limit, over the
    # ksub surviving rows (a bounded constant), never over the corpus.
    seed_w = Window.orderBy("__id")
    seeds = (
        corpus.select(F.col(id_col).alias("__id"))
        .orderBy("__id").limit(ksub)
        .withColumn("centroid_id", F.row_number().over(seed_w) - 1)
    )
    cb = (
        subs.join(seeds, "__id")
        .select("sub_id", "centroid_id", F.col("sub").alias("centroid"))
    )
    from .similarity import lloyd_means

    # Same lineage/recompute guard as similarity.kmeans_centroids: from 2
    # Lloyd rounds up, checkpoint the m·ksub-row codebook each round.
    checkpoint = iters >= 2
    for _ in range(iters):
        assigned = _assign_codes(subs, cb)
        means = lloyd_means(
            assigned.select("sub_id", F.col("code").alias("centroid_id"),
                            F.col("sub")),
            ["sub_id", "centroid_id"], "sub", "__nv",
        )
        cb = cb.join(means, ["sub_id", "centroid_id"], "left").select(
            "sub_id", "centroid_id",
            F.coalesce(F.col("__nv"), F.col("centroid")).alias("centroid"),
        )
        if checkpoint:
            cb = cb.localCheckpoint(eager=False)
    return cb


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors to PQ codes: (``id_col``, codes array<int> length m)."""
    d = dim // m
    subs = _subvectors(df, id_col, vec_col, m, d)
    codes = _assign_codes(subs, codebooks)
    return (
        codes.groupBy("__id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub_id", "code"))),
                lambda s: s["code"],
            ).alias("codes")
        )
        .select(F.col("__id").alias(id_col), "codes")
    )


def pq_topk(
    queries: DataFrame,
    corpus_codes: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """ADC top-k: approximate L2² distance = Σ_sub d²(q_sub, centroid[code]).

    Output (query_id, neighbor_id, approx_d2, rank), rank by ascending
    distance, ties → lowest neighbor_id. Queries' LUTs are exact subspace
    distances; only the corpus side is quantized (the 'asymmetric' in ADC).
    """
    from pyspark.sql import Window

    d = dim // m
    qsubs = _subvectors(queries, id_col, vec_col, m, d).withColumnRenamed(
        "__id", "query_id"
    )
    cb = F.broadcast(codebooks)
    lut = qsubs.join(cb, "sub_id").select(
        "query_id", "sub_id", F.col("centroid_id").alias("code"),
        _sqdist(F.col("sub"), F.col("centroid")).alias("__d2"),
    )
    cand = corpus_codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode("codes").alias("sub_id", "code"),
    )
    scored = (
        cand.join(F.broadcast(lut), ["sub_id", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("__d2").alias("__dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round("__dist", round_to).alias("approx_d2"), "rank")
    )


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    m: int = 8,
    ksub: int = 16,
    iters: int = 1,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    residual: bool = False,
) -> DataFrame:
    """IVF-PQ: coarse k-means lists shortlist the candidates, PQ/ADC ranks
    them — the standard billion-scale ANN architecture, composed from this
    repo's two oracle-tested pieces (similarity.kmeans_* for the coarse
    quantizer, pq_* for the fine one).

    ``residual=False`` quantizes raw vectors (each stage independently
    testable); ``residual=True`` is the classic IVFADC: the PQ codebooks
    are trained on (vector − list centroid) residuals, which concentrates
    the quantizer's resolution on the within-list variance — queries then
    build one distance LUT per probed list (against q − centroid_list).
    Both paths are deterministic.

    Scale shape: both quantizers broadcast; the candidate set is
    corpus/nlist·nprobe rows of m-byte codes, joined to the query LUT on
    (sub_id, code) after an equi-join on list_id — every join keyed,
    nothing quadratic. The residual LUT is nprobe× larger per query (one
    per probed list) and still broadcast-sized. Output schema matches
    pq_topk.
    """
    from pyspark.sql import Window

    from .similarity import kmeans_assign, kmeans_centroids

    cent = kmeans_centroids(corpus, k=nlist, iters=iters,
                            id_col=id_col, vec_col=vec_col)
    assigned = kmeans_assign(corpus, cent, id_col=id_col, vec_col=vec_col)
    lists = assigned.select(F.col(id_col), F.col("centroid_id").alias("list_id"))

    minus = lambda a, b: F.zip_with(  # noqa: E731
        a, b, lambda x, y: x.cast("double") - y.cast("double")
    )
    if residual:
        centv = cent.select(
            F.col("centroid_id"), F.col(vec_col).alias("__centv")
        )
        enc_corpus = (
            assigned.join(F.broadcast(centv), "centroid_id")
            .select(
                F.col(id_col),
                minus(F.col(vec_col), F.col("__centv")).alias(vec_col),
            )
        )
    else:
        enc_corpus = corpus.select(id_col, vec_col)

    cb = pq_codebooks(enc_corpus, m=m, ksub=ksub, iters=iters, dim=dim,
                      id_col=id_col, vec_col=vec_col)
    codes = pq_encode(enc_corpus, cb, m=m, dim=dim,
                      id_col=id_col, vec_col=vec_col)
    cand = codes.join(lists, id_col).select(
        F.col(id_col).alias("neighbor_id"), "list_id",
        F.posexplode("codes").alias("sub_id", "code"),
    )

    probes = kmeans_assign(queries, cent, id_col=id_col, vec_col=vec_col,
                           topn=nprobe).select(
        F.col(id_col).alias("query_id"), F.col(vec_col),
        F.col("centroid_id").alias("list_id"),
    )
    d = dim // m
    probe_pairs = probes.select("query_id", "list_id")
    if residual:
        centv = cent.select(
            F.col("centroid_id").alias("list_id"), F.col(vec_col).alias("__centv")
        )
        qres = probes.join(F.broadcast(centv), "list_id").select(
            "query_id", "list_id",
            minus(F.col(vec_col), F.col("__centv")).alias(vec_col),
        )
        # one LUT per (query, probed list): key the subvector split by both
        qsubs = _subvectors(
            qres.withColumn("__qid", F.concat_ws("|", "query_id", "list_id")),
            "__qid", vec_col, m, d,
        )
        qkeys = qres.select(
            F.concat_ws("|", "query_id", "list_id").alias("__id"),
            "query_id", "list_id",
        )
        lut = (
            qsubs.join(qkeys, "__id")
            .join(F.broadcast(cb), "sub_id")
            .select(
                "query_id", "list_id", "sub_id",
                F.col("centroid_id").alias("code"),
                _sqdist(F.col("sub"), F.col("centroid")).alias("__d2"),
            )
        )
        scored = (
            cand.join(F.broadcast(probe_pairs), "list_id")
            .join(F.broadcast(lut),
                  ["query_id", "list_id", "sub_id", "code"])
            .groupBy("query_id", "neighbor_id")
            .agg(F.sum("__d2").alias("__dist"))
        )
    else:
        qsubs = _subvectors(
            probes.select("query_id", vec_col).distinct(), "query_id",
            vec_col, m, d,
        ).withColumnRenamed("__id", "query_id")
        lut = qsubs.join(F.broadcast(cb), "sub_id").select(
            "query_id", "sub_id", F.col("centroid_id").alias("code"),
            _sqdist(F.col("sub"), F.col("centroid")).alias("__d2"),
        )
        scored = (
            cand.join(F.broadcast(probe_pairs), "list_id")
            .join(F.broadcast(lut), ["query_id", "sub_id", "code"])
            .groupBy("query_id", "neighbor_id")
            .agg(F.sum("__d2").alias("__dist"))
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round("__dist", round_to).alias("approx_d2"), "rank")
    )
