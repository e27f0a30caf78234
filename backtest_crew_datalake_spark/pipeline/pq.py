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

import pandas as pd
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


def _collect_codebook(codebooks: DataFrame, m: int, d: int):
    """Materialize the trained codebook as an (m, ksub, d) float64 ndarray.

    The collect is bounded BY CONSTRUCTION at m·ksub rows (128 for the
    defaults) — the same bounded-driver-state exception as the writer's
    capped planning collect. ksub is taken from the data so degenerate
    corpora (< ksub seed rows) keep working."""
    rows = codebooks.select("sub_id", "centroid_id", "centroid").collect()
    return _rows_to_codebook(rows, m, d)


def _rows_to_codebook(rows, m: int, d: int):
    """(sub_id, centroid_id, centroid) rows → (m, ksub, d) float64 ndarray."""
    import numpy as np

    if not rows:
        raise ValueError(
            "empty PQ codebook: the training corpus produced no centroids "
            "(no vectors?) — train pq_codebooks on a non-empty corpus"
        )
    ksub = max(r.centroid_id for r in rows) + 1
    C = np.zeros((m, ksub, d), dtype=np.float64)
    for r in rows:
        C[r.sub_id, r.centroid_id] = r.centroid
    return C


def _codes_udf(C, m: int, d: int):
    """Arrow-batched PQ code assignment: vector column → array<int> of m
    codes against the broadcast ndarray codebook ``C``.

    WHY a pandas_udf and not expressions: the kernel is m·ksub tiny
    (d-dim) distances per row. Every pure-expression shape was measured at
    100 k rows × m=8 × ksub=16 on this box and lost by orders of
    magnitude — higher-order functions (zip_with/aggregate/transform)
    pay ~µs-level interpreted overhead PER INVOCATION (12.8 M calls →
    48-244 s), and statically unrolled least/CASE argmin trees blow past
    the codegen method limit and fall back to interpreted eval (69 s +
    36 s of plan time). The numpy kernel runs the same flops vectorized
    in ~0.1 s; Arrow transfer dominates. This is exactly the
    'vectorized Pandas UDF for dense math' carve-out — the surrounding
    plan (broadcast, joins, aggregation) stays JVM-side.

    Value-exactness vs the DuckDB oracles: the subspace distance
    accumulates (x_i − c_i)² with i ascending via repeated `acc +=`, the
    same left-associated order as the oracles' explicit `+` chain (each
    elementwise IEEE op is identical), and np.argmin takes the FIRST
    minimum — ties → lowest centroid id, matching min(struct(d2, cid))."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def enc(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        X = np.array(vs.tolist(), dtype=np.float64)
        ksub = C.shape[1]
        out = np.empty((X.shape[0], m), dtype=np.int32)
        for j in range(m):
            Xs = X[:, j * d:(j + 1) * d]
            acc = np.zeros((X.shape[0], ksub), dtype=np.float64)
            for i in range(d):
                diff = Xs[:, i, None] - C[j, None, :, i]
                acc += diff * diff
            out[:, j] = np.argmin(acc, axis=1)
        return pd.Series(list(out))

    return enc


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
    empty cells keep their previous centroid.

    Scale shape per round: assignment is ROW-LOCAL (the Arrow-batched
    _codes_udf kernel against the collected literal codebook), the
    per-(vector, subspace) explode is narrow, and the only shuffle is
    lloyd_means' keyed (sub, cell, dim) partial aggregation — a few KB
    regardless of corpus size."""
    d = dim // m

    from pyspark.sql import Window

    # Unpartitioned window is safe here: it runs AFTER the limit, over the
    # ksub surviving rows (a bounded constant), never over the corpus.
    seed_w = Window.orderBy("__id")
    seeds = (
        corpus.select(F.col(id_col).alias("__id"), F.col(vec_col))
        .orderBy("__id").limit(ksub)
        .withColumn("centroid_id", F.row_number().over(seed_w) - 1)
    )
    cb = (
        _subvectors(seeds.drop("__id"), "centroid_id", vec_col, m, d)
        .select("sub_id", F.col("__id").alias("centroid_id"),
                F.col("sub").alias("centroid"))
    )
    from .similarity import lloyd_means

    vec = F.col(vec_col).cast("array<double>")
    spark = corpus.sparkSession
    # Each round materializes the m·ksub-row codebook to the driver (the
    # bounded collect _collect_codebook documents) and feeds it back BOTH
    # as the Arrow kernel's literal ndarray AND as a literal DataFrame —
    # so round r+1's plan depends on the corpus and a constant, not on
    # round r's plan: one corpus pass per round, constant lineage depth,
    # and the old per-round checkpoint is unnecessary.
    for _ in range(iters):
        rows = cb.select("sub_id", "centroid_id", "centroid").collect()
        cb = spark.createDataFrame(
            [(r.sub_id, r.centroid_id, [float(x) for x in r.centroid])
             for r in rows],
            "sub_id int, centroid_id int, centroid array<double>",
        )
        enc = _codes_udf(_rows_to_codebook(rows, m, d), m, d)
        assigned = (
            corpus.select(enc(vec).alias("__codes"), vec.alias("__v"))
            .select(
                F.explode(F.array(*[
                    F.struct(
                        F.lit(j).alias("sub_id"),
                        F.element_at("__codes", j + 1).alias("centroid_id"),
                        F.slice("__v", j * d + 1, d).alias("sub"),
                    )
                    for j in range(m)
                ])).alias("a")
            )
            .select("a.sub_id", "a.centroid_id", "a.sub")
        )
        means = lloyd_means(
            assigned,
            ["sub_id", "centroid_id"], "sub", "__nv",
        )
        cb = cb.join(means, ["sub_id", "centroid_id"], "left").select(
            "sub_id", "centroid_id",
            F.coalesce(F.col("__nv"), F.col("centroid")).alias("centroid"),
        )
    # materialize the FINAL codebook literal too: every consumer
    # (pq_encode's kernel collect, the ADC LUT's broadcast join) then works
    # from a local relation instead of re-running the last Lloyd round —
    # one m·ksub-row collect here deletes one corpus-pass job per consumer
    rows = cb.select("sub_id", "centroid_id", "centroid").collect()
    return spark.createDataFrame(
        [(r.sub_id, r.centroid_id, [float(x) for x in r.centroid])
         for r in rows],
        "sub_id int, centroid_id int, centroid array<double>",
    )


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Encode vectors to PQ codes: (``id_col``, *keep, codes array<int>
    length m). Row-local: the codebook ships as a literal ndarray into the
    Arrow-batched kernel (_codes_udf — see there for why expressions lose
    by 30-100×), so encoding is a pure map stage: no fan-out, no shuffle,
    no re-grouping (``keep`` columns pass through for free, which lets
    IVF carry list ids without a join)."""
    d = dim // m
    enc = _codes_udf(_collect_codebook(codebooks, m, d), m, d)
    return df.select(
        F.col(id_col), *[F.col(c) for c in keep],
        enc(F.col(vec_col).cast("array<double>")).alias("codes"),
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

    # The coarse centroids feed THREE consumers (corpus assignment, query
    # probing, residual centering) and the assigned corpus feeds three more
    # (codebook seeds, the Lloyd round, encode + final scoring) — without a
    # checkpoint each consumer's action re-runs the whole upstream Lloyd
    # pipeline (measured: ~39 Spark jobs per query, ~3× recompute of the
    # corpus pass). localCheckpoint(eager=False) materializes each subtree
    # once at first use: cent is nlist rows; enc_corpus is one cached pass
    # over the corpus — the same working-set cache every iterative ANN
    # index build holds, and the same discipline as the Lloyd loops.
    cent = kmeans_centroids(corpus, k=nlist, iters=iters,
                            id_col=id_col, vec_col=vec_col)
    cent = cent.localCheckpoint(eager=False)
    # Row-local assignment (see kmeans_assign) keeps the list id ON the
    # corpus row, and row-local pq_encode passes it through — so the
    # encoded+listed candidate table comes out of ONE map pass over the
    # corpus, with no codes⋈lists join at all.
    assigned = kmeans_assign(corpus, cent, id_col=id_col, vec_col=vec_col)

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
                F.col("centroid_id").alias("list_id"),
                minus(F.col(vec_col), F.col("__centv")).alias(vec_col),
            )
        )
    else:
        enc_corpus = assigned.select(
            F.col(id_col), F.col("centroid_id").alias("list_id"), vec_col
        )
    enc_corpus = enc_corpus.localCheckpoint(eager=False)

    cb = pq_codebooks(enc_corpus, m=m, ksub=ksub, iters=iters, dim=dim,
                      id_col=id_col, vec_col=vec_col)
    codes = pq_encode(enc_corpus, cb, m=m, dim=dim,
                      id_col=id_col, vec_col=vec_col, keep=("list_id",))
    cand = codes.select(
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
