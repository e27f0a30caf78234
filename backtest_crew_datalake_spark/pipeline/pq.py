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


def _train_codebooks_np(
    corpus: DataFrame,
    m: int,
    ksub: int,
    iters: int,
    dim: int,
    id_col: str,
    vec_col: str,
    init_rows=None,
):
    """Lloyd-train the (m, ksub_actual, d) codebook ndarray — the shared
    kernel behind pq_codebooks and ivf_pq_topk's fused path.

    Driver-anchored, MLlib-style (same shape as similarity.
    kmeans_centroids): the ONLY driver state is the codebook matrix; per
    round the assignment is row-local (_codes_udf against the literal
    ndarray) and the ONE job is lloyd_means' keyed (sub, cell, dim)
    collect — m·ksub·d doubles regardless of corpus size. Jobs = 1 seed
    collect (skipped when ``init_rows`` is passed) + ``iters``; the old
    shape re-joined the means into a codebook DataFrame and collected it
    again per round, which doubled the corpus passes for nothing — the
    means ARE the new codebook, and they were already collected.

    ``init_rows``: optional pre-collected ``[(id, [float]*dim)]`` seed
    rows (the ksub lowest corpus ids). Callers that already hold them —
    ivf_pq_topk's fused seed collect — pass them to delete the seed job.

    Value-exact vs the old per-round-collect flow: both roundtrip the
    means through the driver each round (collect → float64 → literal), so
    every arithmetic step sees identical IEEE doubles.
    """
    import numpy as np

    d = dim // m
    vec = F.col(vec_col).cast("array<double>")
    if init_rows is None:
        init_rows = [
            (r["__id"], list(r["__v"]))
            for r in corpus.select(
                F.col(id_col).alias("__id"), vec.alias("__v")
            ).orderBy("__id").limit(ksub).collect()
        ]
    init_rows = sorted(init_rows, key=lambda t: t[0])[:ksub]
    if not init_rows:
        raise ValueError(
            "empty PQ codebook: the training corpus produced no centroids "
            "(no vectors?) — train pq_codebooks on a non-empty corpus"
        )
    # seed: centroid i of subspace j = seed row i's j-th subvector,
    # centroid_id = 0..n-1 in ascending seed-id order (same init as the
    # old row_number-over-id seeding)
    ks = len(init_rows)
    C = (
        np.array([v for _, v in init_rows], dtype=np.float64)
        .reshape(ks, m, d).transpose(1, 0, 2).copy()
    )
    from .similarity import collect_lloyd_means

    for _ in range(iters):
        enc = _codes_udf(C, m, d)
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
        # bounded: m·ksub×d rows; one exchange (collect_lloyd_means)
        got = collect_lloyd_means(assigned, ["sub_id", "centroid_id"], "sub")
        # empty cells keep their previous centroid
        C = np.array(
            [[got.get((j, i), C[j, i]) for i in range(ks)]
             for j in range(m)],
            dtype=np.float64,
        )
    return C


def _codebook_df(spark, C):
    """(m, ksub, d) ndarray → the (sub_id, centroid_id, centroid) literal
    local relation every consumer broadcasts."""
    return spark.createDataFrame(
        [(j, i, [float(x) for x in C[j, i]])
         for j in range(C.shape[0]) for i in range(C.shape[1])],
        "sub_id int, centroid_id int, centroid array<double>",
    )


def pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_rows=None,
) -> DataFrame:
    """Train per-subspace codebooks: (sub_id, centroid_id, centroid).

    Init: subvectors of the ksub lowest-id corpus rows (centroid_id =
    0..ksub-1 in that id order). Then ``iters`` Lloyd rounds over ALL
    subspaces at once — the grouped analogue of similarity.kmeans_centroids;
    empty cells keep their previous centroid. Returns a LITERAL local
    relation (downstream broadcasts start from m·ksub in-memory rows).

    Scale/job shape: see _train_codebooks_np — one row-local assignment +
    keyed-means job per round, one bounded seed collect (skippable via
    ``init_rows``)."""
    return _codebook_df(
        corpus.sparkSession,
        _train_codebooks_np(corpus, m, ksub, iters, dim, id_col, vec_col,
                            init_rows=init_rows),
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

    Job/action shape (the r9-profiled fixed cost — 23 jobs/7-9 s at
    sf0.1, floor-dominated): ONE pinned projection of the corpus feeds
    every stage; the seed rows for BOTH quantizers come from ONE bounded
    collect (the coarse init is the nlist lowest ids, the PQ init the
    ksub lowest — one limit covers both, and in residual mode the PQ
    seeds are derived driver-side with the same IEEE float64 ops the
    kernel applies); both Lloyd loops are driver-anchored (one
    means-collect job per round); and the trained codebook is already an
    ndarray, so encode never collects. Total: 1 seed job + ``iters``
    coarse rounds + ``iters`` PQ rounds + the final query action (plus
    its broadcast builds) — measured 23 → 8 jobs at the bench config.
    """
    import numpy as np
    from pyspark.sql import Window

    from .similarity import (
        _assign_kernel_udf, collect_lloyd_means, kmeans_assign,
    )

    spark = corpus.sparkSession
    d = dim // m
    # the ONE pinned corpus projection every stage reads (materialized by
    # the seed collect below; partitions stay executor-resident). NOT
    # spread: a 32-way repartition of the vector column was measured
    # strictly slower here (shuffle of 64-double rows + per-task Arrow
    # setup × every kernel pass beats the single-core kernel cost at
    # bench SF; kmeans_centroids documents the same measurement) — and at
    # scale the scan already yields >= parallelism partitions
    emb = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
    ).localCheckpoint(eager=False)
    id_type = dict(emb.dtypes)[id_col]
    seeds = sorted(
        ((r[0], list(r[1])) for r in
         emb.orderBy(id_col).limit(max(ksub, nlist)).collect()),
        key=lambda t: t[0],
    )
    if not seeds:
        raise ValueError(
            "empty PQ codebook: the training corpus produced no centroids "
            "(no vectors?) — train pq_codebooks on a non-empty corpus"
        )
    # coarse Lloyd, driver-anchored — same kernel + keyed means as
    # kmeans_centroids (value-identical; see _assign_kernel_udf), minus
    # its private checkpoint/seed job (ours are shared)
    cids = [sid for sid, _ in seeds[:nlist]]
    C = np.array([v for _, v in seeds[:nlist]], dtype=np.float64)
    if not residual:
        # r11 (guide §1.2): in non-residual mode the PQ codebooks train on
        # RAW subvectors, so the coarse and PQ Lloyd chains are fully
        # independent — round r of each needs only round r-1 of ITSELF.
        # Fuse them: ONE kernel pass / job per round computes both
        # assignments (two pandas UDFs in one projection share the
        # ArrowEvalPython batch, the vector ships to Python once) and ONE
        # keyed-means exchange carries both mean families, discriminated
        # by sub_id (-1 = coarse, 0..m-1 = PQ) with the cell id cast to
        # string. Value-exact: every (key, pos) group aggregates exactly
        # the addend multiset the two separate jobs aggregated, over the
        # same checkpointed input partitions.
        pq_seed = seeds[:ksub]
        ks = len(pq_seed)
        Cpq = (
            np.array([v for _, v in pq_seed], dtype=np.float64)
            .reshape(ks, m, d).transpose(1, 0, 2).copy()
        )
        for _ in range(iters):
            both = emb.select(
                _assign_kernel_udf(C, cids, id_type)(F.col(vec_col))
                .alias("__cid"),
                _codes_udf(Cpq, m, d)(F.col(vec_col)).alias("__codes"),
                F.col(vec_col).alias("__v"),
            )
            rows = both.select(
                F.explode(F.array(
                    F.struct(
                        F.lit(-1).alias("sub_id"),
                        F.col("__cid").cast("string").alias("code"),
                        F.col("__v").alias("sub"),
                    ),
                    *[
                        F.struct(
                            F.lit(j).alias("sub_id"),
                            F.element_at("__codes", j + 1).cast("string")
                            .alias("code"),
                            F.slice("__v", j * d + 1, d).alias("sub"),
                        )
                        for j in range(m)
                    ],
                )).alias("a")
            ).select("a.sub_id", "a.code", "a.sub")
            # ≤ (nlist + m·ksub)×dim rows, bounded; one exchange
            got = collect_lloyd_means(rows, ["sub_id", "code"], "sub")
            C = np.array(
                [got.get((-1, str(cid)), C[i])
                 for i, cid in enumerate(cids)],
                dtype=np.float64,
            )
            Cpq = np.array(
                [[got.get((j, str(i)), Cpq[j, i]) for i in range(ks)]
                 for j in range(m)],
                dtype=np.float64,
            )
    else:
        for _ in range(iters):
            assigned = emb.withColumn(
                "centroid_id",
                _assign_kernel_udf(C, cids, id_type)(F.col(vec_col)),
            )
            # ≤ nlist×dim rows, bounded; one exchange
            got = collect_lloyd_means(assigned, ["centroid_id"], vec_col)
            C = np.array(
                [got.get(cid, C[i]) for i, cid in enumerate(cids)],
                dtype=np.float64,
            )
    cent = spark.createDataFrame(
        [(cid, [float(x) for x in C[i]]) for i, cid in enumerate(cids)],
        f"centroid_id {id_type}, {vec_col} array<double>",
    )
    # row-local corpus listing: the Arrow kernel IS kmeans_assign's
    # argmin (identical accumulation order and first-min tie rule)
    listed = emb.withColumn(
        "list_id", _assign_kernel_udf(C, cids, id_type)(F.col(vec_col))
    )

    minus = lambda a, b: F.zip_with(  # noqa: E731
        a, b, lambda x, y: x.cast("double") - y.cast("double")
    )
    if residual:
        centv = cent.select(
            F.col("centroid_id").alias("list_id"),
            F.col(vec_col).alias("__centv"),
        )
        enc_corpus = (
            listed.join(F.broadcast(centv), "list_id")
            .select(
                F.col(id_col), "list_id",
                minus(F.col(vec_col), F.col("__centv")).alias(vec_col),
            )
        )
        # PQ seeds in residual space, derived driver-side: assign each
        # seed vector with the SAME per-dimension `acc += diff*diff`
        # order and first-min rule as the kernel, subtract its centroid
        # elementwise — every op an IEEE double, bit-equal to the
        # distributed path it replaces
        pq_init = []
        for sid, v in seeds[:ksub]:
            x = np.asarray(v, dtype=np.float64)
            acc = np.zeros(C.shape[0], dtype=np.float64)
            for i in range(C.shape[1]):
                diff = x[i] - C[:, i]
                acc += diff * diff
            pq_init.append((sid, list(x - C[int(np.argmin(acc))])))
        # residual PQ depends on the FINAL coarse centroids, so its
        # training stays sequential
        Cpq = _train_codebooks_np(enc_corpus, m, ksub, iters, dim,
                                  id_col, vec_col, init_rows=pq_init)
    else:
        enc_corpus = listed.select(F.col(id_col), "list_id", vec_col)
        # Cpq already trained in the fused loop above
    cb = _codebook_df(spark, Cpq)
    # encode straight from the trained ndarray — no codebook collect job
    codes = enc_corpus.select(
        F.col(id_col), "list_id",
        _codes_udf(Cpq, m, d)(F.col(vec_col).cast("array<double>"))
        .alias("codes"),
    )
    cand = codes.select(
        F.col(id_col).alias("neighbor_id"), "list_id",
        F.posexplode("codes").alias("sub_id", "code"),
    )

    # query probing as a LITERAL-centroid expression — the exact
    # kmeans_assign(topn=nprobe) semantics (_sqdist HOF per centroid,
    # array_sort over (d2, cid) structs → ties to lowest cid) with the
    # centroid table inlined: no spread-repartition, no broadcast-agg
    # build job, just a map over the (tiny, by contract) query side
    cents_lit = F.array(*[
        F.struct(
            F.lit(cid).cast(id_type).alias("cid"),
            F.array(*[F.lit(float(x)) for x in C[i]]).alias("cv"),
        )
        for i, cid in enumerate(cids)
    ])
    dstructs = F.transform(
        cents_lit,
        lambda c: F.struct(
            _sqdist(F.col(vec_col), c["cv"]).alias("d2"),
            c["cid"].alias("cid"),
        ),
    )
    probes = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col))
        .withColumn("__t", F.explode(F.slice(F.array_sort(dstructs),
                                             1, nprobe)))
        .withColumn("list_id", F.col("__t.cid"))
        .drop("__t")
    )
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
        # r12 (guide §1.2/§3): the LUT is already keyed per probed
        # (query, list) pair, so the probe_pairs join is redundant —
        # ONE broadcast join on (list_id, sub_id, code) both restricts
        # cand to probed lists and attaches (query_id, __d2): one
        # broadcast build job instead of two, one hash probe per
        # corpus-code row instead of two
        scored = (
            cand.join(F.broadcast(lut),
                      ["list_id", "sub_id", "code"])
            .groupBy("query_id", "neighbor_id")
            .agg(F.sum("__d2").alias("__dist"))
        )
    else:
        # LUT straight from the query table (ids unique by contract) —
        # deriving it from probes would re-dedupe the nprobe-way explode
        # with a needless distinct exchange
        qsubs = _subvectors(
            queries.select(F.col(id_col).alias("query_id"), vec_col),
            "query_id", vec_col, m, d,
        ).withColumnRenamed("__id", "query_id")
        lut = qsubs.join(F.broadcast(cb), "sub_id").select(
            "query_id", "sub_id", F.col("centroid_id").alias("code"),
            _sqdist(F.col("sub"), F.col("centroid")).alias("__d2"),
        )
        # r12 (guide §1.2/§3): fold the probe filter INTO the LUT on the
        # tiny query side (|q|·nprobe·m·ksub rows, broadcast-bounded by
        # contract), so the corpus-code path pays ONE broadcast join
        # instead of two — same rows: each cand row matches exactly the
        # (query, probed-list) pairs it used to reach through
        # probe_pairs, with the same per-cell __d2
        lut2 = probe_pairs.join(lut, "query_id").select(
            "query_id", "list_id", "sub_id", "code", "__d2",
        )
        scored = (
            cand.join(F.broadcast(lut2), ["list_id", "sub_id", "code"])
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
