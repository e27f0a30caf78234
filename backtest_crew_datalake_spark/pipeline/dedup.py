"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design:
- exact_dedup        : hash-groupBy — one shuffle on the digest; at 100 TB
  the md5 column is 32 bytes/row, the shuffle carries only (digest, doc_id).
- ngram_jaccard_pairs: shingle-explode → self-join on shingle → per-pair
  intersection counts. The shingle join is the classic exact near-dup
  pipeline; frequency capping (drop shingles appearing in > max_df docs)
  bounds the quadratic blowup on boilerplate shingles.
- minhash_dedup_pairs: shingle → k minhashes (per-shingle xxhash64 with k
  seeds, min per doc) → band/bucket grouping → candidate pairs only within a
  bucket (LSH). Shuffle volume is O(docs × bands), independent of document
  length — the 100 TB-safe path.
- simhash            : 64-bit near-dup signature via sign-sum of per-token
  hash bits; Hamming-close signatures = near-dups. Pure built-ins.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, functions as F

from .text import tokens


def spread_partitions(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition by ``cols`` ONLY when the input has fewer partitions than
    the cluster's default parallelism. Single-row-group parquet files scan
    as ONE task, which starves the hash-heavy per-shingle aggregations
    downstream (observed: the 16-way md5 minhash agg pinned to one core).
    At 100 TB the scan already yields >= parallelism partitions and this is
    a no-op — no extra shuffle on the scale path.

    The partition count is pinned explicitly: an unsized repartition(col)
    is an AQE coalesce target, and for a few-KB input AQE merges it back
    to ONE partition — CPU-heavy stages need the split even though the
    bytes are tiny (measured: pinned 32-way is 6x faster than AQE's
    choice on the minhash agg)."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        if cols:  # co-locate by key for downstream keyed aggs
            return df.repartition(sc.defaultParallelism,
                                  *[F.col(c) for c in cols])
        return df.repartition(sc.defaultParallelism)  # round-robin
    return df


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    keep: str = "min",
) -> DataFrame:
    """Exact-content dedup by md5 digest: one surviving id per distinct text
    (keep = min/max id), plus the group size."""
    agg_id = F.min(id_col) if keep == "min" else F.max(id_col)
    return (
        df.withColumn("__digest", F.md5(F.col(text_col).cast("binary")))
        .groupBy("__digest")
        .agg(agg_id.alias(id_col), F.count("*").alias("n_copies"))
        .withColumnRenamed("__digest", "digest")
    )


def _shingles(text_col: str, n: int) -> F.Column:
    """Word n-gram shingles as strings ('w1 w2 … wn')."""
    t = tokens(F.col(text_col))
    idx = F.sequence(F.lit(0), F.size(t) - n)
    return F.when(
        F.size(t) >= n,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)))
        ),
    ).otherwise(F.array(F.concat_ws(" ", t)))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (id_a < id_b, jaccard >= th).

    jaccard = |A∩B| / (|A| + |B| - |A∩B|) over distinct word n-gram sets.
    ``max_df`` drops shingles present in more than max_df docs before
    pairing (boilerplate guard — at scale this caps the join fan-out).

    With ``max_df`` set, pair generation is BUCKET-LOCAL: hot shingles are
    dropped BEFORE any posting list is materialized (a stop-shingle with a
    doc frequency in the millions must never build an array in an agg
    buffer). The doc-frequency count runs as a window aggregate over the
    same shingle-keyed exchange the grouping needs anyway — window state
    spills to disk on skewed keys (ExternalAppendOnlyUnsafeRowArray),
    unlike a hash-agg collect_list buffer — so only rows of rare shingles
    survive to ``collect_list``, whose buffers are then bounded at max_df
    by construction. One keyed shuffle total: the post-window
    groupBy("sh") reuses the window's hash partitioning. The
    ≤ max_df·(max_df-1)/2 ordered pairs per surviving shingle are emitted
    in-row, and the doc sizes fall out of the same grouped table. Without
    a cap the posting lists are unbounded and the general self-join shape
    is used.
    """
    sh = (
        df.select(F.col(id_col).alias("id"), F.explode(_shingles(text_col, n)).alias("sh"))
    )
    if max_df is not None:
        from pyspark.sql import Window

        # (id, sh) rows are distinct per doc (array_distinct in _shingles),
        # so count(*) per shingle IS its document frequency.
        wdf = Window.partitionBy("sh")
        groups = (
            sh.withColumn("__df", F.count("*").over(wdf))
            .where(F.col("__df") <= max_df)
            .groupBy("sh")
            .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        )
        sizes = (
            groups.select(F.explode("ids").alias("id"))
            .groupBy("id").agg(F.count("*").alias("sz"))
        )
        pair_expr = F.expr(
            "flatten(transform(ids, (a, i) -> "
            "transform(slice(ids, i + 2, size(ids)), "
            "b -> struct(a AS id_a, b AS id_b))))"
        )
        inter = (
            groups.where(F.size("ids") >= 2)
            .select(F.explode(pair_expr).alias("p"))
            .groupBy(F.col("p.id_a").alias("id_a"),
                     F.col("p.id_b").alias("id_b"))
            .agg(F.count("*").alias("n_inter"))
        )
    else:
        sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
        a, b = sh.alias("a"), sh.alias("b")
        inter = (
            a.join(b, (F.col("a.sh") == F.col("b.sh"))
                   & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count("*").alias("n_inter"))
        )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a")
                   .withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b")
              .withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter")
                    / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """MinHash + LSH candidate near-duplicate pairs.

    Per doc: k = num_hashes minhash values h_i = min over shingles of
    xxhash64(shingle, seed=i). Signatures are banded (bands × rows); docs
    sharing any band bucket become candidate pairs. Returns distinct
    (id_a < id_b) candidates with the count of colliding bands.

    Shuffle volume: O(docs × bands) — document length never crosses the wire
    after the first projection, which is what makes this the 100 TB path vs
    the exact shingle join.
    """
    bands_df = minhash_lsh_bands(df, text_col, id_col, n, num_hashes,
                                 bands)
    return band_pairs(bands_df)


def minhash_lsh_bands(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """The (id, band, bucket) LSH banding table of minhash_dedup_pairs,
    split out so the oracle-bridge query can materialize it and both
    engines derive the pair set from identical buckets."""
    rows_per_band = num_hashes // bands
    sh = spread_partitions(df, id_col).select(
        F.col(id_col).alias("id"),
        F.explode(_shingles(text_col, n)).alias("sh"),
    )
    minhashes = sh.groupBy("id").agg(
        *[
            F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    return minhashes.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.hash(
                            *[F.col(f"h{b * rows_per_band + r}")
                              for r in range(rows_per_band)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")


def band_pairs(bands_df: DataFrame) -> DataFrame:
    """Distinct (id_a < id_b) candidates with colliding-band counts from
    an (id, band, bucket) table — the keyed LSH candidate join."""
    a, b = bands_df.alias("a"), bands_df.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_bands"))
    )


def connected_components(
    edges: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over an undirected edge list — the step that
    turns near-duplicate PAIRS into duplicate CLUSTERS (keep one canonical
    doc per component, drop the rest). Returns (id, component) for every
    node that appears in an edge; component = the minimum node id reachable.

    Algorithm: iterative min-label propagation as pure DataFrame ops.
    Each round: every node takes the min of its own label and its
    neighbors' labels (one keyed join + one keyed agg — both shuffles on
    node id). Convergence in O(component diameter) rounds; near-dup graphs
    are dense clique-ish clusters, so the diameter is small in practice.
    Labels are monotonically non-increasing, so sum(label) is a strictly
    decreasing convergence witness: when a round leaves the sum unchanged,
    NO label changed and the loop exits — the per-round action is a single
    scalar agg, never a collect of data. Each round localCheckpoints (the
    same lineage-depth discipline as the Lloyd loops). ``max_iters`` caps
    pathological chains (a path graph of length > max_iters would report
    unconverged labels — raise it for such graphs; dedup clusters converge
    in a handful of rounds).
    """
    sym = edges.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).unionByName(
        edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    )
    labels = (
        sym.select(F.col("src").alias("id")).distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=False)
    )
    prev_sum = labels.agg(F.sum("component")).first()[0]
    for _ in range(max_iters):
        nbr = (
            sym.join(
                labels.select(F.col("id").alias("src"), "component"), "src"
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("__nbr"))
        )
        labels = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("__nbr"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=False)
        )
        cur_sum = labels.agg(F.sum("component")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def simhash(df: DataFrame, text_col: str = "text", bits: int = 64) -> DataFrame:
    """64-bit SimHash signature per document.

    For each token hash h = xxhash64(token), each bit position contributes
    +1 if set else -1; the signature bit is 1 where the sum is positive.
    Implemented with transform/aggregate over the token array — no UDFs.
    """
    df = spread_partitions(df)  # 64 per-row bit sums: CPU-heavy, row-local
    t = F.array_distinct(tokens(F.col(text_col)))
    hashes = F.transform(t, lambda x: F.xxhash64(x))

    def _bit_sum(mask):
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(mask) != 0, F.lit(1)).otherwise(F.lit(-1)),
        )

    sig = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for i in range(bits):
        mask = F.shiftleft(one, i)  # shiftleft wraps at bit 63 — intended
        bit_sum = _bit_sum(mask)
        sig = sig.bitwiseOR(
            F.when(bit_sum > 0, mask).otherwise(F.lit(0).cast("long"))
        )
    return df.withColumn("simhash", sig)


def neardup_window_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 4,
    max_hamming: int = 16,
    prefix_bits: int = 4,
    rotations: int = 1,
) -> DataFrame:
    """Locality-sensitive ordering near-dup scan: sort the corpus by its
    SimHash signature, then compare each doc only to the next ``window``
    docs in signature order (lead window), emitting pairs with Hamming
    distance ≤ ``max_hamming``.

    This is the sorted-fingerprint linear scan: O(N·window) comparisons
    instead of O(N²) or a shuffle-heavy pair join. The scan window is
    PARTITIONED by the signature's top ``prefix_bits`` bits, so the window
    shuffle is keyed (2^prefix_bits partitions, parallel) rather than the
    single-partition global-order window Spark would otherwise plan. The
    cost: pairs straddling a prefix boundary are missed — the standard
    remedy is ``rotations`` > 1: the scan re-runs on bit-rotated copies of
    the signature (rotation is a bit bijection, so Hamming distance is
    preserved) and the union of passes recovers boundary-straddling pairs —
    a pair only stays hidden if it straddles a boundary in EVERY rotation.
    Each rotation is one more keyed window pass (r× cost, still O(N·w·r)
    comparisons total, never a pair join). Identical signatures always
    share a prefix, so duplicate clusters are never split. All ``window``
    leads are evaluated in ONE window pass (array of leads + explode), not
    one pass per offset.

    Output: (id_a, id_b, hamming) with id_a < id_b (min-hamming per pair).
    """
    from pyspark.sql import Window

    sig = simhash(df, text_col).select(id_col, "simhash")
    passes = []
    for k in range(max(1, rotations)):
        shift = (64 // max(1, rotations)) * k
        rot = (
            F.col("simhash") if shift == 0
            else F.shiftleft("simhash", shift).bitwiseOR(
                F.shiftrightunsigned("simhash", 64 - shift))
        )
        s = sig.withColumn("__rsig", rot).withColumn(
            "__prefix", F.shiftrightunsigned("__rsig", 64 - prefix_bits)
        )
        w = Window.partitionBy("__prefix").orderBy("__rsig", id_col)
        neighbors = F.array(*[
            F.struct(
                F.lead(id_col, j).over(w).alias("nid"),
                F.lead("__rsig", j).over(w).alias("nsig"),
            )
            for j in range(1, window + 1)
        ])
        # Hamming on the rotated signatures equals Hamming on the originals
        ham = F.bit_count(F.col("__rsig").bitwiseXOR(F.col("nb.nsig")))
        passes.append(
            # window exprs must live in a plain projection; explode after
            s.withColumn("__nbs", neighbors)
            .withColumn("nb", F.explode("__nbs"))
            .where(F.col("nb.nid").isNotNull())
            .select(
                F.least(F.col(id_col), F.col("nb.nid")).alias("id_a"),
                F.greatest(F.col(id_col), F.col("nb.nid")).alias("id_b"),
                ham.alias("hamming"),
            )
            .where(F.col("hamming") <= max_hamming)
        )
    out = passes[0]
    for p in passes[1:]:
        out = out.unionByName(p)
    return out.groupBy("id_a", "id_b").agg(F.min("hamming").alias("hamming"))


def _shingle_rows(
    df: DataFrame,
    id_alias: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """The exploded (id, shingle) table — split out of the signature
    build so a caller that needs BOTH the signatures and the raw
    shingles (the estimator-error query's exact-Jaccard verify) can
    materialize this scan once and feed every consumer from it."""
    return spread_partitions(df, id_col).select(
        F.col(id_col).alias(id_alias),
        F.explode(_shingles(text_col, n)).alias("sh"),
    )


def _sigs_from_shingles(
    sh: DataFrame,
    id_alias: str,
    num_hashes: int = 16,
    extra_keys: tuple = (),
) -> DataFrame:
    """Pivoted MinHash signature table (id, h0..h{num_hashes-1}) from an
    exploded shingle table — 16 min-md5 conditional aggs in ONE keyed
    exchange (partial aggregation shrinks the shuffle map-side).
    ``extra_keys`` ride in the grouping key (e.g. the new/old tag of the
    fused incremental-dedup pass)."""
    return sh.groupBy(id_alias, *extra_keys).agg(*[
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("sh")).cast("binary")))
        .alias(f"h{i}")
        for i in range(num_hashes)
    ])


def _portable_minhash_sigs(
    df: DataFrame,
    id_alias: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """Pivoted MinHash signature table (id, h0..h{num_hashes-1}) with the
    engine-portable md5 hash family — the single home for the signature
    build; banding (below) and the estimator-error query both consume it."""
    return _sigs_from_shingles(
        _shingle_rows(df, id_alias, id_col, text_col, n),
        id_alias, num_hashes,
    )


def _portable_minhash_bands(
    df: DataFrame,
    id_alias: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
) -> DataFrame:
    """Banded MinHash signature rows (id, band, bucket) with the
    engine-portable md5 hash family (h_i = min md5 of 'i|shingle'; bucket =
    md5 of the band's joined minhashes) — the same family the oracle-gated
    q_doc_minhash_portable uses, so consumers stay value-checkable."""
    mh = _portable_minhash_sigs(df, id_alias, id_col, text_col, n, num_hashes)
    return _bands_from_sigs(mh, id_alias, num_hashes, bands)


def _bands_from_sigs(
    mh: DataFrame,
    id_alias: str,
    num_hashes: int = 16,
    bands: int = 8,
    extra_cols: tuple = (),
) -> DataFrame:
    """Banding stage alone, over an existing (id, h0..h{n-1}) signature
    table — lets a caller that also needs the raw signatures (the
    estimator-error query) compute them ONCE (checkpointed) instead of
    once per consumer. ``extra_cols`` pass through unchanged."""
    rows_per_band = num_hashes // bands
    return mh.select(
        id_alias, *extra_cols,
        F.explode(F.array(*[
            F.struct(
                F.lit(b).cast("long").alias("band"),
                F.md5(F.concat_ws(
                    "|",
                    *[F.col(f"h{b * rows_per_band + r}")
                      for r in range(rows_per_band)],
                ).cast("binary")).alias("bucket"),
            )
            for b in range(bands)
        ])).alias("bb"),
    ).select(id_alias, *extra_cols, "bb.band", "bb.bucket")


def incremental_neardup_flags(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
) -> DataFrame:
    """Cross-crawl incremental dedup: flag documents in a NEW batch that
    near-duplicate anything ALREADY IN the corpus. Returns one row per
    flagged new doc: (id, first_match = lowest-id colliding corpus doc,
    n_collisions = colliding (band, corpus-doc) pairs).

    Both sides reduce to banded minhash rows — O(docs × bands) — and meet
    in a (band, bucket)-keyed equi-join; document text never crosses the
    wire past the signature pass. In a production lake the corpus side is
    the PERSISTED signature table maintained by each ingest (append the new
    batch's band rows after filtering), so the per-batch cost is
    O(new × bands) signatures + one keyed join against the signature store
    — the new batch never rescans corpus text.

    r11 (guide §2.4): the two sides used to run as two independent
    shingle-explode → 16-way min-md5 → banding chains meeting in the
    join. Banding is per-doc, so ONE tagged union now feeds one chain
    keyed on (id, side) and the tiny banded table (docs × bands rows,
    persisted for its two consumers) splits by the tag just before the
    join — one signature exchange instead of two, one spread exchange,
    and AQE sees both join inputs' real (post-filter) sizes. Ids may
    overlap between sides (the tag stays in the aggregation key), so
    semantics are unchanged; 1.0 s → 0.36 s warm at sf0.1.

    API notes (r11 ADVICE): (1) the tagged union requires ``new_df`` and
    ``corpus_df`` to carry Spark-compatible dtypes for the id/text
    columns (unionByName resolves them; mismatched-but-castable types
    should be cast by the caller); (2) the banded table is persisted for
    the lifetime of the returned plan's session — a caller invoking this
    per-ingest in a long-lived session should ``spark.catalog.clearCache()``
    or unpersist between calls (a production lake materializes the
    corpus-side signature table anyway, see above)."""
    from pyspark import StorageLevel

    tagged = (
        new_df.select(F.col(id_col), F.col(text_col),
                      F.lit(True).alias("__new"))
        .unionByName(corpus_df.select(F.col(id_col), F.col(text_col),
                                      F.lit(False).alias("__new")))
    )
    sh = spread_partitions(tagged, id_col).select(
        F.col(id_col).alias("__id"), "__new",
        F.explode(_shingles(text_col, n)).alias("sh"),
    )
    sigs = _sigs_from_shingles(sh, "__id", num_hashes,
                               extra_keys=("__new",))
    bands_df = _bands_from_sigs(sigs, "__id", num_hashes, bands,
                                extra_cols=("__new",)) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    a = bands_df.where(F.col("__new")).select(
        F.col("__id").alias("new_id"), "band", "bucket")
    b = bands_df.where(~F.col("__new")).select(
        F.col("__id").alias("old_id"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .groupBy(F.col("new_id").alias(id_col))
        .agg(
            F.min("old_id").alias("first_match"),
            F.count("*").alias("n_collisions"),
        )
    )


def pagerank(
    edges: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    iters: int = 5,
    damping: float = 0.85,
    round_to: int = 6,
) -> DataFrame:
    """PageRank over an undirected edge list (fixed ``iters`` power
    iterations — deterministic, oracle-checkable): rank near-dup cluster
    members by connectivity to pick the canonical document (the
    highest-rank doc is the best-connected representative, a common
    alternative to keep-lowest-id).

    r_{t+1}(v) = (1-d)/N + d · Σ_{u∈nbr(v)} r_t(u)/deg(u), r_0 = 1/N over
    the N nodes that appear in any edge. Every step is a keyed join +
    keyed agg on node id. r11 (guide §1.2/§2.4): the rounds ride ONE
    action — the lineage is LINEAR (each round's state is consumed
    exactly once, by the next round), so the per-round localCheckpoints
    bought no recompute protection and cost a materialization job + AQE
    re-plan each (50 jobs / 118 stages → 27 / 75 at the bench edge set);
    and the state table carries ``deg`` so the per-round ranks⋈deg
    share join is gone (the deg⋈contrib completeness join re-attaches
    it for free). No driver-side state, no collect. Output: (id, pr)
    with pr rounded to ``round_to``.
    """
    # checkpoint the DIRECTED edge list first: symmetrization reads it
    # twice per round, and an expensive upstream (e.g. the minhash band
    # join) must materialize once, not once per direction per round
    e0 = edges.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).localCheckpoint(eager=False)
    sym = e0.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        e0.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    deg = sym.groupBy("src").agg(
        F.count("*").alias("deg")
    ).localCheckpoint(eager=False)  # referenced twice per round — one pass
    n_nodes = deg.count()  # one scalar action up front, not per round
    if n_nodes == 0:  # empty edge list: no nodes, empty rank table
        return deg.select(F.col("src").alias("id"),
                          F.lit(0.0).alias("pr"))
    base = (1.0 - damping) / n_nodes
    ranks = deg.select("src", "deg", F.lit(1.0 / n_nodes).alias("pr"))
    for _ in range(iters):
        contrib = (
            sym.join(
                ranks.select(
                    "src", (F.col("pr") / F.col("deg")).alias("__share")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("src"))
            .agg(F.sum("__share").alias("__in"))
        )
        ranks = (
            deg.join(contrib, "src", "left")
            .select(
                "src", "deg",
                (F.lit(base)
                 + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
                 ).alias("pr"),
            )
        )
    return ranks.select(F.col("src").alias("id"),
                        F.round("pr", round_to).alias("pr"))


def ppjoin_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering (the AllPairs /
    PPJoin family; Vernica, Carey & Li, "Efficient Parallel Set-Similarity
    Joins Using MapReduce", SIGMOD 2010): every pair with n-gram-shingle
    Jaccard >= ``threshold`` is returned, with NO blocking approximation —
    unlike ``ngram_jaccard_pairs(max_df=...)`` (df-cap candidate
    generation) and minhash/simhash (probabilistic), this is complete by
    construction.

    Prefix-filter principle: order each doc's shingle set by a global
    rarity order (document frequency asc, shingle asc — the order needs no
    global rank table, the (df, shingle) tuple IS the order) and keep the
    first p = |S| - ceil(t*|S|) + 1 elements. Two sets with Jaccard >= t
    must share at least one PREFIX element, so the keyed equi-join on
    prefix shingles generates a complete candidate set. Candidates are
    verified exactly (row-local array_intersect on the already-built
    per-doc sorted arrays).

    Scale shape: one shingle-keyed exchange computes document frequency as
    a window aggregate (spill-safe on hot shingles), one doc-keyed
    aggregation builds the per-doc ordered set (buffer bounded by doc
    length), and the candidate join keys on PREFIX shingles — which the
    rarity order biases toward rare ones, so posting lists stay short for
    dissimilar corpora; a corpus where prefixes collide massively is one
    where the TRUE answer is quadratic (near-identical boilerplate), i.e.
    fan-out is output-bound, not an artifact. Length filter t*|A| <= |B|
    prunes before verification. No caps, no collects, no windows over
    unbounded partitions."""
    docs, cand = _ppjoin_candidates(df, text_col, id_col, n, threshold)
    return _ppjoin_verify(docs, cand, threshold)


def _ppjoin_candidates(df, text_col, id_col, n, threshold):
    """Shingle → rarity-ordered per-doc sets → prefix-join candidate pairs
    (the pre-verification half of ppjoin_pairs, exposed so diagnostics —
    tools/bench_ppjoin.py — can report the candidate/true-pair ratio that
    demonstrates output-bound growth). Returns (docs, cand)."""
    from pyspark.sql import Window

    sh = (
        # spread first: a single-row-group parquet scan is ONE task and
        # AQE coalesces the small shuffles, serializing the CPU-heavy
        # shingle/md5/window chain (no-op at scale — see spread_partitions)
        spread_partitions(df, id_col)
        .select(F.col(id_col).alias("id"),
                F.explode(_shingles(text_col, n)).alias("g"))
        # 16-byte binary digest, not the 32-char hex string (r11
        # optimization, guide §2.3 "narrower types"): unhex is injective
        # and BinaryType compares unsigned-lexicographically, which for
        # fixed-width hex is the SAME order as the hex string ('0'-'9' <
        # 'a'-'f' is nibble-monotone in ASCII) — so the (df, sh) rarity
        # order, every equi-join, and all distinct counts are unchanged
        # while the df window, prefix join, and verify explode shuffle
        # half the key bytes. Outputs carry only ids/counts, never sh.
        .select("id", F.unhex(F.md5(F.col("g").cast("binary"))).alias("sh"))
    )
    wdf = Window.partitionBy("sh")
    docs = (
        sh.withColumn("df", F.count("*").over(wdf))
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "sh"))).alias("os"))
        .select(
            "id",
            F.transform("os", lambda s: s["sh"]).alias("toks"),
            F.size("os").alias("sz"),
        )
        # feeds prefix explode AND both verify joins — one compute
        # (serialized persist: scale.md rule 14 storage note)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # every ceil/compare below subtracts/adds a 1e-9 epsilon so binary
    # float error can only WIDEN the candidate set, never prune a
    # qualifying pair. This is load-bearing for the positional filter:
    # ceil((0.4/1.4)*7) = ceil(2.0000000000000004) = 3 where the exact
    # required overlap is 2 — without the guard a qualifying pair whose
    # only prefix match has ubound 2 is silently lost (pinned by
    # test_ppjoin_positional_alpha_float_boundary).
    plen = (
        F.col("sz")
        - F.ceil(F.lit(threshold) * F.col("sz") - F.lit(1e-9)).cast("int")
        + F.lit(1)
    )
    pref = docs.select(
        "id", "sz",
        F.posexplode(F.slice("toks", F.lit(1), plen)).alias("pos", "sh"),
    )
    a = pref.select(F.col("id").alias("id_a"), F.col("sz").alias("__sa"),
                    F.col("pos").alias("__pa"), "sh")
    b = pref.select(F.col("id").alias("id_b"), F.col("sz").alias("__sb"),
                    F.col("pos").alias("__pb"), "sh")
    # positional filter (the "PP" over plain AllPairs): a prefix match at
    # 0-based positions (pa, pb) witnesses 1 shared element with at most
    # min(|A|-1-pa, |B|-1-pb) more possible, and Jaccard >= t needs
    # overlap >= ceil(t/(1+t) * (|A|+|B|)) — candidates whose upper bound
    # can't reach that die BEFORE the pair ever materializes downstream.
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold))
        * (F.col("__sa") + F.col("__sb"))
        - F.lit(1e-9)
    )
    ubound = (
        F.lit(1)
        + F.least(F.col("__sa") - 1 - F.col("__pa"),
                  F.col("__sb") - 1 - F.col("__pb"))
    )
    cand = (
        a.join(b, "sh")
        .where(
            (F.col("id_a") < F.col("id_b"))
            # |A| <= |B|/t and |B| <= |A|/t  <=>  t*max <= min
            & (F.lit(threshold) * F.greatest("__sa", "__sb")
               <= F.least("__sa", "__sb").cast("double") + F.lit(1e-9))
            & (ubound >= alpha)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    return docs, cand


def _ppjoin_verify(docs, cand, threshold):
    # pair-first exact intersection (the repo's standard verify shape):
    # candidate pairs × side-a shingles, then ONE keyed (id_b, sh)
    # equi-join — cost Σ_pairs |shingles(a)|, linear in pairs, and only
    # NARROW (id, sh) rows ever shuffle. Joining the per-doc ARRAYS onto
    # ~200k candidate pairs was measured 4× slower at sf0.1 (the array
    # payload rides the pair shuffle); the narrow rows come back out of
    # the checkpointed docs table, not a parquet rescan.
    flat = docs.select("id", F.explode("toks").alias("sh"))
    inter = (
        cand
        .join(flat.select(F.col("id").alias("id_a"), "sh"), "id_a")
        .join(flat.select(F.col("id").alias("id_b"), "sh"), ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sizes = docs.select("id", "sz")
    return (
        inter
        .join(sizes.select(F.col("id").alias("id_a"),
                           F.col("sz").alias("__na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"),
                           F.col("sz").alias("__nb")), "id_b")
        # threshold the UNROUNDED ratio (epsilon-guarded like every other
        # bound here, so float error only ever widens) — thresholding the
        # 6-decimal ROUNDED value would emit pairs up to 5e-7 below t and
        # could drop qualifying pairs under a >6-decimal t, breaking the
        # documented exactness contract; rounding is display-only
        .where(
            F.col("n_inter").cast("double")
            / (F.col("__na") + F.col("__nb") - F.col("n_inter"))
            >= F.lit(threshold) - F.lit(1e-9)
        )
        .select(
            "id_a", "id_b",
            F.col("n_inter").cast("bigint").alias("n_inter"),
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("__na") + F.col("__nb") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
    )


def source_overlap(
    df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source duplication matrix — the data-governance staple
    "how much of source A also appears in source B": for every source
    pair, the count of shared distinct word n-gram shingles and the
    shingle-set Jaccard.

    Scale shape: one explode → DISTINCT (source, shingle) pass (keyed,
    map-side combinable), checkpointed for its three consumers; the pair
    join is shingle-keyed with per-shingle fan-out bounded by
    |sources|² — linear in corpus size, never doc×doc. Jaccard is
    emitted UNROUNDED: an exact-integer division is bit-identical in
    any engine, while rounding it can hit decimal half-way ties
    (docs/scale.md rule 12; 1/128 is already a 6-decimal tie).
    """
    # round-robin spread — keying the spread by source would cap the
    # explode at |sources| partitions (20 here), and the DISTINCT
    # re-shuffles on (source, shingle) anyway
    sh = (
        spread_partitions(df.select(source_col, text_col))
        .select(F.col(source_col), F.explode(_shingles(text_col, n)).alias("__sh"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = sh.groupBy(source_col).agg(F.count("*").alias("__n"))
    a = sh.select(F.col(source_col).alias("source_a"), "__sh")
    b = sh.select(F.col(source_col).alias("source_b"), "__sh")
    # explicit shuffle-hash: the checkpointed sh scan carries unreliable
    # LogicalRDD stats and the planner was measured broadcasting the ENTIRE
    # (source, shingle) table as the build side — driver-OOM at corpus
    # scale (same hazard as text.bigram_nll's vocab join; scale.md rule 13)
    pairs = (
        a.join(b.hint("shuffle_hash"), "__sh")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("shared_shingles"))
    )
    na = F.broadcast(counts.select(F.col(source_col).alias("source_a"),
                                   F.col("__n").alias("n_a")))
    nb = F.broadcast(counts.select(F.col(source_col).alias("source_b"),
                                   F.col("__n").alias("n_b")))
    return (
        pairs.join(na, "source_a").join(nb, "source_b")
        .select(
            "source_a", "source_b", "shared_shingles", "n_a", "n_b",
            (F.col("shared_shingles")
             / (F.col("n_a") + F.col("n_b") - F.col("shared_shingles"))
             ).alias("jaccard"),
        )
    )
