"""Training-corpus assembly operators: deterministic sampling, dataset
splits, vocabulary building, token-budget packing, and benchmark
decontamination.

These are the corpus-side counterparts of the dedup/similarity operators: the
steps between "cleaned documents" and "training shards". All are built on
content/id hashing with an engine-portable hash (md5 hex), so every operator
is (a) deterministic across runs, partitionings, and engines — the property
random() sampling cannot give a distributed pipeline — and (b) value-checkable
against a DuckDB oracle.

Scale notes:
- hash predicates (sample/split) are pure row-local expressions: no shuffle,
  full pushdown past the scan, stable under repartitioning;
- vocab_topk is one token-explode + hash agg + a k-row ordered head;
- pack_bins is a per-group running-sum window (one keyed shuffle);
- contamination joins the corpus's shingles against the (small) benchmark
  shingle set — broadcast the benchmark side at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(col: Column, salt: str = "", buckets: int = 100) -> Column:
    """Deterministic [0, buckets) bucket from the md5 of ``salt|value``.

    Uses the first 4 hex chars (16 bits) of the digest — uniform enough for
    percentage-level sampling and engine-portable (DuckDB computes the same
    md5 hex string).
    """
    h = F.md5(F.concat(F.lit(f"{salt}|"), col.cast("string")).cast("binary"))
    return (F.conv(F.substring(h, 1, 4), 16, 10).cast("long")
            % F.lit(buckets)).cast("int")


def hash_bucket32(col: Column, salt: str = "", buckets: int = 10000) -> Column:
    """Deterministic [0, buckets) bucket from 32 bits (8 hex chars) of the
    md5 of ``salt|value``. hash_bucket's 16 bits are uniform enough for
    percentage-level sampling but bias fine-grained rates (65536 % 10000
    != 0 → up to ~7% relative overshoot); 32 bits push the modulo bias
    below 1e-4 relative. Engine-portable (DuckDB computes the same hex)."""
    h = F.md5(F.concat(F.lit(f"{salt}|"), col.cast("string")).cast("binary"))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
            % F.lit(buckets)).cast("long")


def hash_sample(
    df: DataFrame, rate_pct: int, key_col: str = "doc_id", salt: str = "s",
) -> DataFrame:
    """Keep a deterministic ~rate_pct% of rows by id hash. Unlike
    ``df.sample``, the selection is a pure function of the key: stable
    across runs, engines, and partitionings, and a document keeps or loses
    membership independently of everything else (safe under incremental
    re-runs over a growing corpus)."""
    return df.where(hash_bucket(F.col(key_col), salt) < rate_pct)


def train_split(
    df: DataFrame,
    key_col: str = "doc_id",
    salt: str = "split",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Assign each row a deterministic train/val/test split by id hash
    (train_pct / val_pct / remainder). Adds a ``split`` column."""
    b = hash_bucket(F.col(key_col), salt)
    return df.withColumn(
        "split",
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def stratified_sample(
    df: DataFrame,
    by: Sequence[str] = ("lang",),
    n_per_stratum: int = 10,
    key_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Exact-allocation stratified sample: the ``n_per_stratum`` rows of
    each stratum whose md5(salt|key) hash strings sort lowest — rate-based
    hash sampling can't hit an exact count per group, and df.sampleBy is
    both approximate and partitioning-dependent. Selection is a pure
    function of (stratum, key): stable across runs and engines, and a
    stratum's sample only changes where membership changes.

    One keyed window shuffle (row_number per stratum over hash order,
    hash-string tiebreak then key). At 100 TB a skewed stratum spills in
    the window sort; no stratum is ever collected or broadcast.
    """
    from pyspark.sql import Window

    h = F.md5(
        F.concat(F.lit(f"{salt}|"), F.col(key_col).cast("string"))
        .cast("binary")
    )
    w = Window.partitionBy(*by).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def vocab_topk(
    df: DataFrame, text_col: str = "text", k: int = 50,
) -> DataFrame:
    """Top-k corpus vocabulary by token frequency with a deterministic
    tie-break (count desc, token asc). Output: (rank, token, n)."""
    from pyspark.sql import Window

    from .text import tokens

    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token").agg(F.count("*").alias("n"))
    )
    # orderBy + limit compiles to TakeOrderedAndProject — a distributed
    # per-partition top-k + k-row merge, never a global sort. The ranking
    # window then runs over only the k survivors.
    top = counts.orderBy(F.col("n").desc(), F.col("token")).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "token", "n"
    )


def pack_bins(
    df: DataFrame,
    size_col: str,
    capacity: int,
    by: Sequence[str] = (),
    order_col: str = "doc_id",
) -> DataFrame:
    """Sequential token-budget packing: within each ``by`` group, walk rows
    in ``order_col`` order and assign ``bin = floor(exclusive_running_sum /
    capacity)`` — the streaming shard-assembly rule (each bin holds
    consecutive documents totalling ~capacity tokens; a bin may overflow by
    at most one document, exactly like an append-until-full shard writer).
    Deterministic, one keyed window shuffle, no driver loop. Adds ``bin``.
    """
    from pyspark.sql import Window

    by = list(by)
    w = (
        Window.partitionBy(*by).orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return df.withColumn(
        "bin", F.floor(cum_excl / F.lit(capacity)).cast("bigint")
    )


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_ratio: float = 0.1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination scan: for each corpus document, the share
    of its distinct word n-gram shingles that appear in ANY benchmark
    document. Documents with ratio >= min_ratio are flagged (these are the
    train-set rows that would leak evaluation data).

    Output: (doc_id, n_shared, n_shingles, ratio), ratio rounded to 6.
    At scale the benchmark shingle set is small — broadcast it so the scan
    over the 100 TB corpus is map-side only.
    """
    from .dedup import _shingles

    bench_sh = (
        benchmark.select(F.explode(_shingles(text_col, n)).alias("sh"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    from .dedup import spread_partitions

    # single-row-group inputs scan as ONE task; the shingle explode is the
    # CPU-heavy stage, so spread it (no-op at real scale — see helper)
    corpus_sh = spread_partitions(corpus).select(
        F.col(id_col), F.explode(_shingles(text_col, n)).alias("sh")
    )
    # ONE streaming pass over the exploded corpus: a LEFT join against the
    # distinct (broadcast) benchmark set marks hits without duplicating
    # rows, so the shingle count and the hit count come out of a single
    # aggregation. The previous sizes ⋈ semi-join shape scanned and
    # shingled the corpus TWICE — at 100 TB that is a second full pass
    # (and checkpointing the exploded corpus is bigger than the corpus).
    return (
        corpus_sh.join(bench_sh, "sh", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("__hit").alias("n_shared"),
        )
        .withColumn(
            "ratio", F.round(F.col("n_shared") / F.col("n_shingles"), 6)
        )
        .where(F.col("ratio") >= min_ratio)
        .select(id_col, "n_shared", "n_shingles", "ratio")
    )


def source_mix(
    df: DataFrame,
    frac: float = 0.5,
    key_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mix",
    buckets: int = 10000,
) -> DataFrame:
    """Temperature-weighted source mixing (sqrt-temperature, τ=0.5): choose a
    ~``frac``·N-row corpus whose per-source allocation follows √n_s instead
    of n_s, so over-represented sources are down-sampled and small sources
    keep (up to all of) their documents — the standard rebalancing step
    before pretraining on a multi-source crawl.

    Per-source keep-rate r_s = min(1, frac·N·(√n_s/Σ√n)/n_s); a row is kept
    iff its 32-bit md5 hash bucket (hash_bucket32) < floor(buckets·r_s) — selection is a pure
    function of (key, per-source threshold): stable across runs, engines,
    and partitionings, and incremental re-runs only change membership where
    the source histogram changed.

    Scale: one keyed count per source, a 1-row total, and a #sources-row
    broadcast join; the row filter is hash-local. No full-data shuffle.
    """
    counts = df.groupBy(source_col).agg(F.count("*").alias("__n"))
    tot = counts.agg(
        F.sum("__n").cast("double").alias("__ntot"),
        F.sum(F.sqrt(F.col("__n").cast("double"))).alias("__wsum"),
    )
    n_s = F.col("c.__n")  # qualified: tot derives from counts, so the bare
    # name is ambiguous after the cross join
    rate = (
        (F.lit(float(frac)) * F.col("__ntot"))
        * (F.sqrt(n_s.cast("double")) / F.col("__wsum"))
        / n_s
    )
    thr = (
        counts.alias("c")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col(f"c.{source_col}").alias(source_col),
            n_s.alias("n_source"),
            F.floor(F.lit(buckets) * F.least(F.lit(1.0), rate)).alias("__thr"),
        )
    )
    return (
        df.join(F.broadcast(thr), source_col)
        .where(hash_bucket32(F.col(key_col), salt, buckets) < F.col("__thr"))
        .drop("__thr")
    )


def seq_pack(
    df: DataFrame,
    seq_len: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """GPT-style sequence packing layout: concatenate each group's documents
    (in ``id_col`` order) into one token stream and cut it into fixed
    ``seq_len``-token training sequences, documents crossing the cut
    boundary (the "document packing" of pretraining dataloaders — no
    padding, boundary docs straddle two sequences). Emits the per-group
    packing summary a shard builder needs: sequence count, boundary-doc
    count, docs-per-sequence distribution, and the final partial fill.

    Scale shape: token counts are a row-local projection; the only
    full-data shuffle is the per-group cumulative-offset window. A window
    keyed ONLY by group is the documented skew hazard when one group is
    most of the corpus — in production the group key is (group, shard)
    with shards pre-bucketed to the target shard size (packing is
    embarrassingly parallel across shards because offsets reset per
    shard); the per-group layout here IS that per-shard computation. The
    docs-per-sequence distribution explodes each doc to the sequences it
    touches — fan-out is total_tokens/seq_len rows, linear in corpus size.
    """
    from pyspark.sql import Window

    from .text import tokens

    n_tok = F.size(tokens(F.col(text_col)))
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = (
        df.select(group_col, id_col, n_tok.alias("__n"))
        .withColumn("__end", F.sum("__n").over(w))
        .withColumn("__start", F.col("__end") - F.col("__n"))
        .withColumn("__first_seq", F.floor(F.col("__start") / seq_len))
        .withColumn("__last_seq", F.floor((F.col("__end") - 1) / seq_len))
    )
    per_doc = spans.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum("__n").alias("n_tokens"),
        F.sum(
            (F.col("__last_seq") > F.col("__first_seq")).cast("long")
        ).alias("n_boundary_docs"),
        F.max("__end").alias("__tot"),
    )
    seq_hist = (
        spans.select(
            group_col,
            F.explode(
                F.sequence(F.col("__first_seq"), F.col("__last_seq"))
            ).alias("__seq"),
        )
        .groupBy(group_col, "__seq")
        .agg(F.count("*").alias("__docs"))
        .groupBy(group_col)
        .agg(
            F.round(F.avg("__docs"), 4).alias("avg_docs_per_seq"),
            F.max("__docs").alias("max_docs_per_seq"),
        )
    )
    n_seqs = F.ceil(F.col("__tot") / F.lit(float(seq_len)))
    return (
        per_doc.join(seq_hist, group_col)
        .withColumn("n_seqs", n_seqs)
        .withColumn(
            "last_fill", F.col("__tot") - (F.col("n_seqs") - 1) * seq_len
        )
        .select(
            group_col, "n_docs", "n_tokens", "n_seqs", "n_boundary_docs",
            "avg_docs_per_seq", "max_docs_per_seq", "last_fill",
        )
    )


def dsir_weights(
    df: DataFrame,
    target_sources: Sequence[str],
    buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    salt: str = "dsir",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    how much more likely its hashed-bigram features are under the TARGET
    distribution (docs from ``target_sources`` — the high-quality slice)
    than under the RAW distribution (the whole corpus). weight =
    Σ_features log p_target(b) / p_raw(b) with Laplace-smoothed bucket
    unigram models over ``buckets`` hashed word-bigram buckets. Positive
    weight ⇒ looks like the target; downstream samplers keep
    ∝ exp(weight) (importance resampling).

    Scale shape: ONE token-bigram explode feeds both bucket models (the
    target model is a conditional agg over the same keyed exchange, not a
    second corpus pass); the ≤``buckets``-row log-ratio table joins back
    broadcast; the per-doc fold is a keyed agg on ``id_col``. Per-bucket
    log-ratios are carried as 1e8-SCALED INTEGERS so the per-doc sum is
    exact (engine- and order-independent — summing 8-decimal doubles and
    rounding hits half-way ties systematically); the emitted double is
    one division of that exact integer, never a rounded float sum.
    """
    from .text import tokens

    # zip_with over two slices — NOT transform(sequence, i ->
    # concat(element_at(t,i), element_at(t,i+1))): an expression referenced
    # inside a HOF lambda is re-evaluated per ELEMENT (the bigram_nll
    # finding, 7.7x at the 50x corpus), zip_with touches it twice per row
    t = tokens(F.col(text_col))
    bigrams = F.when(
        F.size(t) >= 2,
        F.zip_with(
            F.slice(t, 1, F.size(t) - 1),
            F.slice(t, 2, F.size(t) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    from pyspark import StorageLevel

    from .dedup import spread_partitions

    # spread BEFORE the explode: a single-row-group parquet file scans as
    # ONE task and the md5-per-bigram hash chain is CPU-heavy (docs/
    # scale.md rule 10); persisted SERIALIZED because BOTH the model agg
    # and the per-doc join consume this subtree — without materialization
    # the explode+hash runs twice (measured 13.7 s, ROADMAP round-7), and
    # serialized column batches beat localCheckpoint's deserialized row
    # objects ~2.4x at the 50x corpus (the bigram_nll measurement)
    feats = (
        spread_partitions(df.select(id_col, source_col, text_col), id_col)
        .select(
            F.col(id_col),
            F.col(source_col).isin(*target_sources).alias("__is_t"),
            F.explode(bigrams).alias("__bg"),
        )
        .withColumn(
            "__b", hash_bucket32(F.col("__bg"), salt=salt, buckets=buckets)
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    model = feats.groupBy("__b").agg(
        F.count("*").alias("__cr"),
        F.sum(F.col("__is_t").cast("long")).alias("__ct"),
    )
    tot = model.agg(
        F.sum("__cr").alias("__tr"), F.sum("__ct").alias("__tt")
    )
    logratio = (
        model.crossJoin(F.broadcast(tot))
        .select(
            "__b",
            F.round(
                (F.log((F.col("__ct") + 1) / (F.col("__tt") + buckets))
                 - F.log((F.col("__cr") + 1) / (F.col("__tr") + buckets)))
                * F.lit(1e8),
                0,
            ).cast("long").alias("__w8"),
        )
    )
    per_doc = (
        feats.join(F.broadcast(logratio), "__b")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("__w8").alias("weight_e8"),
        )
    )
    return (
        df.select(id_col, source_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            source_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("weight_e8", F.lit(0)).alias("weight_e8"),
            (F.coalesce("weight_e8", F.lit(0)) / F.lit(1e8)).alias("weight"),
        )
    )

