"""Text-analysis operators for large-scale training-data pipelines.

All hot-path logic is built-in Column expressions (split/filter/aggregate/
transform) — JVM-side, whole-stage-codegen'd, no Python UDFs — so a 100 TB
documents table streams through scan→project with zero serialization overhead.

These are extension operators (BASELINE.json north star), not reference
parity; the reference has no text surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language-ID. Deterministic and shared with the DuckDB oracle.
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"],
    "es": ["el", "la", "de", "y", "en", "que", "los", "una", "por", "con"],
    "de": ["der", "die", "das", "und", "zu", "ein", "mit", "auf", "ist", "von"],
    "fr": ["le", "la", "de", "et", "un", "une", "dans", "est", "pour", "que"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1", "zhe4", "men5"],
}

STOPWORDS_EN = LANG_STOPWORDS["en"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the 'token counting' baseline: split on runs
    of whitespace after trim)."""
    return F.split(F.trim(text), r"\s+")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token statistics: n_tokens, n_chars, avg_token_len."""
    t = tokens(F.col(text_col))
    return df.withColumn("n_tokens", F.size(t)).withColumn(
        "avg_token_len",
        F.round(
            F.aggregate(t, F.lit(0).cast("double"),
                        lambda acc, x: acc + F.length(x))
            / F.size(t),
            6,
        ),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality scoring: length, stopword ratio, unique-token ratio,
    mean word length — combined into a [0,1] score. Mirrors the classic
    Gopher/C4-style text-quality filters (public heuristics), simplified to
    exactly what built-in functions express."""
    t = tokens(F.col(text_col))
    n = F.size(t)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x)))
    n_uniq = F.size(F.array_distinct(t))
    mean_len = (
        F.aggregate(t, F.lit(0).cast("double"), lambda acc, x: acc + F.length(x)) / n
    )
    len_ok = (n >= 10) & (n <= 100000)
    word_ok = (mean_len >= 2.0) & (mean_len <= 12.0)
    return (
        df.withColumn("n_tokens", n)
        .withColumn("stopword_ratio", F.round(n_stop / n, 6))
        .withColumn("unique_ratio", F.round(n_uniq / n, 6))
        .withColumn("mean_token_len", F.round(mean_len, 6))
        .withColumn(
            "quality",
            F.round(
                (len_ok.cast("double") + word_ok.cast("double")
                 + (n_uniq / n)) / 3.0,
                6,
            ),
        )
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID: score each language by stopword occurrences,
    predict the argmax (ties broken by language code ascending; all-zero →
    'und'). A deterministic n-gram-free heuristic expressible identically in
    ANSI SQL for the oracle."""
    t = tokens(F.col(text_col))
    scores = {}
    for lang, words in sorted(LANG_STOPWORDS.items()):
        arr = F.array(*[F.lit(w) for w in words])
        scores[lang] = F.size(F.filter(t, lambda x: F.array_contains(arr, x)))
    out = df
    for lang, s in scores.items():
        out = out.withColumn(f"__score_{lang}", s)
    best = F.greatest(*[F.col(f"__score_{lang}") for lang in scores])
    pred = F.lit("und")
    for lang in sorted(scores, reverse=True):
        pred = F.when(
            (best > 0) & (F.col(f"__score_{lang}") == best), F.lit(lang)
        ).otherwise(pred)
    out = out.withColumn("pred_lang", pred)
    return out.drop(*[f"__score_{lang}" for lang in scores])


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split each document into overlapping token chunks — the standard
    long-document preparation step before tokenization/packing (context
    windows with ``size - stride`` tokens of overlap so no boundary text is
    ever lost to truncation).

    Chunk starts are 0, stride, 2·stride, … while start < n_tokens; the
    last chunk may be short (``n_tokens - start`` tokens). Emits one row
    per chunk: (id, chunk_id, start_tok, n_tokens, chunk_md5) — the md5 of
    the space-joined chunk keeps the output narrow and oracle-comparable
    without shipping chunk text.

    Scale shape: ENTIRELY ROW-LOCAL (sequence + transform + explode inside
    the row) — a map-only stage at any corpus size, no shuffle, no UDF."""
    toks = tokens(F.col(text_col))
    chunks = F.expr(
        f"transform(sequence(0, cast(floor((size(__toks) - 1) / {stride}) "
        f"AS INT)), i -> struct(i AS chunk_id, i * {stride} AS start_tok, "
        f"least({size}, size(__toks) - i * {stride}) AS n_tokens, "
        f"md5(cast(array_join(slice(__toks, i * {stride} + 1, {size}), ' ') "
        f"AS BINARY)) AS chunk_md5))"
    )
    return (
        df.select(id_col, toks.alias("__toks"))
        .where(F.size("__toks") >= 1)
        .select(id_col, F.explode(chunks).alias("c"))
        .select(id_col, "c.chunk_id", "c.start_tok", "c.n_tokens",
                "c.chunk_md5")
    )


def blocklist_scrub(
    df: DataFrame,
    blocklist: list[str],
    text_col: str = "text",
    mask: str = "[MASK]",
) -> DataFrame:
    """Blocklist term scrubbing — mask every whole-word occurrence of the
    blocklisted terms (the bad-word/PII-pattern redaction step of a corpus
    pipeline; swap the term alternation for capture-group regexes to redact
    structured PII like emails — same cascade, same counters).

    Adds ``n_redactions`` (occurrences masked) and ``scrubbed`` (the masked
    text). Row-local regexp_replace/regexp_count — no shuffle, no UDF; the
    single compiled alternation scans each document once per pass.
    """
    import re

    pat = r"\b(" + "|".join(re.escape(t) for t in blocklist) + r")\b"
    return df.withColumn(
        "n_redactions",
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("int"),
    ).withColumn(
        "scrubbed", F.regexp_replace(F.col(text_col), pat, mask)
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 of the sorted distinct token set — a
    bag-of-words fingerprint that is invariant to word order and repetition
    (cheap canonical-duplicate detector; md5 matches DuckDB's exactly)."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(F.col(text_col)))))
    return df.withColumn("fingerprint", F.md5(canon.cast("binary")))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
    first_pos: bool = False,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03): hash
    every word ``k``-gram, slide a ``w``-gram window, keep each window's
    minimum hash, emit the distinct selected hashes per document. Guarantees
    any shared run of ``k+w-1`` words between two documents shares ≥1
    fingerprint.

    The gram hash is the 16-byte md5 digest (``unhex`` of the hex string —
    guide §2.3 narrower types, the r12 extension of the r11 PPJoin recipe:
    the digest is injective and BinaryType's unsigned-lexicographic order
    equals lowercase-hex order, so every window minimum, distinct set, and
    df count is IDENTICAL to the hex formulation while the gram array, the
    w-window ``array_min`` scans, and every downstream fingerprint exchange
    carry half the bytes — and consumers no longer re-project ``unhex``
    below their exchanges). A SQL oracle reproduces the exact fingerprint
    set from the hex string. Only full ``w``-gram windows select
    fingerprints, so docs shorter than ``k+w-1`` words emit none.

    Scale shape: ENTIRELY ROW-LOCAL — the gram-hash array, the sliding
    ``w``-window minima (`transform` + `array_min` over array slices), and
    the per-doc dedup (`array_distinct`) all happen inside the row, then a
    single explode emits (doc, fingerprint). No gram explosion, no
    doc-keyed window shuffle, no distinct shuffle: winnowing is a map-only
    stage at any corpus size (an earlier formulation posexploded grams and
    ran a doc-partitioned window — one full shuffle of the gram table that
    this shape simply doesn't have). Output: (``id_col``, fingerprint).

    With ``first_pos=True``, also emit each fingerprint's first gram
    position in the document (0-based) — ``array_position`` of the
    fingerprint in the gram-hash array, still entirely row-local. This is
    exactly MIN(pos) over grams whose hash equals the fingerprint, i.e.
    the positional anchor the span-alignment queries need — computed here
    for free instead of joining the fingerprint table back to an exploded
    gram table (which costs a full gram shuffle + join at any scale).
    """
    from .dedup import spread_partitions

    df = spread_partitions(df, id_col)  # gram md5 is CPU-heavy, row-local
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    gram_hashes = F.expr(
        f"transform(sequence(0, size(__toks) - {k}), "
        f"i -> unhex(md5(cast(array_join(slice(__toks, i + 1, {k}), ' ') "
        f"AS BINARY))))"
    )
    fps = F.expr(
        f"array_distinct(transform(sequence(0, size(__h) - {w}), "
        f"i -> array_min(slice(__h, i + 1, {w}))))"
    )
    out = (
        df.select(id_col, toks.alias("__toks"))
        # only full w-gram windows select: needs >= k+w-1 tokens
        .where(F.size("__toks") >= k + w - 1)
        .select(id_col, gram_hashes.alias("__h"))
        .select(id_col, "__h", F.explode(fps).alias("fingerprint"))
    )
    if first_pos:
        return out.select(
            id_col, "fingerprint",
            (F.expr("array_position(__h, fingerprint)") - 1)
            .cast("int").alias("first_pos"),
        )
    return out.select(id_col, "fingerprint")


def tfidf_topk(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k keywords by TF-IDF (corpus-building staple: keyword
    tagging / topic hints for mixture sampling).

    score = tf · ln((N+1)/(df+1)), smoothed so a token present in every doc
    scores ~0 instead of dividing by zero. The idf is rounded to 8 decimals
    and the score to 6 BEFORE ranking so the ordering is reproducible across
    engines (raw libm ln may differ in the last ulp between JVM and C);
    ties break on token asc.

    Scale: token explode is linear; doc-frequency rides the token-keyed
    exchange as a window count (no separate vocab agg + join-back); N is a
    1-row broadcast; the top-k window partitions by doc — no global sort,
    no unpartitioned window.
    """
    from pyspark.sql import Window

    t = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token"),
    )
    tf = t.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    # document frequency as a window count over the SAME token-keyed
    # exchange the per-doc tf rows already need — one shuffle on token
    # instead of a separate vocab aggregate joined back (tf rows are
    # distinct per (doc, token), so count(*) per token IS the df; window
    # state spills on Zipf-hot tokens instead of buffering an agg join).
    wdf = Window.partitionBy("token")
    ndocs = df.agg(F.count("*").alias("n_docs"))
    idf = F.round(
        F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df_t") + F.lit(1.0))), 8
    )
    scored = (
        tf.withColumn("df_t", F.count("*").over(wdf))
        .crossJoin(F.broadcast(ndocs))
        .withColumn("score", F.round(F.col("tf") * idf, 6))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "token", "tf", "score", "rank")
    )


def length_quantiles(
    df: DataFrame,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    value_col: str = "n_chars",
    group_col: str = "lang",
) -> DataFrame:
    """EXACT per-group quantiles of a bounded-domain integer column, without
    a global sort: aggregate to (group, value) counts first, then take the
    cumulative sum over the DISTINCT values (domain-bounded window — a few
    thousand rows per group regardless of corpus size) and pick, for each q,
    the smallest value whose cumulative count reaches ceil(q·total).

    This is the type-1 (inverse-CDF) quantile definition, reproducible in
    any engine — unlike percentile_approx (sketch-based) or interpolating
    quantile_cont. At 100 TB the only full-data pass is the first keyed
    count; everything after runs on the tiny histogram.
    """
    from pyspark.sql import Window

    # quantiles are defined over NON-NULL values: engines disagree on where
    # NULL sorts in a cumulative window (Spark: first asc; DuckDB: last),
    # so nulls are excluded up front and n_rows counts surviving rows.
    counts = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count("*").alias("__n"))
    )
    cum_w = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy(group_col)
    hist = counts.withColumn("__cum", F.sum("__n").over(cum_w)).withColumn(
        "__tot", F.sum("__n").over(tot_w)
    )
    aggs = [F.sum("__n").alias("n_rows")]
    for q in qs:
        aggs.append(
            F.min(
                F.when(
                    F.col("__cum") >= F.ceil(F.lit(q) * F.col("__tot")),
                    F.col(value_col),
                )
            ).alias(f"q_{str(q).replace('.', '_')}")
        )
    return hist.groupBy(group_col).agg(*aggs)


def unigram_nll(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Per-document mean negative log-likelihood under a corpus unigram LM —
    the cheap perplexity proxy used for quality-filtering pretraining data
    (a doc full of globally-rare tokens scores high/surprising, boilerplate
    scores low).

    Two passes over the token stream: one keyed count builds the unigram
    table (whose sum also yields the corpus total — no separate counting
    pass), then the stream joins back on token and folds to a per-doc mean.
    Per-token log-probs are rounded to 8 decimals before averaging so the
    result is engine-reproducible. The token join key is Zipf-skewed;
    the unigram table is NOT broadcast-hinted (web-scale vocab can exceed
    the broadcast ceiling) — AQE broadcasts it while small and falls back
    to a shuffle join with skew splitting at scale.
    """
    t = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token"),
    )
    vocab = t.groupBy("token").agg(F.count("*").alias("__cnt"))
    # total token count derives from the aggregated vocab — NOT a third
    # explode of the corpus (sum over the vocab-bounded table)
    tot = vocab.agg(F.sum("__cnt").cast("double").alias("__t"))
    logp = F.round(F.log(F.col("__cnt") / F.col("__t")), 8)
    return (
        t.join(vocab, "token")
        .crossJoin(F.broadcast(tot))
        .select(id_col, logp.alias("__logp"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(-F.col("__logp")), round_to).alias("nll"),
        )
    )


def bpe_merges(
    df: DataFrame,
    rounds: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Train the first ``rounds`` BPE merges on the corpus (tokenizer
    induction — the standard byte-pair-encoding loop, Sennrich et al. 2016,
    run on word-internal character symbols weighted by word frequency).

    Per round: count adjacent symbol pairs across the (word, freq) VOCAB
    table — never the raw corpus — take the most frequent pair
    (ties → lexicographic), and merge its adjacent occurrences in every
    word. Words are carried as a '|a||b||c|'-wrapped symbol string so the
    merge is ONE non-regex replace of '|a||b|' with '|ab|': left-to-right
    non-overlapping replacement is exactly BPE's merge rule, wrapper pipes
    make adjacent matches share no characters (both merge in one pass),
    and a symbol can never false-match inside a neighbor.

    Scale shape: one corpus pass builds the vocab (keyed count); every
    iteration then runs on the vocab table only — explode to pairs, keyed
    sum, a 1-row argmax broadcast, and a row-local replace — with a
    localCheckpoint per round (flat lineage, same discipline as the Lloyd
    loops). Output: (round, a, b, pair_count) — the learned merge table.
    """
    tok = df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
    )
    # '|' is the symbol-wrapper metacharacter — words containing a literal
    # pipe would corrupt the wrapped encoding (phantom empty symbols), so
    # they are excluded from training (the standard practice of dropping
    # tokenizer-reserved characters; the oracle applies the same filter)
    vocab = (
        tok.where(~F.col("w").contains("|"))
        .groupBy("w").agg(F.count("*").alias("cnt"))
    )
    words = vocab.select(
        "cnt",
        F.concat(
            F.lit("|"),
            F.array_join(F.split(F.col("w"), ""), "||"),
            F.lit("|"),
        ).alias("sym"),
    ).localCheckpoint(eager=False)

    merges = None
    for r in range(1, rounds + 1):
        arr = F.split(F.expr("trim(BOTH '|' FROM sym)"), r"\|\|")
        pairs = words.select(
            "cnt", F.posexplode(arr).alias("__i", "a"), arr.alias("__arr")
        ).select(
            "cnt", "a",
            F.try_element_at(F.col("__arr"), F.col("__i") + 2).alias("b"),
        ).where(F.col("b").isNotNull())
        top = (
            pairs.groupBy("a", "b")
            .agg(F.sum("cnt").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), "a", "b")
            .limit(1)
            .withColumn("round", F.lit(r))
            .localCheckpoint(eager=False)  # consumed by the result union
            # AND the next round's merge — compute the argmax once
        )
        merges = top if merges is None else merges.unionByName(top)
        words = (
            words.crossJoin(F.broadcast(top.select("a", "b")))
            .select(
                "cnt",
                F.replace(
                    F.col("sym"),
                    F.concat(F.lit("|"), F.col("a"), F.lit("||"),
                             F.col("b"), F.lit("|")),
                    F.concat(F.lit("|"), F.col("a"), F.col("b"), F.lit("|")),
                ).alias("sym"),
            )
            .localCheckpoint(eager=False)
        )
    return merges.select("round", "a", "b", "pair_count")


def bpe_apply(
    df: DataFrame,
    rounds: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """APPLY the first ``rounds`` learned BPE merges back to the corpus —
    the other half of tokenizer induction: train on the word-frequency
    vocab (bpe_merges' loop, re-run here carrying the merged word table)
    and report what the learned merges bought, as one summary row:
    total_words, vocab_size, tokens_before (characters per word, the
    round-0 symbol count), tokens_after (symbols after the merges), and
    compression = tokens_before / tokens_after.

    Scale shape: identical to bpe_merges — every round runs on the VOCAB
    table (explode → keyed sum → 1-row broadcast argmax → row-local
    replace), never the raw corpus; the final stats are one aggregation
    over the vocab."""
    tok = df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
    )
    vocab = (
        tok.where(~F.col("w").contains("|"))
        .groupBy("w").agg(F.count("*").alias("cnt"))
    )
    words = vocab.select(
        "cnt",
        F.length("w").alias("n0"),
        F.concat(
            F.lit("|"),
            F.array_join(F.split(F.col("w"), ""), "||"),
            F.lit("|"),
        ).alias("sym"),
    ).localCheckpoint(eager=False)

    for r in range(1, rounds + 1):
        arr = F.split(F.expr("trim(BOTH '|' FROM sym)"), r"\|\|")
        pairs = words.select(
            "cnt", F.posexplode(arr).alias("__i", "a"), arr.alias("__arr")
        ).select(
            "cnt", "a",
            F.try_element_at(F.col("__arr"), F.col("__i") + 2).alias("b"),
        ).where(F.col("b").isNotNull())
        # 1-row bounded collect: a round with NO remaining adjacent pair
        # must be a no-op (further rounds can't merge anything either) —
        # crossJoining an empty argmax would wipe the whole vocab table
        # and degenerate the summary to NULLs
        top = (
            pairs.groupBy("a", "b")
            .agg(F.sum("cnt").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a_v, b_v = top[0]["a"], top[0]["b"]
        words = (
            words.select(
                "cnt", "n0",
                F.replace(
                    F.col("sym"),
                    F.lit(f"|{a_v}||{b_v}|"),
                    F.lit(f"|{a_v}{b_v}|"),
                ).alias("sym"),
            )
            .localCheckpoint(eager=False)
        )
    n_after = F.size(F.split(F.expr("trim(BOTH '|' FROM sym)"), r"\|\|"))
    return words.agg(
        F.sum("cnt").cast("bigint").alias("total_words"),
        F.count("*").cast("bigint").alias("vocab_size"),
        F.sum(F.col("cnt") * F.col("n0")).cast("bigint")
        .alias("tokens_before"),
        F.sum(F.col("cnt") * n_after).cast("bigint").alias("tokens_after"),
    ).select(
        "total_words", "vocab_size", "tokens_before", "tokens_after",
        F.round(
            F.col("tokens_before").cast("double") / F.col("tokens_after"), 6
        ).alias("compression"),
    )


def ngram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Per-document n-gram novelty: the share of a doc's distinct word
    n-grams that NO earlier document (lower id — ingestion order) contains.
    The corpus-curation redundancy curve: novelty ~1 → fresh content,
    novelty ~0 → the doc restates what the corpus already has (candidates
    for down-sampling after the near-dup passes).

    Two keyed stages: min-first-doc per shingle (one hash agg on the
    shingle key), then the doc's shingle rows join that table and fold to
    a per-doc mean of [first_doc == doc]. Both shuffles key on shingle /
    doc — no window over unbounded input, no self-join.
    """
    from .dedup import _shingles

    sh = df.select(
        F.col(id_col).alias("__id"),
        F.explode(_shingles(text_col, n)).alias("sh"),
    )
    first = sh.groupBy("sh").agg(F.min("__id").alias("__first"))
    return (
        sh.join(first, "sh")
        .groupBy(F.col("__id").alias(id_col))
        .agg(
            F.count("*").alias("n_shingles"),
            F.round(
                F.avg((F.col("__first") == F.col("__id")).cast("double")),
                round_to,
            ).alias("novelty"),
        )
    )


def ppl_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): score
    every document with the unigram-LM NLL (the perplexity proxy — see
    unigram_nll), then split each language into head / middle / tail
    TERTILES by score and summarize the buckets. CCNet keeps "head" (most
    fluent third) for pretraining and drops or downweights "tail".

    Scale shape — deliberately NOT a per-language NTILE window: ranking all
    docs of one language in a single window partition is the classic skew
    hazard at corpus scale (one language can be most of the corpus). The
    tertile CUTOFFS come from the bounded (lang, nll) histogram instead —
    keyed count (map-side combinable), cumulative window over the
    histogram's distinct-value rows only — and the bucket assignment joins
    the ≤|langs|-row threshold table back broadcast, row-local. Same
    inverse-CDF construction as length_quantiles; deterministic because
    bucket membership is a pure function of the (rounded) score, never of
    row order.
    """
    from pyspark.sql import Window

    nll = unigram_nll(df, id_col=id_col, text_col=text_col)
    # BOTH the cutoff histogram and the final bucket aggregation consume
    # the scored table — checkpoint so the two-token-pass NLL chain runs
    # once, not twice (same shape as dsir_weights' feats)
    scored = (
        df.select(id_col, lang_col)
        .join(nll, id_col)
        .localCheckpoint(eager=False)
    )
    hist = scored.groupBy(lang_col, "nll").agg(F.count("*").alias("__n"))
    cum_w = (
        Window.partitionBy(lang_col)
        .orderBy("nll")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy(lang_col)
    h = hist.withColumn("__cum", F.sum("__n").over(cum_w)).withColumn(
        "__tot", F.sum("__n").over(tot_w)
    )
    thr = h.groupBy(lang_col).agg(
        F.min(
            F.when(F.col("__cum") >= F.ceil(F.col("__tot") / F.lit(3.0)),
                   F.col("nll"))
        ).alias("__t1"),
        F.min(
            F.when(
                F.col("__cum") >= F.ceil(F.lit(2.0) * F.col("__tot") / F.lit(3.0)),
                F.col("nll"),
            )
        ).alias("__t2"),
    )
    bucket = (
        F.when(F.col("nll") <= F.col("__t1"), F.lit("head"))
        .when(F.col("nll") <= F.col("__t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scored.join(F.broadcast(thr), lang_col)
        .withColumn("bucket", bucket)
        .groupBy(lang_col, "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(F.avg("nll"), 4).alias("avg_nll"),
            F.min("nll").alias("min_nll"),
            F.max("nll").alias("max_nll"),
        )
    )


def bigram_nll(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Per-document mean negative log-likelihood under an add-1-smoothed
    corpus BIGRAM LM — the stronger perplexity-proxy quality filter
    (unigram_nll's sequel: boilerplate with plausible unigrams but odd
    transitions scores high here).

    p(w2 | w1) = (c(w1 w2) + 1) / (c_prefix(w1) + V), where c_prefix(w1)
    counts w1's occurrences AS A BIGRAM PREFIX and V = |distinct suffix
    vocabulary| — with add-1 over V outcomes this normalizes exactly
    (Σ_w2 p = 1), and every count derives from ONE bigram explode of the
    corpus (no separate unigram pass).

    Scale shape (r7 verdict #3 — the 50× materialization cost, measured
    exhaustively this round): the exploded bigram stream is spread
    (single-row-group scan hazard) and persisted SERIALIZED
    (StorageLevel.MEMORY_AND_DISK) — both the count-aggregation chain
    and the per-doc score join consume it, and serialized column-batch
    storage beats localCheckpoint's deserialized row objects by ~2.4×
    at the 50× corpus (11.1 s → 4.6 s median; GC pressure, not compute).
    A shared-subtree formulation without any materialization was also
    measured (61 s — Catalyst column-prunes each consumer's copy of the
    subtree differently, e.g. the V count-distinct collapses straight
    onto the explode, so ReuseExchange never fires and the explode runs
    4×), as was pre-aggregating to per-(doc,bigram) counts before
    materializing (the extra full-stream shuffle costs more than the
    combine saves at ~1.3 occurrences per (doc,bigram)). The persist's
    InMemoryRelation stats are untrustworthy for join planning — the
    shuffle_hash hint below pins the one hazardous join. Log-probs
    attach at the VOCAB level (c12 ⋈ prefix-sum, both keyed on w1, + a
    1-row V broadcast); per-token log-probs round to 8 decimals before
    the per-doc mean (libm reproducibility), the mean to ``round_to``.
    """
    from pyspark import StorageLevel

    from .dedup import spread_partitions

    # bigram construction via zip_with over two slices of the token array:
    # measured 7.7x faster at the 50x corpus than the former
    # transform(sequence, i -> concat(element_at(t,i), element_at(t,i+1)))
    # shape — an expression referenced inside a HOF lambda is re-evaluated
    # PER ELEMENT (no common-subexpression elimination across the lambda
    # boundary), so that shape re-ran the regex split once per bigram.
    # zip_with+slice references the token expression twice per ROW.
    t = tokens(F.col(text_col))
    bigrams = F.when(
        F.size(t) >= 2,
        F.zip_with(
            F.slice(t, 1, F.size(t) - 1),
            F.slice(t, 2, F.size(t) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = (
        spread_partitions(df.select(id_col, text_col), id_col)
        .select(F.col(id_col), F.explode(bigrams).alias("__bg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    c12 = bg.groupBy("__bg").agg(F.count("*").alias("__c12"))
    c12 = c12.withColumn("__w1", F.substring_index("__bg", " ", 1))
    cp = c12.groupBy("__w1").agg(F.sum("__c12").alias("__cp"))
    vocab = c12.agg(
        F.countDistinct(F.substring_index("__bg", " ", -1)).alias("__v")
    )
    lp = (
        c12.join(cp, "__w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "__bg",
            F.round(
                F.log((F.col("__c12") + 1) / (F.col("__cp") + F.col("__v")))
                * F.lit(1e8),
                0,
            ).cast("long").alias("__lp8"),
        )
    )
    # per-token log-probs carried as 1e8-scaled integers: the per-doc sum
    # is exact (order- and engine-independent), and the emitted mean NLL
    # is ONE chain of identical IEEE divisions — never a rounded float
    # sum (averaging rounded doubles hits decimal half-way ties
    # systematically; same cure as sampling.dsir_weights)
    # the vocab-side join MUST be an explicit shuffle-hash: cached/
    # checkpointed scans carry unreliable stats, and the planner was
    # measured BROADCASTING THE 13M-ROW STREAM as the build side
    # (BuildLeft — a driver-OOM at real scale and 15+ s here); a forced
    # F.broadcast(lp) is wrong the other way (web-scale bigram vocab
    # exceeds the broadcast ceiling). shuffle_hash keys both sides on
    # __bg with no sort and no driver collect: 26 s -> 3.9 s at the 50x
    # corpus, and the shape stays correct at any vocab size.
    per_doc = (
        bg.join(lp.hint("shuffle_hash"), "__bg")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("__lp8").alias("__s8"),
        )
        .select(
            id_col,
            "n_bigrams",
            ((-F.col("__s8")).cast("double") / F.lit(1e8)
             / F.col("n_bigrams")).alias("nll"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("nll", F.lit(0.0)).alias("nll"),
        )
    )


def kn_bigram_nll(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Per-document mean NLL under an interpolated KNESER-NEY bigram LM
    (Kneser & Ney 1995; the smoothing KenLM uses, i.e. what CCNet's
    quality-perplexity filter actually runs — add-1's sequel the same way
    bigram_nll is unigram_nll's):

        p(w2|w1) = (c(w1 w2) - D)/c(w1·)
                   + D · N1+(w1 ·)/c(w1·) · N1+(· w2)/N1+(· ·)

    with discount D=0.75. The continuation probability N1+(· w2)/B scores
    how many CONTEXTS a word follows rather than how often it occurs —
    the distributional signal plain counts miss.

    Every model quantity is an exact integer derived from ONE bigram
    explode (the bigram_nll persist shape): c(w1 w2) = the keyed count,
    c(w1·) and N1+(w1 ·) = one groupBy over it (sum + count of types),
    N1+(· w2) = one groupBy on the suffix, B = a 1-row type count.
    Scored bigrams all have c >= 1 > D, so max(c-D, 0) never truncates.
    Log-probs round to 8 dp and ride as 1e8-scaled integers into the
    per-doc sum (exact; the emitted mean is one IEEE division chain).

    Scale shape: identical to bigram_nll — serialized persist of the
    spread explode (two consumers), all model joins keyed on w1/w2,
    the 1-row B broadcast, shuffle_hash pinned on the vocab-side join
    (cached-scan stats are untrustworthy for build-side choice)."""
    from pyspark import StorageLevel

    from .dedup import spread_partitions

    t = tokens(F.col(text_col))
    bigrams = F.when(
        F.size(t) >= 2,
        F.zip_with(
            F.slice(t, 1, F.size(t) - 1),
            F.slice(t, 2, F.size(t) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = (
        spread_partitions(df.select(id_col, text_col), id_col)
        .select(F.col(id_col), F.explode(bigrams).alias("__bg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # c12 is VOCAB-bounded and has four consumers (fw, bw, btot, lp) —
    # persist it serialized so each consumer re-aggregates the bounded
    # type table, not the cached full bigram stream
    c12 = (
        bg.groupBy("__bg").agg(F.count("*").alias("__c12"))
        .withColumn("__w1", F.substring_index("__bg", " ", 1))
        .withColumn("__w2", F.substring_index("__bg", " ", -1))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    fw = c12.groupBy("__w1").agg(
        F.sum("__c12").alias("__cp"),          # c(w1 ·)
        F.count("*").alias("__n1fw"),          # N1+(w1 ·): distinct types
    )
    bw = c12.groupBy("__w2").agg(F.count("*").alias("__n1bw"))  # N1+(· w2)
    btot = c12.agg(F.count("*").alias("__b"))  # N1+(· ·): total types
    d = F.lit(discount)
    prob = (
        (F.col("__c12") - d) / F.col("__cp")
        + d * F.col("__n1fw") / F.col("__cp")
        * F.col("__n1bw") / F.col("__b")
    )
    lp = (
        c12.join(fw, "__w1")
        .join(bw, "__w2")
        .crossJoin(F.broadcast(btot))
        .select(
            "__bg",
            F.round(F.log(prob) * F.lit(1e8), 0).cast("long").alias("__lp8"),
        )
    )
    per_doc = (
        bg.join(lp.hint("shuffle_hash"), "__bg")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("__lp8").alias("__s8"),
        )
        .select(
            id_col,
            "n_bigrams",
            ((-F.col("__s8")).cast("double") / F.lit(1e8)
             / F.col("n_bigrams")).alias("nll"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("nll", F.lit(0.0)).alias("nll"),
        )
    )


def kn_trigram_nll(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Per-document mean NLL under an interpolated KNESER-NEY TRIGRAM LM —
    kn_bigram_nll's order-3 sequel, the full recursion KenLM's production
    filters run:

        p(w3|w1 w2) = (c(w1w2w3) - D)/c(w1w2·)
                      + D·N1+(w1w2·)/c(w1w2·) · p_cont(w3|w2)
        p_cont(w3|w2) = (N1+(·w2w3) - D)/N1+(·w2·)
                        + D·N1+(w2·)/N1+(·w2·) · N1+(··w3)/N1+(···)

    where every lower-order quantity is a CONTINUATION count (how many
    distinct left contexts), estimated within the trigram event space
    (boundary bigrams of <3-token docs contribute no events — documented
    estimator choice, identical on both engines). All model quantities
    are exact integers off ONE trigram explode: the trigram type table
    feeds the order-3 context stats, its (w2,w3) projection IS the
    continuation bigram table, and that table's per-w2/per-w3 rollups
    give every lower-order term. Scored events have c >= 1 > D on both
    levels, so the discount never truncates. Log-probs round to 8 dp and
    ride as 1e8-scaled integers (rule 12).

    Scale shape: kn_bigram_nll's exactly — serialized persist of the
    spread explode (two consumers) and of the vocab-bounded type table
    (four consumers), keyed joins only, 1-row total broadcast,
    shuffle_hash pinned on the vocab-side join."""
    from pyspark import StorageLevel

    from .dedup import spread_partitions

    t = tokens(F.col(text_col))
    n = F.size(t)
    t12 = F.zip_with(
        F.slice(t, 1, n - 2), F.slice(t, 2, n - 2),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    trigrams = F.when(
        n >= 3,
        F.zip_with(t12, F.slice(t, 3, n - 2),
                   lambda ab, c: F.concat_ws(" ", ab, c)),
    ).otherwise(F.array().cast("array<string>"))
    tg = (
        spread_partitions(df.select(id_col, text_col), id_col)
        .select(F.col(id_col), F.explode(trigrams).alias("__tg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    c123 = (
        tg.groupBy("__tg").agg(F.count("*").alias("__c"))
        .withColumn("__w1", F.substring_index("__tg", " ", 1))
        .withColumn(
            "__w2",
            F.substring_index(F.substring_index("__tg", " ", 2), " ", -1),
        )
        .withColumn("__w3", F.substring_index("__tg", " ", -1))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    fw = c123.groupBy("__w1", "__w2").agg(
        F.sum("__c").alias("__cp"),            # c(w1 w2 ·)
        F.count("*").alias("__n1fw"),          # N1+(w1 w2 ·)
    )
    # continuation bigram table: one row per (w2, w3) trigram-type pair;
    # its row count per pair = N1+(· w2 w3)
    cont = c123.groupBy("__w2", "__w3").agg(F.count("*").alias("__c23"))         .persist(StorageLevel.MEMORY_AND_DISK)
    cmid = cont.groupBy("__w2").agg(
        F.sum("__c23").alias("__cm"),          # N1+(· w2 ·)
        F.count("*").alias("__t2"),            # N1+(w2 ·) in cont space
    )
    low = cont.groupBy("__w3").agg(F.count("*").alias("__n1l"))
    btot = cont.agg(F.count("*").alias("__b"))
    d = F.lit(discount)
    p_low = F.col("__n1l") / F.col("__b")
    p_mid = (
        (F.col("__c23") - d) / F.col("__cm")
        + d * F.col("__t2") / F.col("__cm") * p_low
    )
    prob = (
        (F.col("__c") - d) / F.col("__cp")
        + d * F.col("__n1fw") / F.col("__cp") * p_mid
    )
    lp = (
        c123.join(fw, ["__w1", "__w2"])
        .join(cont, ["__w2", "__w3"])
        .join(cmid, "__w2")
        .join(low, "__w3")
        .crossJoin(F.broadcast(btot))
        .select(
            "__tg",
            F.round(F.log(prob) * F.lit(1e8), 0).cast("long").alias("__lp8"),
        )
    )
    per_doc = (
        tg.join(lp.hint("shuffle_hash"), "__tg")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_trigrams"),
            F.sum("__lp8").alias("__s8"),
        )
        .select(
            id_col,
            "n_trigrams",
            ((-F.col("__s8")).cast("double") / F.lit(1e8)
             / F.col("n_trigrams")).alias("nll"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_trigrams", F.lit(0)).alias("n_trigrams"),
            F.coalesce("nll", F.lit(0.0)).alias("nll"),
        )
    )



def dup_ngram_frac(text_col: str = "text", n: int = 3) -> Column:
    """Duplicate word n-gram fraction of one document (the q_doc_repetition
    / Gopher-style repetition signal): 1 − distinct/total n-grams, rounded
    6, 0.0 for docs shorter than ``n`` tokens. Row-local; shared by the
    batch curation query and the streaming curation gate so both compare
    the exact same rounded integer-ratio double."""
    toks = tokens(F.col(text_col))
    tg = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.when(
        F.size(toks) >= n,
        F.round(
            1.0 - F.size(F.array_distinct(tg)) / (F.size(toks) - (n - 1)), 6
        ),
    ).otherwise(F.lit(0.0))
