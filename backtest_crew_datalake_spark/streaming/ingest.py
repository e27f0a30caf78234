"""Structured Streaming ingest — the idiomatic upgrade of the reference's
idempotent day-batch loop (SURVEY §2.11).

The reference re-runs day batches and merge-dedupes on the primary key
(ref writer.py:193-199, binance/ingest_cli.py:75-77). The streaming
translation:

- ``stream_ingest_candles``: readStream from a landing directory →
  ``foreachBatch`` keyed upsert into the partitioned lake. Each micro-batch
  reuses the batch writer's merge (union + row_number keep-last), so replays
  and duplicate deliveries are idempotent per key — exactly-once *effect* on
  the lake without Delta.
- ``streaming_resample``: watermarked tumbling-window OHLCV rollup — the
  streaming face of operator A1; late bars within the watermark update their
  bucket, later ones are dropped (the reference's closest analog is re-running
  the day batch).

Scale: foreachBatch writes only partitions touched by the micro-batch
(dynamic partition overwrite); state for the windowed agg is bounded by the
watermark horizon × symbols.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import CANDLE_SCHEMA
from ..sources.writer import upsert_candles


def stream_ingest_candles(
    spark: SparkSession,
    landing_dir: str,
    lake_root: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (and with available_now=True, run to completion) a streaming
    ingest from parquet files landing in ``landing_dir`` into the lake.

    Returns the StreamingQuery handle.
    """
    stream = (
        spark.readStream.schema(CANDLE_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(landing_dir)
    )

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_candles(batch_df.sparkSession, batch_df, lake_root)

    writer = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def streaming_sessions(
    stream_df: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    by: tuple = ("user_id",),
    ts_col: str = "ts",
) -> DataFrame:
    """Native session windows over a stream: one output row per closed
    session with start/end/count. Built-in `session_window` merges
    overlapping gap-extended windows; the watermark bounds state and seals
    sessions for append output (cf. streaming/stateful.py for the custom
    applyInPandasWithState formulation of the same op)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(*by, F.session_window(ts_col, gap))
        .agg(F.count("*").alias("n_events"))
        .select(
            *by,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(
    stream_df: DataFrame,
    key: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming PK dedup — the streaming face of the write-path keep-last
    contract (ref binance/ingest_cli.py:75-77 ≈ late/duplicate handling):
    duplicates arriving within the watermark horizon are dropped; state is
    bounded by the horizon (SURVEY §2.11)."""
    from ..schemas import PRIMARY_KEY

    return stream_df.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        key or PRIMARY_KEY
    )


def streaming_resample(
    stream_df: DataFrame,
    tf: str = "M5",
    watermark: str = "10 minutes",
    by: tuple = ("symbol",),
) -> DataFrame:
    """Watermarked tumbling OHLCV rollup over a streaming source (A1's
    streaming face). Late rows beyond ``watermark`` are dropped; output mode
    'update'/'append' chosen by the caller's sink."""
    from ..functions.timeframes import tf_seconds

    secs = tf_seconds(tf)
    ordk = F.struct(F.col("ts"))
    return (
        stream_df.withWatermark("ts", watermark)
        # group by the window struct itself — extracting .start before the
        # aggregation severs event-time watermark tracking
        .groupBy(*by, F.window("ts", f"{secs} seconds"))
        .agg(
            F.min_by("open", ordk).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", ordk).alias("close"),
            F.sum("volume").alias("volume"),
        )
        .select(*by, F.col("window.start").alias("bucket"),
                "open", "high", "low", "close", "volume")
    )


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: each left event pairs with the right
    events of the same key whose timestamp lies in
    [left.ts - lookback, left.ts] — the streaming face of the batch
    interval-join operator (operators/rangejoin.py) and the as-of
    candidate-window shape.

    Both sides are watermarked so Spark can bound the join state: right
    rows are dropped from state once the left watermark passes their ts +
    lookback (the time-condition gives Spark the eviction bound — an
    unconstrained stream-stream join would hold state forever). Output
    columns: key, left ts/value as (l_ts, l_value), right as (r_ts,
    r_value).

    Scale: state is O(keys × events-per-lookback-window); the join
    shuffles both streams on the key, identical to the batch equi-join.
    """
    l = (
        left.withWatermark(left_ts, watermark)
        .select(
            F.col(key), F.col(left_ts).alias("l_ts"),
            F.col("value").alias("l_value"),
        )
    )
    r = (
        right.withWatermark(right_ts, watermark)
        .select(
            F.col(key).alias("__rk"), F.col(right_ts).alias("r_ts"),
            F.col("value").alias("r_value"),
        )
    )
    cond = (
        (F.col(key) == F.col("__rk"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    return l.join(r, cond).drop("__rk")


def streaming_contamination(
    spark: SparkSession,
    landing_dir: str,
    benchmark: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    n: int = 3,
    min_ratio: float = 0.1,
    available_now: bool = True,
):
    """Continuous benchmark-decontamination over documents landing as
    parquet files: each micro-batch runs the batch ``contamination``
    operator (single-pass marked left join against the distinct benchmark
    shingle set) and writes flagged docs to ``out_dir``. Documents are
    self-contained rows, so per-batch scoring IS the exact batch answer —
    no cross-batch state, no watermark; the benchmark side is computed
    once per batch from the (static, broadcastable) benchmark frame.

    foreachBatch is at-least-once: a batch replayed after a post-write
    failure would double its rows under a blind append, so each batch
    OVERWRITES its own ``batch_id``-keyed subdirectory — replays rewrite
    the same path and the sink stays exactly-once. Read the sink with
    ``spark.read.parquet(f"{out_dir}/batch_id=*")`` (or just ``out_dir``
    with partition discovery).

    Returns the StreamingQuery handle.
    """
    from ..pipeline.sampling import contamination

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(landing_dir)
    )

    def _scan(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            contamination(batch_df, benchmark, n=n, min_ratio=min_ratio)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )

    writer = (
        stream.writeStream.foreachBatch(_scan)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def streaming_hll_distinct(
    spark: SparkSession,
    landing_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    schema: str,
    key_expr: str,
    p: int = 6,
    available_now: bool = True,
):
    """Continuous distinct-count estimation over a landing dir: each
    micro-batch folds its rows into a persistent HLL register table
    (pipeline/sketch.hll_build) at ``state_dir`` by register-wise MAX.

    Why this shape survives at-least-once foreachBatch with NO batch_id
    bookkeeping (unlike streaming_contamination's keyed subdirs): sketch
    merge is IDEMPOTENT — replaying a batch re-merges the same register
    maxima and the state is unchanged. The state itself is bounded at
    2^p rows regardless of stream cardinality, so the per-batch merge
    runs through the driver (bounded, like the poller cursor).
    ``hll_estimate`` over the state gives the running distinct estimate
    at any point.

    State commits via the same dot-prefixed tmp/bak two-rename swap as
    writer.compact_partitions: the new registers land in a hidden tmp
    dir, old state renames to bak, tmp renames in, bak drops. A crash in
    any gap leaves either the old state or a recoverable bak — never a
    half-written state dir — and the next merge restores the bak before
    reading (idempotence alone doesn't cover that window: the crashed
    batch is already committed in the stream checkpoint and is never
    replayed).

    Returns the StreamingQuery handle.
    """
    import os
    import shutil

    from pyspark.sql import functions as F

    from ..pipeline.sketch import hll_build

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(landing_dir)
    )

    parent, base = os.path.split(os.path.abspath(state_dir))
    tmp = os.path.join(parent, f".__hll_tmp_{base}")
    bak = os.path.join(parent, f".__hll_bak_{base}")

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # recovery: a crash between the two renames leaves the state dir
        # absent but fully preserved in the bak — restore before reading
        if not os.path.exists(state_dir) and os.path.exists(bak):
            os.rename(bak, state_dir)
        regs = hll_build(
            batch_df.select(F.expr(key_expr).alias("__k")), "__k", p=p
        ).collect()  # bounded: at most 2^p rows
        state: dict[int, int] = {}
        if os.path.exists(state_dir):
            for r in spark.read.parquet(state_dir).collect():
                state[r.reg] = r.rho
        for r in regs:
            if r.rho > state.get(r.reg, 0):
                state[r.reg] = r.rho
        shutil.rmtree(tmp, ignore_errors=True)
        (
            spark.createDataFrame(
                sorted(state.items()), "reg long, rho int"
            )
            .coalesce(1)
            .write.mode("overwrite").parquet(tmp)
        )
        shutil.rmtree(bak, ignore_errors=True)
        if os.path.exists(state_dir):
            os.rename(state_dir, bak)
        os.rename(tmp, state_dir)
        shutil.rmtree(bak, ignore_errors=True)

    writer = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def streaming_acid_upsert(
    spark: SparkSession,
    landing_dir: str,
    table_root: str,
    checkpoint_dir: str,
    schema: str,
    key: tuple[str, ...],
    partition_by: tuple[str, ...] = (),
    available_now: bool = True,
):
    """Continuous MERGE into an ACID table: each micro-batch upserts into
    ``table_root`` via sources/acid.acid_upsert — the streaming Delta
    `MERGE INTO` analogue, with no table-format dependency.

    Exactly-once EFFECT from at-least-once foreachBatch, with no batch_id
    bookkeeping: keyed keep-last upsert is idempotent (replaying a batch
    re-merges the same keys to the same values — a new version whose CONTENT
    equals the previous one), and each batch's multi-partition merge is one
    atomic manifest commit, so a crash mid-batch leaves the table at the
    previous snapshot and the replay completes it. Readers polling the table
    between batches always see a complete snapshot, never a half-applied
    batch. CROSS-batch ordering of updates to the same key is preserved by
    the stream checkpoint (replays re-run the same batch boundaries in
    order), not by the merge — within one batch, the last row per key by
    deterministic tie-break wins, as in every keyed upsert here.

    Returns the StreamingQuery handle.
    """
    from ..sources.acid import acid_upsert

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(landing_dir)
    )

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        acid_upsert(spark, batch_df, table_root, key, partition_by)

    writer = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def streaming_scd2(
    spark: SparkSession,
    landing_dir: str,
    table_root: str,
    checkpoint_dir: str,
    schema: str,
    key: tuple[str, ...],
    attrs: tuple[str, ...],
    ts_col: str = "ts",
    order_col: str = "seq",
    buckets: int = 16,
    available_now: bool = True,
):
    """Continuously maintain an SCD TYPE-2 dimension ACID table from a
    stream of attribute updates — the streaming twin of
    operators/scd.scd2_build, so a PIT join (scd.pit_join) over the table
    is correct BETWEEN micro-batches, not only at end-of-stream.

    Per micro-batch: the batch's keys' OPEN versions are read back from
    the table and re-seeded into the change stream at their eff_from
    (with a null ``order_col``, so any batch row at the same timestamp
    wins the keep-last tiebreak), scd2_build rebuilds just the open
    region, and the rebuilt versions merge in via acid_upsert keyed on
    (key..., eff_from): a version that stayed open updates idempotently,
    a version that got superseded closes (eff_to set, is_current false),
    new versions insert. Closed history is never rewritten.

    Churn contract: the table is hash-partitioned on ``pmod(xxhash64(
    key), buckets)`` (column ``__bucket``), the open-version read-back
    prunes to the batch's buckets at the MANIFEST level, and the upsert
    passes ``partition_by`` so only touched buckets' files are read or
    rewritten — per batch both the read and the write are
    O(table/buckets x touched buckets), never O(table). ``buckets=0``
    opts out (unpartitioned table, full-table read+rewrite per batch —
    only sane for tiny dimensions). An existing unpartitioned table
    migrates forward automatically: acid_upsert rewrites old-spec files
    under the current spec on first touch.

    Out-of-order policy (documented contract, enforced): a batch row
    OLDER than its key's open version is dropped — accepting it would
    require rewriting closed history; same drop-stale stance as the
    resample/or-levels streams take for late prior-day bars. Rows at the
    open version's exact eff_from re-decide that version (keep-last).

    Exactly-once effect from at-least-once foreachBatch, same argument as
    streaming_acid_upsert: the rebuild is a pure function of (open
    versions, batch) and the keyed upsert is idempotent, so replaying the
    last batch after a crash between table-commit and checkpoint-commit
    re-merges identical rows. ``order_col`` must be non-null on stream
    rows (it breaks equal-timestamp ties deterministically).
    """
    from ..operators.scd import scd2_build
    from ..sources.acid import acid_read, acid_upsert, latest_version

    key = list(key)
    attrs = list(attrs)

    bucket_col = F.pmod(F.xxhash64(*key), F.lit(buckets)).cast("int")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch = batch_df.select(*key, ts_col, order_col, *attrs)
        if buckets:
            # bounded collect: <= `buckets` small ints, never data-sized
            hit = sorted(
                str(r[0]) for r in
                batch.select(bucket_col.alias("b")).distinct().collect()
            )
            pfilter = {"__bucket": hit}
        else:
            pfilter = None
        if latest_version(table_root) > 0:
            open_v = (
                acid_read(spark, table_root, partition_filter=pfilter)
                .where(F.col("is_current"))
                .join(batch.select(*key).distinct(), key, "left_semi")
                .select(
                    *key,
                    F.col("eff_from").alias(ts_col),
                    F.lit(None).cast(dict(batch.dtypes)[order_col])
                    .alias(order_col),
                    *attrs,
                )
            )
            fresh = batch.join(
                open_v.select(*key, F.col(ts_col).alias("__open_from")),
                key, "left",
            ).where(
                F.col("__open_from").isNull()
                | (F.col(ts_col) >= F.col("__open_from"))
            ).drop("__open_from")
            stream = open_v.unionByName(fresh)
        else:
            stream = batch
        rebuilt = scd2_build(
            stream, key=key, attrs=attrs, ts_col=ts_col, order_col=order_col
        )
        if buckets:
            acid_upsert(
                spark, rebuilt.withColumn("__bucket", bucket_col),
                table_root, key=(*key, "eff_from"),
                partition_by=("__bucket",),
            )
        else:
            acid_upsert(
                spark, rebuilt, table_root, key=(*key, "eff_from"),
            )

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(landing_dir)
    )
    writer = (
        src.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()



def streaming_txn(
    spark: SparkSession,
    landing_dir: str,
    fact_root: str,
    mv_root: str,
    catalog_root: str,
    checkpoint_dir: str,
    schema: str,
    key: tuple[str, ...],
    mv_key: str,
    agg_col: str,
    partition_by: tuple[str, ...] = (),
    available_now: bool = True,
):
    """Exactly-once MULTI-TABLE streaming pipeline: per micro-batch, (1)
    keyed-upsert the batch into the fact table, (2) advance the fact's
    per-``mv_key`` rollup MV incrementally from the change data feed of
    that very commit (never re-aggregating the fact — the
    q_acid_incremental_mv fold), (3) publish BOTH as one consistent
    catalog version. Readers going through the catalog can never observe
    the fact without its rollup or vice versa — the torn-pair hazard a
    two-table foreachBatch normally has between its two writes.

    Exactly-once effect under at-least-once foreachBatch, compositionally:
    the upsert is idempotent (content-equal replay), and the MV advance is
    anchored to a DURABLE applied-watermark — the (fact, mv) versions the
    last catalog commit published — never to ``latest_version`` at replay
    time. Every read in the fold (the CDF's from-version AND the MV
    snapshot being advanced) binds to the watermark, so a crash ANYWHERE
    between the fact upsert and the catalog commit replays as: re-upsert
    (content-equal), re-fold CDF(watermark -> new fact version) over
    MV@watermark (applies the batch exactly once; an orphaned MV version
    written before the crash is simply never referenced), re-publish. A
    replay-time ``latest_version`` anchor would instead see the crashed
    attempt's own fact commit, fold an empty CDF, and silently lose the
    batch from the MV forever. The MV carries its sums as 1e6-scaled
    BIGINTs (rule 12) so incremental arithmetic can never drift from a
    full recompute.
    """
    from ..operators.dedup import dedupe_keep
    from ..sources.acid import (
        acid_changes, acid_read, acid_upsert, acid_write,
    )
    from ..sources.catalog import catalog_commit, catalog_tables

    key = list(key)
    a6 = F.round(F.col(agg_col) * 1000000).cast("bigint")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # within-batch keep-last so the CDF's post-images are key-unique
        batch = dedupe_keep(batch_df, key, order=None, keep="last")
        # durable applied-watermark (see docstring): versions from the
        # last PUBLISHED catalog snapshot, 0 before the first commit
        try:
            tabs = catalog_tables(catalog_root)
            wm_fact = tabs["fact"][1]
            wm_mv = tabs["mv"][1]
        except FileNotFoundError:
            wm_fact, wm_mv = 0, 0
        fv = acid_upsert(spark, batch, fact_root, key=tuple(key),
                         partition_by=partition_by)
        sign = (
            F.when(F.col("_change_type")
                   .isin("insert", "update_postimage"), 1)
            .otherwise(-1).cast("bigint")
        )
        kd = (F.when(F.col("_change_type") == "insert", 1)
              .when(F.col("_change_type") == "delete", -1)
              .otherwise(0).cast("bigint"))
        delta = (
            acid_changes(spark, fact_root, from_version=wm_fact,
                         to_version=fv, key=tuple(key))
            .groupBy(mv_key)
            .agg(F.sum(kd).alias("d_n"), F.sum(sign * a6).alias("d_a6"))
        ) if wm_fact > 0 else (
            # bootstrap: no catalog commit yet, so the MV reflects
            # nothing — fold the WHOLE fact snapshot at fv as inserts.
            # Reading the table (not the batch) also covers a replay
            # that crashed between the very first upsert and the first
            # catalog commit, where fact@fv may exceed this batch.
            acid_read(spark, fact_root, version=fv)
            .groupBy(mv_key)
            .agg(F.count("*").cast("bigint").alias("d_n"),
                 F.sum(a6).alias("d_a6"))
        )
        z = F.lit(0).cast("bigint")
        if wm_mv > 0:
            mv_prev = acid_read(spark, mv_root, version=wm_mv)
        else:
            mv_prev = spark.createDataFrame(
                [],
                f"{mv_key} {dict(batch.dtypes)[mv_key]}, "
                "n_rows bigint, a6 bigint",
            )
        mv_new = (
            mv_prev.join(delta, mv_key, "full_outer")
            .select(
                mv_key,
                (F.coalesce("n_rows", z) + F.coalesce("d_n", z))
                .alias("n_rows"),
                (F.coalesce("a6", z) + F.coalesce("d_a6", z)).alias("a6"),
            )
            .where(F.col("n_rows") > 0)
        )
        mvv = acid_write(spark, mv_new, mv_root, mode="overwrite")
        catalog_commit(catalog_root, {
            "fact": (fact_root, fv), "mv": (mv_root, mvv),
        })

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(landing_dir)
    )
    writer = (
        src.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()



def streaming_delete_feed(
    spark: SparkSession,
    landing_dir: str,
    table_root: str,
    checkpoint_dir: str,
    schema: str,
    key: tuple[str, ...],
    available_now: bool = True,
):
    """Continuous right-to-be-forgotten processing: each micro-batch of
    deletion requests (key tuples) commits as ONE merge-on-read equality
    delete (sources/acid.acid_delete_mor) — O(|requests|) per batch at
    any table size, no data rewrite on the hot path. The streaming twin
    of the MoR delete, and the shape a GDPR/erasure pipeline actually
    needs: the request stream is tiny, the table is not.

    Suppression is immediate; PHYSICAL erasure is a separate maintenance
    pass the operator must schedule: ``acid_compact(...,
    purge_deletes=True)`` force-rewrites every partition a live delete
    entry still reaches (fragmentation-triggered compaction alone may
    never touch a well-sized partition), and the rows stay reachable via
    time travel until ``acid_vacuum`` drops the pre-purge snapshots'
    files. Erasure SLA = purge-compact interval + vacuum retention.

    Exactly-once EFFECT from at-least-once foreachBatch: replaying a
    batch commits a delete file with the SAME keys — suppression is
    idempotent (max-merge over delete seqs), so table CONTENT is
    unchanged; the duplicate delete entry is spent-and-dropped by the
    next rewrite like any other. Requests for keys later re-inserted by
    upserts follow sequence semantics: the re-insert wins (erasure
    applies to data as of the request, not to the future)."""
    from ..sources.acid import acid_delete_mor

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        acid_delete_mor(spark, table_root, batch_df, key=tuple(key))

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(landing_dir)
    )
    writer = (
        src.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()



def streaming_curation(
    spark: SparkSession,
    landing_dir: str,
    benchmark: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string, source string",
    quality_min: float = 0.5,
    dup_frac_max: float = 0.2,
    available_now: bool = True,
):
    """Continuous corpus curation over documents landing as parquet — the
    streaming form of q_doc_curation's 4-stage gate: per micro-batch,
    quality gate → repetition gate (pipeline.text.dup_ngram_frac — the
    same rounded signal as the batch query) → exact dedup (keep-lowest-id
    within the batch AND drop any digest already ACCEPTED by an earlier
    batch — the cross-crawl semantics of incremental_neardup_flags,
    exact-hash grade) → benchmark decontamination (broadcast shingles).

    Sinks: accepted docs under ``{out}/accepted/batch_id=N``, the full
    per-doc ledger (doc_id, source, status) under ``{out}/ledger/
    batch_id=N`` with status = the first failing stage or 'kept'.

    Exactly-once under foreachBatch's at-least-once contract: each batch
    OVERWRITES its own batch_id-keyed subdirectories, and the
    prior-digest read is restricted to ``batch_id < current`` — a
    replayed batch can never see its own earlier (possibly partial)
    write, so its decisions are bit-identical on replay. State is the
    accepted sink itself (digest column) — no second bookkeeping store
    to drift; at corpus scale swap the digest read for the ACID table's
    snapshot read (sources/acid.py) or a Bloom probe (pipeline/sketch).
    """
    import os

    from pyspark.sql import Window as W

    from ..pipeline.sampling import contamination
    from ..pipeline.text import dup_ngram_frac, quality_score

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(landing_dir)
    )

    def _curate(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        flagged = contamination(batch_df, benchmark).select(
            "doc_id", F.lit(1).alias("__cont")
        )
        base = (
            quality_score(batch_df)
            .withColumn("dup_frac", dup_ngram_frac())
            .withColumn("digest", F.md5("text"))
            .join(flagged, "doc_id", "left")
        )
        acc_dir = f"{out_dir}/accepted"
        if os.path.isdir(acc_dir) and any(
            e.startswith("batch_id=") for e in os.listdir(acc_dir)
        ):
            prior = (
                spark.read.parquet(acc_dir)
                .where(F.col("batch_id") < batch_id)
                .select("digest").distinct()
                .withColumn("__seen", F.lit(1))
            )
            base = base.join(prior, "digest", "left")
        else:
            base = base.withColumn("__seen", F.lit(None).cast("int"))
        gates = (F.col("quality") >= quality_min) & (
            F.col("dup_frac") <= dup_frac_max
        )
        canon = F.min(F.when(gates, F.col("doc_id"))).over(
            W.partitionBy("digest")
        )
        status = (
            F.when(F.col("quality") < quality_min, F.lit("low_quality"))
            .when(F.col("dup_frac") > dup_frac_max, F.lit("repetitive"))
            .when(
                F.col("__seen").isNotNull() | (F.col("doc_id") != canon),
                F.lit("duplicate"),
            )
            .when(F.col("__cont").isNotNull(), F.lit("contaminated"))
            .otherwise(F.lit("kept"))
        )
        ledger = base.withColumn("status", status).localCheckpoint(
            eager=False
        )
        (
            ledger.select("doc_id", "source", "status")
            .write.mode("overwrite")
            .parquet(f"{out_dir}/ledger/batch_id={batch_id}")
        )
        (
            ledger.where(F.col("status") == "kept")
            .select("doc_id", "text", "source", "digest")
            .write.mode("overwrite")
            .parquet(f"{out_dir}/accepted/batch_id={batch_id}")
        )

    writer = (
        stream.writeStream.foreachBatch(_curate)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def _rollup_minute_partial(batch_df: DataFrame) -> DataFrame:
    """One micro-batch's minute-grain rollup, carrying the GLOBAL order keys
    (ts_ms, event_id) inside the open/close extremum structs so any later
    combine — across partials of the same minute, or up-tier — re-selects
    the true first/last by plain struct min/max (associative)."""
    ok = F.struct(
        F.unix_millis("ts").alias("k_ms"),
        F.col("event_id").alias("k_eid"),
        F.col("value").alias("v"),
    )
    return (
        batch_df.groupBy(
            "event_type",
            (F.floor(F.unix_millis("ts") / F.lit(60_000)).cast("long") * 60_000)
            .alias("bucket_ms"),
        )
        .agg(
            F.min(ok).alias("o"),
            F.max(ok).alias("c"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .alias("volume_cents"),
            F.count("*").alias("n_events"),
        )
        .select(
            "event_type", "bucket_ms",
            F.col("o.k_ms").alias("open_ms"),
            F.col("o.k_eid").alias("open_eid"),
            F.col("o.v").alias("open"),
            F.col("c.k_ms").alias("close_ms"),
            F.col("c.k_eid").alias("close_eid"),
            F.col("c.v").alias("close"),
            "high", "low", "volume_cents", "n_events",
        )
    )


def _combine_tier(df: DataFrame, factor_ms: int,
                  count_minutes: str | None) -> DataFrame:
    """Re-aggregate tier rows (or same-grain partials when
    ``factor_ms`` equals the input grain) to coarser ``factor_ms`` buckets.
    Associative at every tier because open/close carry the global
    (ts_ms, event_id) order key. ``count_minutes``: None (minute tier —
    combining partials of the SAME minute must not count), "count" (five
    tier: one input row per minute), or "sum" (hour tier re-aggregates the
    five tier's counts)."""
    o = F.struct("open_ms", "open_eid", "open")
    c = F.struct("close_ms", "close_eid", "close")
    aggs = [
        F.min(o).alias("o"), F.max(c).alias("c"),
        F.max("high").alias("high"), F.min("low").alias("low"),
        F.sum("volume_cents").alias("volume_cents"),
        F.sum("n_events").alias("n_events"),
    ]
    if count_minutes == "count":
        aggs.append(F.count("*").alias("n_minutes"))
    elif count_minutes == "sum":
        aggs.append(F.sum("n_minutes").alias("n_minutes"))
    out = (
        df.groupBy(
            "event_type",
            (F.floor(F.col("bucket_ms") / F.lit(factor_ms)).cast("long") * factor_ms)
            .alias("bucket_ms"),
        )
        .agg(*aggs)
    )
    cols = [
        "event_type", "bucket_ms",
        F.col("o.open_ms").alias("open_ms"),
        F.col("o.open_eid").alias("open_eid"),
        F.col("o.open").alias("open"),
        F.col("c.close_ms").alias("close_ms"),
        F.col("c.close_eid").alias("close_eid"),
        F.col("c.close").alias("close"),
        "high", "low", "volume_cents", "n_events",
    ]
    if count_minutes is not None:
        cols.append("n_minutes")
    return out.select(*cols)


# columns of a minute-grain partial row (what the compacted prefix stores;
# the batch_id partition column is metadata, not data)
_PARTIAL_COLS = (
    "event_type", "bucket_ms", "open_ms", "open_eid", "open",
    "close_ms", "close_eid", "close", "high", "low",
    "volume_cents", "n_events",
)


def _compact_meta_load(out_root: str) -> dict | None:
    p = os.path.join(out_root, "partials_compacted", "_latest.json")
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _read_partial_log(spark: SparkSession, out_root: str) -> DataFrame:
    """The complete minute-partial history: the compacted prefix (all
    batches with batch_id <= meta['through'], pre-combined per bucket)
    unioned with the still-live batch dirs. Correctness never depends on
    GC having run — a consumed-but-undeleted batch dir is excluded by the
    batch_id > through filter (partition-pruned, so its files are never
    read)."""
    base = f"{out_root}/partials"
    live = spark.read.option("basePath", base).parquet(base)
    meta = _compact_meta_load(out_root)
    if meta is None:
        return live.select(*_PARTIAL_COLS)
    return (
        spark.read.parquet(meta["path"])
        .unionByName(
            live.where(F.col("batch_id") > meta["through"])
            .select(*_PARTIAL_COLS)
        )
    )


def _maybe_compact_partials(spark: SparkSession, out_root: str,
                            batch_id: int, every: int = 16) -> None:
    """Periodic partial-log compaction: once ``every`` consumable batch
    dirs accumulate, fold them into ONE per-bucket pre-combined segment so
    per-batch recompute stops paying O(total batches) file listing and
    footer reads (the log would otherwise grow O(n²) over the stream's
    lifetime).

    Only batches with id STRICTLY below the in-flight ``batch_id`` are
    consumed: Structured Streaming replays at most the last uncommitted
    batch, so older batch dirs are final. Publish order makes every crash
    point consistent — the new segment is written to a fresh uuid dir,
    then ``_latest.json`` flips to it via atomic os.replace, and only then
    are consumed inputs deleted (readers filter on the published
    ``through``, so a crash between publish and GC merely leaves dead
    dirs for the next compaction's sweep)."""
    base = f"{out_root}/partials"
    meta = _compact_meta_load(out_root)
    through = meta["through"] if meta else -1
    try:
        pending = sorted(
            int(d.split("=", 1)[1]) for d in os.listdir(base)
            if d.startswith("batch_id=")
        )
    except (FileNotFoundError, ValueError):
        return
    stale = [b for b in pending if b <= through]
    consumable = [b for b in pending if through < b < batch_id]
    if len(consumable) < every:
        for b in stale:  # sweep dirs a pre-crash compaction already folded
            shutil.rmtree(os.path.join(base, f"batch_id={b}"),
                          ignore_errors=True)
        return
    new_through = max(consumable)
    live = (
        spark.read.option("basePath", base).parquet(base)
        .where((F.col("batch_id") > through)
               & (F.col("batch_id") <= new_through))
        .select(*_PARTIAL_COLS)
    )
    if meta is not None:
        live = spark.read.parquet(meta["path"]).unionByName(live)
    merged = _combine_tier(live, 60_000, None)
    cdir = os.path.join(out_root, "partials_compacted")
    os.makedirs(cdir, exist_ok=True)
    seg = os.path.join(cdir, f"seg-{uuid.uuid4().hex}")
    merged.write.mode("overwrite").parquet(seg)
    tmp = os.path.join(cdir, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        json.dump({"through": new_through, "path": seg}, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(cdir, "_latest.json"))
    for b in consumable + stale:
        shutil.rmtree(os.path.join(base, f"batch_id={b}"),
                      ignore_errors=True)
    if meta is not None:
        shutil.rmtree(meta["path"], ignore_errors=True)


def _apply_rollup_batch(spark: SparkSession, batch_df: DataFrame,
                        batch_id: int, out_root: str,
                        compact_every: int = 16) -> None:
    """One micro-batch of the continuous-aggregate cascade. Replay-safe by
    construction: step 1 is an idempotent overwrite, steps 2-4 recompute
    their touched buckets from the layer below (same inputs ⇒ same rows),
    and each tier upsert is one atomic ACID commit."""
    from ..sources.acid import acid_read, acid_upsert

    partial = _rollup_minute_partial(batch_df)
    # 1. the batch's partial IS the durable log record — batch_id-keyed
    #    overwrite makes at-least-once foreachBatch delivery idempotent
    pdir = f"{out_root}/partials/batch_id={int(batch_id)}"
    partial.write.mode("overwrite").parquet(pdir)
    # 1b. fold old batch dirs into the compacted prefix so the log read
    #     below stays O(buckets + recent batches), not O(stream lifetime)
    _maybe_compact_partials(spark, out_root, int(batch_id),
                            every=compact_every)

    # 2. recompute touched MINUTES from the full partial log (compacted
    #    prefix + live batch dirs; parquet min/max stats on bucket_ms make
    #    this a skipping scan within each segment)
    touched = (
        spark.read.parquet(pdir)
        .select("event_type", "bucket_ms").distinct().localCheckpoint()
    )
    all_partials = _read_partial_log(spark, out_root)
    minute_rows = _combine_tier(
        all_partials.join(F.broadcast(touched),
                          ["event_type", "bucket_ms"], "left_semi"),
        60_000, None,
    )
    acid_upsert(spark, minute_rows, f"{out_root}/minute",
                key=("event_type", "bucket_ms"))

    # 3./4. refresh each coarser tier from the tier BELOW, only for
    #    buckets the batch touched
    prev_touched = touched
    for src, dst, factor, cm in (
        ("minute", "five", 300_000, "count"),
        ("five", "hour", 3_600_000, "sum"),
    ):
        t = (
            prev_touched.select(
                "event_type",
                (F.floor(F.col("bucket_ms") / F.lit(factor)).cast("long") * factor)
                .alias("bucket_ms"),
            ).distinct().localCheckpoint()
        )
        below = acid_read(spark, f"{out_root}/{src}")
        rows = _combine_tier(
            below.withColumn(
                "__coarse",
                (F.floor(F.col("bucket_ms") / F.lit(factor)).cast("long") * factor),
            ).join(
                F.broadcast(t.withColumnRenamed("bucket_ms", "__coarse")),
                ["event_type", "__coarse"], "left_semi",
            ).drop("__coarse"),
            factor, cm,
        )
        acid_upsert(spark, rows, f"{out_root}/{dst}",
                    key=("event_type", "bucket_ms"))
        prev_touched = t


def streaming_rollup_cascade(
    spark: SparkSession,
    landing_dir: str,
    out_root: str,
    checkpoint_dir: str,
    schema,
    available_now: bool = True,
):
    """Continuous hypertable-style aggregate cascade (the deployment shape
    of q_evt_rollup_cascade): raw event micro-batches maintain three ACID
    rollup tiers — minute, 5-minute, hourly — where each coarser tier is
    refreshed FROM THE TIER BELOW for exactly the buckets the batch
    touched. Late/out-of-order events are handled by recomputation, not
    watermark-dropping: an event landing in an old minute re-derives that
    minute, its 5-minute bucket, and its hour from durable state.

    Exactly-once effect from at-least-once foreachBatch with no external
    coordinator: the per-batch minute partial is written to a
    batch_id-keyed dir with overwrite (replay rewrites the same bytes),
    tier refreshes are deterministic recomputations over that log and the
    tier below, and every tier update is one atomic manifest commit
    (sources/acid.py) — a reader polling any tier sees complete snapshots
    only. Tiers commit independently (minute before hour), which is the
    standard eventual-consistency contract of continuous aggregates.

    Scale: the partial log is bucket_ms-ordered parquet (stats-skipped on
    recompute) and FOLDS into a per-bucket compacted prefix every 16
    batches (_maybe_compact_partials — without it, listing + footer reads
    grow O(n²) over the stream's lifetime); per-batch work is O(touched
    buckets + recent batches), not O(history); the cascade invariant
    (hourly == direct-from-raw) is value-gated by the batch twin
    q_evt_rollup_cascade's oracle.

    Returns the StreamingQuery handle."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(landing_dir)
    )

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _apply_rollup_batch(spark, batch_df, batch_id, out_root)

    writer = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def streaming_windowed_counts(
    spark: SparkSession,
    landing_dir: str,
    table_root: str,
    checkpoint_dir: str,
    schema: str,
    ts_col: str = "ts",
    group_col: str = "event_type",
    window: str = "1 day",
    delay: str = "2 days",
) -> None:
    """Watermarked tumbling windowed aggregation maintained as an ACID
    table — the canonical Structured Streaming late-data pipeline, with
    Spark's OWN watermark machinery doing the dropping (not a batch
    re-derivation): ``withWatermark(ts, delay)`` + per-(window, group)
    count/sum in UPDATE mode, each micro-batch's changed windows keyed-
    upserted into ``table_root``.

    Late-data semantics under test (pinned by q_stream_watermark_state's
    oracle replay): the watermark is GLOBAL and advances at batch END to
    max(event time seen) − delay (persisted in the checkpoint across
    runs); a row arriving in a later batch is DROPPED iff its window's
    END ≤ the watermark in force when its batch starts — the window's
    state was evicted and cannot be revived. A late row whose window is
    still within the horizon UPDATES the window (the upsert re-emits it).
    State is bounded by the horizon: windows older than the watermark are
    evicted every batch, so arbitrarily long streams hold
    O(windows-in-horizon × |groups|) state, never the history.

    One call = one availableNow run = ONE micro-batch when the caller
    lands one file per call (the maintainers' deterministic-batch
    contract).
    """
    from ..sources.acid import acid_upsert

    stream = spark.readStream.schema(schema).parquet(landing_dir)
    agg = (
        stream.withWatermark(ts_col, delay)
        # group by the window struct itself (severing it pre-agg breaks
        # event-time tracking — the streaming_resample lesson)
        .groupBy(F.window(ts_col, window), F.col(group_col))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .alias("sum_cents"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col(group_col),
            "n_rows", "sum_cents",
        )
    )

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        acid_upsert(spark, batch_df, table_root,
                    key=("win_start", group_col))

    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
