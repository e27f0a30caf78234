"""Streaming END STATES under the driver's oracle gate (r9 verdict #4).

The streaming layer (streaming/ingest.py: exactly-once ingest, SCD2
maintainer, CDF-driven MV maintenance with multi-table catalog commits,
right-to-be-forgotten erasure feed) was pytest-only evidence; these queries
run each maintainer over N deterministic micro-batches of the `events`
table and hand its FINAL state to the same DuckDB value-hash gate every
batch operator faces — the oracle recomputes the end state relationally
from the raw parquet, so per-batch incrementality (CDF folds, open-version
rebuilds, MoR delete files, purge compaction) must land on exactly the
rows a whole-input computation produces.

Batches split on fixed `ts` cuts (in-order delivery — the maintainers'
documented contract; out-of-order policy is pinned by
tests/test_streaming.py). Each query memoizes its built tables per
(application, sf_dir), same shape as queries/acid.py.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from . import load, register

_CUT1 = "2024-01-11 00:00:00"
_CUT2 = "2024-01-21 00:00:00"

_MEMO: dict[tuple[str, str, str], str] = {}


def _once(spark, sf_dir: str, what: str, build) -> str:
    key = (spark.sparkContext.applicationId, sf_dir, what)
    root = _MEMO.get(key)
    if root is None:
        root = build(tempfile.mkdtemp(prefix=f"stream_{what}_"))
        _MEMO[key] = root
    return root


def _ts_batches(df, n3: bool = True):
    c1 = F.lit(_CUT1).cast("timestamp")
    c2 = F.lit(_CUT2).cast("timestamp")
    if n3:
        return [
            df.where(F.col("ts") < c1),
            df.where((F.col("ts") >= c1) & (F.col("ts") < c2)),
            df.where(F.col("ts") >= c2),
        ]
    return [df.where(F.col("ts") < c1), df.where(F.col("ts") >= c1)]


@register(
    "q_stream_scd2_state",
    oracle="""
    WITH p AS (
        SELECT user_id, ts, event_id,
               CASE WHEN value < 50.0 THEN 'low'
                    WHEN value < 200.0 THEN 'mid'
                    ELSE 'high' END AS tier
        FROM events WHERE event_type = 'purchase'
    ),
    latest AS (
        SELECT user_id, ts, tier FROM (
            SELECT p.*, ROW_NUMBER() OVER (
                PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
            FROM p
        ) WHERE rn = 1
    ),
    ver AS (
        SELECT user_id, ts AS eff_from, tier FROM (
            SELECT latest.*, LAG(tier) OVER (
                PARTITION BY user_id ORDER BY ts) AS prev_tier
            FROM latest
        ) WHERE prev_tier IS NULL OR prev_tier <> tier
    )
    SELECT user_id, tier,
           epoch_ms(eff_from) AS eff_from_ms,
           epoch_ms(LEAD(eff_from) OVER (
               PARTITION BY user_id ORDER BY eff_from)) AS eff_to_ms,
           LEAD(eff_from) OVER (
               PARTITION BY user_id ORDER BY eff_from) IS NULL AS is_current
    FROM ver
    """,
)
def q_stream_scd2_state(spark, sf_dir):
    """streaming_scd2 end state == a whole-input SCD2 build: each user's
    purchase 'spend tier' updates stream in as THREE ts-ordered
    micro-batches; per batch the maintainer re-seeds only the touched
    keys' open versions (manifest-pruned to the batch's hash buckets) and
    keyed-upserts the rebuilt open region. The oracle builds the same
    versioned history with window CTEs over the whole input — so
    cross-batch version chaining (a tier that changes in batch 3 must
    close the batch-1 version at exactly the right eff_from) is
    value-checked, not just row-counted. Output: one row per dimension
    version. Citations: streaming/ingest.py:streaming_scd2,
    operators/scd.py:scd2_build."""
    from ..sources.acid import acid_read
    from ..streaming.ingest import streaming_scd2

    tier = (
        F.when(F.col("value") < 50.0, "low")
        .when(F.col("value") < 200.0, "mid")
        .otherwise("high")
    )

    def build(base: str) -> str:
        land = f"{base}/land"
        table = f"{base}/dim"
        updates = (
            load(spark, sf_dir, "events")
            .where(F.col("event_type") == "purchase")
            .select("user_id", "ts", F.col("event_id").alias("seq"),
                    tier.alias("tier"))
        )
        schema = "user_id bigint, ts timestamp, seq bigint, tier string"
        for b in _ts_batches(updates):
            b.coalesce(1).write.mode("append").parquet(land)
            streaming_scd2(
                spark, land, table, f"{base}/ck", schema,
                key=("user_id",), attrs=("tier",),
            )
        return table

    table = _once(spark, sf_dir, "scd2", build)
    dim = acid_read(spark, table)
    return dim.select(
        "user_id", "tier",
        F.unix_millis("eff_from").alias("eff_from_ms"),
        F.unix_millis("eff_to").alias("eff_to_ms"),
        "is_current",
    )


@register(
    "q_stream_erasure_state",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events WHERE user_id % 7 <> 0
    GROUP BY 1
    """,
)
def q_stream_erasure_state(spark, sf_dir):
    """Right-to-be-forgotten END TO END: the raw events land in an ACID
    table (partitioned by event_type); erasure requests for every
    user_id % 7 == 0 stream in as TWO micro-batches through
    streaming_delete_feed (each batch = ONE merge-on-read equality-delete
    commit, no data rewrite); then the maintenance pass the feed's
    docstring mandates — acid_compact(purge_deletes=True) — physically
    rewrites every partition the delete files still reach and drops the
    spent entries. The emitted stats aggregate the POST-PURGE snapshot;
    the oracle computes the survivors' stats straight off the raw
    parquet, so both the suppression (no erased user's row survives) and
    the non-suppression (nobody else's row went missing in the rewrite)
    are value-checked. Citations: streaming/ingest.py:
    streaming_delete_feed, sources/acid.py:acid_delete_mor/acid_compact.
    """
    from ..sources.acid import acid_compact, acid_read, acid_write
    from ..streaming.ingest import streaming_delete_feed

    def build(base: str) -> str:
        land = f"{base}/land"
        table = f"{base}/t"
        evt = load(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "value"
        )
        acid_write(spark, evt, table, partition_by=("event_type",))
        gone = evt.where(F.col("user_id") % 7 == 0) \
                  .select("user_id").distinct()
        batches = [
            gone.where(F.col("user_id") % 14 == 0),
            gone.where(F.col("user_id") % 14 != 0),
        ]
        for b in batches:
            b.coalesce(1).write.mode("append").parquet(land)
            streaming_delete_feed(
                spark, land, table, f"{base}/ck", "user_id bigint",
                key=("user_id",),
            )
        acid_compact(spark, table, purge_deletes=True)
        return table

    table = _once(spark, sf_dir, "erasure", build)
    return acid_read(spark, table).groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint").alias("sum_cents"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


@register(
    "q_stream_txn_state",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT)
               AS a6
    FROM events
    GROUP BY 1
    """,
)
def q_stream_txn_state(spark, sf_dir):
    """streaming_txn end state: events stream in as TWO micro-batches;
    per batch the fact table takes a keyed upsert, the per-event_type
    rollup MV advances by folding the CHANGE DATA FEED of that very
    commit (never re-aggregating the fact), and both publish as one
    consistent catalog version. The emitted MV is read THROUGH the
    catalog snapshot; the oracle aggregates the raw parquet directly —
    so two rounds of incremental CDF arithmetic (1e6-scaled BIGINT sums)
    must land bit-equal on the full-recompute answer, and the
    catalog-pinned (fact, mv) pair is what's graded, not loose latest
    versions. Citations: streaming/ingest.py:streaming_txn,
    sources/catalog.py:catalog_commit/catalog_read."""
    from ..sources.catalog import catalog_read
    from ..streaming.ingest import streaming_txn

    def build(base: str) -> str:
        land = f"{base}/land"
        evt = load(spark, sf_dir, "events").select(
            "event_id", "ts", "event_type", "value"
        )
        schema = ("event_id bigint, ts timestamp, event_type string, "
                  "value double")
        for b in _ts_batches(evt, n3=False):
            b.coalesce(1).write.mode("append").parquet(land)
            streaming_txn(
                spark, land, f"{base}/fact", f"{base}/mv", f"{base}/cat",
                f"{base}/ck", schema,
                key=("event_id",), mv_key="event_type", agg_col="value",
            )
        return base

    base = _once(spark, sf_dir, "txn", build)
    return catalog_read(spark, base + "/cat", "mv").select(
        F.col("event_type"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("a6").cast("bigint").alias("a6"),
    )


@register(
    "q_stream_dedup_state",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_ids,
           CAST(SUM(CAST(ROUND(COALESCE(value, 0) * 100) AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST(MIN(epoch_ms(ts)) AS BIGINT) AS min_ms,
           CAST(MAX(epoch_ms(ts)) AS BIGINT) AS max_ms
    FROM events
    GROUP BY 1
    """,
)
def q_stream_dedup_state(spark, sf_dir):
    """streaming_dedup END STATE under the oracle gate: an at-least-once
    source is SIMULATED by landing three ts-ordered micro-batches where
    every batch k >= 2 re-delivers a deterministic slice of batch k-1
    (event_id % 10 == 0 — the crash-replay overlap every file-based
    source produces) and batch 1 carries in-batch duplicates
    (event_id % 17 == 0 landed twice); the stream runs
    dropDuplicatesWithinWatermark on event_id into an exactly-once
    parquet sink, one availableNow run per landing append against ONE
    checkpoint. The watermark horizon is sized ABOVE the corpus span, so
    no dedup state is ever evicted and the contractual end state is
    exactly one sink row per event_id — which IS SQL-expressible: the
    oracle aggregates the raw events directly, so n_rows == n_ids per
    type, exact-cents sums, and the ts range all hash-match only if
    every planted duplicate (cross-batch AND in-batch) was dropped and
    no original row was lost. Bounded-horizon eviction behavior is
    engine-internal and stays pytest territory
    (test_streaming_dedup_within_watermark); at 100 TB the horizon is
    sized to the source's real re-delivery window so state stays
    bounded — here it is sized to the corpus to make the end state a
    pure relational fact. Citations: streaming/ingest.py:streaming_dedup,
    SURVEY §2.11."""
    from ..streaming.ingest import streaming_dedup

    def build(base: str) -> str:
        land = f"{base}/land"
        out = f"{base}/out"
        ck = f"{base}/ck"
        evt = load(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        batches = _ts_batches(evt)
        landed = [
            batches[0].unionByName(
                batches[0].where(F.col("event_id") % 17 == 0)
            ),
            batches[1].unionByName(
                batches[0].where(F.col("event_id") % 10 == 0)
            ),
            batches[2].unionByName(
                batches[1].where(F.col("event_id") % 10 == 0)
            ),
        ]
        schema = ("event_id bigint, ts timestamp, user_id bigint, "
                  "event_type string, value double")
        for b in landed:
            b.coalesce(1).write.mode("append").parquet(land)
            src = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1024)
                .parquet(land)
            )
            q = (
                streaming_dedup(src, key=["event_id"],
                                watermark="8760 hours")
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return out

    out = _once(spark, sf_dir, "dedup", build)
    return spark.read.parquet(out).groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("event_id").cast("bigint").alias("n_ids"),
        F.sum(F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100, 0)
              .cast("bigint")).cast("bigint").alias("sum_cents"),
        F.min(F.unix_millis("ts")).cast("bigint").alias("min_ms"),
        F.max(F.unix_millis("ts")).cast("bigint").alias("max_ms"),
    )


@register(
    "q_stream_resample_state",
    oracle="""
    WITH sec AS (
        SELECT event_type, date_trunc('second', ts) AS s,
               CAST(SUM(CAST(ROUND(COALESCE(value, 0) * 100) AS BIGINT))
                    AS BIGINT) AS c,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    h AS (
        SELECT event_type, date_trunc('hour', s) AS bucket,
               arg_min(c, s) AS open, MAX(c) AS high, MIN(c) AS low,
               arg_max(c, s) AS close, SUM(n) AS volume
        FROM sec GROUP BY 1, 2
    )
    SELECT event_type, CAST(epoch_ms(bucket) AS BIGINT) AS bucket_ms,
           CAST(open AS BIGINT) AS open, CAST(high AS BIGINT) AS high,
           CAST(low AS BIGINT) AS low, CAST(close AS BIGINT) AS close,
           CAST(volume AS BIGINT) AS volume
    FROM h
    """,
)
def q_stream_resample_state(spark, sf_dir):
    """streaming_resample END STATE (A1's streaming face under the oracle
    gate): per-second exact-cents bars derived from events (one row per
    (type, second) — unique event times per group, so OHLC first/last
    picks are fully deterministic) stream in as three ts-ordered
    micro-batches through the watermarked tumbling H1 rollup into an
    append-mode parquet sink — each bucket is emitted EXACTLY ONCE, when
    the watermark passes its end. A '__wm' sentinel row far past the
    corpus (excluded from the output, its own bucket legitimately never
    emits) rides in the last batch so every real bucket closes — the
    same sentinel discipline test_streaming_session_window pins. The
    oracle recomputes the full OHLCV rollup relationally (arg_min /
    arg_max over the unique per-second grid), so cross-batch bucket
    assembly, the open/close pick, and append-mode exactly-once emission
    all hash-gate. Citations: streaming/ingest.py:streaming_resample,
    operators/resample.py:resample_ohlcv (the batch twin),
    SURVEY §2.11."""
    from ..streaming.ingest import streaming_resample

    def build(base: str) -> str:
        land = f"{base}/land"
        out = f"{base}/out"
        ck = f"{base}/ck"
        evt = load(spark, sf_dir, "events")
        cents = F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100, 0) \
            .cast("long")
        sec = (
            evt.groupBy(
                "event_type", F.date_trunc("second", "ts").alias("ts")
            )
            .agg(F.sum(cents).cast("bigint").alias("c"),
                 F.count("*").cast("bigint").alias("n"))
        )
        bars = sec.select(
            "event_type", "ts",
            F.col("c").alias("open"), F.col("c").alias("high"),
            F.col("c").alias("low"), F.col("c").alias("close"),
            F.col("n").alias("volume"),
        )
        mx = evt.agg(F.max("ts").alias("m")).first()["m"]
        sentinel = spark.createDataFrame(
            [("__wm", mx, 0, 0, 0, 0, 0)],
            "event_type string, ts timestamp, open bigint, high bigint,"
            " low bigint, close bigint, volume bigint",
        ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 2 DAYS"))
        batches = _ts_batches(bars)
        batches[-1] = batches[-1].unionByName(sentinel)
        schema = ("event_type string, ts timestamp, open bigint,"
                  " high bigint, low bigint, close bigint, volume bigint")
        for b in batches:
            b.coalesce(1).write.mode("append").parquet(land)
            src = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1024)
                .parquet(land)
            )
            q = (
                streaming_resample(src, tf="H1", watermark="10 minutes",
                                   by=("event_type",))
                .writeStream.outputMode("append")
                .format("parquet").option("path", out)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return out

    out = _once(spark, sf_dir, "resample", build)
    return (
        spark.read.parquet(out)
        .where(F.col("event_type") != "__wm")
        .select(
            "event_type",
            F.unix_millis("bucket").cast("bigint").alias("bucket_ms"),
            F.col("open").cast("bigint").alias("open"),
            F.col("high").cast("bigint").alias("high"),
            F.col("low").cast("bigint").alias("low"),
            F.col("close").cast("bigint").alias("close"),
            F.col("volume").cast("bigint").alias("volume"),
        )
    )


@register(
    "q_stream_sessionize_state",
    oracle="""
    WITH flagged AS (
        -- microsecond precision: session_window merges on the FULL
        -- timestamp (a 1799.9995 s gap merges), unlike the whole-second
        -- gaps-and-islands of q_evt_sessionize
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                            >= 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    numbered AS (
        SELECT user_id, ts,
               CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id,
           epoch_ms(MIN(ts)) AS session_start_ms,
           epoch_ms(MAX(ts)) + 1800000 AS session_end_ms,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_id
    """,
)
def q_stream_sessionize_state(spark, sf_dir):
    """streaming_sessions END STATE under the oracle gate (r10 verdict
    #3 — the last pytest-only streaming maintainer joins the hash gate):
    the events table streams in as three ts-ordered micro-batches
    through the native `session_window` (30-min gap, watermarked,
    append mode) into a parquet sink — one row per CLOSED session. A
    '__wm' sentinel user far past the corpus rides in the last batch so
    the watermark passes every real session's end and append mode emits
    them all (the q_stream_resample_state sentinel discipline). The
    oracle recomputes sessionization relationally as gaps-and-islands
    over the whole input (the q_evt_sessionize CTE, with session_end =
    last event + gap, Spark's session_window end semantics) — so
    cross-batch session continuation (a session spanning a micro-batch
    cut must merge, not split), gap-boundary semantics (diff == gap
    starts a NEW session on both engines), and exactly-once append
    emission all hash-gate at 3 SFs. Citations:
    streaming/ingest.py:streaming_sessions, SURVEY §2.11 / §7.1."""
    from ..streaming.ingest import streaming_sessions

    def build(base: str) -> str:
        land = f"{base}/land"
        out = f"{base}/out"
        ck = f"{base}/ck"
        evt = load(spark, sf_dir, "events").select("user_id", "ts")
        mx = evt.agg(F.max("ts").alias("m")).first()["m"]
        sentinel = spark.createDataFrame(
            [(-1, mx)], "user_id bigint, ts timestamp"
        ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 2 DAYS"))
        batches = _ts_batches(evt)
        batches[-1] = batches[-1].unionByName(sentinel)
        schema = "user_id bigint, ts timestamp"
        for b in batches:
            b.coalesce(1).write.mode("append").parquet(land)
            src = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1024)
                .parquet(land)
            )
            q = (
                streaming_sessions(src, gap="30 minutes",
                                   watermark="10 minutes")
                .writeStream.outputMode("append")
                .format("parquet").option("path", out)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return out

    out = _once(spark, sf_dir, "sessionize", build)
    return (
        spark.read.parquet(out)
        .where(F.col("user_id") >= 0)
        .select(
            "user_id",
            F.unix_millis("session_start").cast("bigint")
            .alias("session_start_ms"),
            F.unix_millis("session_end").cast("bigint")
            .alias("session_end_ms"),
            F.col("n_events").cast("bigint").alias("n_events"),
        )
    )


@register(
    "q_stream_join_state",
    oracle="""
    SELECT l.user_id,
           epoch_ms(l.ts) AS l_ts_ms,
           CAST(ROUND(COALESCE(l.value, 0) * 100) AS BIGINT) AS l_cents,
           epoch_ms(r.ts) AS r_ts_ms,
           CAST(ROUND(COALESCE(r.value, 0) * 100) AS BIGINT) AS r_cents
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND r.ts <= l.ts
     AND r.ts >= l.ts - INTERVAL 30 MINUTE
    WHERE l.event_type = 'purchase' AND r.event_type = 'click'
    """,
)
def q_stream_join_state(spark, sf_dir):
    """STREAM-STREAM interval join END STATE under the oracle gate (the
    §2.11 surface the r10 window didn't cover): purchases and clicks
    stream in as two SEPARATE file sources, three ts-ordered
    micro-batches each, through streaming_interval_join (each purchase
    pairs with the same user's clicks in the trailing 30 minutes; both
    sides watermarked so the join STATE is bounded — right rows evict
    once the watermark passes their ts + lookback) into an append
    parquet sink. Inner stream-stream joins emit matches as both sides
    arrive, so cross-batch pairing (a click landing one batch before its
    purchase must still pair from state) is exactly what the gate
    exercises. The oracle recomputes the interval join relationally over
    the whole input at microsecond precision. Citations:
    streaming/ingest.py:streaming_interval_join,
    operators/rangejoin.py (the batch twin), SURVEY §2.11."""
    from ..streaming.ingest import streaming_interval_join

    def build(base: str) -> str:
        land_l = f"{base}/land_l"
        land_r = f"{base}/land_r"
        out = f"{base}/out"
        ck = f"{base}/ck"
        evt = load(spark, sf_dir, "events").select(
            "user_id", "ts", "event_type", "value")
        pur = _ts_batches(evt.where(F.col("event_type") == "purchase"))
        clk = _ts_batches(evt.where(F.col("event_type") == "click"))
        schema = "user_id bigint, ts timestamp, value double"
        for lb, rb in zip(pur, clk):
            lb.select("user_id", "ts", "value").coalesce(1) \
                .write.mode("append").parquet(land_l)
            rb.select("user_id", "ts", "value").coalesce(1) \
                .write.mode("append").parquet(land_r)
            left = (spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 1024).parquet(land_l))
            right = (spark.readStream.schema(schema)
                     .option("maxFilesPerTrigger", 1024).parquet(land_r))
            q = (
                streaming_interval_join(left, right,
                                        lookback="30 minutes",
                                        watermark="1 hour")
                .writeStream.outputMode("append")
                .format("parquet").option("path", out)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return out

    out = _once(spark, sf_dir, "ssjoin", build)
    return spark.read.parquet(out).select(
        "user_id",
        F.unix_millis("l_ts").cast("bigint").alias("l_ts_ms"),
        F.round(F.coalesce(F.col("l_value"), F.lit(0.0)) * 100, 0)
        .cast("bigint").alias("l_cents"),
        F.unix_millis("r_ts").cast("bigint").alias("r_ts_ms"),
        F.round(F.coalesce(F.col("r_value"), F.lit(0.0)) * 100, 0)
        .cast("bigint").alias("r_cents"),
    )


_W_CUT1 = "2024-01-11 00:00:00"
_W_CUT2 = "2024-01-26 00:00:00"
_W_DELAY_DAYS = 8


@register(
    "q_stream_watermark_state",
    oracle=f"""
    WITH b1 AS (
        SELECT ts, event_type, value FROM events
        WHERE ts < TIMESTAMP '{_W_CUT1}' OR ts >= TIMESTAMP '{_W_CUT2}'
    ),
    wm AS (
        SELECT epoch_ms(MAX(ts)) - {_W_DELAY_DAYS} * 86400000 AS wm_ms
        FROM b1
    ),
    b2 AS (
        SELECT ts, event_type, value FROM events
        WHERE ts >= TIMESTAMP '{_W_CUT1}' AND ts < TIMESTAMP '{_W_CUT2}'
    ),
    surv2 AS (
        SELECT b2.* FROM b2, wm
        WHERE epoch_ms(date_trunc('day', ts) + INTERVAL 1 DAY) > wm.wm_ms
    ),
    survivors AS (
        SELECT * FROM b1 UNION ALL SELECT * FROM surv2
    )
    SELECT epoch_ms(date_trunc('day', ts)) AS win_start_ms,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM survivors
    GROUP BY 1, 2
    """,
)
def q_stream_watermark_state(spark, sf_dir):
    """WATERMARK LATE-DATA SEMANTICS under the oracle gate — Spark's OWN
    watermark machinery (withWatermark + tumbling window agg in update
    mode, checkpointed across runs), not a batch re-derivation: batch 1
    lands the days outside [Jan-11, Jan-26) (so the stream's max event
    time races ahead), batch 2 delivers that middle slice LATE. At batch
    2's start the persisted watermark is max(batch-1 event-time-ms) minus
    8 days, so roughly days 11-22 of the late slice arrive with their
    window END at-or-below the watermark — state evicted, rows DROPPED —
    while days ~23-25 are still inside the horizon and UPDATE their
    windows. The oracle replays the exact rule (drop iff
    epoch_ms(window_end) <= max_event_ms - delay_ms, ms-floored the way
    EventTimeStats tracks it — both pinned by the inequality experiment
    in tests/test_streaming.py): the per-(day, type) count/cents table
    the maintainer leaves behind must match bit-for-bit at 3 SFs.

    Scale shape: streaming state is O(windows-in-horizon x |types|) —
    eviction every batch is exactly what makes an unbounded stream hold
    bounded state; the end table upserts at metadata scale. Citations:
    streaming/ingest.py:streaming_windowed_counts."""
    from ..sources.acid import acid_read
    from ..streaming.ingest import streaming_windowed_counts

    schema = "ts timestamp, event_type string, value double"

    def build(base: str) -> str:
        land = f"{base}/land"
        table = f"{base}/t"
        evt = load(spark, sf_dir, "events").select(
            "ts", "event_type", "value")
        c1 = F.lit(_W_CUT1).cast("timestamp")
        c2 = F.lit(_W_CUT2).cast("timestamp")
        batches = [
            evt.where((F.col("ts") < c1) | (F.col("ts") >= c2)),
            evt.where((F.col("ts") >= c1) & (F.col("ts") < c2)),
        ]
        for b in batches:
            b.coalesce(1).write.mode("append").parquet(land)
            streaming_windowed_counts(
                spark, land, table, f"{base}/ck", schema,
                delay=f"{_W_DELAY_DAYS} days",
            )
        return table

    table = _once(spark, sf_dir, "watermark", build)
    return acid_read(spark, table).select(
        F.unix_millis("win_start").alias("win_start_ms"),
        "event_type",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("sum_cents").cast("bigint").alias("sum_cents"),
    )


@register(
    "q_stream_topk_state",
    oracle="""
    WITH c AS (
        SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(ROUND(COALESCE(value, 0) * 100) AS BIGINT))
                    AS BIGINT) AS sum_cents
        FROM events GROUP BY 1, 2
    ),
    r AS (
        SELECT c.*, ROW_NUMBER() OVER (
            PARTITION BY event_type
            ORDER BY n_events DESC, user_id) AS rk
        FROM c
    )
    SELECT event_type, CAST(rk AS BIGINT) AS rk, user_id, n_events,
           sum_cents
    FROM r WHERE rk <= 5
    """,
)
def q_stream_topk_state(spark, sf_dir):
    """STREAMING TOP-K END STATE under the oracle gate: a complete-mode
    stateful streaming aggregation (per-(event_type, user) counts +
    exact cents) runs over three ts-ordered micro-batch landings against
    ONE checkpoint — each availableNow run RESUMES the aggregation state
    from the previous run's checkpoint, so the final leaderboard is only
    correct if cross-run state recovery accumulates rather than restarts
    (the property a dashboard's 'top users' tile depends on after every
    deploy). The sink is the canonical complete-mode-to-files shape:
    foreachBatch overwriting the output dir with the full updated state
    each trigger. The oracle recomputes the leaderboard relationally
    from the raw parquet — counts, cents, and the (n desc, user asc)
    tie-break all hash-gate. Top-5 per type selection runs over the
    AGGREGATED (type, user) state with a per-type rank window — the
    partitioned-window-over-aggregate-state shape scale.md rule 4
    permits (state is |users|x|types|, not the corpus; the window is
    keyed by type, never global). Citations: streaming/ingest.py,
    SURVEY §2.11."""
    from pyspark.sql import Window

    def build(base: str) -> str:
        land = f"{base}/land"
        out = f"{base}/out"
        ck = f"{base}/ck"
        evt = load(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        schema = ("event_id bigint, ts timestamp, user_id bigint, "
                  "event_type string, value double")

        def sink(df, _epoch):
            df.write.mode("overwrite").parquet(out)

        for b in _ts_batches(evt):
            b.coalesce(1).write.mode("append").parquet(land)
            src = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1024)
                .parquet(land)
            )
            agg = src.groupBy("event_type", "user_id").agg(
                F.count("*").cast("bigint").alias("n_events"),
                F.sum(
                    F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100,
                            0).cast("bigint")
                ).cast("bigint").alias("sum_cents"),
            )
            q = (
                agg.writeStream.outputMode("complete")
                .foreachBatch(sink)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return out

    out = _once(spark, sf_dir, "topk", build)
    state = spark.read.parquet(out)
    w = Window.partitionBy("event_type").orderBy(
        F.col("n_events").desc(), "user_id")
    return (
        state.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= 5)
        .select("event_type", "rk", "user_id", "n_events", "sum_cents")
    )
