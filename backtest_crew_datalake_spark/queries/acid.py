"""ACID table layer under the driver's oracle gate.

sources/acid.py's manifest-snapshot semantics (atomic multi-partition MERGE,
snapshot-isolated time travel, change data feed) proven against DuckDB
oracles that recompute the SAME end states relationally — the merge rule is
the reference's dedupe-keep-last contract (ref src/datalake/ingestors/ibkr/
writer.py:193-199), lifted to snapshot isolation.

Shape: each query acid-writes a DETERMINISTIC slice of `events` into a
process-local temp table (two overlapping keyed upserts, partitioned by
event_type so the second touches 3 of 5 partitions — untouched partitions
carry their files), then reads a snapshot back. The oracle reproduces the
expected snapshot from the raw parquet: batch2 wins on overlapping keys
(keep-last), batch1 survives elsewhere. The table build is memoized per
(application, sf_dir): the three queries share one physical table, and each
call costs two metadata-scale commits over aggregated (≤ |users|×|types|)
rows, not a raw-events rewrite.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from . import load, register

_B1_CUT = "2024-01-16 00:00:00"
_B2_FROM = "2024-01-10 00:00:00"
_B2_TYPES = ("click", "purchase", "view")
_KEY = ("user_id", "event_type")

# oracle CTEs shared by all three queries: batch1 = everything before the
# cut, batch2 = the overlapping window restricted to 3 event types. COUNT
# is cast BIGINT (DuckDB HUGEINT widening breaks the driver hash); the
# double sum is rounded AT BATCH BUILD on both sides, so merged values are
# compared as stored, not re-derived.
_BATCHES_SQL = f"""
    b1 AS (
        SELECT user_id, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 6) AS sum_value
        FROM events
        WHERE ts < TIMESTAMP '{_B1_CUT}'
        GROUP BY 1, 2
    ),
    b2 AS (
        SELECT user_id, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 6) AS sum_value
        FROM events
        WHERE ts >= TIMESTAMP '{_B2_FROM}'
          AND event_type IN {_B2_TYPES!r}
        GROUP BY 1, 2
    )
"""

# one physical table per (application, sf_dir) — same bounded-memo shape as
# queries.load()'s _LOAD_MEMO
_TABLE_MEMO: dict[tuple[str, str], str] = {}


def _agg(df):
    return df.groupBy("user_id", "event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def _acid_table(spark, sf_dir) -> str:
    """Build (once) the shared ACID table: upsert batch1 then batch2."""
    from ..sources.acid import acid_upsert

    memo_key = (spark.sparkContext.applicationId, sf_dir)
    root = _TABLE_MEMO.get(memo_key)
    if root is not None:
        return root
    e = load(spark, sf_dir, "events")
    b1 = _agg(e.where(F.col("ts") < F.lit(_B1_CUT).cast("timestamp")))
    b2 = _agg(
        e.where(
            (F.col("ts") >= F.lit(_B2_FROM).cast("timestamp"))
            & F.col("event_type").isin(*_B2_TYPES)
        )
    )
    root = tempfile.mkdtemp(prefix="acid_q_")
    acid_upsert(spark, b1, root, key=_KEY, partition_by=("event_type",),
                stats_cols=("n_events",))
    acid_upsert(spark, b2, root, key=_KEY, partition_by=("event_type",),
                stats_cols=("n_events",))
    _TABLE_MEMO[memo_key] = root
    return root


@register(
    "q_acid_upsert_read",
    oracle=f"""
    WITH {_BATCHES_SQL}
    SELECT COALESCE(b2.user_id, b1.user_id) AS user_id,
           COALESCE(b2.event_type, b1.event_type) AS event_type,
           COALESCE(b2.n_events, b1.n_events) AS n_events,
           COALESCE(b2.sum_value, b1.sum_value) AS sum_value
    FROM b1 FULL OUTER JOIN b2
      ON b1.user_id = b2.user_id AND b1.event_type = b2.event_type
    """,
)
def q_acid_upsert_read(spark, sf_dir):
    """S4/J4 under the value gate: two overlapping multi-partition keyed
    upserts (sources/acid.acid_upsert — ref writer.py:193-199 keep-last
    MERGE, made atomic across partitions), read back at latest snapshot.
    The oracle recomputes the merged end state relationally: batch2 wins
    on its keys, batch1 survives everywhere else."""
    from ..sources.acid import acid_read

    return acid_read(spark, _acid_table(spark, sf_dir)).select(
        "user_id", "event_type", "n_events", "sum_value"
    )


@register(
    "q_acid_time_travel",
    oracle=f"""
    WITH {_BATCHES_SQL}
    SELECT user_id, event_type, n_events, sum_value FROM b1
    """,
)
def q_acid_time_travel(spark, sf_dir):
    """Snapshot isolation / time travel: version 1 read after the second
    upsert committed must be EXACTLY the pre-merge state (batch1) — the
    later commit is invisible to the pinned version."""
    from ..sources.acid import acid_read

    return acid_read(spark, _acid_table(spark, sf_dir), version=1).select(
        "user_id", "event_type", "n_events", "sum_value"
    )


@register(
    "q_acid_changes_feed",
    oracle=f"""
    WITH {_BATCHES_SQL}
    SELECT b2.user_id, b2.event_type, b2.n_events, b2.sum_value,
           'insert' AS _change_type
    FROM b2 LEFT JOIN b1
      ON b1.user_id = b2.user_id AND b1.event_type = b2.event_type
    WHERE b1.user_id IS NULL
    UNION ALL
    SELECT b1.user_id, b1.event_type, b1.n_events, b1.sum_value,
           'update_preimage' AS _change_type
    FROM b1 JOIN b2
      ON b1.user_id = b2.user_id AND b1.event_type = b2.event_type
    WHERE b1.n_events <> b2.n_events OR b1.sum_value <> b2.sum_value
    UNION ALL
    SELECT b2.user_id, b2.event_type, b2.n_events, b2.sum_value,
           'update_postimage' AS _change_type
    FROM b1 JOIN b2
      ON b1.user_id = b2.user_id AND b1.event_type = b2.event_type
    WHERE b1.n_events <> b2.n_events OR b1.sum_value <> b2.sum_value
    """,
)
def q_acid_changes_feed(spark, sf_dir):
    """Change data feed v1→v2 (sources/acid.acid_changes, the Delta CDF
    vocabulary): batch2-only keys emit 'insert', keys whose aggregates
    changed emit BOTH update images, carried rows (same key, identical
    values — including every key in the partitions batch2 never touched,
    which cancel at FILE level before Spark reads anything) emit nothing.
    An upsert never deletes, so no 'delete' rows — the oracle's absence of
    them is itself checked by the value hash."""
    from ..sources.acid import acid_changes

    return acid_changes(
        spark, _acid_table(spark, sf_dir), from_version=1, to_version=2,
        key=_KEY,
    ).select("user_id", "event_type", "n_events", "sum_value", "_change_type")


_SLICE_SQL = """
    SELECT user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 6) AS sum_value
    FROM events WHERE user_id % 3 = {k}
    GROUP BY 1, 2
"""

# separate memo: the compaction query owns a fragmented table built by
# APPENDS (the shared upsert table may legitimately end up one-file-per-
# partition, which OPTIMIZE would rightly skip)
_COMPACT_MEMO: dict[tuple[str, str], str] = {}


def _compacted_table(spark, sf_dir) -> str:
    from ..sources.acid import acid_compact, acid_write

    memo_key = (spark.sparkContext.applicationId, sf_dir)
    root = _COMPACT_MEMO.get(memo_key)
    if root is not None:
        return root
    e = load(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="acid_qc_")
    for k in range(3):
        acid_write(
            spark, _agg(e.where(F.col("user_id") % 3 == k)), root,
            partition_by=("event_type",), mode="append",
        )
    # every partition now holds >= 3 small files, so OPTIMIZE must fire;
    # None would mean the fragmentation invariant broke — fail loudly
    # rather than let the gate silently stop exercising compaction
    if acid_compact(spark, root, target_mb=128) is None:
        raise RuntimeError(f"compaction found nothing to rewrite in {root}")
    _COMPACT_MEMO[memo_key] = root
    return root


@register(
    "q_acid_compact_read",
    oracle=" UNION ALL ".join(_SLICE_SQL.format(k=k) for k in range(3)),
)
def q_acid_compact_read(spark, sf_dir):
    """OPTIMIZE under the value gate: three disjoint appends fragment every
    event_type partition into >=3 files, acid_compact rewrites each
    partition to its target file count as one snapshot commit, and the
    read-after-compact must equal the logical table content exactly (the
    oracle recomputes the three appended slices relationally — compaction
    changes FILES, never rows). Complements the pytest coverage with a
    driver-gated value hash over real data."""
    from ..sources.acid import acid_read

    return acid_read(spark, _compacted_table(spark, sf_dir)).select(
        "user_id", "event_type", "n_events", "sum_value"
    )


@register(
    "q_acid_pruned_read",
    oracle=f"""
    WITH {_BATCHES_SQL}
    SELECT COALESCE(b2.user_id, b1.user_id) AS user_id,
           COALESCE(b2.event_type, b1.event_type) AS event_type,
           COALESCE(b2.n_events, b1.n_events) AS n_events,
           COALESCE(b2.sum_value, b1.sum_value) AS sum_value
    FROM b1 FULL OUTER JOIN b2
      ON b1.user_id = b2.user_id AND b1.event_type = b2.event_type
    WHERE COALESCE(b2.event_type, b1.event_type) IN ('click', 'error')
      AND COALESCE(b2.n_events, b1.n_events) >= 10
    """,
)
def q_acid_pruned_read(spark, sf_dir):
    """S1/S3 at the manifest layer: partition_filter prunes the FILE LIST
    by manifest partition values ('error' files carry straight from v1 —
    the filter must speak the canonical cast-to-string encoding) and
    stats_filter skips files whose recorded min/max n_events exclude the
    range — both BEFORE Spark opens a footer. Skipping is not filtering,
    so the predicate is re-applied; the gate proves no file that still
    held qualifying rows was skipped."""
    from ..sources.acid import acid_read

    return acid_read(
        spark, _acid_table(spark, sf_dir),
        partition_filter={"event_type": ["click", "error"]},
        stats_filter={"n_events": (10, None)},
    ).where(F.col("n_events") >= 10).select(
        "user_id", "event_type", "n_events", "sum_value"
    )


_DEL_PRED = "event_type = 'click' AND user_id % 7 = 3"
_DEL_MEMO: dict[tuple[str, str], str] = {}


def _acid_delete_table(spark, sf_dir) -> str:
    """Build (once) a SEPARATE table for the DELETE query — the shared
    upsert table must stay unmutated for the other acid queries — then
    run the row-level delete on it."""
    from ..sources.acid import acid_delete, acid_upsert

    memo_key = (spark.sparkContext.applicationId, sf_dir)
    root = _DEL_MEMO.get(memo_key)
    if root is not None:
        return root
    e = load(spark, sf_dir, "events")
    b1 = _agg(e.where(F.col("ts") < F.lit(_B1_CUT).cast("timestamp")))
    b2 = _agg(
        e.where(
            (F.col("ts") >= F.lit(_B2_FROM).cast("timestamp"))
            & F.col("event_type").isin(*_B2_TYPES)
        )
    )
    root = tempfile.mkdtemp(prefix="acid_qd_")
    acid_upsert(spark, b1, root, key=_KEY, partition_by=("event_type",),
                stats_cols=("n_events",))
    acid_upsert(spark, b2, root, key=_KEY, partition_by=("event_type",),
                stats_cols=("n_events",))
    acid_delete(spark, root, _DEL_PRED)
    _DEL_MEMO[memo_key] = root
    return root


@register(
    "q_acid_delete_read",
    oracle=f"""
    WITH {_BATCHES_SQL},
    merged AS (
        SELECT COALESCE(b2.user_id, b1.user_id) AS user_id,
               COALESCE(b2.event_type, b1.event_type) AS event_type,
               COALESCE(b2.n_events, b1.n_events) AS n_events,
               COALESCE(b2.sum_value, b1.sum_value) AS sum_value
        FROM b1 FULL OUTER JOIN b2
          ON b1.user_id = b2.user_id AND b1.event_type = b2.event_type
    )
    SELECT * FROM merged
    WHERE NOT (event_type = 'click' AND user_id % 7 = 3)
    """,
)
def q_acid_delete_read(spark, sf_dir):
    """Row-level DELETE under the value gate (sources/acid.acid_delete —
    the Delta `DELETE FROM` semantics the r6 verdict's S4 row claims):
    keyed upsert ×2, then delete every 'click' row of user_id ≡ 3 (mod 7)
    as one copy-on-write snapshot commit; only files containing matches
    are rewritten, untouched partitions carry their files verbatim. The
    oracle recomputes merge-then-filter relationally. Time travel to the
    pre-delete snapshot and CDF 'delete' rows are pinned by
    tests/test_acid.py::test_delete_rows_copy_on_write."""
    from ..sources.acid import acid_read

    return acid_read(spark, _acid_delete_table(spark, sf_dir)).select(
        "user_id", "event_type", "n_events", "sum_value"
    )


_VAC_MEMO: dict[tuple[str, str], str] = {}


def _acid_vacuum_table(spark, sf_dir) -> str:
    """Own table (not the shared memo: vacuuming that one would break
    q_acid_time_travel's version-1 read): upsert b1, upsert b2, compact,
    then VACUUM down to the latest snapshot only — old manifests and every
    data file unreachable from it are physically deleted."""
    from ..sources.acid import acid_compact, acid_upsert, acid_vacuum

    memo_key = (spark.sparkContext.applicationId, sf_dir)
    root = _VAC_MEMO.get(memo_key)
    if root is not None:
        return root
    e = load(spark, sf_dir, "events")
    b1 = _agg(e.where(F.col("ts") < F.lit(_B1_CUT).cast("timestamp")))
    b2 = _agg(
        e.where(
            (F.col("ts") >= F.lit(_B2_FROM).cast("timestamp"))
            & F.col("event_type").isin(*_B2_TYPES)
        )
    )
    root = tempfile.mkdtemp(prefix="acid_qv_")
    acid_upsert(spark, b1, root, key=_KEY, partition_by=("event_type",),
                stats_cols=("n_events",))
    acid_upsert(spark, b2, root, key=_KEY, partition_by=("event_type",),
                stats_cols=("n_events",))
    acid_compact(spark, root)
    removed = acid_vacuum(root, keep_versions=1)
    if not removed:  # the 2-upsert + compact history MUST leave dead files
        raise RuntimeError("acid_vacuum removed nothing — table build or "
                           "vacuum reachability is broken")
    _VAC_MEMO[memo_key] = root
    return root


@register(
    "q_acid_vacuum_read",
    oracle=f"""
    WITH {_BATCHES_SQL}
    SELECT COALESCE(b2.user_id, b1.user_id) AS user_id,
           COALESCE(b2.event_type, b1.event_type) AS event_type,
           COALESCE(b2.n_events, b1.n_events) AS n_events,
           COALESCE(b2.sum_value, b1.sum_value) AS sum_value
    FROM b1 FULL OUTER JOIN b2
      ON b1.user_id = b2.user_id AND b1.event_type = b2.event_type
    """,
)
def q_acid_vacuum_read(spark, sf_dir):
    """VACUUM under the value gate (sources/acid.acid_vacuum — Delta
    VACUUM / Iceberg expire_snapshots semantics): after upsert ×2 +
    compaction, vacuum physically deletes every data file unreachable
    from the latest snapshot and expires the older manifests; the build
    asserts files WERE removed, and the latest-snapshot read must still
    be exactly the merged end state (a vacuum that touches a referenced
    file breaks this value check; one that removes nothing fails the
    build). Retention-window behavior (keep_versions > 1, time travel
    inside the kept window, crashed-staging cleanup) is pinned by
    tests/test_acid.py."""
    from ..sources.acid import acid_read

    return acid_read(spark, _acid_vacuum_table(spark, sf_dir)).select(
        "user_id", "event_type", "n_events", "sum_value"
    )


_EVO_MEMO: dict[tuple[str, str], str] = {}


def _acid_evo_table(spark, sf_dir) -> str:
    """Schema-evolution table: upsert batch1 (4 columns), then upsert
    batch2 carrying an EXTRA ``max_value`` column — the additive-only
    evolution rule (_merge_schema_ddl): the committed schema becomes the
    union, historic files simply lack the new column and read as NULL
    under the pinned schema."""
    from ..sources.acid import acid_upsert

    memo_key = (spark.sparkContext.applicationId, sf_dir)
    root = _EVO_MEMO.get(memo_key)
    if root is not None:
        return root
    e = load(spark, sf_dir, "events")
    b1 = _agg(e.where(F.col("ts") < F.lit(_B1_CUT).cast("timestamp")))
    b2f = e.where(
        (F.col("ts") >= F.lit(_B2_FROM).cast("timestamp"))
        & F.col("event_type").isin(*_B2_TYPES)
    )
    b2 = b2f.groupBy("user_id", "event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.round(F.max("value"), 6).alias("max_value"),
    )
    root = tempfile.mkdtemp(prefix="acid_qe_")
    acid_upsert(spark, b1, root, key=_KEY, partition_by=("event_type",),
                stats_cols=("n_events",))
    acid_upsert(spark, b2, root, key=_KEY, partition_by=("event_type",),
                stats_cols=("n_events",))
    _EVO_MEMO[memo_key] = root
    return root


@register(
    "q_acid_schema_evolution",
    oracle=f"""
    WITH {_BATCHES_SQL},
    b2x AS (
        SELECT user_id, event_type,
               ROUND(MAX(value), 6) AS max_value
        FROM events
        WHERE ts >= TIMESTAMP '{_B2_FROM}'
          AND event_type IN {_B2_TYPES!r}
        GROUP BY 1, 2
    )
    SELECT COALESCE(b2.user_id, b1.user_id) AS user_id,
           COALESCE(b2.event_type, b1.event_type) AS event_type,
           COALESCE(b2.n_events, b1.n_events) AS n_events,
           COALESCE(b2.sum_value, b1.sum_value) AS sum_value,
           b2x.max_value AS max_value
    FROM b1 FULL OUTER JOIN b2
      ON b1.user_id = b2.user_id AND b1.event_type = b2.event_type
    LEFT JOIN b2x ON b2x.user_id = COALESCE(b2.user_id, b1.user_id)
               AND b2x.event_type = COALESCE(b2.event_type, b1.event_type)
               AND b2.user_id IS NOT NULL
    """,
)
def q_acid_schema_evolution(spark, sf_dir):
    """Additive schema evolution under the value gate (Delta
    mergeSchema / Iceberg add-column semantics — sources/acid.
    _merge_schema_ddl): the second upsert carries a NEW ``max_value``
    column; the committed schema evolves to the union, batch2's rows
    carry the new column's values, and every surviving batch1-only row
    reads it as NULL from the historic files (which are NOT rewritten —
    the pinned manifest schema fills the gap). A type-conflicting
    evolution fails loudly (pytest). The oracle recomputes the merged
    end state with the new column NULL exactly where only batch1
    survives."""
    from ..sources.acid import acid_read

    return acid_read(spark, _acid_evo_table(spark, sf_dir)).select(
        "user_id", "event_type", "n_events", "sum_value", "max_value"
    )


@register(
    "q_acid_tag_read",
    oracle=f"""
    WITH {_BATCHES_SQL}
    SELECT user_id, event_type, n_events, sum_value FROM b1
    """,
)
def q_acid_tag_read(spark, sf_dir):
    """Named snapshot refs under the value gate (Iceberg tag / Delta named
    version): version 1 is tagged 'baseline' AFTER the second upsert has
    already committed, and the tag read must be EXACTLY the pre-merge
    state (batch1) — same invariant as q_acid_time_travel, addressed by
    NAME instead of number, which is what a reproducible-training-run
    pipeline actually records. Tagging is idempotent here (replace=True):
    re-running the query re-pins the same version. Tags also pin
    retention — acid_vacuum keeps tagged snapshots (pytest-proven)."""
    from ..sources.acid import acid_read, acid_tag

    root = _acid_table(spark, sf_dir)
    acid_tag(root, "baseline", version=1, replace=True)
    return acid_read(spark, root, tag="baseline").select(
        "user_id", "event_type", "n_events", "sum_value"
    )


_BRANCH_MEMO: dict[tuple[str, str], str] = {}


def _acid_branch_table(spark, sf_dir) -> str:
    """Build (once) the branch-workflow table: main gets batch1, branch
    'exp' forks from it and receives batch2, then the branch fast-forwards
    into main. End state: main v1 = b1, main v2 (latest) = merged, branch
    head = merged."""
    from ..sources.acid import acid_branch, acid_merge_branch, acid_upsert

    memo_key = (spark.sparkContext.applicationId, sf_dir)
    root = _BRANCH_MEMO.get(memo_key)
    if root is not None:
        return root
    e = load(spark, sf_dir, "events")
    b1 = _agg(e.where(F.col("ts") < F.lit(_B1_CUT).cast("timestamp")))
    b2 = _agg(
        e.where(
            (F.col("ts") >= F.lit(_B2_FROM).cast("timestamp"))
            & F.col("event_type").isin(*_B2_TYPES)
        )
    )
    root = tempfile.mkdtemp(prefix="acid_qb_")
    acid_upsert(spark, b1, root, key=_KEY, partition_by=("event_type",))
    acid_branch(root, "exp")
    acid_upsert(spark, b2, root, key=_KEY, partition_by=("event_type",),
                branch="exp")
    acid_merge_branch(root, "exp")
    _BRANCH_MEMO[memo_key] = root
    return root


@register(
    "q_acid_branch_merge",
    oracle=f"""
    WITH {_BATCHES_SQL},
    merged AS (
        SELECT COALESCE(b2.user_id, b1.user_id) AS user_id,
               COALESCE(b2.event_type, b1.event_type) AS event_type,
               COALESCE(b2.n_events, b1.n_events) AS n_events,
               COALESCE(b2.sum_value, b1.sum_value) AS sum_value
        FROM b1 FULL OUTER JOIN b2
          ON b1.user_id = b2.user_id AND b1.event_type = b2.event_type
    )
    SELECT 'main_before' AS stage, user_id, event_type, n_events, sum_value
    FROM b1
    UNION ALL
    SELECT 'branch_head' AS stage, user_id, event_type, n_events, sum_value
    FROM merged
    UNION ALL
    SELECT 'main_after' AS stage, user_id, event_type, n_events, sum_value
    FROM merged
    """,
)
def q_acid_branch_merge(spark, sf_dir):
    """Writable branches under the value gate (Iceberg branch refs /
    Nessie-style isolation, re-derived on the manifest-snapshot layer —
    sources/acid.py acid_branch/acid_merge_branch): batch2 is upserted on
    branch 'exp' forked from main@1, so main-before-merge must be EXACTLY
    batch1 (branch commits invisible — write isolation), the branch head
    must be the keep-last merge of both batches (fork snapshot + branch
    commit), and after the atomic fast-forward merge, main must equal the
    branch head. All three staged reads in one result, labeled, each
    recomputed relationally by the oracle. Branch creation and merge are
    METADATA-scale (one manifest link each; data files shared across
    chains), so the workflow costs the same two aggregated-row commits as
    q_acid_upsert_read at any corpus size; branches pin their files
    against vacuum (pytest-proven)."""
    from ..sources.acid import acid_read

    root = _acid_branch_table(spark, sf_dir)
    cols = ("user_id", "event_type", "n_events", "sum_value")

    def staged(df, stage):
        return df.select(F.lit(stage).alias("stage"), *cols)

    return (
        staged(acid_read(spark, root, version=1), "main_before")
        .unionByName(
            staged(acid_read(spark, root, branch="exp"), "branch_head")
        )
        .unionByName(staged(acid_read(spark, root), "main_after"))
    )


@register(
    "q_acid_changes_schema_evo",
    oracle=f"""
    WITH {_BATCHES_SQL},
    b2e AS (
        SELECT user_id, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 6) AS sum_value,
               ROUND(MAX(value), 6) AS max_value
        FROM events
        WHERE ts >= TIMESTAMP '{_B2_FROM}'
          AND event_type IN {_B2_TYPES!r}
        GROUP BY 1, 2
    )
    SELECT b2e.user_id, b2e.event_type, b2e.n_events, b2e.sum_value,
           b2e.max_value, 'insert' AS _change_type
    FROM b2e LEFT JOIN b1
      ON b1.user_id = b2e.user_id AND b1.event_type = b2e.event_type
    WHERE b1.user_id IS NULL
    UNION ALL
    SELECT b1.user_id, b1.event_type, b1.n_events, b1.sum_value,
           CAST(NULL AS DOUBLE) AS max_value,
           'update_preimage' AS _change_type
    FROM b1 JOIN b2e
      ON b1.user_id = b2e.user_id AND b1.event_type = b2e.event_type
    WHERE b1.n_events <> b2e.n_events OR b1.sum_value <> b2e.sum_value
       OR b2e.max_value IS NOT NULL
    UNION ALL
    SELECT b2e.user_id, b2e.event_type, b2e.n_events, b2e.sum_value,
           b2e.max_value, 'update_postimage' AS _change_type
    FROM b1 JOIN b2e
      ON b1.user_id = b2e.user_id AND b1.event_type = b2e.event_type
    WHERE b1.n_events <> b2e.n_events OR b1.sum_value <> b2e.sum_value
       OR b2e.max_value IS NOT NULL
    """,
)
def q_acid_changes_schema_evo(spark, sf_dir):
    """Change data feed ACROSS a schema-evolution boundary (r8 verdict #6's
    second form): v1 -> v2 of the evolution table adds the ``max_value``
    column mid-stream, and the CDF must align both sides on the NEW
    schema — every pre-evolution image (the update_preimage rows, read
    from files that physically lack the column) carries max_value as
    NULL, every post-evolution image carries the real value. The oracle
    recomputes all three change classes relationally with the NULL
    placement made explicit. Because pre-images have max_value NULL and
    post-images don't, a key whose n_events/sum_value happen to be
    unchanged STILL emits an update pair when b2 rewrote it — the keyed
    struct comparison is null-safe on both engines, so the oracle adds
    the same `max_value IS NOT NULL` arm. Scale shape: manifest-level
    file diff first (files shared by both snapshots cancel unread), then
    one keyed full-outer join — identical to q_acid_changes_feed."""
    from ..sources.acid import acid_changes

    return acid_changes(
        spark, _acid_evo_table(spark, sf_dir), from_version=1, key=_KEY
    ).select(
        "user_id", "event_type", "n_events", "sum_value", "max_value",
        "_change_type",
    )


@register(
    "q_acid_incremental_mv",
    oracle=f"""
    WITH {_BATCHES_SQL},
    merged AS (
        SELECT COALESCE(b2.user_id, b1.user_id) AS user_id,
               COALESCE(b2.event_type, b1.event_type) AS event_type,
               COALESCE(b2.n_events, b1.n_events) AS n_events,
               COALESCE(b2.sum_value, b1.sum_value) AS sum_value
        FROM b1 FULL OUTER JOIN b2
          ON b1.user_id = b2.user_id AND b1.event_type = b2.event_type
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(n_events) AS BIGINT) AS total_events,
           ROUND(CAST(SUM(CAST(ROUND(sum_value * 1000000) AS BIGINT))
                      AS BIGINT) / 1000000.0, 6) AS total_value
    FROM merged GROUP BY 1
    """,
)
def q_acid_incremental_mv(spark, sf_dir):
    """Incremental MATERIALIZED-VIEW maintenance driven by the change data
    feed — the lakehouse pattern that makes a 100 TB aggregate refresh
    cost the churn, not the table: the per-event_type MV is computed ONCE
    at snapshot v1, then advanced to v2 by folding acid_changes(1, 2)
    deltas (insert adds, delete subtracts, update pre/post images cancel
    key counts and net out value sums) — the v2 snapshot itself is NEVER
    re-aggregated. The oracle recomputes the same MV by FULL recompute
    over the merged end state, so the value hash proves
    incremental(v1, cdf) == full(v2) exactly.

    Exactness: stored sum_value is rounded to 6 dp at batch build, so each
    row's contribution is lifted to a 1e6-scaled BIGINT on both sides —
    integer addition commutes, and the incremental +/- arithmetic can
    never drift from the full recompute by summation order.

    Scale shape: the MV@v1 aggregation reads snapshot v1 once (shared,
    memoized table — metadata-scale); the delta aggregation reads ONLY
    the files the v1->v2 commit churned (manifest-level file diff inside
    acid_changes cancels unchanged files before Spark touches them); the
    final merge is a |event_type|-row full-outer join."""
    from ..sources.acid import acid_changes, acid_read

    root = _acid_table(spark, sf_dir)
    sv6 = F.round(F.col("sum_value") * 1000000).cast("bigint")

    mv1 = (
        acid_read(spark, root, version=1)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("n_events").cast("bigint").alias("total_events"),
            F.sum(sv6).alias("sv6"),
        )
    )

    sign = (
        F.when(F.col("_change_type").isin("insert", "update_postimage"), 1)
        .otherwise(-1)
        .cast("bigint")
    )
    key_delta = (
        F.when(F.col("_change_type") == "insert", 1)
        .when(F.col("_change_type") == "delete", -1)
        .otherwise(0)
        .cast("bigint")
    )
    delta = (
        acid_changes(spark, root, from_version=1, to_version=2, key=_KEY)
        .groupBy("event_type")
        .agg(
            F.sum(key_delta).alias("d_keys"),
            F.sum(sign * F.col("n_events")).alias("d_events"),
            F.sum(sign * sv6).alias("d_sv6"),
        )
    )

    zero = F.lit(0).cast("bigint")
    return (
        mv1.join(delta, "event_type", "full_outer")
        .select(
            "event_type",
            (F.coalesce("n_keys", zero) + F.coalesce("d_keys", zero))
            .alias("n_keys"),
            (F.coalesce("total_events", zero) + F.coalesce("d_events", zero))
            .alias("total_events"),
            F.round(
                (F.coalesce("sv6", zero) + F.coalesce("d_sv6", zero))
                / F.lit(1000000.0), 6,
            ).alias("total_value"),
        )
    )


# separate memo: the partition-evolution table mixes specs deliberately
_EVOSPEC_MEMO: dict[tuple[str, str], str] = {}


def _evospec_table(spark, sf_dir) -> str:
    """v1: users%3==0 partitioned by event_type; v2: users%3==1 appended
    UNPARTITIONED; v3: users%3==2 appended partitioned by (event_type,
    user_id%4 bucket via... no derived cols — partitioned by event_type
    again, proving a spec can also evolve BACK). Three specs' files share
    one data root."""
    from ..sources.acid import acid_write

    memo_key = (spark.sparkContext.applicationId, sf_dir)
    root = _EVOSPEC_MEMO.get(memo_key)
    if root is not None:
        return root
    e = load(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="acid_qs_")
    acid_write(spark, _agg(e.where(F.col("user_id") % 3 == 0)), root,
               partition_by=("event_type",))
    acid_write(spark, _agg(e.where(F.col("user_id") % 3 == 1)), root,
               partition_by=())
    acid_write(spark, _agg(e.where(F.col("user_id") % 3 == 2)), root,
               partition_by=("event_type",))
    _EVOSPEC_MEMO[memo_key] = root
    return root


@register(
    "q_acid_partition_evolution",
    oracle=f"""
    WITH allrows AS ({_SLICE_SQL.format(k=0)}
        UNION ALL {_SLICE_SQL.format(k=1)}
        UNION ALL {_SLICE_SQL.format(k=2)})
    SELECT 'full' AS stage, user_id, event_type, n_events, sum_value
    FROM allrows
    UNION ALL
    SELECT 'clicks' AS stage, user_id, event_type, n_events, sum_value
    FROM allrows WHERE event_type = 'click'
    """,
)
def q_acid_partition_evolution(spark, sf_dir):
    """PARTITION-SPEC EVOLUTION under the value gate (Iceberg v2 spec
    evolution semantics): three commits under three specs — hive-
    partitioned by event_type, unpartitioned, partitioned again — share
    one immutable data root, and both a full read and a partition-
    filtered read return exactly the logical table. acid_read groups the
    manifest's file list per spec (Spark refuses mixed hive layouts under
    one basePath scan) and unions the per-spec scans; the 'clicks' stage
    additionally proves the skipping contract across the boundary:
    old-spec files prune by manifest partition values, the unpartitioned
    commit's files are KEPT (their spec lacks the key — skipping may
    never drop data) and the residual predicate finishes the job.

    Scale shape: pruning happens on the manifest BEFORE Spark opens any
    file; the per-spec union adds one scan node per spec ever used (a
    handful), not per file; at 100 TB a spec change never forces a
    rewrite — old files stay readable forever, and compaction naturally
    migrates them to the current spec."""
    from ..sources.acid import acid_read

    root = _evospec_table(spark, sf_dir)
    cols = ("user_id", "event_type", "n_events", "sum_value")
    full = acid_read(spark, root).select(
        F.lit("full").alias("stage"), *cols
    )
    clicks = (
        acid_read(spark, root, partition_filter={"event_type": "click"})
        .where(F.col("event_type") == "click")   # skipping != filtering
        .select(F.lit("clicks").alias("stage"), *cols)
    )
    return full.unionByName(clicks)


@register(
    "q_acid_snapshots",
    oracle=f"""
    WITH {_BATCHES_SQL},
    merged AS (
        SELECT COALESCE(b2.user_id, b1.user_id) AS user_id
        FROM b1 FULL OUTER JOIN b2
          ON b1.user_id = b2.user_id AND b1.event_type = b2.event_type
    )
    SELECT 1 AS version, 'upsert' AS operation,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM b1) AS n_rows
    UNION ALL
    SELECT 2 AS version, 'upsert' AS operation,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM merged) AS n_rows
    """,
)
def q_acid_snapshots(spark, sf_dir):
    """Metadata TABLES under the value gate (Iceberg `table$snapshots` /
    Delta DESCRIBE HISTORY): the commit log of the shared upsert table is
    itself a queryable DataFrame, and its per-version row counts must
    equal the relational recomputation of each snapshot's size — batch1
    at v1, the keep-last merge at v2, both labeled 'upsert'. File counts
    and wall times are real columns too but excluded from the gate
    (parallelism- and clock-dependent); the companion `acid_file_metadata`
    frame (per-file partition values, sizes, stats) is pytest-covered for
    the same reason. Manifest-only: the gate opens no data file."""
    from ..sources.acid import acid_snapshots

    return acid_snapshots(spark, _acid_table(spark, sf_dir)).select(
        "version", "operation", "n_rows"
    )


# separate memo: the multi-table transaction pair (fact + rollup MV)
_CATALOG_MEMO: dict[tuple[str, str], tuple[str, str, str]] = {}

_B3_TYPES = ("error", "signup")


def _catalog_tables(spark, sf_dir) -> tuple[str, str, str]:
    """fact + MV advanced through TWO complete transactions, then a third
    fact-only upsert deliberately left DANGLING (committed to the fact
    table, never referenced by a catalog commit) — the crash window every
    multi-table pipeline has."""
    from ..sources.acid import acid_upsert, acid_write
    from ..sources.catalog import catalog_commit

    memo_key = (spark.sparkContext.applicationId, sf_dir)
    roots = _CATALOG_MEMO.get(memo_key)
    if roots is not None:
        return roots
    e = load(spark, sf_dir, "events")
    fact = tempfile.mkdtemp(prefix="acid_qf_")
    mv = tempfile.mkdtemp(prefix="acid_qm_")
    cat = tempfile.mkdtemp(prefix="acid_qcat_")

    def _mv_df(version):
        from ..sources.acid import acid_read

        sv6 = F.round(F.col("sum_value") * 1000000).cast("bigint")
        return (
            acid_read(spark, fact, version=version)
            .groupBy("event_type")
            .agg(
                F.count("*").cast("bigint").alias("n_keys"),
                F.sum("n_events").cast("bigint").alias("total_events"),
                F.round(F.sum(sv6) / F.lit(1000000.0), 6)
                .alias("total_value"),
            )
        )

    b1 = _agg(e.where(F.col("ts") < F.lit(_B1_CUT).cast("timestamp")))
    fv = acid_upsert(spark, b1, fact, key=_KEY,
                     partition_by=("event_type",))
    mvv = acid_write(spark, _mv_df(fv), mv, mode="overwrite")
    catalog_commit(cat, {"fact": (fact, fv), "mv": (mv, mvv)})

    b2 = _agg(
        e.where(
            (F.col("ts") >= F.lit(_B2_FROM).cast("timestamp"))
            & F.col("event_type").isin(*_B2_TYPES)
        )
    )
    fv2 = acid_upsert(spark, b2, fact, key=_KEY,
                      partition_by=("event_type",))
    mvv2 = acid_write(spark, _mv_df(fv2), mv, mode="overwrite")
    catalog_commit(cat, {"fact": (fact, fv2), "mv": (mv, mvv2)})

    # the dangling member-only commit: fact advances, the transaction
    # never completes — catalog readers must not see it
    b3 = _agg(e.where(F.col("event_type").isin(*_B3_TYPES)))
    acid_upsert(spark, b3, fact, key=_KEY, partition_by=("event_type",))

    _CATALOG_MEMO[memo_key] = (fact, mv, cat)
    return fact, mv, cat


@register(
    "q_acid_catalog_txn",
    oracle=f"""
    WITH {_BATCHES_SQL},
    merged AS (
        SELECT COALESCE(b2.user_id, b1.user_id) AS user_id,
               COALESCE(b2.event_type, b1.event_type) AS event_type,
               COALESCE(b2.n_events, b1.n_events) AS n_events,
               COALESCE(b2.sum_value, b1.sum_value) AS sum_value
        FROM b1 FULL OUTER JOIN b2
          ON b1.user_id = b2.user_id AND b1.event_type = b2.event_type
    ),
    rollup AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(n_events) AS BIGINT) AS total_events,
               ROUND(CAST(SUM(CAST(ROUND(sum_value * 1000000) AS BIGINT))
                          AS BIGINT) / 1000000.0, 6) AS total_value
        FROM merged GROUP BY 1
    )
    SELECT 'fact_by_type' AS stage, * FROM rollup
    UNION ALL
    SELECT 'mv' AS stage, * FROM rollup
    """,
)
def q_acid_catalog_txn(spark, sf_dir):
    """MULTI-TABLE TRANSACTIONS under the value gate (the consistency
    layer single-table formats don't give — Nessie/lakeFS-style catalog
    commits, reimplemented on the manifest-link protocol): a fact table
    and its rollup MV advance through two complete transactions, then a
    third fact upsert COMMITS TO THE FACT TABLE but its transaction never
    completes (no catalog commit — the crash window). Both stages read
    through the catalog: 'fact_by_type' re-aggregates the catalog-pinned
    fact, 'mv' reads the catalog-pinned MV — and the oracle computes ONE
    relational rollup of batches 1+2 for BOTH stages, so the hash proves
    (a) the two tables are mutually consistent and (b) the dangling
    batch-3 commit is invisible even though the fact table durably holds
    it (any leakage of b3's error/signup rows breaks both the row count
    and the hash).

    Scale shape: catalog commits are one JSON link + one retention-pin
    tag per member (metadata-scale at any table size); catalog reads add
    one manifest resolution to acid_read's pinned-version path."""
    from ..sources.catalog import catalog_read

    _fact, _mv, cat = _catalog_tables(spark, sf_dir)
    sv6 = F.round(F.col("sum_value") * 1000000).cast("bigint")
    fact_rollup = (
        catalog_read(spark, cat, "fact")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("n_events").cast("bigint").alias("total_events"),
            F.round(F.sum(sv6) / F.lit(1000000.0), 6).alias("total_value"),
        )
        .select(F.lit("fact_by_type").alias("stage"), "event_type",
                "n_keys", "total_events", "total_value")
    )
    mv_read = catalog_read(spark, cat, "mv").select(
        F.lit("mv").alias("stage"), "event_type",
        "n_keys", "total_events", "total_value",
    )
    return fact_rollup.unionByName(mv_read)


# separate memo: the merge-on-read delete table
_MOR_MEMO: dict[tuple[str, str], str] = {}


def _mor_table(spark, sf_dir) -> str:
    """v1: full keyed aggregate; v2: EQUALITY-DELETE (merge-on-read) of
    the (user%5==0, view|error) keys — zero data files rewritten; v3: an
    upsert re-inserting the (user%10==0, view) subset of the deleted keys
    at a later sequence."""
    from ..sources.acid import acid_delete_mor, acid_upsert

    memo_key = (spark.sparkContext.applicationId, sf_dir)
    root = _MOR_MEMO.get(memo_key)
    if root is not None:
        return root
    e = load(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="acid_qmor_")
    base = _agg(e)
    acid_upsert(spark, base, root, key=_KEY, partition_by=("event_type",))
    keys = base.where(
        (F.col("user_id") % 5 == 0)
        & F.col("event_type").isin("view", "error")
    ).select("user_id", "event_type")
    acid_delete_mor(spark, root, keys, key=_KEY)
    b2 = _agg(
        e.where((F.col("user_id") % 10 == 0)
                & (F.col("event_type") == "view"))
    )
    acid_upsert(spark, b2, root, key=_KEY, partition_by=("event_type",))
    _MOR_MEMO[memo_key] = root
    return root


@register(
    "q_acid_mor_delete",
    oracle="""
    WITH b AS (
        SELECT user_id, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 6) AS sum_value
        FROM events GROUP BY 1, 2
    ),
    del AS (
        SELECT user_id, event_type FROM b
        WHERE user_id % 5 = 0 AND event_type IN ('view', 'error')
    ),
    after_del AS (
        SELECT b.* FROM b ANTI JOIN del USING (user_id, event_type)
    ),
    reins AS (
        SELECT b.* FROM b
        WHERE user_id % 10 = 0 AND event_type = 'view'
    )
    SELECT 'after_delete' AS stage, * FROM after_del
    UNION ALL
    SELECT 'final' AS stage, * FROM after_del
    UNION ALL
    SELECT 'final' AS stage, * FROM reins
    """,
)
def q_acid_mor_delete(spark, sf_dir):
    """MERGE-ON-READ equality deletes under the value gate (Iceberg v2
    delete files, reimplemented on the manifest layer): stage
    'after_delete' reads the snapshot where a key set was deleted by
    COMMITTING ONLY A SMALL KEY FILE — no data file rewritten
    (pytest-proven byte-identical data paths) — so the scan-time
    anti-join must subtract exactly those keys; stage 'final' reads after
    a LATER upsert re-inserts a subset of the deleted keys, proving the
    SEQUENCE rule (a delete suppresses keys only in files committed
    at-or-before it — the re-inserted rows are visible, the
    still-deleted rest stay gone). The oracle recomputes both states
    relationally with an anti-join + a disjoint re-insert union.

    Scale shape: the delete costs O(|keys|) regardless of table size;
    reads pay one keyed anti-join against the (churn-sized) delete set
    until a rewrite purges it; compaction drops spent delete entries
    (pytest). This is the mechanism that makes high-frequency row-level
    deletes viable at 100 TB — copy-on-write would rewrite terabytes per
    delete batch."""
    from ..sources.acid import acid_read

    root = _mor_table(spark, sf_dir)
    cols = ("user_id", "event_type", "n_events", "sum_value")
    after_del = acid_read(spark, root, version=2).select(
        F.lit("after_delete").alias("stage"), *cols
    )
    final = acid_read(spark, root).select(
        F.lit("final").alias("stage"), *cols
    )
    return after_del.unionByName(final)


_BLOOM_USERS = (3, 32, 61, 90)
_BLOOM_MEMO: dict[tuple[str, str], str] = {}


@register(
    "q_acid_bloom_skip",
    oracle=f"""
    WITH day AS (
        SELECT user_id, event_type, CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(ROUND(COALESCE(value, 0) * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1, 2, 3
    )
    SELECT user_id, event_type,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM day
    WHERE user_id IN {_BLOOM_USERS!r}
    GROUP BY 1, 2
    """,
)
def q_acid_bloom_skip(spark, sf_dir):
    """BLOOM-FILTER DATA SKIPPING on an ACID table (the per-file
    point-lookup index Parquet bloom filters / Iceberg puffin files give
    a real lakehouse — the complement to min/max stats, which are useless
    for a needle user_id inside every file's range): the per-(user, type,
    day) rollup lands partitioned by event_type with
    ``bloom_cols=("user_id",)``, so every data file's manifest entry
    carries a 4096-bit bitmap of xxhash64 bit positions; the read probes
    ``point_filter={{"user_id": [...]}}`` — files whose bitmaps prove none
    of the probed users present never reach Spark's scan — and applies
    the real predicate after, per the skipping-not-filtering contract.
    The oracle recomputes the same users' rollups straight off raw
    events: a bloom FALSE NEGATIVE (a skipped file that held a probed
    user's rows) would lose rows and break the hash — the no-false-
    negative law is the gated property, the file-count pruning evidence
    is pytest's (test_bloom_point_skip_prunes_files).

    Scale shape: table build is one map-side-combinable rollup + one
    manifest commit (memoized per application); the probe costs ONE
    |probes|-row local job (never data-sized) + a metadata-only bitmap
    scan, and the surviving scan reads only bloom-hit files — at 100 TB a
    needle lookup touches O(matching files), not O(table).
    Citations: sources/acid.py:_write_data_files (bitmap build),
    _bloom_prune (probe), pipeline/sketch.py:bloom_build (hash formula).
    """
    from ..sources.acid import acid_read, acid_write

    memo_key = (spark.sparkContext.applicationId, sf_dir)
    root = _BLOOM_MEMO.get(memo_key)
    if root is None:
        root = tempfile.mkdtemp(prefix="acid_bloom_")
        e = load(spark, sf_dir, "events")
        day = (
            e.groupBy(
                "user_id", "event_type", F.to_date("ts").alias("d")
            )
            .agg(
                F.count("*").cast("bigint").alias("n_events"),
                F.sum(
                    F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100, 0)
                    .cast("bigint")
                ).cast("bigint").alias("cents"),
            )
        )
        acid_write(spark, day, root, partition_by=("event_type",),
                   bloom_cols=("user_id",))
        _BLOOM_MEMO[memo_key] = root
    snap = acid_read(
        spark, root, point_filter={"user_id": list(_BLOOM_USERS)}
    )
    return (
        snap.where(F.col("user_id").isin(*_BLOOM_USERS))
        .groupBy("user_id", "event_type")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
            F.count("*").cast("bigint").alias("n_days"),
        )
    )


_JOINMV_MEMO: dict[tuple[str, str], str] = {}


@register(
    "q_acid_incremental_join_mv",
    oracle=f"""
    WITH b1 AS (
        SELECT user_id, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(ROUND(COALESCE(value, 0) * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events WHERE ts < TIMESTAMP '{_B1_CUT}'
        GROUP BY 1, 2
    ),
    b2 AS (
        SELECT user_id, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(ROUND(COALESCE(value, 0) * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events
        WHERE ts >= TIMESTAMP '{_B2_FROM}'
          AND event_type IN {_B2_TYPES!r}
        GROUP BY 1, 2
    ),
    f2 AS (
        SELECT COALESCE(b2.user_id, b1.user_id) AS user_id,
               COALESCE(b2.event_type, b1.event_type) AS event_type,
               COALESCE(b2.n_events, b1.n_events) AS n_events,
               COALESCE(b2.cents, b1.cents) AS cents
        FROM b1 FULL OUTER JOIN b2
          ON b1.user_id = b2.user_id AND b1.event_type = b2.event_type
    ),
    u AS (SELECT DISTINCT user_id FROM events),
    d2 AS (
        SELECT user_id,
               CASE WHEN user_id % 3 = 0 THEN 'moved'
                    WHEN user_id % 4 < 2 THEN 'low'
                    ELSE 'high' END AS tier
        FROM u
    )
    SELECT tier, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(n_events) AS BIGINT) AS total_events,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM f2 JOIN d2 USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_acid_incremental_join_mv(spark, sf_dir):
    """Incremental maintenance of a JOIN materialized view — the
    Materialize/DBSP delta rule lifted onto the lakehouse CDF, and the
    step past q_acid_incremental_mv's single-table aggregate: the MV is
    fact ⋈ dim → per-(tier, event_type) rollup, and BOTH tables change
    between v1 and v2 (the fact takes an overlapping keyed upsert, the
    dimension re-tiers a third of its users). The advance applies the
    bilinear identity  F2⋈D2 − F1⋈D1 = ΔF⋈D1 + F2⋈ΔD  — the fact delta
    joins the dim AS OF v1, the signed dim delta (update pre-images −1,
    post-images +1) joins the fact AS OF v2; neither side is ever
    re-joined in full. Content-equal dim rewrites emit cancelling ±
    image pairs, so the fold is correct whether or not the CDF
    suppresses them. Groups whose key count nets to zero are dropped —
    a full recompute never emits them. The oracle IS the full recompute
    over the merged end state, so the hash proves
    incremental(MV1, cdf_F, cdf_D) == full(F2 ⋈ D2) exactly, integer
    cents end to end.

    Scale shape: MV1 reads snapshot v1 once (memoized build); each delta
    aggregation reads only the files its commit churned (manifest-level
    diff inside acid_changes); the folds are keyed joins on user_id and
    the final merge is a |tiers × types|-row full-outer chain.
    Citations: sources/acid.py:acid_changes, queries/acid.py:
    q_acid_incremental_mv (the single-table base case)."""
    from ..sources.acid import acid_changes, acid_read, acid_upsert, \
        acid_write

    memo_key = (spark.sparkContext.applicationId, sf_dir)
    base = _JOINMV_MEMO.get(memo_key)
    if base is None:
        base = tempfile.mkdtemp(prefix="acid_joinmv_")
        e = load(spark, sf_dir, "events")
        cents = F.sum(
            F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100, 0)
            .cast("bigint")
        ).cast("bigint")

        def agg(df):
            return df.groupBy("user_id", "event_type").agg(
                F.count("*").cast("bigint").alias("n_events"),
                cents.alias("cents"),
            )

        b1 = agg(e.where(F.col("ts") < F.lit(_B1_CUT).cast("timestamp")))
        b2 = agg(
            e.where(
                (F.col("ts") >= F.lit(_B2_FROM).cast("timestamp"))
                & F.col("event_type").isin(*_B2_TYPES)
            )
        )
        acid_write(spark, b1, f"{base}/fact")
        acid_upsert(spark, b2, f"{base}/fact",
                    key=("user_id", "event_type"))
        tier1 = (
            F.when(F.col("user_id") % 4 < 2, "low").otherwise("high")
        )
        users = e.select("user_id").distinct()
        acid_write(spark, users.select("user_id", tier1.alias("tier")),
                   f"{base}/dim")
        moved = users.where(F.col("user_id") % 3 == 0).select(
            "user_id", F.lit("moved").alias("tier")
        )
        acid_upsert(spark, moved, f"{base}/dim", key=("user_id",))
        _JOINMV_MEMO[memo_key] = base

    fact, dim = f"{base}/fact", f"{base}/dim"
    d1 = acid_read(spark, dim, version=1).select("user_id", "tier")
    f2 = acid_read(spark, fact, version=2)

    mv1 = (
        acid_read(spark, fact, version=1)
        .join(d1, "user_id")
        .groupBy("tier", "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("n_events").cast("bigint").alias("total_events"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
    )

    sign = (
        F.when(F.col("_change_type").isin("insert", "update_postimage"), 1)
        .otherwise(-1)
        .cast("bigint")
    )
    key_delta = (
        F.when(F.col("_change_type") == "insert", 1)
        .when(F.col("_change_type") == "delete", -1)
        .otherwise(0)
        .cast("bigint")
    )
    # ΔF ⋈ D@v1
    df_fold = (
        acid_changes(spark, fact, from_version=1, to_version=2,
                     key=("user_id", "event_type"))
        .join(d1, "user_id")
        .groupBy("tier", "event_type")
        .agg(
            F.sum(key_delta).alias("d_keys"),
            F.sum(sign * F.col("n_events")).alias("d_events"),
            F.sum(sign * F.col("cents")).alias("d_cents"),
        )
    )
    # F@v2 ⋈ ΔD (signed tier images move the user's v2 contribution)
    dd_fold = (
        acid_changes(spark, dim, from_version=1, to_version=2,
                     key=("user_id",))
        .select("user_id", "tier", sign.alias("s"))
        .join(f2.select("user_id", "event_type", "n_events", "cents"),
              "user_id")
        .groupBy("tier", "event_type")
        .agg(
            F.sum("s").cast("bigint").alias("d_keys"),
            F.sum(F.col("s") * F.col("n_events")).alias("d_events"),
            F.sum(F.col("s") * F.col("cents")).alias("d_cents"),
        )
    )

    zero = F.lit(0).cast("bigint")

    def fold(mv, delta):
        return (
            mv.join(delta, ["tier", "event_type"], "full_outer")
            .select(
                "tier", "event_type",
                (F.coalesce("n_keys", zero) + F.coalesce("d_keys", zero))
                .cast("bigint").alias("n_keys"),
                (F.coalesce("total_events", zero)
                 + F.coalesce("d_events", zero))
                .cast("bigint").alias("total_events"),
                (F.coalesce("total_cents", zero)
                 + F.coalesce("d_cents", zero))
                .cast("bigint").alias("total_cents"),
            )
        )

    return fold(fold(mv1, df_fold), dd_fold).where(F.col("n_keys") > 0)


_CLONE_MEMO: dict[tuple[str, str], str] = {}


@register(
    "q_acid_clone_divergence",
    oracle=f"""
    WITH {_BATCHES_SQL},
    src AS (
        SELECT COALESCE(b2.user_id, b1.user_id) AS user_id,
               COALESCE(b2.event_type, b1.event_type) AS event_type,
               COALESCE(b2.n_events, b1.n_events) AS n_events
        FROM b1 FULL OUTER JOIN b2
          ON b1.user_id = b2.user_id AND b1.event_type = b2.event_type
    ),
    b2c AS (SELECT * FROM b2 WHERE event_type = 'click'),
    cl AS (
        SELECT COALESCE(b2c.user_id, b1.user_id) AS user_id,
               COALESCE(b2c.event_type, b1.event_type) AS event_type,
               COALESCE(b2c.n_events, b1.n_events) AS n_events
        FROM b1 FULL OUTER JOIN b2c
          ON b1.user_id = b2c.user_id AND b1.event_type = b2c.event_type
    ),
    lab AS (
        SELECT 'src' AS stage, event_type, n_events FROM src
        UNION ALL
        SELECT 'clone' AS stage, event_type, n_events FROM cl
    )
    SELECT stage, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(n_events) AS BIGINT) AS total_events
    FROM lab GROUP BY 1, 2
    """,
)
def q_acid_clone_divergence(spark, sf_dir):
    """SHALLOW-CLONE divergence under the oracle gate: the shared ACID
    table is cloned AS OF v1 (zero copy — the clone's first manifest
    references the source's batch-1 files in place, absolute paths into
    the source's hive tree), then the clone takes its OWN keyed upsert
    (batch 2 restricted to clicks) while the source already carries the
    full batch-2 merge. Both end states are read back and labeled; the
    oracle recomputes each relationally — so the gate proves (a) the
    clone froze at the cloned snapshot (no leakage from the source's
    later commit), (b) the clone's divergent merge applied over
    INHERITED files exactly as over owned ones, and (c) the source is
    untouched by the clone's write. Citations: sources/acid.py:
    acid_clone (ownership contract in its docstring), _read_entries
    (per-(spec, base) scan groups for inherited absolute paths)."""
    from ..sources.acid import acid_clone, acid_read, acid_upsert

    root = _acid_table(spark, sf_dir)
    memo_key = (spark.sparkContext.applicationId, sf_dir)
    clone = _CLONE_MEMO.get(memo_key)
    if clone is None:
        clone = tempfile.mkdtemp(prefix="acid_clone_") + "/t"
        acid_clone(spark, root, clone, version=1)
        e = load(spark, sf_dir, "events")
        b2c = _agg(
            e.where(
                (F.col("ts") >= F.lit(_B2_FROM).cast("timestamp"))
                & (F.col("event_type") == "click")
            )
        )
        acid_upsert(spark, b2c, clone, key=_KEY,
                    partition_by=("event_type",))
        _CLONE_MEMO[memo_key] = clone
    lab = (
        acid_read(spark, root).select(
            F.lit("src").alias("stage"), "event_type", "n_events")
        .unionByName(
            acid_read(spark, clone).select(
                F.lit("clone").alias("stage"), "event_type", "n_events")
        )
    )
    return lab.groupBy("stage", "event_type").agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("n_events").cast("bigint").alias("total_events"),
    )


@register(
    "q_acid_conditional_merge",
    oracle=f"""
    WITH {_BATCHES_SQL}
    SELECT COALESCE(b2.user_id, b1.user_id) AS user_id,
           COALESCE(b2.event_type, b1.event_type) AS event_type,
           CASE WHEN b1.user_id IS NOT NULL AND b2.user_id IS NOT NULL
                     AND b2.sum_value > b1.sum_value THEN b2.n_events
                WHEN b1.user_id IS NOT NULL THEN b1.n_events
                ELSE b2.n_events END AS n_events,
           CASE WHEN b1.user_id IS NOT NULL AND b2.user_id IS NOT NULL
                     AND b2.sum_value > b1.sum_value THEN b2.sum_value
                WHEN b1.user_id IS NOT NULL THEN b1.sum_value
                ELSE b2.sum_value END AS sum_value
    FROM b1 FULL OUTER JOIN b2
      ON b1.user_id = b2.user_id AND b1.event_type = b2.event_type
    WHERE NOT (b1.user_id IS NOT NULL AND b2.user_id IS NOT NULL
               AND b2.n_events < 3)
      AND NOT (b1.user_id IS NULL AND b2.n_events < 2)
    """,
)
def q_acid_conditional_merge(spark, sf_dir):
    """CONDITIONAL MERGE INTO under the value gate (sources/acid.
    acid_merge — Delta `WHEN MATCHED [AND cond] THEN UPDATE/DELETE,
    WHEN NOT MATCHED [AND cond] THEN INSERT`, clause-order semantics):
    batch1 seeds the table, then one merge with batch2 as the source —
    matched keys with a small batch2 count DELETE ("s.n_events < 3"),
    matched keys where batch2's total grew UPDATE wholesale
    ("s.sum_value > t.sum_value"), other matched keys keep the batch1
    row, and batch2-only keys INSERT only at "s.n_events >= 2". The
    oracle replays all four clause outcomes relationally off the raw
    events, so clause precedence (delete before update), condition
    evaluation over BOTH aliases, partition-scoped rewrites, and the
    atomic single-commit publish all hash-gate."""
    from ..sources.acid import acid_merge, acid_read

    memo_key = (spark.sparkContext.applicationId, sf_dir,
                "conditional_merge")
    root = _TABLE_MEMO.get(memo_key)
    if root is None:
        e = load(spark, sf_dir, "events")
        b1 = _agg(e.where(F.col("ts") < F.lit(_B1_CUT).cast("timestamp")))
        b2 = _agg(
            e.where(
                (F.col("ts") >= F.lit(_B2_FROM).cast("timestamp"))
                & F.col("event_type").isin(*_B2_TYPES)
            )
        )
        root = tempfile.mkdtemp(prefix="acid_qcm_")
        from ..sources.acid import acid_write
        acid_write(spark, b1, root, partition_by=("event_type",))
        acid_merge(
            spark, b2, root, key=_KEY,
            when_matched_delete="s.n_events < 3",
            when_matched_update="s.sum_value > t.sum_value",
            when_not_matched_insert="s.n_events >= 2",
            partition_by=("event_type",),
        )
        _TABLE_MEMO[memo_key] = root
    return acid_read(spark, root).select(
        "user_id", "event_type", "n_events", "sum_value"
    )


@register(
    "q_acid_replace_where",
    oracle=f"""
    WITH {_BATCHES_SQL}
    SELECT user_id, event_type, n_events, sum_value FROM b1
    WHERE event_type NOT IN {_B2_TYPES!r}
    UNION ALL
    SELECT user_id, event_type, n_events, sum_value FROM b2
    """,
)
def q_acid_replace_where(spark, sf_dir):
    """replaceWhere under the value gate (sources/acid.acid_replace_where
    — Delta's targeted overwrite): batch1 seeds the table, then ONE
    commit replaces exactly the three-event-type slice with batch2 (the
    idempotent re-landing pattern: recompute a date/type slice, swap it
    atomically). The oracle rebuilds the end state relationally — batch1
    survivors outside the slice plus batch2 — so slice deletion,
    in-slice insert, the incoming-rows-must-match-predicate contract,
    and untouched-partition carry-over all hash-gate."""
    from ..sources.acid import acid_read, acid_replace_where, acid_write

    memo_key = (spark.sparkContext.applicationId, sf_dir, "replace_where")
    root = _TABLE_MEMO.get(memo_key)
    if root is None:
        e = load(spark, sf_dir, "events")
        b1 = _agg(e.where(F.col("ts") < F.lit(_B1_CUT).cast("timestamp")))
        b2 = _agg(
            e.where(
                (F.col("ts") >= F.lit(_B2_FROM).cast("timestamp"))
                & F.col("event_type").isin(*_B2_TYPES)
            )
        )
        root = tempfile.mkdtemp(prefix="acid_qrw_")
        acid_write(spark, b1, root, partition_by=("event_type",))
        types = ", ".join(f"'{t}'" for t in _B2_TYPES)
        acid_replace_where(spark, b2, root,
                           f"event_type IN ({types})")
        _TABLE_MEMO[memo_key] = root
    return acid_read(spark, root).select(
        "user_id", "event_type", "n_events", "sum_value"
    )


@register(
    "q_acid_positional_delete",
    oracle="""
    WITH b AS (
        SELECT user_id, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 6) AS sum_value
        FROM events GROUP BY 1, 2
    ),
    hit AS (
        SELECT user_id, event_type FROM b
        WHERE n_events > 1 AND user_id % 4 = 1
    ),
    after_del AS (
        SELECT b.* FROM b ANTI JOIN hit USING (user_id, event_type)
    ),
    reins AS (
        SELECT user_id, event_type, n_events + 100 AS n_events,
               sum_value
        FROM b WHERE user_id % 8 = 1 AND event_type = 'click'
    ),
    final AS (
        SELECT a.* FROM after_del a
        ANTI JOIN reins USING (user_id, event_type)
        UNION ALL
        SELECT * FROM reins
    )
    SELECT 'after_delete' AS stage, * FROM after_del
    UNION ALL
    SELECT 'final' AS stage, * FROM final
    """,
)
def q_acid_positional_delete(spark, sf_dir):
    """MERGE-ON-READ **POSITIONAL** deletes under the value gate (Iceberg
    v2 position-delete files — sources/acid.acid_delete_pos): stage
    'after_delete' reads the snapshot where an ARBITRARY-PREDICATE
    delete (n_events > 1 AND user_id % 4 = 1 — no key columns required,
    the capability equality deletes lack) committed ONLY a small file of
    (data file path, row ordinal) pairs; the scan anti-joins on the
    coordinates, so exactly the rows visible-and-matching at delete time
    disappear. Stage 'final' reads after a later upsert rewrites the
    click partition (re-inserting deleted click rows with n_events+100):
    path-addressed coordinates never reach newly written files, so the
    re-inserts are visible and the rest stay gone — the oracle rebuilds
    both states relationally.

    Scale shape: the delete costs O(|matches|) coordinates regardless of
    how many TB the matches live in; reads pay one bounded broadcast
    path-lookup + anti-join until acid_compact(purge_deletes=True)
    rewrites the targeted partitions (pytest-pinned purge)."""
    from ..sources.acid import (
        acid_delete_pos, acid_read, acid_upsert, acid_write,
    )

    memo_key = (spark.sparkContext.applicationId, sf_dir, "pos_delete")
    root = _TABLE_MEMO.get(memo_key)
    if root is None:
        e = load(spark, sf_dir, "events")
        b = _agg(e)
        root = tempfile.mkdtemp(prefix="acid_qpd_")
        acid_write(spark, b, root, partition_by=("event_type",))
        acid_delete_pos(spark, root,
                        "n_events > 1 AND user_id % 4 = 1")
        reins = b.where(
            (F.col("user_id") % 8 == 1) & (F.col("event_type") == "click")
        ).withColumn("n_events", (F.col("n_events") + 100).cast("bigint"))
        acid_upsert(spark, reins, root, key=list(_KEY),
                    partition_by=("event_type",))
        _TABLE_MEMO[memo_key] = root
    cols = ("user_id", "event_type", "n_events", "sum_value")
    after_del = acid_read(spark, root, version=2).select(
        F.lit("after_delete").alias("stage"), *cols)
    final = acid_read(spark, root).select(
        F.lit("final").alias("stage"), *cols)
    return after_del.unionByName(final)


@register(
    "q_acid_restore",
    oracle=f"""
    WITH {_BATCHES_SQL},
    merged AS (
        SELECT * FROM b2
        UNION ALL
        SELECT b1.* FROM b1 ANTI JOIN b2 USING (user_id, event_type)
    ),
    damaged AS (
        SELECT * FROM merged
        WHERE NOT (user_id % 6 = 2 AND event_type = 'view')
    )
    SELECT 'damaged' AS stage, * FROM damaged
    UNION ALL
    SELECT 'restored' AS stage, * FROM merged
    """,
)
def q_acid_restore(spark, sf_dir):
    """RESTORE TABLE TO VERSION under the value gate (Delta `RESTORE` /
    Iceberg rollback — sources/acid.acid_rollback): batch1 seeds v1,
    batch2 keyed-upserts to v2, a bad DELETE produces v3 ('damaged'),
    and the restore commits v4 REFERENCING v2's exact file list — a
    metadata-only commit, no data rewritten, with the bad version still
    inspectable in history (append-only timeline, Delta's RESTORE
    contract). The oracle rebuilds both the damaged state and the
    restored state relationally, so the gate proves the restore brought
    back EXACTLY the pre-damage rows (deleted rows resurrected, nothing
    else changed) and that reads of the intermediate version still see
    the damage.

    Scale shape: restore is O(manifest) regardless of table size — the
    100 TB 'undo a bad batch' path is one metadata write."""
    from ..sources.acid import (
        acid_delete, acid_read, acid_rollback, acid_upsert, acid_write,
    )

    memo_key = (spark.sparkContext.applicationId, sf_dir, "restore")
    root = _TABLE_MEMO.get(memo_key)
    if root is None:
        e = load(spark, sf_dir, "events")
        b1 = _agg(e.where(F.col("ts") < F.lit(_B1_CUT).cast("timestamp")))
        b2 = _agg(
            e.where(
                (F.col("ts") >= F.lit(_B2_FROM).cast("timestamp"))
                & F.col("event_type").isin(*_B2_TYPES)
            )
        )
        root = tempfile.mkdtemp(prefix="acid_qrs_")
        acid_write(spark, b1, root, partition_by=("event_type",))
        acid_upsert(spark, b2, root, key=list(_KEY),
                    partition_by=("event_type",))
        acid_delete(spark, root,
                    "user_id % 6 = 2 AND event_type = 'view'")
        acid_rollback(root, 2)
        _TABLE_MEMO[memo_key] = root
    cols = ("user_id", "event_type", "n_events", "sum_value")
    damaged = acid_read(spark, root, version=3).select(
        F.lit("damaged").alias("stage"), *cols)
    restored = acid_read(spark, root).select(
        F.lit("restored").alias("stage"), *cols)
    return damaged.unionByName(restored)


@register(
    "q_acid_column_mapping",
    oracle=f"""
    WITH {_BATCHES_SQL},
    m1 AS (
        SELECT b1.user_id, b1.event_type, b1.sum_value AS total_value
        FROM b1 ANTI JOIN b2 USING (user_id, event_type)
        UNION ALL
        SELECT user_id, event_type, sum_value AS total_value FROM b2
    ),
    b3 AS (
        SELECT user_id, event_type, n_events + 1000 AS n_events,
               sum_value AS total_value
        FROM b2 WHERE event_type = 'click' AND user_id % 5 = 0
    )
    SELECT m1.user_id, m1.event_type, m1.total_value,
           CAST(NULL AS BIGINT) AS n_events
    FROM m1 ANTI JOIN b3 USING (user_id, event_type)
    UNION ALL
    SELECT user_id, event_type, total_value,
           CAST(n_events AS BIGINT) AS n_events
    FROM b3
    """,
)
def q_acid_column_mapping(spark, sf_dir):
    """COLUMN MAPPING under the value gate (sources/acid column-mapping
    section — Delta `columnMapping` / Iceberg field-id, name-based):
    batch1 seeds the table; `sum_value` is RENAMED to `total_value`
    (metadata-only — no file rewritten); batch2 upserts USING THE NEW
    LOGICAL NAME; `n_events` is DROPPED (retired physical); batch3
    re-adds a column named `n_events` (fresh physical name) for the
    click/user_id%5=0 slice with a +1000 marker. The oracle replays the
    whole chain relationally: renamed values flow through the merge,
    the dropped column reads NULL everywhere EXCEPT batch3's rows —
    i.e. the retired column's bytes never resurrect under the re-added
    name, the property name-based mappings classically get wrong."""
    from ..sources.acid import (
        acid_drop_column, acid_read, acid_rename_column, acid_upsert,
        acid_write)

    memo_key = (spark.sparkContext.applicationId, sf_dir, "column_mapping")
    root = _TABLE_MEMO.get(memo_key)
    if root is None:
        e = load(spark, sf_dir, "events")
        b1 = _agg(e.where(F.col("ts") < F.lit(_B1_CUT).cast("timestamp")))
        b2src = e.where(
            (F.col("ts") >= F.lit(_B2_FROM).cast("timestamp"))
            & F.col("event_type").isin(*_B2_TYPES)
        )
        b2 = _agg(b2src).withColumnRenamed("sum_value", "total_value")
        root = tempfile.mkdtemp(prefix="acid_cmap_")
        acid_write(spark, b1, root, partition_by=("event_type",))
        acid_rename_column(spark, root, "sum_value", "total_value")
        acid_upsert(spark, b2, root, key=_KEY,
                    partition_by=("event_type",))
        acid_drop_column(spark, root, "n_events")
        b3 = (
            _agg(b2src)
            .where((F.col("event_type") == "click")
                   & (F.col("user_id") % 5 == 0))
            .select(
                "user_id", "event_type",
                (F.col("n_events") + 1000).cast("bigint")
                .alias("n_events"),
                F.col("sum_value").alias("total_value"),
            )
        )
        acid_upsert(spark, b3, root, key=_KEY,
                    partition_by=("event_type",))
        _TABLE_MEMO[memo_key] = root
    return acid_read(spark, root).select(
        "user_id", "event_type", "total_value",
        F.col("n_events").cast("bigint").alias("n_events"),
    )
