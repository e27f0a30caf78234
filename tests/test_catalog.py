"""Multi-table transactions: consistent catalog snapshots
(sources/catalog.py) — cross-table read consistency, the member-commit /
catalog-commit crash window, vacuum pinning through catalog refs, race
retry hygiene, and expiry releasing pins.
"""

import pytest

from backtest_crew_datalake_spark.sources.acid import (
    acid_read,
    acid_tags,
    acid_upsert,
    acid_vacuum,
    acid_write,
)
from backtest_crew_datalake_spark.sources.catalog import (
    catalog_commit,
    catalog_expire,
    catalog_latest,
    catalog_read,
    catalog_tables,
    catalog_versions,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "sym string, ts bigint, px double")


KEY = ("sym", "ts")


def _snap(df):
    return sorted((r.sym, r.ts, r.px) for r in df.select(*KEY, "px").collect())


def _mv_of(spark, fact_root, version=None):
    from pyspark.sql import functions as F

    return (
        acid_read(spark, fact_root, version=version)
        .groupBy("sym")
        .agg(F.count("*").cast("bigint").alias("n"),
             F.round(F.sum("px") * 100).cast("bigint").alias("px_c"))
    )


def test_catalog_consistency_and_crash_window(spark, tmp_path):
    fact = str(tmp_path / "fact")
    mv = str(tmp_path / "mv")
    cat = str(tmp_path / "cat")

    # txn 1: fact v1 + its rollup mv v1, committed as catalog v1
    fv = acid_upsert(spark, _mk(spark, [("A", 1, 1.0), ("B", 1, 2.0)]),
                     fact, key=KEY)
    mvv = acid_write(spark, _mv_of(spark, fact, fv), mv, mode="overwrite")
    cv = catalog_commit(cat, {"fact": (fact, fv), "mv": (mv, mvv)})
    assert cv == 1

    # a member-only commit (the crash window: fact advanced, mv/catalog
    # not) is INVISIBLE through the catalog
    fv2 = acid_upsert(spark, _mk(spark, [("A", 2, 9.0)]), fact, key=KEY)
    assert len(_snap(acid_read(spark, fact))) == 3          # table sees it
    got_fact = _snap(catalog_read(spark, cat, "fact"))
    assert got_fact == [("A", 1, 1.0), ("B", 1, 2.0)]       # catalog doesn't
    # and the pair stays mutually consistent: mv recomputed from the
    # catalog's fact equals the catalog's mv
    want_mv = sorted(
        (r.sym, r.n, r.px_c)
        for r in _mv_of(spark, fact, version=1).collect()
    )
    got_mv = sorted(
        (r.sym, r.n, r.px_c)
        for r in catalog_read(spark, cat, "mv").collect()
    )
    assert got_mv == want_mv

    # txn 2 completes: mv catches up, catalog advances, both visible
    mvv2 = acid_write(spark, _mv_of(spark, fact, fv2), mv, mode="overwrite")
    cv2 = catalog_commit(cat, {"fact": (fact, fv2), "mv": (mv, mvv2)})
    assert cv2 == 2
    assert len(_snap(catalog_read(spark, cat, "fact"))) == 3
    # old catalog version still readable (catalog time travel)
    assert len(_snap(catalog_read(spark, cat, "fact",
                                  catalog_version=1))) == 2
    assert sorted(catalog_tables(cat)) == ["fact", "mv"]


def test_catalog_pins_survive_member_vacuum(spark, tmp_path):
    fact = str(tmp_path / "fact")
    cat = str(tmp_path / "cat")
    v1 = acid_upsert(spark, _mk(spark, [("A", 1, 1.0)]), fact, key=KEY)
    catalog_commit(cat, {"fact": (fact, v1)})
    for i in range(2, 5):
        acid_upsert(spark, _mk(spark, [("A", i, float(i))]), fact, key=KEY)
    acid_vacuum(fact, keep_versions=1)
    # v1 is outside the retention window but catalog-pinned: still readable
    assert _snap(catalog_read(spark, cat, "fact")) == [("A", 1, 1.0)]
    # expire the catalog version -> pin released -> next vacuum reclaims
    dropped = catalog_expire(cat, keep_versions=0)
    assert dropped == [1]
    acid_vacuum(fact, keep_versions=1)
    with pytest.raises(Exception):
        acid_read(spark, fact, version=v1).collect()


def test_catalog_commit_race_retry_releases_loser_pins(
    spark, tmp_path, monkeypatch,
):
    import backtest_crew_datalake_spark.sources.catalog as catmod

    fact = str(tmp_path / "fact")
    cat = str(tmp_path / "cat")
    v1 = acid_upsert(spark, _mk(spark, [("A", 1, 1.0)]), fact, key=KEY)
    catalog_commit(cat, {"fact": (fact, v1)})

    # make the next commit believe the catalog is empty once — its first
    # attempt targets v1 (taken), loses the link race, retries at v2
    real = catmod.catalog_latest
    calls = {"n": 0}

    def lagging(root):
        calls["n"] += 1
        return 0 if calls["n"] == 1 else real(root)

    monkeypatch.setattr(catmod, "catalog_latest", lagging)
    v2 = acid_upsert(spark, _mk(spark, [("A", 2, 2.0)]), fact, key=KEY)
    assert catalog_commit(cat, {"fact": (fact, v2)}) == 2
    monkeypatch.undo()

    # exactly one pin per LIVE catalog version; the lost attempt's pin
    # was released
    pins = [t for t in acid_tags(fact) if t.startswith("__cat_")]
    assert len(pins) == len(catalog_versions(cat)) == 2


def test_catalog_errors(spark, tmp_path):
    fact = str(tmp_path / "fact")
    cat = str(tmp_path / "cat")
    with pytest.raises(FileNotFoundError):
        catalog_tables(cat)
    v1 = acid_upsert(spark, _mk(spark, [("A", 1, 1.0)]), fact, key=KEY)
    with pytest.raises(FileNotFoundError):
        catalog_commit(cat, {"fact": (fact, v1 + 7)})   # nonexistent version
    catalog_commit(cat, {"fact": (fact, v1)})
    with pytest.raises(KeyError):
        catalog_read(spark, cat, "nope")
    assert catalog_latest(cat) == 1


def test_streaming_txn_consistent_and_replay_safe(spark, tmp_path):
    """streaming_txn: per batch the fact upsert, the CDF-driven MV
    advance, and the catalog commit land as one consistent unit; the MV
    equals a full recompute after every batch; full replay on a fresh
    checkpoint is a content no-op."""
    from pyspark.sql import functions as F

    from backtest_crew_datalake_spark.streaming.ingest import streaming_txn

    src = str(tmp_path / "land")
    fact = str(tmp_path / "fact")
    mv = str(tmp_path / "mv")
    cat = str(tmp_path / "cat")
    ckpt = str(tmp_path / "ck")
    schema = "sym string, ts bigint, px double"
    args = (spark, src, fact, mv, cat, ckpt, schema)
    kw = dict(key=("sym", "ts"), mv_key="sym", agg_col="px")

    b1 = [("A", 1, 1.0), ("A", 2, 2.0), ("B", 1, 5.0)]
    b2 = [("A", 2, 9.0),            # update
          ("C", 1, 4.0),            # new key
          ("C", 2, 1.0), ("C", 2, 3.0)]  # within-batch dup: last wins

    def mv_full():
        return sorted(
            (r.sym, r.n_rows, r.a6)
            for r in catalog_read(spark, cat, "fact")
            .groupBy("sym")
            .agg(F.count("*").cast("bigint").alias("n_rows"),
                 F.sum(F.round(F.col("px") * 1000000).cast("bigint"))
                 .alias("a6"))
            .collect()
        )

    def mv_read():
        return sorted(
            (r.sym, r.n_rows, r.a6)
            for r in catalog_read(spark, cat, "mv").collect()
        )

    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    streaming_txn(*args, **kw)
    assert mv_read() == mv_full()
    spark.createDataFrame(b2, schema).coalesce(1) \
        .write.mode("append").parquet(src)
    streaming_txn(*args, **kw)
    want = [("A", 2, 10000000), ("B", 1, 5000000), ("C", 2, 7000000)]
    assert mv_read() == mv_full() == want

    # full replay, fresh checkpoint: new catalog version, same content
    v_before = catalog_latest(cat)
    streaming_txn(spark, src, fact, mv, cat, str(tmp_path / "ck2"),
                  schema, **kw)
    assert catalog_latest(cat) > v_before
    assert mv_read() == mv_full() == want


@pytest.mark.parametrize("kill_at", ["mv_write", "catalog_commit"])
def test_streaming_txn_crash_between_fact_commit_and_publish(
    spark, tmp_path, monkeypatch, kill_at,
):
    """The r9 ADVICE crash window: the driver dies AFTER the fact upsert
    but BEFORE the MV write (or after the MV write, before the catalog
    commit). The replayed batch must still reach the MV exactly once —
    the fold anchors to the catalog's durable applied-watermark, not to
    latest_version at replay time (which already contains the crashed
    attempt's own fact commit and would yield an empty CDF)."""
    from pyspark.sql import functions as F

    from backtest_crew_datalake_spark.sources import acid as acid_mod
    from backtest_crew_datalake_spark.sources import catalog as cat_mod
    from backtest_crew_datalake_spark.streaming.ingest import streaming_txn

    src = str(tmp_path / "land")
    fact = str(tmp_path / "fact")
    mv = str(tmp_path / "mv")
    cat = str(tmp_path / "cat")
    ckpt = str(tmp_path / "ck")
    schema = "sym string, ts bigint, px double"
    args = (spark, src, fact, mv, cat, ckpt, schema)
    kw = dict(key=("sym", "ts"), mv_key="sym", agg_col="px")

    def mv_full():
        return sorted(
            (r.sym, r.n_rows, r.a6)
            for r in catalog_read(spark, cat, "fact")
            .groupBy("sym")
            .agg(F.count("*").cast("bigint").alias("n_rows"),
                 F.sum(F.round(F.col("px") * 1000000).cast("bigint"))
                 .alias("a6"))
            .collect()
        )

    def mv_read():
        return sorted(
            (r.sym, r.n_rows, r.a6)
            for r in catalog_read(spark, cat, "mv").collect()
        )

    spark.createDataFrame(
        [("A", 1, 1.0), ("B", 1, 5.0)], schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    streaming_txn(*args, **kw)           # batch 1 lands cleanly

    # batch 2 dies in the stated window: fact committed, publish not
    spark.createDataFrame(
        [("A", 2, 2.0), ("C", 1, 4.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    if kill_at == "mv_write":
        real = acid_mod.acid_write

        def boom(spark_, df, root, **kwargs):
            if root == mv:
                raise RuntimeError("injected crash before MV write")
            return real(spark_, df, root, **kwargs)

        monkeypatch.setattr(acid_mod, "acid_write", boom)
    else:
        def boom(*a, **k):
            raise RuntimeError("injected crash before catalog commit")

        monkeypatch.setattr(cat_mod, "catalog_commit", boom)
    with pytest.raises(Exception, match="injected crash"):
        streaming_txn(*args, **kw)
    monkeypatch.undo()
    # the fact table DID take the batch, but the catalog did not publish
    # it — readers going through the catalog still see the consistent
    # pre-batch pair (the torn state is invisible, which is the point)
    assert acid_mod.latest_version(fact) > catalog_tables(cat)["fact"][1]
    assert mv_read() == mv_full() == [("A", 1, 1000000), ("B", 1, 5000000)]

    # restart: the checkpoint replays batch 2; the watermark-anchored
    # fold applies it exactly once
    streaming_txn(*args, **kw)
    want = [("A", 2, 3000000), ("B", 1, 5000000), ("C", 1, 4000000)]
    assert mv_read() == mv_full() == want

    # and a further clean batch keeps advancing normally
    spark.createDataFrame(
        [("B", 2, 1.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    streaming_txn(*args, **kw)
    assert mv_read() == mv_full() == [
        ("A", 2, 3000000), ("B", 2, 6000000), ("C", 1, 4000000),
    ]
