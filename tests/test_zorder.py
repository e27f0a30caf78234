"""Z-order layout: key correctness (vs a python Morton reference) and the
pruning property that motivates it — a linear sort prunes perfectly on its
sort column and not at all on any other, while a z-ordered write keeps
per-file min/max stats tight on EVERY interleaved dimension."""

import glob
import shutil
import tempfile

from pyspark.sql import functions as F

from backtest_crew_datalake_spark.operators.zorder import (
    write_zordered,
    zorder_key,
)


def _morton(u, h, bits=10):
    out = 0
    for j, v in enumerate((u, h)):
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * 2 + j)
    return out


def test_zorder_key_matches_python_reference(spark):
    rows = [(u, h) for u in (0, 1, 5, 100, 1023) for h in (0, 7, 23)]
    df = spark.createDataFrame(rows, ["u", "h"])
    got = df.select(
        "u", "h", zorder_key(["u", "h"]).alias("z")
    ).collect()
    for r in got:
        assert r.z == _morton(r.u, r.h), (r.u, r.h)
    # clamp guard: negative and overflow inputs stay in range
    edge = spark.createDataFrame([(-5, 2000)], ["u", "h"]).select(
        zorder_key(["u", "h"]).alias("z")
    ).first()
    assert edge.z == _morton(0, 1023)


def test_zordered_write_bounds_worst_dimension_pruning(spark):
    # balanced 2-D domain: u, h both in [0, 256). The honest z-order claim:
    # a linear sort prunes perfectly on its sort column and NOT AT ALL on
    # the other; z-order prunes usefully on BOTH, so the total files hit
    # across one point-filter per dimension is far lower.
    df = (
        spark.range(0, 65536)
        .select(
            (F.col("id") % 256).alias("u"),
            ((F.col("id") * 37) % 256).alias("h"),
        )
    )

    def files_hit(path, col, val):
        hit = 0
        for f in glob.glob(f"{path}/*.parquet"):
            lo, hi = spark.read.parquet(f).agg(
                F.min(col), F.max(col)
            ).first()
            hit += int(lo <= val <= hi)
        return hit

    zdir, ldir = tempfile.mkdtemp(), tempfile.mkdtemp()
    try:
        write_zordered(df, zdir, ["u", "h"], bits=8, n_files=16)
        (df.repartitionByRange(16, "u").sortWithinPartitions("u")
           .write.mode("overwrite").parquet(ldir))
        z_hits = files_hit(zdir, "u", 200) + files_hit(zdir, "h", 40)
        l_hits = files_hit(ldir, "u", 200) + files_hit(ldir, "h", 40)
        # linear: 1 file on u, all 16 on h = 17. z-order: ~4 + ~4.
        assert z_hits < l_hits, (z_hits, l_hits)
        assert z_hits <= 12, z_hits
        # and the data survives the round trip
        assert spark.read.parquet(zdir).count() == 65536
    finally:
        shutil.rmtree(zdir, ignore_errors=True)
        shutil.rmtree(ldir, ignore_errors=True)
