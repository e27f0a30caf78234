"""Count-min sketch as pure DataFrame operations.

A CMS is depth×width counters; item x increments cell (d, xxhash64(x, d) mod
width) for each depth d; the estimate is the MIN over depths. Built as a
groupBy over exploded (depth, cell) pairs — fully distributed, mergeable
(sketches from different partitions/days union+sum), and the sketch itself
is a tiny DataFrame that broadcasts.

Use over exact counts when the key cardinality is huge (URL/doc frequency at
100 TB): the sketch is O(depth×width) memory regardless of cardinality, and
the build is one map-side-combinable aggregation. Overestimates only;
error ≤ e/width × N with prob ≥ 1 − (1/2)^depth (standard CMS bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build the sketch: one row per (depth, cell) with its counter."""
    pairs = F.array(*[
        F.struct(
            F.lit(d).alias("d"),
            F.pmod(F.xxhash64(F.col(key_col), F.lit(d)), F.lit(width))
            .alias("cell"),
        )
        for d in range(depth)
    ])
    return (
        df.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.d").alias("d"), F.col("p.cell").alias("cell"))
        .agg(F.count("*").alias("n"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Estimate the frequency of each key in ``keys``: min over depths of the
    addressed counters (missing cell ⇒ 0). The sketch side broadcasts."""
    probes = keys.select(
        F.col(key_col),
        F.explode(F.array(*[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(F.xxhash64(F.col(key_col), F.lit(d)), F.lit(width))
                .alias("cell"),
            )
            for d in range(depth)
        ])).alias("p"),
    ).select(key_col, F.col("p.d").alias("d"), F.col("p.cell").alias("cell"))
    return (
        probes.join(F.broadcast(sketch), ["d", "cell"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("est_count"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches of identical (depth, width): cell-wise sum."""
    return (
        a.unionByName(b)
        .groupBy("d", "cell")
        .agg(F.sum("n").alias("n"))
    )


# ---------------------------------------------------------------------------
# Bloom filter — membership sketch as a DataFrame of bitmap words.
#
# m bits stored as m/32 32-bit words (BIGINT-held so shifts never overflow);
# item x sets bit xxhash64(x, k) mod m for each of k hash seeds. The sketch
# is m/32 rows — broadcastable at any m a driver would realistically pick
# (m = 2^27 bits is 4 M rows ≈ 64 MB; m = 2^20 is 32 k rows). Use over an
# exact distinct-set broadcast when the reference set is huge (benchmark
# shingles, seen-URL sets at 100 TB): the probe side stays a map-only
# broadcast join against O(m) state with a bounded false-positive rate
# (≈ (1 - e^{-kn/m})^k), and never a false negative.
# ---------------------------------------------------------------------------

_BLOOM_WORD = 32  # bits per bitmap word


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Build the bitmap: one row per word index with its OR-ed 32-bit word."""
    probes = F.array(*[
        F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits))
        for i in range(k)
    ])
    return (
        df.select(F.explode(probes).alias("bit"))
        .select(
            (F.col("bit") / _BLOOM_WORD).cast("long").alias("word"),
            F.expr(f"shiftleft(cast(1 as bigint), cast(bit % {_BLOOM_WORD} as int))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_might_contain(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Probe: ``keys`` with ALL its columns (duplicates preserved) plus a
    ``might_contain`` boolean (true iff ALL k bits are set).

    The bitmap aggregates to ONE map row (bounded by construction at
    m_bits/32 entries, independent of data scale) and broadcasts; each key
    then tests its k bits row-locally via element_at — a pure map stage
    appended to whatever scan produced ``keys``, no explode, no shuffle."""
    bitmap = F.broadcast(
        sketch.agg(
            F.map_from_entries(
                F.collect_list(F.struct("word", "bits"))
            ).alias("__bloom")
        )
    )

    def _bit_set(i: int):
        bit = F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits))
        word = (bit / _BLOOM_WORD).cast("long")
        # F.shiftleft only takes a Python-int shift; call_function passes
        # the per-row column through to the SQL shiftleft
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"),
            (bit % _BLOOM_WORD).cast("int"),
        )
        return (
            F.coalesce(F.element_at(F.col("__bloom"), word), F.lit(0))
            .bitwiseAND(mask) != 0
        )

    cond = _bit_set(0)
    for i in range(1, k):
        cond = cond & _bit_set(i)
    return (
        keys.crossJoin(bitmap)
        .withColumn("might_contain", cond)
        .drop("__bloom")
    )


# ---------------------------------------------------------------------------
# HyperLogLog — distinct-count sketch as a DataFrame of registers.
#
# p register bits: item x routes to register xxhash64(x) mod m (m = 2^p) and
# contributes rho = 1 + leading-zero-count of the remaining hash bits; the
# register keeps the MAX rho. Estimate = alpha_m · m² / Σ 2^(-M_j), with the
# standard linear-counting correction when E ≤ 2.5 m and empty registers
# remain. The sketch is m rows, mergeable by register-wise MAX — the shape
# that lets per-day / per-partition sketches roll up without rescanning.
# (Spark's own approx_count_distinct is the JVM-fast production path; this
# keeps the sketch itself a first-class, mergeable DataFrame.)
# ---------------------------------------------------------------------------


def _rho_case(w_col: str, w_bits: int) -> str:
    """SQL CASE computing rho = leading-zero-count(w) + 1 for a ``w_bits``-
    wide value — pure integer comparisons, so any engine agrees exactly
    (log2-based formulations can flip at powers of two)."""
    arms = " ".join(
        f"WHEN {w_col} >= {1 << (w_bits - 1 - z)} THEN {z + 1}"
        for z in range(w_bits)
    )
    return f"CASE {arms} ELSE {w_bits + 1} END"


def hll_build(df: DataFrame, key_col: str, p: int = 6) -> DataFrame:
    """Build the register table: one row per touched register with max rho.

    Registers no item routed to are absent; ``hll_estimate`` zero-fills the
    full m = 2^p grid. Merging sketches = union + register-wise MAX.
    """
    m = 1 << p
    w_bits = 32 - p
    return (
        # 32 hash bits: low p route to a register, the rest feed rho.
        df.select(
            F.pmod(F.xxhash64(F.col(key_col)), F.lit(1 << 32)).alias("__h")
        )
        .select(
            F.pmod(F.col("__h"), F.lit(m)).alias("reg"),
            F.expr(_rho_case(f"(__h div {m})", w_bits)).alias("rho"),
        )
        .groupBy("reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge register tables (any number) by register-wise MAX — the law
    that makes HLL state re-aggregable at any grain without re-scanning
    raw data: max is idempotent, associative, and commutative, so a user
    counted in many partial sketches dedups exactly. Inputs and output
    share hll_build's (reg, rho) schema; estimate with hll_estimate."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("reg").agg(F.max("rho").alias("rho"))


def hll_estimate(spark, sketch: DataFrame, p: int = 6) -> DataFrame:
    """One-row estimate from a register table: raw harmonic-mean estimate
    with the small-range linear-counting correction."""
    m = 1 << p
    alpha = _hll_alpha(m)
    grid = spark.range(m).select(F.col("id").alias("reg"))
    regs = grid.join(F.broadcast(sketch), "reg", "left").select(
        F.coalesce("rho", F.lit(0)).alias("rho")
    )
    return regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("__s"),
        F.sum((F.col("rho") == 0).cast("long")).alias("__v"),
    ).select(
        F.when(
            (F.lit(alpha * m * m) / F.col("__s") <= 2.5 * m)
            & (F.col("__v") > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("__v")),
        )
        .otherwise(F.lit(alpha * m * m) / F.col("__s"))
        .alias("estimate")
    )


def _hll_alpha(m: int) -> float:
    """Standard HLL bias constant alpha_m (Flajolet et al. 2007)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)
