"""Generate an N× scale-up of the documents/embeddings corpus for scale
benching (the small testdata SFs verify correctness; this dir verifies that
corpus/ANN query time grows ~linearly and the per-stage scheduling floor
amortizes).

Copy i of a document rotates its token sequence by 17·i positions (a token
bijection): within each copy the near-dup/span structure of the original
corpus is preserved (≈ N× the pairs), while across copies few n-grams
survive, so document-frequency caps keep their bite instead of every
fingerprint becoming N× hot. Copy i of an embedding adds a deterministic
per-copy offset in one dimension — cluster geometry keeps its shape, ids
stay unique.

FACT tables scale N× too (this is how TPC-H itself scales: facts grow,
dims grow slower — here dims stay fixed so every FK remains valid):
copy i of `orders`/`lineitem` offsets the orderkey by i·span (PKs stay
unique, the orders⨝lineitem key relation is preserved per copy); copy i
of `events` offsets event_id and shifts ts by i·(span+1 day), extending
history rather than densifying each day. Dimension tables (region,
nation, customer, supplier, part) are copied verbatim.

Usage: python tools/gen_scale.py [out_dir] [n_copies] [src_sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIMS = ["region", "nation", "customer", "supplier", "part"]


def main():
    from pyspark.sql import functions as F

    from backtest_crew_datalake_spark.session import get_spark

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10"
    n_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="gen_scale")

    d = spark.read.parquet(f"{src}/documents.parquet")
    n_docs = d.agg(F.max("doc_id")).first()[0] + 1
    copies = []
    for i in range(n_copies):
        rot = (17 * i) % 1000
        toks = F.split(F.col("text"), r"\s+")
        rotated = F.when(
            F.size(toks) > rot,
            F.concat_ws(
                " ",
                F.concat(
                    F.slice(toks, rot + 1, F.size(toks) - rot),
                    F.slice(toks, 1, rot),
                ),
            ),
        ).otherwise(F.col("text"))
        copies.append(
            d.select(
                (F.col("doc_id") + F.lit(i * n_docs)).alias("doc_id"),
                (rotated if i else F.col("text")).alias("text"),
                "lang", "source", "n_chars",
            )
        )
    docs = copies[0]
    for c in copies[1:]:
        docs = docs.unionByName(c)
    docs.coalesce(8).write.mode("overwrite").parquet(
        f"{out_dir}/_documents.tmp")
    _single_file(spark, f"{out_dir}/_documents.tmp",
                 f"{out_dir}/documents.parquet")

    e = spark.read.parquet(f"{src}/embeddings.parquet")
    n_vecs = e.agg(F.max("vec_id")).first()[0] + 1
    ecopies = []
    for i in range(n_copies):
        # dimension-0 offset of 0.01·i: preserves cluster shape, keeps ids
        # and vectors distinct across copies
        emb = F.expr(
            f"transform(embedding, (x, j) -> CAST(x + IF(j = 0, "
            f"{0.01 * i}, 0.0) AS FLOAT))"
        )
        ecopies.append(
            e.select(
                (F.col("vec_id") + F.lit(i * n_vecs)).alias("vec_id"),
                emb.alias("embedding"), "label",
            )
        )
    embs = ecopies[0]
    for c in ecopies[1:]:
        embs = embs.unionByName(c)
    embs.coalesce(8).write.mode("overwrite").parquet(
        f"{out_dir}/_embeddings.tmp")
    _single_file(spark, f"{out_dir}/_embeddings.tmp",
                 f"{out_dir}/embeddings.parquet")

    def _ncopies(df, bump):
        """Union n_copies of df, applying {col: per-copy-offset-expr(i)}."""
        parts = []
        for i in range(n_copies):
            c = df
            for col, mk in bump.items():
                c = c.withColumn(col, mk(i))
            parts.append(c)
        out = parts[0]
        for c in parts[1:]:
            out = out.unionByName(c)
        return out

    o = spark.read.parquet(f"{src}/orders.parquet")
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    ok_span = o.agg(F.max("o_orderkey")).first()[0] + 1
    _single(spark, _ncopies(
        o, {"o_orderkey": lambda i: F.col("o_orderkey") + i * ok_span}
    ), out_dir, "orders")
    _single(spark, _ncopies(
        li, {"l_orderkey": lambda i: F.col("l_orderkey") + i * ok_span}
    ), out_dir, "lineitem")

    # events via load(): normalizes the TIMESTAMP(NANOS) physical type the
    # plain vectorized reader rejects; copies extend HISTORY (ts shifted by
    # whole spans) so per-day density — what the window/session operators
    # key on — stays realistic instead of 10x-ing each calendar day
    from backtest_crew_datalake_spark.queries import load

    ev = load(spark, src, "events")
    eid_span = ev.agg(F.max("event_id")).first()[0] + 1
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span_days = (hi - lo).days + 1
    _single(spark, _ncopies(ev, {
        "event_id": lambda i: F.col("event_id") + i * eid_span,
        "ts": lambda i: F.col("ts") + F.expr(f"INTERVAL {i * span_days} DAYS"),
    }), out_dir, "events")

    for t in DIMS:
        shutil.copyfile(f"{src}/{t}.parquet", f"{out_dir}/{t}.parquet")
    print(f"wrote {out_dir}: documents/embeddings/orders/lineitem/events "
          f"x{n_copies}, dims verbatim")


def _single(spark, df, out_dir: str, name: str) -> None:
    tmp = f"{out_dir}/_{name}.tmp"
    df.coalesce(8).write.mode("overwrite").parquet(tmp)
    _single_file(spark, tmp, f"{out_dir}/{name}.parquet")


def _single_file(spark, tmp_dir: str, dest: str) -> None:
    """The testdata layout is one parquet FILE per table (DuckDB views and
    load() read '{t}.parquet' directly), so merge the job output dir into a
    single file via pyarrow and drop the dir.

    row_group_size=65536: a single-file table's scan parallelism is capped
    by its row-group count (Spark assigns a group to the byte-range split
    holding its midpoint — a 6 M-row file at pyarrow's 1 Mi-row default is
    at most a 6-way scan no matter the split size). 64 Ki-row groups keep
    per-group stats useful and let maxPartitionBytes actually fan the scan
    out; a real lake gets the same property from having many files."""
    import pyarrow.parquet as pq

    t = pq.read_table(tmp_dir)
    # Spark's default parquet timestamp encoding is INT96, which pyarrow
    # reads as timestamp[ns] — and a TIMESTAMP(NANOS) column written back
    # is unreadable by Spark 4's vectorized reader (FAILED_READ_FILE.
    # PARQUET_COLUMN_DATA_TYPE_MISMATCH on events.ts). Coerce to micros
    # (lossless here: the values are exact µs multiples).
    pq.write_table(t, dest, compression="zstd", row_group_size=65536,
                   coerce_timestamps="us", allow_truncated_timestamps=True)
    shutil.rmtree(tmp_dir)


if __name__ == "__main__":
    main()
