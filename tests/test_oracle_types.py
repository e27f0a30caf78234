"""Oracle output-type hygiene.

The driver's correctness gate converts DuckDB oracle results through
Arrow/pandas before hashing. DuckDB widens an un-cast integer SUM() to
HUGEINT (int128), which Arrow maps to decimal128 and pandas to float64 —
so an oracle whose FINAL projection carries a bare integer SUM hashes as
``4568.0`` while the Spark side hashes ``4568`` and the driver records a
value mismatch even though both engines computed the same number (this
bit q_doc_bpe_merges in round 5: CORRECTNESS_r05.json, the catalog's
only hash_match=false ever).

This test binds every oracle's LIMIT-0 Arrow schema and fails if any
output column is decimal128 — i.e. forces ``CAST(SUM(..) AS BIGINT)``
(or DOUBLE) in the final projection of every oracle, catalog-wide.
DuckDB runs LIMIT 0 without scanning data, so this is fast.
"""

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_oracle_output_has_no_decimal_columns(name, request):
    sql = entrymod.oracle_sql()[name]
    if "sparkgraft_oracle_bridge" in sql:
        # ORACLE-BRIDGE query: its oracle reads parquet the Spark build
        # materializes (queries/__init__.bridge_write). On a fresh box
        # /tmp is empty, so run the Spark side once to lay the bridge
        # down — the gate protocol always orders build() before SQL.
        from backtest_crew_datalake_spark.queries import BRIDGE_BASE
        import os
        if not os.path.isdir(f"{BRIDGE_BASE}/{name}"):
            spark = request.getfixturevalue("spark")
            entrymod.queries()[name](spark, SF_DIR).collect()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    schema = con.execute(f"SELECT * FROM ({sql}) q LIMIT 0").arrow().schema
    decimal_cols = [
        (f.name, str(f.type)) for f in schema
        if str(f.type).startswith("decimal")
    ]
    assert not decimal_cols, (
        f"{name}: decimal-typed oracle output {decimal_cols} — cast the "
        "aggregate to BIGINT/DOUBLE so the driver's Arrow conversion "
        "hashes the same value Spark produces"
    )
