"""Spec presence/validity (ref tests/test_specs_smoke.py:4-14) and agreement
with the runtime schema registry."""

import json
import pathlib

from backtest_crew_datalake_spark.schemas import (
    CANDLE_SCHEMA, CANONICAL_ORDER, PRIMARY_KEY,
)
from backtest_crew_datalake_spark.specs import all_specs, write_specs

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_specs_written_and_parse():
    files = write_specs(REPO / "docs" / "specs")
    assert len(files) == 7
    for p in files:
        spec = json.loads(p.read_text())
        assert spec["version"] == 1


def test_candle_specs_declare_contracts():
    for name, spec in all_specs().items():
        if "levels" in name:
            continue
        assert spec["ts_semantics"] == "bar_end"
        assert spec["range_contract"].startswith("[from, to)")
        assert spec["primary_key"] == PRIMARY_KEY
        assert spec["dedupe_on"] == PRIMARY_KEY
        assert "UTC" in spec["properties"]["ts"]["dtype"]


def test_specs_match_runtime_schema():
    spec = all_specs()["schema_m1.parquet.json"]
    spec_cols = list(spec["properties"].keys())
    # canonical columns all declared, in canonical order first
    assert spec_cols[: len(CANONICAL_ORDER)] == CANONICAL_ORDER
    assert set(spec_cols) == {f.name for f in CANDLE_SCHEMA.fields}
