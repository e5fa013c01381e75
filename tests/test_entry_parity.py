"""Self-check of the driver surface: every __spark_entry__ query vs its DuckDB
oracle at sf0.001 (the driver's own harness runs sf0.01 with a value-hash;
this test mirrors it with multiset row comparison + float tolerance)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, int):
        return float(v) if False else v
    return v


def _rows_to_multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    )


SQL_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("key", SQL_KEYS)
def test_query_matches_oracle(spark, duck, key):
    q = entry_mod.queries()[key]
    sdf = q(spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entry_mod.oracle_sql()[key])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{key}: column mismatch {scols} vs {dcols}"
    sms = _rows_to_multiset(srows, scols)
    dms = _rows_to_multiset(drows, dcols)
    assert len(sms) == len(dms), f"{key}: row count {len(sms)} vs {len(dms)}"
    mismatches = [(a, b) for a, b in zip(sms, dms) if a != b]
    assert not mismatches, f"{key}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert df.schema.fieldNames()


def test_audio_queries_deterministic_rows(spark):
    out = entry_mod.queries()["audio_decode_conformance"](spark, SF).collect()
    assert len(out) == 1
    row = out[0].asDict()
    assert row["rows"] == 240
    # corruption fractions are fixed -> these counters are stable
    assert row["violations"] > 0
    assert row["violations"] <= row["rows"]


def test_contract_full_run_shape(spark):
    df = entry_mod.queries()["contract_full_run"](spark, SF)
    rows = df.collect()
    results = {r["check_key"]: r["result"] for r in rows}
    # corrupted fixture must fail these specific checks
    for k in [
        "audio_clips__transcript__field_required",
        "audio_clips__clip_id__field_unique",
        "audio_clips__sr_hz__field_enum",
        "audio_clips__dur_ms__field_maximum",
        "audio_clips__clip_id__field_regex",
        "audio_clips__clip_id__field_reference",
        "audio_clips__audio_decode_conformance",
    ]:
        assert results.get(k) == "failed", (k, results.get(k))
