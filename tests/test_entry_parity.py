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


def test_ivf_single_cell_equals_bruteforce(spark):
    """With one cell and nprobe=1 IVF degenerates to an exact scan — its top-k
    must equal brute-force cosine top-k exactly."""
    from dcspark import simsearch

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    ids = [0, 3, 7]
    exact = sorted(tuple(r) for r in simsearch.cosine_topk(emb, ids, k=5).collect())
    ivf = sorted(tuple(r) for r in
                 simsearch.ivf_topk(emb, ids, dim=dim, k=5, n_cells=1, nprobe=1).collect())
    assert ivf == exact


def test_ivf_cells_partition_corpus(spark):
    """Every corpus vector lands in exactly one of n_cells cells, and multiple
    cells are actually used (the quantizer is not degenerate)."""
    from dcspark import simsearch
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    cents = simsearch.ivf_centroids(8, dim)
    cells = emb.select(
        simsearch.cell_expr(F.col("embedding").cast("array<double>"), cents).alias("cell")
    )
    counts = {r["cell"]: r["count"] for r in cells.groupBy("cell").count().collect()}
    assert sum(counts.values()) == emb.count()
    assert all(1 <= c <= 8 for c in counts)
    assert len(counts) >= 2


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


def test_audio_fp_near_dup_deterministic_rows(spark):
    rows = entry_mod.queries()["audio_fp_near_dup"](spark, SF).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in rows}
    assert pairs == {("chirp_a", "chirp_b"), ("clip_000", "dup_gain"),
                     ("clip_001", "dup_noise")}


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
