"""t-digest quantile sketches (pctl_mode="sketch"): unit accuracy/merge/serde
plus engine integration — flat/partitioned/checkpointed parity, resume without
rescan, and plan-level scan pruning."""

import json
import os

import numpy as np
import pytest

from dcspark import DataContractSpecification, ValidationConfig, validate
from dcspark.run_model import ResultEnum
from dcspark.tdigest import TDigest, collect_digests

RNG = np.random.default_rng(7)


# -- unit: accuracy ----------------------------------------------------------

def _rank_error(values, q, estimate):
    s = np.sort(values)
    return abs(np.searchsorted(s, estimate) / len(s) - q)


@pytest.mark.parametrize("dist", ["uniform", "lognormal", "sorted", "bimodal"])
def test_quantile_rank_error_bounds(dist):
    n = 50_000
    if dist == "uniform":
        v = RNG.uniform(0, 1, n)
    elif dist == "lognormal":
        v = RNG.lognormal(0, 2, n)
    elif dist == "sorted":
        v = np.arange(n, dtype=np.float64)
    else:
        v = np.concatenate([RNG.normal(0, 1, n // 2), RNG.normal(100, 1, n // 2)])
    d = TDigest.of(v, delta=500)
    assert len(d.means) < 1100  # compressed well under 2*delta + slack
    for q, tol in [(0.01, 0.005), (0.25, 0.01), (0.5, 0.01),
                   (0.75, 0.01), (0.9, 0.01), (0.99, 0.005), (0.999, 0.002)]:
        assert _rank_error(v, q, d.quantile(q)) <= tol, (dist, q)


def test_small_inputs_exact():
    # weight-1 centroids -> interpolated order statistics
    d = TDigest.of(np.array([100.0, 200.0, 300.0, 400.0]))
    assert d.quantile(0.0) == 100.0
    assert d.quantile(1.0) == 400.0
    assert d.quantile(0.5) == 250.0
    assert TDigest.of(np.array([])).quantile(0.5) is None
    assert TDigest.of(np.array([42.0])).quantile(0.9) == 42.0
    assert TDigest.of(np.array([np.nan, 7.0, np.nan])).quantile(0.5) == 7.0
    assert TDigest.of(np.full(1000, 3.0)).quantile(0.5) == 3.0


def test_merge_matches_single_digest_accuracy():
    v = RNG.lognormal(0, 1, 60_000)
    parts = np.array_split(v, 7)
    merged = TDigest.merge([TDigest.of(p) for p in parts])
    assert abs(merged.total_weight - len(v)) < 1e-6
    for q in (0.1, 0.5, 0.9, 0.99):
        assert _rank_error(v, q, merged.quantile(q)) <= 0.012, q


def test_merge_deterministic_and_empty():
    v = RNG.uniform(0, 1, 10_000)
    ds = [TDigest.of(p) for p in np.array_split(v, 4)]
    a = TDigest.merge(ds).quantile(0.5)
    b = TDigest.merge(ds).quantile(0.5)
    assert a == b
    assert TDigest.merge([]).quantile(0.5) is None
    assert TDigest.merge([TDigest.of(np.array([])), TDigest.of(np.array([5.0]))]
                         ).quantile(0.5) == 5.0


def test_b64_roundtrip_bit_exact():
    d = TDigest.of(RNG.normal(0, 1, 20_000))
    r = TDigest.from_b64(d.to_b64())
    assert r.delta == d.delta
    assert np.array_equal(r.means, d.means)
    assert np.array_equal(r.weights, d.weights)
    assert r.quantile(0.37) == d.quantile(0.37)


# -- distributed construction ------------------------------------------------

def test_collect_digests_partitioned(spark):
    rows = [(f"c{i}", "a" if i % 2 else "b", float(i)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id string, part string, x double").repartition(6)
    digs = collect_digests(df, ["x"], "part")
    assert set(digs) == {("a", "x"), ("b", "x")}
    assert digs[("a", "x")].total_weight == 1000.0
    glob = TDigest.merge([digs[("a", "x")], digs[("b", "x")]])
    assert _rank_error(np.arange(2000.0), 0.5, glob.quantile(0.5)) <= 0.01


def test_collect_digests_prunes_scan(spark, tmp_path):
    """The digest pass must read ONLY the digest columns (+ partition col) —
    at 10^12 rows an unpruned scan of the payload corpus would dwarf the
    quantile work itself."""
    rows = [(f"c{i}", "p", float(i), bytearray(b"x" * 64)) for i in range(100)]
    df = spark.createDataFrame(rows, "id string, part string, x double, payload binary")
    path = str(tmp_path / "t")
    df.write.parquet(path)
    from dcspark.tdigest import digest_frame

    plan = digest_frame(spark.read.parquet(path), ["x"], "part")._jdf \
        .queryExecution().executedPlan().toString()
    assert "payload" not in plan.split("ReadSchema")[1].splitlines()[0]


# -- engine integration ------------------------------------------------------

CONTRACT = """
id: tdigest-test
models:
  clips:
    fields:
      clip_id: {type: string, required: true, primaryKey: true}
      part: {type: string}
      dur_ms: {type: integer}
    quality:
      - {type: metric, metric: p50, column: dur_ms, mustBeBetween: [240, 260]}
      - {type: metric, metric: p90, column: dur_ms, mustBeLessThanOrEqualTo: 405}
"""


def _clips(spark):
    vals = RNG.integers(100, 401, 600)
    rows = [(f"c{i:04d}", "ab"[i % 2], int(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "clip_id string, part string, dur_ms int"), vals


def _run(spark, df, **cfg):
    spec = DataContractSpecification.from_string(CONTRACT)
    return validate(spark, spec, {"clips": df}, ValidationConfig(pctl_mode="sketch", **cfg))


def test_sketch_mode_flat(spark):
    df, vals = _clips(spark)
    res = _run(spark, df)
    keys = [k for k in res.metrics if "quality_metric" in k]
    assert len(keys) == 2
    p50 = res.metrics[[k for k in keys if k.endswith("_0")][0]]
    assert _rank_error(vals.astype(float), 0.5, p50) <= 0.02
    assert all(c.result == ResultEnum.passed for c in res.run.checks
               if "quality_metric" in c.key)


def test_sketch_mode_partitioned_and_checkpointed_match(spark, tmp_path):
    """Partitioned values come from per-partition digests; the global value
    from their driver merge. The checkpointed run must agree with the plain
    partitioned run exactly (same per-partition digests, same merge order)."""
    df, vals = _clips(spark)
    parted = _run(spark, df, partition_col="part")
    ckpt = _run(spark, df, partition_col="part", checkpoint_dir=str(tmp_path / "ck"))
    keys = [k for k in parted.metrics if "quality_metric" in k]
    for k in keys:
        assert parted.metrics[k] is not None
        assert _rank_error(vals.astype(float), 0.5 if k.endswith("_0") else 0.9,
                           parted.metrics[k]) <= 0.02
        assert ckpt.metrics[k] == parted.metrics[k], k
    # per-partition rows carry digest-derived values
    prow = [r for r in parted.results
            if "quality_metric_0" in r["check_key"] and r["partition_id"] == "a"]
    assert prow and prow[0]["metric_value"] is not None


def test_sketch_resume_identical_without_rescan(spark, tmp_path):
    """Resume loads completed partitions' digests from the manifest (base64)
    and reproduces the global quantile bit-for-bit — the exact-GK mode's
    global rescan has no sketch-mode counterpart."""
    df, _ = _clips(spark)
    ck = str(tmp_path / "ck")
    full = _run(spark, df, partition_col="part", checkpoint_dir=ck)
    manifest = [p for p in os.listdir(ck) if p.endswith(".jsonl")]
    assert manifest
    recs = [json.loads(l) for l in open(os.path.join(ck, manifest[0]))]
    assert all(r.get("pctl_digests", {}).get("dur_ms") for r in recs)
    # resume with data for only ONE partition present: completed partition
    # "b" must come wholly from the manifest
    sub = df.filter(df.part == "a")
    resumed = _run(spark, sub.unionByName(df.filter(df.part == "b")),
                   partition_col="part", checkpoint_dir=ck, resume=True)
    for k in full.metrics:
        if "quality_metric" in k:
            assert resumed.metrics[k] == full.metrics[k], k


def test_exact_mode_unchanged(spark):
    """Default pctl_mode remains the GK path — discrete element semantics."""
    rows = [("c1", "a", 100), ("c2", "a", 200), ("c3", "b", 300),
            ("c4", "b", 400), ("c5", "b", 250)]
    df = spark.createDataFrame(rows, "clip_id string, part string, dur_ms int")
    spec = DataContractSpecification.from_string(CONTRACT)
    res = validate(spark, spec, {"clips": df}, ValidationConfig())
    k0 = [k for k in res.metrics if k.endswith("quality_metric_0")][0]
    assert res.metrics[k0] == 250.0  # an actual element, percentile_approx
