"""Pre-flight sampled validation: deterministic keyed-hash sample, honest
reporting (raw sample counts, disclosure in reason + diagnostics), violations
reproduce across runs at a fixed seed."""

import pytest
from pyspark.sql import functions as F

from dcspark import DataContractSpecification, ValidationConfig, validate
from dcspark.run_model import ResultEnum

CONTRACT = """
dataContractSpecification: 1.1.0
id: sampled
info: {title: sampled, version: 1.0.0}
models:
  m:
    fields:
      id: {type: bigint, required: true, primaryKey: true}
      v: {type: double, minimum: 0}
"""

N = 20000


def _spec():
    return DataContractSpecification.from_string(CONTRACT)


def _table(spark, bad_every=None):
    df = spark.range(N).select(
        F.col("id"),
        (F.col("id") % 101).cast("double").alias("v"),
    )
    if bad_every:
        df = df.withColumn(
            "v",
            F.when(F.col("id") % bad_every == 0, F.lit(-1.0)).otherwise(F.col("v")),
        )
    return df


def _run(spark, df, **cfg):
    return validate(spark, _spec(), {"m": df}, ValidationConfig(**cfg))


def test_sample_is_deterministic_and_sized(spark):
    df = _table(spark)
    r1 = _run(spark, df, sample_fraction=0.1)
    r2 = _run(spark, df, sample_fraction=0.1)
    by1 = {c.key: c for c in r1.run.checks}
    by2 = {c.key: c for c in r2.run.checks}
    n1 = by1["m__id__field_required"].diagnostics["metric"]
    assert n1 == by2["m__id__field_required"].diagnostics["metric"]  # same panel
    # unbiased draw: sample missing_count is 0 but the row_count diagnostic
    # via a dedicated count — use the required check's scan row count proxy:
    # instead assert the sampled violation count of a planted 1-in-10 defect
    r3 = _run(spark, _table(spark, bad_every=10), sample_fraction=0.1)
    m = {c.key: c for c in r3.run.checks}["m__v__field_minimum"]
    full = N // 10
    assert m.result == ResultEnum.failed
    # ~frac * full violations, binomial 5-sigma band
    est, sd = full * 0.1, (full * 0.1 * 0.9) ** 0.5
    assert abs(m.diagnostics["metric"] - est) < 5 * sd
    assert m.diagnostics["sample_fraction"] == 0.1


def test_different_seed_draws_different_panel(spark):
    df = _table(spark, bad_every=10)
    m0 = {c.key: c for c in _run(spark, df, sample_fraction=0.05).run.checks}
    m1 = {c.key: c for c in _run(spark, df, sample_fraction=0.05,
                                 sample_seed=7).run.checks}
    a = m0["m__v__field_minimum"].diagnostics["metric"]
    b = m1["m__v__field_minimum"].diagnostics["metric"]
    assert a != b  # 2000 Bernoulli draws colliding exactly is ~0


def test_sampled_violations_are_real_rows(spark):
    df = _table(spark, bad_every=10)
    res = _run(spark, df, sample_fraction=0.1)
    ids = [int(r["clip_id"]) for r in res.violations.collect()
           if r["check_key"] == "m__v__field_minimum"]
    assert ids and all(i % 10 == 0 for i in ids)  # every one is a true defect


def test_pass_reason_discloses_sampling(spark):
    res = _run(spark, _table(spark), sample_fraction=0.1)
    by = {c.key: c for c in res.run.checks}
    chk = by["m__v__field_minimum"]
    assert chk.result == ResultEnum.passed
    assert "sample" in (chk.reason or "")
    assert any("SAMPLED validation" in l.message for l in res.run.logs)
    # full runs stay pristine: no sampling annotations
    full = _run(spark, _table(spark))
    fchk = {c.key: c for c in full.run.checks}["m__v__field_minimum"]
    assert fchk.reason is None
    assert "sample_fraction" not in (fchk.diagnostics or {})


def test_history_checks_skip_under_sampling(spark, tmp_path):
    # a sampled run must neither judge against nor feed the full-run series
    contract = CONTRACT + """
    quality:
      - type: history
        watch: row_count
        method: change
        window: 5
        threshold: 10
"""
    spec = DataContractSpecification.from_string(contract)
    res = validate(spark, spec, {"m": _table(spark)},
                   ValidationConfig(sample_fraction=0.1,
                                    history_path=str(tmp_path / "none")))
    chk = [c for c in res.run.checks if c.type == "quality_history"]
    assert chk and chk[0].result == ResultEnum.passed
    assert "skipped: sampled run" in chk[0].reason


def test_invalid_fraction_raises(spark):
    with pytest.raises(ValueError):
        _run(spark, _table(spark), sample_fraction=1.5)
    with pytest.raises(ValueError):
        _run(spark, _table(spark), sample_fraction=0.0)
