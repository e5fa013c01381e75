"""Aggregate-metric (``type: metric``) and row-expression
(``type: expression``) quality rules — engine extensions beyond the
reference, whose SodaCL passthrough executes row_count only
(data_contract_checks.py:716-738). Metrics are decomposable partials in the
shared scan finished on the driver, so partitioned == flat results."""

import math

from dcspark import DataContractSpecification, ValidationConfig, validate
from dcspark.run_model import ResultEnum

CONTRACT = """
id: metric-test
models:
  clips:
    fields:
      clip_id: {type: string, required: true, primaryKey: true}
      part: {type: string}
      dur_ms: {type: integer}
      sr_hz: {type: integer}
    quality:
      - {type: metric, metric: avg, column: dur_ms, mustBeBetween: [200, 300],
         description: mean duration in range}
      - {type: metric, metric: stddev, column: dur_ms, mustBeLessThan: 500}
      - {type: metric, metric: min, column: dur_ms, mustBeGreaterThanOrEqualTo: 0}
      - {type: metric, metric: max, column: dur_ms, mustBeLessThanOrEqualTo: 100,
         description: deliberately failing max}
      - {type: metric, metric: count, column: sr_hz, mustBe: 5}
      - {type: metric, metric: sum, column: dur_ms, mustBeGreaterThan: 1}
      - {type: expression, expression: "dur_ms >= 0 AND sr_hz IN (8000, 16000)",
         description: cross-column invariant}
      - {type: metric, metric: median, column: dur_ms, mustBe: 1,
         description: unsupported metric name}
      - {type: metric, metric: p50, column: dur_ms, mustBe: 250,
         description: median duration via quantile sketch}
      - {type: metric, metric: p90, column: dur_ms, mustBeLessThanOrEqualTo: 400}
"""

#        clip part dur    sr
ROWS = [
    ("c1", "a", 100, 8000),
    ("c2", "a", 200, 16000),
    ("c3", "b", 300, 8000),
    ("c4", "b", 400, 44100),   # expression violation (sr not in enum)
    ("c5", "b", 250, 16000),
    ("c6", "a", None, None),   # nulls: excluded from metrics, pass expression
]
SCHEMA = "clip_id string, part string, dur_ms int, sr_hz int"
DURS = [100, 200, 300, 400, 250]


def _run(spark, **cfg):
    df = spark.createDataFrame(ROWS, SCHEMA)
    spec = DataContractSpecification.from_string(CONTRACT)
    return validate(spark, spec, {"clips": df}, ValidationConfig(**cfg))


def test_metric_checks_values_and_results(spark):
    res = _run(spark)
    by_key = {c.key: c for c in res.run.checks}
    m = res.metrics
    assert m["clips__quality_metric_0"] == sum(DURS) / len(DURS)  # avg 250
    assert abs(m["clips__quality_metric_1"]
               - math.sqrt(sum((d - 250) ** 2 for d in DURS) / 4)) < 1e-9
    assert m["clips__quality_metric_2"] == 100.0
    assert m["clips__quality_metric_3"] == 400.0
    assert m["clips__quality_metric_4"] == 5.0
    assert m["clips__quality_metric_5"] == float(sum(DURS))
    assert by_key["clips__quality_metric_0"].result == ResultEnum.passed
    assert by_key["clips__quality_metric_3"].result == ResultEnum.failed
    assert by_key["clips__quality_metric_4"].result == ResultEnum.passed
    # unsupported metric name degrades to a warning, never an error/scan
    assert by_key["clips__quality_metric_7"].result == ResultEnum.warning


def test_expression_check_null_semantics_and_violations(spark):
    res = _run(spark)
    by_key = {c.key: c for c in res.run.checks}
    # c4 violates; c6 (nulls -> expression NULL) passes per SQL CHECK semantics
    assert res.metrics["clips__quality_expression_6"] == 1.0
    assert by_key["clips__quality_expression_6"].result == ResultEnum.failed
    vio = [r for r in res.violations.collect()
           if r["check_key"] == "clips__quality_expression_6"]
    assert [r["clip_id"] for r in vio] == ["c4"]


def test_percentile_metric_values(spark):
    res = _run(spark)
    by_key = {c.key: c for c in res.run.checks}
    assert res.metrics["clips__quality_metric_8"] == 250.0   # p50 of DURS
    assert res.metrics["clips__quality_metric_9"] == 400.0   # p90 of DURS
    assert by_key["clips__quality_metric_8"].result == ResultEnum.passed
    assert by_key["clips__quality_metric_9"].result == ResultEnum.passed


def test_percentile_partitioned_equals_flat(spark, tmp_path):
    """Quantile sketches are NOT driver-mergeable (unlike sum/count partials),
    so partitioned runs recompute the global percentile in a dedicated
    column-pruned pass — the global value must equal the flat run, never a
    merge-of-partition-percentiles (and never None). Covers both the plain
    partitioned path and the checkpoint-manifest path."""
    flat = _run(spark)
    parted = _run(spark, partition_col="part")
    ckpt = _run(spark, partition_col="part", checkpoint_dir=str(tmp_path))
    for key in ("clips__quality_metric_8", "clips__quality_metric_9"):
        assert parted.metrics[key] == flat.metrics[key], key
        assert ckpt.metrics[key] == flat.metrics[key], key
    # per-partition rows carry the partition-exact percentile
    rows = [r for r in parted.results
            if r["check_key"] == "clips__quality_metric_8"
            and r["partition_id"] == "a"]
    # percentile_approx is discrete (returns an actual element, no
    # interpolation): p50 of (100, 200) is 100
    assert rows and rows[0]["metric_value"] == 100.0


def test_metric_checks_partitioned_equals_flat(spark):
    """avg/stddev finish from merged sum/count/sumsq partials — the global
    value in partitioned mode must equal the flat run exactly (no
    average-of-averages)."""
    flat = _run(spark)
    parted = _run(spark, partition_col="part")
    for key in [f"clips__quality_metric_{i}" for i in range(6)]:
        assert parted.metrics[key] == flat.metrics[key], key
    # per-partition rows exist and are self-consistent for avg
    part_rows = [r for r in parted.results
                 if r["check_key"] == "clips__quality_metric_0"
                 and r["partition_id"] == "a"]
    assert part_rows and part_rows[0]["metric_value"] == 150.0  # (100+200)/2


def test_field_level_metric_defaults_to_field_column(spark):
    contract = """
id: metric-field
models:
  clips:
    fields:
      clip_id: {type: string, primaryKey: true}
      dur_ms:
        type: integer
        quality:
          - {type: metric, metric: avg, mustBeLessThan: 1000}
"""
    import pyspark.sql  # noqa: F401
    df = spark.createDataFrame(ROWS, SCHEMA)
    spec = DataContractSpecification.from_string(contract)
    res = validate(spark, spec, {"clips": df}, ValidationConfig())
    assert res.metrics["clips__dur_ms__quality_metric_0"] == 250.0


GROUP_CONTRACT = """
id: group-test
models:
  clips:
    fields:
      clip_id: {type: string, primaryKey: true}
    quality:
      - {type: group, column: part, metric: count, mustBeGreaterThanOrEqualTo: 3}
      - {type: group, column: part, metric: avg, over: dur_ms, mustBeLessThan: 300,
         description: per-part mean duration bound}
      - {type: group, column: part, metric: max, over: dur_ms, mustBeLessThanOrEqualTo: 1000}
      - {type: group, column: part, metric: sum, mustBe: 1, description: missing over column}
"""


def test_group_checks_threshold_per_group(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    spec = DataContractSpecification.from_string(GROUP_CONTRACT)
    res = validate(spark, spec, {"clips": df}, ValidationConfig())
    by_key = {c.key: c for c in res.run.checks}
    # count >= 3 per part: a has 3 rows, b has 3 rows -> pass
    assert by_key["clips__quality_group_0"].result == ResultEnum.passed
    # avg(dur_ms) < 300: part b avg = 316.67 -> one violating group
    assert res.metrics["clips__quality_group_1"] == 1.0
    assert by_key["clips__quality_group_1"].result == ResultEnum.failed
    assert by_key["clips__quality_group_2"].result == ResultEnum.passed
    # sum without `over` degrades to an error check, never a scan crash
    assert by_key["clips__quality_group_3"].result == ResultEnum.error
    vio = [r for r in res.violations.collect()
           if r["check_key"] == "clips__quality_group_1"]
    assert len(vio) == 1 and vio[0]["clip_id"] == "b"
    assert vio[0]["observed"].startswith("avg=316.66")


def test_group_check_missing_column_errors(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    contract = GROUP_CONTRACT.replace("column: part", "column: nope")
    spec = DataContractSpecification.from_string(contract)
    res = validate(spark, spec, {"clips": df}, ValidationConfig())
    by_key = {c.key: c for c in res.run.checks}
    assert by_key["clips__quality_group_0"].result == ResultEnum.error
