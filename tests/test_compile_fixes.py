"""Regression pins for the round-4 compile.py review findings."""

import pytest
from pyspark.sql import functions as F

from dcspark import DataContractSpecification, ValidationConfig, validate
from dcspark.run_model import ResultEnum


def _run(spark, contract, rows, schema, **cfg):
    df = spark.createDataFrame(rows, schema)
    spec = DataContractSpecification.from_string(contract)
    return validate(spark, spec, {"t": df}, ValidationConfig(**cfg))


def test_both_exclusive_bounds_each_get_their_own_aggregate(spark):
    """exclusiveMinimum AND exclusiveMaximum on one field emitted two
    not_equal checks with the SAME agg_alias — the shared scan kept only
    count(v==lo), so rows equal to the UPPER bound passed every check."""
    contract = """
id: excl
models:
  t:
    fields:
      v: {type: integer, exclusiveMinimum: 0, exclusiveMaximum: 100}
"""
    # rows at the upper bound, none at the lower: the !=100 check must FAIL
    res = _run(spark, contract, [(100,), (50,), (60,)], "v int")
    by_key = {c.key: c for c in res.run.checks}
    assert by_key["t__v__field_not_equal_max"].result == ResultEnum.failed
    assert by_key["t__v__field_not_equal_min"].result == ResultEnum.passed
    # and the mirror case: rows at the lower bound only
    res2 = _run(spark, contract, [(0,), (50,)], "v int")
    by_key2 = {c.key: c for c in res2.run.checks}
    assert by_key2["t__v__field_not_equal_min"].result == ResultEnum.failed
    assert by_key2["t__v__field_not_equal_max"].result == ResultEnum.passed


def test_inclusive_and_exclusive_minimum_coexist(spark):
    """minimum and exclusiveMinimum together: both bounds evaluate against
    their OWN aggregates (the colliding alias read the first bound's)."""
    contract = """
id: both-min
models:
  t:
    fields:
      v: {type: integer, minimum: 10, exclusiveMinimum: 0}
"""
    res = _run(spark, contract, [(5,), (20,)], "v int")
    by_key = {c.key: c for c in res.run.checks}
    # 5 violates minimum 10 but not exclusiveMinimum 0
    assert by_key["t__v__field_minimum"].result == ResultEnum.failed
    assert by_key["t__v__field_minimum_excl"].result == ResultEnum.passed


def test_scoped_bytes_required_keeps_its_filter_alongside_audio(spark):
    """A filtered required-check on the audio payload column must NOT be
    rerouted to the audio pass's UNSCOPED null count: out-of-scope rows
    with NULL bytes are not violations."""
    from dcspark import synth
    from dcspark.audio import synth_snr_oracle

    contract = """
id: scoped-bytes
models:
  t:
    fields:
      clip_id: {type: string, primaryKey: true}
      bytes: {type: bytes, required: true, filter: "split = 'train'"}
      split: {type: string}
    quality:
      - {type: audio, invariant: decode-conformance, snr_db: 30}
"""
    n = 40
    clips = synth.generate_audio_table(spark, n, seed=3, dur_lo=200,
                                       dur_hi=600, num_partitions=4)
    # eval rows get NULL bytes — out of the required-check's scope
    df = clips.select(
        "clip_id", "sr_hz", "dur_ms", "codec",
        F.when(F.col("clip_id").substr(-1, 1).isin("0", "1"), None)
        .otherwise(F.col("bytes")).alias("bytes"),
        F.when(F.col("clip_id").substr(-1, 1).isin("0", "1"), "eval")
        .otherwise("train").alias("split"),
    )
    spec = DataContractSpecification.from_string(contract)
    res = validate(spark, spec, {"t": df},
                   ValidationConfig(audio_snr_fn=synth_snr_oracle(3, 200, 600)))
    req = next(c for c in res.run.checks if "field_required" in c.key and "bytes" in c.key)
    assert req.result == ResultEnum.passed, (req.reason, req.diagnostics)


def test_typo_filter_errors_one_check_not_the_run(spark):
    """An unresolvable filter column must error THAT check (like a missing
    check column does) instead of crashing the shared scan and losing every
    other check's result."""
    contract = """
id: typo-filter
models:
  t:
    fields:
      v: {type: integer, minimum: 0, filter: "staus = 'active'"}
      w: {type: integer, required: true}
"""
    res = _run(spark, contract, [(1, 1), (2, 2)], "v int, w int")
    by_key = {c.key: c for c in res.run.checks}
    bad = by_key["t__v__field_minimum"]
    assert bad.result == ResultEnum.error
    assert "invalid filter" in (bad.reason or "")
    # the rest of the run completed
    assert by_key["t__w__field_required"].result == ResultEnum.passed


def test_filtered_group_rule_must_compile_or_fail_loudly():
    """A filtered rule whose shape cannot compile (group without column,
    or group at field level) must raise at compile time, not vanish with
    its filter."""
    from dcspark.compile import create_checks

    bad_model_level = DataContractSpecification.from_string("""
id: g1
models:
  t:
    fields:
      v: {type: integer}
    quality:
      - {type: group, metric: count, filter: "v > 0", mustBeGreaterThan: 0}
""")
    with pytest.raises(ValueError, match="group"):
        create_checks(bad_model_level)

    bad_field_level = DataContractSpecification.from_string("""
id: g2
models:
  t:
    fields:
      v:
        type: integer
        quality:
          - {type: group, column: v, metric: count, filter: "v > 0",
             mustBeGreaterThan: 0}
""")
    with pytest.raises(ValueError, match="model-level"):
        create_checks(bad_field_level)


def test_scoped_expression_check_carries_filter_in_params():
    from dcspark.compile import create_checks

    spec = DataContractSpecification.from_string("""
id: e1
models:
  t:
    fields:
      v: {type: integer}
    quality:
      - {type: expression, expression: "v >= 0", filter: "v is not null"}
""")
    checks = create_checks(spec)["t"]
    expr = next(c for c in checks if c.check_type == "quality_expression")
    assert expr.params.get("filter") == "v is not null"
    assert "WHERE" in expr.implementation
