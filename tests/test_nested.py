"""Nested-field (dotted-path) constraints through the full engine — exceeds
the reference, whose native check engine is top-level-only
(data_contract_checks.py:31-63; nested reaches only its jsonschema engine)."""

from pyspark.sql import functions as F

from dcspark import DataContractSpecification, ValidationConfig, validate
from dcspark.run_model import ResultEnum

CONTRACT = """
id: nested-test
models:
  clips:
    fields:
      clip_id: {type: string, required: true, primaryKey: true}
      meta:
        type: struct
        required: true
        fields:
          sr: {type: integer, required: true, enum: [8000, 16000]}
          codec: {type: string, pattern: "^pcm_"}
          inner:
            type: struct
            fields:
              depth: {type: integer, minimum: 0}
"""

ROWS = [
    ("c1", (16000, "pcm_s16le", (1,))),
    ("c2", (8000, "pcm_s16le", (0,))),
    ("c3", (44100, "mp3", (-2,))),      # enum + pattern + minimum violations
    ("c4", (None, "pcm_f32", (3,))),    # nested required violation
]
SCHEMA = ("clip_id string, meta struct<sr:int, codec:string, "
          "inner:struct<depth:int>>")


def _run(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    spec = DataContractSpecification.from_string(CONTRACT)
    return validate(spark, spec, {"clips": df}, ValidationConfig())


def test_nested_checks_detect_violations(spark):
    res = _run(spark)
    by_key = {c.key: c for c in res.run.checks}
    # dotted-path schema checks pass (fields exist with declared types)
    assert by_key["clips__meta.sr__field_is_present"].result == ResultEnum.passed
    assert by_key["clips__meta.sr__field_type"].result == ResultEnum.passed
    assert by_key["clips__meta.inner.depth__field_is_present"].result == ResultEnum.passed
    # dotted-path data checks fire on the violating rows
    assert by_key["clips__meta.sr__field_enum"].result == ResultEnum.failed
    assert res.metrics["clips__meta.sr__field_enum"] == 1.0          # c3 only (c4 null)
    assert res.metrics["clips__meta.sr__field_required"] == 1.0      # c4
    assert res.metrics["clips__meta.codec__field_regex"] == 1.0      # c3 ("mp3")
    assert res.metrics["clips__meta.inner.depth__field_minimum"] == 1.0  # c3
    # violations carry the pk and the dotted check key
    vio = {r["check_key"] for r in res.violations.collect()}
    assert "clips__meta.sr__field_enum" in vio
    assert "clips__meta.inner.depth__field_minimum" in vio


def test_nested_missing_column_reports_error(spark):
    df = spark.createDataFrame([("c1",)], "clip_id string")
    spec = DataContractSpecification.from_string(CONTRACT)
    res = validate(spark, spec, {"clips": df}, ValidationConfig())
    by_key = {c.key: c for c in res.run.checks}
    assert by_key["clips__meta.sr__field_is_present"].result == ResultEnum.failed
    assert by_key["clips__meta.sr__field_required"].result == ResultEnum.error


def test_nested_scan_prunes_to_leaves(spark, tmp_path):
    """The shared scan over dotted predicates must read only the referenced
    struct leaves (nested schema pruning), not the whole struct — at 100 TB a
    fat struct with one validated leaf would otherwise inflate the scan."""
    path = str(tmp_path / "nested.parquet")
    spark.createDataFrame(ROWS, SCHEMA).withColumn(
        "fat", F.lit("x" * 10)
    ).write.parquet(path)
    df = spark.read.parquet(path)
    agg = df.agg(
        F.sum(F.when(F.col("meta.sr").isNull(), 1).otherwise(0)),
        F.sum(F.when(F.col("meta.inner.depth") < 0, 1).otherwise(0)),
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "sr" in read_schema and "depth" in read_schema
    assert "codec" not in read_schema and "fat" not in read_schema
