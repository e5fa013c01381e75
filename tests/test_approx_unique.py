"""Approx uniqueness via an HLL sketch folded into the shared scan
(north-star architecture: "approx-distinct via HyperLogLog" in the single
multi-aggregate pass — no key shuffle; sketches union losslessly)."""

import glob
import shutil
import tempfile

from pyspark.sql import functions as F

from dcspark import DataContractSpecification, ValidationConfig, validate
from dcspark.run_model import ResultEnum

CONTRACT = """
id: approx-unique
models:
  t:
    fields:
      clean_id: {type: long, unique: true, primaryKey: true}
      dup_col: {type: long, unique: true}
"""


def _table(spark, n=20000):
    # clean_id unique; dup_col has ~30% duplicate rows (id % (0.7n))
    return spark.range(n).select(
        F.col("id").alias("clean_id"),
        (F.col("id") % int(n * 0.7)).alias("dup_col"),
        (F.col("id") % 8).cast("string").alias("bucket"),
    )


def _cfg(**kw):
    return ValidationConfig(unique_mode="approx", **kw)


def test_approx_unique_detects_dup_mass(spark):
    spec = DataContractSpecification.from_string(CONTRACT)
    res = validate(spark, spec, {"t": _table(spark)}, _cfg())
    by_key = {c.key: c for c in res.run.checks}
    clean = by_key["t__clean_id__field_unique"]
    dup = by_key["t__dup_col__field_unique"]
    assert clean.result == ResultEnum.passed
    assert clean.diagnostics["approx"] is True
    assert dup.result == ResultEnum.failed
    # ~6000 duplicate rows, estimate within HLL noise of truth
    assert abs(res.metrics["t__dup_col__field_unique"] - 6000) < 600


def test_approx_unique_partitioned_matches_global(spark):
    """Per-partition sketches union losslessly: the partitioned run's global
    estimate is IDENTICAL to the unpartitioned run's."""
    spec = DataContractSpecification.from_string(CONTRACT)
    t = _table(spark)
    flat = validate(spark, spec, {"t": t}, _cfg())
    parted = validate(spark, spec, {"t": t}, _cfg(partition_col="bucket"))
    assert parted.metrics["t__dup_col__field_unique"] == flat.metrics["t__dup_col__field_unique"]
    # per-partition rows recorded for the unique check too
    rows = [r for r in parted.results
            if r["check_key"] == "t__dup_col__field_unique" and r["partition_id"]]
    assert len(rows) == 8 and all(r["result"] == "failed" for r in rows)


def test_approx_unique_checkpoint_resume_identical(spark):
    """HLL sketches round-trip through the manifest (base64) so resume merges
    done-partition sketches with fresh ones to the same global estimate."""
    spec = DataContractSpecification.from_string(CONTRACT)
    t = _table(spark)
    tmp = tempfile.mkdtemp()
    try:
        full = validate(spark, spec, {"t": t}, _cfg(
            partition_col="bucket", checkpoint_dir=tmp + "/full", checkpoint_chunks=4))
        part = validate(spark, spec, {"t": t}, _cfg(
            partition_col="bucket", checkpoint_dir=tmp + "/part", checkpoint_chunks=4))
        manifest = glob.glob(tmp + "/part/manifest__*t.jsonl")[0]
        lines = open(manifest).readlines()
        with open(manifest, "w") as f:
            f.writelines(lines[: len(lines) // 2])
        resumed = validate(spark, spec, {"t": t}, _cfg(
            partition_col="bucket", checkpoint_dir=tmp + "/part",
            checkpoint_chunks=4, resume=True))
        assert resumed.metrics == full.metrics == part.metrics
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_approx_unique_adds_no_shuffle_to_scan(spark):
    """The HLL aggregate rides the shared single-Exchange aggregation — approx
    mode must not reintroduce a key shuffle."""
    df = _table(spark)
    agg = df.agg(
        F.count(F.lit(1)),
        F.sum(F.when(F.col("dup_col").isNull(), 1).otherwise(0)),
        F.hll_sketch_agg("dup_col", 14),
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1 and "SinglePartition" in plan


def test_unique_check_under_extreme_skew(spark):
    """One hot key carrying half the table (the 10^12-row nightmare case):
    both uniqueness strategies stay correct — exact via map-side partial
    aggregation (the hot key reaches the reducer as one row per input
    partition), approx via the HLL sketch (no key shuffle at all)."""
    from dcspark import DataContractSpecification, ValidationConfig, validate

    n = 100_000
    skewed = spark.range(n).select(
        F.when(F.col("id") < n // 2, F.lit("HOT"))
        .otherwise(F.col("id").cast("string")).alias("k").alias("clean_id"),
    ).withColumnRenamed("clean_id", "dup_col").withColumn(
        "clean_id", F.monotonically_increasing_id())
    spec = DataContractSpecification.from_string(CONTRACT)

    exact = validate(spark, spec, {"t": skewed}, ValidationConfig())
    # exact: duplicate VALUES with freq>1 -> just the one hot key
    assert exact.metrics["t__dup_col__field_unique"] == 1.0

    approx = validate(spark, spec, {"t": skewed}, ValidationConfig(unique_mode="approx"))
    # approx: estimated duplicate ROWS ~ n/2 (one value repeated 50k times)
    est = approx.metrics["t__dup_col__field_unique"]
    assert abs(est - (n // 2 - 1)) < n * 0.05
