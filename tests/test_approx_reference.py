"""Approx referential integrity (``reference_mode="approx"``): parent keys
fold into one Bloom bitset, child membership probes run MAP-ONLY — the
referential analogue of unique_mode="approx"'s HLL (north-star architecture:
the 10^12-row child table must not shuffle for a routine sweep).

Semantics under test: every reported orphan is REAL (blooms have no false
negatives), the probe plan has no join and no child-side exchange before the
orphan aggregation, the budget guard falls back to the exact anti-join, and
the disclosure reaches the run log + diagnostics.
"""

from pyspark.sql import functions as F

from dcspark import DataContractSpecification, ValidationConfig, validate
from dcspark.run_model import ResultEnum

CONTRACT = """
id: approx-ref
models:
  t:
    fields:
      a: {type: string, references: p.k}
  p:
    fields:
      k: {type: string}
"""


def _tables(spark, n_child=5000, n_parent=800, n_orphans=37):
    parent = spark.range(n_parent).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k"))
    child = spark.range(n_child).select(
        F.concat(F.lit("key-"), F.col("id") % n_parent).alias("a"))
    orphans = spark.range(n_orphans).select(
        F.concat(F.lit("orphan-"), F.col("id") % 11).alias("a"))
    return child.unionByName(orphans), parent


def _run(spark, tables, **cfg):
    spec = DataContractSpecification.from_string(CONTRACT)
    return validate(spark, spec, tables, ValidationConfig(**cfg))


def _ref_check(res):
    return next(c for c in res.run.checks if "reference" in c.key)


def test_approx_matches_exact_on_planted_orphans(spark):
    child, parent = _tables(spark)
    exact = _run(spark, {"t": child, "p": parent}, reference_mode="exact")
    approx = _run(spark, {"t": child, "p": parent}, reference_mode="approx")
    ce, ca = _ref_check(exact), _ref_check(approx)
    assert ce.result == ResultEnum.failed
    assert ca.result == ResultEnum.failed
    # deterministic hashing: on this fixture the bloom misses nothing, so
    # the orphan count is identical (37 orphan rows); in general approx is
    # a lower bound within fpp of exact
    assert ca.diagnostics["metric"] == ce.diagnostics["metric"] == 37.0
    assert ca.diagnostics["approx"] is True
    assert 0.0 < ca.diagnostics["bloom_fpp"] < 0.05
    assert any("approx reference mode" in l.message for l in approx.run.logs)
    # violations carry real orphan values only
    vios = [r["observed"] for r in approx.violations.collect()]
    assert vios and all(v.startswith("orphan-") for v in vios)


def test_approx_passes_clean_table_and_is_map_only(spark):
    child, parent = _tables(spark, n_orphans=0)
    res = _run(spark, {"t": child, "p": parent}, reference_mode="approx")
    chk = _ref_check(res)
    assert chk.result == ResultEnum.passed
    assert chk.diagnostics["approx"] is True


def test_probe_plan_has_no_join_and_no_child_exchange(spark):
    """The scale claim, plan-gated: the orphan frame is child scan ->
    JVM hashes -> one Arrow membership pass. No join, no exchange."""
    from dcspark import bloomfilter as bf

    child, parent = _tables(spark)
    m, k, n, bits = bf.build_column_bloom(parent, "k")
    orphans = bf.non_members(child.select(F.col("a")), "a", m, k, bits)
    plan = orphans._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Join" not in plan
    assert "Exchange" not in plan
    # and it finds exactly the planted orphan values
    vals = {r["__child"] for r in orphans.collect()}
    assert vals == {f"orphan-{i}" for i in range(11)}


def test_budget_guard_falls_back_to_exact(spark):
    child, parent = _tables(spark)
    res = _run(spark, {"t": child, "p": parent}, reference_mode="approx",
               reference_bloom_max_bytes=0)
    chk = _ref_check(res)
    assert chk.result == ResultEnum.failed
    assert chk.diagnostics["metric"] == 37.0
    # exact path: no approx diagnostics, and the fallback is disclosed
    assert "approx" not in chk.diagnostics
    assert any("fell back to the exact anti-join" in l.message
               for l in res.run.logs)


def test_per_partition_orphan_attribution(spark):
    """With a partition column, BOTH modes attribute orphan counts to the
    partitions that carry them (the 'which ingest partition went bad'
    answer) and stamp partition_id on the violation rows; clean partitions
    are covered by the global row."""
    parent = spark.range(50).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k"))
    clean = spark.range(200).select(
        F.concat(F.lit("key-"), F.col("id") % 50).alias("a"),
        F.lit("p_good").alias("bucket"))
    dirty = spark.range(8).select(
        F.concat(F.lit("bad-"), F.col("id")).alias("a"),
        F.lit("p_bad").alias("bucket"))
    child = clean.unionByName(dirty)
    for mode in ("exact", "approx"):
        res = _run(spark, {"t": child, "p": parent},
                   reference_mode=mode, partition_col="bucket")
        rows = [r for r in res.results
                if "reference" in r["check_key"]]
        by_pid = {r["partition_id"]: r for r in rows}
        assert by_pid[None]["metric_value"] == 8.0, (mode, by_pid)
        assert by_pid["p_bad"]["metric_value"] == 8.0
        assert "p_good" not in by_pid  # clean partition: global row covers it
        vio_pids = {r["partition_id"] for r in res.violations.filter(
            "check_key like '%reference%'").collect()}
        assert vio_pids == {"p_bad"}, mode


def test_key_type_mismatch_does_not_fabricate_orphans(spark):
    """F.hash/xxhash64 are type-dependent (int32 and int64 hash differently
    under Murmur3): an int-parent / long-child FK pairing — routine when two
    parquet writers disagree on key widths — must NOT report every child row
    as an orphan. The engine casts the child key to the parent key's exact
    type before probing; the exact anti-join coerces implicitly, so both
    modes must agree."""
    parent = spark.range(100).select(F.col("id").cast("int").alias("k"))
    child = spark.range(400).select((F.col("id") % 100).cast("long").alias("a"))
    exact = _run(spark, {"t": child, "p": parent}, reference_mode="exact")
    approx = _run(spark, {"t": child, "p": parent}, reference_mode="approx")
    assert _ref_check(exact).result == ResultEnum.passed
    assert _ref_check(approx).result == ResultEnum.passed
    assert _ref_check(approx).diagnostics["approx"] is True


def test_null_children_are_not_orphans(spark):
    parent = spark.range(4).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    child = spark.createDataFrame(
        [("k0",), ("k1",), (None,), (None,)], "a string")
    res = _run(spark, {"t": child, "p": parent}, reference_mode="approx")
    assert _ref_check(res).result == ResultEnum.passed


def test_approx_malformed_child_keys_record_as_orphans(spark):
    """ADVICE r04: a string child key that cannot cast to the parent key's
    type (long) provably matches no parent key — it must record as an
    orphan, not abort the run with CAST_INVALID_INPUT under ANSI mode."""
    contract = """
id: approx-ref-cast
models:
  t:
    fields:
      a: {type: string, references: p.k}
  p:
    fields:
      k: {type: long}
"""
    parent = spark.range(100).select(F.col("id").alias("k"))
    child = spark.range(500).select((F.col("id") % 100).cast("string").alias("a"))
    bad = spark.createDataFrame(
        [("abc",), ("12x",), (None,)], "a string")
    spec = DataContractSpecification.from_string(contract)
    res = validate(spark, spec, {"t": child.unionByName(bad), "p": parent},
                   ValidationConfig(reference_mode="approx"))
    c = _ref_check(res)
    assert c.result == ResultEnum.failed
    # 'abc' and '12x' are orphans; the NULL key is not (nulls never count)
    assert c.diagnostics["metric"] == 2.0
    assert c.diagnostics["approx"] is True
