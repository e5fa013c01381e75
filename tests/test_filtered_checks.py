"""Per-check `filter:` row scoping + composite primary-key checks.

Scoped semantics under test: a FALSE or NULL filter puts the row out of scope
for the rule (SodaCL filter analog) — metric aggregates, expression
invariants, group thresholds, field constraints, uniqueness, and referential
integrity all honor it; violations are emitted only for in-scope rows.
Composite `primaryKey: [a, b]`: NULL-component count rides the shared scan,
tuple uniqueness is an exact groupBy job even under unique_mode=approx.
"""

import pytest
from pyspark.sql import functions as F

from dcspark import DataContractSpecification, ValidationConfig, validate
from dcspark.run_model import ResultEnum

CONTRACT = """
dataContractSpecification: 1.1.0
id: filtered
info: {title: filtered, version: 1.0.0}
models:
  t:
    primaryKey: [a, b]
    fields:
      a: {type: bigint}
      b: {type: string}
      status: {type: string}
      v:
        type: double
        minimum: 0
        filter: "status = 'active'"
      code:
        type: string
        unique: true
        filter: "status = 'active'"
      ref_id:
        type: bigint
        references: parent.pid
        filter: "status = 'active'"
    quality:
      - type: metric
        metric: avg
        column: v
        filter: "status = 'active'"
        mustBeLessThanOrEqualTo: 100
      - type: expression
        expression: "v >= 0"
        filter: "status = 'active'"
      - type: group
        column: status
        metric: count
        filter: "v IS NOT NULL"
        mustBeGreaterThanOrEqualTo: 1
  parent:
    fields:
      pid: {type: bigint, required: true}
"""


def _spec():
    return DataContractSpecification.from_string(CONTRACT)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "a long, b string, status string, v double, code string, ref_id long"
    )


def _parent(spark):
    return spark.createDataFrame([(i,) for i in range(10)], "pid long")


def _by_key(run):
    return {c.key: c for c in run.checks}


GOOD = [
    # in-scope rows: clean
    (1, "x", "active", 5.0, "c1", 1),
    (2, "x", "active", 7.0, "c2", 2),
    # out-of-scope rows carrying every violation the filters must ignore:
    # negative v, duplicate code, orphan ref_id
    (3, "x", "inactive", -9.0, "dup", 999),
    (4, "x", "inactive", -1.0, "dup", 998),
]


def test_out_of_scope_violations_ignored(spark):
    res = validate(spark, _spec(),
                   {"t": _mk(spark, GOOD), "parent": _parent(spark)},
                   ValidationConfig())
    by = _by_key(res.run)
    assert by["t__v__field_minimum"].result == ResultEnum.passed
    assert by["t__code__field_unique"].result == ResultEnum.passed
    assert by["t__ref_id__field_reference"].result == ResultEnum.passed
    assert by["t__quality_expression_1"].result == ResultEnum.passed
    # scoped avg(v) over active rows only: (5+7)/2 = 6, not (5+7-9-1)/4
    m = by["t__quality_metric_0"]
    assert m.result == ResultEnum.passed and m.diagnostics["metric"] == pytest.approx(6.0)
    assert by["t__composite_key_null"].result == ResultEnum.passed
    assert by["t__composite_key_unique"].result == ResultEnum.passed
    assert res.run.result == ResultEnum.passed


def test_in_scope_violations_counted(spark):
    rows = GOOD + [
        (5, "x", "active", -3.0, "c1", 777),   # in scope: neg v, dup code, orphan
        (6, "x", "active", -4.0, "c9", 3),     # in scope: neg v
    ]
    res = validate(spark, _spec(),
                   {"t": _mk(spark, rows), "parent": _parent(spark)},
                   ValidationConfig())
    by = {c.key: c for c in res.run.checks}
    assert by["t__v__field_minimum"].diagnostics["metric"] == 2
    assert by["t__quality_expression_1"].diagnostics["metric"] == 2
    assert by["t__code__field_unique"].diagnostics["metric"] == 1      # c1 duplicated in scope
    assert by["t__ref_id__field_reference"].diagnostics["metric"] == 1  # 777 only; 999/998 out
    # violation rows only for in-scope rows
    vio = {(r["check_key"], r["clip_id"]) for r in res.violations.collect()}
    assert ("t__v__field_minimum", "5") in vio
    assert all(cid not in ("3", "4") for k, cid in vio
               if k == "t__v__field_minimum")


def test_null_filter_column_is_out_of_scope(spark):
    rows = [(1, "x", None, -5.0, "c1", 1)]
    res = validate(spark, _spec(),
                   {"t": _mk(spark, rows), "parent": _parent(spark)},
                   ValidationConfig())
    by = {c.key: c for c in res.run.checks}
    assert by["t__v__field_minimum"].result == ResultEnum.passed
    assert by["t__quality_expression_1"].result == ResultEnum.passed


def test_composite_key_duplicates_and_nulls(spark):
    rows = GOOD + [
        (1, "x", "active", 1.0, "k1", 1),      # duplicate (1, x)
        (None, "x", "active", 1.0, "k2", 1),   # NULL component
        (7, None, "active", 1.0, "k3", 1),     # NULL component
    ]
    res = validate(spark, _spec(),
                   {"t": _mk(spark, rows), "parent": _parent(spark)},
                   ValidationConfig())
    by = {c.key: c for c in res.run.checks}
    assert by["t__composite_key_null"].diagnostics["metric"] == 2
    assert by["t__composite_key_unique"].diagnostics["metric"] == 1
    vio = [r for r in res.violations.collect()
           if r["check_key"] == "t__composite_key_unique"]
    assert len(vio) == 1 and vio[0]["clip_id"] == "1|x"


def test_composite_unique_stays_exact_under_approx_mode(spark):
    rows = GOOD + [(1, "x", "active", 1.0, "k1", 1)]
    res = validate(spark, _spec(),
                   {"t": _mk(spark, rows), "parent": _parent(spark)},
                   ValidationConfig(unique_mode="approx"))
    by = {c.key: c for c in res.run.checks}
    chk = by["t__composite_key_unique"]
    assert chk.result == ResultEnum.failed and chk.diagnostics["metric"] == 1
    # the filtered field unique also keeps the exact path (can't ride the
    # unscoped shared-scan sketch)
    assert by["t__code__field_unique"].result == ResultEnum.passed


def test_group_filter_scopes_groups(spark):
    # without the filter the all-NULL-v group would violate count >= 1 with
    # metric count(v)=0; with `filter: v IS NOT NULL` the group vanishes
    rows = [
        (1, "x", "a1", 1.0, "c1", 1),
        (2, "x", "ghost", None, "c2", 2),
    ]
    res = validate(spark, _spec(),
                   {"t": _mk(spark, rows), "parent": _parent(spark)},
                   ValidationConfig())
    by = {c.key: c for c in res.run.checks}
    assert by["t__quality_group_2"].result == ResultEnum.passed


def test_filtered_percentile_keeps_gk_path_in_sketch_mode(spark):
    # the t-digest pass reads the raw column; a scoped pNN must therefore
    # stay on the GK path (which honors the filter) even under sketch mode
    contract = """
dataContractSpecification: 1.1.0
id: p
info: {title: p, version: 1.0.0}
models:
  t:
    fields:
      id: {type: bigint}
      status: {type: string}
      v: {type: double}
    quality:
      - type: metric
        metric: p50
        column: v
        filter: "status = 'active'"
        mustBeBetween: [89, 91]
"""
    spec = DataContractSpecification.from_string(contract)
    rows = ([(i, "active", 90.0) for i in range(50)]
            + [(i + 50, "inactive", 1000.0) for i in range(50)])
    df = spark.createDataFrame(rows, "id long, status string, v double")
    for mode in ("exact", "sketch"):
        res = validate(spark, spec, {"t": df},
                       ValidationConfig(pctl_mode=mode))
        chk = {c.key: c for c in res.run.checks}["t__quality_metric_0"]
        assert chk.result == ResultEnum.passed, (mode, chk.reason)
        assert chk.diagnostics["metric"] == pytest.approx(90.0)


DATASET_CONTRACT = """
dataContractSpecification: 1.1.0
id: ds
info: {title: ds, version: 1.0.0}
models:
  t:
    filter: "ingest_date = '2026-08-20'"
    fields:
      id: {type: bigint, primaryKey: true}
      ingest_date: {type: string}
      v: {type: double, minimum: 0}
    quality:
      - type: metric
        metric: count
        column: id
        mustBe: 2
"""


def test_model_dataset_filter_scopes_everything(spark):
    spec = DataContractSpecification.from_string(DATASET_CONTRACT)
    rows = [
        (1, "2026-08-20", 1.0),
        (2, "2026-08-20", 2.0),
        (3, "2026-08-19", -5.0),   # out of slice: violation invisible
        (4, "2026-08-19", -6.0),
    ]
    df = spark.createDataFrame(rows, "id long, ingest_date string, v double")
    res = validate(spark, spec, {"t": df}, ValidationConfig())
    by = {c.key: c for c in res.run.checks}
    assert by["t__v__field_minimum"].result == ResultEnum.passed
    assert by["t__quality_metric_0"].result == ResultEnum.passed  # count==2
    assert res.run.result == ResultEnum.passed
    assert any("dataset filter" in l.message for l in res.run.logs)


def test_cli_where_ands_with_model_filter(spark):
    spec = DataContractSpecification.from_string(DATASET_CONTRACT)
    rows = [
        (1, "2026-08-20", 1.0),
        (2, "2026-08-20", -2.0),   # in slice, violating
    ]
    df = spark.createDataFrame(rows, "id long, ingest_date string, v double")
    res = validate(spark, spec, {"t": df},
                   ValidationConfig(model_where={"t": "id = 1"}))
    by = {c.key: c for c in res.run.checks}
    # the --where AND the model filter: id=2's violation is out of scope,
    # but the count==2 metric now fails (slice has 1 row) — scoping is real
    assert by["t__v__field_minimum"].result == ResultEnum.passed
    assert by["t__quality_metric_0"].result == ResultEnum.failed


def test_element_constraints_honor_field_filter(spark):
    # review finding: element checks appended after the scoping loop were
    # silently escaping a field's `filter:`
    contract = """
dataContractSpecification: 1.1.0
id: el
info: {title: el, version: 1.0.0}
models:
  t:
    fields:
      status: {type: string}
      tags:
        type: array
        filter: "status = 'active'"
        items: {type: string, maxLength: 3}
"""
    spec = DataContractSpecification.from_string(contract)
    rows = [("active", ["ok"]), ("inactive", ["waytoolong"])]
    df = spark.createDataFrame(rows, "status string, tags array<string>")
    res = validate(spark, spec, {"t": df}, ValidationConfig())
    elem = [c for c in res.run.checks if "[items]" in (c.key or "")]
    assert elem and all(c.result == ResultEnum.passed for c in elem)
    rows2 = [("active", ["waytoolong"])]
    res2 = validate(spark, spec,
                    {"t": spark.createDataFrame(rows2, df.schema)},
                    ValidationConfig())
    elem2 = [c for c in res2.run.checks if "[items]" in (c.key or "")]
    assert any(c.result == ResultEnum.failed for c in elem2)


def test_cli_where_rejects_unknown_model():
    import argparse

    from dcspark.cli import _resolve_where

    spec = DataContractSpecification.from_string(DATASET_CONTRACT)
    args = argparse.Namespace(where="v > 0", model="typo")
    with pytest.raises(SystemExit, match="not in the contract"):
        _resolve_where(args, spec)


def test_filter_on_unsupported_quality_type_fails_compile():
    from dcspark.compile import create_checks

    contract = """
dataContractSpecification: 1.1.0
id: bad
info: {title: bad, version: 1.0.0}
models:
  t:
    fields:
      v: {type: double}
    quality:
      - type: drift
        method: ks
        column: v
        filter: "v > 0"
"""
    spec = DataContractSpecification.from_string(contract)
    with pytest.raises(ValueError, match="does not support 'filter:'"):
        create_checks(spec)


def test_missing_pk_column_is_error_not_crash(spark):
    df = spark.createDataFrame([(1, "s", 1.0, "c", 1)],
                               "a long, status string, v double, code string, ref_id long")
    res = validate(spark, _spec(), {"t": df, "parent": _parent(spark)},
                   ValidationConfig())
    by = {c.key: c for c in res.run.checks}
    assert by["t__composite_key_unique"].result == ResultEnum.error
    assert by["t__composite_key_null"].result == ResultEnum.error
