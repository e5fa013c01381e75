"""Collection-element constraints (array ``items``, map ``keys``/``values``)
through the full engine — exceeds the reference, whose native check engine
never descends into collections (data_contract_checks.py:31-63); element
constraints reach only its per-row jsonschema engine
(export/jsonschema_converter.py:84-102). Here they are vectorized
higher-order-function predicates inside the shared multi-aggregate scan."""

from pyspark.sql import functions as F

from dcspark import DataContractSpecification, ValidationConfig, validate
from dcspark.compile import create_checks
from dcspark.run_model import ResultEnum

CONTRACT = """
id: collection-test
models:
  clips:
    fields:
      clip_id: {type: string, required: true, primaryKey: true}
      gains:
        type: array
        items: {type: double, required: true, minimum: -1, maximum: 1}
      segments:
        type: array
        items:
          type: struct
          fields:
            score: {type: double, minimum: 0}
            tag: {type: string, pattern: "^seg_"}
      attrs:
        type: map
        keys: {type: string, pattern: "^[a-z_]+$"}
        values: {type: string, maxLength: 5}
"""

ROWS = [
    ("c1", [0.5, -0.5], [(0.9, "seg_a")], {"lang": "en"}),
    ("c2", [1.5, 0.0], [(0.1, "seg_b")], {"lang": "de"}),          # gains > max
    ("c3", [0.1, None], [(-0.2, "raw")], {"BAD KEY": "x"}),        # null elem, struct min+pattern, bad key
    ("c4", None, None, {"note": "toolong!"}),                      # null collections skipped
]
SCHEMA = ("clip_id string, gains array<double>, "
          "segments array<struct<score:double, tag:string>>, "
          "attrs map<string,string>")


def _run(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    spec = DataContractSpecification.from_string(CONTRACT)
    return validate(spark, spec, {"clips": df}, ValidationConfig())


def test_compile_emits_collection_checks():
    spec = DataContractSpecification.from_string(CONTRACT)
    checks = create_checks(spec)["clips"]
    kinds = {c.key: c.kind for c in checks}
    # every element rule lands in the shared scan (kind=agg), never a new job
    for key in (
        "clips__gains[items]__items_required",
        "clips__gains[items]__items_minimum",
        "clips__gains[items]__items_maximum",
        "clips__segments[items].score__items_minimum",
        "clips__segments[items].tag__items_regex",
        "clips__attrs[keys]__keys_regex",
        "clips__attrs[values]__values_max_length",
    ):
        assert kinds[key] == "agg", key


def test_collection_checks_detect_violations(spark):
    res = _run(spark)
    by_key = {c.key: c for c in res.run.checks}
    m = res.metrics
    # metric = rows containing >=1 violating element (row-keyed error model)
    assert m["clips__gains[items]__items_maximum"] == 1.0          # c2
    assert m["clips__gains[items]__items_required"] == 1.0         # c3 null elem
    assert m["clips__gains[items]__items_minimum"] == 0.0
    assert m["clips__segments[items].score__items_minimum"] == 1.0  # c3
    assert m["clips__segments[items].tag__items_regex"] == 1.0      # c3 "raw"
    assert m["clips__attrs[keys]__keys_regex"] == 1.0               # c3 "BAD KEY"
    assert m["clips__attrs[values]__values_max_length"] == 1.0      # c4 "toolong!"
    assert by_key["clips__gains[items]__items_maximum"].result == ResultEnum.failed
    assert by_key["clips__gains[items]__items_minimum"].result == ResultEnum.passed
    # violation rows carry the pk and the filtered offending elements
    vio = {r["check_key"]: r for r in res.violations.collect()}
    assert vio["clips__gains[items]__items_maximum"]["clip_id"] == "c2"
    assert "1.5" in vio["clips__gains[items]__items_maximum"]["observed"]
    assert vio["clips__attrs[keys]__keys_regex"]["clip_id"] == "c3"


def test_collection_checks_all_pass_on_clean_data(spark):
    df = spark.createDataFrame([ROWS[0]], SCHEMA)
    spec = DataContractSpecification.from_string(CONTRACT)
    res = validate(spark, spec, {"clips": df}, ValidationConfig())
    assert res.run.result == ResultEnum.passed


def test_collection_scan_has_no_explode(spark):
    """Element predicates must stay higher-order (ArrayExists/ArrayFilter) —
    a Generate/explode would multiply the scan by average array length and
    force a re-aggregation; at 100 TB that's the difference between one pass
    and len(array) passes."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    spec = DataContractSpecification.from_string(CONTRACT)
    checks = create_checks(spec)["clips"]
    aggs = [c.agg_expr().alias(c.agg_alias) for c in checks
            if c.agg_alias and c.agg_expr is not None]
    agg = df.agg(*aggs)
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan and "Explode" not in plan
    # one single aggregate pass over the input, no shuffle of element data
    assert plan.count("HashAggregate") <= 2  # partial + final only


def test_exclusive_and_inclusive_bounds_get_distinct_aggregates(spark):
    """ADVICE r02 #2: an element declaring both minimum and exclusiveMinimum
    (or maximum + exclusiveMaximum) must emit aggregates under DISTINCT
    aliases — the shared-scan exprs dict is keyed by alias, so a collision
    silently overwrites one metric with the other."""
    contract = """
id: excl-bounds
models:
  m:
    fields:
      id: {type: string, primaryKey: true}
      xs:
        type: array
        items: {type: double, minimum: 0, exclusiveMinimum: 1,
                maximum: 10, exclusiveMaximum: 9}
"""
    spec = DataContractSpecification.from_string(contract)
    checks = create_checks(spec)["m"]
    aliases = [c.agg_alias for c in checks
               if c.field == "xs" and c.agg_alias is not None]
    assert len(aliases) == len(set(aliases)), f"alias collision: {aliases}"
    keys = [c.key for c in checks if c.field == "xs"]
    assert len(keys) == len(set(keys)), f"key collision: {keys}"
    # minimum 0 vs exclusiveMinimum 1: value 0.5 violates only the exclusive
    # bound; value -1 violates both; value 1.0 violates only the not-equal.
    df = spark.createDataFrame(
        [("a", [0.5]), ("b", [-1.0]), ("c", [1.0]), ("d", [5.0]),
         ("e", [9.0]), ("f", [9.5]), ("g", [11.0])],
        "id string, xs array<double>")
    res = validate(spark, spec, {"m": df}, ValidationConfig())
    m = res.metrics
    assert m["m__xs[items]__items_minimum"] == 1            # -1 only
    assert m["m__xs[items]__items_exclusive_minimum"] == 2  # -1, 0.5
    assert m["m__xs[items]__items_not_equal_minimum"] == 1  # 1.0
    assert m["m__xs[items]__items_maximum"] == 1            # 11 only
    assert m["m__xs[items]__items_exclusive_maximum"] == 2  # 9.5, 11
    assert m["m__xs[items]__items_not_equal_maximum"] == 1  # 9.0
