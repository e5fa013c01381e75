"""A FAILING check must not evaluate the source an extra time for violation
sampling.

The unique / group / referential compute paths each take two actions (the
check metric, then a capped violation sample). Each derives the sample from a
persisted post-shuffle frame (keys with count>1, violating groups, grouped
orphan values), so the expensive source shuffle runs exactly once whether the
check passes or fails. These tests wrap the source in a per-row accumulator
(the gate pattern from tests/test_imagerule.py) and assert the failing run
reads exactly as many source rows as the passing run.
"""

from pyspark.sql import functions as F

from dcspark import DataContractSpecification, ValidationConfig, validate
from dcspark.run_model import ResultEnum


def _counted(spark, df):
    """Wrap df so every materialized source row bumps an accumulator."""
    acc = spark.sparkContext.accumulator(0)
    schema = df.schema

    def touch(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    return df.mapInPandas(touch, schema), acc


def _scan_rows(spark, contract, rows, schema, tables_extra=None, **cfg):
    df = spark.createDataFrame(rows, schema)
    wrapped, acc = _counted(spark, df)
    tables = {"t": wrapped}
    if tables_extra:
        tables.update(tables_extra)
    spec = DataContractSpecification.from_string(contract)
    res = validate(spark, spec, tables, ValidationConfig(**cfg))
    return res, acc.value


UNIQUE_CONTRACT = """
id: scanonce-unique
models:
  t:
    fields:
      k: {type: string, unique: true}
"""


def test_failing_unique_scans_source_once(spark):
    schema = "k string"
    passing = [(f"u{i}",) for i in range(64)]
    failing = [(f"u{i % 8}",) for i in range(64)]  # heavy duplication
    res_p, n_pass = _scan_rows(spark, UNIQUE_CONTRACT, passing, schema)
    res_f, n_fail = _scan_rows(spark, UNIQUE_CONTRACT, failing, schema)
    uk = "t__k__field_unique"
    assert next(c for c in res_p.run.checks if c.key == uk).result == ResultEnum.passed
    assert next(c for c in res_f.run.checks if c.key == uk).result == ResultEnum.failed
    # violations were sampled — yet the source was read no more than in the
    # passing run (the dup frame is persisted across the two actions)
    assert res_f.violations is not None and res_f.violations.count() > 0
    assert n_fail == n_pass


GROUP_CONTRACT = """
id: scanonce-group
models:
  t:
    fields:
      k: {type: string}
      v: {type: integer}
    quality:
      - {type: group, column: k, metric: avg, over: v, mustBeLessThan: 100}
"""


def test_failing_group_check_scans_source_once(spark):
    schema = "k string, v int"
    passing = [(f"g{i % 4}", 1) for i in range(64)]
    failing = [(f"g{i % 4}", 1000) for i in range(64)]  # every group violates
    res_p, n_pass = _scan_rows(spark, GROUP_CONTRACT, passing, schema)
    res_f, n_fail = _scan_rows(spark, GROUP_CONTRACT, failing, schema)
    gk = "t__quality_group_0"
    assert next(c for c in res_p.run.checks if c.key == gk).result == ResultEnum.passed
    assert next(c for c in res_f.run.checks if c.key == gk).result == ResultEnum.failed
    assert res_f.violations is not None and res_f.violations.count() > 0
    assert n_fail == n_pass


REF_CONTRACT = """
id: scanonce-ref
models:
  t:
    fields:
      a: {type: string, references: p.k}
  p:
    fields:
      k: {type: string}
"""


JOIN_EQ_CONTRACT = """
id: scanonce-joineq
models:
  t:
    fields:
      k: {type: string, primaryKey: true}
      v: {type: string}
    quality:
      - {type: audio, invariant: transcript-equality, ref: r, key: k,
         column: v, ref_column: txt}
  r:
    fields:
      k: {type: string}
      txt: {type: string}
"""


def test_failing_join_equality_scans_child_once(spark):
    ref = spark.createDataFrame(
        [(f"k{i}", f"text-{i}") for i in range(32)], "k string, txt string")

    def run(rows):
        return _scan_rows(spark, JOIN_EQ_CONTRACT, rows, "k string, v string",
                          tables_extra={"r": ref})

    passing = [(f"k{i}", f"text-{i}") for i in range(32)]
    failing = [(f"k{i}", "WRONG") for i in range(32)]
    res_p, n_pass = run(passing)
    res_f, n_fail = run(failing)
    jk = next(c.key for c in res_f.run.checks if "equal" in c.key or "join" in c.key)
    assert next(c for c in res_f.run.checks if c.key == jk).result == ResultEnum.failed
    assert res_f.violations is not None and res_f.violations.count() > 0
    assert n_fail == n_pass


def test_join_equality_partition_attribution(spark):
    """With --partition-col, mismatching transcripts attribute to the
    partitions carrying them (same contract as referential attribution)."""
    from dcspark import DataContractSpecification

    ref = spark.createDataFrame(
        [(f"k{i}", f"text-{i}") for i in range(16)], "k string, txt string")
    good = [(f"k{i}", f"text-{i}", "p_good") for i in range(8)]
    bad = [(f"k{i}", "WRONG", "p_bad") for i in range(8, 16)]
    child = spark.createDataFrame(good + bad, "k string, v string, bucket string")
    spec = DataContractSpecification.from_string(JOIN_EQ_CONTRACT)
    res = validate(spark, spec, {"t": child, "r": ref},
                   ValidationConfig(partition_col="bucket"))
    rows = [r for r in res.results
            if "equal" in r["check_key"] or "join" in r["check_key"]]
    by_pid = {r["partition_id"]: r for r in rows}
    assert by_pid[None]["metric_value"] == 8.0
    assert by_pid["p_bad"]["metric_value"] == 8.0
    assert "p_good" not in by_pid
    vio_pids = {r["partition_id"] for r in res.violations.collect()
                if "equal" in r["check_key"] or "join" in r["check_key"]}
    assert vio_pids == {"p_bad"}


def test_failing_reference_scans_child_once(spark):
    schema = "a string"
    parent = None

    def run(rows):
        nonlocal parent
        df = spark.range(8).select(F.concat(F.lit("r"), F.col("id")).alias("k"))
        return _scan_rows(spark, REF_CONTRACT, rows, schema, tables_extra={"p": df})

    passing = [(f"r{i % 8}",) for i in range(64)]
    failing = [("orphan-%d" % (i % 3),) for i in range(64)]
    res_p, n_pass = run(passing)
    res_f, n_fail = run(failing)
    rk = next(c.key for c in res_f.run.checks if "reference" in c.key or "references" in c.key)
    assert next(c for c in res_f.run.checks if c.key == rk).result == ResultEnum.failed
    assert res_f.violations is not None and res_f.violations.count() > 0
    assert n_fail == n_pass
