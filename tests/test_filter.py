"""Contract-driven corpus filter (dcspark/filter.py): per-row reasons,
valid/quarantine split, single-pass partitioned write, broadcast reference
join plan gate, CLI command."""

import pytest
from pyspark.sql import functions as F

from dcspark import DataContractSpecification
from dcspark import filter as filter_mod

CONTRACT = """
id: filter-test
models:
  clips:
    fields:
      clip_id: {type: string, required: true, primaryKey: true}
      dur_ms: {type: integer, minimum: 100, maximum: 1000}
      codec: {type: string, enum: [pcm_s16le, flac]}
      lang: {type: string, pattern: '^[a-z]{2}$'}
      speaker: {type: string, references: speakers.speaker_id}
    quality:
      - {type: expression, expression: "dur_ms < 900 OR codec = 'flac'"}
  speakers:
    fields:
      speaker_id: {type: string, primaryKey: true}
"""

ROWS = [
    #  id     dur   codec        lang  speaker
    ("c1",    500, "pcm_s16le", "en", "s1"),    # clean
    (None,    500, "pcm_s16le", "en", "s1"),    # required
    ("c3",     50, "pcm_s16le", "en", "s1"),    # minimum
    ("c4",    950, "flac",      "en", "s1"),    # nothing (expr passes: flac)
    ("c5",    950, "pcm_s16le", "en", "s1"),    # expression
    ("c6",    500, "mp3",       "en", "s1"),    # enum
    ("c7",    500, "pcm_s16le", "EN", "s1"),    # regex
    ("c8",    500, "pcm_s16le", "en", "sX"),    # reference orphan
    ("c9",    500, "pcm_s16le", "en", None),    # NULL ref key: NOT an orphan
    ("c10",    50, "mp3",       "EN", "sX"),    # multiple reasons
]
SCHEMA = "clip_id string, dur_ms int, codec string, lang string, speaker string"


@pytest.fixture(scope="module")
def frames(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    speakers = spark.createDataFrame([("s1",), ("s2",)], "speaker_id string")
    return df, {"clips": df, "speakers": speakers}


@pytest.fixture(scope="module")
def spec():
    return DataContractSpecification.from_string(CONTRACT)


def _reasons_by_id(tagged):
    return {
        r["clip_id"]: list(r[filter_mod.REASONS_COL])
        for r in tagged.collect()
    }


def test_with_reasons_per_row(spark, frames, spec):
    df, tables = frames
    by_id = _reasons_by_id(filter_mod.with_reasons(df, spec, "clips", tables))
    assert by_id["c1"] == []
    assert by_id[None] == ["clips__clip_id__field_required"]
    assert by_id["c3"] == ["clips__dur_ms__field_minimum"]
    assert by_id["c4"] == []
    assert by_id["c5"] == ["clips__quality_expression_0"]
    assert by_id["c6"] == ["clips__codec__field_enum"]
    assert by_id["c7"] == ["clips__lang__field_regex"]
    assert by_id["c8"] == ["clips__speaker__field_reference"]
    assert by_id["c9"] == []  # NULL child key is required's concern, not orphan
    assert by_id["c10"] == sorted([
        "clips__dur_ms__field_minimum", "clips__codec__field_enum",
        "clips__lang__field_regex", "clips__speaker__field_reference",
    ])


def test_split_and_schema(spark, frames, spec):
    df, tables = frames
    valid, quar = filter_mod.split(df, spec, "clips", tables)
    assert valid.columns == df.columns  # original schema restored
    assert sorted(r["clip_id"] for r in valid.collect()) == ["c1", "c4", "c9"]
    assert quar.count() == 7
    assert filter_mod.REASONS_COL in quar.columns


def test_write_split_single_pass(spark, frames, spec, tmp_path):
    df, tables = frames
    out = str(tmp_path / "split")
    filter_mod.write_split(df, spec, "clips", out, tables)
    valid = spark.read.parquet(f"{out}/__valid=true")
    quar = spark.read.parquet(f"{out}/__valid=false")
    assert valid.count() == 3 and quar.count() == 7
    bad = {r["clip_id"]: r[filter_mod.REASONS_COL] for r in quar.collect()}
    assert bad["c6"] == "clips__codec__field_enum"
    assert "," in bad["c10"]  # multiple reasons comma-joined


def test_reference_join_is_broadcast_not_shuffle(spark, frames, spec):
    df, tables = frames
    tagged = filter_mod.with_reasons(df, spec, "clips", tables)
    tagged.collect()
    plan = tagged._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # no Python row UDFs anywhere in the decision
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_missing_parent_table_skips_reference(spark, frames, spec):
    df, _ = frames
    by_id = _reasons_by_id(filter_mod.with_reasons(df, spec, "clips", None))
    assert by_id["c8"] == []  # reference skipped without its parent frame


def test_cli_filter_command(spark, frames, spec, tmp_path):
    from dcspark.cli import main

    df, tables = frames
    base = str(tmp_path / "in")
    df.write.parquet(f"{base}/clips.parquet")
    tables["speakers"].write.parquet(f"{base}/speakers.parquet")
    cpath = str(tmp_path / "contract.yaml")
    with open(cpath, "w") as f:
        f.write(CONTRACT)
    out = str(tmp_path / "out")
    rc = main(["filter", cpath, "--path", base, "--model", "clips",
               "--output", out, "--master", "local[2]"])
    assert rc == 0
    assert spark.read.parquet(f"{out}/clips/__valid=false").count() == 7


def test_cli_test_quarantine_path(spark, frames, spec, tmp_path):
    """`test --quarantine-path` writes the FULL quarantined rows alongside the
    validation run (the violations table is a capped sample; quarantine is
    the actionable complement)."""
    from dcspark.cli import main

    df, tables = frames
    base = str(tmp_path / "in")
    df.write.parquet(f"{base}/clips.parquet")
    tables["speakers"].write.parquet(f"{base}/speakers.parquet")
    cpath = str(tmp_path / "contract.yaml")
    with open(cpath, "w") as f:
        f.write(CONTRACT)
    qdir = str(tmp_path / "quar")
    rc = main(["test", cpath, "--path", base, "--quarantine-path", qdir,
               "--master", "local[2]"])
    assert rc == 1  # the fixture data violates the contract
    quar = spark.read.parquet(f"{qdir}/clips")
    assert quar.count() == 7
    assert filter_mod.REASONS_COL in quar.columns
    # the clean parent model writes an empty quarantine (schema present)
    assert spark.read.parquet(f"{qdir}/speakers").count() == 0


def test_partial_parent_tables_keep_reference_flags_aligned(spark):
    """Two references with only the SECOND parent supplied: orphan reasons
    must carry the second check's key, never the skipped first one's
    (regression: a positional zip misattributed the join flag)."""
    spec2 = DataContractSpecification.from_string("""
id: two-refs
models:
  clips:
    fields:
      clip_id: {type: string, primaryKey: true}
      speaker: {type: string, references: speakers.speaker_id}
      device: {type: string, references: devices.device_id}
  speakers:
    fields:
      speaker_id: {type: string, primaryKey: true}
  devices:
    fields:
      device_id: {type: string, primaryKey: true}
""")
    df = spark.createDataFrame(
        [("c1", "s1", "d1"), ("c2", "sX", "dX"), ("c3", None, "dX")],
        "clip_id string, speaker string, device string")
    devices = spark.createDataFrame([("d1",)], "device_id string")
    by_id = _reasons_by_id(filter_mod.with_reasons(
        df, spec2, "clips", {"devices": devices}))  # speakers parent absent
    assert by_id["c1"] == []
    assert by_id["c2"] == ["clips__device__field_reference"]
    assert by_id["c3"] == ["clips__device__field_reference"]


def test_reference_filter_scope_respected(spark):
    """Review finding: a reference rule with a `filter:` scope must not tag
    out-of-scope rows as orphans (engine parity — it filters the child
    frame before its anti-join)."""
    from dcspark import filter as filter_mod
    from dcspark.spec import DataContractSpecification

    contract = """
id: scoped-ref
models:
  child:
    fields:
      k: {type: string, references: parent.k, filter: "region = 'EU'"}
      region: {type: string}
  parent:
    fields:
      k: {type: string}
"""
    spec = DataContractSpecification.from_string(contract)
    parent = spark.createDataFrame([("a",), ("b",)], "k string")
    child = spark.createDataFrame(
        [("a", "EU"), ("zz", "EU"), ("zz", "US"), ("b", "US")],
        "k string, region string")
    tagged = filter_mod.with_reasons(child, spec, "child",
                                     tables={"parent": parent})
    rows = {(r["k"], r["region"]): r["__reasons"] for r in tagged.collect()}
    assert rows[("zz", "EU")], "in-scope orphan must be tagged"
    assert not rows[("zz", "US")], "out-of-scope row wrongly tagged as orphan"
    assert not rows[("a", "EU")] and not rows[("b", "US")]


def test_missing_parent_column_degrades_not_crashes(spark):
    """Review finding: engine parity — a declared parent column absent from
    the provided parent frame must skip the reference (the engine reports
    it as an error check), never raise AnalysisException mid-salvage."""
    from dcspark import filter as filter_mod
    from dcspark.spec import DataContractSpecification

    contract = """
id: missing-parent-col
models:
  child:
    fields:
      k: {type: string, references: parent.nope}
  parent:
    fields:
      nope: {type: string}
"""
    spec = DataContractSpecification.from_string(contract)
    parent = spark.createDataFrame([("a",)], "other string")
    child = spark.createDataFrame([("x",)], "k string")
    tagged = filter_mod.with_reasons(child, spec, "child",
                                     tables={"parent": parent})
    assert tagged.collect()[0]["__reasons"] == []
