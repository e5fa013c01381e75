"""Write-audit-publish ingestion (dcspark/wap.py): contract-gated Iceberg
commits. A batch becomes visible on main ONLY if the contract run over the
audit-branch increment passes; red batches quarantine and their snapshots
are reclaimable by the normal retention pair (expire + orphans)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from dcspark import DataContractSpecification
from dcspark.iceberg import IcebergTable
from dcspark.run_model import ResultEnum
from dcspark.spec import to_spark_schema
from dcspark.wap import wap_append, wap_stream

CONTRACT = """
id: wap-test
models:
  ev:
    fields:
      event_id: {type: long, required: true}
      kind: {type: string, enum: ["a", "b"]}
      v: {type: double, minimum: 0}
"""


@pytest.fixture()
def spec():
    return DataContractSpecification.from_string(CONTRACT)


@pytest.fixture()
def make_batch(spark):
    def make(lo, hi, kind="a", v=1.0):
        return spark.range(lo, hi).select(
            F.col("id").alias("event_id"),
            F.lit(kind).alias("kind"),
            F.lit(v).cast("double").alias("v"),
        ).repartition(2)
    return make


def test_wap_green_red_green_sequence(spark, spec, make_batch, tmp_path):
    loc = str(tmp_path / "tbl")
    quar = str(tmp_path / "quarantine")
    t = IcebergTable.create(loc, to_spark_schema(spec.models["ev"]))

    # batch 1: bootstrap on an empty table — validates standalone, lands on main
    out1 = wap_append(spark, spec, t, make_batch(0, 50), "ev",
                      quarantine_sink=quar)
    assert out1.published and out1.rows == 50
    assert t.read(spark).count() == 50

    # batch 2: enum violation -> rejected, main untouched, rows quarantined
    out2 = wap_append(spark, spec, t, make_batch(50, 80, kind="zzz"), "ev",
                      quarantine_sink=quar)
    assert not out2.published
    assert out2.result.run.result == ResultEnum.failed
    assert "ev__kind__field_enum" in out2.failed_checks
    assert out2.quarantined_rows == 30
    assert t.read(spark).count() == 50
    assert t.current_snapshot_id() == out1.main_head

    # batch 3: green again — the reset audit branch must not replay batch 2
    out3 = wap_append(spark, spec, t, make_batch(80, 120, kind="b"), "ev",
                      quarantine_sink=quar)
    assert out3.published
    ids = sorted(r["event_id"] for r in t.read(spark).collect())
    assert ids == list(range(50)) + list(range(80, 120))
    # quarantine holds exactly the red batch
    q = spark.read.parquet(quar)
    assert sorted(r["event_id"] for r in q.collect()) == list(range(50, 80))


def test_wap_bootstrap_red_leaves_table_empty(spark, spec, make_batch,
                                              tmp_path):
    t = IcebergTable.create(str(tmp_path / "tbl"),
                            to_spark_schema(spec.models["ev"]))
    out = wap_append(spark, spec, t, make_batch(0, 10, v=-5.0), "ev")
    assert not out.published and "ev__v__field_minimum" in out.failed_checks
    assert t.current_snapshot_id() is None
    assert t.read(spark).count() == 0


def test_wap_empty_batch_is_noop(spark, spec, make_batch, tmp_path):
    t = IcebergTable.create(str(tmp_path / "tbl"),
                            to_spark_schema(spec.models["ev"]))
    out = wap_append(spark, spec, t, make_batch(0, 0), "ev")
    assert not out.published and out.rows == 0 and out.result is None


def test_wap_branch_name_collides_with_tag(spark, spec, make_batch, tmp_path):
    t = IcebergTable.create(str(tmp_path / "tbl"),
                            to_spark_schema(spec.models["ev"]))
    wap_append(spark, spec, t, make_batch(0, 10), "ev")
    t.create_tag("frozen")
    with pytest.raises(ValueError, match="needs a branch"):
        wap_append(spark, spec, t, make_batch(10, 20), "ev", branch="frozen")


def test_red_snapshot_reclaimed_by_retention(spark, spec, make_batch,
                                             tmp_path):
    """A rejected batch's snapshot is ref-unreachable after the branch
    reset, so expire_snapshots reclaims it IMMEDIATELY (whatever its age)
    while main's history and the audit branch head survive."""
    loc = str(tmp_path / "tbl")
    t = IcebergTable.create(loc, to_spark_schema(spec.models["ev"]))
    wap_append(spark, spec, t, make_batch(0, 50), "ev")
    out_red = wap_append(spark, spec, t, make_batch(50, 90, kind="zzz"), "ev")
    red_sid = out_red.snapshot_id

    def data_files_on_disk():
        return {os.path.join(dp, f) for dp, _, fs in os.walk(loc)
                for f in fs if f.endswith(".parquet")}

    before = data_files_on_disk()
    out = t.expire_snapshots(keep_last=2)  # window holds ALL reachable snaps
    assert out["snapshots_removed"] == 1   # exactly the red one
    assert data_files_on_disk() < before   # its data physically reclaimed
    with pytest.raises(ValueError):
        t.read(spark, snapshot_id=red_sid)
    assert t.read(spark).count() == 50
    assert "audit" in t.refs()  # the reset branch head survived expiry


def test_remove_orphan_files(spark, spec, make_batch, tmp_path):
    loc = str(tmp_path / "tbl")
    t = IcebergTable.create(loc, to_spark_schema(spec.models["ev"]))
    t.append(make_batch(0, 20))
    planted = os.path.join(t.data_dir, "leftover-staging.parquet")
    with open(planted, "wb") as f:
        f.write(b"crashed writer junk")
    dry = t.remove_orphan_files(dry_run=True)
    assert dry["orphans_removed"] == 1 and os.path.exists(planted)
    out = t.remove_orphan_files()
    assert out["orphans_removed"] == 1 and not os.path.exists(planted)
    # mtime guard: a fresh orphan survives an old cutoff
    with open(planted, "wb") as f:
        f.write(b"new junk")
    out = t.remove_orphan_files(older_than_ms=1)
    assert out["orphans_removed"] == 0 and os.path.exists(planted)
    assert t.read(spark).count() == 20  # referenced files untouched


def test_wap_stream_gates_each_microbatch(spark, spec, tmp_path):
    """Continuous ingestion: a good file and a corrupt file arrive as
    separate micro-batches; main advances by the good one only, the stream
    survives the red one."""
    from dcspark.streaming import read_json_stream

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "a1.json", "w") as f:
        for i in range(5):
            f.write(json.dumps(
                {"event_id": i, "kind": "a", "v": 1.0}) + "\n")
    with open(src / "b2.json", "w") as f:
        f.write(json.dumps({"event_id": 10, "kind": "zzz", "v": 1.0}) + "\n")
        f.write(json.dumps({"event_id": 11, "kind": "b", "v": -5.0}) + "\n")

    t = IcebergTable.create(str(tmp_path / "tbl"),
                            to_spark_schema(spec.models["ev"]))
    stream = read_json_stream(spark, spec, "ev", str(src),
                              max_files_per_trigger=1)
    quar = str(tmp_path / "quarantine")
    handle = wap_stream(spark, spec, t, stream, "ev",
                        quarantine_sink=quar,
                        checkpoint_location=str(tmp_path / "ckpt"))
    try:
        assert handle.await_batches(2, timeout_s=120)
    finally:
        handle.stop()
    outcomes = [o for o in handle.outcomes if o.rows > 0]
    assert {o.published for o in outcomes} == {True, False}
    ids = sorted(r["event_id"] for r in t.read(spark).collect())
    assert ids == [0, 1, 2, 3, 4]
    qids = sorted(r["event_id"] for r in spark.read.parquet(quar).collect())
    assert qids == [10, 11]


def test_wap_salvage_publishes_clean_remainder(spark, spec, make_batch,
                                               tmp_path):
    """on_fail="salvage": only the row-rule violators quarantine (with
    reasons); the clean remainder re-gates and publishes."""
    t = IcebergTable.create(str(tmp_path / "tbl"),
                            to_spark_schema(spec.models["ev"]))
    wap_append(spark, spec, t, make_batch(0, 50), "ev")
    quar = str(tmp_path / "quarantine")
    mixed = make_batch(50, 70).unionByName(make_batch(70, 80, kind="zzz"))
    out = wap_append(spark, spec, t, mixed, "ev",
                     quarantine_sink=quar, on_fail="salvage")
    assert out.published and out.salvaged_rows == 20
    assert out.quarantined_rows == 10
    ids = sorted(r["event_id"] for r in t.read(spark).collect())
    assert ids == list(range(70))
    q = spark.read.parquet(quar)
    assert sorted(r["event_id"] for r in q.collect()) == list(range(70, 80))
    assert all("field_enum" in r["__reasons"] for r in q.collect())


def test_wap_salvage_bootstrap_mixed_batch(spark, spec, make_batch,
                                           tmp_path):
    t = IcebergTable.create(str(tmp_path / "tbl"),
                            to_spark_schema(spec.models["ev"]))
    quar = str(tmp_path / "quarantine")
    mixed = make_batch(0, 30).unionByName(make_batch(30, 35, v=-1.0))
    out = wap_append(spark, spec, t, mixed, "ev",
                     quarantine_sink=quar, on_fail="salvage")
    assert out.published and out.salvaged_rows == 30
    assert out.quarantined_rows == 5
    assert t.read(spark).count() == 30


def test_wap_salvage_all_bad_stays_red(spark, spec, make_batch, tmp_path):
    t = IcebergTable.create(str(tmp_path / "tbl"),
                            to_spark_schema(spec.models["ev"]))
    wap_append(spark, spec, t, make_batch(0, 50), "ev")
    quar = str(tmp_path / "quarantine")
    out = wap_append(spark, spec, t, make_batch(50, 60, kind="zzz"), "ev",
                     quarantine_sink=quar, on_fail="salvage")
    assert not out.published and out.salvaged_rows == 0
    assert out.quarantined_rows == 10
    assert t.read(spark).count() == 50


def test_wap_on_fail_validated(spark, spec, make_batch, tmp_path):
    t = IcebergTable.create(str(tmp_path / "tbl"),
                            to_spark_schema(spec.models["ev"]))
    with pytest.raises(ValueError, match="on_fail"):
        wap_append(spark, spec, t, make_batch(0, 5), "ev", on_fail="nope")


def test_wap_quarantine_always_carries_reasons(spark, spec, make_batch, tmp_path):
    """Every quarantine write carries the __reasons column — plain-quarantine
    mode used to append reason-less rows while salvage appended reasoned
    ones, leaving one parquet sink with two schemas (reader-dependent column
    visibility without mergeSchema)."""
    from dcspark.filter import REASONS_COL

    t = IcebergTable.create(str(tmp_path / "tbl"),
                            to_spark_schema(spec.models["ev"]))
    quar = str(tmp_path / "q")
    # bootstrap red (table empty) quarantines with reasons
    out = wap_append(spark, spec, t, make_batch(0, 10, v=-5.0), "ev",
                     quarantine_sink=quar)
    assert not out.published and out.quarantined_rows == 10
    # green publish, then a non-bootstrap red batch into the same sink
    assert wap_append(spark, spec, t, make_batch(0, 10), "ev",
                      quarantine_sink=quar).published
    out2 = wap_append(spark, spec, t, make_batch(10, 20, v=-5.0), "ev",
                      quarantine_sink=quar)
    assert not out2.published and out2.quarantined_rows == 10
    q = spark.read.parquet(quar)
    assert REASONS_COL in q.columns
    rows = q.collect()
    assert len(rows) == 20
    assert all(r[REASONS_COL] and "ev__v__field_minimum" in r[REASONS_COL]
               for r in rows)
