"""Iceberg partition evolution (spec "Partition Evolution"): changing the
default spec is metadata-only — old files keep their layout + records and
keep pruning under the spec that wrote them; new files route by the new
spec; compact migrates old files forward."""

import pytest
from pyspark.sql import functions as F

from dcspark.iceberg import IcebergTable


@pytest.fixture()
def make_df(spark):
    def make(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 3).cast("string").alias("kind"),
            (F.col("id") * 1.5).alias("v"),
        ).repartition(2)
    return make


def _spec_ids_of_manifests(t):
    md = t.metadata()
    snap = t._resolve_snapshot(md, None, None)
    return [m.get("partition_spec_id", 0)
            for m in t._read_manifest_list(snap["manifest-list"])]


def test_evolution_is_metadata_only_and_reads_both_layouts(
        spark, make_df, tmp_path):
    t = IcebergTable.create(str(tmp_path / "t"), make_df(0, 1).schema,
                            partition_by=[("kind", "identity")])
    t.append(make_df(0, 60))
    files_before = set(t.data_files())
    sid = t.update_partition_spec([("event_id", "bucket[4]")])
    assert sid == 1
    # metadata-only: not a single data file moved
    assert set(t.data_files()) == files_before
    t.append(make_df(60, 90))
    got = sorted(r["event_id"] for r in t.read(spark).collect())
    assert got == list(range(90))
    # manifests carry BOTH spec ids
    assert set(_spec_ids_of_manifests(t)) == {0, 1}


def test_pruning_respects_each_files_write_spec(spark, make_df, tmp_path):
    t = IcebergTable.create(str(tmp_path / "t"), make_df(0, 1).schema,
                            partition_by=[("kind", "identity")])
    t.append(make_df(0, 60))       # old layout: 3 kind partitions
    t.update_partition_spec([("event_id", "bucket[4]")])
    t.append(make_df(60, 120))     # new layout: 4 buckets
    total = len(t.data_files())
    # kind filter: prunes OLD files to one kind; every NEW file is
    # conservatively kept (their spec doesn't partition on kind)
    kept_kind = t.data_files(partition_filter={"kind": "1"})
    old_total = len([1 for s in _spec_ids_of_manifests(t) if s == 0])
    assert len(kept_kind) < total
    rows = t.read(spark, partition_filter={"kind": "1"}) \
        .filter(F.col("kind") == "1")
    assert rows.count() == 40  # nothing lost by pruning
    # event_id filter: prunes NEW files to one bucket, keeps all old
    kept_bucket = t.data_files(partition_filter={"event_id": 7})
    assert len(kept_bucket) < total
    got = t.read(spark, partition_filter={"event_id": 7}) \
        .filter(F.col("event_id") == 7).count()
    assert got == 1
    del old_total


def test_spec_reuse_and_field_id_stability(spark, make_df, tmp_path):
    t = IcebergTable.create(str(tmp_path / "t"), make_df(0, 1).schema,
                            partition_by=[("kind", "identity")])
    t.append(make_df(0, 10))
    t.update_partition_spec([("kind", "identity"),
                             ("event_id", "bucket[4]")])
    md = t.metadata()
    specs = {s["spec-id"]: s for s in md["partition-specs"]}
    # (kind, identity) keeps its original partition field-id across specs
    fid0 = specs[0]["fields"][0]["field-id"]
    kind_in_1 = [f for f in specs[1]["fields"] if f["name"] == "kind"][0]
    assert kind_in_1["field-id"] == fid0
    # evolving BACK to a prior spec reuses its id, adds nothing
    sid = t.update_partition_spec([("kind", "identity")])
    assert sid == 0
    assert len(t.metadata()["partition-specs"]) == 2
    assert t.metadata()["default-spec-id"] == 0
    # no-op when already default
    assert t.update_partition_spec([("kind", "identity")]) == 0


def test_unpartition_going_forward(spark, make_df, tmp_path):
    t = IcebergTable.create(str(tmp_path / "t"), make_df(0, 1).schema,
                            partition_by=[("kind", "identity")])
    t.append(make_df(0, 30))
    t.update_partition_spec([])
    t.append(make_df(30, 60))
    assert t.read(spark).count() == 60
    # old files still prune by kind; new files always kept
    kept = len(t.data_files(partition_filter={"kind": "0"}))
    assert kept < len(t.data_files())


def test_compact_migrates_files_to_current_spec(spark, make_df, tmp_path):
    t = IcebergTable.create(str(tmp_path / "t"), make_df(0, 1).schema,
                            partition_by=[("kind", "identity")])
    t.append(make_df(0, 60))
    t.update_partition_spec([("event_id", "bucket[4]")])
    t.compact(spark, target_file_bytes=1 << 30)
    # every surviving manifest is on the new spec now
    assert set(_spec_ids_of_manifests(t)) == {1}
    # and bucket pruning now applies to the WHOLE table
    kept = t.data_files(partition_filter={"event_id": 7})
    assert 0 < len(kept) < len(t.data_files())
    assert t.read(spark).count() == 60


def test_time_travel_across_evolution(spark, make_df, tmp_path):
    t = IcebergTable.create(str(tmp_path / "t"), make_df(0, 1).schema,
                            partition_by=[("kind", "identity")])
    s1 = t.append(make_df(0, 30))
    t.update_partition_spec([("event_id", "bucket[4]")])
    t.append(make_df(30, 60))
    assert t.read(spark, snapshot_id=s1).count() == 30
    assert t.read(spark).count() == 60


def test_unknown_column_refused(spark, make_df, tmp_path):
    t = IcebergTable.create(str(tmp_path / "t"), make_df(0, 1).schema)
    with pytest.raises(ValueError, match="not in schema"):
        t.update_partition_spec([("nope", "identity")])
