"""Cross-table reconciliation (dcspark/reconcile.py): bucketed row-hash diff.

Locks the three-way classification with exact changed-column attribution, the
bucket-level pruning (the drill join must touch only differing buckets), NULL
normalization in the digests, and the duplicate-key estimate.
"""

import pytest
from pyspark.sql import functions as F

from dcspark.reconcile import ReconcileResult, bucket_summary, reconcile


@pytest.fixture(scope="module")
def base(spark):
    return (
        spark.range(2000)
        .select(
            F.col("id"),
            (F.col("id") * 3 % 97).cast("double").alias("v"),
            F.concat(F.lit("s"), F.col("id").cast("string")).alias("s"),
        )
        .cache()
    )


def test_identical_tables(spark, base):
    r = reconcile(base, base, ["id"])
    assert r.identical and r.buckets_differing == 0
    assert r.rows_left == r.rows_right == 2000
    assert r.diff.count() == 0
    assert set(r.diff.columns) == {"id", "status", "changed_cols"}


def test_three_way_classification(spark, base):
    right = (
        base.filter(F.col("id") != 5)
        .withColumn("v", F.when(F.col("id") == 7, F.lit(-1.0)).otherwise(F.col("v")))
        .withColumn(
            "s", F.when(F.col("id") == 9, F.lit("tampered")).otherwise(F.col("s"))
        )
    )
    extra = base.filter(F.col("id") == 11).withColumn("id", F.lit(999999))
    right = right.unionByName(extra)
    r = reconcile(base, right, ["id"])
    assert r.counts == {"missing_in_right": 1, "missing_in_left": 1, "changed": 2}
    got = {row["id"]: (row["status"], list(row["changed_cols"]))
           for row in r.diff.collect()}
    assert got[5] == ("missing_in_right", [])
    assert got[999999] == ("missing_in_left", [])
    assert got[7] == ("changed", ["v"])
    assert got[9] == ("changed", ["s"])
    # the drill touched only the drifted buckets
    assert 0 < r.buckets_differing <= 4
    assert r.buckets_total == 4096


def test_changed_cols_multi(spark, base):
    right = base.withColumn(
        "v", F.when(F.col("id") == 3, F.lit(-9.0)).otherwise(F.col("v"))
    ).withColumn(
        "s", F.when(F.col("id") == 3, F.lit("x")).otherwise(F.col("s"))
    )
    r = reconcile(base, right, ["id"])
    row = r.diff.collect()[0]
    assert row["id"] == 3 and list(row["changed_cols"]) == ["s", "v"]


def test_null_value_vs_value(spark):
    left = spark.createDataFrame([(1, "a"), (2, None), (3, None)], "id long, x string")
    right = spark.createDataFrame([(1, None), (2, None), (3, "b")], "id long, x string")
    r = reconcile(left, right, ["id"])
    got = {row["id"]: row["status"] for row in r.diff.collect()}
    # NULL vs value differs both ways; NULL vs NULL is equal
    assert got == {1: "changed", 3: "changed"}


def test_null_sentinel_prevents_column_swap_collision(spark):
    # xxhash64 skips NULL args, so without normalization ("a", NULL) and
    # (NULL, "a") would digest identically and the drift would be invisible
    left = spark.createDataFrame([(1, "a", None)], "id long, x string, y string")
    right = spark.createDataFrame([(1, None, "a")], "id long, x string, y string")
    ls = bucket_summary(left, ["id"], ["x", "y"], 16).collect()
    rs = bucket_summary(right, ["id"], ["x", "y"], 16).collect()
    assert ls[0]["digest"] != rs[0]["digest"]
    r = reconcile(left, right, ["id"])
    row = r.diff.collect()[0]
    assert row["status"] == "changed" and list(row["changed_cols"]) == ["x", "y"]


def test_compare_cols_default_and_validation(spark):
    left = spark.createDataFrame([(1, 2.0, "z", 9)], "id long, v double, s string, extra int")
    right = spark.createDataFrame([(1, 2.0, "z")], "id long, v double, s string")
    # default compares only the shared non-key columns -> identical
    assert reconcile(left, right, ["id"]).identical
    with pytest.raises(ValueError):
        reconcile(left, right, ["id"], compare_cols=["extra"])
    with pytest.raises(ValueError):
        reconcile(left, right, [])


def test_scoped_compare_cols_ignore_other_drift(spark, base):
    right = base.withColumn(
        "s", F.when(F.col("id") < 100, F.lit("noise")).otherwise(F.col("s"))
    )
    assert reconcile(base, right, ["id"], compare_cols=["v"]).identical
    r = reconcile(base, right, ["id"], compare_cols=["s"])
    assert r.counts == {"changed": 100}


def test_duplicate_key_estimate_and_cardinality_drift(spark, base):
    doubled = base.unionByName(base.limit(500))
    r = reconcile(doubled, base, ["id"])
    # ~500 duplicate rows on the left (HLL estimate, 1% rsd)
    assert 400 <= r.dup_keys_left <= 600
    assert r.dup_keys_right == 0
    # identical content, different copy count: every doubled key is reported
    # as cardinality drift (per-column comparison alone can never see this)
    assert r.counts == {"cardinality_changed": 500}
    row = r.diff.orderBy("id").first()
    assert row["status"] == "cardinality_changed" and list(row["changed_cols"]) == []


def test_count_diff_false_keeps_lazy(spark, base):
    right = base.filter(F.col("id") != 5)
    r = reconcile(base, right, ["id"], count_diff=False)
    assert r.counts == {}
    assert r.diff.count() == 1


def test_binary_columns_compare_byte_exact(spark):
    # audio-payload shape: non-UTF8 bytes must never be compared through a
    # lossy string cast — two invalid-UTF8 payloads would collide there
    l_rows = [(1, bytearray(b"\xff\xfe\x00A")), (2, bytearray(b"\x80\x81"))]
    r_rows = [(1, bytearray(b"\xff\xfe\x00B")), (2, bytearray(b"\x80\x81"))]
    left = spark.createDataFrame(l_rows, "id long, payload binary")
    right = spark.createDataFrame(r_rows, "id long, payload binary")
    r = reconcile(left, right, ["id"])
    got = {row["id"]: (row["status"], list(row["changed_cols"]))
           for row in r.diff.collect()}
    assert got == {1: ("changed", ["payload"])}


def test_multiset_equal_keyless(spark, base):
    from dcspark.reconcile import multiset_equal

    assert multiset_equal(base, base).identical
    # a changed value, a dropped row, and a duplicated row all refuse
    assert not multiset_equal(base, base.filter(F.col("id") != 5)).identical
    assert not multiset_equal(
        base, base.unionByName(base.limit(1))).identical
    assert not multiset_equal(
        base,
        base.withColumn("v", F.when(F.col("id") == 3, -1.0).otherwise(F.col("v"))),
    ).identical
    with pytest.raises(ValueError):
        multiset_equal(base, base.drop("v"))


def test_keys_cover_all_columns(spark):
    # review finding: compare_cols defaults to [] when the keys are the only
    # shared columns — must degrade to a key-multiset reconcile, not crash
    left = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    right = spark.createDataFrame([(1,), (2,), (4,)], "id long")
    assert reconcile(left, left, ["id"]).identical
    r = reconcile(left, right, ["id"])
    assert r.counts == {"missing_in_right": 1, "missing_in_left": 1}
    got = {row["id"]: row["status"] for row in r.diff.collect()}
    assert got == {3: "missing_in_right", 4: "missing_in_left"}


def test_null_key_rows_join_null_safe(spark):
    # review finding: identical NULL-keyed rows sharing a bucket with real
    # drift must NOT be reported missing from both sides
    left = spark.createDataFrame(
        [(None, "same"), (1, "a")], "id string, x string")
    right = spark.createDataFrame(
        [(None, "same"), (1, "CHANGED")], "id string, x string")
    r = reconcile(left, right, ["id"], buckets=1)  # force shared bucket
    got = {row["id"]: row["status"] for row in r.diff.collect()}
    assert got == {"1": "changed"}
    # and a DRIFTED null-keyed row classifies as changed, not missing twice
    right2 = spark.createDataFrame(
        [(None, "tampered"), (1, "a")], "id string, x string")
    r2 = reconcile(left, right2, ["id"], buckets=1)
    rows = r2.diff.collect()
    assert len(rows) == 1 and rows[0]["status"] == "changed"
    assert rows[0]["id"] is None and list(rows[0]["changed_cols"]) == ["x"]


def test_cli_reconcile(spark, base, tmp_path, capsys):
    from dcspark.cli import main

    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    base.write.parquet(lp)
    base.filter(F.col("id") != 5).write.parquet(rp)
    assert main(["reconcile", "--left", lp, "--right", lp, "--keys", "id"]) == 0
    assert "identical" in capsys.readouterr().out
    out = str(tmp_path / "diff")
    assert main(["reconcile", "--left", lp, "--right", rp, "--keys", "id",
                 "--output", out]) == 1
    assert "missing_in_right: 1" in capsys.readouterr().out
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1 and rows[0]["id"] == 5


def test_result_shape():
    assert ReconcileResult.__dataclass_fields__.keys() >= {
        "diff", "buckets_total", "buckets_differing", "rows_left", "rows_right"
    }
