"""Z-order clustering compaction (iceberg.compact(cluster_by=...)).

The scale claim under test: after a z-order rewrite, manifest stats
envelopes prune files on EVERY cluster column, where a linear write order
prunes only its leading column. Reference parity: the reference CLI has no
table writer at all; this matches the layout tool real engines ship
(Delta OPTIMIZE ZORDER, Iceberg's rewrite_data_files zorder strategy).
"""

import pytest
from pyspark.sql import functions as F

from dcspark.iceberg import IcebergTable, zorder_value


@pytest.fixture()
def grid_df(spark):
    # 64x64 grid, shuffled so pre-compact files have full-range envelopes
    return (spark.range(64 * 64)
            .select((F.col("id") % 64).cast("int").alias("x"),
                    (F.col("id") / 64).cast("int").alias("y"),
                    (F.col("id") * 3 % 97).cast("double").alias("v"),
                    F.md5(F.col("id").cast("string")).alias("r"))
            .repartition(16, "r").drop("r"))


def _grid_table(spark, grid_df, tmp_path):
    t = IcebergTable.create(str(tmp_path / "tbl"), grid_df.schema)
    t.append(grid_df)
    return t


def test_zorder_value_interleaves_and_orders(spark):
    df = spark.range(256).select(
        (F.col("id") % 16).cast("int").alias("a"),
        (F.col("id") / 16).cast("int").alias("b"))
    out = zorder_value(df, ["a", "b"], bits=4)
    assert "__ice_zval" in out.columns
    rows = {(r["a"], r["b"]): r["__ice_zval"] for r in out.collect()}
    # 16 values into 16 buckets: bucket == value; Morton key is exact
    def morton(a, b):
        z = 0
        for j in range(4):
            z |= ((a >> j) & 1) << (2 * j)
            z |= ((b >> j) & 1) << (2 * j + 1)
        return z
    for (a, b), z in rows.items():
        assert z == morton(a, b), (a, b, z)


def test_zorder_value_null_and_string(spark):
    df = spark.createDataFrame(
        [("apple", 1), ("banana", 2), (None, 3), ("cherry", None)],
        ["s", "n"])
    out = zorder_value(df, ["s", "n"], bits=2).collect()
    assert all(r["__ice_zval"] is not None for r in out)
    # string embedding keeps lexical order => bucket(apple) <= bucket(cherry)
    z = {r["s"]: r["__ice_zval"] for r in out}
    assert z[None] is not None  # nulls land in bucket 0, never null keys


def test_zorder_rejects_bad_args(spark):
    df = spark.range(4).select(F.col("id").alias("a"),
                               F.array(F.lit(1)).alias("arr"))
    with pytest.raises(ValueError):
        zorder_value(df, [])
    with pytest.raises(ValueError):
        zorder_value(df, ["nope"])
    with pytest.raises(ValueError):
        zorder_value(df, ["arr"])
    with pytest.raises(ValueError):
        zorder_value(df, ["a"], bits=63)


def test_zorder_compact_prunes_both_dimensions(spark, grid_df, tmp_path):
    t = _grid_table(spark, grid_df, tmp_path)
    assert len(t.data_files()) >= 8
    out = t.compact(spark, cluster_by=["x", "y"], output_files=16)
    # cluster_by makes every in-scope file a candidate
    assert out["rewritten_data_files"] >= 8
    n_files = len(t.data_files())
    assert n_files >= 8
    # a narrow slab on EITHER axis must skip most files
    for col in ("x", "y"):
        planned = len(t.data_files(column_filter=[(col, "<", 8)]))
        assert planned <= n_files // 2, (col, planned, n_files)
    # point-ish query prunes multiplicatively
    planned = len(t.data_files(
        column_filter=[("x", "<", 8), ("y", "<", 8)]))
    assert planned <= max(2, n_files // 4), (planned, n_files)


def test_zorder_compact_results_exact(spark, grid_df, tmp_path):
    t = _grid_table(spark, grid_df, tmp_path)
    want = grid_df.filter((F.col("x") < 8) & (F.col("y") >= 48)).agg(
        F.count(F.lit(1)), F.round(F.sum("v"), 6)).first()
    t.compact(spark, cluster_by=["x", "y"], output_files=16)
    got = t.read(spark, where=[("x", "<", 8), ("y", ">=", 48)]).agg(
        F.count(F.lit(1)), F.round(F.sum("v"), 6)).first()
    assert tuple(got) == tuple(want)
    # full-table row count survives the rewrite
    assert t.read(spark).count() == 64 * 64


def test_zorder_compact_beats_linear_sort_on_second_axis(
        spark, grid_df, tmp_path):
    # linear write order on x: y-predicates prune ~nothing
    lin = IcebergTable.create(str(tmp_path / "lin"), grid_df.schema,
                              sort_by=["x"])
    lin.append(grid_df)
    lin.compact(spark, small_file_bytes=float("inf"),
                output_files=16)
    zt = _grid_table(spark, grid_df, tmp_path)
    zt.compact(spark, cluster_by=["x", "y"], output_files=16)
    pred = [("y", "<", 8)]
    lin_n, lin_tot = (len(lin.data_files(column_filter=pred)),
                      len(lin.data_files()))
    z_n, z_tot = (len(zt.data_files(column_filter=pred)),
                  len(zt.data_files()))
    assert z_n / z_tot < lin_n / lin_tot, (
        (z_n, z_tot), (lin_n, lin_tot))


def test_zorder_compact_respects_partition_dirs(spark, grid_df, tmp_path):
    df = grid_df.withColumn("shard", (F.col("x") % 2).cast("int"))
    t = IcebergTable.create(str(tmp_path / "p"), df.schema,
                            partition_by=[("shard", "identity")])
    t.append(df)
    t.compact(spark, cluster_by=["x", "y"], output_files=16)
    # partition pruning still works after the clustered rewrite
    only0 = t.read(spark, partition_filter={"shard": 0})
    assert only0.select(F.countDistinct("shard")).first()[0] == 1
    assert t.read(spark).count() == 64 * 64
