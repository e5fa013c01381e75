"""Column profiler: one multi-aggregate scan per model (north-star shape:
count/null/min/max/HLL-distinct/percentile sketch in a single pass)."""

from pyspark.sql import functions as F

from dcspark.profile import profile_exprs, profile_model, profile_tables


def _df(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 100).cast("double").alias("x"),
        F.when(F.col("id") % 10 == 0, None).otherwise(
            F.concat(F.lit("v"), (F.col("id") % 7).cast("string"))).alias("s"),
        F.array(F.col("id"), F.col("id") + 1).alias("arr"),
    )


def test_profile_values_exact_on_small_data(spark):
    df = _df(spark)
    stats = {r["column"]: r.asDict() for r in profile_model(spark, df, "t").collect()}
    k = stats["k"]
    assert k["row_count"] == 2000 and k["null_count"] == 0
    assert abs(k["approx_distinct"] - 2000) < 2000 * 0.05
    assert k["min"] == "0" and k["max"] == "1999"
    x = stats["x"]
    assert x["mean"] == 49.5
    # accuracy=10000 > n: percentile_approx is exact discrete
    # discrete percentiles: p50 -> rank 1000 -> value 49; p99 -> rank 1980 -> value 98
    assert x["p50"] == 49.0 and x["p99"] == 98.0
    s = stats["s"]
    assert s["null_count"] == 200
    assert abs(s["approx_distinct"] - 7) < 2
    assert s["avg_length"] == 2.0
    arr = stats["arr"]
    assert arr["avg_length"] == 2.0 and arr["approx_distinct"] is None


def test_profile_multiple_models_union(spark):
    out = profile_tables(spark, {"a": _df(spark, 100), "b": _df(spark, 50)})
    models = {r["model"] for r in out.collect()}
    assert models == {"a", "b"}
    assert out.count() == 8  # 4 columns x 2 models


def test_profile_is_single_exchange_scan(spark):
    """All column statistics ride ONE aggregate: a single singleton Exchange,
    no per-column jobs, no key shuffle."""
    df = _df(spark)
    exprs = profile_exprs(df.schema)
    agg = df.agg(*[v.alias(k) for k, v in exprs.items()])
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "SinglePartition" in plan
