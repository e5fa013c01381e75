"""KS/PSI drift: same distribution passes, shifted distribution fails."""

from pyspark.sql import functions as F

from dcspark import drift as drift_mod


def _nums(spark, seed, shift=0.0, n=4000):
    return (
        spark.range(n)
        .select(
            (F.hash(F.col("id") + F.lit(seed)) % 1000 / 100.0 + F.lit(shift)).alias("x")
        )
    )


def test_ref_stats_shape(spark):
    ref = _nums(spark, 1)
    stats = drift_mod.build_ref_stats(ref, ["x"], n_quantiles=49, n_bins=10)
    s = stats["x"]
    assert len(s["quantiles"]) == 49
    assert len(s["bin_probs"]) == len(s["bin_edges"]) + 1
    assert abs(sum(s["bin_probs"]) - 1.0) < 1e-9
    assert s["n"] == 4000


def _stat(spark, stats, df, method):
    exprs = drift_mod.drift_agg_exprs("x", stats["x"], method, "p")
    row = df.agg(*[v.alias(k) for k, v in exprs.items()]).first().asDict()
    return drift_mod.drift_statistic(row, stats["x"], method, "p")


def test_ks_same_vs_shifted(spark):
    ref = _nums(spark, 1)
    stats = drift_mod.build_ref_stats(ref, ["x"], n_quantiles=99, n_bins=10)
    same = _nums(spark, 2)  # different sample, same distribution
    shifted = _nums(spark, 2, shift=3.0)   # uniform width 20 -> theoretical KS = 3/20
    assert _stat(spark, stats, same, "ks") < 0.05
    assert 0.10 < _stat(spark, stats, shifted, "ks") < 0.20
    assert _stat(spark, stats, _nums(spark, 2, shift=10.0), "ks") > 0.45


def test_psi_same_vs_shifted(spark):
    ref = _nums(spark, 1)
    stats = drift_mod.build_ref_stats(ref, ["x"], n_quantiles=49, n_bins=10)
    same = _nums(spark, 3)
    shifted = _nums(spark, 3, shift=4.0)
    assert _stat(spark, stats, same, "psi") < 0.1
    assert _stat(spark, stats, shifted, "psi") > 0.5


def test_ref_stats_df_roundtrip(spark):
    stats = drift_mod.build_ref_stats(_nums(spark, 1), ["x"], n_quantiles=9, n_bins=4)
    df = drift_mod.ref_stats_to_df(spark, stats)
    back = drift_mod.ref_stats_from_df(df)
    assert back["x"]["quantiles"] == [float(q) for q in stats["x"]["quantiles"]]
    assert back["x"]["n"] == stats["x"]["n"]


def test_empty_current_returns_none(spark):
    stats = drift_mod.build_ref_stats(_nums(spark, 1), ["x"], n_quantiles=9, n_bins=4)
    empty = _nums(spark, 1).filter("x > 1e9")
    assert _stat(spark, stats, empty, "ks") is None
