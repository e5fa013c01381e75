"""Deterministic hash split / stratified sampling tests."""

import pytest
from pyspark.sql import functions as F

from dcspark import sampling


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 20000).select(F.col("id").alias("doc_id"))


def test_split_disjoint_exhaustive_and_sized(ids):
    out = sampling.hash_split(
        ids, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="s1")
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 20000
    # binomial 4-sigma bands at n=20000
    assert abs(counts["train"] - 16000) < 4 * (20000 * 0.8 * 0.2) ** 0.5
    assert abs(counts["val"] - 2000) < 4 * (20000 * 0.1 * 0.9) ** 0.5
    assert abs(counts["test"] - 2000) < 4 * (20000 * 0.1 * 0.9) ** 0.5


def test_split_stable_under_repartition_and_reorder(ids):
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = sampling.hash_split(ids, "doc_id", fr, salt="s1")
    b = sampling.hash_split(
        ids.repartition(17).sortWithinPartitions(F.desc("doc_id")),
        "doc_id", fr, salt="s1")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_salt_rerolls_assignment(ids):
    fr = {"a": 0.5, "b": 0.5}
    x = sampling.hash_split(ids, "doc_id", fr, salt="s1")
    y = sampling.hash_split(ids, "doc_id", fr, salt="s2")
    moved = x.join(y.withColumnRenamed("split", "split2"), "doc_id") \
        .filter(F.col("split") != F.col("split2")).count()
    assert 8000 < moved < 12000  # ~half move on an independent re-roll


def test_hash_sample_subset_property(ids):
    small = sampling.hash_sample(ids, "doc_id", 0.1, salt="s")
    big = sampling.hash_sample(ids, "doc_id", 0.3, salt="s")
    assert small.exceptAll(big).count() == 0  # tighter fraction => subset
    assert abs(small.count() - 2000) < 4 * (20000 * 0.1 * 0.9) ** 0.5


def test_stratified_rates_and_default(spark):
    df = spark.range(0, 30000).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
            (F.col("id") % 3 + 1).cast("int")).alias("lang"))
    out = sampling.stratified_hash_sample(
        df, "doc_id", "lang", {"en": 0.5, "de": 0.1}, default_fraction=0.0,
        salt="s")
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "fr" not in counts  # default 0.0 drops unlisted strata
    assert abs(counts["en"] - 5000) < 4 * (10000 * 0.25) ** 0.5
    assert abs(counts["de"] - 1000) < 4 * (10000 * 0.09) ** 0.5


def test_edge_fractions():
    assert sampling._threshold_hex(0.0) == "00000000"
    assert sampling._threshold_hex(1.0) == "g"  # > every hex draw
    assert sampling._threshold_hex(0.5) == "80000000"


def test_split_plan_is_shuffle_free_scan(ids):
    out = sampling.hash_split(ids, "doc_id", {"train": 0.9, "test": 0.1})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_null_stratum_gets_default_fraction(spark):
    df = spark.createDataFrame(
        [(i, None if i % 2 else "en") for i in range(4000)],
        "doc_id long, lang string")
    out = sampling.stratified_hash_sample(
        df, "doc_id", "lang", {"en": 0.0}, default_fraction=1.0, salt="s")
    rows = out.collect()
    assert len(rows) == 2000  # every NULL-stratum row kept, every 'en' dropped
    assert all(r["lang"] is None for r in rows)


def test_null_ids_share_one_deterministic_draw(spark):
    df = spark.createDataFrame(
        [(None,)] * 50 + [(1,)], "doc_id long")
    out = sampling.hash_split(df, "doc_id", {"a": 0.5, "b": 0.5}, salt="s9")
    null_splits = {r["split"] for r in out.collect() if r["doc_id"] is None}
    assert len(null_splits) == 1  # all NULLs land together, not silently biased
    kept = sampling.hash_sample(df, "doc_id", 0.999999, salt="s9").count()
    assert kept == 51  # NULL ids are sampled, not dropped


def test_weighted_sample_semantics(spark):
    from dcspark.sampling import hash_hex, weighted_hash_sample

    rows = [(f"d{i}", [0.0, 0.25, 0.5, 1.0, None][i % 5]) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id string, w double")
    kept = weighted_hash_sample(df, "doc_id", "w", salt="q")
    got = {r["doc_id"] for r in kept.collect()}
    # reference decision computed row-by-row from the same draw
    draws = {r["doc_id"]: r["h"]
             for r in df.select("doc_id", hash_hex("doc_id", "q").alias("h")).collect()}
    for doc_id, w in rows:
        if w is None or w == 0.0:
            assert doc_id not in got
        elif w == 1.0:
            assert doc_id in got  # weight 1 admits every draw ('g' sentinel)
        else:
            expect = int(draws[doc_id], 16) < round(w * (1 << 32))
            assert (doc_id in got) == expect, (doc_id, w)
    # monotone: halving every weight keeps a strict subset
    half = weighted_hash_sample(
        df.withColumn("w", F.col("w") / 2), "doc_id", "w", salt="q")
    assert {r["doc_id"] for r in half.collect()} <= got


def test_weighted_sample_plan_no_udf_no_shuffle(spark):
    from dcspark.sampling import weighted_hash_sample

    df = spark.createDataFrame([("a", 0.5)], "doc_id string, w double")
    kept = weighted_hash_sample(df, "doc_id", "w")
    kept.collect()
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mixture_sample_tolerates_existing_fraction_column(spark):
    """Review finding: a corpus already carrying a 'fraction' column must
    not make the plan join ambiguous."""
    from dcspark import sampling
    from pyspark.sql import functions as F

    docs = spark.range(200).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "web").otherwise("code").alias("domain"),
        F.lit(0.123).alias("fraction"),
        F.lit(100).alias("n_tokens"))
    out = sampling.mixture_sample(
        docs, "doc_id", "domain", {"web": 0.5, "code": 0.5},
        budget_tokens=5000)
    rows = out.collect()
    assert rows, "mixture produced nothing"
    assert "fraction" in out.columns


def test_weighted_constant_weight_matches_global_sampler(spark):
    """Review finding: the weighted sampler's threshold rounding must match
    the global sampler's half-even boundary — identical keep sets for a
    constant weight, including an exact-half product (5 / 2^33)."""
    from dcspark import sampling
    from pyspark.sql import functions as F

    docs = spark.range(2000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"))
    for w in (0.25, 0.5 + 1e-9, 5 / 2 ** 33, 0.731):
        a = {r["doc_id"] for r in sampling.hash_sample(docs, "doc_id", w).collect()}
        b = {r["doc_id"] for r in sampling.weighted_hash_sample(
            docs, "doc_id", F.lit(w)).collect()}
        assert a == b, f"weight {w}: {len(a)} vs {len(b)}"
