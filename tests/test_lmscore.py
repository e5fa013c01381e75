"""Bigram-LM perplexity scorer (dcspark/lmscore.py): exact math on a tiny
hand-computed corpus, degenerate docs, pruning semantics, broadcast parity,
and the no-UDF / single-training-scan plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from dcspark import lmscore


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_exact_math_tiny_corpus(spark):
    # corpus: "a b", "a b", "a c" -> bigrams (BOS,a)x3 (a,b)x2 (a,c)x1
    # vocab = distinct successors = {a, b, c} = 3
    docs = _docs(spark, ["a b", "a b", "a c"])
    lm = lmscore.train_bigram_lm(docs)
    assert lm.vocab == 3
    big = {(r.w1, r.w2): r.c12 for r in lm.bigrams.collect()}
    assert big == {(lmscore.BOS, "a"): 3, ("a", "b"): 2, ("a", "c"): 1}
    ctx = {r.w1: r.c1 for r in lm.contexts.collect()}
    assert ctx == {lmscore.BOS: 3, "a": 3}

    out = {r.doc_id: r for r in lmscore.perplexity(docs, lm, k=0.5).collect()}
    k, v = 0.5, 3
    p_bos_a = (3 + k) / (3 + k * v)
    p_a_b = (2 + k) / (3 + k * v)
    p_a_c = (1 + k) / (3 + k * v)
    alp0 = (math.log(p_bos_a) + math.log(p_a_b)) / 2
    alp2 = (math.log(p_bos_a) + math.log(p_a_c)) / 2
    assert out[0].n_bigrams == 2
    assert out[0].avg_logprob == pytest.approx(round(alp0, 6), abs=1e-9)
    assert out[0].perplexity == pytest.approx(round(math.exp(-alp0), 6), abs=1e-9)
    assert out[2].avg_logprob == pytest.approx(round(alp2, 6), abs=1e-9)
    # higher-probability doc scores lower perplexity
    assert out[0].perplexity < out[2].perplexity
    lm.release()


def test_empty_and_single_token_docs_score_null(spark):
    docs = _docs(spark, ["", "   ", "solo", "two tokens"])
    out = {r.doc_id: r for r in lmscore.self_perplexity(docs).collect()}
    assert len(out) == 4  # nothing silently dropped
    for i in (0, 1):  # zero tokens -> zero bigrams (BOS alone pairs with nothing)
        assert out[i].n_bigrams == 0 and out[i].perplexity is None
    assert out[2].n_bigrams == 1  # (BOS, solo)
    assert out[3].n_bigrams == 2


def test_unseen_bigrams_fall_back_to_smoothed_estimate(spark):
    train = _docs(spark, ["the cat sat", "the cat ran"])
    lm = lmscore.train_bigram_lm(train)
    score = _docs(spark, ["the dog sat"])  # (the,dog) and (dog,sat) unseen
    row = lmscore.perplexity(score, lm, k=0.1).collect()[0]
    assert row.n_bigrams == 3
    # unseen-context bigram (dog, sat): c12=0, c1=0 -> ln(k / (k*V)) = -ln(V)
    # so the doc still gets a finite score
    assert row.perplexity is not None and math.isfinite(row.perplexity)
    lm.release()


def test_min_count_prunes_pairs_not_denominators(spark):
    docs = _docs(spark, ["a b", "a b", "a c"])
    full = lmscore.train_bigram_lm(docs, min_count=1)
    pruned = lmscore.train_bigram_lm(docs, min_count=2)
    # (a, c) falls out of the count table...
    assert ("a", "c") not in {(r.w1, r.w2) for r in pruned.bigrams.collect()}
    # ...but vocab and context totals are fixed pre-prune
    assert pruned.vocab == full.vocab == 3
    assert {r.w1: r.c1 for r in pruned.contexts.collect()} == \
           {r.w1: r.c1 for r in full.contexts.collect()}
    # pruned (a, c) now scores as unseen: strictly lower logprob for doc 2
    f = {r.doc_id: r.avg_logprob for r in lmscore.perplexity(docs, full).collect()}
    p = {r.doc_id: r.avg_logprob for r in lmscore.perplexity(docs, pruned).collect()}
    assert p[2] < f[2] and p[0] == f[0]
    full.release()
    pruned.release()


def test_broadcast_lm_matches_default(spark):
    docs = _docs(spark, [f"tok{i % 7} tok{(i + 1) % 5} tail" for i in range(40)])
    lm = lmscore.train_bigram_lm(docs)
    a = sorted(map(tuple, lmscore.perplexity(docs, lm).collect()))
    b = sorted(map(tuple, lmscore.perplexity(docs, lm, broadcast_lm=True).collect()))
    assert a == b
    lm.release()


def test_plan_no_python_udf_and_single_training_scan(spark):
    docs = _docs(spark, ["x y z"] * 8)
    out = lmscore.self_perplexity(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    # training frame is persisted: the scoring plan reads InMemoryTableScan
    # for the LM sides instead of re-running the corpus aggregation
    assert "InMemoryTableScan" in plan


def test_bucket_nulls_do_not_shift_scored_buckets(spark):
    """Review finding: NULL-perplexity docs must be EXCLUDED from the ntile
    frame — masked-but-present nulls sort first and absorb head-bucket
    slots, so a 'keep bucket 1' filter could keep nothing."""
    from dcspark import lmscore
    from pyspark.sql import functions as F

    rows = ([("d%d" % i, float(i)) for i in range(6)]
            + [("n%d" % i, None) for i in range(3)])
    scored = spark.createDataFrame(rows, "doc_id string, perplexity double")
    out = {r["doc_id"]: r["bucket"]
           for r in lmscore.perplexity_buckets(scored, n_buckets=3).collect()}
    assert [out["d%d" % i] for i in range(6)] == [1, 1, 2, 2, 3, 3]
    assert all(out["n%d" % i] is None for i in range(3))


def test_release_unpersists_the_persisted_frame(spark):
    """Review finding: with min_count>1, lm.bigrams is a filtered derivative
    — release() must unpersist the frame that was actually persisted."""
    from dcspark import lmscore
    from pyspark.sql import functions as F

    corpus = spark.createDataFrame(
        [("a", "x y x y x y"), ("b", "x y z w")], "doc_id string, text string")
    lm = lmscore.train_bigram_lm(corpus, min_count=2)
    cached = lm.bigrams._dcspark_cached[0]
    assert cached.storageLevel.useMemory
    lm.release()
    assert not cached.storageLevel.useMemory


def test_bucket_frame_propagates_cache_handle(spark):
    from dcspark import lmscore

    from dcspark import pipeline_ckpt

    corpus = spark.createDataFrame(
        [("a", "x y z"), ("b", "x y w")], "doc_id string, text string")
    scored = lmscore.self_perplexity(corpus)
    out = lmscore.perplexity_buckets(scored, n_buckets=2)
    handles = getattr(out, "_dcspark_cached", None)
    assert handles, "cache handle dropped across perplexity_buckets"
    out.collect()
    pipeline_ckpt.release_caches(out)
    assert not handles[0].storageLevel.useMemory
