"""Domain-mixture reweighting (dcspark/sampling.py mixture_plan/sample)."""

import pytest
from pyspark.sql import functions as F

from dcspark import sampling


def _docs(spark):
    # 3 domains: a=60 docs x 10 tokens, b=30 x 10, c=10 x 10 (+1 NULL domain)
    rows = ([(i, "a", 10) for i in range(60)]
            + [(100 + i, "b", 10) for i in range(30)]
            + [(200 + i, "c", 10) for i in range(10)]
            + [(999, None, 10)])
    return spark.createDataFrame(rows, "doc_id long, domain string, tokens long")


def test_plan_math_and_cap(spark):
    docs = _docs(spark)
    plan = {r["domain"]: r for r in sampling.mixture_plan(
        docs, "domain", {"a": 1.0, "c": 1.0},
        budget_tokens=400.0, token_col="tokens").collect()}
    assert set(plan) == {"a", "c"}  # b and NULL unlisted -> no row
    assert plan["a"]["fraction"] == pytest.approx(400 * 0.5 / 600)
    assert plan["c"]["fraction"] == 1.0  # 200 wanted > 100 available -> capped
    assert plan["a"]["tokens"] == 600.0 and plan["a"]["docs"] == 60


def test_budget_share_uses_whole_corpus_total(spark):
    docs = _docs(spark)
    # grand total includes b and the NULL domain: 1010 tokens
    plan = {r["domain"]: r["fraction"] for r in sampling.mixture_plan(
        docs, "domain", {"a": 1.0}, budget_share=0.5,
        token_col="tokens").collect()}
    assert plan["a"] == pytest.approx(0.5 * 1010 / 600)


def test_sample_is_deterministic_and_capped_domain_kept_whole(spark):
    docs = _docs(spark)
    kept = sampling.mixture_sample(
        docs, "doc_id", "domain", {"a": 1.0, "c": 1.0},
        budget_tokens=400.0, token_col="tokens", salt="s")
    rows = kept.collect()
    again = sampling.mixture_sample(
        docs.repartition(7), "doc_id", "domain", {"a": 1.0, "c": 1.0},
        budget_tokens=400.0, token_col="tokens", salt="s").collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(r["doc_id"] for r in again)
    c_kept = [r for r in rows if 200 <= r["doc_id"] < 300]
    assert len(c_kept) == 10  # fraction 1.0 -> whole domain
    assert not any(r["doc_id"] == 999 for r in rows)  # NULL domain dropped
    assert not any(100 <= r["doc_id"] < 200 for r in rows)  # unlisted dropped
    # sampled domain keeps roughly its fraction (draw is uniform; wide bound)
    a_kept = [r for r in rows if r["doc_id"] < 100]
    assert 5 <= len(a_kept) <= 40


def test_arg_validation(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError):
        sampling.mixture_plan(docs, "domain", {"a": 1.0})
    with pytest.raises(ValueError):
        sampling.mixture_plan(docs, "domain", {"a": 1.0},
                              budget_tokens=1.0, budget_share=0.5)
    with pytest.raises(ValueError):
        sampling.mixture_plan(docs, "domain", {"a": 0.0}, budget_tokens=1.0)
