"""Corpus vocabulary census (textops.token_census)."""

import pytest

from dcspark import textops


def test_counts_docfreq_share_and_tiebreak(spark):
    docs = spark.createDataFrame(
        [
            (0, "apple apple banana"),
            (1, "apple cherry cherry"),
            (2, "banana"),
        ],
        "doc_id long, text string",
    )
    rows = textops.token_census(docs, top_k=2).collect()
    # totals: apple 3 (2 docs), cherry 2 (1 doc), banana 2 (2 docs); 7 tokens
    assert [(r["token"], r["occurrences"], r["doc_freq"]) for r in rows] == [
        ("apple", 3, 2),
        ("banana", 2, 2),   # ties with cherry on occurrences -> lexicographic
    ]
    assert rows[0]["share"] == pytest.approx(round(3 / 7, 6))


def test_scale_plan_shape(spark):
    """Two-phase census gates: partial aggregation before both shuffles, a
    broadcast (not shuffled) one-row total, and top-k as
    TakeOrderedAndProject — never a global sort."""
    docs = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    df = textops.token_census(docs, top_k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan          # map-side combine on (token, doc_id)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan
    # never a global sort: no range-partitioned exchange anywhere in the plan
    assert "rangepartitioning" not in plan
