"""Benchmark decontamination (dcspark/decontam.py): n-gram collision counts,
ratio semantics, short-doc handling, drop-list threshold, broadcast plan gate."""

import pytest
from pyspark.sql import functions as F

from dcspark import decontam

# 8 tokens = exactly one 4-gram window at n=4 etc.; use n=3 for readability
DOCS = [
    (1, "a b c d e f"),            # shares "b c d" + "c d e" with eval doc
    (2, "x y z w q r"),            # clean
    (3, "a b c d e f"),            # exact copy of doc 1 (same overlap)
    (4, "one two"),                # shorter than n: no n-grams
    (5, "b c d b c d b c d"),      # repeated gram counted once (distinct)
]
EVAL = [(100, "q q b c d e q q"),  # contains "b c d" and "c d e"
        (101, "nothing shared here at all")]


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    ev = spark.createDataFrame(EVAL, "eval_id long, text string")
    return docs, ev


def _report(spark, frames, n=3):
    docs, ev = frames
    rep = decontam.contamination(docs, ev, n=n)
    return {r["doc_id"]: r for r in rep.collect()}


def test_counts_and_ratio(spark, frames):
    by_id = _report(spark, frames)
    # doc 1: 4 distinct 3-grams, 2 matched ("b c d", "c d e")
    assert (by_id[1]["matched_ngrams"], by_id[1]["total_ngrams"]) == (2, 4)
    assert by_id[1]["contamination"] == pytest.approx(0.5)
    assert by_id[3]["contamination"] == by_id[1]["contamination"]
    assert (by_id[2]["matched_ngrams"], by_id[2]["contamination"]) == (0, 0.0)
    # repeated gram: distinct n-grams only — "b c d" counts once of 3 distinct
    assert by_id[5]["total_ngrams"] == 3
    assert by_id[5]["matched_ngrams"] == 1
    # shorter than n: no n-grams, not in the report
    assert 4 not in by_id


def test_contaminated_ids_threshold(spark, frames):
    docs, ev = frames
    flagged = sorted(
        r["doc_id"] for r in decontam.contaminated_ids(docs, ev, n=3).collect())
    assert flagged == [1, 3, 5]
    strict = sorted(
        r["doc_id"]
        for r in decontam.contaminated_ids(docs, ev, n=3, threshold=0.4).collect())
    assert strict == [1, 3]


def test_eval_side_broadcast_no_corpus_shuffle_before_join(spark, frames):
    docs, ev = frames
    rep = decontam.contamination(docs, ev, n=3)
    rep.collect()
    plan = rep._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # allowed exchanges: eval-side distinct (benchmark-sized), the broadcast
    # itself, and the final doc_id aggregation fed by a map-side partial —
    # the corpus-side probe join shuffles nothing
    assert plan.count("Exchange") <= 3
    assert "partial" in plan.lower()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_unicode_and_case_folding(spark):
    docs = spark.createDataFrame([(1, "Foo BAR Baz qux")], "doc_id long, text string")
    ev = spark.createDataFrame([(9, "foo bar baz nope")], "eval_id long, text string")
    rep = decontam.contamination(docs, ev, n=3).collect()[0]
    assert rep["matched_ngrams"] == 1  # "foo bar baz" matches case-folded


def test_eval_side_falls_back_to_shuffle_join_above_broadcast_budget(spark, frames):
    """VERDICT r02 next #8: a multi-benchmark eval union can outgrow the
    broadcast budget; above broadcast_max_grams the probe must become a
    shuffle join (correct, just not map-side) — identical results."""
    docs, ev = frames
    bc = decontam.contamination(docs, ev, n=3).collect()
    sh = decontam.contamination(docs, ev, n=3, broadcast_max_grams=0)
    rows = sh.collect()
    plan = sh._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    key = lambda rs: sorted((r["doc_id"], r["matched_ngrams"], r["total_ngrams"]) for r in rs)
    assert key(rows) == key(bc)
