"""Global duplicate-span coverage (textops.duplicate_span_stats) — the
distributable proxy for exact substring dedup (Lee et al. 2021).

Hand-computed fixtures at n_tokens=3; the DuckDB oracle parity for the same
operator runs in test_entry_parity (key ``duplicate_span_coverage``).
"""

import pytest

from dcspark import textops


@pytest.fixture(scope="module")
def result(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c d e f"),                 # shares 'a b c','b c d' with 1 & 4
            (1, "x y a b c d q r"),
            (2, "z z z z z"),                   # self-duplicated windows
            (3, "p q"),                          # shorter than the window
            (4, "a b c k l m b c d"),            # NON-adjacent dup windows (gap > n)
        ],
        "doc_id long, text string",
    )
    rows = textops.duplicate_span_stats(docs, n_tokens=3, min_count=2).collect()
    return {r["doc_id"]: r.asDict() for r in rows}


def test_cross_doc_duplicates(result):
    a = result[0]
    assert (a["n_tok"], a["n_windows"], a["dup_windows"]) == (6, 4, 2)
    # dup windows at pos 0,1 -> union [0,3) u [1,4) = 4 tokens
    assert a["dup_token_frac"] == pytest.approx(4 / 6)
    assert a["dup_window_frac"] == pytest.approx(2 / 4)

    b = result[1]
    assert (b["n_tok"], b["n_windows"], b["dup_windows"]) == (8, 6, 2)
    assert b["dup_token_frac"] == pytest.approx(4 / 8)


def test_within_doc_duplicates_count(result):
    # 'z z z' occurs 3x INSIDE doc 2 — self-repetition is duplication too
    c = result[2]
    assert c["dup_windows"] == 3
    assert c["dup_token_frac"] == 1.0            # [0,3)u[1,4)u[2,5) = all 5 tokens
    assert c["dup_window_frac"] == 1.0


def test_short_doc_zeroes(result):
    d = result[3]
    assert (d["n_windows"], d["dup_windows"]) == (0, 0)
    assert d["dup_token_frac"] == 0.0 and d["dup_window_frac"] == 0.0


def test_interval_union_caps_gap_contribution(result):
    # doc 4 dup windows at pos 0 and 6 (gap 6 > n=3): union is 3 + 3 = 6 of 9
    e = result[4]
    assert e["dup_windows"] == 2
    assert e["dup_token_frac"] == pytest.approx(6 / 9)


def test_scale_plan_shape(spark):
    """Gates: the global count shuffles partial-agg'd 16-byte digests (never
    text), and no Window/sort-all-rows operator appears."""
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    df = textops.duplicate_span_stats(docs, n_tokens=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(digest" in plan
    assert "partial_count" in plan        # map-side combine before the shuffle
    assert "Window" not in plan
    # the digest is raw binary md5 (16 bytes), not the 32-char hex string
    assert "unhex(md5(" in plan


def test_single_tokenization_let_binding(spark):
    """Review finding: without the let-binding, the full-text tokenization
    regexp re-evaluates once PER WINDOW (measured 26x / quadratic on an
    8k-token doc). The bound form references regexp_extract_all exactly once
    in the whole plan."""
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    plan = (
        textops.span_window_table(docs, n_tokens=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("regexp_extract_all") == 1
    # fused compact frame: the whole pipeline tokenizes once — totals, the
    # global count, and the semi-join probe ALL read the persisted spans
    # frame (three InMemoryTableScans over one cached tokenize+md5 pass)
    out = textops.duplicate_span_stats(docs, n_tokens=3)
    out.collect()
    full = out._jdf.queryExecution().executedPlan().toString()
    assert full.count("InMemoryTableScan") >= 3
    from dcspark import pipeline_ckpt
    pipeline_ckpt.release_caches(out)
