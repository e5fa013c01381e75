"""Gopher/MassiveText repetition-quality metrics (textops.repetition_stats).

Rule semantics follow Rae et al. 2021 appendix A1.1 (the MassiveText
repetition filters, also shipped in NVIDIA NeMo Curator): duplicate-line
fraction / duplicate-line character fraction / top-2-gram character coverage
/ duplicated-5-gram character coverage, each with the paper's threshold.
Values here are hand-computed; the DuckDB oracle parity for the same operator
runs in test_entry_parity (key ``gopher_repetition_flags``).
"""

import pytest

from dcspark import textops


def _stats(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = textops.repetition_stats(df).collect()
    return {r["doc_id"]: r.asDict() for r in rows}


def test_hand_computed_metrics(spark):
    out = _stats(spark, [
        # 0: 3x duplicate line + 1 unique; "hello world" dominant bigram
        "Hello world\nhello world\nHELLO WORLD\nunique line",
        # 1: degenerate bigram loop; duplicated 5-grams overshoot -> cap at 1.0
        "buy now buy now buy now buy now buy now buy now",
        # 2: clean short doc, <5 words -> no 5-grams
        "one two three",
        # 3: single word -> no bigrams at all
        "word",
        # 4: whitespace-only -> every denominator zero, no NaN/NULL
        "  \n \n ",
    ])

    a = out[0]
    assert a["n_lines"] == 4
    assert a["dup_line_frac"] == pytest.approx(0.5)        # (4-2)/4
    assert a["dup_line_char_frac"] == pytest.approx(0.5)   # (44-22)/44
    # "hello world" x3, 10 word-chars per occurrence, 40 total word chars
    assert a["top_bigram_char_frac"] == pytest.approx(30 / 40)
    assert a["dup_5gram_char_frac"] == 0.0                 # all 5-grams distinct
    assert a["flagged"] is True

    b = out[1]
    assert b["n_lines"] == 1
    assert b["dup_line_frac"] == 0.0
    assert b["top_bigram_char_frac"] == pytest.approx(1.0)  # 6 * 6 / 36
    assert b["dup_5gram_char_frac"] == 1.0                  # 120/36 capped
    assert b["flagged"] is True

    c = out[2]
    # both bigrams count 1: tie-break -> lexicographically smallest "one two"
    assert c["top_bigram_char_frac"] == pytest.approx(6 / 11)
    assert c["dup_5gram_char_frac"] == 0.0
    assert c["flagged"] is True  # 6/11 > 0.20 top-bigram threshold

    d = out[3]
    assert d["top_bigram_char_frac"] == 0.0
    assert d["flagged"] is False

    e = out[4]
    assert e["n_lines"] == 0
    for k in ("dup_line_frac", "dup_line_char_frac",
              "top_bigram_char_frac", "dup_5gram_char_frac"):
        assert e[k] == 0.0, k
    assert e["flagged"] is False


def test_tie_break_is_lexicographic(spark):
    # bigrams "a a", "b a", "b b" all count 1; sorted-run scan must keep the
    # FIRST max run ("a a"), matching the oracle's ORDER BY c DESC, gram ASC
    out = _stats(spark, ["b b a a"])
    assert out[0]["top_bigram_char_frac"] == pytest.approx(2 / 4)


def test_duplicated_5gram_accounting(spark):
    # "a b c d e" x3 (word-wise): 11 5-grams, the 5 rotations each appear
    # 2-3 times; every gram duplicated -> coverage far above 1 -> capped
    text = " ".join(["a b c d e"] * 3)
    out = _stats(spark, [text])
    assert out[0]["dup_5gram_char_frac"] == 1.0


def test_row_local_plan_no_shuffle(spark):
    """Scale gate: the whole operator is one map-only projection — no
    Exchange (shuffle), no aggregate, a single scan of the input."""
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = textops.repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "HashAggregate" not in plan and "SortAggregate" not in plan


def test_crlf_and_tab_edges_trimmed(spark):
    # lines_expr strips ALL whitespace at line edges ('\r' from CRLF, tabs),
    # so duplicate-line detection is not defeated by line-ending style
    out = _stats(spark, ["dup line\r\ndup line\t\n  dup line  "])
    assert out[0]["n_lines"] == 3
    assert out[0]["dup_line_frac"] == pytest.approx(2 / 3)
