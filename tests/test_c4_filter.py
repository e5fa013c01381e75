"""C4 page-cleaning heuristics (textops.c4_page_stats), Raffel et al. 2020.

Hand-built fixtures; DuckDB oracle parity runs in test_entry_parity
(key ``c4_page_filter``).
"""

import pytest

from dcspark import textops


def _stats(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r["doc_id"]: r.asDict() for r in textops.c4_page_stats(df).collect()}


GOOD = "this sentence definitely has enough words to keep."


def test_line_and_page_rules(spark):
    out = _stats(spark, [
        # 0: three keepable lines -> page kept
        "\n".join([GOOD, "Another full sentence with plenty of words here!",
                   'A third quoted line with at least five words."']),
        # 1: enough words but no terminal punctuation
        "\n".join([GOOD, "this line has many words but no terminal mark",
                   GOOD, GOOD]),
        # 2: short lines dropped as short even when punctuated
        "\n".join([GOOD, "too short.", GOOD, GOOD]),
        # 3: lorem ipsum poisons an otherwise keepable page
        "\n".join([GOOD, GOOD, GOOD, "filler lorem ipsum dolor sit amet."]),
        # 4: curly brace -> code page
        "\n".join([GOOD, GOOD, GOOD, "function f() { return 1; }"]),
        # 5: only two kept lines -> below the 3-sentence gate
        "\n".join([GOOD, GOOD]),
    ])

    a = out[0]
    assert (a["n_lines"], a["kept_lines"], a["removed_short"],
            a["removed_no_punct"]) == (3, 3, 0, 0)
    assert a["page_keep"] is True
    assert a["cleaned_text"].count("\n") == 2

    b = out[1]
    assert (b["kept_lines"], b["removed_no_punct"], b["removed_short"]) == (3, 1, 0)
    assert b["page_keep"] is True

    c = out[2]
    assert (c["kept_lines"], c["removed_short"]) == (3, 1)

    d = out[3]
    assert d["has_lorem"] is True and d["page_keep"] is False
    assert d["kept_lines"] == 4  # the lorem line itself passes the line rules

    e = out[4]
    assert e["has_brace"] is True and e["page_keep"] is False

    f = out[5]
    assert f["kept_lines"] == 2 and f["page_keep"] is False


def test_empty_and_whitespace_lines_ignored(spark):
    out = _stats(spark, ["\n\n  \n" + GOOD + "\n\n"])
    assert out[0]["n_lines"] == 1
    assert out[0]["kept_lines"] == 1
    assert out[0]["cleaned_text"] == GOOD


def test_word_count_precedence_over_punctuation(spark):
    # a 2-word unpunctuated line is counted as SHORT, not as no-punct
    out = _stats(spark, ["two words"])
    assert (out[0]["removed_short"], out[0]["removed_no_punct"]) == (1, 0)


def test_row_local_plan_no_shuffle(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    plan = textops.c4_page_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "HashAggregate" not in plan and "SortAggregate" not in plan


def test_crlf_lines_keep_terminal_punctuation(spark):
    # review finding: split('\n') on a CRLF page leaves '\r' at line end;
    # space-only trim would defeat the terminal-punctuation check and drop
    # every line of every CRLF web page
    out = _stats(spark, ["\r\n".join([GOOD, GOOD, GOOD]), "\r\n \r \n"])
    assert out[0]["kept_lines"] == 3 and out[0]["page_keep"] is True
    assert "\r" not in out[0]["cleaned_text"]
    assert out[1]["n_lines"] == 0  # '\r'-only lines are empty, not lines


def test_single_tokenization_per_line(spark):
    # the per-line token regexp must appear once (the tagged-struct pass),
    # not once per derived filter
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    plan = textops.c4_page_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("regexp_extract_all") == 1


def test_text_quality_report_single_pass(spark):
    """Combined report equals the individual operators column-for-column and
    is still ONE map-only projection (no join/shuffle between the rule
    families — three scans collapsed into one)."""
    docs = spark.createDataFrame(
        [(0, GOOD + "\n" + GOOD), (1, "dup\ndup\n" + GOOD), (2, "")],
        "doc_id long, text string",
    )
    combined = {r["doc_id"]: r.asDict()
                for r in textops.text_quality_report(docs).collect()}
    rep = {r["doc_id"]: r.asDict()
           for r in textops.repetition_stats(docs).collect()}
    c4 = {r["doc_id"]: r.asDict()
          for r in textops.c4_page_stats(docs).collect()}
    dq = {r["doc_id"]: r.asDict()
          for r in textops.doc_quality(docs).collect()}
    for i in combined:
        for k, v in rep[i].items():
            assert combined[i][k] == v, (i, k)
        for k, v in c4[i].items():
            assert combined[i][k] == v, (i, k)
        for k, v in dq[i].items():
            assert combined[i][k] == v, (i, k)
    plan = (textops.text_quality_report(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Join" not in plan
    # ONE document-level tokenization shared by repetition + quality (review
    # finding: an extra F.size(words_expr()) tokenized every doc twice); the
    # only other token regexp is C4's inherently per-line one
    assert plan.count("regexp_extract_all(lower(text") == 1
