"""WER/CER: edit-distance DP (vectorized prefix-min scan) + Spark reports."""

import numpy as np
import pytest
from pyspark.sql.functions import col as F_col

from dcspark.wer import corpus_error_rate, edit_counts, error_report


def _brute_distance(ref, hyp):
    """Textbook O(n*m) scalar Levenshtein — the oracle for the vectorized DP."""
    n, m = len(ref), len(hyp)
    dp = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        dp[i][0] = i
    for j in range(m + 1):
        dp[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            dp[i][j] = min(dp[i - 1][j - 1] + (ref[i - 1] != hyp[j - 1]),
                           dp[i - 1][j] + 1, dp[i][j - 1] + 1)
    return dp[n][m]


def test_edit_counts_known_cases():
    assert edit_counts("abc".split(), "abc".split()) == (0, 0, 0)
    assert edit_counts(list("kitten"), list("sitting")) == (2, 1, 0)
    assert edit_counts("the cat sat".split(), "the cat".split()) == (0, 0, 1)
    assert edit_counts("the cat".split(), "the big cat".split()) == (0, 1, 0)
    assert edit_counts("a b c".split(), "x y z".split()) == (3, 0, 0)
    assert edit_counts([], ["x", "y"]) == (0, 2, 0)
    assert edit_counts(["x", "y"], []) == (0, 0, 2)


def test_total_edits_match_brute_force_on_random_pairs():
    rng = np.random.default_rng(7)
    vocab = list("abcdefg")
    for _ in range(200):
        ref = [vocab[i] for i in rng.integers(0, len(vocab), rng.integers(0, 12))]
        hyp = [vocab[i] for i in rng.integers(0, len(vocab), rng.integers(0, 12))]
        s, i, d = edit_counts(ref, hyp)
        assert s + i + d == _brute_distance(ref, hyp), (ref, hyp)


def test_sid_breakdown_is_consistent():
    """Alignment identity: ref_len = matches + S + D, hyp_len = matches + S + I."""
    rng = np.random.default_rng(11)
    vocab = list("abcde")
    for _ in range(100):
        ref = [vocab[i] for i in rng.integers(0, 5, rng.integers(1, 10))]
        hyp = [vocab[i] for i in rng.integers(0, 5, rng.integers(1, 10))]
        s, i, d = edit_counts(ref, hyp)
        # matches from ref side and hyp side must agree
        assert len(ref) - s - d == len(hyp) - s - i


def test_error_report_word_level(spark):
    rows = [("a", "the quick brown fox", "the quick brown fox"),
            ("b", "the quick brown fox", "the quikc brown fox"),
            ("c", "hello world", "hello big world"),
            ("d", "one two three", "one two"),
            ("e", None, "ghost words here")]
    df = spark.createDataFrame(rows, "id string, ref string, hyp string")
    got = {r["id"]: r for r in error_report(df).collect()}
    assert got["a"]["edits"] == 0 and got["a"]["error_rate"] == 0.0
    assert got["b"]["substitutions"] == 1 and got["b"]["edits"] == 1
    assert got["b"]["error_rate"] == pytest.approx(0.25)
    assert got["c"]["insertions"] == 1
    assert got["d"]["deletions"] == 1
    assert got["e"]["ref_len"] == 0 and got["e"]["insertions"] == 3


def test_error_report_char_level_cer(spark):
    df = spark.createDataFrame([("x", "abcd", "abxd")], "id string, ref string, hyp string")
    r = error_report(df, char_level=True).collect()[0]
    assert r["substitutions"] == 1 and r["ref_len"] == 4
    assert r["error_rate"] == pytest.approx(0.25)


def test_corpus_rate_is_pooled_not_mean(spark):
    # short utterance with 100% WER + long utterance with 0% -> pooled rate
    # is 1/11, NOT the 0.5 a mean of per-row rates would give
    rows = [("s", "yes", "no"),
            ("l", " ".join(["w%d" % i for i in range(10)]),
             " ".join(["w%d" % i for i in range(10)]))]
    df = spark.createDataFrame(rows, "id string, ref string, hyp string")
    agg = corpus_error_rate(error_report(df)).collect()[0]
    assert agg["ref_tokens"] == 11 and agg["edits"] == 1
    assert agg["error_rate"] == pytest.approx(1 / 11)


def test_wer_against_transcript_corruption(spark):
    """The synth wrong_transcript corruption appends one word — WER must see
    exactly one insertion per corrupted row and zero edits elsewhere."""
    from dcspark import synth

    clips = synth.generate_audio_table(
        spark, 80, seed=42, corrupt={"wrong_transcript": 0.2},
        dur_lo=200, dur_hi=500, num_partitions=4)
    ref = synth.generate_transcripts_ref(spark, 80, seed=42, num_partitions=4)
    joined = clips.select("clip_id", F_col("transcript").alias("hyp")).join(
        ref.select("clip_id", F_col("text").alias("ref")), "clip_id")
    rep = error_report(joined, id_col="clip_id")
    rows = rep.collect()
    bad = [r for r in rows if r["edits"] > 0]
    assert len(bad) > 0
    for r in bad:
        assert (r["substitutions"], r["insertions"], r["deletions"]) == (0, 1, 0)



def test_edit_distance_only_matches_brute():
    from dcspark.wer import edit_distance_only

    rng = np.random.default_rng(23)
    for _ in range(100):
        ref = list(rng.integers(0, 6, rng.integers(0, 15)))
        hyp = list(rng.integers(0, 6, rng.integers(0, 15)))
        assert edit_distance_only(np.array(ref), np.array(hyp)) == \
            _brute_distance(ref, hyp)


def test_backtrace_limit_falls_back_to_distance_only(spark, monkeypatch):
    import dcspark.wer as wer_mod

    monkeypatch.setattr(wer_mod, "BACKTRACE_CELL_LIMIT", 10)
    df = spark.createDataFrame(
        [("x", "a b c d e", "a b x d e")], "id string, ref string, hyp string")
    r = wer_mod.error_report(df).collect()[0]
    assert r["edits"] == 1 and r["error_rate"] == pytest.approx(0.2)
    assert r["substitutions"] is None and r["insertions"] is None


def test_null_hypothesis_scores_as_deletions(spark):
    df = spark.createDataFrame(
        [("x", "one two three", None)], "id string, ref string, hyp string")
    r = error_report(df).collect()[0]
    assert r["deletions"] == 3 and r["error_rate"] == pytest.approx(1.0)


def test_cli_wer_reference_anchored(tmp_path, capsys, spark):
    """References without hypotheses count as deletions; orphan hypotheses
    warn; empty intersections report 'undefined' instead of crashing."""
    from dcspark.cli import main

    hyp_p, ref_p = str(tmp_path / "hyp"), str(tmp_path / "ref")
    spark.createDataFrame(
        [("a", "hello world"), ("zz", "orphan row")],
        "clip_id string, transcript string").write.parquet(hyp_p)
    spark.createDataFrame(
        [("a", "hello world"), ("b", "missing entirely")],
        "clip_id string, text string").write.parquet(ref_p)
    out_p = str(tmp_path / "rep")
    assert main(["wer", "--input", hyp_p, "--ref", ref_p,
                 "--output", out_p, "--master", "local[2]"]) == 0
    txt = capsys.readouterr().out
    assert "warning: 1 hypothesis rows have no reference" in txt
    assert "D=2" in txt  # ref 'b' scored as two deletions

    # disjoint ids -> undefined, exit 1, no crash
    bad_hyp = str(tmp_path / "hyp2")
    spark.createDataFrame([("q", "x")], "clip_id string, transcript string"
                          ).write.parquet(bad_hyp)
    empty_ref = str(tmp_path / "ref2")
    spark.createDataFrame([], "clip_id string, text string").write.parquet(empty_ref)
    assert main(["wer", "--input", bad_hyp, "--ref", empty_ref,
                 "--output", str(tmp_path / "rep2"), "--master", "local[2]"]) == 1
    assert "undefined" in capsys.readouterr().out


def test_edit_counts_total_matches_spark_levenshtein(spark):
    """Third independent implementation check: char-level DP totals equal
    Spark's JVM levenshtein on random strings."""
    from pyspark.sql.functions import levenshtein, lit

    rng = np.random.default_rng(31)
    alphabet = "abcdef "
    pairs = []
    for i in range(40):
        a = "".join(alphabet[j] for j in rng.integers(0, len(alphabet),
                                                      rng.integers(0, 30)))
        b = "".join(alphabet[j] for j in rng.integers(0, len(alphabet),
                                                      rng.integers(0, 30)))
        pairs.append((str(i), a, b))
    df = spark.createDataFrame(pairs, "id string, a string, b string")
    jvm = {r["id"]: r["d"] for r in
           df.select("id", levenshtein("a", "b").alias("d")).collect()}
    for rid, a, b in pairs:
        s, i, d = edit_counts(list(a), list(b))
        assert s + i + d == jvm[rid], (a, b)


def test_corpus_rate_survives_zero_reference_tokens(spark):
    """Review finding: an all-empty-reference frame must report a rate, not
    abort with DIVIDE_BY_ZERO under ANSI mode."""
    from dcspark import wer as wer_mod
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", "", "some hyp words"), ("b", "", "more words")],
        "clip_id string, ref string, hyp string")
    rep = wer_mod.error_report(df, id_col="clip_id", ref_col="ref", hyp_col="hyp")
    row = wer_mod.corpus_error_rate(rep).collect()[0]
    assert row["ref_tokens"] == 0
    assert row["error_rate"] == row["edits"]  # denominator floored at 1
