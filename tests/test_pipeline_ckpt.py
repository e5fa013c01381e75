"""Stage-boundary checkpoint/resume for pipeline operators (VERDICT r02 next
#7): kill-after-stage resume produces identical frames without recomputing
completed stages; parameter/input changes invalidate exactly what they touch."""

import json
import os

import pytest
from pyspark.sql import functions as F

from dcspark import decontam, pipeline_ckpt, textops

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy dog again and again!"),
    (3, "a completely different document about spark shuffle partitioning"),
    (4, "another unrelated text mentioning benchmarks and evaluation suites"),
    (5, "the quick brown fox jumps over the lazy dog again and again ok"),
]
EVAL = [(100, "spark shuffle partitioning"), (101, "no overlap here at all")]


@pytest.fixture()
def docs(spark, tmp_path):
    p = str(tmp_path / "docs")
    spark.createDataFrame(DOCS, "doc_id long, text string").write.parquet(p)
    return spark.read.parquet(p)


@pytest.fixture()
def eval_df(spark, tmp_path):
    p = str(tmp_path / "eval")
    spark.createDataFrame(EVAL, "doc_id long, text string").write.parquet(p)
    return spark.read.parquet(p)


def _pairs_key(rows):
    return sorted((r["doc_a"], r["doc_b"], r["jaccard"]) for r in rows)


def test_minhash_resume_matches_fresh_run(spark, docs, tmp_path):
    ck = str(tmp_path / "ck1")
    fresh = textops.minhash_near_dups(docs, threshold=0.5).collect()
    first = pipeline_ckpt.minhash_near_dups_resumable(docs, ck, threshold=0.5).collect()
    assert _pairs_key(first) == _pairs_key(fresh)
    # resume: stages served from parquet, builders never run
    calls = []
    orig = textops.lsh_candidate_pairs
    textops.lsh_candidate_pairs = lambda *a, **k: calls.append(1) or orig(*a, **k)
    try:
        again = pipeline_ckpt.minhash_near_dups_resumable(
            docs, ck, threshold=0.5).collect()
    finally:
        textops.lsh_candidate_pairs = orig
    assert calls == [], "candidates stage recomputed on resume"
    assert _pairs_key(again) == _pairs_key(fresh)


def test_minhash_kill_after_candidates_resumes_into_verify(spark, docs, tmp_path):
    """Simulate a driver killed between stages: candidates parquet committed,
    verify never ran. The resumed run must reuse candidates (file mtimes
    untouched) and complete the pipeline to the identical result."""
    ck = str(tmp_path / "ck2")
    sig = {
        "op": "minhash_near_dups", "num_hashes": 8, "rows_per_band": 2,
        "n": 3, "max_bucket": 1000,
        "input": pipeline_ckpt.input_lineage(docs),
    }
    stage_ck = pipeline_ckpt.StageCheckpoint(spark, ck, sig)
    stage_ck.stage("candidates", lambda: textops.lsh_candidate_pairs(docs))
    # "killed" here — scored.manifest.json does not exist
    assert stage_ck.completed("candidates")
    assert not stage_ck.completed("scored")
    mtimes = {
        f: os.path.getmtime(os.path.join(ck, "candidates", f))
        for f in os.listdir(os.path.join(ck, "candidates"))
    }
    out = pipeline_ckpt.minhash_near_dups_resumable(docs, ck, threshold=0.5).collect()
    fresh = textops.minhash_near_dups(docs, threshold=0.5).collect()
    assert _pairs_key(out) == _pairs_key(fresh)
    after = {
        f: os.path.getmtime(os.path.join(ck, "candidates", f))
        for f in os.listdir(os.path.join(ck, "candidates"))
    }
    assert after == mtimes, "candidates stage was rewritten on resume"


def test_signature_change_invalidates(spark, docs, tmp_path):
    ck = str(tmp_path / "ck3")
    pipeline_ckpt.minhash_near_dups_resumable(docs, ck, n=3).collect()
    # different shingle width -> different signature -> stages rebuild
    out4 = pipeline_ckpt.minhash_near_dups_resumable(docs, ck, n=4).collect()
    fresh4 = textops.minhash_near_dups(docs, n=4).collect()
    assert _pairs_key(out4) == _pairs_key(fresh4)
    with open(os.path.join(ck, "candidates.manifest.json")) as f:
        rec = json.load(f)
    assert rec["status"] == "done"


def test_input_change_invalidates(spark, docs, tmp_path):
    """New input files under the same path change the lineage signature, so a
    resumed run rescans instead of serving stale candidate pairs."""
    ck = str(tmp_path / "ck4")
    base = pipeline_ckpt.minhash_near_dups_resumable(docs, ck).collect()
    extra = docs.sparkSession.createDataFrame(
        [(6, "the quick brown fox jumps over the lazy dog again and again yes")],
        "doc_id long, text string")
    extra.write.mode("append").parquet(docs.inputFiles()[0].rsplit("/", 1)[0])
    docs2 = docs.sparkSession.read.parquet(
        docs.inputFiles()[0].rsplit("/", 1)[0])
    out = pipeline_ckpt.minhash_near_dups_resumable(docs2, ck).collect()
    fresh = textops.minhash_near_dups(docs2).collect()
    assert _pairs_key(out) == _pairs_key(fresh)
    assert len(out) > len(base)  # the new near-dup doc produced new pairs


def test_contamination_resume_matches_fresh(spark, docs, eval_df, tmp_path):
    ck = str(tmp_path / "ck5")
    fresh = decontam.contamination(docs, eval_df, n=3).collect()
    key = lambda rs: sorted(
        (r["doc_id"], r["matched_ngrams"], r["total_ngrams"]) for r in rs)
    first = pipeline_ckpt.contamination_resumable(docs, eval_df, ck, n=3).collect()
    assert key(first) == key(fresh)
    # resume path: report read from parquet, no recompute of the probe
    report_dir = os.path.join(ck, "report")
    mtimes = {f: os.path.getmtime(os.path.join(report_dir, f))
              for f in os.listdir(report_dir)}
    again = pipeline_ckpt.contamination_resumable(docs, eval_df, ck, n=3).collect()
    assert key(again) == key(fresh)
    assert mtimes == {f: os.path.getmtime(os.path.join(report_dir, f))
                      for f in os.listdir(report_dir)}


def test_cli_dedup_and_decontam_resumable(spark, docs, eval_df, tmp_path, capsys):
    """CLI surface for the resumable pipelines: dedup/decontam write parquet
    reports; a second run with the same --checkpoint serves stages from disk
    (manifest mtimes untouched)."""
    from dcspark.cli import main

    docs_dir = docs.inputFiles()[0].rsplit("/", 1)[0]
    eval_dir = eval_df.inputFiles()[0].rsplit("/", 1)[0]
    ck = str(tmp_path / "cli_ck")
    out = str(tmp_path / "pairs")
    rc = main(["dedup", "--input", docs_dir, "--output", out,
               "--checkpoint", ck, "--threshold", "0.5"])
    assert rc == 0
    pairs = spark.read.parquet(out)
    assert pairs.count() > 0 and set(pairs.columns) >= {"doc_a", "doc_b", "jaccard"}
    m = os.path.getmtime(os.path.join(ck, "candidates.manifest.json"))
    rc = main(["dedup", "--input", docs_dir, "--output", out,
               "--checkpoint", ck, "--threshold", "0.5"])
    assert rc == 0
    assert os.path.getmtime(os.path.join(ck, "candidates.manifest.json")) == m

    ck2 = str(tmp_path / "cli_ck2")
    rep = str(tmp_path / "report")
    rc = main(["decontam", "--input", docs_dir, "--eval", eval_dir,
               "--output", rep, "--checkpoint", ck2, "--ngram", "3"])
    assert rc == 0
    report = spark.read.parquet(rep)
    assert set(report.columns) == {"doc_id", "matched_ngrams", "total_ngrams",
                                   "contamination"}
    assert report.filter(F.col("contamination") > 0).count() == 1  # doc 3
    capsys.readouterr()
