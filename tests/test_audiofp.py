"""Acoustic fingerprint near-dup (dcspark/audiofp.py): gain invariance, noise
robustness, discrimination, skew-bucket capping, and the candidate-join plan
shape (bucketed equi-join, never all-pairs)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dcspark.audiofp import (
    audio_fingerprint_near_dup,
    audio_fingerprints,
    audio_near_dup,
    fingerprint_hashes,
)
from dcspark.synth import wav_bytes

SR = 16000
T = np.arange(SR * 2) / SR


def _mix(freqs, amps):
    x = sum(a * np.sin(2 * np.pi * f * T) for f, a in zip(freqs, amps))
    return (x / np.max(np.abs(x)) * 20000).astype(np.int16)


def _chirp():
    return (np.sin(2 * np.pi * (300 + 600 * T) * T) * 20000).astype(np.int16)


def _noisy(pcm, sigma, seed=3):
    rng = np.random.default_rng(seed)
    return (pcm.astype(np.float32) + rng.normal(0, sigma, len(pcm))).clip(
        -32768, 32767).astype(np.int16)


def _rand_clip(i):
    r = np.random.default_rng(100 + i)
    return _mix(r.uniform(320, 2800, 3), r.uniform(0.3, 1.0, 3))


# -- numpy-level invariants ---------------------------------------------------


def test_fingerprint_gain_invariant():
    a = _mix([440, 880, 1320], [1, 0.5, 0.25])
    b = (a.astype(np.float32) * 0.5).astype(np.int16)
    assert set(fingerprint_hashes(a, SR).tolist()) == set(
        fingerprint_hashes(b, SR).tolist())


def test_fingerprint_noise_robust_on_chirp():
    c = _chirp()
    ha = set(fingerprint_hashes(c, SR).tolist())
    hb = set(fingerprint_hashes(_noisy(c, 200), SR).tolist())
    assert len(ha & hb) / min(len(ha), len(hb)) >= 0.8


def test_fingerprint_discriminates_distinct_clips():
    hashes = [set(fingerprint_hashes(_rand_clip(i), SR).tolist()) for i in range(20)]
    for i in range(20):
        for j in range(i + 1, 20):
            inter = len(hashes[i] & hashes[j])
            assert inter / max(1, min(len(hashes[i]), len(hashes[j]))) < 0.35


def test_fingerprint_short_clip_empty():
    assert fingerprint_hashes(np.zeros(10, dtype=np.int16), SR).size == 0


# -- Spark operator -----------------------------------------------------------


@pytest.fixture(scope="module")
def clip_table(spark):
    rows = []
    for i in range(25):
        rows.append((f"clip_{i:03d}", wav_bytes(_rand_clip(i), SR)))
    base = _rand_clip(0)
    rows.append(("dup_gain", wav_bytes(
        (base.astype(np.float32) * 0.5).astype(np.int16), SR)))
    ch = _chirp()
    rows.append(("chirp_orig", wav_bytes(ch, SR)))
    rows.append(("chirp_noise", wav_bytes(_noisy(ch, 200), SR)))
    rows.append(("broken", b"\x00\x01not-a-wav"))
    return spark.createDataFrame(rows, "clip_id string, bytes binary").repartition(4)


def test_fingerprints_and_decode_audit(spark, clip_table):
    fp = audio_fingerprints(clip_table)
    bad = fp.filter(F.col("decode_error").isNotNull()).collect()
    assert [r["clip_id"] for r in bad] == ["broken"]
    ok = fp.filter(F.col("hash").isNotNull())
    # every decodable 2s clip yields one hash per 32ms hop
    per_clip = {r["clip_id"]: r["n"] for r in
                ok.groupBy("clip_id").agg(F.count("*").alias("n")).collect()}
    assert len(per_clip) == 28 and min(per_clip.values()) >= 50


def test_near_dup_detects_planted_pairs_only(spark, clip_table):
    pairs = audio_near_dup(clip_table, threshold=0.35).collect()
    got = {tuple(sorted((r["id_a"], r["id_b"]))) for r in pairs}
    assert ("chirp_noise", "chirp_orig") in got
    assert ("clip_000", "dup_gain") in got
    # no false pairs among the 25 distinct clips
    assert all("dup" in a + b or "chirp" in a + b for a, b in got)
    by_pair = {tuple(sorted((r["id_a"], r["id_b"]))): r["score"] for r in pairs}
    assert by_pair[("clip_000", "dup_gain")] == 1.0


def test_near_dup_bucket_cap_drops_degenerate_hash(spark):
    """Silence produces one degenerate hash shared by every silent clip; the
    max_bucket guard must drop that bucket instead of emitting a quadratic
    blowup of pairs."""
    silent = wav_bytes(np.zeros(SR, dtype=np.int16), SR)
    rows = [(f"s{i}", silent) for i in range(12)]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    fp = audio_fingerprints(df)
    capped = audio_fingerprint_near_dup(fp, threshold=0.1, max_bucket=5)
    assert capped.count() == 0
    uncapped = audio_fingerprint_near_dup(fp, threshold=0.1, max_bucket=100)
    assert uncapped.count() == 12 * 11 // 2


CONTRACT = """
id: audio-fp-contract
models:
  clips:
    fields:
      clip_id: {type: string, primaryKey: true}
      bytes: {type: bytes}
    quality:
      - {type: audio, invariant: content-uniqueness,
         description: no near-duplicate recordings}
"""


def test_contract_content_uniqueness_fails_on_planted_dups(spark, clip_table):
    from dcspark import DataContractSpecification, ValidationConfig, validate
    from dcspark.run_model import ResultEnum

    spec = DataContractSpecification.from_string(CONTRACT)
    res = validate(spark, spec, {"clips": clip_table}, ValidationConfig())
    by_key = {c.key: c for c in res.run.checks}
    chk = by_key["clips__audio_content_uniqueness_0"]
    assert chk.result == ResultEnum.failed
    # planted pairs: (clip_000, dup_gain) and (chirp_orig, chirp_noise)
    assert res.metrics["clips__audio_content_uniqueness_0"] == 2.0
    vio = [r for r in res.violations.collect()
           if r["check_key"] == "clips__audio_content_uniqueness_0"]
    assert {r["clip_id"] for r in vio} == {"chirp_noise|chirp_orig",
                                           "clip_000|dup_gain"}


def test_contract_content_uniqueness_passes_distinct(spark):
    from dcspark import DataContractSpecification, ValidationConfig, validate
    from dcspark.run_model import ResultEnum

    rows = [(f"c{i}", wav_bytes(_rand_clip(i), SR)) for i in range(8)]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    spec = DataContractSpecification.from_string(CONTRACT)
    res = validate(spark, spec, {"clips": df}, ValidationConfig())
    chk = {c.key: c for c in res.run.checks}["clips__audio_content_uniqueness_0"]
    assert chk.result == ResultEnum.passed


def test_contract_content_uniqueness_threshold_form(spark, clip_table):
    """mustBe* forms apply to the pair count: allowing up to 2 pairs passes
    the corrupted fixture."""
    from dcspark import DataContractSpecification, ValidationConfig, validate
    from dcspark.run_model import ResultEnum

    contract = CONTRACT.replace(
        "description: no near-duplicate recordings}",
        "mustBeLessThanOrEqualTo: 2}")
    spec = DataContractSpecification.from_string(contract)
    res = validate(spark, spec, {"clips": clip_table}, ValidationConfig())
    chk = {c.key: c for c in res.run.checks}["clips__audio_content_uniqueness_0"]
    assert chk.result == ResultEnum.passed


FUSED_CONTRACT = """
id: audio-fp-fused
models:
  clips:
    fields:
      clip_id: {type: string, primaryKey: true}
      bytes: {type: bytes}
      sr_hz: {type: integer}
      dur_ms: {type: integer}
      codec: {type: string}
    quality:
      - {type: audio, invariant: decode-conformance}
      - {type: audio, invariant: content-uniqueness}
"""


def _conformant_table(spark, clip_table):
    """clip_table + the header columns decode-conformance validates."""
    rows = []
    for r in clip_table.collect():
        dur = None
        if r["clip_id"] != "broken":
            n = (len(r["bytes"]) - 44) // 2
            dur = int(round(n / SR * 1000))
        rows.append((r["clip_id"], r["bytes"], SR, dur, "pcm_s16le"))
    return spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string"
    ).repartition(4)


def test_fused_content_uniqueness_single_decode_pass(spark, clip_table):
    """With decode-conformance AND content-uniqueness in one contract, the
    fingerprints must come out of the SAME mapInArrow decode pass — the
    payload corpus is decoded exactly once (VERDICT.md defect-#1 class)."""
    from dcspark import DataContractSpecification, ValidationConfig, validate
    from dcspark.run_model import ResultEnum

    df = _conformant_table(spark, clip_table)
    decoded_rows = spark.sparkContext.accumulator(0)

    def counting_snr(clip_id, sr, dur, pcm):
        decoded_rows.add(1)
        return None  # skip the SNR invariant, count decodes only

    spec = DataContractSpecification.from_string(FUSED_CONTRACT)
    res = validate(spark, spec, {"clips": df},
                   ValidationConfig(audio_snr_fn=counting_snr))
    by_key = {c.key: c for c in res.run.checks}
    # decode-conformance fails on the broken clip only
    assert by_key["clips__audio_decode_conformance"].result == ResultEnum.failed
    assert res.metrics["clips__audio_decode_conformance"] == 1.0
    # content-uniqueness still finds exactly the planted pairs (key carries
    # its quality-list index: second rule in FUSED_CONTRACT)
    assert by_key["clips__audio_content_uniqueness_1"].result == ResultEnum.failed
    assert res.metrics["clips__audio_content_uniqueness_1"] == 2.0
    # one decode per decodable clip — not two
    assert decoded_rows.value == 28


def test_near_dup_plan_is_bucketed_equi_join(spark, clip_table):
    """Candidates come from the hash equi-join (SortMergeJoin/ShuffledHashJoin
    or broadcast on tiny data) — never a BroadcastNestedLoopJoin cross
    product, and the pair shuffle carries hashes, not audio bytes."""
    df = audio_near_dup(clip_table, threshold=0.35)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# -- eval-set cross-contamination ---------------------------------------------


def _fp_frame(spark, clips):
    rows = [(cid, bytearray(wav_bytes(pcm, SR))) for cid, pcm in clips]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    return audio_fingerprints(df)


def test_cross_contamination_flags_reencoded_eval_clips(spark):
    from dcspark.audiofp import audio_cross_contamination

    # corpus: 6 distinct clips; clips c0/c1 are gain-scaled copies of the
    # eval set (a re-encode that byte/transcript matching would miss)
    corpus = [(f"c{i}", _rand_clip(i)) for i in range(6)]
    corpus[0] = ("c0", (_rand_clip(50).astype(np.float32) * 0.5).astype(np.int16))
    corpus[1] = ("c1", _noisy(_rand_clip(51), 150))
    ev = [("e0", _rand_clip(50)), ("e1", _rand_clip(51))]
    rep = audio_cross_contamination(
        _fp_frame(spark, corpus), _fp_frame(spark, ev))
    got = {(r["clip_id"], r["eval_id"]) for r in rep.collect()}
    assert ("c0", "e0") in got and ("c1", "e1") in got
    assert all(cid in ("c0", "c1") for cid, _ in got)


def test_cross_contamination_eval_side_broadcast(spark):
    from dcspark.audiofp import audio_cross_contamination

    rep = audio_cross_contamination(
        _fp_frame(spark, [(f"c{i}", _rand_clip(i)) for i in range(3)]),
        _fp_frame(spark, [("e0", _rand_clip(0))]))
    rep.collect()
    plan = rep._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan
    # the probe (corpus x eval) join must not sort-merge the corpus side;
    # n_c attachment may shuffle the tiny pair/count frames only
    assert "BatchEvalPython" not in plan


def test_audio_contaminated_ids_end_to_end(spark):
    from dcspark.audiofp import audio_contaminated_ids

    corpus_rows = [("c0", bytearray(wav_bytes(_rand_clip(50), SR))),
                   ("c1", bytearray(wav_bytes(_rand_clip(7), SR)))]
    ev_rows = [("e0", bytearray(wav_bytes(
        (_rand_clip(50).astype(np.float32) * 0.7).astype(np.int16), SR)))]
    corpus = spark.createDataFrame(corpus_rows, "clip_id string, bytes binary")
    ev = spark.createDataFrame(ev_rows, "clip_id string, bytes binary")
    ids = [r["clip_id"] for r in audio_contaminated_ids(corpus, ev).collect()]
    assert ids == ["c0"]


def test_decode_error_in_batch_keeps_hashes_bit_exact(spark):
    """Int64-precision regression (same class as the image dHash bug): a
    broken clip in the Arrow batch used to coerce the pandas hash column to
    float64 — the 62-bit fingerprints exceed float64's 53-bit mantissa, so
    every other clip in that batch got rounded hashes and its equi-join
    matches vanished. Nullable Int64 keeps every bit."""
    # broadband noise: occupies high bands, so hashes exceed 2^53 and
    # float64 rounding would actually corrupt them
    rng = np.random.default_rng(9)
    base = rng.normal(0, 8000, SR * 2).clip(-32768, 32767).astype(np.int16)
    rows_clean = [("a", wav_bytes(base, SR))]
    rows_mixed = rows_clean + [("bad", b"\x00\x01not-a-wav")]
    ddl = "clip_id string, bytes binary"
    solo = sorted(r["hash"] for r in audio_fingerprints(
        spark.createDataFrame(rows_clean, ddl).coalesce(1)).collect())
    mixed = sorted(r["hash"] for r in audio_fingerprints(
        spark.createDataFrame(rows_mixed, ddl).coalesce(1))
        .filter(F.col("hash").isNotNull()).collect())
    assert mixed == solo
    assert any(abs(h) > (1 << 53) for h in solo)  # precision actually at stake
