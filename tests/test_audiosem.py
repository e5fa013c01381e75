"""Semantic audio embeddings + SemDeDup near-dup / decontam (dcspark/audiosem.py).

Locks: gain invariance of the pooled embedding (exact, by construction),
noise robustness vs content separation (cosine margins), end-to-end planted
pair recovery with zero false positives, exactly-one-decode per corpus row,
and the broadcast/zero-corpus-shuffle decontam plan shape.
"""
import numpy as np
import pytest
from pyspark.sql import functions as F

from dcspark.audiosem import (audio_embeddings, audio_semantic_contaminated_ids,
                              audio_semantic_decontam, audio_semantic_near_dup,
                              clip_embedding)
from dcspark.synth import synth_pcm, wav_bytes

SR = 16000


def _cos(a, b):
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def _tone_mix(seed: int, dur_ms: int = 1200) -> np.ndarray:
    rng = np.random.RandomState(seed)
    freqs = rng.uniform(200, 3800, size=4)
    amps = rng.uniform(0.4, 1.0, size=4)
    return synth_pcm(SR, dur_ms, freqs, amps)


def _with_noise(pcm: np.ndarray, snr_db: float, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    sig_p = float(np.mean(pcm.astype(np.float64) ** 2)) or 1.0
    noise = rng.randn(len(pcm)) * np.sqrt(sig_p / (10 ** (snr_db / 10.0)))
    return np.clip(pcm.astype(np.float64) + noise, -32768, 32767).astype(np.int16)


def _with_gain(pcm: np.ndarray, g: float) -> np.ndarray:
    return np.clip(pcm.astype(np.float64) * g, -32768, 32767).astype(np.int16)


# -- embedding properties ------------------------------------------------------


def test_embedding_gain_invariant():
    pcm = _tone_mix(1)
    e1 = clip_embedding(pcm, SR)
    e2 = clip_embedding(_with_gain(pcm, 0.25), SR)
    # log-domain shift cancels in both pooled halves; int16 requantization
    # is the only residual -> cosine indistinguishable from 1
    assert _cos(e1, e2) > 0.9999


def test_embedding_separates_noise_from_content():
    a = clip_embedding(_tone_mix(2), SR)
    a_noisy = clip_embedding(_with_noise(_tone_mix(2), snr_db=20.0, seed=9), SR)
    b = clip_embedding(_tone_mix(3), SR)
    same = _cos(a, a_noisy)
    diff = max(_cos(a, b), _cos(a_noisy, b))
    assert same > 0.88, same
    assert diff < same - 0.01, (same, diff)


def test_embedding_too_short_clip_is_none():
    assert clip_embedding(np.zeros(4, dtype=np.int16), SR) is None


def test_audio_embeddings_frame_and_errors(spark):
    rows = [
        ("clip-a", bytearray(wav_bytes(_tone_mix(4), SR))),
        ("clip-bad", bytearray(b"not a wav")),
        ("clip-null", None),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    out = {r["clip_id"]: r for r in audio_embeddings(df).collect()}
    assert out["clip-a"]["decode_error"] is None
    assert len(out["clip-a"]["emb"]) == 80
    assert out["clip-bad"]["emb"] is None and out["clip-bad"]["decode_error"]
    assert out["clip-null"]["emb"] is None and out["clip-null"]["decode_error"]


# -- end-to-end near-dup -------------------------------------------------------


@pytest.fixture(scope="module")
def sem_corpus(spark):
    """24 distinct tone mixes + noisy/gain variants of three of them."""
    rows = []
    for i in range(24):
        rows.append((f"orig-{i:02d}", bytearray(wav_bytes(_tone_mix(100 + i), SR))))
    for i in (0, 5, 11):
        pcm = _tone_mix(100 + i)
        rows.append((f"noisy-{i:02d}",
                     bytearray(wav_bytes(_with_noise(pcm, 20.0, seed=i), SR))))
        rows.append((f"gain-{i:02d}",
                     bytearray(wav_bytes(_with_gain(pcm, 0.3), SR))))
    return spark.createDataFrame(
        rows, "clip_id string, bytes binary").repartition(4)


def test_semantic_near_dup_recovers_planted_pairs(spark, sem_corpus):
    pairs = audio_semantic_near_dup(sem_corpus, threshold=0.85, n_cells=4)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    want = set()
    for i in (0, 5, 11):
        trio = sorted([f"orig-{i:02d}", f"noisy-{i:02d}", f"gain-{i:02d}"])
        want |= {(trio[0], trio[1]), (trio[0], trio[2]), (trio[1], trio[2])}
    # every planted variant pair found, and nothing across distinct content
    assert got == want, got ^ want


def test_semantic_near_dup_evaluates_source_once(spark):
    """Quantizer training, cell assignment, and the within-cell join all ride
    the ONE persisted embedding frame — the payload source (i.e. the decode
    pass) evaluates exactly once per row (the test_plans source-accumulator
    gate shape)."""
    acc = spark.sparkContext.accumulator(0)

    def gen(batches):
        # everything imported/derived inside: the closure must not reference
        # this test module (workers can't import it)
        import numpy as _np
        import pandas as pd

        from dcspark.synth import synth_pcm as _sp
        from dcspark.synth import wav_bytes as _wb
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                acc.add(1)
                rng = _np.random.RandomState(300 + int(i))
                pcm = _sp(16000, 1200, rng.uniform(200, 3800, 4),
                          rng.uniform(0.4, 1.0, 4))
                rows.append({"clip_id": f"c{i:02d}", "bytes": _wb(pcm, 16000)})
            yield pd.DataFrame(rows)

    src = spark.range(0, 12, 1, 3).mapInPandas(gen, "clip_id string, bytes binary")
    pairs = audio_semantic_near_dup(src, threshold=0.85, n_cells=4)
    pairs.collect()
    assert acc.value == 12, f"source evaluated {acc.value / 12.0}x per row"
    from dcspark.pipeline_ckpt import release_caches
    release_caches(pairs)


# -- decontamination -----------------------------------------------------------


def test_semantic_decontam_flags_noisy_leak(spark, sem_corpus):
    eval_rows = [
        ("bench-0", bytearray(wav_bytes(_tone_mix(100), SR))),      # = orig-00
        ("bench-x", bytearray(wav_bytes(_tone_mix(999), SR))),      # clean
    ]
    eval_df = spark.createDataFrame(eval_rows, "clip_id string, bytes binary")
    rep = audio_semantic_decontam(sem_corpus, eval_df, threshold=0.85,
                                  n_cells=4)
    got = {(r["clip_id"], r["eval_id"]) for r in rep.collect()}
    assert got == {("orig-00", "bench-0"), ("noisy-00", "bench-0"),
                   ("gain-00", "bench-0")}, got
    ids = {r["clip_id"] for r in
           audio_semantic_contaminated_ids(sem_corpus, eval_df,
                                           threshold=0.85, n_cells=4).collect()}
    assert ids == {"orig-00", "noisy-00", "gain-00"}


def test_semantic_decontam_plan_broadcasts_eval_side(spark, sem_corpus):
    eval_rows = [("bench-0", bytearray(wav_bytes(_tone_mix(100), SR)))]
    eval_df = spark.createDataFrame(eval_rows, "clip_id string, bytes binary")
    rep = audio_semantic_decontam(sem_corpus, eval_df, threshold=0.85,
                                  n_cells=4)
    rep.collect()
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
