"""Transcode / VAD segmentation / chunking operators + spectral features."""

import numpy as np
import pytest

from dcspark.audio import (
    encode_wav,
    parse_wav,
    snr_db,
    spectral_centroid_hz,
    spectral_flatness,
    spectral_rolloff_hz,
)
from dcspark.audioops import (
    audio_chunks,
    audio_segments,
    audio_transcode,
    audio_trim,
    chunk_count,
    resample_linear,
)
from dcspark.synth import wav_bytes

SR = 16000
SCHEMA = "clip_id string, bytes binary"


def _tone(dur_ms, hz=440.0, amp=0.4, sr=SR):
    t = np.arange(int(sr * dur_ms / 1000)) / sr
    return (np.sin(2 * np.pi * hz * t) * amp * 32767).astype(np.int16)


def _silence(dur_ms, sr=SR):
    return np.zeros(int(sr * dur_ms / 1000), dtype=np.int16)


# ------------------------------------------------------------------ transcode

def test_transcode_to_mulaw_revalidates(spark):
    pcm = _tone(800)
    df = spark.createDataFrame([("a", wav_bytes(pcm, SR))], SCHEMA)
    row = audio_transcode(df, target_codec="pcm_mulaw").collect()[0]
    assert (row["codec"], row["sr_hz"], row["decode_error"]) == ("pcm_mulaw", SR, None)
    sr2, name2, out = parse_wav(bytes(row["bytes"]))
    assert (sr2, name2) == (SR, "pcm_mulaw")
    assert snr_db(pcm, out) >= 30.0


def test_transcode_resamples_mixed_rates(spark):
    rows = [("a", wav_bytes(_tone(500, sr=8000), 8000)),
            ("b", wav_bytes(_tone(500, sr=44100), 44100))]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["clip_id"]: r for r in
           audio_transcode(df, target_codec="pcm_s16le", target_sr=16000).collect()}
    for cid in ("a", "b"):
        sr2, _, out = parse_wav(bytes(got[cid]["bytes"]))
        assert sr2 == 16000
        assert abs(len(out) / sr2 * 1000 - 500) <= 2


def test_transcode_quarantines_bad_payloads(spark):
    df = spark.createDataFrame(
        [("ok", wav_bytes(_tone(300), SR)), ("bad", b"not a wav"), ("nul", None)],
        SCHEMA)
    got = {r["clip_id"]: r for r in audio_transcode(df).collect()}
    assert got["ok"]["decode_error"] is None
    assert got["bad"]["bytes"] is None and got["bad"]["decode_error"]
    assert got["nul"]["bytes"] is None and got["nul"]["decode_error"] == "null payload"


def test_resample_preserves_tone_frequency():
    pcm = _tone(1000, hz=440.0)
    out = resample_linear(pcm, SR, 8000)
    assert abs(len(out) - 8000) <= 1
    assert abs(spectral_centroid_hz(out, 8000) - 440.0) < 60.0


# ------------------------------------------------------------------ segments

def _seg_df(spark, *pieces):
    pcm = np.concatenate(pieces)
    return spark.createDataFrame([("c", wav_bytes(pcm, SR))], SCHEMA)


def test_segments_speech_silence_speech(spark):
    df = _seg_df(spark, _tone(500), _silence(600), _tone(400))
    segs = audio_segments(df, min_silence_ms=300).orderBy("seg_idx").collect()
    assert [s["seg_idx"] for s in segs] == [0, 1]
    s0, s1 = segs
    assert abs(s0["start_ms"] - 0) <= 30 and abs(s0["end_ms"] - 500) <= 60
    assert abs(s1["start_ms"] - 1100) <= 60 and abs(s1["end_ms"] - 1500) <= 60
    assert s0["rms_dbfs"] > -20 and s1["rms_dbfs"] > -20


def test_segments_short_gap_bridged(spark):
    df = _seg_df(spark, _tone(500), _silence(120), _tone(400))
    segs = audio_segments(df, min_silence_ms=300).collect()
    assert len(segs) == 1
    assert abs(segs[0]["end_ms"] - 1020) <= 60


def test_segments_all_silence_emits_nothing(spark):
    df = _seg_df(spark, _silence(1000))
    assert audio_segments(df).count() == 0


def test_segments_drops_clicks(spark):
    df = _seg_df(spark, _silence(400), _tone(40), _silence(400))
    assert audio_segments(df, min_speech_ms=100).count() == 0


def test_segments_decode_error_row(spark):
    df = spark.createDataFrame([("bad", b"junkjunkjunkjunk" * 4)], SCHEMA)
    rows = audio_segments(df).collect()
    assert len(rows) == 1 and rows[0]["decode_error"]
    assert rows[0]["start_ms"] is None


# ---------------------------------------------------------------------- trim

def test_trim_cuts_outer_silence_keeps_pad(spark):
    df = _seg_df(spark, _silence(900), _tone(600), _silence(1200))
    row = audio_trim(df, pad_ms=100, min_silence_ms=300).collect()[0]
    assert row["decode_error"] is None
    # ~900ms lead minus 100ms pad cut; ~1200ms tail minus pad.
    assert abs(row["trimmed_lead_ms"] - 800) <= 60
    assert abs(row["trimmed_tail_ms"] - 1100) <= 60
    assert abs(row["dur_ms"] - 800) <= 120  # 600 speech + 2x100 pad
    sr2, _, pcm = parse_wav(bytes(row["bytes"]))
    assert sr2 == SR and abs(len(pcm) / sr2 * 1000 - row["dur_ms"]) <= 2


def test_trim_preserves_internal_pause(spark):
    df = _seg_df(spark, _silence(800), _tone(400), _silence(700),
                 _tone(400), _silence(800))
    row = audio_trim(df, pad_ms=50, min_silence_ms=300).collect()[0]
    # the 700ms pause between the runs stays: 400+700+400 + 2x50 pad
    assert abs(row["dur_ms"] - 1600) <= 120
    assert abs(row["trimmed_lead_ms"] - 750) <= 60


def test_trim_pad_clamps_at_clip_edges(spark):
    df = _seg_df(spark, _tone(500))  # speech starts at 0, no room for pad
    row = audio_trim(df, pad_ms=200).collect()[0]
    assert row["trimmed_lead_ms"] == 0.0 and row["trimmed_tail_ms"] == 0.0
    assert abs(row["dur_ms"] - 500) <= 30


def test_trim_preserves_codec(spark):
    pcm = np.concatenate([_silence(600), _tone(500), _silence(600)])
    df = spark.createDataFrame(
        [("m", encode_wav(pcm, SR, codec="pcm_mulaw"))], SCHEMA)
    row = audio_trim(df).collect()[0]
    assert row["codec"] == "pcm_mulaw"
    sr2, name2, _ = parse_wav(bytes(row["bytes"]))
    assert (sr2, name2) == (SR, "pcm_mulaw")


def test_trim_all_silence_quarantined(spark):
    df = spark.createDataFrame(
        [("s", wav_bytes(_silence(1000), SR)), ("bad", b"not a wav"),
         ("nul", None)], SCHEMA)
    got = {r["clip_id"]: r for r in audio_trim(df).collect()}
    assert got["s"]["bytes"] is None
    assert got["s"]["decode_error"] == "no speech detected"
    assert got["bad"]["bytes"] is None and got["bad"]["decode_error"]
    assert got["nul"]["decode_error"] == "null payload"


# -------------------------------------------------------------------- chunks

@pytest.mark.parametrize("dur_ms", [400, 5000, 5100, 12345])
def test_chunk_rows_match_closed_form(spark, dur_ms):
    df = spark.createDataFrame([("c", wav_bytes(_tone(dur_ms), SR))], SCHEMA)
    rows = audio_chunks(df, win_ms=5000, hop_ms=2500).collect()
    assert len(rows) == chunk_count(dur_ms, 5000, 2500)


def test_chunk_bytes_decode_to_pcm_slices(spark):
    pcm = _tone(6000)
    df = spark.createDataFrame([("c", wav_bytes(pcm, SR))], SCHEMA)
    rows = audio_chunks(df, win_ms=5000, hop_ms=2500).orderBy("chunk_idx").collect()
    win_n, hop_n = SR * 5, SR * 25 // 10
    for r in rows:
        _, _, out = parse_wav(bytes(r["bytes"]))
        s = r["chunk_idx"] * hop_n
        assert np.array_equal(out, pcm[s:s + win_n])
        assert r["n_samples"] == len(out)


def test_chunks_sample_exact_tail_not_dropped(spark):
    """22050 Hz x 1001 ms -> 22072 samples: a floored-ms closed form says 1
    chunk and silently drops the 22-sample tail; the sample-based count must
    emit 2 and cover every sample."""
    sr, dur = 22050, 1001
    pcm = _tone(dur, sr=sr)
    df = spark.createDataFrame([("c", wav_bytes(pcm, sr))], SCHEMA)
    rows = audio_chunks(df, win_ms=1000, hop_ms=500).orderBy("chunk_idx").collect()
    win_n, hop_n = sr, sr // 2
    assert len(rows) == chunk_count(len(pcm), win_n, hop_n) == 2
    last = rows[-1]
    assert last["chunk_idx"] * hop_n + last["n_samples"] == len(pcm)


def test_chunks_no_bytes_mode(spark):
    df = spark.createDataFrame([("c", wav_bytes(_tone(7000), SR))], SCHEMA)
    rows = audio_chunks(df, win_ms=5000, hop_ms=2500, emit_bytes=False).collect()
    assert all(r["bytes"] is None for r in rows) and len(rows) == 2


# ------------------------------------------------------------------ spectral

def test_spectral_centroid_tracks_tone():
    assert abs(spectral_centroid_hz(_tone(1000, hz=440.0), SR) - 440.0) < 40.0
    assert abs(spectral_centroid_hz(_tone(1000, hz=2000.0), SR) - 2000.0) < 80.0


def test_spectral_flatness_separates_tone_from_noise():
    tone = _tone(1000)
    noise = (np.random.default_rng(7).normal(0, 0.2, SR) * 32767).astype(np.int16)
    assert spectral_flatness(tone, SR) < 0.05
    assert spectral_flatness(noise, SR) > 0.3


def test_spectral_rolloff_bounds_tone():
    assert spectral_rolloff_hz(_tone(1000, hz=440.0), SR) < 700.0
    noise = (np.random.default_rng(7).normal(0, 0.2, SR) * 32767).astype(np.int16)
    assert spectral_rolloff_hz(noise, SR) > 6000.0


def test_spectral_features_in_feature_frame(spark):
    from dcspark.audio import audio_feature_frame

    df = spark.createDataFrame([("c", wav_bytes(_tone(600, hz=880.0), SR))], SCHEMA)
    row = audio_feature_frame(
        df, features=["spectral_centroid_hz", "spectral_flatness",
                      "spectral_rolloff_hz"]).collect()[0]
    assert abs(row["spectral_centroid_hz"] - 880.0) < 60.0
    assert row["spectral_flatness"] < 0.05
    assert row["spectral_rolloff_hz"] < 1100.0


def test_spectral_signal_quality_rule(spark):
    """A narrowband 300 Hz 'telephony' clip declared as wideband fails a
    spectral_rolloff_hz signal-quality floor; a real wideband clip passes."""
    from dcspark import DataContractSpecification, ValidationConfig, validate
    from dcspark.run_model import ResultEnum

    yaml_text = """
dataContractSpecification: 1.1.0
id: rolloff-check
info: {title: rolloff, version: 1.0.0}
models:
  audio_clips:
    type: table
    fields:
      clip_id: {type: string}
      bytes: {type: bytes}
      sr_hz: {type: int}
      dur_ms: {type: int}
      codec: {type: string}
    quality:
      - type: audio
        invariant: signal-quality
        column: spectral_rolloff_hz
        minimum: 1000.0
"""
    spec = DataContractSpecification.from_string(yaml_text)
    full = "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string"
    wide = np.concatenate([_tone(800, hz=hz, amp=0.1) for hz in (500, 1500, 3000)])
    ok = spark.createDataFrame(
        [("w", wav_bytes(wide, SR), SR, 2400, "pcm_s16le")], full)
    res = validate(spark, spec, {"audio_clips": ok}, ValidationConfig())
    assert res.run.result == ResultEnum.passed
    bad = spark.createDataFrame(
        [("n", wav_bytes(_tone(800, hz=300.0), SR), SR, 800, "pcm_s16le")], full)
    res2 = validate(spark, spec, {"audio_clips": bad}, ValidationConfig())
    failed = [c.key for c in res2.run.checks if c.result == ResultEnum.failed]
    assert any("signal_quality" in k or "spectral" in k for k in failed), failed


# ----------------------------------------------------------------------- CLI

def test_cli_audio_pipeline(tmp_path, capsys, spark):
    """dcspark audio transcode -> chunk -> segment over a parquet corpus."""
    from dcspark.cli import main

    src = str(tmp_path / "clips")
    rows = [("a", bytearray(wav_bytes(_tone(1200), SR))),
            ("b", bytearray(wav_bytes(
                np.concatenate([_tone(400), _silence(700), _tone(400)]), SR)))]
    spark.createDataFrame(rows, SCHEMA).write.parquet(src)

    t_out = str(tmp_path / "transcoded")
    assert main(["audio", "transcode", "--input", src, "--output", t_out,
                 "--codec", "pcm_mulaw", "--sr", "8000",
                 "--master", "local[2]"]) == 0
    got = {r["clip_id"]: r for r in spark.read.parquet(t_out).collect()}
    assert got["a"]["codec"] == "pcm_mulaw" and got["a"]["sr_hz"] == 8000
    sr2, name2, _ = parse_wav(bytes(got["b"]["bytes"]))
    assert (sr2, name2) == (8000, "pcm_mulaw")

    c_out = str(tmp_path / "chunks")
    assert main(["audio", "chunk", "--input", src, "--output", c_out,
                 "--win-ms", "500", "--hop-ms", "250",
                 "--master", "local[2]"]) == 0
    cdf = spark.read.parquet(c_out)
    assert cdf.filter(cdf.clip_id == "a").count() == chunk_count(1200, 500, 250)

    s_out = str(tmp_path / "segments")
    assert main(["audio", "segment", "--input", src, "--output", s_out,
                 "--min-silence-ms", "300", "--master", "local[2]"]) == 0
    sdf = spark.read.parquet(s_out)
    assert sdf.filter(sdf.clip_id == "b").count() == 2
    tr_src = str(tmp_path / "padded")
    spark.createDataFrame(
        [("p", bytearray(wav_bytes(
            np.concatenate([_silence(900), _tone(500), _silence(900)]), SR)))],
        SCHEMA).write.parquet(tr_src)
    tr_out = str(tmp_path / "trimmed")
    assert main(["audio", "trim", "--input", tr_src, "--output", tr_out,
                 "--pad-ms", "100", "--master", "local[2]"]) == 0
    trow = spark.read.parquet(tr_out).collect()[0]
    assert abs(trow["dur_ms"] - 700) <= 120 and trow["trimmed_lead_ms"] > 700

    f_out = str(tmp_path / "feats")
    assert main(["audio", "features", "--input", src, "--output", f_out,
                 "--n-mels", "24", "--master", "local[2]"]) == 0
    fdf = spark.read.parquet(f_out)
    r = fdf.filter(fdf.clip_id == "a").collect()[0]
    assert r["n_feats"] == 24 and len(r["feats"]) == r["n_frames"] * 24

    out_text = capsys.readouterr().out
    assert "audio transcode" in out_text and "0 decode errors" in out_text


# ------------------------------------------------------------ logmel / mfcc

def test_logmel_frame_count_and_shape():
    from dcspark.audioops import logmel_frames

    pcm = _tone(1000)
    lm = logmel_frames(pcm, SR, n_mels=40, frame_ms=25.0, hop_ms=10.0)
    frame_n, hop_n = int(SR * 0.025), int(SR * 0.010)
    assert lm.shape == ((len(pcm) - frame_n) // hop_n + 1, 40)
    assert np.isfinite(lm).all()


def test_logmel_peak_bin_tracks_tone():
    from dcspark.audioops import logmel_frames, mel_filterbank, mel_to_hz, hz_to_mel

    for hz in (440.0, 2000.0):
        lm = logmel_frames(_tone(800, hz=hz), SR, n_mels=40)
        peak_bin = int(np.bincount(np.argmax(lm, axis=1)).argmax())
        # center frequency of the winning mel filter should bracket the tone
        pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(SR / 2), 42))
        assert pts[peak_bin] <= hz <= pts[peak_bin + 2]


def test_mel_filterbank_covers_band():
    from dcspark.audioops import mel_filterbank

    fb = mel_filterbank(SR, 400, 40)
    assert fb.shape == (40, 201)
    assert (fb >= 0).all() and fb.max() <= 1.0
    assert (fb.sum(axis=1) > 0).all()  # every filter has support


def test_dct2_matrix_orthonormal():
    from dcspark.audioops import dct2_matrix

    m = dct2_matrix(13, 13)
    assert np.allclose(m @ m.T, np.eye(13), atol=1e-12)


def test_audio_logmel_operator(spark):
    from dcspark.audioops import audio_logmel

    df = spark.createDataFrame(
        [("a", wav_bytes(_tone(500), SR)), ("bad", b"nope-nope-nope-nope")], SCHEMA)
    got = {r["clip_id"]: r for r in audio_logmel(df, n_mels=24).collect()}
    a = got["a"]
    assert a["n_feats"] == 24 and a["n_frames"] > 0
    assert len(a["feats"]) == a["n_frames"] * 24
    assert got["bad"]["decode_error"] and got["bad"]["feats"] is None


def test_audio_mfcc_operator(spark):
    from dcspark.audioops import audio_logmel

    df = spark.createDataFrame([("a", wav_bytes(_tone(500), SR))], SCHEMA)
    r = audio_logmel(df, n_mels=40, n_mfcc=13).collect()[0]
    assert r["n_feats"] == 13
    assert len(r["feats"]) == r["n_frames"] * 13


# ------------------------------------------------------- loudness normalize

def test_normalize_loudness_hits_target():
    from dcspark.audio import rms_dbfs
    from dcspark.audioops import normalize_loudness

    quiet = (_tone(500, amp=0.05))
    out = normalize_loudness(quiet, -20.0)
    assert abs(rms_dbfs(out, SR) - (-20.0)) < 0.1
    assert np.array_equal(normalize_loudness(_silence(100), -20.0), _silence(100))


def test_transcode_with_loudness_target(spark):
    from dcspark.audio import rms_dbfs

    df = spark.createDataFrame(
        [("q", wav_bytes(_tone(500, amp=0.03), SR)),
         ("l", wav_bytes(_tone(500, amp=0.8), SR))], SCHEMA)
    rows = audio_transcode(df, target_dbfs=-23.0).collect()
    for r in rows:
        _, _, out = parse_wav(bytes(r["bytes"]))
        assert abs(rms_dbfs(out, SR) - (-23.0)) < 0.2


# ------------------------------------------------------------------- augment

def test_augment_speed_three_way(spark):
    from dcspark.audioops import audio_augment

    pcm = _tone(1000)
    df = spark.createDataFrame([("a", wav_bytes(pcm, SR))], SCHEMA)
    rows = {r["variant"]: r for r in audio_augment(df).collect()}
    assert set(rows) == {"sp0.9", "sp1", "sp1.1"}
    assert abs(rows["sp1"]["dur_ms"] - 1000) <= 1
    assert abs(rows["sp0.9"]["dur_ms"] - 1000 / 0.9) <= 2
    assert abs(rows["sp1.1"]["dur_ms"] - 1000 / 1.1) <= 2
    _, _, sp1 = parse_wav(bytes(rows["sp1"]["bytes"]))
    assert np.array_equal(sp1, pcm)  # factor 1.0 is bit-identical


def test_augment_noise_hits_target_snr(spark):
    from dcspark.audio import snr_db
    from dcspark.audioops import audio_augment

    pcm = _tone(2000, amp=0.4)
    df = spark.createDataFrame([("a", wav_bytes(pcm, SR))], SCHEMA)
    rows = audio_augment(df, speeds=(1.0,), noise_snr_db=20.0).collect()
    assert len(rows) == 1 and rows[0]["variant"] == "sp1-n20"
    _, _, noisy = parse_wav(bytes(rows[0]["bytes"]))
    assert abs(snr_db(pcm, noisy) - 20.0) < 1.0


def test_augment_deterministic_across_partitionings(spark):
    from dcspark.audioops import audio_augment

    rows = [(f"c{i}", bytearray(wav_bytes(_tone(300, hz=300 + 50 * i), SR)))
            for i in range(6)]
    a = spark.createDataFrame(rows, SCHEMA).repartition(1)
    b = spark.createDataFrame(list(reversed(rows)), SCHEMA).repartition(4)
    kw = dict(speeds=(0.9, 1.1), noise_snr_db=15.0, gain_jitter_db=3.0, seed=7)
    fa = {(r["clip_id"], r["variant"]): bytes(r["bytes"])
          for r in audio_augment(a, **kw).collect()}
    fb = {(r["clip_id"], r["variant"]): bytes(r["bytes"])
          for r in audio_augment(b, **kw).collect()}
    assert fa == fb  # byte-identical regardless of row order / partitioning


def test_augment_quarantines_bad_rows(spark):
    from dcspark.audioops import audio_augment

    df = spark.createDataFrame([("bad", b"xxxxxxxxxxxxxxxxxxxx")], SCHEMA)
    rows = audio_augment(df).collect()
    assert len(rows) == 1 and rows[0]["decode_error"]


def test_augment_null_clip_id_survives(spark):
    from dcspark.audioops import audio_augment

    df = spark.createDataFrame([(None, bytearray(wav_bytes(_tone(300), SR)))],
                               SCHEMA)
    rows = audio_augment(df, speeds=(1.0,)).collect()
    assert len(rows) == 1 and rows[0]["decode_error"] is None
    assert rows[0]["bytes"] is not None


def test_audio_census(spark):
    from dcspark.audioops import audio_census

    rows = [("a", encode_wav(_tone(1000), SR, codec="pcm_mulaw")),
            ("b", encode_wav(_tone(2000), SR, codec="pcm_mulaw")),
            ("c", wav_bytes(_tone(500, sr=8000), 8000)),
            ("bad", b"not audio at all!!")]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {(r["codec"], r["sr_hz"]): r for r in audio_census(df).collect()}
    mu = got[("pcm_mulaw", SR)]
    assert mu["clips"] == 2 and mu["hours"] == pytest.approx(3 / 3600, abs=1e-5)
    assert got[("pcm_s16le", 8000)]["clips"] == 1
    assert got[(None, None)]["decode_errors"] == 1


# ------------------------------------------------------------ sinc resampler

def test_sinc_suppresses_aliases_linear_does_not():
    """A 10 kHz tone downsampled 48k -> 16k sits ABOVE the target Nyquist:
    the sinc path must kill it (< -50 dBFS) while linear folds it in-band."""
    from dcspark.audioops import resample_sinc

    sr, tsr = 48000, 16000
    t = np.arange(sr) / sr
    hi = (np.sin(2 * np.pi * 10000 * t) * 12000).astype(np.int16)

    def rms_dbfs_of(x):
        f = x.astype(np.float64) / 32768.0
        return 20 * np.log10(np.sqrt(np.mean(f * f)) + 1e-12)

    assert rms_dbfs_of(resample_sinc(hi, sr, tsr)) < -50.0
    assert rms_dbfs_of(resample_linear(hi, sr, tsr)) > -20.0  # aliased energy


@pytest.mark.parametrize("src,dst,floor", [
    (48000, 16000, 60.0), (22050, 16000, 60.0), (44100, 16000, 60.0),
    (8000, 16000, 50.0), (48000, 44100, 75.0)])
def test_sinc_in_band_fidelity(src, dst, floor):
    from dcspark.audioops import resample_sinc

    lo = (np.sin(2 * np.pi * 1000 * np.arange(src) / src) * 12000).astype(np.int16)
    ref = (np.sin(2 * np.pi * 1000 * np.arange(dst) / dst) * 12000).astype(np.int16)
    out = resample_sinc(lo, src, dst)
    assert abs(len(out) - dst) <= 1
    assert snr_db(ref[:len(out)], out) >= floor


def test_transcode_sinc_default_beats_linear(spark):
    """Transcoding a wideband 48 kHz corpus down to 16 kHz: the default sinc
    path preserves an in-band tone far better than resampler='linear'."""
    sr = 48000
    t = np.arange(sr) / sr
    # in-band 1 kHz + out-of-band 11 kHz mixed
    pcm = ((np.sin(2 * np.pi * 1000 * t) * 9000)
           + (np.sin(2 * np.pi * 11000 * t) * 9000)).astype(np.int16)
    ref = (np.sin(2 * np.pi * 1000 * np.arange(16000) / 16000) * 9000).astype(np.int16)
    df = spark.createDataFrame([("a", wav_bytes(pcm, sr))], SCHEMA)
    got = {}
    for mode in ("sinc", "linear"):
        row = audio_transcode(df, target_sr=16000, resampler=mode).collect()[0]
        _, _, out = parse_wav(bytes(row["bytes"]))
        got[mode] = snr_db(ref, out)
    assert got["sinc"] > 25.0 > got["linear"]


def test_eval_features_matches_direct():
    """eval_features (shared VAD frame vector, one pass per clip) must be
    value-identical to calling every FEATURE_FNS entry independently —
    including silence-only, speech-only, and mixed clips, and a custom
    (non-registry) callable which must bypass the shared-db fast path."""
    from dcspark.audio import FEATURE_FNS, eval_features

    sr = 16000
    rng = np.random.default_rng(7)
    t = np.arange(sr) / sr
    speech = (np.sin(2 * np.pi * 440 * t) * 12000).astype(np.int16)
    silence = np.zeros(sr // 2, dtype=np.int16)
    clips = [
        np.concatenate([silence, speech, silence]),
        silence,
        speech,
        (rng.normal(0, 3000, sr)).astype(np.int16),
        np.zeros(0, dtype=np.int16),
    ]
    for pcm in clips:
        direct = {n: fn(pcm, sr) for n, fn in FEATURE_FNS.items()}
        shared = eval_features(pcm, sr, FEATURE_FNS)
        assert shared == direct  # exact float equality: same formulas, same db

    custom = {"doubled_rms": lambda p, s: 2.0 * FEATURE_FNS["rms_dbfs"](p, s),
              "speech_ratio": FEATURE_FNS["speech_ratio"]}
    out = eval_features(clips[0], sr, custom)
    assert out["doubled_rms"] == 2.0 * FEATURE_FNS["rms_dbfs"](clips[0], sr)
    assert out["speech_ratio"] == FEATURE_FNS["speech_ratio"](clips[0], sr)
