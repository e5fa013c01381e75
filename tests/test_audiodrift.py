"""Loudness-drift (decoded-PCM feature drift) tests: feature functions,
feature frame, snapshot round-trip, engine pass/fail, single-decode fusion."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dcspark import audio as audio_mod
from dcspark import drift as drift_mod
from dcspark import synth
from dcspark.engine import ValidationConfig, validate
from dcspark.spec import DataContractSpecification
from dcspark.run_model import ResultEnum

SEED, N, DUR_LO, DUR_HI = 11, 60, 200, 800


def _full_scale_square(n=8000):
    return (np.ones(n, dtype=np.int16) * 32767)


def test_feature_fns_known_signals():
    # full-scale square wave: rms == peak == 0 dBFS, fully clipped
    sq = _full_scale_square()
    assert abs(audio_mod.rms_dbfs(sq, 16000)) < 0.01
    assert abs(audio_mod.peak_dbfs(sq, 16000)) < 0.01
    assert audio_mod.clip_ratio(sq, 16000) == 1.0
    # half-scale sine: peak -6.02 dBFS, rms 3.01 dB below peak, no clipping
    t = np.arange(16000)
    sine = (0.5 * 32768 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
    assert abs(audio_mod.peak_dbfs(sine, 16000) + 6.02) < 0.05
    assert abs(audio_mod.rms_dbfs(sine, 16000) + 9.03) < 0.05
    assert audio_mod.clip_ratio(sine, 16000) == 0.0
    # silence clamps
    z = np.zeros(100, dtype=np.int16)
    assert audio_mod.rms_dbfs(z, 16000) == -120.0
    assert audio_mod.rms_dbfs(np.array([], dtype=np.int16), 16000) == -120.0


def test_dc_offset_and_zero_crossing_rate_known_signals():
    sr = 16000
    t = np.arange(sr)
    # unbiased sine: no DC; ZCR of a 440 Hz tone is ~880 crossings/sec
    sine = (0.5 * 32768 * np.sin(2 * np.pi * 440 * t / sr)).astype(np.int16)
    assert abs(audio_mod.dc_offset(sine, sr)) < 1e-3
    assert abs(audio_mod.zero_crossing_rate(sine, sr) - 880) < 5
    # biased capture: DC offset reads the bias fraction, ZCR collapses to 0
    biased = np.full(sr, 3277, dtype=np.int16)  # ~0.1 FS stuck-at
    assert abs(audio_mod.dc_offset(biased, sr) - 0.1) < 1e-3
    assert audio_mod.zero_crossing_rate(biased, sr) == 0.0
    # alternating-sign signal: one crossing per sample step -> ~sr
    alt = (np.where(t % 2 == 0, 1000, -1000)).astype(np.int16)
    assert abs(audio_mod.zero_crossing_rate(alt, sr) - sr) < 2
    # edge cases
    assert audio_mod.dc_offset(np.array([], dtype=np.int16), sr) == 0.0
    assert audio_mod.zero_crossing_rate(np.array([5], dtype=np.int16), sr) == 0.0


def test_new_features_accepted_by_quality_and_drift_rules():
    from dcspark.compile import create_checks
    from dcspark.spec import DataContractSpecification

    spec = DataContractSpecification.from_string("""
id: f
models:
  clips:
    fields:
      clip_id: {type: string, primaryKey: true}
      bytes: {type: bytes}
      sr_hz: {type: integer}
      dur_ms: {type: integer}
      codec: {type: string}
    quality:
      - {type: audio, invariant: signal-quality, column: dc_offset,
         minimum: -0.02, maximum: 0.02}
      - {type: audio, invariant: signal-quality, column: zero_crossing_rate,
         minimum: 1.0}
      - {type: audio, invariant: loudness-drift, column: zero_crossing_rate}
""")
    checks = create_checks(spec)["clips"]
    assert len([c for c in checks if c.kind == "audio_quality"]) == 2
    assert len([c for c in checks if c.kind == "audio_drift"]) == 1


@pytest.fixture(scope="module")
def clips(spark):
    df = synth.generate_audio_table(
        spark, N, seed=SEED, dur_lo=DUR_LO, dur_hi=DUR_HI, num_partitions=4)
    df = df.persist()
    df.count()
    return df


def _gain_scaled(df, factor):
    """Same table re-encoded ``factor`` quieter — header columns unchanged."""
    def scale(batches):
        import pyarrow as pa

        for b in batches:
            d = b.to_pydict()
            out = []
            for raw in d["bytes"]:
                pcm = np.frombuffer(raw[44:], dtype="<i2")
                out.append(raw[:44] + (pcm * factor).astype("<i2").tobytes())
            d["bytes"] = out
            yield pa.RecordBatch.from_pydict(d, schema=b.schema)

    return df.mapInArrow(scale, schema=df.schema)


def test_audio_feature_frame_values(spark, clips):
    frame = audio_mod.audio_feature_frame(clips, ["rms_dbfs", "peak_dbfs"])
    rows = frame.collect()
    assert len(rows) == N
    for r in rows:
        assert -60 < r["rms_dbfs"] < 0
        assert r["rms_dbfs"] <= r["peak_dbfs"] <= 0.1


CONTRACT = """
id: audio-loudness-drift
models:
  clips:
    fields:
      clip_id: {type: string, primaryKey: true}
      bytes: {type: bytes}
      sr_hz: {type: integer}
      dur_ms: {type: integer}
      codec: {type: string}
    quality:
      - {type: audio, invariant: loudness-drift, column: rms_dbfs, method: psi, threshold: 0.2}
"""


def _ref_stats(clips, feats=("rms_dbfs",)):
    frame = audio_mod.audio_feature_frame(clips, list(feats)).persist()
    try:
        stats = drift_mod.build_ref_stats(frame, list(feats))
    finally:
        frame.unpersist()
    return {f"audio:{f}": s for f, s in stats.items()}


def _run(spark, clips, contract=CONTRACT, ref=None):
    spec = DataContractSpecification.from_string(contract)
    cfg = ValidationConfig(ref_stats={"clips": ref} if ref else {})
    return validate(spark, spec, {"clips": clips}, cfg)


def test_no_snapshot_is_error(spark, clips):
    res = _run(spark, clips)
    chk = [c for c in res.run.checks if "audio_drift" in c.key][0]
    assert chk.result == ResultEnum.error
    assert "snapshot" in (chk.reason or "")


def test_same_distribution_passes(spark, clips):
    res = _run(spark, clips, ref=_ref_stats(clips))
    chk = [c for c in res.run.checks if "audio_drift" in c.key][0]
    assert chk.result == ResultEnum.passed
    stat = res.metrics[chk.key]
    assert stat is not None and stat < 0.05


def test_gain_regression_fails_psi_and_ks(spark, clips):
    ref = _ref_stats(clips)
    quiet = _gain_scaled(clips, 0.25)  # -12 dB: headers identical, PCM quieter
    res = _run(spark, quiet, ref=ref)
    chk = [c for c in res.run.checks if "audio_drift" in c.key][0]
    assert chk.result == ResultEnum.failed
    assert res.metrics[chk.key] > 0.2
    ks_contract = CONTRACT.replace("method: psi", "method: ks").replace(
        "threshold: 0.2", "threshold: 0.05")
    res = _run(spark, quiet, contract=ks_contract, ref=ref)
    chk = [c for c in res.run.checks if "audio_drift" in c.key][0]
    assert chk.result == ResultEnum.failed and res.metrics[chk.key] > 0.5


FUSED = CONTRACT.replace(
    "    quality:",
    "    quality:\n      - {type: audio, invariant: decode-conformance}")


def test_fused_with_conformance_single_decode(spark, clips, monkeypatch):
    """Drift + decode-conformance in one contract: ONE decode scan feeds both.

    Proof shape: (a) a counting snr_fn sees each clip exactly once — the
    conformance pass ran once; (b) the engine launched exactly one compact
    decode pass (driver-side call counter) — so the drift histograms can only
    have come out of that same pass (fh rows have no other producer)."""
    from dcspark import engine as engine_mod

    acc = spark.sparkContext.accumulator(0)

    def counting_snr(clip_id, sr, dur, pcm):
        acc.add(1)
        return None

    calls = []
    orig_compact = engine_mod.Validator._audio_compact

    def counting_compact(self, *a, **k):
        calls.append(1)
        return orig_compact(self, *a, **k)

    monkeypatch.setattr(engine_mod.Validator, "_audio_compact", counting_compact)
    spec = DataContractSpecification.from_string(FUSED)
    cfg = ValidationConfig(ref_stats={"clips": _ref_stats(clips)},
                           audio_snr_fn=counting_snr)
    res = validate(spark, spec, {"clips": clips}, cfg)
    by_key = {c.key: c for c in res.run.checks}
    drift = [c for k, c in by_key.items() if "audio_drift" in k][0]
    conf = [c for k, c in by_key.items() if "decode_conformance" in k][0]
    assert drift.result == ResultEnum.passed
    assert conf.result == ResultEnum.passed
    assert acc.value == N  # one decode per clip, not one per consumer
    assert len(calls) == 1  # exactly one compact decode pass launched


def test_drift_without_conformance_runs_scan(spark, clips):
    """loudness-drift alone still gets its decode scan (no conformance rule)."""
    res = _run(spark, clips, ref=_ref_stats(clips))
    assert [c for c in res.run.checks if "audio_drift" in c.key]


CLI_CONTRACT = """
dataContractSpecification: 1.1.0
id: audio-drift-cli
info: {title: Audio drift CLI, version: 1.0.0}
models:
  clips:
    type: table
    fields:
      clip_id: {type: string, primaryKey: true}
      bytes: {type: bytes}
      sr_hz: {type: integer}
      dur_ms: {type: integer}
      codec: {type: string}
    quality:
      - {type: drift, method: psi, column: dur_ms, threshold: 0.2}
      - {type: audio, invariant: loudness-drift, column: rms_dbfs, method: psi, threshold: 0.2}
"""


def test_cli_snapshot_builds_audio_feature_stats(tmp_path, capsys, spark, clips):
    """`snapshot` decodes the reference sample and stores 'audio:rms_dbfs'
    stats next to the column stats; `test --ref-stats` then passes on the
    same data (self-comparison: zero drift on both rules)."""
    from dcspark.cli import main

    cpath = str(tmp_path / "c.yaml")
    with open(cpath, "w") as f:
        f.write(CLI_CONTRACT)
    data_dir = tmp_path / "data"
    clips.write.parquet(str(data_dir / "clips.parquet"))
    snap_dir = str(tmp_path / "snap")

    assert main(["snapshot", cpath, "--path", str(data_dir), "--out", snap_dir]) == 0
    capsys.readouterr()
    snap = spark.read.parquet(f"{snap_dir}/clips.parquet")
    assert {r["column"] for r in snap.collect()} == {"dur_ms", "audio:rms_dbfs"}

    assert main(["test", cpath, "--path", str(data_dir), "--ref-stats", snap_dir]) == 0
    out = capsys.readouterr().out
    assert "RUN RESULT: passed" in out
    assert "audio_drift_psi" in out


def test_checkpointed_drift_rides_manifest_no_extra_decode(
        spark, clips, tmp_path, monkeypatch):
    """Partitioned + checkpointed run: feature histograms persist in the
    manifest per partition; the run uses ONE decode pass (chunks of the
    checkpointed scan), and a resume run decodes NOTHING yet reproduces the
    identical drift metric."""
    from dcspark import engine as engine_mod

    parted = clips.withColumn("day", (F.length("clip_id") % 2).cast("string"))
    ref = _ref_stats(clips)
    ckpt = str(tmp_path / "ckpt")

    calls = []
    orig_compact = engine_mod.Validator._audio_compact

    def counting_compact(self, *a, **k):
        calls.append(1)
        return orig_compact(self, *a, **k)

    monkeypatch.setattr(engine_mod.Validator, "_audio_compact", counting_compact)

    spec = DataContractSpecification.from_string(FUSED)

    def run(resume):
        cfg = ValidationConfig(
            ref_stats={"clips": ref}, partition_col="day",
            checkpoint_dir=ckpt, resume=resume, checkpoint_chunks=1)
        return validate(spark, spec, {"clips": parted}, cfg)

    r1 = run(resume=False)
    first_calls = len(calls)
    assert first_calls == 1  # one decode pass for conformance + histograms
    r2 = run(resume=True)
    assert len(calls) == first_calls  # resume decodes nothing
    k = [c.key for c in r1.run.checks if "audio_drift" in c.key][0]
    assert r1.metrics[k] == r2.metrics[k]
    assert r1.metrics[k] is not None and r1.metrics[k] < 0.05
    by_key = {c.key: c.result for c in r2.run.checks}
    assert by_key[k] == ResultEnum.passed


def test_fp_and_drift_without_conformance_share_one_scan(
        spark, clips, monkeypatch):
    """content-uniqueness + loudness-drift with NO decode-conformance rule:
    the fingerprints still fuse into the drift histogram's scan — one compact
    pass, not one per rule."""
    from dcspark import engine as engine_mod

    contract = CONTRACT.replace(
        "    quality:",
        "    quality:\n      - {type: audio, invariant: content-uniqueness}")
    calls = []
    orig_compact = engine_mod.Validator._audio_compact

    def counting_compact(self, *a, **k):
        calls.append(1)
        return orig_compact(self, *a, **k)

    monkeypatch.setattr(engine_mod.Validator, "_audio_compact", counting_compact)
    monkeypatch.setattr(
        engine_mod.Validator, "_audio_fp_compute",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("standalone fp pass must not run when fusible")))
    spec = DataContractSpecification.from_string(contract)
    cfg = ValidationConfig(ref_stats={"clips": _ref_stats(clips)})
    res = validate(spark, spec, {"clips": clips}, cfg)
    assert len(calls) == 1
    by_key = {c.key: c.result for c in res.run.checks}
    drift_key = [k for k in by_key if "audio_drift" in k][0]
    fp_key = [k for k in by_key if "content_uniqueness" in k][0]
    assert by_key[drift_key] == ResultEnum.passed
    # fp result is data-dependent (random sine mixes can collide at the
    # default threshold); the point is it EVALUATED from the fused pass
    assert by_key[fp_key] in (ResultEnum.passed, ResultEnum.failed)


def test_zero_crossing_rate_zero_touches_do_not_count():
    """Samples at exactly 0 neither create nor break a crossing — a 0/-1
    dither near silence must read ~0 crossings, not the white-noise ceiling
    (regression: mapping sign(0) to +1 made every -1 sample a crossing)."""
    sr = 16000
    dither = np.tile(np.array([0, -1], dtype=np.int16), sr // 2)
    assert audio_mod.zero_crossing_rate(dither, sr) == 0.0
    # a genuine crossing through an exact zero still counts once
    through_zero = np.array([100, 0, -100, 0, 100], dtype=np.int16)
    assert audio_mod.zero_crossing_rate(through_zero, sr) == pytest.approx(
        2 * sr / 4)
