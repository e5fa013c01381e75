"""Compact low-rate bench layout (pcm_u8 @ 8 kHz): the >=1M-clip scale
points ride this ~7x-smaller layout, so its generator/oracle pairing must be
exactly as sound as the mixed-rate s16 one — same 42-check contract shape,
only the codec enum differs."""

from dcspark import DataContractSpecification, ValidationConfig, validate
from dcspark import audio as audio_mod
from dcspark import drift as drift_mod
from dcspark import synth
from dcspark.run_model import ResultEnum

SR_ENUM = (8000,)
CODEC = "pcm_u8"
SEED = 42


def test_compact_rows_are_u8_8k_and_oracle_matches():
    """Generator and SNR oracle agree under the narrowed sr enum: u8
    quantization keeps ~50 dB SNR against the analog oracle, far above the
    30 dB contract floor; a MISMATCHED enum (oracle on the default) must
    fail, proving the enum actually threads through."""
    r = synth.make_row(SEED, 7, dur_lo=200, dur_hi=2000,
                       sr_enum=SR_ENUM, force_codec=CODEC)
    assert r["sr_hz"] == 8000 and r["codec"] == CODEC
    sr, codec_name, decoded = audio_mod.parse_wav(bytes(r["bytes"]))
    assert sr == 8000 and codec_name == CODEC
    snr = synth.oracle_snr(SEED, 7, decoded, 200, 2000, sr_enum=SR_ENUM)
    assert snr >= 35.0, snr  # u8 quantization ~38-40 dB on the 0.9-peak mix
    snr_wrong = synth.oracle_snr(SEED, 7, decoded, 200, 2000)
    assert snr_wrong < 30.0 or snr_wrong == float("-inf")


def test_compact_contract_suite_passes_e2e(spark):
    """The full compact-contract suite (contracts/audio_clips_compact.yaml)
    over a generated compact table: all checks pass, exactly like the s16
    flagship fixture — the 1M-clip bench points measure this very pipeline."""
    n = 300
    clips = synth.generate_audio_table(
        spark, n, seed=SEED, dur_lo=200, dur_hi=2000,
        num_partitions=8, sr_enum=SR_ENUM, force_codec=CODEC)
    ref = synth.generate_transcripts_ref(spark, n, seed=SEED, num_partitions=8)
    spec = DataContractSpecification.from_file("contracts/audio_clips_compact.yaml")
    ref_stats = drift_mod.build_ref_stats(
        clips.select("dur_ms", "sr_hz"), ["dur_ms", "sr_hz"])
    cfg = ValidationConfig(
        ref_stats={"audio_clips": ref_stats},
        audio_snr_fn=audio_mod.synth_snr_oracle(SEED, 200, 2000, sr_enum=SR_ENUM),
    )
    res = validate(spark, spec, {"audio_clips": clips, "transcripts_ref": ref}, cfg)
    assert res.run.result == ResultEnum.passed, [
        (c.key, c.result, c.reason) for c in res.run.checks
        if c.result != ResultEnum.passed]
    assert len(res.run.checks) == 42


def test_compact_layout_catches_corruption(spark):
    """The compact layout is not a softer target: a garbled payload still
    fails decode-conformance under the compact oracle."""
    n = 120
    clips = synth.generate_audio_table(
        spark, n, seed=SEED, dur_lo=200, dur_hi=2000, num_partitions=4,
        sr_enum=SR_ENUM, force_codec=CODEC,
        corrupt={"garbled_pcm": 0.2})
    ref = synth.generate_transcripts_ref(spark, n, seed=SEED, num_partitions=4)
    spec = DataContractSpecification.from_file("contracts/audio_clips_compact.yaml")
    cfg = ValidationConfig(
        audio_snr_fn=audio_mod.synth_snr_oracle(SEED, 200, 2000, sr_enum=SR_ENUM),
    )
    res = validate(spark, spec, {"audio_clips": clips, "transcripts_ref": ref}, cfg)
    decode = next(c for c in res.run.checks
                  if "decode" in c.key and c.key.startswith("audio_clips"))
    assert decode.result == ResultEnum.failed
