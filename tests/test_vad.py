"""Energy-VAD features (speech_ratio / leading/trailing_silence_ms):
frame math on known signals, silence-padding detection through the
signal-quality contract rule, and the single-decode fusion guarantee is
inherited (the features ride FEATURE_FNS like every other one)."""

import numpy as np
import pytest

from dcspark import synth
from dcspark.audio import (
    VAD_FRAME_S, VAD_GATE_DBFS, leading_silence_ms, speech_ratio,
    trailing_silence_ms)
from dcspark.engine import ValidationConfig, validate
from dcspark.run_model import ResultEnum
from dcspark.spec import DataContractSpecification

SR = 16000


def _tone(ms, dbfs=-20.0, freq=440.0):
    n = int(SR * ms / 1000)
    amp = 32768.0 * 10 ** (dbfs / 20.0) * np.sqrt(2)  # RMS = dbfs
    t = np.arange(n) / SR
    return np.clip(amp * np.sin(2 * np.pi * freq * t),
                   -32768, 32767).astype(np.int16)


def _silence(ms):
    return np.zeros(int(SR * ms / 1000), dtype=np.int16)


def test_known_signals():
    assert speech_ratio(_silence(500), SR) == 0.0
    assert speech_ratio(_tone(500), SR) == 1.0
    assert speech_ratio(np.array([], dtype=np.int16), SR) == 0.0
    half = np.concatenate([_silence(400), _tone(400)])
    assert abs(speech_ratio(half, SR) - 0.5) < 0.05
    assert abs(leading_silence_ms(half, SR) - 400) <= VAD_FRAME_S * 1000
    assert trailing_silence_ms(half, SR) <= VAD_FRAME_S * 1000
    padded = np.concatenate([_tone(300), _silence(700)])
    assert abs(trailing_silence_ms(padded, SR) - 700) <= VAD_FRAME_S * 1000
    assert leading_silence_ms(padded, SR) == 0.0
    # all-silent clip: leading/trailing silence == full duration
    assert leading_silence_ms(_silence(250), SR) == pytest.approx(250.0)
    assert trailing_silence_ms(_silence(250), SR) == pytest.approx(250.0)


def test_gate_is_absolute():
    quiet = _tone(500, dbfs=VAD_GATE_DBFS - 10)
    loud = _tone(500, dbfs=VAD_GATE_DBFS + 10)
    assert speech_ratio(quiet, SR) == 0.0
    assert speech_ratio(loud, SR) == 1.0


def test_tail_frame_counted():
    # 410 ms = 20 full frames + a 10 ms tail; tail tone must register
    sig = np.concatenate([_silence(400), _tone(10)])
    assert speech_ratio(sig, SR) > 0.0
    assert trailing_silence_ms(sig, SR) == 0.0


CONTRACT = """
id: audio-vad
models:
  clips:
    fields:
      clip_id: {type: string, primaryKey: true}
      bytes: {type: bytes}
      sr_hz: {type: integer}
      dur_ms: {type: integer}
      codec: {type: string}
    quality:
      - {type: audio, invariant: signal-quality, column: speech_ratio,
         minimum: 0.5}
"""


def _mostly_silent_subset(df, n_bad):
    ids = sorted(r[0] for r in df.select("clip_id").collect())[:n_bad]
    idset = set(ids)

    def pad(batches):
        import pyarrow as pa

        for b in batches:
            d = b.to_pydict()
            out = []
            for cid, raw in zip(d["clip_id"], d["bytes"]):
                if cid in idset:
                    pcm = np.frombuffer(raw[44:], dtype="<i2").copy()
                    pcm[:int(len(pcm) * 0.8)] = 0  # 80% dead air
                    raw = raw[:44] + pcm.tobytes()
                out.append(raw)
            d["bytes"] = out
            yield pa.RecordBatch.from_pydict(d, schema=b.schema)

    return df.mapInArrow(pad, schema=df.schema), ids


RATE_CONTRACT = """
id: audio-rate
models:
  clips:
    fields:
      clip_id: {type: string, primaryKey: true}
      bytes: {type: bytes}
      sr_hz: {type: integer}
      dur_ms: {type: integer}
      codec: {type: string}
      transcript: {type: string}
    quality:
      - {type: audio, invariant: speaking-rate, minimum: 0.001, maximum: 500}
"""


def test_speaking_rate_compile_validation():
    no_bounds = RATE_CONTRACT.replace(
        ", minimum: 0.001, maximum: 500", "")
    with pytest.raises(ValueError, match="speaking-rate"):
        from dcspark.compile import create_checks
        create_checks(DataContractSpecification.from_string(no_bounds))


def test_speaking_rate_contract(spark):
    import pyarrow as pa
    from pyspark.sql import functions as F

    df = synth.generate_audio_table(spark, 40, seed=37, dur_lo=300,
                                    dur_hi=900, num_partitions=2)
    spec = DataContractSpecification.from_string(RATE_CONTRACT)
    res = validate(spark, spec, {"clips": df}, ValidationConfig())
    key = [c.key for c in res.run.checks
           if "speaking_rate" in c.key][0]
    assert [c.result for c in res.run.checks if c.key == key] \
        == [ResultEnum.passed]
    # inflate 5 transcripts 1000x: rate blows through the max bound while
    # every header column, the payload, and the SNR oracle stay valid
    ids = sorted(r[0] for r in df.select("clip_id").collect())[:5]
    bad = df.withColumn(
        "transcript",
        F.when(F.col("clip_id").isin(ids),
               F.repeat(F.col("transcript"), 1000))
        .otherwise(F.col("transcript")))
    res2 = validate(spark, spec, {"clips": bad}, ValidationConfig())
    chk2 = [c for c in res2.run.checks if c.key == key][0]
    assert chk2.result == ResultEnum.failed
    assert res2.metrics[key] == 5
    vio = res2.violations.filter(F.col("check_key") == key).collect()
    assert sorted(r["clip_id"] for r in vio) == ids
    assert all(r["observed"].startswith("chars_per_speech_sec=")
               for r in vio)
    # NULL transcripts are field_required's finding, never double-counted
    nulled = df.withColumn(
        "transcript",
        F.when(F.col("clip_id").isin(ids), F.lit(None).cast("string"))
        .otherwise(F.col("transcript")))
    res3 = validate(spark, spec, {"clips": nulled}, ValidationConfig())
    chk3 = [c for c in res3.run.checks if c.key == key][0]
    assert chk3.result == ResultEnum.passed
    assert res3.metrics[key] == 0


def test_silence_padding_fails_contract(spark):
    df = synth.generate_audio_table(spark, 40, seed=31, dur_lo=300,
                                    dur_hi=900, num_partitions=2)
    spec = DataContractSpecification.from_string(CONTRACT)
    res = validate(spark, spec, {"clips": df}, ValidationConfig())
    chk = [c for c in res.run.checks if "signal_quality" in c.key]
    assert chk and all(c.result == ResultEnum.passed for c in chk)
    bad_df, bad_ids = _mostly_silent_subset(df, 6)
    res2 = validate(spark, spec, {"clips": bad_df}, ValidationConfig())
    chk2 = [c for c in res2.run.checks if c.key == chk[0].key]
    assert chk2 and chk2[0].result == ResultEnum.failed
    assert res2.metrics[chk[0].key] == 6
    # header columns were untouched: only the decoded-feature rule fails
    others = [c for c in res2.run.checks if c.key != chk[0].key]
    assert all(c.result == ResultEnum.passed for c in others)
