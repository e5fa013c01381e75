"""Signal-quality (per-clip decoded-feature bounds) tests: compile validation,
pass/fail semantics, threshold forms, violation rows, decode-error disjointness,
single-decode fusion, partitioned + checkpoint/resume parity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dcspark import synth
from dcspark.compile import create_checks
from dcspark.engine import ValidationConfig, validate
from dcspark.run_model import ResultEnum
from dcspark.spec import DataContractSpecification

SEED, N = 23, 60

CONTRACT = """
id: audio-signal-quality
models:
  clips:
    fields:
      clip_id: {type: string, primaryKey: true}
      bytes: {type: bytes}
      sr_hz: {type: integer}
      dur_ms: {type: integer}
      codec: {type: string}
    quality:
      - {type: audio, invariant: signal-quality, column: rms_dbfs, minimum: -50.0}
"""


@pytest.fixture(scope="module")
def clips(spark):
    df = synth.generate_audio_table(
        spark, N, seed=SEED, dur_lo=200, dur_hi=800, num_partitions=4)
    df = df.persist()
    df.count()
    return df


def _gain_scaled_subset(df, factor, n_quiet):
    """Scale the PCM of the n_quiet lexicographically-first clips by factor —
    header columns unchanged, so only decoded-feature checks can see it."""
    ids = sorted(r[0] for r in df.select("clip_id").collect())[:n_quiet]
    idset = set(ids)

    def scale(batches):
        import pyarrow as pa

        for b in batches:
            d = b.to_pydict()
            out = []
            for cid, raw in zip(d["clip_id"], d["bytes"]):
                if cid in idset:
                    pcm = np.frombuffer(raw[44:], dtype="<i2")
                    scaled = np.clip(pcm.astype(np.float64) * factor, -32768, 32767)
                    raw = raw[:44] + scaled.astype("<i2").tobytes()
                out.append(raw)
            d["bytes"] = out
            yield pa.RecordBatch.from_pydict(d, schema=b.schema)

    return df.mapInArrow(scale, schema=df.schema), ids


def _run(spark, clips, contract=CONTRACT, **cfg_kw):
    spec = DataContractSpecification.from_string(contract)
    return validate(spark, spec, {"clips": clips}, ValidationConfig(**cfg_kw))


def _chk(res):
    return [c for c in res.run.checks if "signal_quality" in c.key][0]


def test_compile_validation():
    bad_feature = CONTRACT.replace("rms_dbfs", "nope")
    with pytest.raises(ValueError, match="signal-quality feature"):
        create_checks(DataContractSpecification.from_string(bad_feature))
    no_bounds = CONTRACT.replace(", minimum: -50.0", "")
    with pytest.raises(ValueError, match="minimum.*maximum"):
        create_checks(DataContractSpecification.from_string(no_bounds))


def test_clean_clips_pass(spark, clips):
    res = _run(spark, clips)
    chk = _chk(res)
    assert chk.result == ResultEnum.passed
    assert res.metrics[chk.key] == 0
    assert res.violations is None


def test_silent_clips_fail_with_count_and_violations(spark, clips):
    quiet, ids = _gain_scaled_subset(clips, 0.0, 7)  # 7 all-zero payloads
    res = _run(spark, quiet)
    chk = _chk(res)
    assert chk.result == ResultEnum.failed
    assert res.metrics[chk.key] == 7
    vio = res.violations.filter(F.col("check_key") == chk.key).collect()
    assert sorted(r["clip_id"] for r in vio) == ids
    for r in vio:
        name, val = r["observed"].split("=")
        assert name == "rms_dbfs" and float(val) < -50.0


def test_clip_ratio_maximum(spark, clips):
    contract = CONTRACT.replace(
        "column: rms_dbfs, minimum: -50.0",
        "column: clip_ratio, maximum: 0.5")
    loud, ids = _gain_scaled_subset(clips, 400.0, 5)  # drive 5 clips into hard clipping
    res = _run(spark, loud, contract=contract)
    chk = _chk(res)
    assert chk.result == ResultEnum.failed
    assert res.metrics[chk.key] == 5
    assert "clip_ratio" in chk.key


def test_threshold_forms_apply_to_count(spark, clips):
    tolerant = CONTRACT.replace(
        "minimum: -50.0}", "minimum: -50.0, mustBeLessThanOrEqualTo: 10}")
    quiet, _ = _gain_scaled_subset(clips, 0.0, 7)
    res = _run(spark, quiet, contract=tolerant)
    chk = _chk(res)
    assert chk.result == ResultEnum.passed
    assert res.metrics[chk.key] == 7


def test_decode_errors_not_double_counted(spark, clips):
    """A clip that fails to decode belongs to decode-conformance; the
    signal-quality count must not include it."""
    both = CONTRACT.replace(
        "    quality:",
        "    quality:\n      - {type: audio, invariant: decode-conformance}")

    def corrupt_first(batches):
        import pyarrow as pa

        first = [True]
        for b in batches:
            d = b.to_pydict()
            if first[0] and d["bytes"]:
                d["bytes"][0] = b"not a wav"
                first[0] = False
            yield pa.RecordBatch.from_pydict(d, schema=b.schema)

    broken = clips.repartition(1).mapInArrow(corrupt_first, schema=clips.schema)
    res = _run(spark, broken)
    assert _chk(res).result == ResultEnum.passed  # bad decode, not a quiet clip
    res = _run(spark, broken, contract=both)
    assert _chk(res).result == ResultEnum.passed
    conf = [c for c in res.run.checks if "decode_conformance" in c.key][0]
    assert conf.result == ResultEnum.failed


def test_fused_single_decode_with_conformance(spark, clips, monkeypatch):
    """signal-quality + decode-conformance in one contract: ONE decode scan
    feeds both (same proof shape as the loudness-drift fusion gate)."""
    from dcspark import engine as engine_mod

    both = CONTRACT.replace(
        "    quality:",
        "    quality:\n      - {type: audio, invariant: decode-conformance}")
    acc = spark.sparkContext.accumulator(0)

    def counting_snr(clip_id, sr, dur, pcm):
        acc.add(1)
        return None

    calls = []
    orig = engine_mod.Validator._audio_compact

    def counting_compact(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    monkeypatch.setattr(engine_mod.Validator, "_audio_compact", counting_compact)
    spec = DataContractSpecification.from_string(both)
    res = validate(spark, spec, {"clips": clips},
                   ValidationConfig(audio_snr_fn=counting_snr))
    assert _chk(res).result == ResultEnum.passed
    assert acc.value == N
    assert len(calls) == 1


def test_partitioned_records_and_checkpoint_resume(spark, clips, tmp_path):
    quiet, ids = _gain_scaled_subset(clips, 0.0, 6)
    part = quiet.withColumn(
        "day", F.concat(F.lit("d"), (F.crc32(F.col("clip_id")) % 3).cast("string")))

    flat = _run(spark, part)
    assert flat.metrics[_chk(flat).key] == 6

    res = _run(spark, part, partition_col="day")
    chk = _chk(res)
    assert res.metrics[chk.key] == 6
    per_part = [r for r in res.results
                if "signal_quality" in r["check_key"] and r["partition_id"] is not None]
    assert len(per_part) == 3
    assert sum(int(r["metric_value"]) for r in per_part) == 6

    ck = _run(spark, part, partition_col="day",
              checkpoint_dir=str(tmp_path / "ck"))
    assert ck.metrics[_chk(ck).key] == 6
    vio = sorted(r["clip_id"] for r in ck.violations.filter(
        F.col("check_key").contains("signal_quality")).collect())
    assert vio == ids

    # resume from the completed manifest: identical metric + violations,
    # reproduced from the manifest without rescanning
    rs = _run(spark, part, partition_col="day",
              checkpoint_dir=str(tmp_path / "ck"), resume=True)
    assert rs.metrics[_chk(rs).key] == 6
    vio2 = sorted(r["clip_id"] for r in rs.violations.filter(
        F.col("check_key").contains("signal_quality")).collect())
    assert vio2 == ids


def test_two_rules_same_feature_get_distinct_keys(spark, clips):
    """A silence floor AND a second bound on the SAME feature must stay
    separate checks (distinct keys, separate metrics) — regression for the
    idx-less key collapsing them in res.metrics."""
    contract = CONTRACT.replace(
        "- {type: audio, invariant: signal-quality, column: rms_dbfs, minimum: -50.0}",
        "- {type: audio, invariant: signal-quality, column: rms_dbfs, minimum: -50.0}\n"
        "      - {type: audio, invariant: signal-quality, column: rms_dbfs, minimum: 10.0}",
    )
    res = _run(spark, clips, contract=contract)
    keys = sorted(c.key for c in res.run.checks if "signal_quality" in c.key)
    assert len(keys) == 2 and keys[0] != keys[1]
    # floor at -50 passes every clean clip; a floor at +10 dBFS is impossible
    metrics = sorted(res.metrics[k] for k in keys)
    assert metrics[0] == 0.0 and metrics[1] == float(clips.count())
