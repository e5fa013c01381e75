"""The image contract-rule FAMILY: signal-quality and content-uniqueness
invariants, and the exactly-one-decode fusion across all image rules.

Mirrors the audio family's proof shape (tests/test_audioquality.py):
feature functions pinned on known rasters, pass/fail engine semantics,
decode-error disjointness, threshold evaluators, and a fusion gate showing
one contract with decode-conformance + signal-quality + content-uniqueness
runs exactly ONE payload decode pass.
"""

import numpy as np
import pytest

from dcspark import DataContractSpecification, ValidationConfig, validate
from dcspark import multimodal
from dcspark.jpeg import jpeg_bytes
from dcspark.multimodal import IMAGE_FEATURE_FNS, image_luma
from dcspark.run_model import ResultEnum
from pyspark.sql import functions as F


def _photo(seed, h=48, w=64):
    """Smooth random 'photo' (same construction as test_imagefp)."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (6, 8, 3))
    yi = np.linspace(0, 5, h)
    xi = np.linspace(0, 7, w)
    up = np.empty((h, w, 3))
    for c in range(3):
        col = np.array([np.interp(xi, np.arange(8), base[r, :, c]) for r in range(6)])
        up[..., c] = np.array([np.interp(yi, np.arange(6), col[:, j]) for j in range(w)]).T
    return up.astype(np.uint8)


# ---------------------------------------------------------------------------
# feature functions on known rasters
# ---------------------------------------------------------------------------

def test_feature_fns_on_known_rasters():
    solid_black = np.zeros((16, 16, 3), np.uint8)
    solid_white = np.full((16, 16, 3), 255, np.uint8)
    luma_b = image_luma(solid_black)
    luma_w = image_luma(solid_white)
    assert IMAGE_FEATURE_FNS["brightness"](luma_b) == 0.0
    # BT.601 weights sum to 1.0 within float error
    assert abs(IMAGE_FEATURE_FNS["brightness"](luma_w) - 255.0) < 1e-9
    for luma in (luma_b, luma_w):
        assert IMAGE_FEATURE_FNS["contrast"](luma) == 0.0
        assert IMAGE_FEATURE_FNS["entropy"](luma) == 0.0
        assert IMAGE_FEATURE_FNS["clip_ratio"](luma) == 1.0
        assert IMAGE_FEATURE_FNS["sharpness"](luma) == 0.0

    # checkerboard: extreme contrast, sharpness, bimodal entropy == 1 bit
    cb = np.indices((16, 16)).sum(0) % 2 * np.uint8(255)
    luma_cb = image_luma(cb)
    assert IMAGE_FEATURE_FNS["contrast"](luma_cb) == pytest.approx(127.5)
    assert IMAGE_FEATURE_FNS["entropy"](luma_cb) == pytest.approx(1.0)
    assert IMAGE_FEATURE_FNS["sharpness"](luma_cb) > 1e5

    # mid-gray gradient: no clipped pixels, tiny laplacian
    grad = np.tile(np.linspace(60, 180, 64).astype(np.uint8), (48, 1))
    luma_g = image_luma(grad)
    assert IMAGE_FEATURE_FNS["clip_ratio"](luma_g) == 0.0
    assert IMAGE_FEATURE_FNS["sharpness"](luma_g) < 5.0
    # natural-ish photo: entropy well above a solid card
    assert IMAGE_FEATURE_FNS["entropy"](image_luma(_photo(3))) > 4.0


def test_feature_fns_tiny_and_gray_inputs():
    # 2x2 image: sharpness defined as 0 (no interior), others still work
    tiny = np.array([[0, 255], [255, 0]], np.uint8)
    luma = image_luma(tiny)
    assert IMAGE_FEATURE_FNS["sharpness"](luma) == 0.0
    assert IMAGE_FEATURE_FNS["brightness"](luma) == pytest.approx(127.5)
    # 2-D grayscale raster goes straight through image_luma
    assert image_luma(np.full((4, 4), 7, np.uint8)).mean() == 7.0


# ---------------------------------------------------------------------------
# engine semantics
# ---------------------------------------------------------------------------

CONTRACT_Q = """
id: image-quality
models:
  images:
    fields:
      image_id: {type: string, primaryKey: true}
      bytes: {type: bytes}
    quality:
      - {type: image, invariant: signal-quality, column: brightness,
         minimum: 10, maximum: 245}
      - {type: image, invariant: signal-quality, column: entropy, minimum: 1}
"""

DDL = "image_id string, bytes binary"


def _mkdf(spark, rows):
    return spark.createDataFrame(rows, DDL)


def test_signal_quality_pass_and_fail(spark):
    spec = DataContractSpecification.from_string(CONTRACT_Q)
    good = _mkdf(spark, [(f"ok-{i}", bytearray(multimodal.png_bytes(_photo(i))))
                         for i in range(6)])
    res = validate(spark, spec, {"images": good}, ValidationConfig())
    assert res.run.result == ResultEnum.passed, [
        (c.key, c.result, c.reason) for c in res.run.checks]

    black = np.zeros((16, 16, 3), np.uint8)          # brightness 0, entropy 0
    white = np.full((16, 16, 3), 255, np.uint8)      # brightness 255, entropy 0
    rows = [("ok", bytearray(multimodal.png_bytes(_photo(0)))),
            ("black-card", bytearray(multimodal.png_bytes(black))),
            ("white-card", bytearray(multimodal.png_bytes(white)))]
    res2 = validate(spark, spec, {"images": _mkdf(spark, rows)},
                    ValidationConfig())
    bright = [c for c in res2.run.checks if "brightness" in c.key][0]
    entro = [c for c in res2.run.checks if "entropy" in c.key][0]
    assert bright.result == ResultEnum.failed
    assert res2.metrics[bright.key] == 2
    assert entro.result == ResultEnum.failed
    assert res2.metrics[entro.key] == 2
    from pyspark.sql import functions as F
    vio = {r["clip_id"]: r["observed"] for r in res2.violations.filter(
        F.col("check_key") == bright.key).collect()}
    assert set(vio) == {"black-card", "white-card"}
    assert vio["black-card"].startswith("brightness=0")


def test_signal_quality_skips_decode_errors(spark):
    """A corrupt payload belongs to decode-conformance, never double-counted
    as a quality violation."""
    spec = DataContractSpecification.from_string(CONTRACT_Q)
    rows = [("ok", bytearray(multimodal.png_bytes(_photo(0)))),
            ("broken", bytearray(b"not an image"))]
    res = validate(spark, spec, {"images": _mkdf(spark, rows)},
                   ValidationConfig())
    assert all(c.result == ResultEnum.passed for c in res.run.checks
               if "signal_quality" in c.key), [
        (c.key, c.result, c.reason) for c in res.run.checks]


def test_signal_quality_threshold_evaluator(spark):
    """mustBeLessThanOrEqualTo tolerates a budget of violating images."""
    contract = CONTRACT_Q.replace(
        "         minimum: 10, maximum: 245}",
        "         minimum: 10, maximum: 245, mustBeLessThanOrEqualTo: 2}")
    spec = DataContractSpecification.from_string(contract)
    black = np.zeros((16, 16, 3), np.uint8)
    rows = [("ok", bytearray(multimodal.png_bytes(_photo(0)))),
            ("b1", bytearray(multimodal.png_bytes(black))),
            ("b2", bytearray(multimodal.png_bytes(black)))]
    res = validate(spark, spec, {"images": _mkdf(spark, rows)},
                   ValidationConfig())
    bright = [c for c in res.run.checks if "brightness" in c.key][0]
    assert bright.result == ResultEnum.passed  # 2 <= budget of 2
    assert res.metrics[bright.key] == 2


def test_content_uniqueness_rule(spark):
    contract = """
id: image-uniq
models:
  images:
    fields:
      image_id: {type: string, primaryKey: true}
      bytes: {type: bytes}
    quality:
      - {type: image, invariant: content-uniqueness}
"""
    spec = DataContractSpecification.from_string(contract)
    distinct = _mkdf(spark, [
        (f"im-{i:02d}", bytearray(multimodal.png_bytes(_photo(i))))
        for i in range(12)])
    res = validate(spark, spec, {"images": distinct}, ValidationConfig())
    assert res.run.result == ResultEnum.passed, [
        (c.key, c.result, c.reason) for c in res.run.checks]

    base = _photo(0)
    dup_rows = [(f"im-{i:02d}", bytearray(multimodal.png_bytes(_photo(i))))
                for i in range(12)]
    dup_rows.append(("re-enc", bytearray(jpeg_bytes(base, quality=70))))
    res2 = validate(spark, spec, {"images": _mkdf(spark, dup_rows)},
                    ValidationConfig())
    chk = [c for c in res2.run.checks if "content_uniqueness" in c.key][0]
    assert chk.result == ResultEnum.failed
    assert res2.metrics[chk.key] == 1
    from pyspark.sql import functions as F
    vio = res2.violations.filter(F.col("check_key") == chk.key).collect()
    assert len(vio) == 1
    assert set(vio[0]["clip_id"].split("|")) == {"im-00", "re-enc"}
    assert vio[0]["observed"].startswith("hamming=")


def test_content_uniqueness_pair_budget(spark):
    """threshold = Hamming radius; mustBeLessThanOrEqualTo = pair budget."""
    contract = """
id: image-uniq-budget
models:
  images:
    fields:
      image_id: {type: string, primaryKey: true}
      bytes: {type: bytes}
    quality:
      - {type: image, invariant: content-uniqueness, threshold: 0,
         mustBeLessThanOrEqualTo: 1}
"""
    spec = DataContractSpecification.from_string(contract)
    png = bytearray(multimodal.png_bytes(_photo(5)))
    rows = [("a", png), ("b", png),
            ("c", bytearray(multimodal.png_bytes(_photo(6))))]
    res = validate(spark, spec, {"images": _mkdf(spark, rows)},
                   ValidationConfig())
    chk = [c for c in res.run.checks if "content_uniqueness" in c.key][0]
    assert chk.result == ResultEnum.passed  # exactly 1 identical pair <= 1
    assert res.metrics[chk.key] == 1


FUSED_CONTRACT = """
id: image-fused
models:
  images:
    fields:
      image_id: {type: string, primaryKey: true}
      bytes: {type: bytes}
      width: {type: integer}
      height: {type: integer}
    quality:
      - {type: image, invariant: decode-conformance, column: bytes,
         width_column: width, height_column: height}
      - {type: image, invariant: signal-quality, column: brightness,
         minimum: 5}
      - {type: image, invariant: signal-quality, column: contrast,
         minimum: 1}
      - {type: image, invariant: content-uniqueness}
"""


def test_fused_single_decode_across_image_family(spark, monkeypatch):
    """decode-conformance + 2x signal-quality + content-uniqueness in one
    contract: ONE decode pass feeds all four checks (the audio family's
    exactly-one-decode invariant, ported to images)."""
    from dcspark import engine as engine_mod
    from dcspark import imagefp

    calls = []
    orig_compact = engine_mod.Validator._image_compact

    def counting_compact(self, *a, **k):
        calls.append(1)
        return orig_compact(self, *a, **k)

    acc = spark.sparkContext.accumulator(0)
    orig_decoder = multimodal.real_image_decoder

    def counting_decoder(raw):
        acc.add(1)
        return orig_decoder(raw)

    monkeypatch.setattr(engine_mod.Validator, "_image_compact", counting_compact)
    monkeypatch.setattr(imagefp, "real_image_decoder", counting_decoder)
    # image_compact's default decoder arg was bound at import; patch through
    orig_image_compact = imagefp.image_compact

    def compact_with_counting(df, **kw):
        kw.setdefault("decoder", counting_decoder)
        return orig_image_compact(df, **kw)

    monkeypatch.setattr(imagefp, "image_compact", compact_with_counting)

    n = 8
    rows = [(f"im-{i}", bytearray(multimodal.png_bytes(_photo(i))), 64, 48)
            for i in range(n)]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, width int, height int")
    spec = DataContractSpecification.from_string(FUSED_CONTRACT)
    res = validate(spark, spec, {"images": df}, ValidationConfig())
    assert res.run.result == ResultEnum.passed, [
        (c.key, c.result, c.reason) for c in res.run.checks]
    assert len([c for c in res.run.checks if c.category == "image"]) == 4
    assert len(calls) == 1          # one fused compact pass built
    assert acc.value == n           # every payload decoded exactly once


def test_fused_family_missing_bytes_column(spark):
    """A missing payload column errors every check in the family, not just
    the first."""
    spec = DataContractSpecification.from_string(FUSED_CONTRACT)
    df = spark.createDataFrame(
        [("a", 1, 1)], "image_id string, width int, height int")
    res = validate(spark, spec, {"images": df}, ValidationConfig())
    img_checks = [c for c in res.run.checks if c.category == "image"]
    assert len(img_checks) == 4
    assert all(c.result == ResultEnum.error for c in img_checks)


# ---------------------------------------------------------------------------
# compile-time validation
# ---------------------------------------------------------------------------

def test_compile_rejects_bad_image_rules():
    from dcspark.compile import check_image_near_dup, check_image_quality
    from dcspark.spec import Quality

    with pytest.raises(ValueError, match="unknown image signal-quality"):
        check_image_quality("m", Quality(type="image", column="loudness",
                                         minimum=1), 0)
    with pytest.raises(ValueError, match="needs 'minimum' and/or 'maximum'"):
        check_image_quality("m", Quality(type="image", column="brightness"), 0)
    with pytest.raises(ValueError, match="must be 0..3"):
        check_image_near_dup("m", Quality(type="image", threshold=7), 0)


def test_compile_dispatch_image_invariants():
    from dcspark.compile import create_checks

    contract = """
id: dispatch
models:
  images:
    fields:
      image_id: {type: string, primaryKey: true}
      bytes: {type: bytes}
    quality:
      - {type: image, invariant: decode-conformance}
      - {type: image, invariant: signal-quality, column: sharpness, minimum: 1}
      - {type: image, invariant: content-uniqueness}
"""
    spec = DataContractSpecification.from_string(contract)
    kinds = [c.kind for c in create_checks(spec)["images"]
             if c.kind.startswith("image")]
    assert kinds == ["image", "image_quality", "image_fp"]


# ---------------------------------------------------------------------------
# luminance-drift (type: image, invariant: luminance-drift)
# ---------------------------------------------------------------------------

DRIFT_CONTRACT = """
id: image-drift
models:
  images:
    fields:
      image_id: {type: string, primaryKey: true}
      bytes: {type: bytes}
    quality:
      - {type: image, invariant: luminance-drift, column: brightness,
         method: psi, threshold: 0.2}
"""


def _image_ref_stats(spark, df, feats=("brightness",)):
    from dcspark import drift as drift_mod
    from dcspark.imagefp import image_compact

    frame = image_compact(df, id_col="image_id", bytes_col="bytes",
                          features=tuple(feats)).filter(
        F.col("decode_error").isNull()).select(
        *[F.col(f"f_{f}").alias(f) for f in feats]).persist()
    try:
        stats = drift_mod.build_ref_stats(frame, list(feats))
    finally:
        frame.unpersist()
    return {f"image:{f}": s for f, s in stats.items()}


def _photos_df(spark, n=24, gain=1.0, seed0=0):
    rows = []
    for i in range(n):
        px = _photo(seed0 + i)
        if gain != 1.0:
            px = np.clip(px.astype(np.float64) * gain, 0, 255).astype(np.uint8)
        rows.append((f"im-{i:03d}", bytearray(multimodal.png_bytes(px))))
    return _mkdf(spark, rows)


def test_luminance_drift_pass_fail_and_no_snapshot(spark):
    spec = DataContractSpecification.from_string(DRIFT_CONTRACT)
    ref_df = _photos_df(spark, 24)
    ref = _image_ref_stats(spark, ref_df)

    # no snapshot -> error, and the decode pass never pays for the feature
    res0 = validate(spark, spec, {"images": ref_df}, ValidationConfig())
    chk0 = [c for c in res0.run.checks if "image_drift" in c.key][0]
    assert chk0.result == ResultEnum.error

    # same data as the snapshot -> statistic ~0, passes (the audio drift
    # test's proof shape; PSI between two independent 24-image draws is
    # dominated by sampling noise and is not a correctness signal)
    res1 = validate(spark, spec, {"images": ref_df},
                    ValidationConfig(ref_stats={"images": ref}))
    chk1 = [c for c in res1.run.checks if "image_drift" in c.key][0]
    assert chk1.result == ResultEnum.passed, (chk1.reason, res1.metrics)

    # a 0.45x darkening regression (re-encode bug) -> PSI alarm
    dark = _photos_df(spark, 24, gain=0.45)
    res2 = validate(spark, spec, {"images": dark},
                    ValidationConfig(ref_stats={"images": ref}))
    chk2 = [c for c in res2.run.checks if "image_drift" in c.key][0]
    assert chk2.result == ResultEnum.failed
    assert res2.metrics[chk2.key] > 0.2


def test_luminance_drift_rides_single_decode(spark, monkeypatch):
    """drift + quality + conformance + uniqueness: still ONE decode pass,
    and the drift feature is computed inside it."""
    from dcspark import engine as engine_mod

    contract = DRIFT_CONTRACT.replace(
        "    quality:",
        "    quality:\n"
        "      - {type: image, invariant: decode-conformance}\n"
        "      - {type: image, invariant: signal-quality, column: entropy,\n"
        "         minimum: 0.5}\n"
        "      - {type: image, invariant: content-uniqueness}")
    spec = DataContractSpecification.from_string(contract)
    ref_df = _photos_df(spark, 12)
    ref = _image_ref_stats(spark, ref_df)

    calls = []
    orig = engine_mod.Validator._image_compact

    def counting(self, *a, **k):
        calls.append(k.get("features"))
        return orig(self, *a, **k)

    monkeypatch.setattr(engine_mod.Validator, "_image_compact", counting)
    res = validate(spark, spec, {"images": ref_df},
                   ValidationConfig(ref_stats={"images": ref}))
    assert len(calls) == 1
    assert calls[0] == ("brightness", "entropy")  # union of needed features
    img_checks = [c for c in res.run.checks if c.category == "image"]
    assert len(img_checks) == 4
    assert all(c.result == ResultEnum.passed for c in img_checks), [
        (c.key, c.result, c.reason) for c in img_checks]


def test_compile_rejects_bad_image_drift():
    from dcspark.compile import check_image_drift
    from dcspark.spec import Quality

    with pytest.raises(ValueError, match="unknown image drift feature"):
        check_image_drift("m", Quality(type="image", column="rms_dbfs"), 0)
    with pytest.raises(ValueError, match="unknown drift method"):
        check_image_drift("m", Quality(type="image", column="brightness",
                                       method="chi2"), 0)


def test_cli_snapshot_builds_image_feature_stats(tmp_path, capsys, spark):
    """`snapshot` decodes the reference image sample and stores
    'image:brightness' stats; `test --ref-stats` then passes on the same
    data (self-comparison: zero drift)."""
    from dcspark.cli import main

    cpath = str(tmp_path / "c.yaml")
    with open(cpath, "w") as f:
        f.write(DRIFT_CONTRACT)
    data_dir = tmp_path / "data"
    _photos_df(spark, 16).write.parquet(str(data_dir / "images.parquet"))
    snap_dir = str(tmp_path / "snap")

    assert main(["snapshot", cpath, "--path", str(data_dir),
                 "--out", snap_dir]) == 0
    capsys.readouterr()
    snap = spark.read.parquet(f"{snap_dir}/images.parquet")
    assert {r["column"] for r in snap.collect()} == {"image:brightness"}

    assert main(["test", cpath, "--path", str(data_dir),
                 "--ref-stats", snap_dir]) == 0
    out = capsys.readouterr().out
    assert "RUN RESULT: passed" in out
    assert "image_drift_psi" in out
