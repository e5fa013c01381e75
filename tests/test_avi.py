"""AVI/MJPEG container: real video decode built on the in-repo JPEG codec."""

import struct

import numpy as np
import pytest

from dcspark.avi import avi_bytes, decode_avi
from dcspark.jpeg import psnr


def _frames(n=6, h=32, w=40):
    out = []
    for i in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        f = np.stack([(xx * 255 // (w - 1)),
                      (yy * 255 // (h - 1)),
                      np.full((h, w), (i * 40) % 256)], axis=-1).astype(np.uint8)
        out.append(f)
    return out


def test_roundtrip_frame_count_fps_and_fidelity():
    frames = _frames()
    raw = avi_bytes(frames, fps=12.5, quality=90)
    fps, dec = decode_avi(raw)
    assert fps == pytest.approx(12.5)
    assert len(dec) == len(frames)
    for a, b in zip(frames, dec):
        assert b.shape == a.shape
        assert psnr(a, b) > 35.0
    # frames are distinguishable (the varying blue plane survived)
    assert abs(int(dec[0][..., 2].mean()) - int(dec[5][..., 2].mean())) > 100


def test_structure_markers_present():
    raw = avi_bytes(_frames(2), fps=30.0)
    for marker in (b"RIFF", b"AVI ", b"hdrl", b"avih", b"strl", b"strh",
                   b"strf", b"MJPG", b"movi", b"00dc", b"idx1"):
        assert marker in raw, marker


def test_non_avi_and_mp4_rejected():
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi(b"certainly not a container")
    from dcspark.multimodal import real_video_decoder

    mp4ish = b"\x00\x00\x00\x18ftypisom" + b"\x00" * 64
    with pytest.raises(NotImplementedError, match="inter-frame"):
        real_video_decoder(mp4ish)


def test_foreign_codec_stream_rejected():
    raw = bytearray(avi_bytes(_frames(2)))
    i = raw.find(b"vids") + 4
    raw[i:i + 4] = b"H264"
    with pytest.raises(ValueError, match="unsupported video codec"):
        decode_avi(bytes(raw))


def test_corrupt_frame_surfaces_valueerror():
    raw = bytearray(avi_bytes(_frames(2)))
    i = raw.find(b"00dc") + 8
    for j in range(i + 30, i + 60):
        raw[j] ^= 0xFF
    try:
        decode_avi(bytes(raw))
    except ValueError:
        pass  # garbage either decodes to noise or raises — never crashes


def test_video_frame_sample_real_decoder(spark):
    """The Spark video pipeline runs end to end on real MJPEG payloads."""
    from dcspark.multimodal import real_video_decoder, video_frame_sample

    raw = avi_bytes(_frames(8, h=16, w=16), fps=10.0)
    df = spark.createDataFrame([("v", bytearray(raw)), ("bad", b"nope-nope-nope")],
                               "id string, bytes binary")
    rows = video_frame_sample(df, every_n=2, max_frames=3,
                              decoder=real_video_decoder).collect()
    ok = [r for r in rows if r["id"] == "v"]
    assert 1 <= len(ok) <= 3
    assert all(r["decode_error"] is None for r in ok)
    assert all(r["frame_idx"] % 2 == 0 for r in ok)
    assert all(len(r["frame"]) == 16 * 16 * 3 for r in ok)
    bad = [r for r in rows if r["id"] == "bad"]
    assert len(bad) == 1 and bad[0]["decode_error"]


def test_truncated_strh_is_valueerror():
    raw = avi_bytes(_frames(2))
    cut = raw[: raw.find(b"vids") + 10]  # mid-strh
    with pytest.raises(ValueError):
        decode_avi(cut)


def test_list_nesting_bomb_is_valueerror():
    body = b""
    for _ in range(50):
        body = b"LIST" + struct.pack("<I", len(body) + 4) + b"xxxx" + body
    bomb = b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body
    with pytest.raises(ValueError):
        decode_avi(bomb)
