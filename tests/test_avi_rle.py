"""MS-RLE8 inter-frame AVI codec (dcspark/avi.py rle8_avi_bytes/decode_avi).

The point under test: RLE8 is genuinely INTER-FRAME — delta frames carry
only changed pixels, the decoder replays them onto the previous frame's
canvas — so the decode contract for stateful video (keyframe bootstrap,
skip regions, cross-frame state) is exercised by a real VfW codec, not a
stub. Lossless, so round-trips are exact."""

import numpy as np
import pytest

from dcspark.avi import (GRAY_PALETTE, _rle8_apply, _rle8_encode,
                         avi_bytes, decode_avi, rle8_avi_bytes)


def _rng(seed=7):
    return np.random.default_rng(seed)


def _gray_video(n=6, h=24, w=32, seed=7):
    """A static scene with a small moving block — mostly-unchanged frames."""
    rng = _rng(seed)
    base = rng.integers(0, 256, (h, w), dtype=np.uint8)
    frames = []
    for i in range(n):
        f = base.copy()
        f[2 + i:8 + i, 3 + i:9 + i] = (i * 37) % 256
        frames.append(f)
    return frames


def test_rle8_roundtrip_exact():
    frames = _gray_video()
    raw = rle8_avi_bytes(frames, fps=10.0)
    fps, got = decode_avi(raw)
    assert fps == pytest.approx(10.0)
    assert len(got) == len(frames)
    for want, out in zip(frames, got):
        assert out.shape == (24, 32, 3)
        np.testing.assert_array_equal(out[:, :, 0], want)
        np.testing.assert_array_equal(out[:, :, 1], want)  # gray palette


def test_rle8_delta_frames_are_small():
    frames = _gray_video()
    # keyframe encodes every pixel; deltas only the moving block
    key = _rle8_encode(frames[0][::-1], None)
    delta = _rle8_encode(frames[1][::-1], frames[0][::-1])
    assert len(delta) < len(key) / 4, (len(delta), len(key))
    # fully static frame: just the end-of-bitmap escape
    static = _rle8_encode(frames[0][::-1], frames[0][::-1])
    assert static == b"\x00\x01"


def test_rle8_custom_palette():
    rng = _rng(3)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    frames = [np.full((8, 8), 5, np.uint8), np.full((8, 8), 9, np.uint8)]
    fps, got = decode_avi(rle8_avi_bytes(frames, palette=pal))
    np.testing.assert_array_equal(got[0][0, 0], pal[5])
    np.testing.assert_array_equal(got[1][3, 3], pal[9])


def test_rle8_random_noise_roundtrip():
    # worst case: nothing to skip, every pixel changes every frame
    rng = _rng(11)
    frames = [rng.integers(0, 256, (16, 16), dtype=np.uint8)
              for _ in range(4)]
    fps, got = decode_avi(rle8_avi_bytes(frames))
    for want, out in zip(frames, got):
        np.testing.assert_array_equal(out[:, :, 0], want)


def test_rle8_corrupt_streams_raise():
    canvas = np.zeros((4, 4), np.uint8)
    with pytest.raises(ValueError):  # run overruns row
        _rle8_apply(bytes((10, 1, 0, 1)), canvas)
    with pytest.raises(ValueError):  # missing end-of-bitmap
        _rle8_apply(bytes((2, 7)), canvas)
    with pytest.raises(ValueError):  # truncated delta escape
        _rle8_apply(bytes((0, 2)), canvas)
    with pytest.raises(ValueError):  # absolute run overruns
        _rle8_apply(bytes((0, 3, 1, 2)), canvas)
    frames = [np.zeros((8, 8), np.uint8)]
    raw = bytearray(rle8_avi_bytes(frames))
    # corrupt the movi payload: flip a byte inside the frame chunk
    i = raw.find(b"00dc") + 8
    raw[i:i + 2] = bytes((200, 5))  # run of 200 pixels on an 8-wide row
    with pytest.raises(ValueError):
        decode_avi(bytes(raw))


def test_rle8_encoder_rejects_bad_input():
    with pytest.raises(ValueError):
        rle8_avi_bytes([])
    with pytest.raises(ValueError):
        rle8_avi_bytes([np.zeros((4, 4, 3), np.uint8)])  # not indices
    with pytest.raises(ValueError):
        rle8_avi_bytes([np.zeros((4, 4), np.uint8)],
                       palette=np.zeros((16, 3), np.uint8))


def test_mjpg_still_decodes_and_foreign_codecs_still_raise():
    rng = _rng(5)
    rgb = [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)]
    fps, got = decode_avi(avi_bytes(rgb, fps=5.0))
    assert len(got) == 1 and got[0].shape == (16, 16, 3)
    raw = bytearray(avi_bytes(rgb))
    i = raw.find(b"vidsMJPG")
    raw[i + 4:i + 8] = b"H264"
    with pytest.raises(ValueError, match="unsupported video codec"):
        decode_avi(bytes(raw))


def test_rle8_through_multimodal_decoder():
    from dcspark.multimodal import real_video_decoder
    frames = _gray_video(n=3)
    fps, got = real_video_decoder(rle8_avi_bytes(frames, fps=12.0))
    assert fps == pytest.approx(12.0)
    assert len(got) == 3
    np.testing.assert_array_equal(got[2][:, :, 0], frames[2])
