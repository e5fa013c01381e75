"""GIF87a/89a codec (dcspark/gif.py): LZW, palettes, interlace, animation.

Validated two ways: bit-exact encode->decode round trips on synthesized
frames (including a 12-bit-table-overflow image that forces a mid-stream
clear code), and decode of REAL tool-produced GIFs (the Python distribution's
idlelib icons) — wrong LZW code-size timing fails loudly on those.
"""

import glob

import numpy as np
import pytest

from dcspark import gif, multimodal

try:  # real tool-produced GIFs ship with the running Python's idlelib
    import idlelib
    import os
    IDLE_ICONS = sorted(glob.glob(
        os.path.join(os.path.dirname(idlelib.__file__), "Icons", "*.gif")))
except ImportError:
    IDLE_ICONS = []


def _img(seed=7, shape=(23, 31), colors=5):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (colors, 3), dtype=np.uint8)
    return pal[rng.integers(0, colors, shape)]


def test_single_frame_roundtrip():
    img = _img()
    fps, frames = gif.decode_gif(gif.encode_gif([img], fps=20))
    assert fps == 20.0 and len(frames) == 1
    assert np.array_equal(frames[0], img)


def test_multi_frame_roundtrip_and_fps():
    a = _img()
    b = np.roll(a, 3, axis=1)
    fps, frames = gif.decode_gif(gif.encode_gif([a, b, a], fps=25))
    assert fps == 25.0 and len(frames) == 3
    assert np.array_equal(frames[1], b) and np.array_equal(frames[2], a)


def test_interlaced_roundtrip():
    img = _img(shape=(17, 9))
    _, frames = gif.decode_gif(gif.encode_gif([img], interlace_first=True))
    assert np.array_equal(frames[0], img)


def test_twelve_bit_table_overflow_forces_clear():
    # 300x300 of 200 random colors exhausts the 4096-entry LZW table; the
    # encoder must flush with a clear code and the decoder must resync
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (200, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 200, (300, 300))]
    _, frames = gif.decode_gif(gif.encode_gif([img]))
    assert np.array_equal(frames[0], img)


def test_corrupt_and_truncated_payloads_raise():
    raw = gif.encode_gif([_img()])
    with pytest.raises(ValueError):
        gif.decode_gif(raw[:40])
    with pytest.raises(ValueError):
        gif.decode_gif(b"NOTGIF" + raw[6:])
    with pytest.raises(ValueError):
        gif.encode_gif([])


@pytest.mark.skipif(not IDLE_ICONS, reason="no real GIF samples on this host")
def test_real_tool_produced_gifs_decode():
    for p in IDLE_ICONS:
        raw = open(p, "rb").read()
        fps, frames = gif.decode_gif(raw)
        f = frames[0]
        assert f.ndim == 3 and f.shape[2] == 3 and f.size > 0
        # self-consistency: our encoder reproduces the decoded raster
        rt = gif.decode_gif(gif.encode_gif([f]))[1][0]
        assert np.array_equal(rt, f), p


def test_multimodal_sniffers_route_gif():
    img = _img()
    raw = gif.encode_gif([img, np.roll(img, 1, axis=0)], fps=50)
    h, w, c, px = multimodal.real_image_decoder(raw)
    assert (h, w, c) == (23, 31, 3) and np.array_equal(px, img)
    fps, frames = multimodal.real_video_decoder(raw)
    assert fps == 50.0 and len(frames) == 2


def test_corrupt_first_code_raises_valueerror_not_indexerror():
    # review finding: a first-after-clear code beyond the table must raise
    # ValueError (the Arrow UDF decode_error catch tuple), never IndexError
    good = gif.encode_gif([_img()])
    # locate the image data sub-block and poison its first code byte
    pos = good.index(b"\x2c")          # image descriptor (no local color table)
    data_start = pos + 10 + 1 + 1      # descriptor + min-code + first len byte
    bad = bytearray(good)
    bad[data_start] = 0xFF             # codes far beyond the fresh table
    with pytest.raises(ValueError):
        gif.decode_gif(bytes(bad))
