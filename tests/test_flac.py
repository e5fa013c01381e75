"""FLAC codec (dcspark/flac.py).

Evidence layers (no third-party FLAC exists in this sandbox):
1. published check values for both CRCs (CRC-8/SMBUS 0xF4, CRC-16/UMTS
   0xFEE8 over "123456789") anchor the polynomial arithmetic;
2. encoder->decoder round-trips are *bit-exact* and the STREAMINFO MD5 —
   computed over raw PCM by an independent path — must agree (the
   format's own lossless oracle);
3. a test-local spec-following writer (independent of the library
   encoder) crafts streams using LPC subframes, mid/side + left/side +
   right/side stereo, rice partition orders > 0, the 5-bit parameter
   method, escape-coded partitions, and wasted bits — decoding them back
   to the known input exercises every decoder path a conforming encoder
   can emit;
4. corruption: every flipped region must raise (CRC-8 header, CRC-16
   frame, MD5 stream), never return wrong PCM.
"""

import numpy as np
import pytest

from dcspark.flac import (
    _BitWriter,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
    parse_flac_meta,
)


def test_crc_check_values():
    assert crc8(b"123456789") == 0xF4     # CRC-8/SMBUS check value
    assert crc16(b"123456789") == 0xFEE8  # CRC-16/UMTS (poly 0x8005) check


def _sig(n, seed=0, amp=3000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (amp * np.sin(2 * np.pi * 440 * t / 16000)
            + rng.normal(0, 40, n)).astype(np.int16)


@pytest.mark.parametrize("n", [1, 17, 192, 4096, 4097, 20000])
def test_roundtrip_exact_mono(n):
    x = _sig(n, seed=n)
    blob = encode_flac(x, 16000)
    sr, codec, pcm = decode_flac(blob, verify_md5=True)
    assert (sr, codec) == (16000, "flac")
    assert np.array_equal(pcm, x)


def test_roundtrip_compresses():
    x = _sig(32000)
    blob = encode_flac(x, 16000)
    assert len(blob) < 0.8 * 2 * len(x)  # actually compressed, not stored


def test_roundtrip_constant_and_empty():
    c = np.full(5000, -321, np.int16)
    assert np.array_equal(decode_flac(encode_flac(c, 8000),
                                      verify_md5=True)[2], c)
    assert len(decode_flac(encode_flac(np.zeros(0, np.int16), 16000))[2]) == 0


def test_roundtrip_stereo_duplicate():
    x = _sig(6000, seed=3)
    sr, _, pcm = decode_flac(encode_flac(x, 44100, channels=2),
                             verify_md5=True)
    assert sr == 44100 and np.array_equal(pcm, x)


def test_meta_header_only():
    x = _sig(12345)
    assert parse_flac_meta(encode_flac(x, 22050)) == (22050, "flac", 12345)


def test_corruption_always_raises():
    x = _sig(8000, seed=9)
    blob = encode_flac(x, 16000)
    # 24: STREAMINFO total_samples; 30: STREAMINFO md5; 46/60: frame header
    # + payload; later offsets: frame bodies. (The advisory min/max-framesize
    # bytes at 8-13 are legitimately ignored, like any conforming decoder.)
    for off in (24, 30, 46, 60, len(blob) // 2, len(blob) - 3):
        bad = bytearray(blob)
        bad[off] ^= 0xFF
        with pytest.raises(ValueError):
            decode_flac(bytes(bad), verify_md5=True)
    with pytest.raises(ValueError):
        decode_flac(b"NOPE" + blob[4:])


# ---------------------------------------------------------------------------
# spec-following test writer (independent of the library encoder)
# ---------------------------------------------------------------------------


def _write_streaminfo(sr, channels, bps, total):
    import struct
    from hashlib import md5

    packed = (sr << 44) | ((channels - 1) << 41) | ((bps - 1) << 36) | total
    si = struct.pack(">HH", 16, 65535) + b"\x00" * 6 \
        + packed.to_bytes(8, "big") + b"\x00" * 16  # md5 unset -> skipped
    return b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si


def _w_utf8(w, fn):
    assert fn < 0x80
    w.write(fn, 8)


def _w_residual(w, res, porder=0, rice5=False, escape=False, order=0):
    n = len(res) + order
    w.write(1 if rice5 else 0, 2)
    w.write(porder, 4)
    plen = 5 if rice5 else 4
    esc_code = (1 << plen) - 1
    per = n >> porder
    pos = 0
    for p in range(1 << porder):
        cnt = per - order if p == 0 else per
        part = res[pos:pos + cnt]
        pos += cnt
        if escape:
            w.write(esc_code, plen)
            w.write(17, 5)  # raw 17-bit signed values
            for v in part.tolist():
                w.write(int(v), 17)
        else:
            u = ((part.astype(np.int64) << 1) ^ (part.astype(np.int64) >> 63))
            k = 6
            w.write(k, plen)
            for v in u.tolist():
                q = int(v) >> k
                while q >= 32:
                    w.write(0, 32)
                    q -= 32
                w.write(1, q + 1)
                w.write(int(v), k)


def _w_subframe_lpc(w, x, bps, order=3, shift=5, wasted=0):
    x = x.astype(np.int64)
    w.write(0, 1)
    w.write(32 | (order - 1), 6)
    if wasted:
        w.write(1, 1)
        w.write(1, wasted)  # (wasted-1) zeros then a 1
        x = x >> wasted
        bps -= wasted
    else:
        w.write(0, 1)
    # simple stable quantized predictor
    coefs = {1: [1 << shift], 2: [2 << shift, -(1 << shift)],
             3: [(3 << shift) // 2, -(1 << shift) // 2, 0]}[order]
    for v in x[:order].tolist():
        w.write(int(v), bps)
    prec = 14
    w.write(prec - 1, 4)
    w.write(shift, 5)
    for c in coefs:
        w.write(int(c), prec)
    pred = np.zeros(len(x) - order, np.int64)
    for j, c in enumerate(coefs):
        pred += c * x[order - 1 - j: len(x) - 1 - j]
    res = x[order:] - (pred >> shift)
    _w_residual(w, res, order=order)
    return None


def _w_subframe_verbatim(w, x, bps, porder=0, rice5=False, escape=False):
    # fixed order-1 so residuals exist to rice-code with the given options
    x = x.astype(np.int64)
    w.write(0, 1)
    w.write(8 + 1, 6)
    w.write(0, 1)
    w.write(int(x[0]), bps)
    res = np.diff(x)
    _w_residual(w, res, porder=porder, rice5=rice5, escape=escape, order=1)


def _frame(channels_data, sr, ch_code, bps=16, sub=None):
    """One-frame stream: channels_data per-subframe arrays; `sub` maps
    subframe index -> writer fn (default verbatim-ish fixed-1)."""
    n = len(channels_data[0])
    w = _BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 2)
    w.write(7, 4)          # 16-bit blocksize-1 follows
    w.write(13, 4)         # 16-bit sr follows
    w.write(ch_code, 4)
    w.write(4, 3)          # 16-bit samples
    w.write(0, 1)
    _w_utf8(w, 0)
    w.write(n - 1, 16)
    w.write(sr, 16)
    hdr = w.buf.copy()
    assert w.nbits == 0
    w.write(crc8(hdr), 8)
    for i, x in enumerate(channels_data):
        fn = (sub or {}).get(i, None)
        eff_bps = bps
        if ch_code == 8 and i == 1:
            eff_bps = bps + 1
        if ch_code == 9 and i == 0:
            eff_bps = bps + 1
        if ch_code == 10 and i == 1:
            eff_bps = bps + 1
        if fn is None:
            _w_subframe_verbatim(w, x, eff_bps)
        else:
            fn(w, x, eff_bps)
    w.align()
    body = w.buf.copy()
    w.write(crc16(body), 16)
    return w.bytes()


def _assemble(sr, channels, total, frame_bytes):
    return _write_streaminfo(sr, channels, 16, total) + frame_bytes


def test_decode_lpc_subframe():
    x = _sig(2048, seed=11)
    blob = _assemble(16000, 1, 2048, _frame(
        [x], 16000, ch_code=0,
        sub={0: lambda w, d, b: _w_subframe_lpc(w, d, b, order=3, shift=5)}))
    sr, _, pcm = decode_flac(blob)
    assert sr == 16000 and np.array_equal(pcm, x)


def test_decode_lpc_order1_and_2():
    x = _sig(1024, seed=12)
    for order in (1, 2):
        blob = _assemble(16000, 1, 1024, _frame(
            [x], 16000, ch_code=0,
            sub={0: lambda w, d, b, o=order:
                 _w_subframe_lpc(w, d, b, order=o)}))
        assert np.array_equal(decode_flac(blob)[2], x)


def test_decode_wasted_bits():
    x = (_sig(512, seed=13) & ~np.int16(3))  # all samples divisible by 4
    blob = _assemble(16000, 1, 512, _frame(
        [x], 16000, ch_code=0,
        sub={0: lambda w, d, b: _w_subframe_lpc(w, d, b, order=2, wasted=2)}))
    assert np.array_equal(decode_flac(blob)[2], x)


def test_decode_rice_partitions_and_5bit_method():
    x = _sig(2048, seed=14)
    for porder, rice5 in ((2, False), (3, True)):
        blob = _assemble(16000, 1, 2048, _frame(
            [x], 16000, ch_code=0,
            sub={0: lambda w, d, b, p=porder, r=rice5:
                 _w_subframe_verbatim(w, d, b, porder=p, rice5=r)}))
        assert np.array_equal(decode_flac(blob)[2], x)


def test_decode_escape_partitions():
    x = _sig(1024, seed=15)
    blob = _assemble(16000, 1, 1024, _frame(
        [x], 16000, ch_code=0,
        sub={0: lambda w, d, b: _w_subframe_verbatim(w, d, b, escape=True)}))
    assert np.array_equal(decode_flac(blob)[2], x)


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
def test_decode_stereo_decorrelation(mode):
    L = _sig(1024, seed=21)
    R = (_sig(1024, seed=22) // 2).astype(np.int16)
    Ln, Rn = L.astype(np.int64), R.astype(np.int64)
    if mode == "left_side":
        chans, code = [Ln, Ln - Rn], 8
    elif mode == "right_side":
        chans, code = [Ln - Rn, Rn], 9
    else:
        chans, code = [(Ln + Rn) >> 1, Ln - Rn], 10
    blob = _assemble(16000, 2, 1024, _frame(chans, 16000, ch_code=code))
    sr, _, pcm = decode_flac(blob)
    want = np.clip(np.round((Ln + Rn) / 2.0), -32768, 32767).astype(np.int16)
    assert np.array_equal(pcm, want)


# ---------------------------------------------------------------------------
# engine integration
# ---------------------------------------------------------------------------


def test_parse_wav_view_dispatches_flac():
    from dcspark.audio import encode_wav, parse_wav_meta, parse_wav_view

    x = _sig(16000, seed=30)
    blob = encode_wav(x, 16000, codec="flac")
    sr, codec, pcm = parse_wav_view(blob)
    assert (sr, codec) == (16000, "flac")
    assert np.array_equal(pcm, x)
    assert parse_wav_meta(blob) == (16000, "flac", 16000)
    # numpy-view input path (Arrow heap slice shape)
    view = np.frombuffer(blob, np.uint8)
    assert np.array_equal(parse_wav_view(view)[2], x)


def test_flac_transcode_roundtrip():
    """flac -> pcm_s16le transcode and back is lossless end to end."""
    from dcspark.audio import encode_wav, parse_wav_view

    x = _sig(8000, seed=31)
    flac_blob = encode_wav(x, 16000, codec="flac")
    _, _, pcm = parse_wav_view(flac_blob)
    wav_blob = encode_wav(pcm, 16000, codec="pcm_s16le")
    _, _, pcm2 = parse_wav_view(wav_blob)
    assert np.array_equal(pcm2, x)
