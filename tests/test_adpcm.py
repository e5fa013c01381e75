"""IMA ADPCM (WAV 0x11): vectorized-across-blocks codec correctness.

Three independent legs: the vectorized decoder is sample-exact against a
direct scalar transliteration of the spec pseudocode on arbitrary streams;
the shared IMA core matches CPython audioop's DVI-ADPCM decode on the same
nibble sequence; and container round-trips preserve length exactly (via the
fact chunk) at the SNR a 4-bit predictive codec actually delivers.
"""

import warnings

import numpy as np
import pytest

from dcspark.adpcm import decode_ima_blocks, decode_ima_scalar, encode_ima_blocks
from dcspark.audio import encode_wav, parse_wav, snr_db

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    # removed in Python 3.13: skip only the audioop-oracle comparisons there
    audioop = pytest.importorskip("audioop")

SR = 16000


def _tone(dur_ms, hz=440.0, amp=12000):
    t = np.arange(int(SR * dur_ms / 1000)) / SR
    return (np.sin(2 * np.pi * hz * t) * amp).astype(np.int16)


@pytest.mark.parametrize("block_align,n_extra",
                         [(256, 0), (256, 100), (64, 17), (512, 5),
                          (256, 4), (256, 3)])  # 4-byte header-only tail; sub-header tail
def test_vectorized_decode_matches_scalar(block_align, n_extra):
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, block_align * 7 + n_extra, dtype=np.uint8)
    assert np.array_equal(decode_ima_blocks(data, block_align),
                          decode_ima_scalar(data, block_align))


def test_core_matches_audioop_dvi_adpcm():
    """Same nibble sequence through audioop.adpcm2lin (hi-nibble-first
    packing, zero initial state) and our scalar core (low-first block
    payload, predictor 0, index 0) must produce identical samples."""
    rng = np.random.default_rng(11)
    nibs = rng.integers(0, 16, 400, dtype=np.uint8)
    packed_hi = bytes((int(nibs[i]) << 4) | int(nibs[i + 1])
                      for i in range(0, len(nibs), 2))
    ref = np.frombuffer(audioop.adpcm2lin(packed_hi, 2, (0, 0))[0], "<i2")
    blk = np.zeros(4 + len(nibs) // 2, dtype=np.uint8)
    blk[4:] = nibs[0::2] | (nibs[1::2] << 4)
    mine = decode_ima_scalar(blk, len(blk))[1:]  # drop the header sample
    assert np.array_equal(ref, mine)


def test_encode_decode_roundtrip_snr():
    pcm = _tone(1000)
    data, spb = encode_ima_blocks(pcm, 256)
    assert spb == (256 - 4) * 2 + 1
    dec = decode_ima_blocks(np.frombuffer(data, np.uint8), 256)
    assert len(dec) >= len(pcm)  # final block edge-padded
    assert snr_db(pcm, dec[:len(pcm)]) >= 30.0


def test_container_roundtrip_exact_length():
    for dur in (137, 500, 1003):
        pcm = _tone(dur)
        sr, name, out = parse_wav(encode_wav(pcm, SR, codec="adpcm_ima_wav"))
        assert (sr, name) == (SR, "adpcm_ima_wav")
        assert len(out) == len(pcm)  # fact chunk trims block padding exactly
        assert snr_db(pcm, out) >= 30.0


def test_mix_content_snr_documented_band():
    """Broadband multi-sine content lands in the 4-bit codec's real SNR band
    (~20-25 dB) — below the contract's 30 dB decode-conformance floor, which
    is why adpcm_ima_wav is NOT in synth.ALT_CODECS."""
    from dcspark.synth import ALT_CODECS

    assert "adpcm_ima_wav" not in ALT_CODECS
    rng = np.random.default_rng(5)
    t = np.arange(SR) / SR
    mix = sum(a * np.sin(2 * np.pi * f * t)
              for f, a in zip(rng.uniform(100, 3000, 4), rng.uniform(0.1, 0.3, 4)))
    pcm = (mix / np.abs(mix).max() * 20000).astype(np.int16)
    _, _, out = parse_wav(encode_wav(pcm, SR, codec="adpcm_ima_wav"))
    assert 18.0 <= snr_db(pcm, out) < 30.0


def test_index_seeding_beats_zero_start():
    """The per-block header index seeding must outperform index-0 restarts."""
    pcm = _tone(1000, amp=20000)
    data, _ = encode_ima_blocks(pcm, 256)
    raw = np.frombuffer(data, np.uint8).copy()
    good = snr_db(pcm, decode_ima_blocks(raw, 256)[:len(pcm)])
    # zero out the header indices -> decoder re-adapts from step 7 per block
    zeroed = raw.copy()
    zeroed[2::256] = 0
    degraded = snr_db(pcm, decode_ima_blocks(zeroed, 256)[:len(pcm)])
    assert good > degraded


def test_payload_too_short_raises():
    with pytest.raises(ValueError, match="too short"):
        decode_ima_blocks(np.zeros(2, np.uint8), 256)


def test_stereo_adpcm_rejected():
    b = bytearray(encode_wav(_tone(100), SR, codec="adpcm_ima_wav"))
    import struct

    struct.pack_into("<H", b, 22, 2)  # claim 2 channels
    with pytest.raises(ValueError, match="multi-channel IMA ADPCM"):
        parse_wav(bytes(b))


def test_decode_report_with_adpcm(spark):
    """An adpcm clip with correctly-declared codec passes header conformance
    (sr/dur/codec) through the Spark decode pass; SNR is skipped without an
    oracle."""
    from dcspark.audio import audio_decode_report

    pcm = _tone(400)
    df = spark.createDataFrame(
        [("a", encode_wav(pcm, SR, codec="adpcm_ima_wav"), SR, 400, "adpcm_ima_wav")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string")
    r = audio_decode_report(df).collect()[0]
    assert r["decode_error"] is None
    assert r["sr_ok"] and r["dur_ok"] and r["codec_ok"]
