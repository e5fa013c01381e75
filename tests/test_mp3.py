"""MPEG audio (MP3) frame-header metadata (dcspark/mp3.py).

The audio analog of the video container parsers: PCM decode stays the
pluggable seam, but sr / duration / codec / bitrate come from a frame-header
walk, feeding the census path (audio.parse_wav_meta -> audioops.audio_census)
and a precise decode_error on the conformance path.
"""

import pytest

from dcspark.mp3 import is_mp3, mp3_bytes, mp3_meta_triple, parse_mp3_meta


@pytest.mark.parametrize("kw,sr,spf", [
    (dict(), 44100, 1152),                                    # MPEG1 L3
    (dict(version=2, sr=16000, bitrate_kbps=64), 16000, 576),  # MPEG2 L3
    (dict(version=25, sr=8000, bitrate_kbps=40), 8000, 576),   # MPEG2.5 L3
    (dict(layer=2, bitrate_kbps=192), 44100, 1152),            # Layer II
    (dict(layer=1, bitrate_kbps=256), 44100, 384),             # Layer I
])
def test_round_trip(kw, sr, spf):
    m = parse_mp3_meta(mp3_bytes(n_frames=10, **kw))
    assert m["sr_hz"] == sr
    assert m["n_frames"] == 10
    assert m["n_samples"] == 10 * spf
    assert m["duration_ms"] == pytest.approx(10 * spf * 1000 / sr)


def test_id3_tags_skipped_and_flagged():
    m = parse_mp3_meta(mp3_bytes(with_id3v2=True, with_id3v1=True))
    assert m["has_id3v2"] and m["has_id3v1"]
    assert m["n_frames"] == 10


def test_meta_triple_census_shape():
    assert mp3_meta_triple(mp3_bytes()) == (44100, "mp3", 11520)
    assert mp3_meta_triple(mp3_bytes(layer=2, bitrate_kbps=192))[1] == "mp2"


def test_sniff():
    assert is_mp3(mp3_bytes())
    assert is_mp3(mp3_bytes(with_id3v2=True))
    assert not is_mp3(b"RIFFxxxxWAVEfmt ")
    assert not is_mp3(b"fLaC\x00\x00\x00\x22")
    assert not is_mp3(b"\xff\xff\xff\xff")  # sync but reserved fields? no:
    # 0xFF 0xFF = version 3 layer 3 ok, bitrate idx 15 invalid -> rejected


@pytest.mark.parametrize("corrupt", [
    lambda b: b[:len(b) // 2 + 3],          # truncated mid-frame
    lambda b: b"\x00\x01" + b,              # leading junk: desync
    lambda b: b[:417] + b"\xde\xad" + b[419:],  # stomp frame 2's header
                                                # (128kbps@44.1k frames are
                                                # 417 bytes)
])
def test_corrupt_raises(corrupt):
    raw = mp3_bytes(n_frames=5)  # 128kbps @44.1k: 417-byte frames
    with pytest.raises(ValueError, match="mp3"):
        parse_mp3_meta(corrupt(bytearray(raw)))


def test_mid_stream_rate_switch_raises():
    a = mp3_bytes(n_frames=2)
    b = mp3_bytes(n_frames=2, version=2, sr=16000, bitrate_kbps=64)
    with pytest.raises(ValueError, match="changed mid-stream"):
        parse_mp3_meta(a + b)


def test_parse_wav_meta_covers_mp3():
    from dcspark.audio import parse_wav_meta

    sr, codec, n = parse_wav_meta(mp3_bytes(n_frames=20))
    assert (sr, codec, n) == (44100, "mp3", 20 * 1152)


def test_decode_path_gives_precise_seam_error():
    from dcspark.audio import parse_wav_view

    with pytest.raises(ValueError, match="mpeg-audio"):
        parse_wav_view(mp3_bytes())


def test_audio_census_counts_mp3_rows(spark):
    """An archive mixing WAV and MP3 payloads: the census reports both
    codecs with correct hours, zero decode failures."""
    from dcspark import audioops
    from dcspark.audio import encode_wav
    import numpy as np

    wav = encode_wav(np.zeros(16000, dtype=np.int16), 16000)
    mp3 = mp3_bytes(sr=44100, n_frames=50)  # ~1.3 s
    rows = ([("w%d" % i, bytearray(wav)) for i in range(4)]
            + [("m%d" % i, bytearray(mp3)) for i in range(3)])
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    out = {r["codec"]: r for r in audioops.audio_census(df).collect()}
    assert out["pcm_s16le"]["clips"] == 4
    assert out["mp3"]["clips"] == 3
    assert out["mp3"]["sr_hz"] == 44100
    expected_hours = 3 * (50 * 1152 / 44100) / 3600.0
    assert out["mp3"]["hours"] == pytest.approx(expected_hours, abs=1e-6)
    assert all(r["decode_errors"] == 0 for r in out.values())


def test_id3v24_footer_flag_skipped():
    """Review finding: an ID3v2.4 tag with the footer flag set appends a
    10-byte '3DI' footer — the skip must land on the first frame."""
    from dcspark.mp3 import _BITRATES  # noqa: F401 (module import check)

    body = b"tag body here"
    size = len(body)
    ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                (size >> 7) & 0x7F, size & 0x7F])
    tag = b"ID3\x04\x00\x10" + ss + body + b"3DI\x04\x00\x00" + b"\x00" * 4
    raw = tag + mp3_bytes(n_frames=4)
    m = parse_mp3_meta(raw)
    assert m["n_frames"] == 4 and m["has_id3v2"]
