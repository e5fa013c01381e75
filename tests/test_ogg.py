"""Ogg container (Opus/Vorbis) metadata (dcspark/ogg.py).

Opus-in-Ogg is the dominant ASR-corpus codec; PCM decode stays the
pluggable seam, but codec/sr/channels/duration come from the CRC-verified
page walk, feeding the census (audio.parse_wav_meta) like MP3 does.
"""

import struct

import pytest

from dcspark.ogg import (is_ogg, ogg_meta_triple, ogg_opus_bytes,
                         ogg_vorbis_bytes, parse_ogg_meta)


def test_opus_round_trip():
    m = parse_ogg_meta(ogg_opus_bytes(sr=16000, n_samples=32000))
    assert m["codec"] == "opus"
    assert m["sr_hz"] == 16000 and m["channels"] == 1
    assert m["n_samples"] == 32000
    assert m["duration_ms"] == pytest.approx(2000.0)


def test_opus_granule_clock_rescaled():
    """Opus granules run at 48 kHz regardless of input rate: an 8 kHz
    stream's samples must rescale exactly."""
    m = parse_ogg_meta(ogg_opus_bytes(sr=8000, n_samples=12345))
    assert m["sr_hz"] == 8000
    # writer rounds to the 48k clock and back — exact for sr dividing 48k
    assert m["n_samples"] == 12345


def test_vorbis_round_trip():
    m = parse_ogg_meta(ogg_vorbis_bytes(sr=44100, n_samples=88200, channels=2))
    assert m["codec"] == "vorbis"
    assert (m["sr_hz"], m["channels"], m["n_samples"]) == (44100, 2, 88200)


def test_zero_samples():
    assert parse_ogg_meta(ogg_opus_bytes(n_samples=0))["n_samples"] == 0


def test_census_triple_and_sniff():
    assert ogg_meta_triple(ogg_opus_bytes(sr=16000, n_samples=8000)) == \
        (16000, "opus", 8000)
    assert is_ogg(ogg_opus_bytes())
    assert not is_ogg(b"RIFFxxxxWAVE")
    assert not is_ogg(b"")


def test_crc_catches_single_bit_flip():
    raw = bytearray(ogg_opus_bytes())
    raw[60] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        parse_ogg_meta(bytes(raw))


@pytest.mark.parametrize("mutate", [
    lambda b: b[:50],                       # truncated mid-page
    lambda b: b"junk" + b,                  # leading junk: no capture pattern
    lambda b: b[:5] + b"\x09" + b[6:],      # unsupported page version
])
def test_corrupt_raises(mutate):
    with pytest.raises(ValueError, match="ogg"):
        parse_ogg_meta(mutate(bytearray(ogg_opus_bytes())))


def test_multiplexed_second_serial_rejected():
    a = ogg_opus_bytes(serial=1)
    b = ogg_opus_bytes(serial=2)
    with pytest.raises(ValueError, match="multiplexed|chained"):
        parse_ogg_meta(a + b)


def test_parse_wav_meta_covers_ogg():
    from dcspark.audio import parse_wav_meta

    sr, codec, n = parse_wav_meta(ogg_opus_bytes(sr=16000, n_samples=24000))
    assert (sr, codec, n) == (16000, "opus", 24000)
    sr, codec, n = parse_wav_meta(ogg_vorbis_bytes(sr=22050, n_samples=11025))
    assert (sr, codec, n) == (22050, "vorbis", 11025)


def test_decode_path_gives_precise_seam_error():
    from dcspark.audio import parse_wav_view

    with pytest.raises(ValueError, match="ogg"):
        parse_wav_view(ogg_opus_bytes())


def test_audio_census_counts_ogg_rows(spark):
    from dcspark import audioops
    from dcspark.mp3 import mp3_bytes

    opus = ogg_opus_bytes(sr=16000, n_samples=48000)  # 3 s
    rows = ([("o%d" % i, bytearray(opus)) for i in range(5)]
            + [("m0", bytearray(mp3_bytes(n_frames=10)))])
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    out = {r["codec"]: r for r in audioops.audio_census(df).collect()}
    assert out["opus"]["clips"] == 5 and out["opus"]["sr_hz"] == 16000
    assert out["opus"]["hours"] == pytest.approx(5 * 3 / 3600.0, abs=1e-6)
    assert out["mp3"]["clips"] == 1
    assert all(r["decode_errors"] == 0 for r in out.values())


def test_opus_unspecified_rate_falls_back_to_48k():
    """Review finding: OpusHead input_sample_rate=0 is RFC 7845-legal
    'unspecified' (libopusenc writes it); decode rate 48 kHz applies."""
    import struct as _s

    from dcspark.ogg import _page

    head = (b"OpusHead" + bytes([1, 1]) + _s.pack("<H", 312)
            + _s.pack("<I", 0) + _s.pack("<h", 0) + b"\x00")
    raw = (_page(0x02, 0, 9, 0, [head])
           + _page(0x04, 312 + 4800, 9, 1, [b"\x00" * 4]))
    m = parse_ogg_meta(raw)
    assert m["sr_hz"] == 48000 and m["n_samples"] == 4800


def test_page_boundary_truncation_detected():
    """Review finding: dropping the final page leaves every CRC valid but
    loses samples — the missing EOS flag must raise."""
    from dcspark.ogg import _iter_pages

    full = ogg_opus_bytes(sr=16000, n_samples=48000, frames_per_page=10)
    spans = [p0 for *_, p0, _crc in _iter_pages(bytes(full), "none")]
    with pytest.raises(ValueError, match="EOS"):
        parse_ogg_meta(full[:spans[-1]])


def test_interior_page_deletion_detected():
    """Sequence-gap check: deleting an interior data page raises."""
    from dcspark.ogg import _iter_pages

    full = ogg_opus_bytes(sr=16000, n_samples=96000, frames_per_page=10)
    spans = [p0 for *_, p0, _crc in _iter_pages(bytes(full), "none")]
    assert len(spans) >= 5
    cut = full[:spans[2]] + full[spans[3]:]  # drop the 3rd page
    with pytest.raises(ValueError, match="sequence"):
        parse_ogg_meta(cut)


def test_final_page_crc_verified_in_edges_mode():
    """The duration-determining granule lives in the final page: a bit flip
    there must be caught even in the default edges mode."""
    raw = bytearray(ogg_opus_bytes(sr=16000, n_samples=48000,
                                   frames_per_page=10))
    raw[-1] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        parse_ogg_meta(bytes(raw))


def test_check_crc_all_audits_every_page():
    raw = bytearray(ogg_opus_bytes(sr=16000, n_samples=96000,
                                   frames_per_page=10))
    from dcspark.ogg import _iter_pages
    spans = [p0 for *_, p0, _crc in _iter_pages(bytes(raw), "none")]
    mid = spans[3] + 40  # a byte inside an interior data page
    raw[mid] ^= 0x01
    parse_ogg_meta(bytes(raw), check_crc="none")  # structure still walks
    with pytest.raises(ValueError, match="CRC"):
        parse_ogg_meta(bytes(raw), check_crc="all")
