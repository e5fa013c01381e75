"""MP4 / ISO-BMFF container metadata: stdlib-struct box walk, no decode.

Most real-world video is H.264/H.265-in-MP4 — codecs whose inter-frame
decode needs external libraries (the documented pluggable seam in
``multimodal.real_video_decoder``). But the CONTAINER metadata a
``type: video`` contract rule checks (dims / fps / frame count / duration)
lives entirely in the ``moov`` box tree, readable with nothing but
``struct``:

    moov
      mvhd                  movie timescale + duration
      trak                  one per stream
        tkhd                track dims (16.16 fixed point)
        mdia
          mdhd              media timescale + duration
          hdlr              handler type ('vide' / 'soun')
          minf/stbl
            stsd            sample description: codec fourcc + coded dims
            stts            time-to-sample: frame count + per-frame delta
            stsz            sample sizes: frame count

So :func:`parse_mp4` header-checks payloads the engine cannot fully decode:
declared fps/dims/frame-count columns are verified against the stream's own
header, and a corrupt box tree raises ``ValueError`` (→ per-row
``decode_error``, never a crash). PCM-decode conformance (SNR vs declared)
remains impossible without the codec — the contract rule's fps/dims/frames
subset is exactly what the header can prove, and the disclosure lives in
``multimodal.real_video_decoder``'s docstring.

:func:`mp4_bytes` writes a structurally complete MP4 (ftyp + mdat stub +
full moov tree) for fixtures and round-trip tests — the box layout follows
the public ISO/IEC 14496-12 structure. No reference counterpart: the
reference repo (datacontract-cli) decodes no media at all.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, Iterator, Optional, Tuple

__all__ = ["parse_mp4", "parse_mp4_audio", "mp4_audio_meta_triple",
           "mp4_bytes", "m4a_bytes", "mp4_fragmented_bytes", "is_mp4"]

# boxes that are pure containers: children start at the payload's first byte
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts",
               b"mvex", b"udta"}


def is_mp4(raw: bytes) -> bool:
    """Cheap sniff: an ISO-BMFF file starts with a box whose type is ftyp
    (or a raw moov/mdat for headerless fragments). bytes() coercion keeps
    the check working on numpy uint8 views (the census's Arrow heap
    slices), where a raw ndarray slice would not compare against bytes."""
    return (raw is not None and len(raw) >= 12
            and bytes(raw[4:8]) in (b"ftyp", b"moov", b"mdat", b"styp",
                                    b"wide"))


def _iter_boxes(buf: bytes, start: int, end: int) -> Iterator[Tuple[bytes, int, int]]:
    """Yield (type, payload_start, payload_end) for each box in [start, end).

    Validates sizes strictly: a box shorter than its own header, or running
    past its parent, is corrupt — raise rather than mis-walk (a forged size
    would otherwise alias unrelated bytes into box payloads)."""
    p = start
    while p < end:
        if p + 8 > end:
            raise ValueError("mp4: truncated box header")
        size = struct.unpack_from(">I", buf, p)[0]
        btype = bytes(buf[p + 4:p + 8])
        hdr = 8
        if size == 1:  # 64-bit largesize
            if p + 16 > end:
                raise ValueError("mp4: truncated largesize box")
            size = struct.unpack_from(">Q", buf, p + 8)[0]
            hdr = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - p
        if size < hdr or p + size > end:
            raise ValueError(f"mp4: box {btype!r} size {size} exceeds scope")
        yield btype, p + hdr, p + size
        p += size


def _find(buf: bytes, start: int, end: int, btype: bytes) -> Optional[Tuple[int, int]]:
    for t, s, e in _iter_boxes(buf, start, end):
        if t == btype:
            return s, e
    return None


def _fullbox(buf: bytes, s: int, e: int) -> Tuple[int, int]:
    """(version, payload offset past the version/flags word)."""
    if s + 4 > e:
        raise ValueError("mp4: truncated full box")
    return buf[s], s + 4


def _parse_mvhd(buf: bytes, s: int, e: int) -> Tuple[int, int]:
    v, p = _fullbox(buf, s, e)
    if v == 1:
        if p + 28 > e:
            raise ValueError("mp4: truncated mvhd v1")
        timescale = struct.unpack_from(">I", buf, p + 16)[0]
        duration = struct.unpack_from(">Q", buf, p + 20)[0]
    else:
        if p + 16 > e:
            raise ValueError("mp4: truncated mvhd")
        timescale = struct.unpack_from(">I", buf, p + 8)[0]
        duration = struct.unpack_from(">I", buf, p + 12)[0]
    if timescale == 0:
        raise ValueError("mp4: mvhd timescale is zero")
    return timescale, duration


def _parse_mdhd(buf: bytes, s: int, e: int) -> Tuple[int, int]:
    v, p = _fullbox(buf, s, e)
    if v == 1:
        if p + 28 > e:
            raise ValueError("mp4: truncated mdhd v1")
        timescale = struct.unpack_from(">I", buf, p + 16)[0]
        duration = struct.unpack_from(">Q", buf, p + 20)[0]
    else:
        if p + 16 > e:
            raise ValueError("mp4: truncated mdhd")
        timescale = struct.unpack_from(">I", buf, p + 8)[0]
        duration = struct.unpack_from(">I", buf, p + 12)[0]
    if timescale == 0:
        raise ValueError("mp4: mdhd timescale is zero")
    return timescale, duration


def _parse_tkhd(buf: bytes, s: int, e: int) -> Tuple[float, float]:
    v, p = _fullbox(buf, s, e)
    # width/height are the LAST two 16.16 fixed-point words of the box
    if e - 8 < p:
        raise ValueError("mp4: truncated tkhd")
    w = struct.unpack_from(">I", buf, e - 8)[0] / 65536.0
    h = struct.unpack_from(">I", buf, e - 4)[0] / 65536.0
    return w, h


def _parse_hdlr(buf: bytes, s: int, e: int) -> bytes:
    _, p = _fullbox(buf, s, e)
    if p + 8 > e:
        raise ValueError("mp4: truncated hdlr")
    return bytes(buf[p + 4:p + 8])


def _parse_stsd(buf: bytes, s: int, e: int) -> Tuple[str, Optional[int], Optional[int]]:
    """First sample entry: (codec fourcc, coded width, coded height).

    A VisualSampleEntry carries integer coded dims at fixed offsets
    (6 reserved + 2 data_ref_index + 16 predefined = byte 24/26 of the
    entry payload); audio entries return (fourcc, None, None)."""
    _, p = _fullbox(buf, s, e)
    if p + 8 > e:
        raise ValueError("mp4: truncated stsd")
    n = struct.unpack_from(">I", buf, p)[0]
    if n == 0:
        raise ValueError("mp4: stsd has no sample entries")
    entry_s = p + 4
    if entry_s + 8 > e:
        raise ValueError("mp4: truncated stsd entry")
    esize = struct.unpack_from(">I", buf, entry_s)[0]
    fourcc = bytes(buf[entry_s + 4:entry_s + 8]).decode("latin-1").strip()
    if esize < 8 or entry_s + esize > e:
        raise ValueError("mp4: stsd entry size exceeds box")
    body = entry_s + 8
    # VisualSampleEntry is >= 78 bytes; width/height at body+24 / body+26
    if esize >= 78 and body + 28 <= e:
        w = struct.unpack_from(">H", buf, body + 24)[0]
        h = struct.unpack_from(">H", buf, body + 26)[0]
        if w and h:
            return fourcc, w, h
    return fourcc, None, None


def _parse_stts(buf: bytes, s: int, e: int) -> Tuple[int, int]:
    """(total sample count, total duration in media-timescale units)."""
    _, p = _fullbox(buf, s, e)
    if p + 4 > e:
        raise ValueError("mp4: truncated stts")
    n = struct.unpack_from(">I", buf, p)[0]
    if p + 4 + 8 * n > e:
        raise ValueError("mp4: stts entry count exceeds box")
    total_samples = total_time = 0
    for i in range(n):
        cnt, delta = struct.unpack_from(">II", buf, p + 4 + 8 * i)
        total_samples += cnt
        total_time += cnt * delta
    return total_samples, total_time


def _parse_stsz(buf: bytes, s: int, e: int) -> int:
    _, p = _fullbox(buf, s, e)
    if p + 8 > e:
        raise ValueError("mp4: truncated stsz")
    return struct.unpack_from(">I", buf, p + 4)[0]


def _parse_trex_defaults(buf: bytes, moov_s: int, moov_e: int) -> Dict[int, int]:
    """mvex/trex per-track default_sample_duration (fragmented MP4)."""
    out: Dict[int, int] = {}
    mvex = _find(buf, moov_s, moov_e, b"mvex")
    if mvex is None:
        return out
    for t, s, e in _iter_boxes(buf, *mvex):
        if t == b"trex":
            _, p = _fullbox(buf, s, e)
            if p + 16 > e:
                raise ValueError("mp4: truncated trex")
            track_id = struct.unpack_from(">I", buf, p)[0]
            out[track_id] = struct.unpack_from(">I", buf, p + 8)[0]
    return out


def _parse_tkhd_track_id(buf: bytes, s: int, e: int) -> int:
    v, p = _fullbox(buf, s, e)
    off = p + (16 if v == 1 else 8)
    if off + 4 > e:
        raise ValueError("mp4: truncated tkhd")
    return struct.unpack_from(">I", buf, off)[0]


def _parse_traf(buf: bytes, s: int, e: int,
                trex_dur: Dict[int, int]) -> Tuple[int, int, int]:
    """One traf -> (track_id, sample_count, total_duration).

    tfhd's optional fields are flag-gated at fixed widths; trun carries
    per-sample durations only when flag 0x100 is set, else the tfhd default
    (flag 0x08), else the trex default applies (ISO 14496-12 §8.8)."""
    tfhd = _find(buf, s, e, b"tfhd")
    if tfhd is None:
        raise ValueError("mp4: traf without tfhd")
    ts, te = tfhd
    if ts + 8 > te:
        raise ValueError("mp4: truncated tfhd")
    v_flags = struct.unpack_from(">I", buf, ts)[0]
    flags = v_flags & 0xFFFFFF
    p = ts + 4
    track_id = struct.unpack_from(">I", buf, p)[0]
    p += 4
    if flags & 0x01:
        p += 8   # base-data-offset
    if flags & 0x02:
        p += 4   # sample-description-index
    default_dur = None
    if flags & 0x08:
        if p + 4 > te:
            raise ValueError("mp4: truncated tfhd default duration")
        default_dur = struct.unpack_from(">I", buf, p)[0]
    if default_dur is None:
        default_dur = trex_dur.get(track_id, 0)
    n = time = 0
    for t2, s2, e2 in _iter_boxes(buf, s, e):
        if t2 != b"trun":
            continue
        if s2 + 8 > e2:
            raise ValueError("mp4: truncated trun")
        tv = struct.unpack_from(">I", buf, s2)[0]
        tflags = tv & 0xFFFFFF
        q = s2 + 4
        cnt = struct.unpack_from(">I", buf, q)[0]
        q += 4
        if tflags & 0x01:
            q += 4   # data-offset
        if tflags & 0x04:
            q += 4   # first-sample-flags
        per = 0
        per += 4 if tflags & 0x100 else 0   # sample-duration
        per += 4 if tflags & 0x200 else 0   # sample-size
        per += 4 if tflags & 0x400 else 0   # sample-flags
        per += 4 if tflags & 0x800 else 0   # composition-time-offset
        if q + cnt * per > e2:
            raise ValueError("mp4: trun sample table exceeds box")
        if tflags & 0x100:
            for i in range(cnt):
                time += struct.unpack_from(">I", buf, q + i * per)[0]
        else:
            time += cnt * default_dur
        n += cnt
    return track_id, n, time


def parse_mp4(raw: bytes) -> Dict[str, Any]:
    """Metadata of the first VIDEO track of an ISO-BMFF payload.

    Returns ``{brand, codec, width, height, fps, n_frames, duration_ms,
    n_tracks, has_audio}``. ``fps`` is media-timescale exact
    (timescale * samples / total stts time); ``width``/``height`` prefer the
    stsd VisualSampleEntry's integer coded dims over tkhd's display
    fixed-point. Raises ``ValueError`` on any corrupt box (forged size,
    truncated header, missing mandatory boxes)."""
    if raw is None or len(raw) < 12:
        raise ValueError("mp4: empty or truncated payload")
    buf = bytes(raw)
    brand = None
    moov = None
    moofs = []
    for t, s, e in _iter_boxes(buf, 0, len(buf)):
        if t == b"ftyp" and s + 4 <= e:
            brand = buf[s:s + 4].decode("latin-1")
        elif t == b"moov":
            moov = (s, e)
        elif t == b"moof":
            moofs.append((s, e))
    if moov is None:
        raise ValueError("mp4: no moov box")
    mvhd = _find(buf, *moov, b"mvhd")
    if mvhd is None:
        raise ValueError("mp4: no mvhd box")
    mv_timescale, mv_duration = _parse_mvhd(buf, *mvhd)
    out: Dict[str, Any] = {
        "brand": brand,
        "codec": None, "width": None, "height": None,
        "fps": None, "n_frames": None,
        "duration_ms": mv_duration * 1000.0 / mv_timescale,
        "n_tracks": 0, "has_audio": False,
    }
    vid_track_id = None
    vid_timescale = None
    for t, s, e in _iter_boxes(buf, *moov):
        if t != b"trak":
            continue
        out["n_tracks"] += 1
        tm = _trak_media(buf, s, e)
        if tm is None:
            raise ValueError("mp4: trak without mdia")
        if tm["handler"] == b"soun":
            out["has_audio"] = True
        if tm["handler"] != b"vide" or out["codec"] is not None:
            continue
        md_timescale = tm["timescale"]
        stbl = tm["stbl"]
        stsd = _find(buf, *stbl, b"stsd")
        codec, w, h = _parse_stsd(buf, *stsd)
        out["codec"] = codec
        if (w is None or h is None) and tm["tkhd"] is not None:
            fw, fh = _parse_tkhd(buf, *tm["tkhd"])
            w, h = int(round(fw)) or None, int(round(fh)) or None
        out["width"], out["height"] = w, h
        stts = _find(buf, *stbl, b"stts")
        stsz = _find(buf, *stbl, b"stsz")
        n_frames = None
        if stsz is not None:
            n_frames = _parse_stsz(buf, *stsz)
        if stts is not None:
            n_samples, total_time = _parse_stts(buf, *stts)
            if n_frames is None:
                n_frames = n_samples
            if total_time > 0:
                out["fps"] = md_timescale * n_samples / total_time
        out["n_frames"] = n_frames
        vid_timescale = md_timescale
        vid_track_id = tm["track_id"]
    if out["codec"] is None:
        raise ValueError("mp4: no video track")
    # fragmented MP4 (DASH/HLS): the moov's sample tables are empty and the
    # samples live in moof/traf/trun fragments — accumulate the video
    # track's fragment sample counts + durations instead
    if moofs and not out["n_frames"]:
        n, time = _fragment_totals(buf, moov, moofs, vid_track_id)
        out["n_frames"] = n
        if time > 0 and vid_timescale:
            out["fps"] = vid_timescale * n / time
        if out["duration_ms"] == 0 and time > 0 and vid_timescale:
            out["duration_ms"] = time * 1000.0 / vid_timescale
    return out


#: stsd fourcc -> census codec name (ffmpeg-ish, what contract enums use)
_AUDIO_CODEC_NAMES = {"mp4a": "aac", "alac": "alac", "ac-3": "ac3",
                      "ec-3": "eac3", "Opus": "opus", "fLaC": "flac"}


def _trak_media(buf: bytes, s: int, e: int) -> Optional[Dict[str, Any]]:
    """Shared trak walk for the audio AND video parsers: handler, mdhd
    timescale/duration, stbl box bounds, the VALIDATED first stsd entry
    (fourcc + entry payload bounds per the entry's own declared size — a
    forged short entry must not alias the next entry's bytes into field
    reads), and the tkhd track id. Returns None for a trak without mdia."""
    mdia = _find(buf, s, e, b"mdia")
    if mdia is None:
        return None
    hdlr = _find(buf, *mdia, b"hdlr")
    handler = _parse_hdlr(buf, *hdlr) if hdlr else b"????"
    mdhd = _find(buf, *mdia, b"mdhd")
    if mdhd is None:
        raise ValueError("mp4: trak without mdhd")
    timescale, md_duration = _parse_mdhd(buf, *mdhd)
    minf = _find(buf, *mdia, b"minf")
    stbl = _find(buf, *minf, b"stbl") if minf else None
    if stbl is None:
        raise ValueError("mp4: trak without stbl")
    stsd = _find(buf, *stbl, b"stsd")
    if stsd is None:
        raise ValueError("mp4: trak without stsd")
    _, p = _fullbox(buf, *stsd)
    if p + 4 > stsd[1]:
        raise ValueError("mp4: truncated stsd")
    if struct.unpack_from(">I", buf, p)[0] == 0:
        raise ValueError("mp4: stsd has no sample entries")
    entry_s = p + 4
    if entry_s + 8 > stsd[1]:
        raise ValueError("mp4: truncated stsd entry")
    esize = struct.unpack_from(">I", buf, entry_s)[0]
    if esize < 8 or entry_s + esize > stsd[1]:
        raise ValueError("mp4: stsd entry size exceeds box")
    fourcc = bytes(buf[entry_s + 4:entry_s + 8]).decode("latin-1").strip()
    track_id = None
    tkhd = _find(buf, s, e, b"tkhd")
    if tkhd is not None:
        track_id = _parse_tkhd_track_id(buf, *tkhd)
    return {
        "handler": handler, "timescale": timescale,
        "md_duration": md_duration, "stbl": stbl,
        "fourcc": fourcc, "entry_body": (entry_s + 8, entry_s + esize),
        "track_id": track_id, "tkhd": tkhd,
    }


def _fragment_totals(buf: bytes, moov: Tuple[int, int], moofs,
                     track_id: Optional[int]) -> Tuple[int, int]:
    """(sample count, total duration in media ticks) accumulated over every
    moof fragment for ``track_id`` (None matches any track)."""
    trex_dur = _parse_trex_defaults(buf, *moov)
    n = time = 0
    for ms, me in moofs:
        for t2, s2, e2 in _iter_boxes(buf, ms, me):
            if t2 != b"traf":
                continue
            tid, cnt, dur = _parse_traf(buf, s2, e2, trex_dur)
            if track_id is None or tid == track_id:
                n += cnt
                time += dur
    return n, time


def parse_mp4_audio(raw: bytes) -> Dict[str, Any]:
    """Metadata of the first AUDIO track (M4A/AAC census path) ->
    ``{codec, sr_hz, channels, n_samples, duration_ms}``.

    ``sr_hz`` prefers the AudioSampleEntry's 16.16 samplerate, falling back
    to the mdhd timescale (they agree in well-formed files). ``n_samples``
    is PCM samples: the total stts TIME in media-timescale ticks — for AAC
    each stts "sample" is a 1024-PCM-frame packet, so counting packets
    would undercount 1024x; time in ticks IS samples when timescale == sr.
    Fragmented (fMP4/DASH/CMAF) audio accumulates moof/traf/trun durations
    like the video path. Raises ``ValueError`` when no audio track exists
    or boxes are corrupt."""
    if raw is None or len(raw) < 12:
        raise ValueError("mp4: empty or truncated payload")
    buf = bytes(raw)
    moov = None
    moofs = []
    for t, s, e in _iter_boxes(buf, 0, len(buf)):
        if t == b"moov":
            moov = (s, e)
        elif t == b"moof":
            moofs.append((s, e))
    if moov is None:
        raise ValueError("mp4: no moov box")
    for t, s, e in _iter_boxes(buf, *moov):
        if t != b"trak":
            continue
        tm = _trak_media(buf, s, e)
        if tm is None or tm["handler"] != b"soun":
            continue
        timescale = tm["timescale"]
        # AudioSampleEntry: 6 reserved + data_ref_index(2), 8 reserved,
        # channelcount(2), samplesize(2), predefined(2), reserved(2),
        # samplerate(4, 16.16) — reads bounded by the entry's declared size
        body, body_e = tm["entry_body"]
        channels = sr_fixed = None
        if body + 28 <= body_e:
            channels = struct.unpack_from(">H", buf, body + 16)[0]
            sr_fixed = struct.unpack_from(">I", buf, body + 24)[0] >> 16
        sr = sr_fixed or timescale
        if sr == 0:
            raise ValueError("mp4: zero audio sample rate")
        stts = _find(buf, *tm["stbl"], b"stts")
        total_time = 0
        if stts is not None:
            _n, total_time = _parse_stts(buf, *stts)
        n_ticks = total_time or tm["md_duration"]
        if n_ticks == 0 and moofs:
            _fn, n_ticks = _fragment_totals(buf, moov, moofs, tm["track_id"])
        # rescale when the sample entry's rate disagrees with the timescale
        n_samples = (n_ticks if sr == timescale
                     else round(n_ticks * sr / timescale))
        return {
            "codec": _AUDIO_CODEC_NAMES.get(tm["fourcc"], tm["fourcc"]),
            "sr_hz": sr, "channels": channels, "n_samples": n_samples,
            "duration_ms": n_samples * 1000.0 / sr,
        }
    raise ValueError("mp4: no audio track")


def mp4_audio_meta_triple(raw: bytes) -> Tuple[int, str, int]:
    """The :func:`dcspark.audio.parse_wav_meta` census shape for M4A/AAC."""
    m = parse_mp4_audio(raw)
    return m["sr_hz"], m["codec"], m["n_samples"]


# ---------------------------------------------------------------------------
# writer — fixtures / round-trip ground truth
# ---------------------------------------------------------------------------

def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B3s", version,
                                   flags.to_bytes(3, "big")) + payload)


def mp4_bytes(width: int, height: int, fps: float, n_frames: int,
              codec: str = "avc1", sample_size: int = 64,
              with_audio: bool = False) -> bytes:
    """A structurally complete MP4: ftyp + mdat (stub samples) + moov with
    the full mvhd/trak/tkhd/mdia/mdhd/hdlr/minf/stbl tree.

    The mdat carries ``n_frames`` dummy samples (NOT decodable video — the
    point is the header). Media timescale is ``round(fps * 1000)`` with a
    constant stts delta of 1000, so ``parse_mp4`` recovers ``fps`` exactly
    for any rate with <= 3 decimals."""
    if fps <= 0 or n_frames < 0 or width <= 0 or height <= 0:
        raise ValueError("mp4_bytes: invalid dimensions/fps/frame count")
    timescale = int(round(fps * 1000))
    delta = 1000
    duration = n_frames * delta

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"\x00" * (sample_size * n_frames))

    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, 1000, int(round(duration * 1000 / timescale)))
        + struct.pack(">i", 0x00010000)   # rate 1.0
        + struct.pack(">h", 0x0100)       # volume 1.0
        + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2 if with_audio else 1))  # next track id

    def trak(track_id: int, handler: bytes, name: bytes,
             stsd_entry: bytes, w: int, h: int) -> bytes:
        tkhd = _full(b"tkhd", 0, 7, struct.pack(
            ">IIII", 0, 0, track_id, 0)
            + struct.pack(">I", int(round(duration * 1000 / timescale)))
            + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                          0x40000000)
            + struct.pack(">II", w << 16, h << 16))
        mdhd = _full(b"mdhd", 0, 0, struct.pack(
            ">IIII", 0, 0, timescale, duration) + struct.pack(">HH", 0x55C4, 0))
        hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + handler
                     + b"\x00" * 12 + name + b"\x00")
        stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
        stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n_frames, delta)
                     if n_frames else struct.pack(">I", 0))
        stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n_frames or 1, 1))
        # constant sample_size => no per-sample entry table
        stsz = _full(b"stsz", 0, 0, struct.pack(">II", sample_size, n_frames))
        stco = _full(b"stco", 0, 0, struct.pack(">II", 1, 8 + len(ftyp)))
        vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        dref = _full(b"dref", 0, 0, struct.pack(">I", 1)
                     + _full(b"url ", 0, 1, b""))
        dinf = _box(b"dinf", dref)
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _box(b"minf", vmhd + dinf + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"trak", tkhd + mdia)

    # VisualSampleEntry (ISO 14496-12 §12.1.3): 6 reserved + data_ref_index,
    # then 16 predefined/reserved bytes, integer dims, resolution, frame
    # count, 32-byte compressor name, depth, -1 — plus a stub codec-config
    # child box (a real avc1 entry carries avcC; the parser never reads it)
    cfg = _box(b"stub", b"")
    visual = (b"\x00" * 6 + struct.pack(">H", 1)
              + b"\x00" * 16
              + struct.pack(">HH", width, height)
              + struct.pack(">II", 0x00480000, 0x00480000)
              + struct.pack(">I", 0)
              + struct.pack(">H", 1)
              + b"\x00" * 32
              + struct.pack(">Hh", 24, -1)
              + cfg)
    entry = struct.pack(">I", 8 + len(visual)) + codec.encode("latin-1")[:4].ljust(4) + visual
    boxes = [trak(1, b"vide", b"VideoHandler", entry, width, height)]
    if with_audio:
        audio = (b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 8
                 + struct.pack(">HH", 2, 16) + b"\x00" * 4
                 + struct.pack(">I", 16000 << 16))
        aentry = struct.pack(">I", 8 + len(audio)) + b"mp4a" + audio
        boxes.append(trak(2, b"soun", b"SoundHandler", aentry, 0, 0))
    moov = _box(b"moov", mvhd + b"".join(boxes))
    return ftyp + mdat + moov


def m4a_bytes(sr: int = 16000, n_samples: int = 16000, channels: int = 1,
              codec: str = "mp4a", packet_samples: int = 1024,
              packet_bytes: int = 96) -> bytes:
    """A structurally complete M4A (audio-only MP4): ftyp M4A + mdat stub +
    moov with one 'soun' trak whose mdhd timescale is ``sr`` and whose stts
    carries ``n_samples`` ticks as 1024-sample AAC-style packets (plus a
    remainder entry). Stub packets are NOT decodable audio."""
    if sr <= 0 or n_samples < 0:
        raise ValueError("m4a_bytes: invalid sr/sample count")
    n_full, rem = divmod(n_samples, packet_samples)
    n_packets = n_full + (1 if rem else 0)

    ftyp = _box(b"ftyp", b"M4A " + struct.pack(">I", 512) + b"M4A isommp42")
    mdat = _box(b"mdat", b"\x00" * (packet_bytes * max(1, n_packets)))
    dur_movie = int(round(n_samples * 1000 / sr))
    mvhd = _full(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, 1000, dur_movie)
                 + struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100)
                 + b"\x00" * 10
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
                 + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", 0, 7, struct.pack(">IIII", 0, 0, 1, 0)
                 + struct.pack(">I", dur_movie) + b"\x00" * 8
                 + struct.pack(">hhhh", 0, 0, 0x0100, 0)
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
                 + struct.pack(">II", 0, 0))
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, sr, n_samples)
                 + struct.pack(">HH", 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"soun"
                 + b"\x00" * 12 + b"SoundHandler\x00")
    audio = (b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 8
             + struct.pack(">HHHH", channels, 16, 0, 0)
             + struct.pack(">I", sr << 16)
             + _box(b"stub", b""))
    entry = (struct.pack(">I", 8 + len(audio))
             + codec.encode("latin-1")[:4].ljust(4) + audio)
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts_entries = []
    if n_full:
        stts_entries.append((n_full, packet_samples))
    if rem:
        stts_entries.append((1, rem))
    stts = _full(b"stts", 0, 0, struct.pack(">I", len(stts_entries))
                 + b"".join(struct.pack(">II", c, d) for c, d in stts_entries))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, max(1, n_packets), 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", packet_bytes,
                                            max(1, n_packets)))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, 8 + len(ftyp)))
    smhd = _full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", smhd + _box(b"dinf", dref) + stbl)
    trak = _box(b"trak", tkhd + _box(b"mdia", mdhd + hdlr + minf))
    return ftyp + mdat + _box(b"moov", mvhd + trak)


def m4a_fragmented_bytes(sr: int = 16000, n_samples: int = 32000,
                         packet_samples: int = 1024, packet_bytes: int = 96,
                         packets_per_frag: int = 16) -> bytes:
    """A structurally complete FRAGMENTED audio MP4 (CMAF/DASH audio): moov
    with empty sample tables + mvex/trex default duration, then
    moof(mfhd, traf(tfhd, trun)) + mdat per fragment. The final fragment
    carries a remainder-duration trun entry so ``n_samples`` is exact."""
    if sr <= 0 or n_samples < 0:
        raise ValueError("m4a_fragmented_bytes: invalid sr/sample count")
    ftyp = _box(b"ftyp", b"M4A " + struct.pack(">I", 512) + b"M4A iso5cmfc")
    mvhd = _full(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, 1000, 0)
                 + struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100)
                 + b"\x00" * 10
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
                 + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", 0, 7, struct.pack(">IIII", 0, 0, 1, 0)
                 + struct.pack(">I", 0) + b"\x00" * 8
                 + struct.pack(">hhhh", 0, 0, 0x0100, 0)
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
                 + struct.pack(">II", 0, 0))
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, sr, 0)
                 + struct.pack(">HH", 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"soun"
                 + b"\x00" * 12 + b"SoundHandler\x00")
    audio = (b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 8
             + struct.pack(">HHHH", 1, 16, 0, 0)
             + struct.pack(">I", sr << 16) + _box(b"stub", b""))
    entry = struct.pack(">I", 8 + len(audio)) + b"mp4a" + audio
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">I", 0))
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", 0))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
    stco = _full(b"stco", 0, 0, struct.pack(">I", 0))
    smhd = _full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", smhd + _box(b"dinf", dref) + stbl)
    trak = _box(b"trak", tkhd + _box(b"mdia", mdhd + hdlr + minf))
    trex = _full(b"trex", 0, 0, struct.pack(">IIIII", 1, 1, packet_samples,
                                            packet_bytes, 0))
    moov = _box(b"moov", mvhd + trak + _box(b"mvex", trex))
    frags = []
    seq = 1
    left = n_samples
    while left > 0:
        cnt = min(packets_per_frag, (left + packet_samples - 1) // packet_samples)
        durs = []
        for _ in range(cnt):
            d = min(packet_samples, left)
            durs.append(d)
            left -= d
        mfhd = _full(b"mfhd", 0, 0, struct.pack(">I", seq))
        tfhd = _full(b"tfhd", 0, 0x020010, struct.pack(">II", 1, packet_bytes))
        # per-sample durations (flag 0x100) so the remainder packet is exact
        body = struct.pack(">Ii", cnt, 0) + b"".join(
            struct.pack(">I", d) for d in durs)
        trun = _full(b"trun", 0, 0x000101, body)
        moof = _box(b"moof", mfhd + _box(b"traf", tfhd + trun))
        frags.append(moof + _box(b"mdat", b"\x00" * (packet_bytes * cnt)))
        seq += 1
    return ftyp + moov + b"".join(frags)


def mp4_fragmented_bytes(width: int, height: int, fps: float, n_frames: int,
                         codec: str = "avc1", samples_per_frag: int = 32,
                         sample_size: int = 64,
                         per_sample_durations: bool = False) -> bytes:
    """A structurally complete FRAGMENTED MP4 (fMP4, the DASH/HLS layout):
    ftyp + moov with EMPTY sample tables + mvex/trex defaults, then
    moof(mfhd, traf(tfhd, trun)) + mdat per fragment.

    ``per_sample_durations=True`` writes explicit per-sample durations in
    each trun (flag 0x100) instead of relying on the trex default — both
    accumulation paths of :func:`parse_mp4` are exercised by fixtures."""
    if fps <= 0 or n_frames < 0 or width <= 0 or height <= 0:
        raise ValueError("mp4_fragmented_bytes: invalid dims/fps/frames")
    timescale = int(round(fps * 1000))
    delta = 1000

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso5dash")
    mvhd = _full(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, 1000, 0)
                 + struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100)
                 + b"\x00" * 10
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
                 + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", 0, 7, struct.pack(">IIII", 0, 0, 1, 0)
                 + struct.pack(">I", 0) + b"\x00" * 8
                 + struct.pack(">hhhh", 0, 0, 0, 0)
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
                 + struct.pack(">II", width << 16, height << 16))
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, timescale, 0)
                 + struct.pack(">HH", 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"VideoHandler\x00")
    cfg = _box(b"stub", b"")
    visual = (b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
              + struct.pack(">HH", width, height)
              + struct.pack(">II", 0x00480000, 0x00480000)
              + struct.pack(">I", 0) + struct.pack(">H", 1)
              + b"\x00" * 32 + struct.pack(">Hh", 24, -1) + cfg)
    entry = (struct.pack(">I", 8 + len(visual))
             + codec.encode("latin-1")[:4].ljust(4) + visual)
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    # empty sample tables: all samples live in fragments
    stts = _full(b"stts", 0, 0, struct.pack(">I", 0))
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", 0))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
    stco = _full(b"stco", 0, 0, struct.pack(">I", 0))
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + _box(b"dinf", dref) + stbl)
    trak = _box(b"trak", tkhd + _box(b"mdia", mdhd + hdlr + minf))
    trex = _full(b"trex", 0, 0, struct.pack(">IIIII", 1, 1, delta,
                                            sample_size, 0))
    moov = _box(b"moov", mvhd + trak + _box(b"mvex", trex))

    frags = []
    seq = 1
    left = n_frames
    while left > 0:
        cnt = min(samples_per_frag, left)
        left -= cnt
        mfhd = _full(b"mfhd", 0, 0, struct.pack(">I", seq))
        # tfhd: default-base-is-moof (0x020000) + default-sample-size (0x10)
        tfhd = _full(b"tfhd", 0, 0x020010,
                     struct.pack(">II", 1, sample_size))
        if per_sample_durations:
            # flags: data-offset (0x01) + sample-duration (0x100)
            body = struct.pack(">Ii", cnt, 0) + b"".join(
                struct.pack(">I", delta) for _ in range(cnt))
            trun = _full(b"trun", 0, 0x000101, body)
        else:
            trun = _full(b"trun", 0, 0x000001, struct.pack(">Ii", cnt, 0))
        moof = _box(b"moof", mfhd + _box(b"traf", tfhd + trun))
        frags.append(moof + _box(b"mdat", b"\x00" * (sample_size * cnt)))
        seq += 1
    return ftyp + moov + b"".join(frags)
