"""AVI/MJPEG video container: stdlib + numpy, built on dcspark/jpeg.py.

Motion-JPEG in an AVI RIFF container is the one mainstream video format that
needs no inter-frame codec — every frame is a baseline JPEG — so with the
in-repo JPEG codec the whole path is real: ``avi_bytes`` writes a standard
('hdrl' avih/strh/strf + 'movi' 00dc chunks + idx1) MJPG AVI and
``decode_avi`` reads any MJPG AVI back frame by frame. This closes the
video seam the same way jpeg.py closed images: a REAL decoder for the
self-contained codec, with inter-frame codecs (H.264 etc.) remaining the
documented pluggable seam.

Same scope note as jpeg.py: the entropy layer is per-frame Python over
numpy-batched DCT — right for validation/fixtures; at training scale inject
a native decoder via multimodal's ``decoder=`` seam with this as the
always-available fallback and ground truth.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

from .jpeg import decode_jpeg, jpeg_bytes


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def avi_bytes(frames: List[np.ndarray], fps: float = 25.0,
              quality: int = 85) -> bytes:
    """Encode uint8 RGB (h, w, 3) frames as a Motion-JPEG AVI.

    All frames must share one shape. Writes the standard structure players
    expect: avih + one 'vids'/'MJPG' stream (strh/strf), 00dc frame chunks,
    and an idx1 index."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    encoded = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share one shape")
        encoded.append(jpeg_bytes(np.asarray(f, np.uint8), quality=quality))
    max_size = max(len(e) for e in encoded)
    usec_per_frame = int(round(1_000_000 / fps))

    avih = struct.pack(
        "<14I", usec_per_frame, max_size * int(np.ceil(fps)), 0,
        0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, max_size, w, h, 0, 0, 0, 0)
    # strh: 'vids' stream, rate/scale = fps as a rational (scale 1000)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<10I", 0, 0, 0, 1000, int(round(fps * 1000)), 0,
                          len(frames), max_size, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<I2i2H6i", 40, w, h, 1, 24, 0x47504A4D,  # 'MJPG'
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))

    chunks = b""
    idx_entries = []
    for e in encoded:
        # idx1 offsets are measured from the 'movi' fourcc, which occupies
        # bytes [0, 4) of the list data — hence the +4 base
        idx_entries.append((4 + len(chunks), len(e)))
        chunks += _chunk(b"00dc", e)
    movi = _list(b"movi", chunks)
    idx1 = b"".join(
        b"00dc" + struct.pack("<3I", 0x10, off, size)
        for off, size in idx_entries)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(raw: bytes) -> Tuple[float, List[np.ndarray]]:
    """Decode an MJPG AVI -> (fps, [uint8 frames]). Frames come back RGB
    (h, w, 3) (grayscale JPEGs are expanded). Raises ValueError on malformed
    containers or non-MJPEG streams."""
    if raw is None or len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise ValueError("not an AVI container")
    fps = 25.0
    frames: List[np.ndarray] = []

    def walk(pos: int, end: int, depth: int) -> None:
        nonlocal fps
        if depth > 8:  # real AVIs nest 2-3 deep; a crafted bomb raises, not
            raise ValueError("AVI LIST nesting too deep")  # RecursionError
        while pos + 8 <= end:
            fourcc = raw[pos:pos + 4]
            (size,) = struct.unpack_from("<I", raw, pos + 4)
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if fourcc == b"LIST":
                walk(body_start + 4, body_end, depth + 1)
            elif fourcc == b"strh" and body_end - body_start >= 28:
                # bound by bytes actually PRESENT, not the declared size — a
                # truncated strh must surface as ValueError, not struct.error
                if raw[body_start:body_start + 4] == b"vids":
                    handler = raw[body_start + 4:body_start + 8]
                    if handler not in (b"MJPG", b"mjpg", b"\x00\x00\x00\x00"):
                        raise ValueError(
                            f"unsupported video codec {handler!r}; only MJPG "
                            "decodes here — inject a native decoder for "
                            "inter-frame codecs")
                    scale, rate = struct.unpack_from("<II", raw, body_start + 20)
                    if scale and rate:
                        fps = rate / scale
            elif fourcc[2:4] in (b"dc", b"db") and size > 0:
                h, w, c, px = decode_jpeg(raw[body_start:body_end])
                if c == 1:
                    px = np.repeat(px[:, :, None], 3, axis=2)
                frames.append(px)
            pos = body_start + size + (size & 1)

    try:
        walk(12, len(raw), 0)
    except struct.error as e:  # truncated chunk headers
        raise ValueError(f"truncated AVI container: {e}") from e
    if not frames:
        raise ValueError("no video frames found")
    return fps, frames
