"""Multimodal binary columns: image / audio / video plumbing for Spark tables.

Engine extension (no reference counterpart — the large-scale training-data
companion to the audio validation pass). Media payloads are opaque ``binary``
columns with a typed metadata struct; all per-row work runs as Arrow-batched
``mapInPandas`` (numpy inside the batch, never per-sample Python):

- audio: FULLY REAL for WAV/PCM (stdlib RIFF parse + numpy) — decode,
  resample (linear), frame-sample (fixed-stride windows), loudness features.
- image / video: the container DECODE step needs codec libraries (Pillow,
  ffmpeg) that do not ship in this sandbox, so the decoder is pluggable: the
  default raises NotImplementedError per row (surfaced as decode_error, never
  a crash), and a deterministic FAKE decoder (seeded from the payload hash)
  exercises the full Spark path — schema, batching, partitioning, feature
  extraction — in tests. Swapping in a real decoder is a one-function change.

Schemas are fixed up front so Catalyst sees stable types; payload columns are
pruned out of every non-media pass (select only what the UDF needs).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Callable, Iterator, Optional, Tuple

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .audio import parse_wav

IMAGE_META_DDL = (
    "id string, width int, height int, channels int, mode string, "
    "mean_luma double, decode_error string"
)

IMAGE_RESIZE_DDL = (
    "id string, width int, height int, pixels binary, decode_error string"
)

FRAME_SAMPLE_DDL = (
    "id string, frame_idx int, ts_ms double, frame binary, decode_error string"
)

AUDIO_FEATURES_DDL = (
    "id string, sr int, n_samples bigint, rms double, peak double, "
    "zero_crossings bigint, decode_error string"
)

# decoder: bytes -> (height, width, channels, uint8 array); raises on failure
ImageDecoder = Callable[[bytes], Tuple[int, int, int, np.ndarray]]
# decoder: bytes -> (fps, frames as list of uint8 HxWxC arrays)
VideoDecoder = Callable[[bytes], Tuple[float, list]]


def decode_netpbm(raw: bytes) -> Tuple[int, int, int, np.ndarray]:
    """Binary netpbm decode (P5 grayscale / P6 RGB), pure numpy.

    Handles whitespace and ``#`` comments in the header; maxval <= 255.
    Returns (height, width, channels, uint8 HWC array).
    """
    if raw is None or len(raw) < 10 or raw[:1] != b"P" or raw[1:2] not in b"56":
        raise ValueError("not a binary netpbm (P5/P6) payload")
    channels = 3 if raw[1:2] == b"6" else 1
    # header tokenizer: magic, width, height, maxval; single whitespace after maxval
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(raw) and raw[pos:pos + 1].isspace():
            pos += 1
        if raw[pos:pos + 1] == b"#":
            while pos < len(raw) and raw[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos:pos + 1].isspace():
            pos += 1
        tokens.append(raw[start:pos])
    pos += 1  # the single whitespace byte after maxval
    width, height, maxval = (int(t) for t in tokens)
    if maxval > 255 or width <= 0 or height <= 0:
        raise ValueError(f"unsupported netpbm: {width}x{height} maxval={maxval}")
    need = width * height * channels
    px = np.frombuffer(raw, dtype=np.uint8, count=need, offset=pos)
    return height, width, channels, px.reshape(height, width, channels)


def decode_bmp(raw: bytes) -> Tuple[int, int, int, np.ndarray]:
    """Uncompressed 24/32-bit BMP decode, pure numpy.

    Handles row padding to 4 bytes, bottom-up and top-down orientation, and
    BGR(A) -> RGB(A) channel reorder. Returns (h, w, c, uint8 HWC array).
    """
    if raw is None or len(raw) < 54 or raw[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", raw, 10)
    width, height = struct.unpack_from("<ii", raw, 18)
    (bpp,) = struct.unpack_from("<H", raw, 28)
    (compression,) = struct.unpack_from("<I", raw, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = height < 0
    height = abs(height)
    channels = bpp // 8
    row_bytes = (width * channels + 3) & ~3
    need = row_bytes * height
    if len(raw) < data_off + need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(raw, dtype=np.uint8, count=need, offset=data_off)
    rows = rows.reshape(height, row_bytes)[:, : width * channels]
    px = rows.reshape(height, width, channels)
    if not top_down:
        px = px[::-1]
    # BGR(A) -> RGB(A)
    px = px[:, :, [2, 1, 0] + ([3] if channels == 4 else [])]
    return height, width, channels, np.ascontiguousarray(px)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channels (8-bit only; palette/16-bit stay unsupported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_unfilter(
    data: np.ndarray, height: int, width: int, channels: int
) -> np.ndarray:
    """Reverse PNG scanline filtering (types 0-4) on raw inflate output.

    Each scanline is 1 filter byte + width*channels sample bytes. Up/None
    rows are vectorized; Sub/Average/Paeth need the left neighbor so they
    walk the row pixel-strided (numpy per step, not per byte)."""
    stride = width * channels
    if data.size != height * (stride + 1):
        raise ValueError(
            f"PNG pixel data length {data.size} != {height}x(1+{stride})")
    lines = data.reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint16)
    for y in range(height):
        ftype = int(lines[y, 0])
        row = lines[y, 1:].astype(np.uint16)
        if ftype == 0:  # None
            cur = row
        elif ftype == 2:  # Up
            cur = (row + prior) & 0xFF
        else:
            cur = row.copy()
            if ftype == 1:  # Sub
                for x in range(channels, stride, channels):
                    cur[x:x + channels] = (
                        cur[x:x + channels] + cur[x - channels:x]) & 0xFF
            elif ftype == 3:  # Average
                cur[:channels] = (cur[:channels] + (prior[:channels] >> 1)) & 0xFF
                for x in range(channels, stride, channels):
                    cur[x:x + channels] = (
                        cur[x:x + channels]
                        + ((cur[x - channels:x] + prior[x:x + channels]) >> 1)
                    ) & 0xFF
            elif ftype == 4:  # Paeth
                a = np.zeros(channels, dtype=np.int32)
                for x in range(0, stride, channels):
                    b = prior[x:x + channels].astype(np.int32)
                    c = (prior[x - channels:x].astype(np.int32)
                         if x else np.zeros(channels, dtype=np.int32))
                    p = a + b - c
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
                    cur[x:x + channels] = (cur[x:x + channels] + pred) & 0xFF
                    a = cur[x:x + channels].astype(np.int32)
            else:
                raise ValueError(f"unknown PNG filter type {ftype} at row {y}")
        out[y] = cur.astype(np.uint8)
        prior = cur
    return out.reshape(height, width, channels)


def decode_png(raw: bytes) -> Tuple[int, int, int, np.ndarray]:
    """Real PNG decode with stdlib ``zlib`` + numpy — no imaging library.

    Supports 8-bit gray / gray+alpha / RGB / RGBA, non-interlaced, all five
    scanline filter types. Palette, 16-bit, and interlaced images raise
    ValueError (surfaced per-row as decode_error by the Arrow-batch UDFs).
    Returns (height, width, channels, uint8 HWC array)."""
    import zlib

    if raw is None or raw[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(raw):
        (length,) = struct.unpack_from(">I", raw, pos)
        ctype = raw[pos + 4:pos + 8]
        body = raw[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width, height, bit_depth, color_type, comp, filt, interlace = ihdr
    if bit_depth != 8 or color_type not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG: bit_depth={bit_depth} color_type={color_type} "
            "(8-bit gray/GA/RGB/RGBA only)")
    if comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported PNG: non-zero compression/filter/interlace")
    channels = _PNG_CHANNELS[color_type]
    data = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    px = _png_unfilter(data, height, width, channels)
    return height, width, channels, px


def png_bytes(pixels: np.ndarray, row_filters=0) -> bytes:
    """Encode a uint8 array (HxW gray, HxWx{1,2,3,4}) as a PNG.

    ``row_filters``: scanline filter type(s) to APPLY — an int for all rows
    or a per-row sequence; exists so tests can exercise every filter type's
    decode path. CRCs are real (zlib.crc32)."""
    import zlib

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    if isinstance(row_filters, int):
        row_filters = [row_filters] * h
    stride = w * c
    flat = px.reshape(h, stride).astype(np.int32)
    lines = bytearray()
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = row_filters[y]
        cur = flat[y]
        left = np.zeros(stride, dtype=np.int32)
        left[c:] = cur[:-c]
        if ftype == 0:
            enc = cur
        elif ftype == 1:
            enc = cur - left
        elif ftype == 2:
            enc = cur - prior
        elif ftype == 3:
            enc = cur - ((left + prior) >> 1)
        elif ftype == 4:
            ul = np.zeros(stride, dtype=np.int32)
            ul[c:] = prior[:-c]
            p = left + prior - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prior, ul))
            enc = cur - pred
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        lines.append(ftype)
        lines.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prior = cur

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(lines)))
            + chunk(b"IEND", b""))


def ppm_bytes(pixels: np.ndarray) -> bytes:
    """Encode a uint8 HxWx3 (P6) or HxW / HxWx1 (P5) array as binary netpbm."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    magic = b"P6" if px.shape[2] == 3 else b"P5"
    header = magic + b"\n%d %d\n255\n" % (px.shape[1], px.shape[0])
    return header + px.tobytes()


def bmp_bytes(pixels: np.ndarray) -> bytes:
    """Encode a uint8 HxWx3 RGB array as an uncompressed 24-bit BMP."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = px[::-1, :, [2, 1, 0]].reshape(h, w * 3)  # bottom-up BGR
    data = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + dib + data


def real_image_decoder(raw: bytes) -> Tuple[int, int, int, np.ndarray]:
    """Sniff-and-decode: REAL numpy decoders for BMP 24/32-bit, binary
    netpbm P5/P6, PNG (8-bit gray/GA/RGB/RGBA via stdlib zlib), baseline
    JPEG (dcspark/jpeg.py: Huffman + IDCT + 4:2:0/4:2:2/4:4:4 chroma, no
    external libraries), GIF87a/89a (dcspark/gif.py: LZW + palettes +
    interlace; first frame), and lossless WebP (dcspark/webp.py: full VP8L
    — prefix codes, color cache, LZ77 distance map, all four transforms) —
    four real COMPRESSED codecs. Lossy WebP (VP8) remains the pluggable
    seam: a per-row decode_error, never a crash."""
    if raw is None or len(raw) < 4:
        raise ValueError("empty or truncated image payload")
    if raw[:2] == b"BM":
        return decode_bmp(raw)
    if raw[:1] == b"P" and raw[1:2] in b"56":
        return decode_netpbm(raw)
    if bytes(raw[:4]) == b"GIF8":
        from .gif import decode_gif_image

        return decode_gif_image(bytes(raw))
    if raw[:8] == _PNG_SIG:
        return decode_png(raw)
    if raw[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        h, w, c, px = decode_jpeg(raw)
        if c == 1:
            px = px[:, :, None]
        return h, w, c, px
    if raw[:4] == b"RIFF" and bytes(raw[8:12]) == b"WEBP":
        from .webp import decode_webp

        return decode_webp(bytes(raw))
    raise ValueError("unrecognized image container")


def real_video_decoder(raw: bytes):
    """Sniff-and-decode video: REAL decoders for Motion-JPEG AVI
    (dcspark/avi.py — RIFF walk + per-frame baseline JPEG, no external
    libraries) and animated GIF (dcspark/gif.py — LZW frames composited on
    the logical screen, fps from the graphic-control delays). Inter-frame
    codecs (MP4/H.264, WebM/VP9) remain the pluggable seam: a per-row
    decode_error, never a crash — though for ISO-BMFF and EBML containers
    the metadata path (video_metadata) header-checks fps/frames/dims from
    the moov box tree (dcspark/mp4.py) or the Matroska element tree
    (dcspark/ebml.py) without decoding frames."""
    if raw is None or len(raw) < 12:
        raise ValueError("empty or truncated video payload")
    head = bytes(raw[:12])
    if head[:4] == b"RIFF" and head[8:12] == b"AVI ":
        from .avi import decode_avi

        return decode_avi(bytes(raw))
    if head[:4] == b"GIF8":
        from .gif import decode_gif

        return decode_gif(bytes(raw))
    if head[4:8] == b"ftyp" or head[:4] == b"\x1a\x45\xdf\xa3":
        raise NotImplementedError(
            "inter-frame video codecs (mp4/h264, webm) are not decodable "
            "without external libraries; inject a decoder (e.g. av.open) via "
            "the decoder= argument"
        )
    raise ValueError("unrecognized video container")


def fake_image_decoder(raw: bytes) -> Tuple[int, int, int, np.ndarray]:
    """Deterministic stand-in decoder: dimensions + pixels derived from the
    payload hash. Exercises the full Spark path with knowable outputs."""
    if raw is None or len(raw) == 0:
        raise ValueError("empty image payload")
    h = hashlib.md5(raw).digest()
    height = 8 + h[0] % 56
    width = 8 + h[1] % 56
    channels = 3
    rng = np.random.default_rng(int.from_bytes(h[2:10], "little"))
    pixels = rng.integers(0, 256, size=(height, width, channels), dtype=np.uint8)
    return height, width, channels, pixels


def fake_video_decoder(raw: bytes) -> Tuple[float, list]:
    """Deterministic stand-in video decoder: n_frames/fps from payload hash."""
    if raw is None or len(raw) == 0:
        raise ValueError("empty video payload")
    h = hashlib.md5(raw).digest()
    fps = 10.0 + (h[0] % 21)
    n_frames = 4 + h[1] % 29
    rng = np.random.default_rng(int.from_bytes(h[2:10], "little"))
    frames = [
        rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8) for _ in range(n_frames)
    ]
    return fps, frames


# ---------------------------------------------------------------------------
# image ops
# ---------------------------------------------------------------------------

def image_metadata(
    df: DataFrame,
    id_col: str = "id",
    bytes_col: str = "bytes",
    decoder: ImageDecoder = real_image_decoder,
) -> DataFrame:
    """Decode + typed metadata struct per image (width/height/channels/luma)."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("id", "width", "height", "channels", "mode",
                                   "mean_luma", "decode_error")}
            for rid, raw in zip(pdf[id_col], pdf[bytes_col]):
                rec = dict(id=rid, width=None, height=None, channels=None,
                           mode=None, mean_luma=None, decode_error=None)
                try:
                    h, w, c, px = decoder(bytes(raw) if raw is not None else None)
                    luma = float(np.mean(px.astype(np.float64)))
                    rec.update(width=int(w), height=int(h), channels=int(c),
                               mode="RGB" if c == 3 else f"C{c}", mean_luma=luma)
                except (NotImplementedError, ValueError, TypeError) as e:
                    rec["decode_error"] = str(e)
                for k, v in rec.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).cast("string").alias(id_col),
                     F.col(bytes_col)).mapInPandas(run, schema=IMAGE_META_DDL)


def image_resize(
    df: DataFrame,
    target: Tuple[int, int] = (32, 32),
    id_col: str = "id",
    bytes_col: str = "bytes",
    decoder: ImageDecoder = real_image_decoder,
) -> DataFrame:
    """Nearest-neighbor resize to a fixed (h, w); output raw uint8 HWC bytes.

    The resize itself is pure numpy (no codec needed) — only decode is
    pluggable. Output payload size is constant per row, which keeps downstream
    Arrow batch memory deterministic.
    """
    th, tw = target

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("id", "width", "height", "pixels", "decode_error")}
            for rid, raw in zip(pdf[id_col], pdf[bytes_col]):
                rec = dict(id=rid, width=None, height=None, pixels=None, decode_error=None)
                try:
                    h, w, c, px = decoder(bytes(raw) if raw is not None else None)
                    yi = (np.arange(th) * h // th).astype(np.int64)
                    xi = (np.arange(tw) * w // tw).astype(np.int64)
                    resized = px[yi][:, xi]
                    rec.update(width=tw, height=th, pixels=resized.tobytes())
                except (NotImplementedError, ValueError, TypeError) as e:
                    rec["decode_error"] = str(e)
                for k, v in rec.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).cast("string").alias(id_col),
                     F.col(bytes_col)).mapInPandas(run, schema=IMAGE_RESIZE_DDL)


IMAGE_TRANSCODE_DDL = ("id string, bytes binary, width int, height int, "
                       "channels int, format string, decode_error string")


def image_transcode(
    df: DataFrame,
    target_format: str = "jpeg",
    quality: int = 85,
    id_col: str = "id",
    bytes_col: str = "bytes",
    decoder: ImageDecoder = real_image_decoder,
) -> DataFrame:
    """Normalize an image corpus into one container format using the REAL
    in-repo codecs: ``jpeg`` (baseline, dcspark/jpeg.py, lossy at
    ``quality``), ``png`` (lossless), ``bmp``, or ``ppm``. The image analog
    of audioops.audio_transcode: decode-whatever, encode-one-thing, with
    undecodable rows quarantined per row via decode_error."""
    if target_format not in ("jpeg", "png", "bmp", "ppm"):
        raise ValueError("target_format must be jpeg|png|bmp|ppm")

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        from .jpeg import jpeg_bytes

        for pdf in batches:
            out = {k: [] for k in ("id", "bytes", "width", "height",
                                   "channels", "format", "decode_error")}
            for rid, raw in zip(pdf[id_col], pdf[bytes_col]):
                rec = dict(id=rid, bytes=None, width=None, height=None,
                           channels=None, format=None, decode_error=None)
                try:
                    h, w, c, px = decoder(bytes(raw) if raw is not None else None)
                    if px.ndim == 3 and px.shape[2] == 1:
                        px = px[:, :, 0]
                    if target_format == "jpeg":
                        # jpeg has no alpha: RGBA -> RGB, gray+alpha -> gray
                        if px.ndim == 3 and px.shape[2] == 4:
                            px = px[:, :, :3]
                        elif px.ndim == 3 and px.shape[2] == 2:
                            px = px[:, :, 0]
                        b = jpeg_bytes(px, quality=quality)
                    elif target_format == "png":
                        b = png_bytes(px if px.ndim == 3 else px[:, :, None])
                    elif target_format == "bmp":
                        b = bmp_bytes(_to_rgb(px))
                    else:
                        b = ppm_bytes(_to_rgb(px))
                    rec.update(bytes=b, width=w, height=h,
                               channels=(1 if px.ndim == 2 else px.shape[2]),
                               format=target_format)
                except (NotImplementedError, ValueError, TypeError) as e:
                    rec["decode_error"] = str(e)
                for k, v in rec.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).cast("string").alias(id_col),
                     F.col(bytes_col)).mapInPandas(run, schema=IMAGE_TRANSCODE_DDL)


def _to_rgb(px: np.ndarray) -> np.ndarray:
    """Coerce gray/GA/RGBA rasters to 3-channel RGB for RGB-only writers."""
    if px.ndim == 2:
        return np.repeat(px[:, :, None], 3, axis=2)
    if px.shape[2] == 1:
        return np.repeat(px, 3, axis=2)
    if px.shape[2] == 2:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]


# ---------------------------------------------------------------------------
# decoded-raster scalar features (image analog of audio.FEATURE_FNS)
# ---------------------------------------------------------------------------

def image_luma(px: np.ndarray) -> np.ndarray:
    """BT.601 luma of a decoded uint8 raster as float64 in [0, 255]."""
    if px.ndim == 3:
        if px.shape[2] >= 3:
            return (0.299 * px[..., 0] + 0.587 * px[..., 1]
                    + 0.114 * px[..., 2])
        return px[..., 0].astype(np.float64)
    return px.astype(np.float64)


def _feat_brightness(luma: np.ndarray) -> float:
    return float(luma.mean())


def _feat_contrast(luma: np.ndarray) -> float:
    return float(luma.std())


def _feat_clip_ratio(luma: np.ndarray) -> float:
    """Fraction of pixels at the exposure rails (<=1 or >=254): blown
    highlights / crushed blacks — the image analog of audio clipping."""
    return float(((luma <= 1.0) | (luma >= 254.0)).mean())


def _feat_sharpness(luma: np.ndarray) -> float:
    """Variance of the 4-neighbor Laplacian — the standard no-reference blur
    score (defocused or heavily-resampled images score near 0)."""
    if luma.shape[0] < 3 or luma.shape[1] < 3:
        return 0.0
    lap = (4.0 * luma[1:-1, 1:-1] - luma[:-2, 1:-1] - luma[2:, 1:-1]
           - luma[1:-1, :-2] - luma[1:-1, 2:])
    return float(lap.var())


def _feat_entropy(luma: np.ndarray) -> float:
    """Shannon entropy (bits) of the 256-bin luma histogram; solid-color or
    near-empty rasters score near 0, natural photos 6-8."""
    hist = np.bincount(
        np.clip(np.rint(luma), 0, 255).astype(np.uint8).ravel(), minlength=256)
    p = hist[hist > 0] / float(luma.size)
    return float(-(p * np.log2(p)).sum())


# feature name -> fn(luma float64 array) -> float; evaluated once per image
# inside the single fused decode pass (engine kind "image_quality")
IMAGE_FEATURE_FNS = {
    "brightness": _feat_brightness,
    "contrast": _feat_contrast,
    "clip_ratio": _feat_clip_ratio,
    "sharpness": _feat_sharpness,
    "entropy": _feat_entropy,
}


# ---------------------------------------------------------------------------
# video ops
# ---------------------------------------------------------------------------

VIDEO_META_DDL = (
    "id string, fps double, n_frames int, width int, height int, "
    "decode_error string"
)


def video_metadata(
    df: DataFrame,
    id_col: str = "id",
    bytes_col: str = "bytes",
    decoder: VideoDecoder = real_video_decoder,
) -> DataFrame:
    """Decode + typed metadata per video payload (fps, frame count, first
    frame dims): one mapInPandas pass; only scalars leave the task. Feeds
    the ``type: video, invariant: decode-conformance`` contract rule.

    Foreign-codec container payloads — H.264/H.265-in-MP4 (dcspark/mp4.py
    moov walk) and VP8/VP9/AV1-in-WebM/Matroska (dcspark/ebml.py element
    walk) — fall back to the CONTAINER header: fps / frame count / dims
    come from the stream's own metadata, so declared-column conformance
    still verifies what the header can prove even though the frames
    themselves stay undecodable in-repo. Corrupt structures record a
    per-row decode_error, never crash."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        from .ebml import is_webm, parse_webm
        from .mp4 import is_mp4, parse_mp4

        for pdf in batches:
            out = {k: [] for k in ("id", "fps", "n_frames", "width",
                                   "height", "decode_error")}
            for rid, raw in zip(pdf[id_col], pdf[bytes_col]):
                rec = dict(id=rid, fps=None, n_frames=None, width=None,
                           height=None, decode_error=None)
                b = bytes(raw) if raw is not None else None
                try:
                    fps, frames = decoder(b)
                    rec.update(fps=float(fps), n_frames=len(frames))
                    if frames:
                        rec.update(height=int(frames[0].shape[0]),
                                   width=int(frames[0].shape[1]))
                except (NotImplementedError, ValueError, TypeError,
                        struct.error) as e:
                    # undecodable CODEC, maybe readable CONTAINER: the
                    # ISO-BMFF sniff covers ftyp files AND headerless
                    # raw-moov/styp segments (fMP4 init / DASH media
                    # segments), which the frame decoder rejects with
                    # ValueError rather than NotImplementedError; the EBML
                    # sniff covers WebM/Matroska
                    header_parse = None
                    if b is not None and is_mp4(b):
                        header_parse = parse_mp4
                    elif b is not None and is_webm(b):
                        header_parse = parse_webm
                    if header_parse is not None:
                        try:
                            m = header_parse(b)
                            rec.update(
                                fps=(float(m["fps"])
                                     if m["fps"] is not None else None),
                                n_frames=m["n_frames"],
                                width=m["width"], height=m["height"])
                        except (ValueError, struct.error) as e2:
                            rec["decode_error"] = str(e2)
                    else:
                        rec["decode_error"] = str(e)
                for k, v in rec.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).cast("string").alias(id_col),
                     F.col(bytes_col)).mapInPandas(run, schema=VIDEO_META_DDL)


def video_frame_sample(
    df: DataFrame,
    every_n: int = 5,
    max_frames: int = 8,
    id_col: str = "id",
    bytes_col: str = "bytes",
    decoder: VideoDecoder = real_video_decoder,
) -> DataFrame:
    """Sample every n-th frame (bounded) — one output row per sampled frame.

    Row-explosion is bounded by ``max_frames`` so output size stays a constant
    multiple of input rows regardless of clip length.
    """

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for rid, raw in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    fps, frames = decoder(bytes(raw) if raw is not None else None)
                    idxs = list(range(0, len(frames), every_n))[:max_frames]
                    for i in idxs:
                        rows.append(dict(
                            id=rid, frame_idx=i, ts_ms=i / fps * 1000.0,
                            frame=frames[i].tobytes(), decode_error=None,
                        ))
                except (NotImplementedError, ValueError, TypeError) as e:
                    rows.append(dict(id=rid, frame_idx=None, ts_ms=None,
                                     frame=None, decode_error=str(e)))
            yield pd.DataFrame(
                rows, columns=["id", "frame_idx", "ts_ms", "frame", "decode_error"])

    return df.select(F.col(id_col).cast("string").alias(id_col),
                     F.col(bytes_col)).mapInPandas(run, schema=FRAME_SAMPLE_DDL)


# ---------------------------------------------------------------------------
# audio ops (fully real: WAV/PCM, numpy only)
# ---------------------------------------------------------------------------

def audio_features(
    df: DataFrame,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Loudness/shape features per clip: rms, peak, zero-crossing count."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("id", "sr", "n_samples", "rms", "peak",
                                   "zero_crossings", "decode_error")}
            for rid, raw in zip(pdf[id_col], pdf[bytes_col]):
                rec = dict(id=rid, sr=None, n_samples=None, rms=None, peak=None,
                           zero_crossings=None, decode_error=None)
                try:
                    sr, _codec, pcm = parse_wav(bytes(raw) if raw is not None else None)
                    x = pcm.astype(np.float64) / 32768.0
                    rec.update(
                        sr=int(sr), n_samples=int(len(pcm)),
                        rms=float(np.sqrt(np.mean(x * x))) if len(x) else 0.0,
                        peak=float(np.max(np.abs(x))) if len(x) else 0.0,
                        zero_crossings=int(np.count_nonzero(np.diff(np.signbit(pcm)))),
                    )
                except (ValueError, struct.error) as e:
                    rec["decode_error"] = str(e)
                for k, v in rec.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).cast("string").alias(id_col),
                     F.col(bytes_col)).mapInPandas(run, schema=AUDIO_FEATURES_DDL)


def audio_resample(
    df: DataFrame,
    target_sr: int = 16000,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Linear-interpolation resample to a uniform rate; re-wrapped as WAV.

    The training-data normalization step: downstream models want one sample
    rate. Output schema mirrors the input (id, bytes, sr_hz) so the result can
    feed the same validation pass.
    """
    from .synth import wav_bytes

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            out = {"clip_id": [], "bytes": [], "sr_hz": [], "decode_error": []}
            for rid, raw in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    sr, _codec, pcm = parse_wav(bytes(raw) if raw is not None else None)
                    if sr == target_sr:
                        resampled = pcm
                    else:
                        n_out = int(round(len(pcm) * target_sr / sr))
                        xs = np.linspace(0.0, len(pcm) - 1, num=n_out)
                        resampled = np.interp(
                            xs, np.arange(len(pcm)), pcm.astype(np.float64)
                        ).astype(np.int16)
                    out["clip_id"].append(rid)
                    out["bytes"].append(wav_bytes(resampled, target_sr))
                    out["sr_hz"].append(target_sr)
                    out["decode_error"].append(None)
                except (ValueError, struct.error) as e:
                    out["clip_id"].append(rid)
                    out["bytes"].append(None)
                    out["sr_hz"].append(None)
                    out["decode_error"].append(str(e))
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).cast("string").alias(id_col),
                     F.col(bytes_col)).mapInPandas(
        run, schema="clip_id string, bytes binary, sr_hz int, decode_error string")
