"""FLAC codec in stdlib + numpy: spec-complete decoder, subset encoder.

Free Lossless Audio Codec (the published format spec at
https://xiph.org/flac/format.html / RFC 9639). This brings a real
*compressed* audio codec into the validation engine's decode matrix —
until now the WAV family covered PCM variants, G.711, and IMA ADPCM; web
audio corpora ship FLAC heavily, and a contract's `codec: flac` rule needs
a real decode to verify `sr_hz`/`dur_ms`/SNR invariants against actual PCM.

Decoder (full baseline coverage):
- STREAMINFO + metadata-block walk (header-only metadata path for the
  census, like `parse_wav_meta`)
- frame sync, blocking strategies, all block-size / sample-rate /
  sample-size codes, UTF-8-style coded frame numbers, CRC-8 header check
  and CRC-16 frame check (corrupt payloads raise, never return wrong PCM)
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32 with
  quantized coefficients and shift
- Rice residuals, both 4- and 5-bit parameter widths, any partition
  order, escape-coded raw partitions
- stereo decorrelation: independent, left/side, right/side, mid/side
  (reconstructed exactly per spec), wasted-bits shifts, 8/12/16/20/24-bit
  sample sizes (canonicalized to mono int16 like the WAV decoder)

The Rice hot path is semi-vectorized: one `np.unpackbits` + one global
ones-position index per stream, then per-partition terminator chasing is
an O(ones) pointer walk and quotient/remainder extraction is whole-array
numpy — no per-bit Python.

Encoder (used for fixtures and round-trip locks): 16-bit mono/stereo
(independent channels), CONSTANT / VERBATIM / best-of FIXED orders 0-4
per subframe, single-partition Rice with an exact cost-minimizing
parameter sweep, correct CRC-8/CRC-16, and the STREAMINFO raw-PCM MD5 —
output is accepted by any conforming FLAC decoder and round-trips
bit-exactly through this decoder (lossless, sample-for-sample).
"""

from __future__ import annotations

import struct
from hashlib import md5 as _md5
from typing import Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# CRCs (poly 0x07 for the frame-header CRC-8, 0x8005 for the frame CRC-16)
# ---------------------------------------------------------------------------


def _make_crc8_table() -> np.ndarray:
    t = np.zeros(256, np.uint8)
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        t[i] = c
    return t


def _make_crc16_table() -> np.ndarray:
    t = np.zeros(256, np.uint16)
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        t[i] = c
    return t


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def crc8(data) -> int:
    c = 0
    t = _CRC8
    for b in bytes(data):
        c = int(t[c ^ b])
    return c


def crc16(data) -> int:
    c = 0
    t = _CRC16
    for b in bytes(data):
        c = int(t[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# Bit reader over the whole stream (unpacked once)
# ---------------------------------------------------------------------------


class _Bits:
    __slots__ = ("data", "bits", "ones", "pos")

    def __init__(self, data: np.ndarray):
        self.data = data  # uint8 view, for CRC slices
        self.bits = np.unpackbits(data)
        # global index of 1-bit positions: Rice terminator chasing is a
        # monotone pointer walk over this, never a rescan
        self.ones = np.flatnonzero(self.bits).astype(np.int64)
        self.pos = 0

    def read(self, n: int) -> int:
        b = self.bits[self.pos:self.pos + n]
        if len(b) < n:
            raise ValueError("flac: truncated stream")
        self.pos += n
        if n == 0:
            return 0
        return int(b @ (np.int64(1) << np.arange(n - 1, -1, -1, dtype=np.int64)))

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        """Count 0-bits until the terminating 1 (consumed)."""
        ones = self.ones
        j = int(np.searchsorted(ones, self.pos))
        if j >= len(ones):
            raise ValueError("flac: truncated unary code")
        q = int(ones[j]) - self.pos
        self.pos = int(ones[j]) + 1
        return q

    def read_signed_batch(self, count: int, n: int) -> np.ndarray:
        """`count` n-bit signed values, vectorized."""
        if n == 0:
            return np.zeros(count, np.int64)
        total = count * n
        b = self.bits[self.pos:self.pos + total]
        if len(b) < total:
            raise ValueError("flac: truncated stream")
        self.pos += total
        w = np.int64(1) << np.arange(n - 1, -1, -1, dtype=np.int64)
        v = b.reshape(count, n).astype(np.int64) @ w
        sign = np.int64(1) << (n - 1)
        return np.where(v >= sign, v - (np.int64(1) << n), v)

    def read_rice(self, count: int, k: int) -> np.ndarray:
        """`count` Rice(k) codes -> signed residuals (zigzag-decoded).

        The Python loop only advances the ones-index pointer (amortized
        O(#1-bits)); quotients and remainders are whole-array numpy.
        """
        ones = self.ones
        bits = self.bits
        n_ones = len(ones)
        starts = np.empty(count, np.int64)
        terms = np.empty(count, np.int64)
        j = int(np.searchsorted(ones, self.pos))
        p = self.pos
        for i in range(count):
            while j < n_ones and ones[j] < p:
                j += 1
            if j >= n_ones:
                raise ValueError("flac: truncated rice partition")
            t = int(ones[j])
            starts[i] = p
            terms[i] = t
            p = t + 1 + k
            j += 1
        if p > len(bits):
            raise ValueError("flac: truncated rice remainder")
        self.pos = p
        q = terms - starts
        if k:
            idx = terms[:, None] + 1 + np.arange(k, dtype=np.int64)
            w = np.int64(1) << np.arange(k - 1, -1, -1, dtype=np.int64)
            rem = bits[idx].astype(np.int64) @ w
            u = (q << k) | rem
        else:
            u = q
        return (u >> 1) ^ -(u & 1)

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

_FIXED_COEFS = {
    0: np.array([], np.int64),
    1: np.array([1], np.int64),
    2: np.array([2, -1], np.int64),
    3: np.array([3, -3, 1], np.int64),
    4: np.array([4, -6, 4, -1], np.int64),
}

_SR_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
             7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_SS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def parse_flac_meta(b) -> Tuple[int, str, int]:
    """Header-only (sample_rate, "flac", total_samples) from STREAMINFO —
    the census path, no PCM decode."""
    info = _parse_streaminfo(np.frombuffer(bytes(b), np.uint8))[0]
    return info["sr"], "flac", info["total_samples"]


def _parse_streaminfo(data: np.ndarray):
    raw = data.tobytes()
    if raw[:4] != b"fLaC":
        raise ValueError("flac: bad magic")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(raw):
            raise ValueError("flac: truncated metadata")
        hdr = raw[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        length = int.from_bytes(raw[pos + 1:pos + 4], "big")
        body = raw[pos + 4:pos + 4 + length]
        if len(body) < length:
            raise ValueError("flac: truncated metadata block")
        if btype == 0:
            if length < 34:
                raise ValueError("flac: STREAMINFO too short")
            (min_bs, max_bs) = struct.unpack(">HH", body[:4])
            packed = int.from_bytes(body[10:18], "big")
            sr = (packed >> 44) & 0xFFFFF
            channels = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total = packed & 0xFFFFFFFFF
            info = {"min_bs": min_bs, "max_bs": max_bs, "sr": sr,
                    "channels": channels, "bps": bps, "total_samples": total,
                    "md5": body[18:34]}
        pos += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("flac: missing STREAMINFO")
    if info["sr"] == 0:
        raise ValueError("flac: invalid sample rate 0")
    return info, pos


def _decode_subframe(br: _Bits, n: int, bps: int) -> np.ndarray:
    if br.read(1) != 0:
        raise ValueError("flac: bad subframe padding bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        out = np.full(n, br.read_signed(eff), np.int64)
    elif stype == 1:  # VERBATIM
        out = br.read_signed_batch(n, eff)
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        out = np.empty(n, np.int64)
        out[:order] = br.read_signed_batch(order, eff)
        res = _decode_residual(br, n, order)
        coefs = _FIXED_COEFS[order]
        if order == 0:
            out[:] = res
        else:
            # short recurrence: order<=4 taps, the loop is over samples but
            # each step is O(order) integer ops (exact, no overflow at i64)
            _lpc_restore(out, res, coefs, 0, order)
    elif stype >= 32:  # LPC
        order = (stype & 31) + 1
        out = np.empty(n, np.int64)
        out[:order] = br.read_signed_batch(order, eff)
        prec = br.read(4)
        if prec == 15:
            raise ValueError("flac: invalid LPC precision")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coefs = br.read_signed_batch(order, prec)
        res = _decode_residual(br, n, order)
        _lpc_restore(out, res, coefs, shift, order)
    else:
        raise ValueError(f"flac: reserved subframe type {stype}")
    return out << wasted if wasted else out


def _lpc_restore(out: np.ndarray, res: np.ndarray, coefs: np.ndarray,
                 shift: int, order: int) -> None:
    """out[:order] holds warmup; fill out[order:] from the recurrence
    out[i] = ((coefs . out[i-1:i-order-1:-1]) >> shift) + res[i-order]."""
    c = [int(x) for x in coefs]
    o = [int(x) for x in out[:order]]
    r = res.tolist()
    n = len(out)
    for i in range(order, n):
        acc = 0
        base = i - 1
        for j in range(order):
            acc += c[j] * o[base - j]
        o.append((acc >> shift) + r[i - order])
    out[:] = o


def _decode_residual(br: _Bits, n: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method not in (0, 1):
        raise ValueError(f"flac: reserved residual method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if n % nparts:
        raise ValueError("flac: partition order does not divide block size")
    per = n // nparts
    if per < order:
        raise ValueError("flac: partition smaller than predictor order")
    chunks = []
    for p in range(nparts):
        cnt = per - order if p == 0 else per
        k = br.read(plen)
        if k == escape:
            raw_bits = br.read(5)
            chunks.append(br.read_signed_batch(cnt, raw_bits))
        else:
            chunks.append(br.read_rice(cnt, k))
    return np.concatenate(chunks) if len(chunks) > 1 else chunks[0]


def _coded_number(br: _Bits) -> int:
    """UTF-8-style variable-length frame/sample number."""
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x40
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 1 or nbytes > 6:
        raise ValueError("flac: bad coded number")
    v = first & (mask - 1)
    for _ in range(nbytes):
        c = br.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("flac: bad coded-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def decode_flac(b, verify_md5: bool = False) -> Tuple[int, str, np.ndarray]:
    """FLAC payload -> (sample_rate, "flac", canonical mono int16 PCM).

    Mirrors `parse_wav_view` semantics: multi-channel mean-downmix, sample
    sizes re-scaled to 16-bit. CRC-8/CRC-16 are verified on every frame;
    `verify_md5=True` additionally checks the STREAMINFO MD5 over the raw
    decoded stream (pre-downmix), the codec's own lossless oracle.
    """
    data = np.frombuffer(bytes(b), np.uint8)
    info, pos = _parse_streaminfo(data)
    br = _Bits(data)
    br.pos = pos * 8
    sr = info["sr"]
    bps0 = info["bps"]
    nch = info["channels"]
    total = info["total_samples"]
    blocks = []
    raw_md5 = _md5() if verify_md5 else None
    got = 0
    while (total == 0 or got < total) and br.pos < len(br.bits) - 15:
        frame_start_bit = br.pos
        if frame_start_bit % 8:
            raise ValueError("flac: frame not byte-aligned")
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("flac: lost frame sync")
        if br.read(1):
            raise ValueError("flac: reserved sync bit set")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("flac: reserved frame-header bit set")
        _num = _coded_number(br)
        if bs_code == 0:
            raise ValueError("flac: reserved block size code")
        elif bs_code == 1:
            bsize = 192
        elif bs_code <= 5:
            bsize = 576 << (bs_code - 2)
        elif bs_code == 6:
            bsize = br.read(8) + 1
        elif bs_code == 7:
            bsize = br.read(16) + 1
        else:
            bsize = 256 << (bs_code - 8)
        if sr_code == 0:
            fsr = sr
        elif sr_code in _SR_CODES:
            fsr = _SR_CODES[sr_code]
        elif sr_code == 12:
            fsr = br.read(8) * 1000
        elif sr_code == 13:
            fsr = br.read(16)
        elif sr_code == 14:
            fsr = br.read(16) * 10
        else:
            raise ValueError("flac: invalid sample rate code")
        bps = bps0 if ss_code == 0 else _SS_CODES.get(ss_code)
        if bps is None:
            raise ValueError("flac: reserved sample size code")
        hdr_end_byte = br.pos // 8
        expect_crc8 = crc8(data[frame_start_bit // 8:hdr_end_byte])
        if br.read(8) != expect_crc8:
            raise ValueError("flac: frame header CRC-8 mismatch")
        # channels
        if ch_code <= 7:
            chans = [
                _decode_subframe(br, bsize, bps) for _ in range(ch_code + 1)]
        elif ch_code == 8:  # left/side
            left = _decode_subframe(br, bsize, bps)
            side = _decode_subframe(br, bsize, bps + 1)
            chans = [left, left - side]
        elif ch_code == 9:  # right/side
            side = _decode_subframe(br, bsize, bps + 1)
            right = _decode_subframe(br, bsize, bps)
            chans = [right + side, right]
        elif ch_code == 10:  # mid/side
            mid = _decode_subframe(br, bsize, bps)
            side = _decode_subframe(br, bsize, bps + 1)
            m2 = (mid << 1) | (side & 1)
            chans = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError("flac: reserved channel assignment")
        br.align()
        frame_end_byte = br.pos // 8
        expect_crc16 = crc16(data[frame_start_bit // 8:frame_end_byte])
        if br.read(16) != expect_crc16:
            raise ValueError("flac: frame CRC-16 mismatch")
        if len(chans) != nch:
            raise ValueError("flac: frame channel count != STREAMINFO")
        if total and got + bsize > total:
            chans = [c[: total - got] for c in chans]
            bsize = total - got
        if raw_md5 is not None:
            nbytes = (bps + 7) // 8
            inter = np.empty(bsize * nch, np.int64)
            for ci, c in enumerate(chans):
                inter[ci::nch] = c
            if nbytes == 1:
                raw_md5.update(inter.astype(np.int8).tobytes())
            elif nbytes == 2:
                raw_md5.update(inter.astype("<i2").tobytes())
            elif nbytes == 3:
                le = inter.astype("<i4").view(np.uint8).reshape(-1, 4)
                raw_md5.update(le[:, :3].tobytes())
            else:
                raw_md5.update(inter.astype("<i4").tobytes())
        blocks.append(chans)
        got += bsize
    if total and got != total:
        raise ValueError(f"flac: decoded {got} of {total} samples")
    if raw_md5 is not None and info["md5"] != b"\x00" * 16 and \
            raw_md5.digest() != info["md5"]:
        raise ValueError("flac: STREAMINFO MD5 mismatch (corrupt stream)")
    if not blocks:
        return sr, "flac", np.zeros(0, np.int16)
    mono_parts = []
    for chans in blocks:
        if len(chans) == 1:
            m = chans[0]
        else:
            m = np.mean(np.stack(chans), axis=0)
        mono_parts.append(m)
    mono = np.concatenate(mono_parts)
    # canonicalize to int16 like the WAV decoder: shift by bps-16
    if bps0 > 16:
        mono = np.asarray(mono) / float(1 << (bps0 - 16))
    elif bps0 < 16:
        mono = np.asarray(mono) * float(1 << (16 - bps0))
    return sr, "flac", np.clip(np.round(mono), -32768, 32767).astype(np.int16)


# ---------------------------------------------------------------------------
# Encoder (16-bit, mono/stereo independent, FIXED predictors)
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _best_rice_k(u: np.ndarray) -> int:
    best_k, best_cost = 0, None
    for k in range(0, 19):
        cost = len(u) * (k + 1) + int(np.sum(u >> k))
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
    return best_k


def _write_residual(w: _BitWriter, res: np.ndarray) -> None:
    u = ((res << 1) ^ (res >> 63)).astype(np.int64)  # zigzag
    k = _best_rice_k(u)
    w.write(0, 2)   # method: 4-bit rice
    w.write(0, 4)   # partition order 0
    w.write(k, 4)
    for v in u.tolist():
        w.write_unary(v >> k)
        w.write(v, k)


def _encode_subframe(w: _BitWriter, x: np.ndarray, bps: int) -> None:
    x = x.astype(np.int64)
    n = len(x)
    if np.all(x == x[0]):
        w.write(0, 1)
        w.write(0, 6)   # CONSTANT
        w.write(0, 1)
        w.write(int(x[0]), bps)
        return
    best = None
    max_order = min(4, n - 1)
    for order in range(0, max_order + 1):
        res = x.copy()
        for _ in range(order):
            res = np.diff(res)
        cost = int(np.sum(np.abs(res)))
        if best is None or cost < best[1]:
            best = (order, cost, res)
    order, _cost, res = best
    w.write(0, 1)
    w.write(8 + order, 6)  # FIXED
    w.write(0, 1)          # no wasted bits
    for v in x[:order].tolist():
        w.write(v, bps)
    _write_residual(w, res)


def encode_flac(pcm: np.ndarray, sr: int, channels: int = 1,
                block_size: int = 4096) -> bytes:
    """Canonical mono int16 PCM -> FLAC bytes (the `encode_wav` counterpart).

    `channels=2` duplicates the mono signal (independent subframes), which
    round-trips through the decoder's mean-downmix unchanged.
    """
    x = np.asarray(pcm, dtype=np.int16).astype(np.int64)
    n = len(x)
    bps = 16
    raw = _md5()
    if channels == 1:
        raw.update(x.astype("<i2").tobytes())
    else:
        inter = np.repeat(x, channels)
        raw.update(inter.astype("<i2").tobytes())
    frames = bytearray()
    frame_idx = 0
    for start in range(0, max(n, 1), block_size):
        blk = x[start:start + block_size]
        if len(blk) == 0:
            break
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)          # fixed blocksize strategy
        if len(blk) == block_size and block_size == 4096:
            w.write(12, 4)     # 256 << 4
        else:
            w.write(7, 4)      # 16-bit blocksize - 1 follows
        w.write(14 if sr % 10 == 0 and sr // 10 < 65536 else 13, 4)
        w.write(1, 4) if channels == 2 else w.write(0, 4)
        w.write(4, 3)          # 16-bit samples
        w.write(0, 1)
        # coded frame number (utf8-style)
        fn = frame_idx
        if fn < 0x80:
            w.write(fn, 8)
        elif fn < 0x800:
            w.write(0xC0 | (fn >> 6), 8)
            w.write(0x80 | (fn & 0x3F), 8)
        else:
            w.write(0xE0 | (fn >> 12), 8)
            w.write(0x80 | ((fn >> 6) & 0x3F), 8)
            w.write(0x80 | (fn & 0x3F), 8)
        if not (len(blk) == block_size and block_size == 4096):
            w.write(len(blk) - 1, 16)
        if sr % 10 == 0 and sr // 10 < 65536:
            w.write(sr // 10, 16)
        else:
            w.write(sr, 16)
        hdr = w.buf.copy()
        assert w.nbits == 0
        w.write(crc8(hdr), 8)
        for _ in range(channels):
            _encode_subframe(w, blk, bps)
        w.align()
        body = w.buf.copy()
        w.write(crc16(body), 16)
        frames += w.bytes()
        frame_idx += 1
    # STREAMINFO
    min_bs = max_bs = block_size if n >= block_size else max(n, 16)
    packed = (sr << 44) | ((channels - 1) << 41) | ((bps - 1) << 36) | n
    si = struct.pack(">HH", min_bs, max_bs) + b"\x00\x00\x00" * 2 \
        + packed.to_bytes(8, "big") + raw.digest()
    header = b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si
    return header + bytes(frames)
