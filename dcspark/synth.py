"""Deterministic synthetic audio-clip + transcript tables (FIXTURES.md §1-§2).

No external data: every byte is synthesized from a seed. The synthesis rule makes
the audio-decode invariant verifiable by construction — for row ``i`` with seed
``s`` we generate a sine mix sampled at ``sr_hz`` for ``dur_ms`` milliseconds,
quantized to int16 and wrapped in a standard 44-byte RIFF/WAV header; the engine's
oracle re-synthesizes the same PCM from (seed, i, sr_hz, dur_ms) and checks
decoded-PCM allclose at SNR >= 30 dB.

Generation is DISTRIBUTED: ``generate_audio_table`` builds the table with
``spark.range(n).mapInPandas`` so a 10^12-row synthetic table would be produced in
parallel across executors, never on the driver.
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, List, Optional

import numpy as np

SR_ENUM = [8000, 16000, 22050, 44100, 48000]
CODEC = "pcm_s16le"
WORDS = (
    "the quick brown fox jumps over lazy dog alpha bravo charlie delta echo "
    "foxtrot golf hotel india juliet kilo lima mike november oscar papa quebec "
    "romeo sierra tango uniform victor whiskey xray yankee zulu"
).split()

# Corruption flags (FIXTURES.md §1) in a fixed order so per-row corruption draws
# are reproducible independent of which flags are enabled.
CORRUPTION_FLAGS = [
    "null_transcript", "dup_clip_id", "bad_sr", "bad_range", "bad_pattern",
    "orphan_ref", "lying_header", "garbled_pcm", "wrong_transcript", "drift_dur",
    "muted_pcm", "wrong_codec",
]

#: alternate payload codecs for ``codec_mix`` rows — every one decodes back to
#: canonical int16 at SNR >= 30 dB (u8 ~50 dB, G.711 ~38 dB, s24/f32/flac
#: lossless), so a correctly-declared alternate-codec clip still passes the
#: full contract
ALT_CODECS = ("pcm_u8", "pcm_s24le", "pcm_f32le", "pcm_mulaw", "pcm_alaw",
              "flac")

AUDIO_SCHEMA_DDL = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string"
)
TRANSCRIPTS_REF_DDL = "clip_id string, text string"


def clip_id_for(i: int) -> str:
    return "clip-%012d" % i


def row_rng(seed: int, i: int) -> np.random.Generator:
    return np.random.default_rng(seed + i)


def synth_params_audio(seed: int, i: int, dur_lo: int = 200, dur_hi: int = 30000,
                       sr_enum=SR_ENUM):
    """Deterministic per-row audio draw (sr_hz, dur_ms, f_k, a_k) only.

    The SNR-oracle hot path: skips the transcript stream entirely (one fewer
    Generator construction + word draws per clip — ~10% of the whole per-clip
    eval cost at 10^12 rows, measured in scripts/profile_eval.py). Safe to
    split because transcripts deliberately use their OWN rng stream (below),
    so the audio draws are identical with or without them.

    ``sr_enum`` narrows the sample-rate draw (e.g. ``(8000,)`` for the
    compact low-rate bench layout); generator and oracle must pass the SAME
    enum, since the draw count and the frequency bounds depend on it."""
    rng = row_rng(seed, i)
    sr = sr_enum[int(rng.integers(0, len(sr_enum)))]
    dur = int(rng.integers(dur_lo, dur_hi + 1))
    k = int(rng.integers(2, 5))
    freqs = rng.uniform(100.0, min(4000.0, sr / 2 * 0.8), size=k)
    amps = rng.uniform(0.1, 0.3, size=k)
    return sr, dur, freqs, amps


def synth_params(seed: int, i: int, dur_lo: int = 200, dur_hi: int = 30000,
                 sr_enum=SR_ENUM):
    """Deterministic per-row (sr_hz, dur_ms, f_k, a_k, transcript words)."""
    sr, dur, freqs, amps = synth_params_audio(seed, i, dur_lo, dur_hi, sr_enum)
    # Transcripts get their OWN stream: bounded integers() uses rejection
    # sampling, so the dur draw consumes a bounds-dependent number of raw
    # draws — with a shared stream, generating clips at (200,2000) and the
    # transcript ref at default bounds produced ~1e-5 of rows whose words
    # diverged (observed: 3/256k transcript_equality violations in bench).
    t_rng = np.random.default_rng([seed, i, 7])
    n_words = int(t_rng.integers(3, 9))
    words = [WORDS[int(w)] for w in t_rng.integers(0, len(WORDS), size=n_words)]
    return sr, dur, freqs, amps, " ".join(words)


def synth_pcm(sr: int, dur_ms: int, freqs: np.ndarray, amps: np.ndarray) -> np.ndarray:
    """int16 PCM of the sine mix (vectorized numpy; no per-sample Python)."""
    n = int(round(sr * dur_ms / 1000.0))
    t = np.arange(n, dtype=np.float64) / sr
    x = np.zeros(n, dtype=np.float64)
    for f, a in zip(freqs, amps):
        x += a * np.sin(2.0 * np.pi * f * t)
    peak = np.abs(amps).sum() or 1.0
    return np.clip(x / peak * 0.9 * 32767.0, -32768, 32767).astype(np.int16)


def wav_bytes(pcm: np.ndarray, sr: int) -> bytes:
    """Standard 44-byte RIFF/WAV header + s16le mono payload."""
    data = pcm.astype("<i2").tobytes()
    byte_rate = sr * 2
    header = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sr, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return header + data


def synth_pcm_fast(sr: int, dur_ms: int, freqs: np.ndarray, amps: np.ndarray) -> np.ndarray:
    """float32 in-place variant of synth_pcm for the ORACLE side (~12x faster,
    SIMD sin + half the memory traffic — the float64 path is memory-bandwidth
    bound and stops scaling past ~16 cores). Agrees with synth_pcm at ~70 dB
    SNR, far above the 30 dB invariant floor. Data GENERATION keeps the
    float64 path so every cached/persisted fixture stays bit-identical."""
    n = int(round(sr * dur_ms / 1000.0))
    t = np.arange(n, dtype=np.float32)
    t *= np.float32(1.0 / sr)
    x = np.zeros(n, dtype=np.float32)
    tmp = np.empty(n, dtype=np.float32)
    for f, a in zip(freqs, amps):
        np.multiply(t, np.float32(2.0 * np.pi * f), out=tmp)
        np.sin(tmp, out=tmp)
        tmp *= np.float32(a)
        x += tmp
    peak = np.abs(amps).sum() or 1.0
    x *= np.float32(0.9 * 32767.0 / peak)
    np.clip(x, -32768, 32767, out=x)
    return x.astype(np.int16)


def oracle_pcm(seed: int, i: int, dur_lo: int = 200, dur_hi: int = 30000,
               sr_enum=SR_ENUM) -> np.ndarray:
    """Re-synthesize the expected PCM for row i — the decode invariant's oracle."""
    sr, dur, freqs, amps = synth_params_audio(seed, i, dur_lo, dur_hi, sr_enum)
    return synth_pcm_fast(sr, dur, freqs, amps)


_SNR_SCRATCH: dict = {}


def _snr_scratch(block: int):
    """Process-global float32 scratch (tmp, x, t, d, ramp) for oracle_snr —
    safe because a pyspark Python worker executes one task at a time."""
    bufs = _SNR_SCRATCH.get(block)
    if bufs is None:
        bufs = (np.empty(block, dtype=np.float32),
                np.empty(block, dtype=np.float32),
                np.empty(block, dtype=np.float32),
                np.empty(block, dtype=np.float32),
                np.arange(block, dtype=np.float32))
        _SNR_SCRATCH[block] = bufs
    return bufs


def oracle_snr(
    seed: int,
    i: int,
    decoded: np.ndarray,
    dur_lo: int = 200,
    dur_hi: int = 30000,
    block: int = 65536,
    sr_enum=SR_ENUM,
) -> float:
    """Decoded-vs-oracle SNR computed in cache-resident blocks.

    Never materializes the full reference PCM: each 64k-sample block (256 KB
    float32, fits L2) is synthesized, differenced against the decoded slice,
    and reduced to running signal/error powers. DRAM traffic per clip drops
    ~9x vs full-array synthesis + subtraction, which is what restores near-
    linear multi-core scaling (the full-array float path saturates a single
    host's memory bandwidth at ~16 cores). The reference is the un-quantized
    analog mix — within ~3 dB of the int16-quantized variant, irrelevant
    against the 30 dB invariant floor. Length-mismatch semantics match
    audio.snr_db (diff > max(4, 1%) -> -inf).
    """
    sr, dur, freqs, amps = synth_params_audio(seed, i, dur_lo, dur_hi, sr_enum)
    n = int(round(sr * dur / 1000.0))
    m = min(n, len(decoded))
    if m == 0 or abs(n - len(decoded)) > max(4, int(0.01 * m)):
        return float("-inf")
    scale = np.float32(0.9 * 32767.0 / (np.abs(amps).sum() or 1.0))
    omegas = [np.float32(2.0 * np.pi * f / sr) for f in freqs]
    gains = [np.float32(a) for a in amps]
    p_sig = 0.0
    p_err = 0.0
    # per-call allocations dominate the ~400-sample-average short-clip case
    # (profiled: arange + 2x np.empty + astype were ~1/3 of oracle time per
    # clip): reuse process-global scratch buffers — pyspark workers run ONE
    # task at a time, so module-level scratch is data-race-free — and a
    # cached float32 ramp. t = ramp[:ln] + off is bit-identical to
    # np.arange(off, hi, float32): float32 holds ints exactly through 2^24
    # and the max sample index (30 s * 48 kHz = 1.44M) is far below that.
    tmp, x, tbuf, dbuf, ramp = _snr_scratch(block)
    for off in range(0, m, block):
        hi = min(off + block, m)
        ln = hi - off
        t = np.add(ramp[:ln], np.float32(off), out=tbuf[:ln])
        xv = x[:ln]
        xv.fill(0.0)
        tv = tmp[:ln]
        for w, a in zip(omegas, gains):
            np.multiply(t, w, out=tv)
            np.sin(tv, out=tv)
            tv *= a
            xv += tv
        xv *= scale
        np.clip(xv, -32768, 32767, out=xv)
        d = dbuf[:ln]
        np.copyto(d, decoded[off:hi], casting="unsafe")
        p_sig += float(np.dot(xv, xv))
        d -= xv
        p_err += float(np.dot(d, d))
    if p_err == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return float(10.0 * np.log10(p_sig / p_err))


def _corrupt_draw(seed: int, i: int, flag: str) -> float:
    idx = CORRUPTION_FLAGS.index(flag)
    return float(np.random.default_rng([seed, i, idx]).uniform())


def make_row(
    seed: int,
    i: int,
    corrupt: Optional[Dict[str, float]] = None,
    dur_lo: int = 200,
    dur_hi: int = 30000,
    codec_mix: float = 0.0,
    sr_enum=SR_ENUM,
    force_codec: Optional[str] = None,
) -> dict:
    """One audio_clips row; ``corrupt`` maps flag name -> fraction of rows to flip.

    ``codec_mix`` > 0 encodes that fraction of rows in a deterministically drawn
    :data:`ALT_CODECS` payload with the codec column declared CORRECTLY (valid
    rows — the contract must pass them); the ``wrong_codec`` corruption flag
    instead encodes the payload in a codec that does NOT match the declared
    column, so only the decode-conformance ``codec_ok`` check can catch it.

    ``sr_enum``/``force_codec`` shape the compact low-rate bench layout
    (e.g. sr_enum=(8000,), force_codec='pcm_u8' — ~7x smaller payloads);
    the SNR oracle must be built with the same sr_enum.
    """
    sr, dur, freqs, amps, transcript = synth_params(seed, i, dur_lo, dur_hi, sr_enum)
    corrupt = corrupt or {}

    def hit(flag: str) -> bool:
        frac = corrupt.get(flag, 0.0)
        return frac > 0 and _corrupt_draw(seed, i, flag) < frac

    payload_codec = declared_codec = force_codec or CODEC
    if codec_mix > 0:
        c_rng = np.random.default_rng([seed, i, 201])
        if c_rng.uniform() < codec_mix:
            payload_codec = declared_codec = ALT_CODECS[int(c_rng.integers(0, len(ALT_CODECS)))]
    if hit("wrong_codec"):
        payload_codec = "pcm_mulaw" if declared_codec != "pcm_mulaw" else "pcm_alaw"

    if payload_codec == CODEC:
        enc = wav_bytes
    else:
        from .audio import encode_wav

        def enc(p, s):
            return encode_wav(p, s, codec=payload_codec)

    pcm = synth_pcm(sr, dur, freqs, amps)
    declared_sr, declared_dur = sr, dur
    clip_id = clip_id_for(i)

    if hit("drift_dur"):
        # draw dur from a shifted distribution; bytes still match the declared value
        rng = np.random.default_rng([seed, i, 101])
        declared_dur = int(rng.integers(dur_lo + (dur_hi - dur_lo) // 2, dur_hi + 1))
        pcm = synth_pcm(sr, declared_dur, freqs, amps)
    if hit("lying_header"):
        # column says sr but bytes encode sr/2 — decode-conformance must catch it
        pcm = synth_pcm(sr // 2, declared_dur, freqs, amps)
        b = enc(pcm, sr // 2)
    else:
        b = enc(pcm, sr)
    if hit("garbled_pcm"):
        noise_rng = np.random.default_rng([seed, i, 102])
        noisy = pcm.astype(np.float64) + noise_rng.normal(0, np.abs(pcm).mean() * 0.5 + 1.0, pcm.shape)
        b = enc(np.clip(noisy, -32768, 32767).astype(np.int16), sr)
    if hit("muted_pcm"):
        # all-zero payload under a perfectly valid header: only decoded-signal
        # checks (signal-quality silence floor; SNR-vs-oracle) can see it
        b = enc(np.zeros_like(pcm), sr)
    if hit("bad_sr"):
        declared_sr = 12345
    if hit("bad_range"):
        declared_dur = -5 if _corrupt_draw(seed, i, "bad_range") < corrupt.get("bad_range", 0) / 2 else 10_000_000
    if hit("bad_pattern"):
        clip_id = "CLIP_x%d" % i
    if hit("wrong_transcript"):
        transcript = transcript + " corrupted"
    if hit("null_transcript"):
        transcript = None

    return {
        "clip_id": clip_id,
        "bytes": b,
        "sr_hz": declared_sr,
        "dur_ms": declared_dur,
        "codec": declared_codec,
        "transcript": transcript,
        "_i": i,
    }


def generate_audio_table(
    spark,
    n: int,
    seed: int = 42,
    corrupt: Optional[Dict[str, float]] = None,
    dur_lo: int = 200,
    dur_hi: int = 30000,
    num_partitions: Optional[int] = None,
    codec_mix: float = 0.0,
    sr_enum=SR_ENUM,
    force_codec: Optional[str] = None,
):
    """Distributed synthesis: spark.range(n) -> mapInPandas -> audio_clips DataFrame.

    ``dup_clip_id`` corruption duplicates an existing id (row i takes row 0's id);
    ``orphan_ref`` is realized by generate_transcripts_ref excluding those ids.
    ``codec_mix`` encodes that fraction of rows in correctly-declared ALT_CODECS.
    ``sr_enum``/``force_codec`` build the compact low-rate layout (see make_row).
    """
    corrupt = dict(corrupt or {})
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                r = make_row(seed, int(i), corrupt, dur_lo, dur_hi, codec_mix,
                             sr_enum, force_codec)
                if corrupt.get("dup_clip_id", 0) > 0 and _corrupt_draw(seed, int(i), "dup_clip_id") < corrupt["dup_clip_id"] and i > 0:
                    r["clip_id"] = clip_id_for(0)
                del r["_i"]
                rows.append(r)
            yield pd.DataFrame(rows, columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"])

    rng_df = spark.range(0, n, 1, num_partitions) if num_partitions else spark.range(n)
    return rng_df.mapInPandas(gen, schema=AUDIO_SCHEMA_DDL)


def generate_transcripts_ref(
    spark,
    n: int,
    seed: int = 42,
    orphan_frac: float = 0.0,
    extra: int = 0,
    num_partitions: Optional[int] = None,
):
    """Reference table: superset of audio_clips clip_ids with oracle transcripts.

    ``orphan_frac`` > 0 EXCLUDES that fraction of ids from the reference, making the
    corresponding audio rows orphans (fails the referential check). ``extra`` adds
    ids beyond n (a superset is legal in the passing fixture).
    """
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                i = int(i)
                if orphan_frac > 0 and i < n and _corrupt_draw(seed, i, "orphan_ref") < orphan_frac:
                    continue
                _, _, _, _, transcript = synth_params(seed, i)
                rows.append({"clip_id": clip_id_for(i), "text": transcript})
            yield pd.DataFrame(rows, columns=["clip_id", "text"])

    rng_df = spark.range(0, n + extra, 1, num_partitions) if num_partitions else spark.range(n + extra)
    return rng_df.mapInPandas(gen, schema=TRANSCRIPTS_REF_DDL)
