"""Acoustic fingerprinting + audio near-duplicate detection.

The audio-payload analog of the text MinHash-LSH pipeline (textops.py):
per-clip spectral fingerprints computed in Arrow-batched pandas UDFs, then a
bucketed hash equi-join for candidate pairs — never an all-pairs comparison,
never PCM bytes through a shuffle.

Fingerprint scheme (band-occupancy variant of Haitsma & Kalker, "A Highly
Robust Audio Fingerprinting System", ISMIR 2002): frame the PCM, take
per-frame energies in log-spaced frequency bands, and emit two threshold bits
per band — ``E[b] > rel_hi * max(E)`` and ``E[b] > rel_lo * max(E)`` — packed
into one 62-bit hash per frame (31 bands x 2). Ratios to the frame maximum
are exactly invariant under any positive gain, and with thresholds decades
apart (0.25 / 0.005) a bit flips only when a band's relative energy moves
~20+ dB, so mild additive noise and int16 requantization leave the hash
intact. (HK's adjacent-band difference SIGNS are noise-dominated wherever two
bands are both near the noise floor — e.g. synthetic or band-limited audio —
which is why occupancy-vs-max is used instead of difference signs.)

The reference (datacontract-cli) has no audio operators; this implements the
north-star requirement of payload-aware validation ops over the
(clip_id, bytes, sr_hz, ...) table shape (BASELINE.json input_hint).

Scale design (10^12 clips):
- fingerprint pass: one mapInPandas scan of (clip_id, bytes); output rows are
  (clip_id, t, hash) — 8-byte hashes, constant count per second of audio.
- candidate join: self-equi-join on ``hash``; shuffle volume is bounded by
  fingerprint rows, and overfull buckets (silence / degenerate hashes, the
  skew risk) are dropped via a single windowed count over the same hash
  partitioning (documented recall tradeoff, standard in fingerprint joins).
- scoring: matches / min(|A|,|B|) needs per-clip distinct-hash counts — a
  groupBy(clip_id) aggregate joined back onto the pair table by key, all
  decomposable, AQE-friendly.
"""
from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .audio import parse_wav

FINGERPRINT_DDL = "clip_id string, t int, hash long, decode_error string"
NEAR_DUP_DDL = "id_a string, id_b string, matches long, score double"


def fingerprint_hashes(
    pcm: np.ndarray,
    sr: int,
    n_bands: int = 31,
    frame_s: float = 0.064,
    hop_s: float = 0.032,
    fmin: float = 300.0,
    fmax: float = 3000.0,
    rel_hi: float = 0.25,
    rel_lo: float = 0.005,
) -> np.ndarray:
    """Per-frame 62-bit sub-fingerprints of one clip (int64, one per frame).

    Pure numpy: Hann window -> rFFT power spectrum -> log-spaced band
    energies -> two occupancy bits per band (E > rel_hi*max, E > rel_lo*max).
    """
    x = np.asarray(pcm, dtype=np.float32)
    nwin = max(16, int(round(frame_s * sr)))
    hop = max(1, int(round(hop_s * sr)))
    if len(x) < nwin:
        return np.empty(0, dtype=np.int64)
    frames = np.lib.stride_tricks.sliding_window_view(x, nwin)[::hop]
    win = np.hanning(nwin).astype(np.float32)
    spec = np.fft.rfft(frames * win, axis=1)
    power = spec.real ** 2 + spec.imag ** 2
    freqs = np.fft.rfftfreq(nwin, 1.0 / sr)
    hi = min(fmax, 0.45 * sr)
    edges = np.geomspace(fmin, hi, n_bands + 1)
    idx = np.searchsorted(freqs, edges)
    # low sample rates can collapse adjacent band edges onto the same FFT bin;
    # force every band to span at least one bin so E is well-defined
    idx = np.maximum.accumulate(np.maximum(idx, np.arange(n_bands + 1)))
    idx = np.clip(idx, 0, power.shape[1] - 1)
    E = np.stack(
        [power[:, idx[i]:max(idx[i + 1], idx[i] + 1)].sum(axis=1)
         for i in range(n_bands)],
        axis=1,
    )
    mx = np.maximum(E.max(axis=1, keepdims=True), 1e-12)
    bits = np.concatenate([E > rel_hi * mx, E > rel_lo * mx], axis=1)
    weights = (1 << np.arange(2 * n_bands, dtype=np.int64))
    return (bits.astype(np.int64) * weights).sum(axis=1)


def audio_fingerprints(
    df: DataFrame,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    n_bands: int = 31,
    frame_s: float = 0.064,
    hop_s: float = 0.032,
    fmin: float = 300.0,
    fmax: float = 3000.0,
    rel_hi: float = 0.25,
    rel_lo: float = 0.005,
) -> DataFrame:
    """(clip_id, t, hash) fingerprint rows — one distributed decode+FFT pass.

    Undecodable clips surface as a single row with ``decode_error`` set (and
    hash NULL) so the fingerprint table doubles as a decode audit.
    """

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            ids, ts, hs, errs = [], [], [], []
            for rid, raw in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    sr, _codec, pcm = parse_wav(bytes(raw) if raw is not None else None)
                    hashes = fingerprint_hashes(
                        pcm, sr, n_bands=n_bands, frame_s=frame_s, hop_s=hop_s,
                        fmin=fmin, fmax=fmax, rel_hi=rel_hi, rel_lo=rel_lo,
                    )
                    for t, h in enumerate(hashes):
                        ids.append(rid); ts.append(t); hs.append(int(h)); errs.append(None)
                except (ValueError, struct.error) as e:
                    ids.append(rid); ts.append(None); hs.append(None); errs.append(str(e))
            # hash is a nullable int64 column: a None row (decode error) in
            # the batch must NOT let pandas coerce it to float64 — the 62-bit
            # hashes exceed float64's 53-bit mantissa, so that rounding
            # silently breaks equi-join matches for every clip in the batch
            yield pd.DataFrame({"clip_id": ids, "t": ts,
                                "hash": pd.array(hs, dtype="Int64"),
                                "decode_error": errs})

    return df.select(
        F.col(id_col).cast("string").alias(id_col), F.col(bytes_col)
    ).mapInPandas(run, schema=FINGERPRINT_DDL)


def audio_fingerprint_near_dup(
    fingerprints: DataFrame,
    threshold: float = 0.35,
    min_matches: int = 1,
    max_bucket: int = 500,
) -> DataFrame:
    """Near-duplicate clip pairs from a fingerprint table.

    Candidate pairs come ONLY from shared-hash buckets (equi-join on ``hash``,
    the MinHash-LSH band-join shape from textops.py): quadratic work is
    bounded per bucket, and overfull buckets — the skew/silence pathology —
    are dropped with the SAME hot-key anti-join as the text band join
    (textops.lsh_candidate_pairs): a groupBy count shuffles only map-side-
    combined (hash, count) partials — bounded by distinct hashes per
    partition — and the surviving hot-hash frame is at most rows/max_bucket
    keys, so AQE picks a broadcast anti-join at runtime. (A window count
    over the hash partitioning would shuffle AND SORT every fingerprint row
    just to count bucket sizes — at 10^12 clips that sort is pure waste.)
    Score = shared distinct hashes / min clip fingerprint count, so a short
    clip embedded in a longer one still scores high.
    """
    uniq = (
        fingerprints.filter(F.col("hash").isNotNull())
        .select("clip_id", "hash").distinct()
    )
    hot = (
        uniq.groupBy("hash")
        .agg(F.count(F.lit(1)).alias("__bc"))
        .filter(F.col("__bc") > max_bucket)
        .select("hash")
    )
    uniq = uniq.join(hot, on="hash", how="left_anti")
    # uniq feeds BOTH join sides and the per-clip counts: persist the tiny
    # (clip_id, hash) frame so the fingerprint lineage — a full decode pass
    # when called on audio_fingerprints output — evaluates ONCE, not 3x
    # (plan-gated: exactly one MapInPandas in the executed plan)
    uniq = uniq.persist()
    a = uniq.select(F.col("clip_id").alias("id_a"), "hash")
    b = uniq.select(F.col("clip_id").alias("id_b"), "hash")
    pairs = (
        a.join(b, on="hash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("matches"))
    )
    counts = uniq.groupBy("clip_id").agg(F.count(F.lit(1)).alias("n"))
    out = (
        pairs
        .join(counts.withColumnRenamed("clip_id", "id_a")
                    .withColumnRenamed("n", "n_a"), on="id_a")
        .join(counts.withColumnRenamed("clip_id", "id_b")
                    .withColumnRenamed("n", "n_b"), on="id_b")
        .withColumn("score", F.col("matches") / F.least("n_a", "n_b"))
        .filter((F.col("score") >= threshold) & (F.col("matches") >= min_matches))
        .select("id_a", "id_b", "matches", F.round("score", 6).alias("score"))
    )
    # cache handle for callers on long-lived sessions: after consuming the
    # pairs, dcspark.pipeline_ckpt.release_caches(out) frees the persisted
    # hash frame (Spark never GCs Dataset caches)
    out._dcspark_cached = [uniq]
    return out


def audio_near_dup(
    df: DataFrame,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    threshold: float = 0.35,
    min_matches: int = 1,
    max_bucket: int = 500,
    **fp_kwargs,
) -> DataFrame:
    """End-to-end: decode -> fingerprint -> bucketed near-dup pairs."""
    fp = audio_fingerprints(df, id_col=id_col, bytes_col=bytes_col, **fp_kwargs)
    return audio_fingerprint_near_dup(
        fp, threshold=threshold, min_matches=min_matches, max_bucket=max_bucket
    )


def audio_cross_contamination(
    corpus_fp: DataFrame,
    eval_fp: DataFrame,
    threshold: float = 0.35,
    min_matches: int = 1,
    max_eval_bucket: int = 50,
) -> DataFrame:
    """Eval-set contamination for AUDIO: (clip_id, eval_id, matches, score)
    for corpus clips whose acoustic fingerprints overlap an evaluation set —
    the payload analog of n-gram benchmark decontamination (dcspark/
    decontam.py), robust to the re-encodes that defeat exact byte or
    transcript matching (fingerprints are gain-invariant and noise-robust,
    test-locked in tests/test_audiofp.py).

    Scale shape: the eval side is benchmark-sized, never corpus-sized — its
    DISTINCT (eval_id, hash) frame is **broadcast**, so the corpus probe is
    a map-side hash join with zero corpus shuffle, mirroring decontam's
    text design. Eval hashes shared by more than ``max_eval_bucket`` eval
    clips are dropped first (non-discriminative silence/tone buckets — the
    fan-out and skew guard). Score = shared distinct hashes / min(clip,
    eval) fingerprint count, so a benchmark snippet embedded in a longer
    training clip still scores high."""
    # corpus hashes feed the probe join AND n_c; eval hashes feed the probe
    # and n_e: persist both so each side's decode pass runs once (the corpus
    # side is the 10^12-clip scan — re-evaluating it is the whole job twice)
    cu = (
        corpus_fp.filter(F.col("hash").isNotNull())
        .select("clip_id", "hash").distinct()
    ).persist()
    eu = (
        eval_fp.filter(F.col("hash").isNotNull())
        .select(F.col("clip_id").alias("eval_id"), "hash").distinct()
    )
    we = Window.partitionBy("hash")
    eu = (
        eu.withColumn("__bucket", F.count(F.lit(1)).over(we))
        .filter(F.col("__bucket") <= max_eval_bucket)
        .drop("__bucket")
    ).persist()
    n_c = cu.groupBy("clip_id").agg(F.count(F.lit(1)).alias("n_c"))
    n_e = eu.groupBy("eval_id").agg(F.count(F.lit(1)).alias("n_e"))
    pairs = (
        cu.join(F.broadcast(eu), on="hash")
        .groupBy("clip_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("matches"))
    )
    out = (
        pairs.join(n_c, on="clip_id")
        .join(F.broadcast(n_e), on="eval_id")
        .withColumn("score", F.col("matches") / F.least("n_c", "n_e"))
        .filter((F.col("score") >= threshold) & (F.col("matches") >= min_matches))
        .select("clip_id", "eval_id", "matches", F.round("score", 6).alias("score"))
    )
    out._dcspark_cached = [cu, eu]
    return out


def audio_contaminated_ids(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    threshold: float = 0.35,
    **kw,
) -> DataFrame:
    """Distinct corpus clip_ids acoustically contaminated by the eval set —
    decode + fingerprint both sides, probe, project. A drop list composable
    with the near-dup cluster survivors and the filter quarantine."""
    cfp = audio_fingerprints(corpus, id_col=id_col, bytes_col=bytes_col)
    efp = audio_fingerprints(eval_df, id_col=id_col, bytes_col=bytes_col)
    rep = audio_cross_contamination(cfp, efp, threshold=threshold, **kw)
    out = rep.select("clip_id").distinct()
    out._dcspark_cached = rep._dcspark_cached
    return out
