"""Stage-boundary checkpoint/resume for the long-running pipeline operators.

The validation engine already resumes from a per-partition manifest
(``dcspark/engine.py`` checkpoint path); this module gives the *pipeline*
operators — MinHash near-dup and benchmark decontamination, the jobs that at
10^12 rows run for hours — the same property at STAGE granularity: each
expensive stage materializes to parquet under a checkpoint directory with a
signature manifest (operator parameters + input-file lineage). A restarted
job re-reads completed stages instead of recomputing them; a changed
parameter or changed input invalidates exactly the stages it affects.

Why stage-level (not partition-level like the engine): the dedup/decontam
shapes are shuffle pipelines — candidates, verification, report — whose
natural recovery points are the stage boundaries, which also truncate the
shuffle lineage (the same reason one would ``df.checkpoint()`` — but durable
across driver restarts, which ``checkpoint()`` is not).

Reference parity note: the reference CLI has no resumable pipelines at all
(each ``datacontract test`` run is one-shot); this exceeds it, per the
north-star requirement "resumable from a checkpoint manifest".
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def input_lineage(df: DataFrame) -> Dict[str, Any]:
    """(file count, md5 of the sorted file list) for a DataFrame's source
    files — the same lineage notion as the engine manifest. In-memory frames
    (createDataFrame) have no files; their lineage is recorded as ``none``
    and the signature then covers parameters only (documented caveat)."""
    files = sorted(df.inputFiles())
    if not files:
        return {"files": 0, "sig": "none"}
    return {
        "files": len(files),
        "sig": hashlib.md5("\n".join(files).encode()).hexdigest(),
    }


class StageCheckpoint:
    """Materialize named pipeline stages to parquet, keyed by a signature.

    ``signature`` is a JSON-able dict of everything the stage outputs depend
    on (operator parameters + input lineage). ``stage(name, builder)`` runs
    ``builder()`` and writes its frame to ``<dir>/<name>`` — unless a
    completed run of the same name under the SAME signature already exists,
    in which case the parquet is read back and the builder never runs.
    Writing is atomic at stage granularity: the manifest is written only
    after the parquet write commits (_SUCCESS), so a job killed mid-stage
    rebuilds that stage and that stage only.
    """

    def __init__(self, spark: SparkSession, ckpt_dir: str, signature: Dict[str, Any]):
        self.spark = spark
        self.dir = ckpt_dir
        self.sig = hashlib.md5(
            json.dumps(signature, sort_keys=True, default=str).encode()
        ).hexdigest()
        os.makedirs(ckpt_dir, exist_ok=True)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.dir, f"{name}.manifest.json")

    def _data_path(self, name: str) -> str:
        return os.path.join(self.dir, name)

    def completed(self, name: str) -> bool:
        meta = self._meta_path(name)
        if not os.path.exists(meta):
            return False
        try:
            with open(meta, "r", encoding="utf-8") as f:
                rec = json.load(f)
        except (OSError, ValueError):
            return False
        return (
            rec.get("signature") == self.sig
            and rec.get("status") == "done"
            and os.path.exists(os.path.join(self._data_path(name), "_SUCCESS"))
        )

    def stage(self, name: str, builder: Callable[[], DataFrame]) -> DataFrame:
        """Return the stage's frame, from checkpoint if completed under this
        signature, else by running ``builder`` and persisting its output."""
        data = self._data_path(name)
        if self.completed(name):
            return self.spark.read.parquet(data)
        # invalidate the OLD manifest before touching the data dir: a crash
        # between the parquet overwrite and the manifest rewrite must leave
        # the stage incomplete, not serve the new parameters' parquet under
        # the old signature (parameter sweeps alternate signatures against
        # one checkpoint dir, so this window is real, not theoretical)
        meta = self._meta_path(name)
        if os.path.exists(meta):
            os.remove(meta)
        df = builder()
        df.write.mode("overwrite").parquet(data)
        # the builder's operator may have persisted internal frames to keep
        # its decode single-pass; the parquet is now the durable copy, so
        # release them (long sweeps would otherwise accumulate cached blocks)
        release_caches(df)
        with open(self._meta_path(name), "w", encoding="utf-8") as f:
            json.dump({"signature": self.sig, "status": "done", "stage": name}, f)
        return self.spark.read.parquet(data)


def _require_signable(kwargs: Dict[str, Any]) -> Dict[str, Any]:
    """Reject kwargs whose values cannot be JSON-signed (functions, objects).

    ``json.dumps(..., default=str)`` would embed their repr — which carries a
    memory address for functions — so the signature would differ in every
    process and the checkpoint would silently never resume (every run would
    re-decode, invisibly, with correct output)."""
    for k, v in kwargs.items():
        try:
            json.dumps(v)
        except (TypeError, ValueError):
            raise ValueError(
                f"resumable wrapper cannot sign parameter {k}={v!r}: only "
                "JSON-serializable fingerprint parameters can participate in "
                "a checkpoint signature (a custom decoder/callable cannot — "
                "use the non-resumable operator)")
    return dict(sorted(kwargs.items()))


def release_caches(df: DataFrame) -> None:
    """Unpersist the internal frames an operator cached while building ``df``.

    Operators that must evaluate their (decode-expensive) input exactly once
    persist an internal hash frame and tag the returned DataFrame with the
    handles (``_dcspark_cached``); once the result is consumed/materialized,
    callers on a long-lived session release them here — otherwise each call
    leaks MEMORY_AND_DISK blocks until session end (Spark's CacheManager does
    not GC Dataset caches)."""
    for cached in getattr(df, "_dcspark_cached", ()):
        cached.unpersist()


def _decontam_resumable(
    op: str,
    corpus: DataFrame,
    eval_df: DataFrame,
    ckpt_dir: str,
    fp_builder: Callable[[DataFrame], DataFrame],
    probe_builder: Callable[[DataFrame, DataFrame], DataFrame],
    join_params: Dict[str, Any],
    fp_params: Dict[str, Any],
) -> DataFrame:
    """Shared eval_fp / corpus_fp / report skeleton with PER-SIDE decode
    signatures: ``corpus_fp`` signs only the corpus lineage — swapping the
    benchmark must NOT re-decode the corpus, the cost this module exists to
    avoid — and ``eval_fp`` only the eval lineage; the ``report`` stage signs
    both plus the probe parameters."""
    base = {"op": op, **fp_params}
    c_lineage, e_lineage = input_lineage(corpus), input_lineage(eval_df)
    ck_c = StageCheckpoint(corpus.sparkSession, ckpt_dir,
                           {**base, "input": c_lineage})
    ck_e = StageCheckpoint(corpus.sparkSession, ckpt_dir,
                           {**base, "eval": e_lineage})
    ck_join = StageCheckpoint(corpus.sparkSession, ckpt_dir, {
        **base, "input": c_lineage, "eval": e_lineage, **join_params})
    efp = ck_e.stage("eval_fp", lambda: fp_builder(eval_df))
    cfp = ck_c.stage("corpus_fp", lambda: fp_builder(corpus))
    return ck_join.stage("report", lambda: probe_builder(cfp, efp))


def minhash_near_dups_resumable(
    docs: DataFrame,
    ckpt_dir: str,
    threshold: float = 0.5,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    n: int = 3,
    max_bucket: Optional[int] = 1000,
) -> DataFrame:
    """:func:`dcspark.textops.minhash_near_dups` with stage checkpoints.

    Stages: ``candidates`` (shingle → signature → band self-join, the
    shuffle-heavy part) and ``scored`` (exact Jaccard verify). A driver
    killed after candidates completes resumes straight into the verify; a
    changed parameter or input invalidates both. Same output frame as the
    non-resumable operator.
    """
    from . import textops

    ck = StageCheckpoint(docs.sparkSession, ckpt_dir, {
        "op": "minhash_near_dups",
        "num_hashes": num_hashes, "rows_per_band": rows_per_band,
        "n": n, "max_bucket": max_bucket,
        "input": input_lineage(docs),
    })
    pairs = ck.stage("candidates", lambda: textops.lsh_candidate_pairs(
        docs, num_hashes, rows_per_band, n, max_bucket=max_bucket))

    def build_scored() -> DataFrame:
        # jaccard_on_pairs reads the shingle table ~4x (sizes + both
        # inverted-index sides): share ONE persisted table, released by
        # stage() after the parquet write
        sh = textops.shingle_table(docs, n, persist=True)
        out = textops.jaccard_on_pairs(docs, pairs, n, sh=sh)
        out._dcspark_cached = [sh]
        return out

    scored = ck.stage("scored", build_scored)
    # threshold applies at read time (cheap filter), so one checkpointed
    # verify serves any threshold sweep without recomputation
    return scored.filter(F.col("jaccard") >= threshold)


def duplicate_spans_resumable(
    docs: DataFrame,
    ckpt_dir: str,
    n_tokens: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """:func:`dcspark.textops.duplicate_span_stats` with stage checkpoints.

    Stages: ``spans`` (the tokenize+md5 compact frame — the map-heavy pass,
    signed by n_tokens + input lineage only) and ``report`` (global count +
    semi join + interval-union coverage, signed additionally by min_count).
    A ``min_count`` sweep therefore reuses the checkpointed spans parquet
    without re-tokenizing the corpus; a changed ``n_tokens`` or input
    invalidates both stages.
    """
    from . import textops

    base = {"op": "duplicate_spans", "n_tokens": n_tokens,
            "input": input_lineage(docs)}
    ck_spans = StageCheckpoint(docs.sparkSession, ckpt_dir, base)
    ck_report = StageCheckpoint(docs.sparkSession, ckpt_dir,
                                {**base, "min_count": min_count})
    spans = ck_spans.stage(
        "spans", lambda: textops.span_compact_table(docs, n_tokens, persist=False)
    )
    return ck_report.stage(
        "report", lambda: textops.span_report(spans, n_tokens, min_count)
    )


def contamination_resumable(
    docs: DataFrame,
    eval_df: DataFrame,
    ckpt_dir: str,
    n: int = 8,
    doc_id: str = "doc_id",
    doc_col: str = "text",
    eval_col: str = "text",
    broadcast_max_grams: int = None,
) -> DataFrame:
    """:func:`dcspark.decontam.contamination` with stage checkpoints.

    Stages: ``eval_grams`` (distinct benchmark digests — cheap but pins the
    eval set: a resumed run provably probes the same digests) and ``report``
    (the corpus probe + per-doc aggregation, the expensive part). The corpus
    probe reuses the checkpointed digest parquet via broadcast.

    ``broadcast_max_grams`` mirrors :func:`dcspark.decontam.contamination`:
    digest counts at or below it broadcast the eval side, above it the probe
    falls back to a shuffled-hash join; ``0`` forces the shuffle path, and
    the default is ``decontam.BROADCAST_MAX_EVAL_GRAMS``.
    """
    from .decontam import ngram_md5_array

    ck = StageCheckpoint(docs.sparkSession, ckpt_dir, {
        "op": "contamination", "n": n,
        "doc_id": doc_id, "doc_col": doc_col, "eval_col": eval_col,
        "input": input_lineage(docs), "eval": input_lineage(eval_df),
    })
    eval_grams = ck.stage("eval_grams", lambda: (
        eval_df.select(F.explode(ngram_md5_array(F.col(eval_col), n)).alias("gram"))
        .distinct()
    ))

    return ck.stage("report", lambda: _contamination_probe(
        docs, eval_grams, doc_id, doc_col, n,
        broadcast_max_grams=broadcast_max_grams))


def _contamination_probe(
    docs: DataFrame, eval_grams: DataFrame,
    doc_id: str, doc_col: str, n: int,
    broadcast_max_grams: int = None,
) -> DataFrame:
    """The resumable contamination report from a materialized digest frame —
    same probe as the one-shot ``decontam.contamination`` INCLUDING its
    broadcast-budget guard: a multi-benchmark digest union past the budget
    falls back to a shuffled-hash join instead of OOMing every executor. The
    digest stage is checkpointed parquet here, so the count is exact and
    costs one column-pruned scan of the tiny digest table."""
    from .decontam import BROADCAST_MAX_EVAL_GRAMS, ngram_md5_array

    if broadcast_max_grams is None:
        broadcast_max_grams = BROADCAST_MAX_EVAL_GRAMS
    doc_grams = docs.select(
        F.col(doc_id),
        F.explode(ngram_md5_array(F.col(doc_col), n)).alias("gram"),
    )
    hit = eval_grams.withColumn("__hit", F.lit(True))
    if eval_grams.count() <= broadcast_max_grams:
        eval_side = F.broadcast(hit)
    else:
        eval_side = hit.hint("shuffle_hash")
    probed = doc_grams.join(eval_side, "gram", "left")
    return (
        probed.groupBy(doc_id)
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("__hit"), 1).otherwise(0)), F.lit(0)
            ).alias("matched_ngrams"),
            F.count(F.lit(1)).alias("total_ngrams"),
        )
        .withColumn("contamination", F.col("matched_ngrams") / F.col("total_ngrams"))
    )


def audio_near_dup_resumable(
    df: DataFrame,
    ckpt_dir: str,
    threshold: float = 0.35,
    min_matches: int = 1,
    max_bucket: int = 500,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    **fp_kwargs,
) -> DataFrame:
    """:func:`dcspark.audiofp.audio_near_dup` with stage checkpoints.

    Stages: ``fingerprints`` (the decode+FFT pass — at 10^12 clips the
    dominant cost by orders of magnitude) and ``pairs`` (bucket-capped
    shared-hash join, stored UNTHRESHOLDED). ``threshold``/``min_matches``
    apply at read time, so one checkpointed join serves any threshold sweep;
    the read-time filter sees the stored 6-decimal-rounded score (a 1e-6
    boundary sliver vs the one-shot operator, documented tradeoff). A changed
    fingerprint parameter or input invalidates everything; a changed
    ``max_bucket`` invalidates only the join stage — the decode stays
    cached."""
    from . import audiofp

    # per-stage signatures (the module contract: a changed parameter
    # invalidates exactly the stages it affects): the decode signature knows
    # nothing of max_bucket, so a join-parameter sweep reuses fingerprints;
    # the join signature embeds the decode signature, so a changed fp
    # parameter or input invalidates both
    fp_sig = {
        "op": "audio_near_dup", "id_col": id_col, "bytes_col": bytes_col,
        "fp": _require_signable(fp_kwargs), "input": input_lineage(df),
    }
    ck_fp = StageCheckpoint(df.sparkSession, ckpt_dir, fp_sig)
    ck_join = StageCheckpoint(df.sparkSession, ckpt_dir,
                              {**fp_sig, "max_bucket": max_bucket})
    fp = ck_fp.stage("fingerprints", lambda: audiofp.audio_fingerprints(
        df, id_col=id_col, bytes_col=bytes_col, **fp_kwargs))
    pairs = ck_join.stage("pairs", lambda: audiofp.audio_fingerprint_near_dup(
        fp, threshold=0.0, min_matches=1, max_bucket=max_bucket))
    return pairs.filter(
        (F.col("score") >= threshold) & (F.col("matches") >= min_matches))


def audio_decontam_resumable(
    corpus: DataFrame,
    eval_df: DataFrame,
    ckpt_dir: str,
    threshold: float = 0.35,
    min_matches: int = 1,
    max_eval_bucket: int = 50,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    **fp_kwargs,
) -> DataFrame:
    """:func:`dcspark.audiofp.audio_cross_contamination` end-to-end with
    stage checkpoints: ``eval_fp`` (cheap, pins the benchmark), ``corpus_fp``
    (the expensive corpus decode), ``report`` (broadcast probe, stored
    unthresholded; threshold/min_matches filter at read time). A killed
    10^12-clip decontam run resumes after the last completed decode instead
    of re-decoding the corpus."""
    from . import audiofp

    report = _decontam_resumable(
        "audio_decontam", corpus, eval_df, ckpt_dir,
        lambda d: audiofp.audio_fingerprints(
            d, id_col=id_col, bytes_col=bytes_col, **fp_kwargs),
        lambda c, e: audiofp.audio_cross_contamination(
            c, e, threshold=0.0, min_matches=1,
            max_eval_bucket=max_eval_bucket),
        {"max_eval_bucket": max_eval_bucket},
        {"id_col": id_col, "bytes_col": bytes_col,
         "fp": _require_signable(fp_kwargs)},
    )
    return report.filter(
        (F.col("score") >= threshold) & (F.col("matches") >= min_matches))


def image_near_dup_resumable(
    df: DataFrame,
    ckpt_dir: str,
    max_hamming: int = 3,
    max_bucket: int = 1000,
    id_col: str = "id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """:func:`dcspark.imagefp.image_near_dup` with stage checkpoints:
    ``fingerprints`` (the image decode pass) and ``pairs`` (blocked Hamming
    join). ``max_hamming`` shapes the candidate verify, so it lives in the
    signature rather than a read-time filter."""
    from . import imagefp

    fp_sig = {
        "op": "image_near_dup", "id_col": id_col, "bytes_col": bytes_col,
        "input": input_lineage(df),
    }
    ck_fp = StageCheckpoint(df.sparkSession, ckpt_dir, fp_sig)
    ck_join = StageCheckpoint(df.sparkSession, ckpt_dir, {
        **fp_sig, "max_hamming": max_hamming, "max_bucket": max_bucket})
    fp = ck_fp.stage("fingerprints", lambda: imagefp.image_fingerprints(
        df, id_col=id_col, bytes_col=bytes_col))
    # image_fingerprints always emits the fixed FP_DDL columns (id, dhash,
    # ...) whatever the input id_col was named
    return ck_join.stage("pairs", lambda: imagefp.near_dup_pairs_from_fp(
        fp.select("id", "dhash"),
        max_hamming=max_hamming, max_bucket=max_bucket))


def video_near_dup_resumable(
    df: DataFrame,
    ckpt_dir: str,
    threshold: float = 0.6,
    max_hamming: int = 3,
    min_matches: int = 1,
    max_bucket: int = 500,
    id_col: str = "id",
    bytes_col: str = "bytes",
    **fp_kwargs,
) -> DataFrame:
    """:func:`dcspark.imagefp.video_near_dup` with stage checkpoints:
    ``fingerprints`` (MJPEG decode + per-frame dHash, the dominant cost) and
    ``pairs`` (Hamming-tolerant block join, stored unthresholded —
    threshold/min_matches at read time; ``max_hamming`` in the signature)."""
    from . import imagefp

    fp_sig = {
        "op": "video_near_dup", "id_col": id_col, "bytes_col": bytes_col,
        "fp": _require_signable(fp_kwargs), "input": input_lineage(df),
    }
    ck_fp = StageCheckpoint(df.sparkSession, ckpt_dir, fp_sig)
    ck_join = StageCheckpoint(df.sparkSession, ckpt_dir, {
        **fp_sig, "max_hamming": max_hamming, "max_bucket": max_bucket})
    fp = ck_fp.stage("fingerprints", lambda: imagefp.video_fingerprints(
        df, id_col=id_col, bytes_col=bytes_col, **fp_kwargs))
    pairs = ck_join.stage("pairs", lambda: imagefp.video_fp_near_dup(
        fp, threshold=0.0, max_hamming=max_hamming, min_matches=1,
        max_bucket=max_bucket))
    return pairs.filter(
        (F.col("score") >= threshold) & (F.col("matches") >= min_matches))


def image_decontam_resumable(
    corpus: DataFrame,
    eval_df: DataFrame,
    ckpt_dir: str,
    max_hamming: int = 3,
    max_eval_bucket: int = 50,
    id_col: str = "id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """:func:`dcspark.imagefp.image_cross_contamination` end-to-end with
    stage checkpoints (``eval_fp`` / ``corpus_fp`` decodes, ``report`` probe
    — same shape as :func:`audio_decontam_resumable`). ``max_hamming`` and
    ``max_eval_bucket`` shape the probe, so they live in the report stage's
    signature only: sweeping them reuses both decodes. Swapping the eval
    benchmark re-decodes only the eval side (per-side lineage)."""
    from . import imagefp

    return _decontam_resumable(
        "image_decontam", corpus, eval_df, ckpt_dir,
        lambda d: imagefp.image_fingerprints(
            d, id_col=id_col, bytes_col=bytes_col),
        lambda c, e: imagefp.image_cross_contamination(
            c, e, max_hamming=max_hamming, max_eval_bucket=max_eval_bucket),
        {"max_hamming": max_hamming, "max_eval_bucket": max_eval_bucket},
        {"id_col": id_col, "bytes_col": bytes_col},
    )


def video_decontam_resumable(
    corpus: DataFrame,
    eval_df: DataFrame,
    ckpt_dir: str,
    threshold: float = 0.6,
    max_hamming: int = 3,
    max_eval_bucket: int = 50,
    id_col: str = "id",
    bytes_col: str = "bytes",
    **fp_kwargs,
) -> DataFrame:
    """:func:`dcspark.imagefp.video_cross_contamination` end-to-end with
    stage checkpoints. The report is stored with ``threshold=0.0`` and
    filtered at read time, so threshold sweeps never re-probe — the filter
    sees the stored 6-decimal-rounded score, the same 1e-6 boundary sliver
    vs the one-shot operator documented on :func:`audio_near_dup_resumable`.
    ``max_hamming`` / ``max_eval_bucket`` sit in the report-stage signature
    only; swapping the eval benchmark re-decodes only the eval side."""
    from . import imagefp

    report = _decontam_resumable(
        "video_decontam", corpus, eval_df, ckpt_dir,
        lambda d: imagefp.video_fingerprints(
            d, id_col=id_col, bytes_col=bytes_col, **fp_kwargs),
        lambda c, e: imagefp.video_cross_contamination(
            c, e, threshold=0.0, max_hamming=max_hamming,
            max_eval_bucket=max_eval_bucket),
        {"max_hamming": max_hamming, "max_eval_bucket": max_eval_bucket},
        {"id_col": id_col, "bytes_col": bytes_col,
         "fp": _require_signable(fp_kwargs)},
    )
    return report.filter(F.col("score") >= threshold)
