"""Headline benchmark: contract-validation throughput (clips/sec, full suite).

Runs (a) the full audio-contract check suite (schema, not-null, unique, enum,
range, regex, referential, SQL quality, KS/PSI drift, audio decode-conformance
+ SNR invariant + transcript equality) over a deterministic synthetic audio
table sized to the scale factor, and (b) a set of operator queries from
``__spark_entry__`` over the driver testdata at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "clips_per_sec_full_suite", "value": N, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ..., "cpus": ..., ...}

Env knobs:
  SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
  BENCH_CLIPS          override audio-table row count

The synthetic audio table is generated once per (n, seed) into
.bench_data/ and reused — identical input across parallelism levels, which is
what the N-vs-4N scaling-efficiency protocol in BENCH/BASELINE.md requires.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SEED = 42
DUR_LO = int(os.environ.get("BENCH_DUR_LO", "200"))
DUR_HI = int(os.environ.get("BENCH_DUR_HI", "2000"))


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        # ~60 KB binary cells: the default 4096-row columnar batch is ~240 MB
        # of on-heap allocation per task batch -> humongous-object GC thrash
        # and NEGATIVE scan scaling past ~4 cores; 512 rows (~30 MB) restores
        # near-linear scaling (measured 5.6x on the bytes scan at 16 cores)
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
        # JVM<->Python-worker Arrow IPC over unix domain sockets: measurably
        # less kernel time than TCP loopback on the 15 GB payload stream
        .config("spark.python.unix.domain.socket.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # 256m splits (measured vs 64m/128m on the uncompressed payload
        # table): fewer, longer scan tasks cut per-task fixed overhead —
        # decode pass 8.1 -> 6.0s at local[32] and 75 -> 71s at local[2]
        # (128m); every input size from 64k clips up still fans out to
        # >= 32 tasks from the 32-file layout
        .config("spark.sql.files.maxPartitionBytes", "256m")
        .config("spark.driver.memory", os.environ.get("BENCH_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .appName("dcspark-bench")
        .getOrCreate()
    )


#: compact low-rate layout for the >=1M-clip scale points: pcm_u8 at 8 kHz is
#: ~7x smaller per clip than the mixed-rate s16 layout (1M clips ~9 GB vs
#: ~60 GB, which would not fit this sandbox's disk) while exercising the
#: identical 42-check suite — only the codec enum differs in the contract.
COMPACT_SR_ENUM = (8000,)
COMPACT_CODEC = "pcm_u8"


def _audio_paths(n: int, compact: bool) -> tuple[str, str]:
    base = os.path.join(REPO, ".bench_data")
    dur_tag = f"{DUR_LO}_{DUR_HI}"
    tag = "audio_compact" if compact else "audio"
    clips_path = os.path.join(base, f"{tag}_n{n}_seed{SEED}_d{dur_tag}_p32_v3")
    ref_path = os.path.join(base, f"ref_n{n}_seed{SEED}_p32_v2")
    return clips_path, ref_path


def ensure_audio_data(spark, n: int, compact: bool = False,
                      direct_write: bool = False) -> tuple[str, str]:
    """Generate (once) and cache the synthetic audio + transcript tables.

    Written with 128 output files so any parallelism level 8..128 gets full
    task fan-out from the same on-disk input. ``compact=True`` builds the
    low-rate pcm_u8/8kHz layout (same transcripts_ref — transcripts draw from
    their own rng stream, so the reference table is layout-independent).

    ``direct_write=True`` writes straight from 32 generation partitions
    instead of generating 128 then repartition(32): the repartition shuffles
    the whole payload volume through disk, which doubles the transient
    footprint — the ephemeral >=2M-clip scale point can't afford that.
    """
    from dcspark import synth

    clips_path, ref_path = _audio_paths(n, compact)
    gen_kw = ({"sr_enum": COMPACT_SR_ENUM, "force_codec": COMPACT_CODEC}
              if compact else {})
    # each table regenerates only on ITS OWN missing _SUCCESS — a missing
    # 300 KB ref table must never rmtree a valid multi-GB clips cache
    if not os.path.exists(os.path.join(ref_path, "_SUCCESS")):
        shutil.rmtree(ref_path, ignore_errors=True)
        synth.generate_transcripts_ref(
            spark, n, seed=SEED, num_partitions=32
        ).write.mode("overwrite").parquet(ref_path)
    if not os.path.exists(os.path.join(clips_path, "_SUCCESS")):
        shutil.rmtree(clips_path, ignore_errors=True)
        # 32 output files: one ~64m-split-friendly file per core slot — small
        # jobs stay at ~32 tasks instead of 150+, which was the dominant fixed
        # cost per job at high parallelism
        # uncompressed parquet for the payload table: snappy achieves 0% on
        # PCM bytes (measured 15.69 vs 15.70 GB at 256k clips) while costing
        # 39% of every payload scan in decompression CPU — the layout any
        # audio lake picks (payloads carry their own codec; generic block
        # compression on top is pure overhead)
        gen = synth.generate_audio_table(
            spark, n, seed=SEED, dur_lo=DUR_LO, dur_hi=DUR_HI,
            num_partitions=(32 if direct_write else 128), **gen_kw)
        if not direct_write:
            gen = gen.repartition(32)
        gen.write.mode("overwrite") \
            .option("compression", "uncompressed").parquet(clips_path)
    return clips_path, ref_path


def run_audio_suite(spark, clips_path: str, ref_path: str,
                    compact: bool = False) -> dict:
    """Time the full validation suite; returns seconds + clip count.

    ``compact=True`` runs the identical check suite over the low-rate layout
    (contracts/audio_clips_compact.yaml — codec enum pcm_u8, everything else
    byte-identical) with the SNR oracle pinned to the compact sr enum."""
    from dcspark import audio as audio_mod
    from dcspark import drift as drift_mod
    from dcspark.engine import ValidationConfig, validate
    from dcspark.spec import DataContractSpecification

    clips = spark.read.parquet(clips_path)
    ref = spark.read.parquet(ref_path)
    n = clips.count()  # warm-up: session + scan metadata
    ref.count()
    # untimed page-cache pre-read of the payload column: without it the first
    # timed trial measures cold disk I/O (15 GB at 256k clips) instead of the
    # engine, wasting one of the min-of-N trials (protocol: BENCH/BASELINE.md
    # excludes warm-up; the machine has 128 GiB so the working set stays hot)
    from pyspark.sql import functions as _F
    clips.select(_F.sum(_F.length("bytes"))).collect()

    sr_enum = COMPACT_SR_ENUM if compact else None
    snr_fn = audio_mod.synth_snr_oracle(SEED, DUR_LO, DUR_HI, sr_enum=sr_enum)
    contract = ("contracts/audio_clips_compact.yaml" if compact
                else "contracts/audio_clips.yaml")

    # warm-up (excluded from timing, see BENCH/BASELINE.md protocol): spin up
    # the Python UDF workers and JIT/codegen paths on a small sample
    sample = clips.limit(256)
    audio_mod.audio_decode_report(sample, snr_fn=snr_fn).count()

    spec = DataContractSpecification.from_file(os.path.join(REPO, contract))

    t_ref0 = time.perf_counter()
    ref_stats = drift_mod.build_ref_stats(
        clips.select("dur_ms", "sr_hz"), ["dur_ms", "sr_hz"]
    )
    t_ref = time.perf_counter() - t_ref0

    cfg = ValidationConfig(
        ref_stats={"audio_clips": ref_stats},
        audio_snr_fn=snr_fn,
    )
    # BENCH_PARALLEL_JOBS=1 serializes the compute-phase jobs so the phases
    # dict becomes an ADDITIVE per-phase breakdown (under the default
    # concurrent pool every job's wall ~= the phase wall, because they all
    # contend for the same task slots); used for the appendix profile only
    pj = os.environ.get("BENCH_PARALLEL_JOBS")
    if pj:
        cfg.parallel_jobs = int(pj)
    dt = None
    trials = int(os.environ.get("BENCH_TRIALS", "3"))
    for _trial in range(trials):  # min of N: the sandbox has noisy-neighbor CPU
        t0 = time.perf_counter()
        result = validate(spark, spec, {"audio_clips": clips, "transcripts_ref": ref}, cfg)
        dt = min(dt, time.perf_counter() - t0) if dt else time.perf_counter() - t0
    return {
        "clips": n,
        "suite_sec": dt,
        "ref_stats_sec": t_ref,
        "clips_per_sec": n / dt,
        "run_result": result.run.result,
        "checks": len(result.run.checks),
        # per-job walls from the LAST trial (jobs overlap via the driver
        # thread pool, so labels sum past compute_phase_wall by design)
        "phases": result.phase_timings.get("audio_clips", {}),
    }


OPERATOR_QUERIES = [
    "shared_multiagg_pass",
    "field_required_missing_counts",
    "field_unique_duplicates",
    "referential_integrity_counts",
    "violation_rows_capped",
    "nested_field_checks",
    "drift_psi",
    "drift_categorical_psi",
    "drift_ks",
    "dedup_exact",
    "text_quality_scores",
    "gopher_repetition_flags",
    "duplicate_span_coverage",
    "c4_page_filter",
    "token_census",
    "minhash_lsh_near_dup",
    "near_dup_clusters",
    "simhash_fingerprints",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_near_dup",
    "semantic_dedup",
    "bpe_token_stats",
    "contract_filter_split",
    "pii_mask",
    "benchmark_decontam",
    "contract_suggest",
    "contract_repair",
    "split_sample_assign",
    "weighted_sample",
    "winnowing_fingerprints",
    "array_element_checks",
    "quality_metric_checks",
    "quantile_sketch_stats",
    "tdigest_quantiles",
    "audio_fp_near_dup",
    "audio_decontam",
    "audio_semantic_dedup",
    "audio_loudness_drift",
    "audio_multicodec_conformance",
    "audio_transcode_normalize",
    "audio_vad_segments",
    "audio_chunk_windows",
    "audio_spectral_quality",
    "audio_logmel_features",
    "audio_augment_variants",
    "asr_wer_report",
    "video_mjpeg_frames",
    "image_dhash_near_dup",
    "image_decode_contract",
    "image_family_contract",
    "image_hash_block_join",
    "audio_fp_join",
    "audio_fp_decontam_join",
    "video_fp_join",
    "image_decontam",
    "video_decode_contract",
    "video_mp4_header_contract",
    "video_webm_header_contract",
    "audio_container_census",
    "video_near_dup",
    "group_threshold_checks",
    "metric_change_alerts",
    "table_reconcile",
    "composite_key_checks",
    "filtered_checks",
]


def run_operator_queries(spark, sf_dir: str) -> dict:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out = {}
    for name in OPERATOR_QUERIES:
        times = []
        # min of 2 (first run pays JIT/codegen warm-up), plus up to 2 extra
        # trials while the two fastest disagree >1.4x — host-level CPU steal
        # on this sandbox can slow BOTH fixed trials (observed a 6x outlier
        # with a clean same-session re-run), and the driver's per-round BENCH
        # comparison treats these numbers as signal
        while len(times) < 2 or (
            len(times) < 4 and sorted(times)[1] > 1.4 * sorted(times)[0]
        ):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            times.append(time.perf_counter() - t0)
        out[name] = round(min(times), 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tag = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(tag.replace("sf", ""))
    except ValueError:
        sf = 0.1
    # sized so per-clip decode work dominates fixed job overhead: 256k clips
    # (~15 GB WAV) at sf0.1 — the same input the N-vs-4N scaling protocol uses,
    # so the headline clips/sec is comparable to BENCH/BASELINE.md per-clip
    # cost instead of understating the engine ~4x on job-overhead-bound small
    # inputs (VERDICT r01). Generated once and cached in .bench_data.
    n_clips = int(os.environ.get("BENCH_CLIPS", str(max(400, int(2560000 * sf)))))

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    clips_path, ref_path = ensure_audio_data(spark, n_clips)
    audio = run_audio_suite(spark, clips_path, ref_path)
    if os.environ.get("BENCH_SKIP_OPERATORS"):
        queries = {}
    else:
        queries = run_operator_queries(spark, sf_dir)
    queries["audio_full_suite"] = round(audio["suite_sec"], 3)

    # multi-scale evidence (VERDICT r02 next #6): the same suite at extra
    # clip counts shows per-clip cost flattening as fixed job overhead
    # amortizes — the evidence that the headline number extrapolates.
    # Default points 64k + 512k around the 256k headline; 1M clips (~60 GB
    # WAV) would exceed this sandbox's free disk, and 512k already sits on
    # the flat part of the curve. BENCH_SCALE_POINTS="" disables.
    scale_points = {str(audio["clips"]): {
        "suite_sec": round(audio["suite_sec"], 3),
        "clips_per_sec": round(audio["clips_per_sec"], 2),
        "per_clip_ms": round(1000.0 * audio["suite_sec"] / audio["clips"], 4),
    }}
    pts = os.environ.get("BENCH_SCALE_POINTS", "64000,512000")
    for p in [int(x) for x in pts.split(",") if x.strip()]:
        if p == audio["clips"]:
            continue
        cp, rp = ensure_audio_data(spark, p)
        extra = run_audio_suite(spark, cp, rp)
        scale_points[str(p)] = {
            "suite_sec": round(extra["suite_sec"], 3),
            "clips_per_sec": round(extra["clips_per_sec"], 2),
            "per_clip_ms": round(1000.0 * extra["suite_sec"] / extra["clips"], 4),
        }

    # compact-layout curve (VERDICT r03 next #8): the >=1M-clip points the
    # s16 layout cannot fit on this sandbox's disk. pcm_u8 @ 8 kHz, identical
    # 42-check suite; the flattening 512k -> 1M -> 2M per-clip cost is the
    # evidence the engine's fixed overhead keeps amortizing past the s16
    # curve's top. Points >= _EPHEMERAL_MIN run generate-validate-delete
    # (VERDICT r04 next #7): the 1M (~9 GB) and 2M (~17 GB) tables do not
    # both fit the cache alongside the other layouts on this disk, so each
    # is written straight from the generation partitions (no repartition
    # shuffle = no 2x transient disk), measured, and deleted before the next
    # point; a point that cannot fit the free disk at all is skipped LOUDLY
    # on stderr, never silently.
    scale_points_compact = {}
    cpts = os.environ.get("BENCH_COMPACT_POINTS", "512000,1000000,2000000")
    _EPHEMERAL_MIN = 750_000
    _COMPACT_BYTES_PER_CLIP = 9000  # measured: 8.4 GB / 1M clips + margin
    for p in [int(x) for x in cpts.split(",") if x.strip()]:
        cp_path, _rp = _audio_paths(p, compact=True)
        pre_cached = os.path.exists(os.path.join(cp_path, "_SUCCESS"))
        ephemeral = (not pre_cached) and p >= _EPHEMERAL_MIN
        if ephemeral:
            need = int(p * _COMPACT_BYTES_PER_CLIP * 1.15)
            free = shutil.disk_usage(REPO).free
            if free < need:
                print(f"# compact point {p} skipped: needs ~{need >> 30} GiB, "
                      f"{free >> 30} GiB free", file=sys.stderr)
                continue
        try:
            cp, rp = ensure_audio_data(spark, p, compact=True,
                                       direct_write=ephemeral)
            extra = run_audio_suite(spark, cp, rp, compact=True)
            scale_points_compact[str(p)] = {
                "suite_sec": round(extra["suite_sec"], 3),
                "clips_per_sec": round(extra["clips_per_sec"], 2),
                "per_clip_ms": round(1000.0 * extra["suite_sec"] / extra["clips"], 4),
                # the enum itself: json.dumps renders the str-enum's VALUE
                # ("passed"), matching the top-level run_result field — str()
                # would emit "ResultEnum.passed" on 3.11+
                "run_result": extra["run_result"],
                "ephemeral": ephemeral,
            }
        finally:
            # delete even when the suite raises or the point partially
            # generated: an abandoned 9-17 GB table with _SUCCESS would be
            # misread as a durable cache on the next run and permanently
            # consume the 2M point's disk headroom
            if ephemeral:
                shutil.rmtree(cp_path, ignore_errors=True)

    total = sum(queries.values())
    print(json.dumps({
        "metric": "clips_per_sec_full_suite",
        "value": round(audio["clips_per_sec"], 2),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "clips": audio["clips"],
        "audio_suite_sec": round(audio["suite_sec"], 3),
        "phases": audio.get("phases", {}),
        "scale_points": scale_points,
        "scale_points_compact": scale_points_compact,
        "total_sec": round(total, 3),
        "run_result": audio["run_result"],
        "checks": audio["checks"],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
