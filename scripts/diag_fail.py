"""Diagnose which checks fail at larger clip counts (scaling-bench failure)."""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64000
    spark = bench.build_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    clips_path, ref_path = bench.ensure_audio_data(spark, n)

    from dcspark import audio as audio_mod
    from dcspark import drift as drift_mod
    from dcspark.engine import ValidationConfig, validate
    from dcspark.spec import DataContractSpecification

    clips = spark.read.parquet(clips_path)
    ref = spark.read.parquet(ref_path)
    spec = DataContractSpecification.from_file(os.path.join(REPO, "contracts/audio_clips.yaml"))
    ref_stats = drift_mod.build_ref_stats(clips.select("dur_ms", "sr_hz"), ["dur_ms", "sr_hz"])
    cfg = ValidationConfig(
        ref_stats={"audio_clips": ref_stats},
        audio_snr_fn=audio_mod.synth_snr_oracle(bench.SEED, bench.DUR_LO, bench.DUR_HI),
    )
    result = validate(spark, spec, {"audio_clips": clips, "transcripts_ref": ref}, cfg)
    print("run_result:", result.run.result)
    for c in result.run.checks:
        if c.result not in ("passed", "info"):
            print(f"  {c.result:8s} {c.key:55s} reason={c.reason!r} diag={c.diagnostics}")
    spark.stop()


if __name__ == "__main__":
    main()
