"""Two-parallelism-level scaling evidence for the north rule.

The rule requires throughput scaling efficiency ≥ 0.8 from N to 4N
executors on a real cluster; in this sandbox (driver instruction) the
same job runs at local[8] (N) and local[32] (4N) on the same pre-written
input, each in a FRESH subprocess/JVM, timing only the validation job
(synthesis and session startup excluded).

Writes BENCH/BASELINE.md and prints one JSON line.

Usage:
  python tools/scaling_bench.py                 # full run (synth + both levels)
  python tools/scaling_bench.py --worker N DIR  # internal: one level
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

SPEC_KW = dict(partitions=32, clips_per_partition=2000, sr_hz=8000)
DATA_DIR = "/tmp/scaling_clips_32x2000"
LEVELS = (8, 32)


def worker(cpus: int, data_dir: str) -> None:
    from use_case_real_time_anomaly_detection_spark.plans.clips import (
        default_rules,
        validate_clips,
    )
    from use_case_real_time_anomaly_detection_spark.session import get_spark
    from use_case_real_time_anomaly_detection_spark.sources.synth import (
        SynthSpec,
        frontier_of,
    )

    spark = get_spark(
        f"local[{cpus}]",
        app_name=f"scaling-{cpus}",
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    clips = spark.read.parquet(f"{data_dir}/clips")
    manifest = spark.read.parquet(f"{data_dir}/manifest")
    n = clips.count()
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    spec = SynthSpec(**SPEC_KW)
    t0 = time.time()
    res = validate_clips(
        clips, manifest, frontier=frontier_of(spec), rules=default_rules()
    )
    res.violations.write.mode("overwrite").format("noop").save()
    res.verdicts.write.mode("overwrite").format("noop").save()
    dt = time.time() - t0
    print(json.dumps({"cpus": cpus, "seconds": dt, "clips": n}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3])
        return

    if not os.path.exists(DATA_DIR):
        from use_case_real_time_anomaly_detection_spark.session import get_spark
        from use_case_real_time_anomaly_detection_spark.sources.synth import (
            SynthSpec,
            generate_clips,
            generate_manifest,
        )

        spark = get_spark(
            "local[32]", extra_confs={"spark.ui.showConsoleProgress": "false"}
        )
        spark.sparkContext.setLogLevel("ERROR")
        spec = SynthSpec(**SPEC_KW)
        generate_clips(spark, spec).write.mode("overwrite").parquet(
            f"{DATA_DIR}/clips"
        )
        generate_manifest(spark, spec).write.mode("overwrite").parquet(
            f"{DATA_DIR}/manifest"
        )
        spark.stop()

    results = {}
    for cpus in LEVELS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cpus), DATA_DIR],
            capture_output=True,
            text=True,
            cwd="/root/repo",
            timeout=1800,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)

    n = results[LEVELS[0]]["clips"]
    thr = {c: n / results[c]["seconds"] for c in LEVELS}
    eff = thr[LEVELS[1]] / (thr[LEVELS[0]] * (LEVELS[1] / LEVELS[0]))
    summary = {
        "clips": n,
        "throughput_N_clips_per_sec": round(thr[LEVELS[0]], 1),
        "throughput_4N_clips_per_sec": round(thr[LEVELS[1]], 1),
        "seconds_N": round(results[LEVELS[0]]["seconds"], 2),
        "seconds_4N": round(results[LEVELS[1]]["seconds"], 2),
        "scaling_efficiency": round(eff, 3),
        "N_cores": LEVELS[0],
        "4N_cores": LEVELS[1],
    }
    _write_report(summary)
    print(json.dumps(summary))


def _write_report(s: dict) -> None:
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — two-parallelism-level scaling evidence

North rule: throughput scaling efficiency >= 0.8 from N to 4N executors.
Sandbox evidence (per driver instruction): the identical full clip-
validation job (all detectors + audio decode/SNR + profiling rules) run
at local[{s['N_cores']}] and local[{s['4N_cores']}] on the same
pre-written parquet input, fresh JVM per level, timing the validation
job only.

| quantity | value |
|---|---|
| clips validated | {s['clips']:,} |
| wall at N = {s['N_cores']} cores | {s['seconds_N']} s |
| wall at 4N = {s['4N_cores']} cores | {s['seconds_4N']} s |
| throughput at N | {s['throughput_N_clips_per_sec']:,} clips/s |
| throughput at 4N | {s['throughput_4N_clips_per_sec']:,} clips/s |
| **scaling efficiency** thr_4N / (4 x thr_N) | **{s['scaling_efficiency']}** |

Job: fused single-scan rule evaluation (operators/compiler.py) —
row-local rules + Arrow pandas-UDF audio decode + one window pass over
(partition, seq) + broadcast IQR-fence join + unique/drift aggregates +
verdict grid. Input: 32 synthetic partitions (codec-skewed ~80% pcm16),
{s['clips']:,} clips, WAV/mu-law payloads at 8 kHz.

Spark confs: AQE on (coalescePartitions, skewJoin),
spark.sql.shuffle.partitions=32, Arrow batch 2048,
spark.sql.files.maxPartitionBytes default. The dominant cost is the
vectorized audio decode+SNR (embarrassingly parallel numpy over Arrow
batches), which is the scaling-friendly profile expected at 10^12-clip
scale where audio bytes dominate I/O and CPU.
""")


if __name__ == "__main__":
    main()
