#!/usr/bin/env python
"""sf1 (10x) scale probe — the cheapest way to catch O(N^2) creep that a
plan string cannot show (candidate-pair explosion in LSH banding
parameters, verify-join fan-out, window-state growth).

1. Materializes a 10x dataset at /tmp/sf1 by KEY-SHIFTED replication of
   /root/testdata/sf0.1 (new entity ids per copy, identical per-key
   distributions — so per-key working sets stay constant and only the
   corpus size scales; payloads untouched).
2. Runs the bench headline queries at sf0.1 and sf1 with the same method
   (one untimed warmup pass, one timed pass) and flags any query whose
   time grows by more than 15x for the 10x data.
3. Scales the clip-validation job 10x (320k clips).
4. Re-runs the two blanket plan audits (no SMJ/cartesian/row-Python;
   scan budget) against the sf1 data, where bigger size estimates could
   flip broadcast joins to sort-merge.

Writes BENCH/sf1.json. Usage: python tools/sf1_probe.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1"
COPIES = 10
# key columns shifted per copy so entity ids stay globally unique while
# per-key row counts (and therefore window/group working sets) stay flat
SHIFTS = {
    # events: the reference's model is a FIXED sensor fleet with a
    # growing history, so user_id is deliberately NOT shifted — 10x
    # events per sensor, constant sensor domain (shifting it broke the
    # sensor_matrix pivot's bounded-domain contract and models the wrong
    # axis of growth). event_id stays globally unique.
    "events": {"event_id": 10**12},
    "documents": {"doc_id": 10**6},
    "embeddings": {"vec_id": 10**6},
    "lineitem": {"l_orderkey": 10**9},
    "orders": {"o_orderkey": 10**9, "o_custkey": 10**6},
    "customer": {"c_custkey": 10**6},
}
GROWTH_FLAG = 15.0


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    for table, shifts in SHIFTS.items():
        out = f"{DST}/{table}.parquet"
        if os.path.exists(out):
            continue
        base = spark.read.parquet(f"{SRC}/{table}.parquet")
        parts = []
        for k in range(COPIES):
            df = base
            for col, step in shifts.items():
                df = df.withColumn(col, F.col(col) + F.lit(k * step))
            parts.append(df)
        allc = parts[0]
        for p in parts[1:]:
            allc = allc.unionByName(p)
        # enough files that downstream scans parallelize
        allc.repartition(32).write.mode("overwrite").parquet(out)


def timed_pass(spark, qs, names, sf_dir) -> dict[str, float]:
    times = {}
    for name in names:
        t0 = time.time()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        times[name] = round(time.time() - t0, 3)
    return times


def clip_throughput(spark, partitions, clips_per) -> dict:
    from use_case_real_time_anomaly_detection_spark.plans.clips import (
        default_rules,
        validate_clips,
    )
    from use_case_real_time_anomaly_detection_spark.sources.synth import (
        SynthSpec,
        frontier_of,
        generate_clips,
        generate_manifest,
    )

    spec = SynthSpec(
        partitions=partitions, clips_per_partition=clips_per, sr_hz=8000
    )
    base = f"/tmp/bench_clips_{partitions}x{clips_per}"
    if not os.path.exists(base):
        generate_clips(spark, spec).write.mode("overwrite").parquet(f"{base}/clips")
        generate_manifest(spark, spec).write.mode("overwrite").parquet(
            f"{base}/manifest"
        )
    clips = spark.read.parquet(f"{base}/clips")
    manifest = spark.read.parquet(f"{base}/manifest")
    n = clips.count()

    def one() -> float:
        t0 = time.time()
        res = validate_clips(
            clips, manifest, frontier=frontier_of(spec),
            rules=default_rules(), persist=True,
        )
        res.violations.write.mode("overwrite").format("noop").save()
        res.verdicts.write.mode("overwrite").format("noop").save()
        res.unpersist()
        return time.time() - t0

    one()  # warmup
    secs = min(one() for _ in range(2))
    return {"clips": n, "seconds": round(secs, 2),
            "clips_per_sec": round(n / secs, 1)}


def main() -> None:
    # one session hosts 2 passes x 26 queries at 10x scale PLUS a 320k-clip
    # validation: the pinned localCheckpoint blocks of the dedup family
    # accumulate across passes, so give the probe a larger heap than the
    # 8g engine default (measured OOM at 8g on the final clip job)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

    import bench as benchmod
    from use_case_real_time_anomaly_detection_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        f"local[{cpus}]", app_name="sf1_probe",
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark)

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = benchmod.HEADLINE
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timed_pass(spark, qs, names, SRC)            # warmup @ sf0.1
    t01 = timed_pass(spark, qs, names, SRC)      # timed  @ sf0.1
    timed_pass(spark, qs, names, DST)            # warmup @ sf1
    t1 = timed_pass(spark, qs, names, DST)       # timed  @ sf1

    ratios = {
        k: (round(t1[k] / t01[k], 2) if t01[k] > 0 else None) for k in t01
    }
    flagged = {k: r for k, r in ratios.items() if r and r > GROWTH_FLAG}

    clips_small = clip_throughput(spark, 32, 1000)    # bench.py scale
    clips_big = clip_throughput(spark, 32, 10000)     # 10x

    # blanket plan audits against the 10x stats (broadcast->SMJ flips,
    # scan-count creep only show when size estimates change)
    env = {**os.environ, "SPARK_GRAFT_PLAN_SF": DST}
    audit = subprocess.run(
        [sys.executable, "-m", "pytest", "-q",
         "tests/test_plan_shapes.py::test_no_driver_query_uses_smj_cartesian_or_row_python",
         "tests/test_plan_shapes.py::test_no_driver_query_rescans_payload_columns"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=3600,
    )
    out = {
        "sf": 1.0,
        "method": "key-shifted 10x replication of sf0.1; one warmup pass "
                  "+ one timed pass per sf; growth flag at >15x per 10x data",
        "cpus": int(cpus),
        "queries_sf0.1": t01,
        "queries_sf1": t1,
        "growth_ratio": ratios,
        "flagged_gt15x": flagged,
        "clips_32x1000": clips_small,
        "clips_32x10000": clips_big,
        "clip_throughput_ratio": round(
            clips_big["clips_per_sec"] / clips_small["clips_per_sec"], 3
        ),
        "plan_audits_at_sf1": {
            "rc": audit.returncode,
            "tail": audit.stdout.strip().splitlines()[-1:],
        },
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "sf1.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
