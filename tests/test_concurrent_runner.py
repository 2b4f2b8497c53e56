"""Concurrent-runner safety: two SIMULTANEOUS runner.py processes
validating DISJOINT partition sets against the SAME checkpoint store —
the at-scale deployment shape for the reference's per-minute copy cadence
(five copy pipes writing one log concurrently; here, parallel validation
jobs sharing the violations/lineage/profile tables).

What must hold: the per-partition dynamic overwrites of the violations +
profile tables and the lineage appends must not interleave destructively
— the concurrent end state must equal the serial end state. Each Spark
job stages under a job-unique temporary directory and commits only the
partitions it wrote, so disjoint writers are commit-isolated; this test
is the executable proof."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _runner(args: list[str]) -> subprocess.Popen:
    return subprocess.Popen(
        [
            sys.executable,
            "-m",
            "use_case_real_time_anomaly_detection_spark.runner",
            *args,
        ],
        cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO},
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )


def _table_rows(spark, path: str, drop: tuple = ()) -> list[tuple]:
    df = spark.read.parquet(path)
    for c in drop:
        if c in df.columns:
            df = df.drop(c)
    cols = sorted(df.columns)
    rows = [tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect()]
    return sorted(rows)


def test_two_concurrent_runners_disjoint_partitions(spark, tmp_path):
    from pyspark.sql import functions as F

    from use_case_real_time_anomaly_detection_spark.sources.synth import (
        SynthSpec,
        frontier_of,
        generate_clips,
        generate_manifest,
    )

    spec = SynthSpec(partitions=4, clips_per_partition=120)
    clips = generate_clips(spark, spec).cache()
    generate_manifest(spark, spec).write.parquet(str(tmp_path / "manifest"))
    part = F.substring("clip_id", 1, 4)
    clips.filter(part.isin("c000", "c001")).write.parquet(str(tmp_path / "a"))
    clips.filter(part.isin("c002", "c003")).write.parquet(str(tmp_path / "b"))
    clips.unpersist()
    frontier = frontier_of(spec)

    def args(src: str, ckpt: str, run_id: str) -> list[str]:
        return [
            "--clips", str(tmp_path / src),
            "--manifest", str(tmp_path / "manifest"),
            "--checkpoint-dir", str(tmp_path / ckpt),
            "--frontier", str(frontier),
            "--no-audio", "--no-resume", "--quarantine",
            "--run-id", f"run-{run_id}",
            "--master", "local[6]",
        ]

    # concurrent: both processes live at the same time, same store
    pa = _runner(args("a", "ckpt_conc", "a"))
    pb = _runner(args("b", "ckpt_conc", "b"))
    out_a, err_a = pa.communicate(timeout=600)
    out_b, err_b = pb.communicate(timeout=600)
    assert pa.returncode == 0, err_a[-3000:]
    assert pb.returncode == 0, err_b[-3000:]

    # serial reference: same two runs, one after the other, fresh store
    for src, rid in (("a", "a"), ("b", "b")):
        p = _runner(args(src, "ckpt_serial", rid))
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-3000:]

    conc = str(tmp_path / "ckpt_conc")
    serial = str(tmp_path / "ckpt_serial")
    for table, drop in (
        ("violations", ()),
        ("lineage", ()),
        ("quarantine", ()),
        ("profile_state", ()),
    ):
        got = _table_rows(spark, f"{conc}/{table}", drop)
        want = _table_rows(spark, f"{serial}/{table}", drop)
        assert got == want, (
            f"{table}: concurrent != serial "
            f"({len(got)} vs {len(want)} rows)"
        )
    # both partition sets fully represented
    lin = spark.read.parquet(f"{conc}/lineage")
    parts = {r["partition_key"] for r in lin.select("partition_key").distinct().collect()}
    assert parts == {"c000", "c001", "c002", "c003"}
