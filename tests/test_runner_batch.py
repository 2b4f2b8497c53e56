"""runner.main() batch-mode integration: the --clips path over a
layout-written table (hive partition columns reorder/append columns —
the schema gate must accept that shape), plus the --diff-runs gate."""

import json

import pytest


def _run(capsys, argv):
    from use_case_real_time_anomaly_detection_spark import runner

    rc = runner.main(argv)
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith("{")]
    return rc, (json.loads(lines[-1]) if lines else None)


def test_runner_clips_path_over_partitioned_layout(spark, tmp_path, capsys):
    from use_case_real_time_anomaly_detection_spark.sources.synth import (
        SynthSpec,
        generate_clips,
        generate_manifest,
    )
    from use_case_real_time_anomaly_detection_spark.sources.tables import (
        ParquetCatalog,
        write_clips_layout,
    )

    spec = SynthSpec(partitions=3, clips_per_partition=80)
    cat = ParquetCatalog(spark, str(tmp_path))
    # codec becomes a hive partition column (moves last), id_bucket is an
    # extra layout column — the pre-flight schema gate must accept both
    write_clips_layout(generate_clips(spark, spec), cat, name="clips")
    generate_manifest(spark, spec).write.parquet(str(tmp_path / "manifest"))

    rc, out = _run(capsys, [
        "--clips", str(tmp_path / "clips"),
        "--manifest", str(tmp_path / "manifest"),
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--no-audio", "--quarantine", "--master", "local[8]",
    ])
    assert rc == 0
    assert out["partitions_validated"] == 3
    assert out["violations"] > 0
    # quarantine table written under the checkpoint catalog
    quar = spark.read.parquet(str(tmp_path / "ckpt" / "quarantine"))
    assert quar.count() > 0

    # a table that VIOLATES the contract aborts before any job
    bad = generate_clips(spark, spec).withColumnRenamed("dur_ms", "duration")
    bad.write.parquet(str(tmp_path / "bad_clips"))
    from use_case_real_time_anomaly_detection_spark.operators.schema import (
        SchemaMismatch,
    )

    with pytest.raises(SchemaMismatch, match="missing column 'dur_ms'"):
        _run(capsys, [
            "--clips", str(tmp_path / "bad_clips"),
            "--manifest", str(tmp_path / "manifest"),
            "--checkpoint-dir", str(tmp_path / "ckpt2"),
            "--no-audio", "--master", "local[8]",
        ])


def test_runner_diff_runs_gate(spark, tmp_path, capsys):
    """--diff-runs: rc 0 when no regressions, rc 1 with new-failure rows
    (frontier 75 keeps the stopped partition un-stale in the early run),
    rc 2 on unknown run ids."""
    base = [
        "--synth", "4x120", "--no-audio", "--no-resume",
        "--checkpoint-dir", str(tmp_path / "ckpt"), "--master", "local[8]",
    ]
    rc, _ = _run(capsys, base + ["--run-id", "early", "--frontier", "75"])
    assert rc == 0
    rc, _ = _run(capsys, base + ["--run-id", "late"])
    assert rc == 0

    rc, out = _run(capsys, [
        "--diff-runs", "early,late",
        "--checkpoint-dir", str(tmp_path / "ckpt"), "--master", "local[8]",
    ])
    assert rc == 1  # the promotion gate trips
    assert out["by_status"]["new-failure"] == 1
    assert out["new_failures"][0]["detector"] == "timeout"

    rc, _ = _run(capsys, [
        "--diff-runs", "late,late",
        "--checkpoint-dir", str(tmp_path / "ckpt"), "--master", "local[8]",
    ])
    assert rc == 0  # identical runs: nothing new fails

    rc, _ = _run(capsys, [
        "--diff-runs", "nope,late",
        "--checkpoint-dir", str(tmp_path / "ckpt"), "--master", "local[8]",
    ])
    assert rc == 2
