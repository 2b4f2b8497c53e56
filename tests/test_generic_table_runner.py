"""Generic-table validation through the SAME runner CLI + checkpoint
machinery the clip table uses: `--key-col item_id` over the video table
with rulesets/videos.json — the engine is key-agnostic (§2.10 multimodal
mandate), so lineage/resume/quarantine work unchanged for any modality.
"""

from __future__ import annotations

import json

import pytest

from use_case_real_time_anomaly_detection_spark import runner
from use_case_real_time_anomaly_detection_spark.sources.synth import (
    SynthSpec,
    videos_pandas,
)


@pytest.fixture(scope="module")
def video_parquet(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("videos")
    path = str(d / "videos.parquet")
    spark.createDataFrame(
        videos_pandas(SynthSpec(partitions=3, clips_per_partition=90))
    ).write.mode("overwrite").parquet(path)
    return path


def _run(args, capsys):
    rc = runner.main(args)
    out = capsys.readouterr().out.strip().splitlines()
    return rc, json.loads(out[-1])


def test_runner_validates_video_table(spark, video_parquet, tmp_path, capsys):
    ckpt = str(tmp_path / "ckpt")
    rc, summary = _run(
        [
            "--clips", video_parquet,
            "--key-col", "item_id",
            "--rules", "rulesets/videos.json",
            "--checkpoint-dir", ckpt,
            "--run-id", "vid-1",
            "--quarantine",
        ],
        capsys,
    )
    assert rc == 0
    dets = set(summary["per_detector"])
    assert "video-decode" in dets and "volume" in dets and "unique" in dets
    # the planted demux defects emit violations
    assert summary["per_detector"]["video-decode"] > 0
    assert summary["violations"] > 0
    assert summary["partitions_validated"] == 3
    # quarantine carries the individually-implicated items
    from use_case_real_time_anomaly_detection_spark.sources.tables import (
        get_catalog,
    )
    from use_case_real_time_anomaly_detection_spark.streaming.checkpoint import (
        CheckpointStore,
    )

    store = CheckpointStore(get_catalog(spark, ckpt))
    quar = store.quarantine()
    ids = {r["clip_id"] for r in quar.collect()}
    assert any(i and "-0000000" in i for i in ids)
    # violations table written with the video table's keys
    viol = store.catalog.read("violations")
    assert viol.filter("detector = 'video-decode'").count() > 0


def test_runner_video_resume_skips_completed(spark, video_parquet, tmp_path, capsys):
    ckpt = str(tmp_path / "ckpt2")
    args = [
        "--clips", video_parquet,
        "--key-col", "item_id",
        "--rules", "rulesets/videos.json",
        "--checkpoint-dir", ckpt,
    ]
    rc1, s1 = _run(args + ["--run-id", "vid-a"], capsys)
    rc2, s2 = _run(args + ["--run-id", "vid-b"], capsys)
    assert rc1 == rc2 == 0
    # second run resumes: every partition already validated at the frontier
    assert s1["partitions_validated"] > 0
    assert s2["partitions_validated"] == 0


def test_runner_manifest_still_required_for_clip_key(tmp_path, capsys, video_parquet):
    rc = runner.main(
        [
            "--clips", video_parquet,
            "--checkpoint-dir", str(tmp_path / "x"),
        ]
    )
    assert rc == 2  # clip-keyed runs keep the manifest contract


def test_runner_streams_video_table(spark, tmp_path, capsys):
    """Generic-table STREAMING: video parquet files land in a dir, the
    runner validates each micro-batch through the same engine + lineage
    store (`--stream --key-col item_id`), incremental across waves."""
    land = tmp_path / "landing"
    land.mkdir()
    ckpt = str(tmp_path / "sckpt")

    full = spark.createDataFrame(
        videos_pandas(SynthSpec(partitions=3, clips_per_partition=45))
    )

    def wave(pred):
        # append into the flat landing dir: the file source tracks which
        # part files it has already consumed
        full.filter(pred).write.mode("append").parquet(str(land))

    wave("partition_key IN ('c000', 'c001')")
    args = [
        "--stream", str(land),
        "--key-col", "item_id",
        "--rules", "rulesets/videos.json",
        "--checkpoint-dir", ckpt,
    ]
    rc1, s1 = _run(args, capsys)
    assert rc1 == 0 and s1["mode"] == "stream"
    assert s1["partitions_validated"] == 2 and s1["violations"] > 0
    v1 = s1["violations"]
    # second wave: only the NEW files are validated (file-source
    # checkpoint), violations accumulate
    wave("partition_key = 'c002'")
    rc2, s2 = _run(args, capsys)
    assert rc2 == 0
    assert s2["partitions_validated"] == 3  # c000..c002 seen overall
    assert s2["violations"] > v1


def test_runner_stream_generic_requires_schema(tmp_path, capsys):
    """--stream --key-col without a schema-declaring ruleset aborts
    before any job (the file source needs a declared read schema)."""
    import json as _json

    no_schema = tmp_path / "r.json"
    no_schema.write_text(_json.dumps({"rules": [
        {"type": "not_null", "column": "codec"}]}))
    rc = runner.main([
        "--stream", str(tmp_path),
        "--key-col", "item_id",
        "--rules", str(no_schema),
        "--checkpoint-dir", str(tmp_path / "ck"),
    ])
    assert rc == 2
