"""Streaming copy-cycle + checkpoint/resume contracts (SURVEY.md §5.2.4)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from use_case_real_time_anomaly_detection_spark.plans import detectors as D
from use_case_real_time_anomaly_detection_spark.sources.ingest import (
    read_ndjson_batch,
    read_ndjson_stream,
)
from use_case_real_time_anomaly_detection_spark.sources.synth import (
    SynthSpec,
    frontier_of,
    generate_clips,
    generate_manifest,
)
from use_case_real_time_anomaly_detection_spark.sources.tables import ParquetCatalog
from use_case_real_time_anomaly_detection_spark.streaming.checkpoint import (
    CheckpointStore,
    run_with_resume,
)
from use_case_real_time_anomaly_detection_spark.streaming.pipeline import stream_violations

SPEC = SynthSpec(partitions=4, clips_per_partition=120)


def _write_ndjson(path: str, rows: list[dict]) -> None:
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_ndjson_ingest_schema_coercion(spark, tmp_path):
    # the reference's sample event: value arrives as a STRING
    # (config/sample_report.json:1) and the declared schema coerces it
    p = str(tmp_path / "events.ndjson")
    _write_ndjson(
        p,
        [
            {"timestamp": "2023-11-03T20:38:59.754", "id": 1, "value": "677.88"},
            {"timestamp": "2023-11-03T20:39:00.754", "id": "2", "value": 12.5},
            {"timestamp": "not-a-time", "id": "x", "value": "nan?"},
        ],
    )
    got = read_ndjson_batch(spark, p).orderBy("id").collect()
    assert [r["id"] for r in got] == [None, 1, 2]
    assert got[1]["value"] == pytest.approx(677.88, abs=1e-2)
    assert got[1]["ts"] is not None
    assert got[0]["ts"] is None  # malformed row survives as NULLs


def test_streaming_copy_cycle_matches_batch(spark, tmp_path):
    """foreachBatch cycle output == batch violations_log on same data."""
    src = tmp_path / "stream_in"
    src.mkdir()
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = [
        {
            "timestamp": r["ts"].isoformat(),
            "id": int(r["user_id"]),
            "value": str(r["value"]),
        }
        for r in ev.limit(2000).collect()
    ]
    _write_ndjson(str(src / "batch0.ndjson"), rows)

    collected = []

    def sink(df):
        collected.extend(df.collect())

    stream = read_ndjson_stream(spark, str(src))
    q = stream_violations(
        stream,
        sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)

    assert len(collected) > 0
    types = {r["anomaly_type"] for r in collected}
    assert types <= {
        "out-of-range", "rate-of-change", "timeout", "z-score", "interquartile-range",
    }


def test_resume_skips_completed_partitions(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path / "warehouse"))
    store = CheckpointStore(cat)
    clips = generate_clips(spark, SPEC)
    manifest = generate_manifest(spark, SPEC)
    fr = frontier_of(SPEC)

    r1 = run_with_resume(spark, clips, manifest, store, frontier=fr)
    v1 = store.violations().count()
    assert v1 > 0
    n_parts_run1 = r1.verdicts.select("partition_key").distinct().count()
    assert n_parts_run1 == SPEC.partitions

    # second run: everything already complete → zero partitions validated
    r2 = run_with_resume(spark, clips, manifest, store, frontier=fr)
    assert r2.verdicts.count() == 0
    # violations table unchanged (idempotent)
    assert store.violations().count() == v1

    # a HIGHER frontier invalidates completion → full re-run
    r3 = run_with_resume(spark, clips, manifest, store, frontier=fr + 10)
    assert r3.verdicts.select("partition_key").distinct().count() == SPEC.partitions
