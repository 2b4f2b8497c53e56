"""cusum_stream: stateful streaming CUSUM (applyInPandasWithState).

Pins: flags equal a pandas replay of the recursion; a checkpoint restart
mid-stream changes nothing (state survives); the streamed flag set
equals the batch CusumRule's on the same data (cross-surface parity —
values are quantized to 0.25 so the stream's float64 recursion and the
batch rule's decimal prefix sums are BOTH exact); config-time errors.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from use_case_real_time_anomaly_detection_spark.operators.compiler import compile_rules
from use_case_real_time_anomaly_detection_spark.operators.rules import CusumRule
from use_case_real_time_anomaly_detection_spark.streaming.stateful import cusum_stream

TARGET, K, H = 100.0, 0.75, 6.0


def _rows():
    """Two sensors; sensor 1 takes a persistent +1.5 step at i=250 (the
    CUSUM case), sensor 2 stays healthy. Values quantized to 0.25 (exact
    in float64 AND decimal) so batch/stream arithmetic agree exactly."""
    rng = random.Random(13)
    rows = []
    for i in range(400):
        for sensor in (1, 2):
            v = 100.0 + 0.25 * rng.randint(-4, 4)
            if sensor == 1 and i >= 250:
                v += 1.5
            ts = (
                f"2023-11-{20 + i // 86400:02d}T"
                f"{(i % 86400) // 3600:02d}:{(i % 3600) // 60:02d}:{i % 60:02d}"
            )
            rows.append({"id": sensor, "ts": ts, "value": v})
    rows[40]["value"] = None  # NULL: S carries, never flags
    return rows


def _oracle(rows):
    """Literal recursion per sensor in ts order — (id, ts) of flags."""
    state = {}
    flags = []
    for r in sorted(rows, key=lambda r: (r["ts"], r["id"])):
        if r["value"] is None:
            continue
        su, sd = state.get(r["id"], (0.0, 0.0))
        su = max(0.0, su + (r["value"] - TARGET - K))
        sd = max(0.0, sd + (TARGET - r["value"] - K))
        state[r["id"]] = (su, sd)
        if su > H or sd > H:
            flags.append((r["id"], r["ts"]))
    return sorted(flags)


def _write_ndjson(path, rows):
    import json

    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_cusum_stream_restart_equals_oracle_and_batch(spark, tmp_path):
    rows = _rows()
    src = tmp_path / "cu_in"
    src.mkdir()
    ckpt = str(tmp_path / "cu_ckpt")
    out_dir = str(tmp_path / "cu_out")
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("ts", StringType()),
            StructField("value", StringType()),
        ]
    )

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .json(str(src))
            .selectExpr(
                "id", "to_timestamp(ts) AS ts", "try_cast(value AS double) AS value"
            )
        )
        q = (
            cusum_stream(stream, target=TARGET, k=K, h=H)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # two waves with a restart in between: state must survive in the
    # checkpointed state store (evidence accumulated in wave 1 carries)
    half = len(rows) // 2
    _write_ndjson(str(src / "a.ndjson"), rows[:half])
    run_once()
    _write_ndjson(str(src / "b.ndjson"), rows[half:])
    run_once()

    got = spark.read.parquet(out_dir)
    got_flags = sorted(
        (r.id, r.ts.strftime("%Y-%m-%dT%H:%M:%S")) for r in got.collect()
    )
    want = _oracle(rows)
    assert got_flags == want
    assert want, "the persistent shift must flag"
    assert {i for i, _ in want} == {1}, "only the shifted sensor flags"

    # cross-surface parity: the batch CusumRule over the same data (seq =
    # second-of-day, unique per sensor here) flags the same (id, ts) set
    bdf = spark.createDataFrame(
        [
            (r["id"], r["ts"], None if r["value"] is None else float(r["value"]))
            for r in _rows()
        ],
        "partition_key long, ts string, value double",
    ).withColumn("seq", F.unix_timestamp(F.to_timestamp("ts")))
    plan = compile_rules(
        bdf.withColumn("clip_id", F.col("ts")),
        [CusumRule("value", target=TARGET, k=K, h=H)],
        seq_col="seq",
    )
    batch_flags = sorted(
        (r.partition_key, r.clip_id) for r in plan.violations.collect()
    )
    assert batch_flags == want


def test_cusum_stream_config_validation(spark):
    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="h > 0"):
        cusum_stream(df, target=0.0, h=0.0)
    with pytest.raises(ValueError, match="k >= 0"):
        cusum_stream(df, target=0.0, k=-0.1)
