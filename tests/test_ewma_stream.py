"""ewma_stream: stateful streaming EWMA chart (applyInPandasWithState).

Pins: flags equal a pandas replay of the exact recursion; a checkpoint
restart mid-stream changes nothing (z survives — a restart must NOT
re-center the chart at target, which would un-flag a shifted process);
the streamed flag set equals the batch EwmaRule's on the same data
(cross-surface parity — the batch truncated closed form differs from
the recursion by < (1-lam)^K·|x−target|, far inside the flag margin on
this series); config-time errors.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from use_case_real_time_anomaly_detection_spark.operators.compiler import compile_rules
from use_case_real_time_anomaly_detection_spark.operators.rules import EwmaRule
from use_case_real_time_anomaly_detection_spark.streaming.stateful import ewma_stream

TARGET, SIGMA, LAM, NSIGMA = 100.0, 1.0, 0.25, 3.0
LIMIT = NSIGMA * SIGMA * (LAM / (2.0 - LAM)) ** 0.5


def _rows():
    """Two sensors; sensor 1 takes a persistent +1.5-sigma step at i=250
    (inside any per-row fence), sensor 2 stays healthy."""
    rng = random.Random(21)
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
    rows[40]["value"] = None  # NULL: z decays toward target, never flags
    return rows


def _oracle(rows):
    """Exact recursion per sensor in ts order — (id, ts) of flags."""
    state = {}
    flags = []
    for r in sorted(rows, key=lambda r: (r["ts"], r["id"])):
        z = state.get(r["id"], TARGET)
        x = TARGET if r["value"] is None else r["value"]
        z = LAM * x + (1.0 - LAM) * z
        state[r["id"]] = z
        if r["value"] is not None and abs(z - TARGET) > LIMIT:
            flags.append((r["id"], r["ts"]))
    return sorted(flags)


def _write_ndjson(path, rows):
    import json

    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_ewma_stream_restart_equals_oracle_and_batch(spark, tmp_path):
    rows = _rows()
    src = tmp_path / "ew_in"
    src.mkdir()
    ckpt = str(tmp_path / "ew_ckpt")
    out_dir = str(tmp_path / "ew_out")
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
            ewma_stream(stream, target=TARGET, sigma=SIGMA, lam=LAM)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # two waves with a restart: z must survive in the checkpointed state
    # store — wave 2 opens mid-shift, and a re-centered chart would miss
    # the first ~1/lam rows of it
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

    # cross-surface parity: the batch EwmaRule (truncated closed form)
    # flags the same (id, ts) set on the same data
    bdf = spark.createDataFrame(
        [
            (r["id"], r["ts"], None if r["value"] is None else float(r["value"]))
            for r in _rows()
        ],
        "partition_key long, ts string, value double",
    ).withColumn("seq", F.unix_timestamp(F.to_timestamp("ts")))
    plan = compile_rules(
        bdf.withColumn("clip_id", F.col("ts")),
        [EwmaRule("value", target=TARGET, sigma=SIGMA, lam=LAM,
                  nsigma=NSIGMA, truncate=32)],
        seq_col="seq",
    )
    batch_flags = sorted(
        (r.partition_key, r.clip_id) for r in plan.violations.collect()
    )
    assert batch_flags == want


def test_ewma_stream_config_validation(spark):
    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="lam"):
        ewma_stream(df, target=0.0, sigma=1.0, lam=2.0)
    with pytest.raises(ValueError, match="sigma"):
        ewma_stream(df, target=0.0, sigma=0.0)
