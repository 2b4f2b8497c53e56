"""Meta-monitoring (operators/monitor.lineage_anomalies): trend
anomalies over the engine's own verdict history — z-spikes against a
noisy stationary history, step flags off a constant history, and the
float-noise regression (a perfectly flat nonzero series must NEVER
flag: cumulative avg of n identical doubles drifts in the last ulp)."""

from __future__ import annotations

import pytest

from use_case_real_time_anomaly_detection_spark.operators.monitor import (
    lineage_anomalies,
)

_SCHEMA = (
    "partition_key string, detector string, run_id string, "
    "completed_at_seq long, violation_count long, rows_checked long"
)


def _lineage(spark, series):
    rows = []
    for (pk, det, checked), counts in series.items():
        for i, vc in enumerate(counts):
            rows.append((pk, det, f"r{i:02d}", 1000 + i, vc, checked))
    return spark.createDataFrame(rows, _SCHEMA)


def test_lineage_anomalies_flags_and_silences(spark):
    lin = _lineage(
        spark,
        {
            # alternating stationary noise (|z| ≤ ~1.4) then a 10x
            # spike at run 7
            ("p0", "out-of-range", 1000): [3, 4, 3, 4, 3, 4, 3, 40],
            # all-zero steady state, first regression at run 5
            ("p1", "z-score", 1000): [0, 0, 0, 0, 0, 15],
            # partition-level flag series (rows_checked=0): step at run 4
            ("p2", "drift-dur_ms", 0): [0, 0, 0, 0, 1],
            # constant NONZERO — the ulp-drift trap; must stay silent
            ("p3", "iqr", 1000): [3, 3, 3, 3, 3, 3, 3],
            # too short for min_history
            ("p4", "timeout", 1000): [0, 9],
        },
    )
    got = {
        (r["partition_key"], r["run_id"]): r
        for r in lineage_anomalies(lin, threshold=2.0, min_history=3).collect()
    }
    assert set(got) == {("p0", "r07"), ("p1", "r05"), ("p2", "r04")}

    spike = got[("p0", "r07")]
    assert spike["kind"] == "zscore" and spike["zscore"] > 2.0
    assert spike["rate"] == 0.04

    step = got[("p1", "r05")]
    assert step["kind"] == "step" and step["zscore"] is None
    assert step["rate"] == 0.015 and step["prior_mean"] == 0.0

    flag = got[("p2", "r04")]
    assert flag["kind"] == "step" and flag["rate"] == 1.0  # 1 / max(0,1)


def test_lineage_anomalies_self_excludes_and_validates(spark):
    # the anomalous value itself must not contaminate its own baseline:
    # 3 priors all equal, 4th jumps — flagged even though including the
    # 4th in the frame would have made std huge and z small
    lin = _lineage(spark, {("p0", "d", 100): [2, 2, 2, 20]})
    rows = lineage_anomalies(lin, min_history=3).collect()
    assert [(r["run_id"], r["kind"]) for r in rows] == [("r03", "step")]

    with pytest.raises(ValueError, match=">= 1"):
        lineage_anomalies(lin, min_history=0)


def test_lineage_anomalies_accepts_real_engine_verdicts(spark):
    """Schema-compat proof: the verdicts frame the engine emits (and
    CheckpointStore appends as lineage) feeds lineage_anomalies
    directly."""
    from pyspark.sql import functions as F

    from use_case_real_time_anomaly_detection_spark.operators.engine import (
        ValidationEngine,
    )
    from use_case_real_time_anomaly_detection_spark.operators.rules import (
        NotNullRule,
    )

    df = spark.createDataFrame(
        [("a", "x"), ("b", None), ("c", "y")], "id string, t string"
    ).withColumn("partition_key", F.lit("p0")).withColumn(
        "seq", F.monotonically_increasing_id()
    )
    engine = ValidationEngine(
        key_col="id", partition_col="partition_key", seq_col="seq"
    )
    verdicts = engine.run(df, [NotNullRule(column="t")]).verdicts
    # a single run can never have enough history — empty, but runs clean
    assert lineage_anomalies(verdicts).count() == 0


def test_lineage_anomalies_dedups_reused_run_id(spark):
    """A re-recorded run (reused --run-id → duplicate lineage rows for
    the same logical run) must not contaminate its own twin's prior
    window or double-page: one observation per (series, run), worst
    recorded rate wins."""
    lin = _lineage(spark, {("p0", "d", 1000): [3, 4, 3, 4, 3, 4, 3, 40]})
    # duplicate the spike row verbatim, and add a lower-count duplicate
    dup = spark.createDataFrame(
        [
            ("p0", "d", "r07", 1007, 40, 1000),
            ("p0", "d", "r07", 1007, 5, 1000),
        ],
        _SCHEMA,
    )
    got = lineage_anomalies(lin.unionByName(dup), min_history=3).collect()
    assert [(r["run_id"], r["rate"]) for r in got] == [("r07", 0.04)]


def test_lineage_anomalies_is_latest_survives_runid_dedup(spark):
    """The page-condition flag must come from the SAME deduped frame the
    scoring uses: when a reused run-id's pessimistic dedup keeps the
    worst-rate row whose seq is NOT the raw lineage max, the flag is
    still the series' latest observation — a consumer re-deriving
    'latest' from raw lineage would drop it and fail to page."""
    lin = _lineage(spark, {("p0", "d", 1000): [3, 4, 3, 4, 3]})
    dup = spark.createDataFrame(
        [
            ("p0", "d", "r05", 1005, 40, 1000),  # worst rate, smaller seq
            ("p0", "d", "r05", 1007, 5, 1000),   # raw max seq, benign rate
        ],
        _SCHEMA,
    )
    got = lineage_anomalies(lin.unionByName(dup), min_history=3).collect()
    assert [
        (r["run_id"], r["completed_at_seq"], r["is_latest"]) for r in got
    ] == [("r05", 1005, True)]
