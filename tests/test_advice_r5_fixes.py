"""Regression tests for the round-5 advice fixes.

1. drift_scores on an all-NULL column must return the FULL result schema
   (partition_key, psi, ks, w1) so a DriftRule with w1_threshold set
   degrades to zero violations instead of an UNRESOLVED_COLUMN crash.
2. Two MonotonicRules on the same column (strict + non-strict, or both
   directions) must compile without duplicate __prev_mono_<col> columns.
3. SeasonalRule defaults its detector to seasonal-<column> like the
   other column-suffixed families, so two SeasonalRules on different
   columns yield distinguishable violation rows.
"""

from __future__ import annotations

import pytest

from use_case_real_time_anomaly_detection_spark.functions.stats import drift_scores
from use_case_real_time_anomaly_detection_spark.operators.compiler import compile_rules
from use_case_real_time_anomaly_detection_spark.operators.rules import (
    DriftRule,
    MonotonicRule,
    SeasonalRule,
    ZScoreRule,
)


def _mk(spark, rows, schema="partition_key string, clip_id string, seq long, value double"):
    return spark.createDataFrame(rows, schema)


def test_drift_scores_all_null_column_keeps_w1_schema(spark):
    df = spark.createDataFrame(
        [("p0", "a0", None), ("p1", "b0", None)],
        "partition_key string, clip_id string, dur double",
    )
    out = drift_scores(df, "dur", partition_col="partition_key")
    assert out.columns == ["partition_key", "psi", "ks", "w1"]
    assert out.count() == 0


def test_drift_rule_with_w1_fence_on_all_null_column_degrades_to_zero(spark):
    # pre-fix: AnalysisException UNRESOLVED_COLUMN `w1` in _drift_violations
    df = spark.createDataFrame(
        [("p0", "a0", 0, None), ("p0", "a1", 1, None), ("p1", "b0", 0, None)],
        "partition_key string, clip_id string, seq long, value double",
    )
    plan = compile_rules(
        df,
        [DriftRule("value", psi_threshold=0.25, ks_threshold=0.3, w1_threshold=1.0)],
        seq_col="seq",
    )
    assert plan.violations.count() == 0


def test_two_monotonic_rules_same_column_share_one_lag(spark):
    # strict + non-strict on the same column: pre-fix this emitted two
    # __prev_mono_value columns and the projection read was ambiguous
    rows = [
        ("p0", "a0", 0, 5.0),
        ("p0", "a1", 1, 5.0),  # tie: strict violation only
        ("p0", "a2", 2, 4.0),  # drop: both violate
    ]
    plan = compile_rules(
        _mk(spark, rows),
        [
            MonotonicRule("value", detector="mono-loose"),
            MonotonicRule("value", strict=True, detector="mono-strict"),
        ],
        seq_col="seq",
    )
    got = {(r.detector, r.clip_id) for r in plan.violations.collect()}
    assert got == {
        ("mono-strict", "a1"),
        ("mono-strict", "a2"),
        ("mono-loose", "a2"),
    }


def test_two_zscore_rules_same_column_different_windows(spark):
    # window size is part of the helper-column identity: two ZScoreRules
    # on one column with different windows must keep distinct frames
    # noisy far history, tight recent plateau, then a small jump: the
    # 4-row window sees a huge z (std~0.7), the 8-row window a tiny one
    # (std~35) — so the two frames MUST stay distinct for a8 to flag
    # under z-short only
    rows = [("p0", f"a{i}", i, float(v)) for i, v in enumerate(
        [0, 100, 0, 100, 50, 51, 49, 50, 56]
    )]
    plan = compile_rules(
        _mk(spark, rows),
        [
            ZScoreRule("value", threshold=3.0, window=4, min_periods=3,
                       detector="z-short"),
            ZScoreRule("value", threshold=3.0, window=8, min_periods=3,
                       detector="z-long"),
        ],
        seq_col="seq",
    )
    got = {(r.detector, r.clip_id) for r in plan.violations.collect()}
    assert ("z-short", "a8") in got
    assert ("z-long", "a8") not in got


def test_seasonal_rule_detector_defaults_to_column_suffixed(spark):
    r = SeasonalRule("dur_ms", period=4)
    assert r.detector == "seasonal-dur_ms"
    r2 = SeasonalRule("sr_hz", period=4)
    assert r2.detector == "seasonal-sr_hz"
    # explicit override still wins
    r3 = SeasonalRule("dur_ms", period=4, detector="my-seasonal")
    assert r3.detector == "my-seasonal"
