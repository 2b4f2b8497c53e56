"""SeasonalRule — phase-grouped baselines (seq mod period) vs a numpy
oracle, plus the contrast that motivates it: a phase-anomalous value the
pooled rolling z-score cannot see.
"""

from __future__ import annotations

import numpy as np
import pytest

from use_case_real_time_anomaly_detection_spark.operators.compiler import compile_rules
from use_case_real_time_anomaly_detection_spark.operators.rules import (
    SeasonalRule,
    ZScoreRule,
)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "partition_key string, clip_id string, seq long, value double"
    )


def _seasonal_oracle(values, period, threshold, min_count):
    """Flagged indices + per-phase (mean, std) via the rule's own exact
    op sequence (population stddev from sum/sumsq)."""
    flagged = set()
    stats = {}
    for ph in range(period):
        xs = [
            (i, v) for i, v in enumerate(values) if i % period == ph and v is not None
        ]
        n = len(xs)
        if n == 0:
            continue
        s1 = sum(v for _, v in xs)
        s2 = sum(v * v for _, v in xs)
        mean = s1 / n
        std = np.sqrt(max(s2 / n - mean * mean, 0.0))
        stats[ph] = (mean, std, n)
        if n < min_count or std <= 0:
            continue
        for i, v in xs:
            if abs((v - mean) / std) > threshold:
                flagged.add(i)
    return flagged, stats


def test_seasonal_matches_numpy_oracle(spark):
    rng = np.random.default_rng(3)
    period = 4
    base = [10.0, 50.0, 90.0, 130.0]
    values = [
        float(round(base[i % period] + rng.normal(0.0, 0.5), 2)) for i in range(200)
    ]
    values[101] = 90.0  # phase 1 (baseline 50): wildly off ITS phase
    values[57] = None  # NULLs never flag and drop out of the stats
    rows = [("p0", f"c{i:04d}", i, v) for i, v in enumerate(values)]
    rule = SeasonalRule("value", period=period, threshold=3.0, min_count=8)
    got = compile_rules(_mk(spark, rows), [rule], seq_col="seq").violations.collect()

    want, stats = _seasonal_oracle(values, period, 3.0, 8)
    assert 101 in want, "the planted phase anomaly must be in the oracle"
    assert {int(r.clip_id[1:]) for r in got} == want
    for r in got:
        i = int(r.clip_id[1:])
        mean, std, _ = stats[i % period]
        z = (values[i] - mean) / std
        assert float(r.observed) == pytest.approx(round(z, 4), abs=1e-9)
        assert f"| phase: {i % period}/{period}" in r.note
        assert r.detector == "seasonal-value"


def test_pooled_rolling_zscore_is_blind_to_the_phase_anomaly(spark):
    # same data: the pooled rolling window mixes all four phase levels,
    # so its stddev (~45) swallows a value that is >50 sigma off its own
    # phase baseline — the defect class SeasonalRule exists for
    rng = np.random.default_rng(3)
    period = 4
    base = [10.0, 50.0, 90.0, 130.0]
    values = [
        float(round(base[i % period] + rng.normal(0.0, 0.5), 2)) for i in range(200)
    ]
    values[101] = 90.0
    rows = [("p0", f"c{i:04d}", i, v) for i, v in enumerate(values)]
    df = _mk(spark, rows)

    pooled = compile_rules(
        df, [ZScoreRule("value", threshold=3.0, window=50, min_periods=10)],
        seq_col="seq",
    ).violations.collect()
    assert "c0101" not in {r.clip_id for r in pooled}

    seasonal = compile_rules(
        df, [SeasonalRule("value", period=period, threshold=3.0)], seq_col="seq"
    ).violations.collect()
    assert "c0101" in {r.clip_id for r in seasonal}


def test_min_count_and_zero_variance_guards(spark):
    # phase 0 has constant values -> std 0 -> never flags; a partition
    # with fewer than min_count rows per phase never flags either
    rows = [("p0", f"c{i}", i, 5.0) for i in range(0, 40, 2)]  # phase 0 constant
    rows += [("p0", f"d{i}", i, float(i)) for i in range(1, 8, 2)]  # phase 1: n=4
    got = compile_rules(
        _mk(spark, rows),
        [SeasonalRule("value", period=2, threshold=1.0, min_count=8)],
        seq_col="seq",
    ).violations.collect()
    assert got == []


def test_config_time_validation():
    with pytest.raises(ValueError, match="period"):
        SeasonalRule("value", period=1)


def test_stats_join_is_broadcast_and_partition_scoped(spark):
    # two partitions with different phase baselines must not bleed into
    # each other; the fence join is a broadcast (≤ partitions × period
    # rows on the build side)
    rows = [("p0", f"a{i}", i, 10.0 + (i % 2) * 80.0) for i in range(40)]
    rows += [("p1", f"b{i}", i, 500.0 + (i % 2) * 80.0) for i in range(40)]
    rows.append(("p1", "bx", 40, 10.0))  # normal for p0 phase 0, wild for p1
    rule = SeasonalRule("value", period=2, threshold=3.0, min_count=5)
    plan = compile_rules(_mk(spark, rows), [rule], seq_col="seq")
    got = plan.violations.collect()
    flagged = {r.clip_id for r in got}
    assert "bx" in flagged
    assert not {c for c in flagged if c.startswith("a")}
    phys = plan.violations._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in phys
    assert "SortMergeJoin" not in phys
