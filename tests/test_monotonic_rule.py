"""MonotonicRule — ordering contract along the sequence axis.

The delivery-order check the reference assumes implicitly (its lag-based
detectors are only meaningful because timestamps advance per sensor —
tinybird/pipes/rate_of_change.pipe:31-34); here the assumption is a
declared, checkable rule that rides the same (partition, seq) window
shuffle as the other sequence rules.
"""

from __future__ import annotations

import pytest

from use_case_real_time_anomaly_detection_spark.operators.compiler import compile_rules
from use_case_real_time_anomaly_detection_spark.operators.rules import (
    MonotonicRule,
    RateOfChangeRule,
)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "partition_key string, clip_id string, seq long, value double"
    )


def test_monotonic_flags_regressions_and_respects_partitions(spark):
    rows = [
        # p0: 10, 20, 15 (drop -> violation at seq 2), 25
        ("p0", "a0", 0, 10.0),
        ("p0", "a1", 1, 20.0),
        ("p0", "a2", 2, 15.0),
        ("p0", "a3", 3, 25.0),
        # p1 restarts low — first row never flags (no predecessor)
        ("p1", "b0", 0, 1.0),
        ("p1", "b1", 1, 1.0),  # tie: fine when strict=False
    ]
    plan = compile_rules(
        _mk(spark, rows), [MonotonicRule("value")], seq_col="seq"
    )
    got = plan.violations.collect()
    assert {(r.partition_key, r.clip_id) for r in got} == {("p0", "a2")}
    (v,) = got
    assert v.detector == "monotonic-value"
    assert v.observed == "15.0"
    assert v.note == "prev:20.0 -> value:15.0 violates increasing value"
    assert "monotonic-value" in plan.detectors
    assert "monotonic-value" not in plan.partition_level  # row-level


def test_strict_flags_ties_and_decreasing_direction(spark):
    rows = [
        ("p0", "a0", 0, 5.0),
        ("p0", "a1", 1, 5.0),  # tie -> strict violation
        ("p0", "a2", 2, 6.0),
    ]
    got = compile_rules(
        _mk(spark, rows),
        [MonotonicRule("value", strict=True)],
        seq_col="seq",
    ).violations.collect()
    assert {r.clip_id for r in got} == {"a1"}
    assert "strictly increasing" in got[0].note

    rows = [
        ("p0", "a0", 0, 9.0),
        ("p0", "a1", 1, 7.0),
        ("p0", "a2", 2, 8.0),  # rise against decreasing -> violation
    ]
    got = compile_rules(
        _mk(spark, rows),
        [MonotonicRule("value", direction="decreasing")],
        seq_col="seq",
    ).violations.collect()
    assert {r.clip_id for r in got} == {"a2"}


def test_strict_on_seq_axis_flags_duplicate_positions(spark):
    # the seq column itself: strict monotonicity flags duplicated
    # sequence positions (replayed delivery) — tied rows carry the same
    # values so the violation row is deterministic under either tie order
    rows = [
        ("p0", "a1", 1, 1.0),
        ("p0", "a2", 2, 2.0),
        ("p0", "a2b", 2, 2.5),  # duplicate position
        ("p0", "a3", 3, 3.0),
    ]
    got = compile_rules(
        _mk(spark, rows),
        [MonotonicRule("seq", strict=True)],
        seq_col="seq",
    ).violations.collect()
    assert len(got) == 1
    assert got[0].observed == "2"
    assert got[0].note == "prev:2 -> value:2 violates strictly increasing seq"


def test_nulls_never_flag(spark):
    rows = [
        ("p0", "a0", 0, 10.0),
        ("p0", "a1", 1, None),  # NULL value: not a regression
        ("p0", "a2", 2, 11.0),  # prev is NULL -> cond NULL -> dropped
    ]
    got = compile_rules(
        _mk(spark, rows), [MonotonicRule("value")], seq_col="seq"
    ).violations.collect()
    assert got == []


def test_invalid_direction_raises_at_config_time():
    with pytest.raises(ValueError, match="direction"):
        MonotonicRule("value", direction="sideways")


def test_shares_window_exchange_with_other_sequence_rules(spark):
    # one Window exec, one exchange: the monotonic lag column lands in
    # the SAME WindowSpec as rate-of-change's (no second sort/shuffle)
    rows = [("p0", f"c{i}", i, float(i)) for i in range(10)]
    plan = compile_rules(
        _mk(spark, rows),
        [MonotonicRule("value"), RateOfChangeRule("value", max_slope=100.0)],
        seq_col="seq",
    )
    phys = plan.violations._jdf.queryExecution().executedPlan().toString()
    n_window = sum(
        1
        for ln in phys.splitlines()
        if ln.lstrip("+- *( )0123456789").startswith("Window")
    )
    assert n_window == 1, phys
