"""FdRule (functional dependency A -> B) semantics.

Pins:
- partition scope: a determinant value mapping to >1 dependent value
  WITHIN a partition violates there and only there;
- global scope: cross-partition disagreement violates even when every
  partition is internally consistent, and EVERY partition holding the
  determinant value gets the row (the UniqueRule scope=global contract);
- NULL determinants/dependents are skipped (NotNullRule owns nulls);
- violations are partition-level: verdict fails regardless of any
  fail_threshold rate tolerance;
- config round-trip + config-time validation.
"""

from __future__ import annotations

import pytest

from use_case_real_time_anomaly_detection_spark.operators.compiler import compile_rules
from use_case_real_time_anomaly_detection_spark.operators.config import (
    rules_from_config,
    rules_to_config,
)
from use_case_real_time_anomaly_detection_spark.operators.engine import (
    ValidationEngine,
)
from use_case_real_time_anomaly_detection_spark.operators.rules import FdRule


def _df(spark):
    rows = [
        # p0: codec 'a' consistently 8000 within p0; 'b' broken in-partition
        ("p0", "c01", "a", 8000),
        ("p0", "c02", "a", 8000),
        ("p0", "c03", "b", 16000),
        ("p0", "c04", "b", 22050),
        # p1: internally consistent, but 'a' disagrees with p0's 8000
        ("p1", "c05", "a", 16000),
        ("p1", "c06", "a", 16000),
        # NULLs skipped in both directions
        ("p1", "c07", None, 44100),
        ("p1", "c08", "c", None),
        ("p1", "c09", "c", 8000),
    ]
    return spark.createDataFrame(
        rows, "partition_key string, clip_id string, codec string, sr_hz int"
    )


def _viol(spark, rule):
    plan = compile_rules(_df(spark), [rule], seq_col=None)
    return {
        (r.partition_key, r.clip_id, r.observed)
        for r in plan.violations.collect()
    }


def test_fd_partition_scope(spark):
    got = _viol(spark, FdRule(("codec",), "sr_hz", scope="partition"))
    # only p0's 'b' is broken within its partition; p0/p1 'a' are each
    # internally consistent, 'c' has one non-NULL dependent
    assert got == {("p0", "b", "2")}


def test_fd_global_scope_marks_every_holder(spark):
    got = _viol(spark, FdRule(("codec",), "sr_hz", scope="global"))
    # 'a' maps to {8000, 16000} globally -> both p0 and p1 flagged with
    # the GLOBAL count; 'b' is local to p0
    assert got == {("p0", "a", "2"), ("p1", "a", "2"), ("p0", "b", "2")}


def test_fd_is_partition_level_despite_rate_tolerance(spark):
    eng = ValidationEngine()
    res = eng.run(
        _df(spark),
        [FdRule(("codec",), "sr_hz", scope="partition")],
        run_id="fd",
        fail_threshold=0.5,  # would excuse 1 violation in 4 rows if rated
    )
    verd = {r.partition_key: r["pass"] for r in res.verdicts.collect()}
    assert verd == {"p0": False, "p1": True}


def test_fd_config_roundtrip_and_validation():
    r = FdRule(("codec", "source"), "sr_hz", scope="global")
    assert rules_from_config(rules_to_config([r])) == [r]
    with pytest.raises(ValueError, match="determinant"):
        FdRule((), "sr_hz")
    with pytest.raises(ValueError, match="cannot also"):
        FdRule(("sr_hz",), "sr_hz")
    with pytest.raises(ValueError, match="scope"):
        FdRule(("codec",), "sr_hz", scope="table")
