"""CalibratedRangeRule: time-varying bounds picked as-of per row.

A revisions table (partition_key, eff_seq, lo, hi) declares bounds
effective FROM eff_seq within a partition; every row is validated
against the revision in effect at its own seq. Compiled to one
broadcast revision-array per partition + a row-local HOF pick — the
fact table never shuffles or fans out for the rule.
"""

from __future__ import annotations

import pytest

from use_case_real_time_anomaly_detection_spark.operators.compiler import compile_rules
from use_case_real_time_anomaly_detection_spark.operators.config import (
    rules_from_config,
    rules_to_config,
)
from use_case_real_time_anomaly_detection_spark.operators.rules import (
    CalibratedRangeRule,
)

REV_SCHEMA = "partition_key string, eff_seq long, lo double, hi double"


def _facts(spark, rows):
    return spark.createDataFrame(
        rows, "partition_key string, clip_id string, seq long, dur_ms int"
    )


def _python_asof_violations(rows, revs, require_revision=False):
    """Pure-Python twin: latest revision with eff_seq <= seq wins."""
    out = {}
    for pk, cid, seq, v in rows:
        eff = max(
            (r for r in revs if r[0] == pk and r[1] <= seq),
            key=lambda r: r[1],
            default=None,
        )
        if eff is None:
            if require_revision:
                out[cid] = None  # uncalibrated
        elif v is not None and not (eff[2] <= v <= eff[3]):
            out[cid] = eff[1]  # violating, with the revision that fired
    return out


def test_asof_pick_matches_python_twin(spark):
    # two revision regimes in p0 (tightened at seq 60), one in p1,
    # none in p2; NULL value; boundary rows on both sides of eff_seq 60
    rows = [
        ("p0", "a0", 0, 30),     # rev@0 [50,2000] -> low
        ("p0", "a1", 10, 50),    # exactly lo -> ok
        ("p0", "a2", 59, 2100),  # rev@0 still -> high
        ("p0", "a3", 60, 2100),  # rev@60 [100,1500] -> high
        ("p0", "a4", 61, 80),    # rev@60 -> low
        ("p0", "a5", 70, 1500),  # exactly hi -> ok
        ("p0", "a6", 80, None),  # NULL value -> never flagged
        ("p1", "b0", 5, 10),     # rev@0 [0,100] -> ok
        ("p1", "b1", 6, 101),    # -> high
        ("p2", "c0", 0, 10**6),  # no revisions -> skipped
    ]
    revs = [
        ("p0", 0, 50.0, 2000.0),
        ("p0", 60, 100.0, 1500.0),
        ("p1", 0, 0.0, 100.0),
    ]
    df = _facts(spark, rows)
    rdf = spark.createDataFrame(revs, REV_SCHEMA)
    rule = CalibratedRangeRule("dur_ms")
    plan = compile_rules(
        df, [rule], seq_col="seq", refs={"calibration_revisions": rdf}
    )
    got = {
        r.clip_id: r for r in plan.violations.collect()
    }
    expect = _python_asof_violations(rows, revs)
    assert set(got) == set(expect)
    # note carries the bounds AND the revision that supplied them
    assert got["a2"].note == "min:50.0 max:2000.0| eff_seq:0"
    assert got["a3"].note == "min:100.0 max:1500.0| eff_seq:60"
    assert got["a0"].observed == "30"
    assert all(r.detector == "calibrated-range-dur_ms" for r in got.values())


def test_require_revision_flags_uncalibrated_rows(spark):
    rows = [
        ("p0", "a0", 5, 10),    # before first revision -> uncalibrated
        ("p0", "a1", 20, 10),   # rev@10 [0,100] -> ok
        ("p0", "a2", 21, 200),  # -> high
        ("p2", "c0", 0, 10),    # partition with no revisions at all
    ]
    revs = [("p0", 10, 0.0, 100.0)]
    df = _facts(spark, rows)
    rdf = spark.createDataFrame(revs, REV_SCHEMA)
    rule = CalibratedRangeRule("dur_ms", require_revision=True)
    plan = compile_rules(
        df, [rule], seq_col="seq", refs={"calibration_revisions": rdf}
    )
    got = {r.clip_id: r.note for r in plan.violations.collect()}
    assert got == {
        "a0": "no calibration revision in effect",
        "a2": "min:0.0 max:100.0| eff_seq:10",
        "c0": "no calibration revision in effect",
    }


def test_fact_side_never_shuffles(spark):
    """Plan shape: the rule's join is a broadcast (never SMJ/cartesian)
    and adds no Exchange on the fact side — the revision array arrives
    via broadcast, the as-of pick is row-local."""
    rows = [("p0", f"a{i}", i, 100 + i) for i in range(50)]
    revs = [("p0", 0, 0.0, 120.0), ("p0", 30, 0.0, 110.0)]
    df = _facts(spark, rows)
    rdf = spark.createDataFrame(revs, REV_SCHEMA)
    plan = compile_rules(
        df,
        [CalibratedRangeRule("dur_ms")],
        seq_col="seq",
        refs={"calibration_revisions": rdf},
    )
    txt = plan.violations._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in txt
    assert "Cartesian" not in txt
    assert "BroadcastNestedLoop" not in txt
    assert "BatchEvalPython" not in txt


def test_config_roundtrip_and_validation(spark):
    rule = CalibratedRangeRule(
        "dur_ms", revisions_table="cal", require_revision=True
    )
    assert rules_from_config(rules_to_config([rule])) == [rule]
    # unknown revisions table raises at compile time, naming the table
    df = _facts(spark, [("p0", "a0", 0, 10)])
    with pytest.raises(ValueError, match="cal"):
        compile_rules(df, [rule], seq_col="seq", refs={})
    # missing seq_col raises
    rdf = spark.createDataFrame([("p0", 0, 0.0, 1.0)], REV_SCHEMA)
    with pytest.raises(ValueError, match="seq_col"):
        compile_rules(df, [rule], refs={"cal": rdf})
    # malformed revisions table raises, naming the missing columns
    bad = spark.createDataFrame([("p0", 0)], "partition_key string, eff_seq long")
    with pytest.raises(ValueError, match="lo"):
        compile_rules(df, [rule], seq_col="seq", refs={"cal": bad})


def test_exclusion_windows_excuse_calibrated_violations(spark):
    """Row-level contract: a calibrated-range violation inside a
    declared maintenance window is excused like any other row rule."""
    rows = [
        ("p0", "a0", 5, 500),   # violating, inside window -> excused
        ("p0", "a1", 25, 500),  # violating, outside window -> flagged
    ]
    revs = [("p0", 0, 0.0, 100.0)]
    df = _facts(spark, rows)
    rdf = spark.createDataFrame(revs, REV_SCHEMA)
    win = spark.createDataFrame(
        [("p0", 0, 10)], "partition_key string, start_seq long, end_seq long"
    )
    plan = compile_rules(
        df,
        [CalibratedRangeRule("dur_ms")],
        seq_col="seq",
        refs={"calibration_revisions": rdf},
        exclusion_windows=win,
    )
    assert [r.clip_id for r in plan.violations.collect()] == ["a1"]
