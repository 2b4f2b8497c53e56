"""PredicateRule: arbitrary cross-column SQL boolean constraints.

The escape hatch (Deequ `satisfies`, GE conditional expectations): rows
where the expression is not TRUE are violations — NULL (unknown) does
not satisfy, like a SQL CHECK constraint. Row-local, fused into the
shared scan, JVM-only.
"""

from __future__ import annotations

import pytest

from use_case_real_time_anomaly_detection_spark.operators.compiler import compile_rules
from use_case_real_time_anomaly_detection_spark.operators.config import (
    rules_from_config,
    rules_to_config,
)
from use_case_real_time_anomaly_detection_spark.operators.rules import (
    PredicateRule,
    RangeRule,
)


def test_cross_column_conditional_and_null_semantics(spark):
    rows = [
        ("p0", "c0", "mulaw", 8000),   # satisfies (mulaw at 8 kHz)
        ("p0", "c1", "mulaw", 16000),  # violates (mulaw NOT at 8 kHz)
        ("p0", "c2", "pcm16", 16000),  # satisfies (not mulaw)
        ("p0", "c3", None, 16000),     # NULL codec -> predicate NULL -> violates
        ("p0", "c4", "mulaw", None),   # NULL sr on mulaw -> NULL -> violates
    ]
    df = spark.createDataFrame(
        rows, "partition_key string, clip_id string, codec string, sr_hz int"
    )
    rule = PredicateRule("codec <> 'mulaw' OR sr_hz = 8000")
    got = {
        r.clip_id: r.observed
        for r in compile_rules(df, [rule]).violations.collect()
    }
    assert got == {"c1": "false", "c3": "null", "c4": "null"}


def test_fused_rowlocal_plan_and_note(spark):
    rows = [("p0", "c0", "mulaw", 16000, 50)]
    df = spark.createDataFrame(
        rows,
        "partition_key string, clip_id string, codec string, sr_hz int, dur_ms int",
    )
    expr = "codec <> 'mulaw' OR sr_hz = 8000"
    plan = compile_rules(
        df, [PredicateRule(expr), RangeRule("dur_ms", 200, 2000)]
    )
    rows = plan.violations.collect()
    assert {r.detector for r in rows} == {"predicate", "out-of-range"}
    (note,) = [r.note for r in rows if r.detector == "predicate"]
    assert note == f"must satisfy: {expr}"
    phys = plan.violations._jdf.queryExecution().executedPlan().toString()
    phys = phys.split("== Initial Plan ==")[0]
    # row-local: no shuffle, no Python; both rules share one stage
    assert "Exchange" not in phys
    assert "BatchEvalPython" not in phys


def test_config_roundtrip_and_validation():
    rules = [
        PredicateRule("sr_hz * dur_ms > 0", detector="positive-extent"),
    ]
    assert rules_from_config(rules_to_config(rules)) == rules
    with pytest.raises(ValueError, match="empty expression"):
        PredicateRule("  ")
