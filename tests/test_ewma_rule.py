"""EwmaRule (EWMA control chart, Roberts 1959) vs the literal recursion.

The rule compiles z_t = lam*x_t + (1-lam)*z_{t-1} to a truncated closed
form — ``truncate`` lag terms over one (partition, seq, key) window,
summed in a fixed literal order (rules.EwmaRule docstring). These tests
pin:
- truncated closed form == literal recursion within the documented
  truncation bound (1-lam)^K * max|x - target| — and EXACTLY equal to a
  python twin of the truncated form itself;
- the chart's reason to exist: a sustained 1.5-sigma shift (every row
  inside a 3-sigma per-row fence) flags and KEEPS flagging, while a
  single large spike decays within a few rows;
- NULL handling (NULLs contribute `target`, never flagged themselves);
- chunked (skew-safe) evaluation == single-window evaluation;
- config round-trip + config-time validation.
"""

from __future__ import annotations

import numpy as np
import pytest

from use_case_real_time_anomaly_detection_spark.operators.compiler import compile_rules
from use_case_real_time_anomaly_detection_spark.operators.config import (
    rules_from_config,
    rules_to_config,
)
from use_case_real_time_anomaly_detection_spark.operators.rules import EwmaRule


def _ewma_exact(values, target, lam):
    """Literal recursion z_t = lam*x_t + (1-lam)*z_{t-1}, z_{-1}=target;
    None (NULL) contributes `target` (the chart's z_{-1} convention)."""
    z = target
    out = []
    for v in values:
        x = target if v is None else v
        z = lam * x + (1.0 - lam) * z
        out.append(z)
    return out


def _ewma_truncated(values, rule):
    """Python twin of the compiled expression: same coefficients, same
    left-to-right add order -> bit-identical doubles."""
    coeffs, tail = rule.weights()
    out = []
    for t in range(len(values)):
        z = 0.0
        first = True
        for k, c in enumerate(coeffs):
            v = values[t - k] if t - k >= 0 else None
            x = rule.target if v is None else v
            z = c * x if first else z + c * x
            first = False
        out.append(z + tail)
    return out


def _run(spark, values, rule, **kw):
    rows = [
        ("p0", f"c{i:04d}", i, None if v is None else float(v))
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(
        rows, "partition_key string, clip_id string, seq long, value double"
    )
    return compile_rules(df, [rule], seq_col="seq", **kw).violations.collect()


def test_ewma_matches_literal_recursion_and_python_twin(spark):
    rng = np.random.default_rng(11)
    values = [float(v) for v in rng.normal(100.0, 2.0, 300).round(3)]
    for i in range(150, 300):  # sustained +3 (1.5 sigma) shift
        values[i] = round(values[i] + 3.0, 3)
    values[40] = None
    values[10] = 130.0  # one 15-sigma transient spike

    rule = EwmaRule("value", target=100.0, sigma=2.0, lam=0.25, truncate=32)
    got = {int(r.clip_id[1:]): r for r in _run(spark, values, rule)}

    exact = _ewma_exact(values, 100.0, 0.25)
    twin = _ewma_truncated(values, rule)
    # truncation bound: (1-lam)^K * max|x - target|
    bound = 0.75**32 * max(
        abs((v if v is not None else 100.0) - 100.0) for v in values
    )
    assert max(abs(a - b) for a, b in zip(exact, twin)) <= bound

    limit = rule.limit()
    want = {
        i
        for i, v in enumerate(values)
        if v is not None and abs(twin[i] - 100.0) > limit
    }
    assert set(got) == want
    # the sustained shift signals persistently: most shifted rows flag
    assert sum(1 for i in want if i >= 150) > 120
    # the spike decays: only a handful of rows near t=10 flag
    early = [i for i in want if i < 150]
    assert all(10 <= i <= 25 for i in early) and 0 < len(early) <= 12
    # note digits come from the twin's bit-identical doubles
    for i, r in got.items():
        assert r.observed == str(round(twin[i], 4))
        assert r.note == (
            f"ewma:{round(twin[i], 4)}| target:100| "
            f"limit:{limit:.4f}| lam:0.25"
        )


def test_ewma_per_row_fence_blind_to_sustained_shift(spark):
    # every shifted row is within 3 sigma of target (shift = 1.5 sigma,
    # noise trimmed to ±1 sigma) — a RangeRule at ±3 sigma sees nothing,
    # the chart flags the shift within ~1/lam rows and holds
    rng = np.random.default_rng(13)
    noise = np.clip(rng.normal(0.0, 1.0, 200), -1.0, 1.0)
    values = [float(round(100.0 + n, 3)) for n in noise]
    for i in range(100, 200):
        values[i] = round(values[i] + 1.5, 3)
    assert all(abs(v - 100.0) < 3.0 for v in values)

    rule = EwmaRule("value", target=100.0, sigma=1.0, lam=0.25)
    got = sorted(int(r.clip_id[1:]) for r in _run(spark, values, rule))
    assert got and got[0] >= 100, "pre-shift rows must not flag"
    assert len(got) > 80, "the chart keeps signalling while shifted"


def test_ewma_nulls_contribute_target_and_never_flag(spark):
    values = [None, None, 150.0, None, 150.0, 150.0, 150.0]
    rule = EwmaRule("value", target=100.0, sigma=5.0, lam=0.5, truncate=8)
    got = {int(r.clip_id[1:]) for r in _run(spark, values, rule)}
    twin = _ewma_truncated(values, rule)
    limit = rule.limit()
    want = {
        i
        for i, v in enumerate(values)
        if v is not None and abs(twin[i] - 100.0) > limit
    }
    assert got == want
    assert 3 not in got, "NULL rows are never flagged"
    # z decays toward target across the NULL at i=3 (it contributes 100)
    assert twin[3] < twin[2]


def test_ewma_chunked_equals_single_window(spark):
    rng = np.random.default_rng(17)
    values = [float(v) for v in rng.normal(50.0, 4.0, 500).round(3)]
    for i in range(300, 500):
        values[i] = round(values[i] + 6.0, 3)
    rule = EwmaRule("value", target=50.0, sigma=4.0, lam=0.2, truncate=24)
    single = sorted(
        (r.clip_id, r.observed, r.note) for r in _run(spark, values, rule)
    )
    chunked = sorted(
        (r.clip_id, r.observed, r.note)
        for r in _run(spark, values, rule, window_chunk_size=100)
    )
    assert single == chunked and len(single) > 0


def test_ewma_config_roundtrip_and_validation(spark):
    r = EwmaRule("dur_ms", target=1000.0, sigma=130.0, lam=0.25,
                 nsigma=3.0, truncate=32)
    assert rules_from_config(rules_to_config([r])) == [r]
    with pytest.raises(ValueError, match="lam"):
        EwmaRule("v", target=0.0, sigma=1.0, lam=0.0)
    with pytest.raises(ValueError, match="lam"):
        EwmaRule("v", target=0.0, sigma=1.0, lam=1.5)
    with pytest.raises(ValueError, match="sigma"):
        EwmaRule("v", target=0.0, sigma=0.0)
    with pytest.raises(ValueError, match="truncate"):
        EwmaRule("v", target=0.0, sigma=1.0, truncate=0)
