"""CusumRule (Page's CUSUM change-point detector) vs the literal recursion.

The rule compiles the sequential recursion S_t = max(0, S_{t-1} + y_t) to
its closed form S_t = P_t - min(0, min_{j<=t} P_j) — two window layers
over one shuffle. These tests pin:
- closed form == literal recursion (numpy oracle), incl. NULL handling;
- the detector's reason to exist: a persistent SMALL shift every per-row
  fence is blind to accumulates and flags, while a transient spike decays;
- two-sided (downward) detection;
- config round-trip + config-time validation;
- plan shape: CUSUM shares the sequence rules' single shuffle.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from use_case_real_time_anomaly_detection_spark.operators.compiler import compile_rules
from use_case_real_time_anomaly_detection_spark.operators.config import (
    rules_from_config,
    rules_to_config,
)
from use_case_real_time_anomaly_detection_spark.operators.rules import (
    CusumRule,
    ZScoreRule,
)


def _cusum_oracle(values, target, k, h):
    """Literal Page recursion over the sequence (None = NULL: S carries,
    row never flagged). Returns (flagged indices, S+ path, S- path)."""
    su = sd = 0.0
    flagged = set()
    sus, sds = [], []
    for i, v in enumerate(values):
        if v is not None:
            su = max(0.0, su + (v - target - k))
            sd = max(0.0, sd + (target - v - k))
            if su > h or sd > h:
                flagged.add(i)
        sus.append(su)
        sds.append(sd)
    return flagged, sus, sds


def _run(spark, values, rule):
    rows = [
        ("p0", f"c{i:04d}", i, None if v is None else float(v))
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(
        rows, "partition_key string, clip_id string, seq long, value double"
    )
    return compile_rules(df, [rule], seq_col="seq").violations.collect()


def test_cusum_matches_literal_recursion(spark):
    rng = np.random.default_rng(5)
    values = [float(v) for v in rng.uniform(99.0, 101.0, 300).round(2)]
    for i in range(150, 300):  # persistent +1.5 shift from t=150
        values[i] = round(values[i] + 1.5, 2)
    values[40] = None  # NULL: S carries across, row never flagged
    # one sub-threshold transient spike: S jumps to ~9 < h then decays
    # ~1/step — never flags, unlike a per-row fence which would
    values[10] = 110.0

    rule = CusumRule("value", target=100.0, k=1.0, h=12.0)
    got = _run(spark, values, rule)
    want, sus, sds = _cusum_oracle(values, 100.0, 1.0, 12.0)

    assert {int(r.clip_id[1:]) for r in got} == want
    assert want and min(want) >= 150, "only the sustained shift may flag"
    for r in got:
        i = int(r.clip_id[1:])
        assert r.detector == "cusum"
        assert r.observed == (
            f"cusum_hi:{round(sus[i], 2)}| cusum_lo:{round(sds[i], 2)}"
        )
        assert r.note == "target:100| k:1| h:12"


def test_cusum_flags_small_shift_where_zscore_is_blind(spark):
    # +1.2 shift on a ±1-noise series: every row is inside any sane
    # per-row fence (rolling |z| stays ~1), but the evidence accumulates.
    rng = np.random.default_rng(9)
    values = [float(v) for v in rng.uniform(-1.0, 1.0, 400).round(3)]
    for i in range(200, 400):
        values[i] = round(values[i] + 1.2, 3)

    cusum = CusumRule("value", target=0.0, k=0.6, h=8.0)
    z = ZScoreRule("value", threshold=3.0, window=50, min_periods=10)
    rows = [("p0", f"c{i:04d}", i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(
        rows, "partition_key string, clip_id string, seq long, value double"
    )
    got = compile_rules(df, [cusum, z], seq_col="seq").violations.collect()

    cusum_hits = {int(r.clip_id[1:]) for r in got if r.detector == "cusum"}
    z_hits = {int(r.clip_id[1:]) for r in got if r.detector == "z-score"}
    want, _, _ = _cusum_oracle(values, 0.0, 0.6, 8.0)
    assert cusum_hits == want
    assert cusum_hits and min(cusum_hits) >= 200
    # the rolling z-score fence never sees the shift onset as outliers
    # at scale (a couple of boundary rows at most)
    assert len(z_hits) < len(cusum_hits) / 10


def test_cusum_two_sided_and_one_sided(spark):
    values = [100.0] * 20 + [95.0] * 30  # downward shift
    two = _run(spark, values, CusumRule("value", target=100.0, k=2.0, h=20.0))
    assert two and all("cusum_lo:" in r.observed for r in two)
    # y⁻ = +3 per shifted row → S⁻ = 3·j crosses h=20 at the 7th
    # shifted row (index 26, S⁻ = 21)
    assert {int(r.clip_id[1:]) for r in two} == set(range(26, 50))
    one = _run(
        spark,
        values,
        CusumRule("value", target=100.0, k=2.0, h=20.0, two_sided=False),
    )
    assert one == []


def test_cusum_tie_break_and_decimal_exactness(spark):
    # duplicate seq rows: total order via (seq, clip_id); decimal sums are
    # exact so the boundary row (S == h exactly → not flagged, S > h →
    # flagged) can't wobble with partitioning
    rows = [
        ("p0", "c0000", 0, 101.0),
        ("p0", "c0001", 1, 101.0),
        ("p0", "c0001x", 1, 101.0),  # tie on seq
        ("p0", "c0002", 2, 101.0),
    ]
    df = spark.createDataFrame(
        rows, "partition_key string, clip_id string, seq long, value double"
    )
    # y = +1 per row → S hits exactly 3.0 at the 3rd row: 3.0 > 3.0 is
    # False (exact), so only the 4th row flags
    got = compile_rules(
        df, [CusumRule("value", target=100.0, k=0.0, h=3.0)], seq_col="seq"
    ).violations.collect()
    assert [r.clip_id for r in got] == ["c0002"]


def test_cusum_chunked_equals_single_window(spark):
    """The two-level prefix decomposition (window_chunk_size set) must
    reproduce the single-window plan EXACTLY — same rows, same digits —
    at any chunk size, including chunks smaller than drift runs, seq
    gaps wider than a chunk, NULL values, and seq ties."""
    rng = np.random.default_rng(21)
    rows = []
    for p in ("p0", "p1"):
        vals = rng.uniform(95.0, 105.0, 500).round(2)
        if p == "p1":
            vals[200:] += 2.0  # persistent shift in one partition
        seq = 0
        for i, v in enumerate(vals):
            seq += int(rng.integers(1, 4))  # gaps of 1-3
            if i == 300:
                seq += 400  # a gap wider than any chunk below
            rows.append((p, f"c{i:04d}", seq, float(v)))
            if i == 100:  # seq tie (duplicate row id differs)
                rows.append((p, f"c{i:04d}x", seq, float(v)))
    rows[50] = (rows[50][0], rows[50][1], rows[50][2], None)  # NULL value
    df = spark.createDataFrame(
        rows, "partition_key string, clip_id string, seq long, value double"
    )
    rule = CusumRule("value", target=100.0, k=1.0, h=15.0)

    def run(chunk):
        got = compile_rules(
            df, [rule], seq_col="seq", window_chunk_size=chunk
        ).violations.collect()
        return sorted((r.clip_id, r.observed) for r in got)

    want = run(None)
    assert want, "the shift must flag"
    for chunk in (7, 64, 100_000):
        assert run(chunk) == want, f"chunk_size={chunk} diverges"


def test_cusum_config_roundtrip_and_validation(spark):
    rules = [CusumRule("dur_ms", target=1000.0, k=150.0, h=2500.0)]
    assert rules_from_config(rules_to_config(rules)) == rules
    with pytest.raises(ValueError, match="h > 0"):
        CusumRule("v", target=0.0, h=0.0)
    with pytest.raises(ValueError, match="k >= 0"):
        CusumRule("v", target=0.0, k=-1.0)


def test_cusum_shares_the_sequence_shuffle(spark):
    rows = [("p0", f"c{i:04d}", i, float(i)) for i in range(50)]
    df = spark.createDataFrame(
        rows, "partition_key string, clip_id string, seq long, value double"
    )
    plan = compile_rules(
        df,
        [
            CusumRule("value", target=25.0, k=1.0, h=50.0),
            ZScoreRule("value", threshold=2.0, window=10, min_periods=5),
        ],
        seq_col="seq",
    )
    phys = plan.violations._jdf.queryExecution().executedPlan().toString()
    phys = phys.split("== Initial Plan ==")[0]
    # CUSUM must ride the same hash exchange as the other sequence rules:
    # one shuffle total, no extra scan, no Python in the plan
    assert phys.count("Exchange hashpartitioning") <= 1
    assert "BatchEvalPython" not in phys
