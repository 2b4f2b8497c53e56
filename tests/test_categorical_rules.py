"""CategoricalDriftRule + EntropyRule — categorical-mix validation vs a
numpy/pandas oracle (functions/stats.categorical_scores is the shared
math), plus the defects that motivate them: a swapped codec mix that the
numeric KS/PSI axis never sees, and a frozen/noisy column every per-row
domain check passes.
"""

from __future__ import annotations

import numpy as np
import pytest

from use_case_real_time_anomaly_detection_spark.functions.stats import (
    categorical_scores,
)
from use_case_real_time_anomaly_detection_spark.operators.compiler import compile_rules
from use_case_real_time_anomaly_detection_spark.operators.rules import (
    CategoricalDriftRule,
    EntropyRule,
    ValueSetRule,
)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "partition_key string, clip_id string, codec string"
    )


def _mix_rows():
    """8 partitions with the fixture's 80/19/1 codec mix; p7 swapped."""
    rows = []
    for p in range(7):
        mix = ["pcm16"] * 80 + ["mulaw"] * 19 + ["flac"] * 1
        rows += [(f"p{p}", f"c{p}-{i}", c) for i, c in enumerate(mix)]
    swapped = ["mulaw"] * 80 + ["pcm16"] * 19 + ["flac"] * 1
    rows += [("p7", f"c7-{i}", c) for i, c in enumerate(swapped)]
    return rows


def _oracle(rows, smoothing=0.5):
    """(psi, entropy) per partition via the documented math."""
    from collections import Counter, defaultdict

    counts: dict[str, Counter] = defaultdict(Counter)
    for pk, _cid, v in rows:
        if v is not None:
            counts[pk][v] += 1
    vals = sorted({v for c in counts.values() for v in c})
    V = len(vals)
    p = {
        pk: {
            v: (c[v] + smoothing) / (sum(c.values()) + smoothing * V)
            for v in vals
        }
        for pk, c in counts.items()
    }
    q_raw = {v: float(np.percentile([p[pk][v] for pk in p], 50)) for v in vals}
    qs = sum(q_raw.values())
    q = {v: q_raw[v] / qs for v in vals}
    out = {}
    for pk, c in counts.items():
        n = sum(c.values())
        psi = sum((p[pk][v] - q[v]) * np.log(p[pk][v] / q[v]) for v in vals)
        ent = -sum(
            (c[v] / n) * np.log(c[v] / n) for v in vals if c[v] > 0
        )
        out[pk] = (psi, ent)
    return out


def test_categorical_scores_match_oracle(spark):
    rows = _mix_rows()
    got = {
        r.partition_key: (r.psi, r.entropy)
        for r in categorical_scores(
            _mk(spark, rows), "codec", partition_col="partition_key"
        ).collect()
    }
    want = _oracle(rows)
    assert set(got) == set(want)
    for pk in want:
        assert got[pk][0] == pytest.approx(want[pk][0], rel=1e-9), pk
        assert got[pk][1] == pytest.approx(want[pk][1], rel=1e-9), pk
    # the swapped partition dominates the PSI ranking
    assert max(got, key=lambda k: got[k][0]) == "p7"


def test_cat_drift_flags_swapped_mix_that_valueset_passes(spark):
    # every codec value is in-domain: ValueSetRule sees nothing, the mix
    # drift rule flags exactly the swapped partition
    df = _mk(spark, _mix_rows())
    plan = compile_rules(
        df,
        [
            ValueSetRule("codec", allowed=("pcm16", "mulaw", "flac")),
            CategoricalDriftRule("codec", psi_threshold=0.25),
        ],
    )
    got = plan.violations.collect()
    assert {(r.partition_key, r.detector) for r in got} == {
        ("p7", "cat-drift-codec")
    }
    (v,) = got
    assert v.clip_id is None  # partition-level
    assert v.observed.startswith("psi:")
    assert "psi_threshold:0.25" in v.note
    assert "cat-drift-codec" in plan.partition_level


def test_entropy_flags_frozen_and_noisy_partitions(spark):
    rows = []
    mix = ["pcm16"] * 80 + ["mulaw"] * 20
    rows += [("ok", f"a{i}", c) for i, c in enumerate(mix)]
    rows += [("frozen", f"b{i}", "pcm16") for i in range(100)]  # H = 0
    noise = [f"x{i % 50}" for i in range(100)]  # H ~ ln(50) = 3.9
    rows += [("noisy", f"c{i}", noise[i]) for i in range(100)]
    plan = compile_rules(
        _mk(spark, rows),
        [EntropyRule("codec", min_entropy=0.1, max_entropy=2.0)],
    )
    got = plan.violations.collect()
    by_pk = {r.partition_key: r for r in got}
    assert set(by_pk) == {"frozen", "noisy"}
    assert by_pk["frozen"].observed == "entropy:0.0"
    assert "min_entropy:0.1" in by_pk["frozen"].note
    assert "max_entropy:2" in by_pk["noisy"].note
    assert "entropy-codec" in plan.partition_level


def test_shared_count_frame_and_config_guards(spark):
    # both rules on one column: detectors both present, violations
    # consistent — and conflicting smoothing is a config-time error
    df = _mk(spark, _mix_rows())
    plan = compile_rules(
        df,
        [
            CategoricalDriftRule("codec", psi_threshold=0.25),
            EntropyRule("codec", min_entropy=0.05),
        ],
    )
    assert {"cat-drift-codec", "entropy-codec"} <= set(plan.detectors)
    assert {r.detector for r in plan.violations.collect()} == {"cat-drift-codec"}

    with pytest.raises(ValueError, match="smoothing"):
        compile_rules(
            df,
            [
                CategoricalDriftRule("codec", smoothing=0.5),
                CategoricalDriftRule("codec", smoothing=1.0, detector="x"),
            ],
        )
    with pytest.raises(ValueError, match="smoothing"):
        CategoricalDriftRule("codec", smoothing=0.0)
    with pytest.raises(ValueError, match="at least one"):
        EntropyRule("codec")


def test_nulls_excluded_and_single_partition_baseline(spark):
    # NULL codecs drop out (NotNullRule owns nulls); with ONE partition
    # the median baseline equals that partition's own mix -> psi == 0
    rows = [("p0", f"c{i}", "pcm16" if i % 3 else None) for i in range(30)]
    got = categorical_scores(
        _mk(spark, rows), "codec", partition_col="partition_key"
    ).collect()
    (r,) = got
    assert r.psi == pytest.approx(0.0, abs=1e-12)
    assert r.entropy == pytest.approx(0.0, abs=1e-12)
