"""MadRule (modified z-score via MAD) vs a numpy oracle.

The robust sibling of ZScoreRule/IqrRule: |0.6745*(x-median)/MAD| > t
(Iglewicz & Hoaglin). Median/MAD have a 50% breakdown point, so the
fence holds even when the contamination it hunts is heavy — the exact
failure mode that drags mean/stddev fences.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from use_case_real_time_anomaly_detection_spark.operators.compiler import compile_rules
from use_case_real_time_anomaly_detection_spark.operators.rules import MadRule


def _mad_oracle(values, threshold):
    """ids (by index) the rule must flag, plus (median, mad)."""
    arr = np.array([v for v in values if v is not None], dtype=np.float64)
    med = np.percentile(arr, 50)  # linear interpolation == Spark percentile
    mad = np.percentile(np.abs(arr - med), 50)
    flagged = set()
    if mad > 0:
        for i, v in enumerate(values):
            if v is not None and abs(0.6745 * (v - med) / mad) > threshold:
                flagged.add(i)
    return flagged, med, mad


def test_mad_matches_numpy_oracle(spark):
    rng = np.random.default_rng(7)
    values = [float(v) for v in rng.normal(50.0, 2.0, size=200).round(2)]
    for i in (13, 77, 150):
        values[i] = 50.0 + 40.0 * (1 if i % 2 else -1)  # wild outliers
    values[40] = None  # NULLs ignored by the stats and never flagged
    rows = [("p0", f"c{i:04d}", v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "partition_key string, clip_id string, value double")

    plan = compile_rules(df, [MadRule("value", threshold=3.5, exact=True)])
    got = plan.violations.collect()

    want, med, mad = _mad_oracle(values, 3.5)
    assert {int(r.clip_id[1:]) for r in got} == want
    assert want, "oracle must flag the planted outliers"
    for r in got:
        assert r.detector == "robust-z"
        i = int(r.clip_id[1:])
        z = 0.6745 * (values[i] - med) / mad
        assert float(r.observed) == pytest.approx(round(z, 4), abs=1e-9)
        assert f"| threshold:3.5" in r.note
        assert r.note.startswith(f"median:{round(med, 2)}")


def test_mad_resists_contamination_where_zscore_breaks(spark):
    # 30% contamination: a global-stat z-score fence is dragged wide open
    # (stddev inflated by the outliers themselves); the MAD fence still
    # flags every contaminated row and no clean row.
    rng = np.random.default_rng(11)
    clean = rng.normal(100.0, 1.0, size=140).round(3)
    dirty = rng.normal(100.0, 1.0, size=60).round(3) + 60.0
    values = list(clean) + list(dirty)
    rows = [("p0", f"c{i:04d}", float(v)) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "partition_key string, clip_id string, value double")

    got = {
        int(r.clip_id[1:])
        for r in compile_rules(df, [MadRule("value", threshold=3.5, exact=True)])
        .violations.collect()
    }
    assert got == set(range(140, 200))

    # the plain-stats fence misses under the same contamination
    arr = np.array(values)
    z = np.abs((arr - arr.mean()) / arr.std())
    assert (z[140:] > 3.5).sum() == 0, "global z-score is blind here"


def test_mad_zero_partition_and_broadcast_plan(spark):
    # >50% identical values → MAD == 0 → score undefined → nothing flagged
    rows = [("k", f"c{i}", 5.0 if i < 8 else 100.0) for i in range(10)]
    df = spark.createDataFrame(rows, "partition_key string, clip_id string, value double")
    plan = compile_rules(df, [MadRule("value", exact=True)])
    assert plan.violations.count() == 0
    # stats joins must broadcast (never sort-merge) — ~1 row per partition
    phys = plan.violations._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in phys
    assert "BroadcastHashJoin" in phys


def test_mad_approx_parity_at_test_scale(spark):
    rng = np.random.default_rng(3)
    rows = [
        ("p0", f"c{i:04d}", float(v))
        for i, v in enumerate(rng.normal(0.0, 1.0, size=500).round(2))
    ]
    rows[5] = ("p0", "c0005", 25.0)
    df = spark.createDataFrame(rows, "partition_key string, clip_id string, value double")
    exact = {
        r.clip_id
        for r in compile_rules(df, [MadRule("value", exact=True)]).violations.collect()
    }
    approx = {
        r.clip_id
        for r in compile_rules(df, [MadRule("value")]).violations.collect()
    }
    assert "c0005" in exact
    assert exact == approx
