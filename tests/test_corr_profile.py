"""corr_profile (per-partition Pearson r from fused conditional sums).

Pins: exact values vs numpy, pairwise deletion (a row counts only where
BOTH columns are present), zero-variance -> NULL (undefined, not 0),
and one fused aggregation for all pairs (single corpus scan).
"""

from __future__ import annotations

import math

import numpy as np

from use_case_real_time_anomaly_detection_spark.functions.stats import corr_profile


def _np_r(xs, ys):
    pairs = [(x, y) for x, y in zip(xs, ys) if x is not None and y is not None]
    if not pairs:
        return None, 0
    x = np.array([p[0] for p in pairs], dtype=float)
    y = np.array([p[1] for p in pairs], dtype=float)
    n = len(x)
    vx = n * (x * x).sum() - x.sum() ** 2
    vy = n * (y * y).sum() - y.sum() ** 2
    if vx <= 0 or vy <= 0:
        return None, n
    return (n * (x * y).sum() - x.sum() * y.sum()) / (
        math.sqrt(vx) * math.sqrt(vy)
    ), n


def test_corr_profile_matches_numpy_with_pairwise_deletion(spark):
    rng = np.random.default_rng(23)
    data = {}
    rows = []
    for pk, slope in (("p0", 3.0), ("p1", -1.0)):
        xs, ys = [], []
        for i in range(40):
            x = float(rng.integers(100, 1000))
            y = slope * x + float(rng.normal(0, 50))
            if i % 11 == 0:
                y = None  # pairwise deletion
            if i % 17 == 0:
                x = None
            xs.append(x)
            ys.append(y)
            rows.append((pk, x, y))
        data[pk] = (xs, ys)
    df = spark.createDataFrame(
        rows, "partition_key string, dur double, tlen double"
    )
    got = {
        r.partition_key: (r.pearson_r, r.n_pairs)
        for r in corr_profile(df, [("dur", "tlen")]).collect()
    }
    for pk, (xs, ys) in data.items():
        want_r, want_n = _np_r(xs, ys)
        assert got[pk][1] == want_n
        assert abs(got[pk][0] - want_r) < 1e-12
    assert got["p0"][0] > 0.9 and got["p1"][0] < -0.9


def test_corr_profile_zero_variance_is_null_and_multi_pair(spark):
    rows = [("p0", 5.0, float(i), float(2 * i)) for i in range(10)]
    df = spark.createDataFrame(
        rows, "partition_key string, const double, a double, b double"
    )
    out = corr_profile(df, [("const", "a"), ("a", "b")]).collect()
    by_pair = {(r.x_col, r.y_col): r for r in out}
    assert by_pair[("const", "a")].pearson_r is None  # undefined, not 0
    assert abs(by_pair[("a", "b")].pearson_r - 1.0) < 1e-12
    assert by_pair[("a", "b")].n_pairs == 10
