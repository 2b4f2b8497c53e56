"""As-of join and interval join (operators/joins.py) — pandas
merge_asof / brute-force containment oracles, tie and tolerance
contracts, and the no-cartesian plan shape."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest
from pyspark.sql import functions as F

from use_case_real_time_anomaly_detection_spark.operators.joins import (
    asof_join,
    coverage_flags,
    interval_join,
)

T0 = datetime(2026, 1, 1)


def _ts(minutes: float) -> datetime:
    return T0 + timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def frames(spark):
    facts = spark.createDataFrame(
        [(i, k, _ts(m), float(i)) for i, (k, m) in enumerate(
            [("a", 0), ("a", 5), ("a", 10), ("a", 10), ("b", 3), ("b", 30), ("c", 1)]
        )],
        "fact_id long, key string, ts timestamp, v double",
    )
    revs = spark.createDataFrame(
        [
            ("a", _ts(0), 100.0),   # tie with fact at m=0
            ("a", _ts(7), 107.0),
            ("b", _ts(4), 204.0),   # after b's first fact
            ("d", _ts(0), 400.0),   # key with no facts
        ],
        "key string, ts timestamp, cal double",
    )
    return facts, revs


def test_asof_backward_matches_pandas_merge_asof(spark, frames):
    facts, revs = frames
    got = (
        asof_join(facts, revs, on="key", ts="ts")
        .orderBy("fact_id")
        .toPandas()
    )
    lp = facts.orderBy("ts", "fact_id").toPandas()
    rp = revs.orderBy("ts").toPandas()
    exp = pd.merge_asof(
        lp, rp.rename(columns={"ts": "asof_ts", "cal": "asof_cal"}),
        left_on="ts", right_on="asof_ts", by="key", direction="backward",
    ).sort_values("fact_id").reset_index(drop=True)
    assert list(got["asof_cal"].fillna(-1)) == list(exp["asof_cal"].fillna(-1))
    assert list(got["asof_ts"].fillna(pd.Timestamp(0))) == list(
        exp["asof_ts"].fillna(pd.Timestamp(0))
    )
    # inclusive tie: fact at m=0 matches the revision at m=0
    assert got.loc[got.fact_id == 0, "asof_cal"].iloc[0] == 100.0
    # key c has no revisions -> NULL
    assert pd.isna(got.loc[got.fact_id == 6, "asof_cal"].iloc[0])


def test_asof_strict_and_forward(spark, frames):
    facts, revs = frames
    strict = {
        r["fact_id"]: r["asof_cal"]
        for r in asof_join(facts, revs, on="key", ts="ts", strict=True).collect()
    }
    assert strict[0] is None          # tie excluded under strict
    assert strict[1] == 100.0
    fwd = {
        r["fact_id"]: r["asof_cal"]
        for r in asof_join(facts, revs, on="key", ts="ts", direction="forward").collect()
    }
    assert fwd[0] == 100.0            # inclusive at-or-after
    assert fwd[1] == 107.0
    assert fwd[2] is None             # nothing after m=10 for key a
    assert fwd[4] == 204.0


def test_asof_tolerance_and_tie_dedup(spark, frames):
    facts, _ = frames
    revs = spark.createDataFrame(
        [("a", _ts(0), 1.0), ("a", _ts(0), 2.0)],  # duplicate (key, ts)
        "key string, ts timestamp, cal double",
    )
    got = {
        r["fact_id"]: r["asof_cal"]
        for r in asof_join(facts, revs, on="key", ts="ts", tolerance_s=360).collect()
    }
    # deterministic max-struct dedup picks cal=2.0
    assert got[0] == 2.0 and got[1] == 2.0
    # facts at m=10 are 600s from the revision: outside tolerance
    assert got[2] is None and got[3] is None


def test_asof_validates_args(spark, frames):
    facts, revs = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(facts, revs, on="key", ts="ts", direction="nearest")
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(facts, revs, on="key", ts="ts", tolerance_s=0)
    with pytest.raises(ValueError, match="right_cols"):
        asof_join(facts, revs, on="key", ts="ts", right_cols=["nope"])
    with pytest.raises(ValueError, match="already in left"):
        asof_join(facts, facts.select("key", "ts", "v"), on="key", ts="ts", prefix="")


def test_asof_plan_has_no_join_node(spark, frames):
    facts, revs = frames
    plan = (
        asof_join(facts, revs, on="key", ts="ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("Cartesian", "NestedLoop", "SortMergeJoin", "ShuffledHashJoin"):
        assert bad not in plan, plan


@pytest.fixture(scope="module")
def windows(spark):
    return spark.createDataFrame(
        [
            (0, "a", _ts(4), _ts(11)),    # spans several buckets
            (1, "a", _ts(9), _ts(12)),    # overlaps window 0
            (2, "b", _ts(0), _ts(4)),     # half-open: excludes ts == m=4
            (3, "z", _ts(0), _ts(60)),    # key with no facts
            (4, "a", _ts(20), _ts(20)),   # empty interval: dropped
        ],
        "window_id long, key string, start_ts timestamp, end_ts timestamp",
    )


def _brute_pairs(facts, windows):
    fp = facts.toPandas()
    wp = windows.toPandas()
    out = set()
    for _, f in fp.iterrows():
        for _, w in wp.iterrows():
            if f["key"] == w["key"] and w["start_ts"] <= f["ts"] < w["end_ts"]:
                out.add((f["fact_id"], w["window_id"]))
    return out


@pytest.mark.parametrize("bucket_s", [60, 300, 3600, 7])
def test_interval_join_matches_brute_force(spark, frames, windows, bucket_s):
    facts, _ = frames
    got = {
        (r["fact_id"], r["window_id"])
        for r in interval_join(
            facts, windows, ts="ts", start="start_ts", end="end_ts",
            on="key", bucket_s=bucket_s,
        ).collect()
    }
    assert got == _brute_pairs(facts, windows)


def test_interval_join_anti_and_flags(spark, frames, windows):
    facts, _ = frames
    pairs = _brute_pairs(facts, windows)
    covered = {fid for fid, _ in pairs}
    allids = {r["fact_id"] for r in facts.collect()}
    anti = {
        r["fact_id"]
        for r in interval_join(
            facts, windows, ts="ts", start="start_ts", end="end_ts",
            on="key", bucket_s=120, how="left_anti",
        ).collect()
    }
    assert anti == allids - covered
    flags = {
        r["fact_id"]: r["in_window"]
        for r in coverage_flags(
            facts, windows, ts="ts", start="start_ts", end="end_ts",
            on="key", bucket_s=120,
        ).collect()
    }
    assert set(flags) == allids  # facts never duplicated
    assert {f for f, v in flags.items() if v} == covered


def test_interval_join_validates_args(spark, frames, windows):
    facts, _ = frames
    with pytest.raises(ValueError, match="how"):
        interval_join(facts, windows, ts="ts", start="start_ts", end="end_ts", how="right")
    with pytest.raises(ValueError, match="bucket_s"):
        interval_join(facts, windows, ts="ts", start="start_ts", end="end_ts", bucket_s=0)


def test_interval_join_plan_is_equi_join(spark, frames, windows):
    """The containment join must compile to a hash equi-join on the
    bucket grid — never BroadcastNestedLoop/Cartesian (the naive
    theta-join shape that cannot scale past one machine)."""
    facts, _ = frames
    plan = (
        interval_join(
            facts, windows, ts="ts", start="start_ts", end="end_ts",
            on="key", bucket_s=300,
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in plan and "NestedLoop" not in plan, plan


def test_asof_integer_axis_with_tolerance(spark):
    """The as-of axis can be any numeric sequence column (the clip seq
    contract), with tolerance in axis units — parity vs pandas
    merge_asof on the same integer frame."""
    import pandas as pd

    facts_pd = pd.DataFrame(
        {
            "key": ["a"] * 4 + ["b"] * 2,
            "seq": [5, 40, 41, 200, 3, 9],
            "fact_id": list(range(6)),
        }
    )
    revs_pd = pd.DataFrame(
        {"key": ["a", "a", "b"], "seq": [0, 40, 8], "cal": [1.0, 2.0, 3.0]}
    )
    exp = pd.merge_asof(
        facts_pd.sort_values("seq"),
        revs_pd.sort_values("seq"),
        on="seq",
        by="key",
        tolerance=50,
        direction="backward",
    ).set_index("fact_id")["cal"]

    facts = spark.createDataFrame(facts_pd)
    revs = spark.createDataFrame(revs_pd)
    got = {
        r["fact_id"]: r["asof_cal"]
        for r in asof_join(
            facts, revs, on="key", ts="seq", tolerance_s=50
        ).collect()
    }
    for fid, want in exp.items():
        assert got[fid] == (None if pd.isna(want) else want), fid
    # seq 200 is 160 units past the last revision: outside tolerance
    assert got[3] is None
