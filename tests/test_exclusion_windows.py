"""Maintenance-window exemption (engine exclusion_windows): row-level
violations inside a declared (partition, seq-range) window are excused;
everything else — rolling stats, rows_checked, partition-level
detectors — is untouched."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from use_case_real_time_anomaly_detection_spark.operators.engine import ValidationEngine
from use_case_real_time_anomaly_detection_spark.operators.rules import RangeRule
from use_case_real_time_anomaly_detection_spark.plans.clips import validate_synthetic
from use_case_real_time_anomaly_detection_spark.sources.synth import SynthSpec

SPEC = SynthSpec(partitions=4, clips_per_partition=200)

# detectors emitted by the fused row projection = the suppressible set
ROW_LEVEL = {
    "out-of-range",
    "not-null",
    "value-set-sr_hz",
    "value-set-codec",
    "audio-decode",
    "rate-of-change",
    "timeout-gap",
    "z-score",
    "interquartile-range",
    "referential",
    "transcript",
}


@pytest.fixture(scope="module")
def baseline(spark):
    res = validate_synthetic(spark, SPEC, with_audio=True)
    v = res.violations.toPandas()
    rc = res.verdicts.toPandas()
    return v, rc


@pytest.fixture(scope="module")
def windows(spark, baseline):
    """Window the first half of partition c001's sequence axis plus a
    narrow slice of c000 — chosen so each covers >=1 row-level baseline
    violation (asserted in the tests)."""
    half = SPEC.clips_per_partition // 2
    return spark.createDataFrame(
        [("c001", 0, half), ("c000", 10, 30)],
        "partition_key string, start_seq long, end_seq long",
    )


@pytest.fixture(scope="module")
def exempted(spark, windows):
    from use_case_real_time_anomaly_detection_spark.plans.clips import (
        default_rules,
        validate_clips,
    )
    from use_case_real_time_anomaly_detection_spark.sources.synth import (
        frontier_of,
        generate_clips,
        generate_manifest,
    )

    res = validate_clips(
        generate_clips(spark, SPEC),
        generate_manifest(spark, SPEC),
        frontier=frontier_of(SPEC),
        rules=default_rules(with_audio=True, seed=SPEC.seed),
        exclusion_windows=windows,
    )
    return res.violations.toPandas(), res.verdicts.toPandas()


def _seq_of(clip_id: str) -> int:
    # sources/synth.make_clip_id: "<partition>-<seq:06d>-<suffix>"
    return int(clip_id.split("-")[1])


def _in_window(part: str, seq: int) -> bool:
    half = SPEC.clips_per_partition // 2
    return (part == "c001" and 0 <= seq < half) or (
        part == "c000" and 10 <= seq < 30
    )


def test_exemption_is_exactly_set_minus_windowed_rows(baseline, exempted):
    """with-windows violations == without-windows violations minus the
    row-level ones whose (partition, seq) lies in a window — nothing
    else moves, including observed/note payloads."""
    base_v, _ = baseline
    ex_v, _ = exempted
    key = ["partition_key", "clip_id", "detector", "observed", "note"]

    def rows(df: pd.DataFrame) -> set:
        return set(map(tuple, df[key].itertuples(index=False)))

    base_rows = rows(base_v)
    keep = {
        r
        for r in base_rows
        if not (
            r[2] in ROW_LEVEL
            and r[1] is not None
            and _in_window(r[0], _seq_of(r[1]))
        )
    }
    assert rows(ex_v) == keep
    # the windows actually covered suppressible violations (else the
    # test proves nothing)
    assert len(base_rows) > len(keep)


def test_stats_windows_still_include_exempt_rows(baseline, exempted):
    """A z-score / rate-of-change violation just OUTSIDE the window must
    survive with identical observed/note — i.e. the rolling frames were
    computed over the exempt rows too, not over a row-deleted stream."""
    base_v, _ = baseline
    ex_v, _ = exempted
    for det in ("z-score", "rate-of-change", "interquartile-range"):
        sub = base_v[base_v["detector"] == det]
        base_out = sub[
            ~sub.apply(
                lambda r: _in_window(r["partition_key"], _seq_of(r["clip_id"])),
                axis=1,
            )
        ]
        got = ex_v[ex_v["detector"] == det]
        k = ["partition_key", "clip_id", "observed", "note"]
        assert set(map(tuple, base_out[k].itertuples(index=False))) == set(
            map(tuple, got[k].itertuples(index=False))
        ), det


def test_partition_level_detectors_unaffected(baseline, exempted):
    base_v, base_d = baseline
    ex_v, ex_d = exempted
    for det in ("drift-dur_ms", "drift-sr_hz", "timeout", "unique"):
        b = base_v[base_v["detector"] == det]
        e = ex_v[ex_v["detector"] == det]
        k = ["partition_key", "clip_id", "observed"]
        assert set(map(tuple, b[k].itertuples(index=False))) == set(
            map(tuple, e[k].itertuples(index=False))
        ), det
    # rows_checked identical partition by partition
    b = base_d.set_index(["partition_key", "detector"])["rows_checked"]
    e = ex_d.set_index(["partition_key", "detector"])["rows_checked"]
    assert b.sort_index().equals(e.sort_index())


def test_fully_windowed_partition_passes_row_level(spark):
    """A partition whose every row-level violation falls inside a window
    flips its row-level verdicts to pass — the point of the feature."""
    rows = [("p0", f"k{i:03d}", i, float(500 if i != 7 else 5000)) for i in range(50)]
    df = spark.createDataFrame(
        rows, "partition_key string, clip_id string, seq long, dur_ms double"
    )
    eng = ValidationEngine(seq_col="seq")
    win = spark.createDataFrame(
        [("p0", 7, 8)], "partition_key string, start_seq long, end_seq long"
    )
    rules = [RangeRule("dur_ms", 200, 2000)]
    without = eng.run(df, rules).verdicts.collect()
    with_w = eng.run(df, rules, exclusion_windows=win).verdicts.collect()
    assert [r["pass"] for r in without] == [False]
    assert [r["pass"] for r in with_w] == [True]
    assert [r["rows_checked"] for r in with_w] == [50]


def test_validation_errors(spark):
    df = spark.createDataFrame(
        [("p0", "k0", 0, 1.0)],
        "partition_key string, clip_id string, seq long, dur_ms double",
    )
    win_bad = spark.createDataFrame([("p0", 0)], "partition_key string, start_seq long")
    eng = ValidationEngine(seq_col="seq")
    with pytest.raises(ValueError, match="missing columns"):
        eng.run(df, [RangeRule("dur_ms", 0, 2)], exclusion_windows=win_bad)
    win = spark.createDataFrame(
        [("p0", 0, 1)], "partition_key string, start_seq long, end_seq long"
    )
    no_seq = ValidationEngine(seq_col=None)
    with pytest.raises(ValueError, match="seq_col"):
        no_seq.run(df, [RangeRule("dur_ms", 0, 2)], exclusion_windows=win)


def test_exemption_plan_broadcasts_and_never_shuffles_facts(spark):
    """The window set joins in as ONE broadcast array row per partition:
    no SortMergeJoin, no extra Exchange of the fact side."""
    rows = [("p0", f"k{i}", i, 1.0) for i in range(10)]
    df = spark.createDataFrame(
        rows, "partition_key string, clip_id string, seq long, dur_ms double"
    )
    win = spark.createDataFrame(
        [("p0", 0, 5)], "partition_key string, start_seq long, end_seq long"
    )
    eng = ValidationEngine(seq_col="seq")
    res = eng.run(df, [RangeRule("dur_ms", 0.0, 2.0)], exclusion_windows=win)
    plan = res.violations._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    for bad in ("SortMergeJoin", "Cartesian", "NestedLoop"):
        assert bad not in plan, plan
