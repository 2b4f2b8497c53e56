"""AudioQcRule: decoded-signal QC fences (clipping, dead air, RMS).

Oracle: audio_qc_violations_pandas runs the identical check_clip_qc
numpy path over the identical rendered bytes, so full violation rows
(including formatted observed strings) must match exactly.
"""

import numpy as np
import pytest

from use_case_real_time_anomaly_detection_spark.functions.audio import (
    CLIP_ABS,
    SILENCE_ABS,
    check_clip,
    check_clip_qc,
    stable_hash,
)
from use_case_real_time_anomaly_detection_spark.operators.rules import AudioQcRule
from use_case_real_time_anomaly_detection_spark.plans.clips import validate_clips
from use_case_real_time_anomaly_detection_spark.sources.synth import (
    SynthSpec,
    audio_qc_violations_pandas,
    frontier_of,
    generate_clips,
    generate_manifest,
)

SPEC = SynthSpec(partitions=4, clips_per_partition=150)


def _qc_bucket(clip_id: str, seed: int) -> int:
    return stable_hash(f"qc:{seed}:{clip_id}") % 97


def test_planted_qc_buckets_exist():
    """The synth must actually plant both defect kinds at this spec size
    (guards the moduli against silently selecting nothing)."""
    from use_case_real_time_anomaly_detection_spark.sources.synth import (
        make_clip_id,
    )

    buckets = {
        _qc_bucket(make_clip_id(p, s), SPEC.seed)
        for p in range(SPEC.partitions)
        for s in range(SPEC.clips_per_partition)
    }
    assert 13 in buckets  # overdriven / clipped
    assert 41 in buckets  # near-silent


def test_engine_matches_pandas_twin(spark):
    res = validate_clips(
        generate_clips(spark, SPEC),
        generate_manifest(spark, SPEC),
        frontier=frontier_of(SPEC),
        rules=[AudioQcRule()],
    )
    got = (
        res.violations.toPandas()
        .sort_values(["partition_key", "clip_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    exp = audio_qc_violations_pandas(SPEC)
    assert len(exp) > 0  # planted defects produce violations
    cols = ["partition_key", "clip_id", "detector", "observed", "note"]
    assert got[cols].values.tolist() == exp[cols].values.tolist()
    # both planted defect kinds present; any OTHER flagged clip must be a
    # bad_audio one (the gaussian-corrupted payloads genuinely clip when
    # ref+noise exceeds full scale — a real defect, correctly fenced)
    from use_case_real_time_anomaly_detection_spark.sources.synth import (
        plan_partition,
    )

    bad_audio = set()
    for p in range(SPEC.partitions):
        plan = plan_partition(p, SPEC)
        bad_audio |= set(plan[plan["bad_audio"]]["clip_id"])
    flagged = set(exp["clip_id"])
    kinds = {_qc_bucket(c, SPEC.seed) for c in flagged - bad_audio}
    assert kinds == {13, 41}
    # verdict grid carries the detector for every partition
    verd = res.verdicts.toPandas()
    assert set(verd[verd["detector"] == "audio-qc"]["partition_key"]) == {
        f"c{p:03d}" for p in range(SPEC.partitions)
    }


def test_decode_failures_never_qc_flagged(spark):
    """opus/truncated payloads are AudioDecodeRule's violations; with the
    loosest possible sane bounds the QC set must not contain them."""
    exp = audio_qc_violations_pandas(SPEC)
    from use_case_real_time_anomaly_detection_spark.sources.synth import (
        plan_partition,
    )

    bad = set()
    for p in range(SPEC.partitions):
        plan = plan_partition(p, SPEC)
        bad |= set(plan[plan["codec"] == "opus"]["clip_id"])
    assert bad and not (set(exp["clip_id"]) & bad)


def test_loose_bounds_flag_nothing():
    exp = audio_qc_violations_pandas(
        SPEC, max_clip_ratio=1.0, max_silence_ratio=1.0
    )
    assert len(exp) == 0


def test_rms_bounds():
    """min_rms catches exactly the near-silent bucket (their rms is ~2
    orders below normal clips')."""
    exp = audio_qc_violations_pandas(
        SPEC, max_clip_ratio=None, max_silence_ratio=None, min_rms=0.01
    )
    assert len(exp) > 0
    assert {_qc_bucket(c, SPEC.seed) for c in exp["clip_id"]} == {41}


def test_check_clip_qc_prefix_equals_check_clip():
    """(ok, snr, err) must be identical between the two entry points —
    one decode path, two surfaces."""
    from use_case_real_time_anomaly_detection_spark.sources.synth import (
        _render_rows,
    )

    # partitions=2: with a single partition the stopped-partition logic
    # (stopped_partition=-1 % 1 == 0) truncates it to stop_fraction
    rows = _render_rows(0, SynthSpec(partitions=2, clips_per_partition=60))
    assert len(rows) >= 50
    for row in rows.itertuples(index=False):
        a = check_clip(
            row.clip_id, row.bytes, row.codec, row.sr_hz, row.dur_ms,
            min_snr_db=30.0, ref_seed=42,
        )
        b = check_clip_qc(
            row.clip_id, row.bytes, row.codec, row.sr_hz, row.dur_ms,
            min_snr_db=30.0, ref_seed=42,
        )
        assert a == b[:3]


def test_metrics_match_signal_features():
    """QC metrics must be bit-identical to the feature table's columns
    (same formulas — AudioQcRule fences what audio_features reports)."""
    from use_case_real_time_anomaly_detection_spark.functions.audio import (
        DECODERS,
    )
    from use_case_real_time_anomaly_detection_spark.functions.audio_features import (
        signal_features,
    )
    from use_case_real_time_anomaly_detection_spark.sources.synth import (
        _render_rows,
    )

    rows = _render_rows(0, SynthSpec(partitions=2, clips_per_partition=40))
    checked = 0
    for row in rows.itertuples(index=False):
        if row.codec not in DECODERS:
            continue
        sig = DECODERS[row.codec](row.bytes, row.sr_hz)
        feats = signal_features(sig, row.sr_hz)
        _, _, _, sil, cr, rms = check_clip_qc(
            row.clip_id, row.bytes, row.codec, row.sr_hz, row.dur_ms,
            min_snr_db=30.0, ref_seed=42,
        )
        assert sil == feats["silence_ratio"]
        assert cr == feats["clip_ratio"]
        assert rms == feats["rms"]
        checked += 1
    assert checked > 30


def test_planted_defects_do_not_trip_snr():
    """The QC buckets live in the golden copy too (mis-gained capture):
    SNR must stay ≥ 30 dB for them on both codecs, so only AudioQcRule
    sees the defect."""
    from use_case_real_time_anomaly_detection_spark.functions.audio import (
        mulaw_encode,
        pcm16_wav_encode,
        reference_waveform,
    )

    found = {13: 0, 41: 0}
    for i in range(4000):
        cid = f"t-{i:09d}"
        q = _qc_bucket(cid, 42)
        if q not in found:
            continue
        ref = reference_waveform(cid, 8000, 500, seed=42)
        for codec, enc in (
            ("pcm16", lambda s: pcm16_wav_encode(s, 8000)),
            ("mulaw", mulaw_encode),
        ):
            ok, db, err = check_clip(
                cid, enc(ref), codec, 8000, 500, min_snr_db=30.0, ref_seed=42
            )
            assert ok, (cid, codec, db, err)
            assert db is None or db >= 31.5  # margin over the 30 dB bar
        # and the decoded metrics really show the defect
        _, _, _, sil, cr, _rms = check_clip_qc(
            cid, pcm16_wav_encode(ref, 8000), "pcm16", 8000, 500,
            min_snr_db=30.0, ref_seed=42,
        )
        if q == 13:
            assert cr > 0.05
        else:
            assert sil > 0.9
        found[q] += 1
    assert all(v > 0 for v in found.values())


def test_config_round_trip_and_validation():
    from use_case_real_time_anomaly_detection_spark.operators.config import (
        rules_from_config, rules_to_config,
    )

    rules = [AudioQcRule(max_clip_ratio=0.02, min_rms=0.005)]
    assert rules_from_config(rules_to_config(rules)) == rules
    with pytest.raises(ValueError):
        AudioQcRule(
            max_clip_ratio=None, max_silence_ratio=None, min_rms=None,
            max_rms=None,
        )
    with pytest.raises(ValueError):
        AudioQcRule(max_clip_ratio=1.5)


def test_single_arrow_pass_with_decode_rule(spark):
    """QC + decode rules share ONE mapInArrow pass (one decode per clip)."""
    from use_case_real_time_anomaly_detection_spark.operators.rules import (
        AudioDecodeRule,
    )

    res = validate_clips(
        generate_clips(spark, SynthSpec(partitions=2, clips_per_partition=40)),
        generate_manifest(spark, SynthSpec(partitions=2, clips_per_partition=40)),
        frontier=frontier_of(SynthSpec(partitions=2, clips_per_partition=40)),
        rules=[AudioDecodeRule(), AudioQcRule()],
    )
    # "simple" mode prints each node once (formatted lists tree + details)
    plan = res.violations._sc._jvm.PythonSQLUtils.explainString(
        res.violations._jdf.queryExecution(), "simple"
    )
    assert plan.count("MapInArrow") == 1
