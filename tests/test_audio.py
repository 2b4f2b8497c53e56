"""Audio codec + SNR invariants (SURVEY.md §5.2.5)."""

from __future__ import annotations

import numpy as np

from use_case_real_time_anomaly_detection_spark.functions.audio import (
    mulaw_decode,
    mulaw_encode,
    pcm16_wav_decode,
    pcm16_wav_encode,
    reference_waveform,
    snr_db,
    stable_hash,
)


def test_reference_waveform_deterministic():
    a = reference_waveform("c000-000000001", 16000, 1000, seed=42)
    b = reference_waveform("c000-000000001", 16000, 1000, seed=42)
    c = reference_waveform("c000-000000002", 16000, 1000, seed=42)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert len(a) == 16000
    assert a.dtype == np.float32
    assert float(np.abs(a).max()) <= 1.0


def test_pcm16_roundtrip_snr():
    sig = reference_waveform("x", 16000, 500)
    dec, sr = pcm16_wav_decode(pcm16_wav_encode(sig, 16000))
    assert sr == 16000
    assert len(dec) == len(sig)
    # 16-bit quantization SNR ≈ 6.02*16 + 1.76 ≈ 98 dB
    assert snr_db(sig, dec) > 80


def test_mulaw_roundtrip_snr():
    sig = reference_waveform("y", 8000, 500)
    dec = mulaw_decode(mulaw_encode(sig))
    db = snr_db(sig, dec)
    # G.711 μ-law SNR ≈ 35-40 dB — above the 30 dB rule threshold
    assert 30 < db < 60


def test_corrupted_audio_fails_threshold():
    sig = reference_waveform("z", 16000, 400)
    rng = np.random.default_rng(7)
    bad = np.clip(sig + rng.normal(0, 0.3, len(sig)), -1, 1).astype(np.float32)
    assert snr_db(sig, bad) < 10


def test_wav_decode_rejects_garbage():
    import pytest

    with pytest.raises(ValueError):
        pcm16_wav_decode(b"OggS" + b"\x00" * 100)


def test_stable_hash_is_process_independent():
    assert stable_hash("abc") == 891568578  # crc32("abc") — fixed forever


def test_map_in_arrow_equals_pandas_udf(spark):
    """The mapInArrow production path and the pandas-UDF reference
    formulation must produce identical (ok, snr, err) per clip."""
    from pyspark.sql import functions as F

    from use_case_real_time_anomaly_detection_spark.functions.audio import (
        make_audio_check_udf,
        with_audio_checks,
    )
    from use_case_real_time_anomaly_detection_spark.operators.rules import AudioDecodeRule
    from use_case_real_time_anomaly_detection_spark.sources.synth import SynthSpec, generate_clips

    clips = generate_clips(spark, SynthSpec(partitions=3, clips_per_partition=80))
    rule = AudioDecodeRule(min_snr_db=30.0, ref_seed=42)

    arrow = {
        r["clip_id"]: (r["__audio_ok"], r["__audio_snr_db"], r["__audio_err"])
        for r in with_audio_checks(clips, rule)
        .select("clip_id", "__audio_ok", "__audio_snr_db", "__audio_err")
        .collect()
    }
    res = make_audio_check_udf(rule.min_snr_db, rule.ref_seed)(
        F.col("clip_id"), F.col("bytes"), F.col("codec"), F.col("sr_hz"), F.col("dur_ms")
    )
    pandas_side = {
        r["clip_id"]: (r["r"]["ok"], r["r"]["snr_db"], r["r"]["err"])
        for r in clips.select("clip_id", res.alias("r")).collect()
    }
    assert set(arrow) == set(pandas_side)
    mismatches = {
        k: (arrow[k], pandas_side[k])
        for k in arrow
        if arrow[k][0] != pandas_side[k][0]
        or (arrow[k][1] is None) != (pandas_side[k][1] is None)
        or (arrow[k][1] is not None and abs(arrow[k][1] - pandas_side[k][1]) > 1e-9)
    }
    assert not mismatches, list(mismatches.items())[:3]


def test_audio_violations_pandas_twin_matches_engine(spark):
    """The pure-pandas oracle twin of the audio rule (the clips_validate_audio
    driver oracle) must equal the full engine's audio-decode violation rows
    BYTE-for-byte — same numpy decode+SNR over the same rendered payloads,
    plus an exact mirror of the engine's toString(ROUND(x,2)) note idiom."""
    from use_case_real_time_anomaly_detection_spark.plans.clips import validate_synthetic
    from use_case_real_time_anomaly_detection_spark.sources.synth import (
        SynthSpec,
        audio_violations_pandas,
    )

    spec = SynthSpec(partitions=3, clips_per_partition=130)
    res = validate_synthetic(spark, spec)
    got = sorted(
        tuple(r)
        for r in res.violations.filter("detector = 'audio-decode'").collect()
    )
    exp = sorted(map(tuple, audio_violations_pandas(spec).itertuples(index=False)))
    assert len(exp) > 0  # the fixture must actually inject audio failures
    assert got == exp
