"""segment_clips / segment_signal: corpus segmentation for training.

Pins: exact fixed-window boundary math, silence-split semantics (merge
short gaps, drop dead air, degenerate to trim for huge gaps), byte-exact
Spark↔pandas twin parity (md5 of re-encoded segment payloads),
undecodable ownership, config-time validation, and the single-Arrow-pass
plan shape.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from use_case_real_time_anomaly_detection_spark.functions.audio_features import (
    segment_clips,
    segment_signal,
    trim_signal,
)
from use_case_real_time_anomaly_detection_spark.sources.synth import (
    SynthSpec,
    audio_segments_pandas,
    generate_clips,
)

SR = 8000


def test_fixed_window_boundary_math():
    sig = np.arange(SR, dtype=np.float32) / SR  # 1 s ramp
    segs = segment_signal(sig, SR, window_ms=400, hop_ms=200)
    # starts every 1600 samples; window 3200; trailing remainders kept
    assert [s for s, _ in segs] == [0, 1600, 3200, 4800, 6400]
    assert [len(x) for _, x in segs] == [3200, 3200, 3200, 3200, 1600]
    np.testing.assert_array_equal(segs[1][1], sig[1600:4800])
    # min_ms drops the 200 ms remainder
    segs2 = segment_signal(sig, SR, window_ms=400, hop_ms=200, min_ms=300)
    assert [len(x) for _, x in segs2] == [3200] * 4
    # non-overlapping default hop == window
    segs3 = segment_signal(sig, SR, window_ms=400)
    assert [s for s, _ in segs3] == [0, 3200, 6400]


def test_silence_split_merge_and_trim_degeneracy():
    tone = np.full(800, 0.5, dtype=np.float32)  # 100 ms voiced
    sil = lambda ms: np.zeros(int(SR * ms / 1000), dtype=np.float32)
    sig = np.concatenate([sil(50), tone, sil(300), tone, sil(20), tone, sil(50)])
    # 300 ms gap splits; 20 ms gap merges (kept inside the segment)
    segs = segment_signal(sig, SR, gap_ms=100)
    assert len(segs) == 2
    assert segs[0][0] == 400 and len(segs[0][1]) == 800
    assert len(segs[1][1]) == 800 + 160 + 800  # tone + short gap + tone
    # huge gap → one segment == trim_signal (dead-air trim degeneracy)
    (only,) = segment_signal(sig, SR, gap_ms=10_000)
    np.testing.assert_array_equal(only[1], trim_signal(sig))
    # all-silent → nothing
    assert segment_signal(sil(500), SR, gap_ms=100) == []
    # min_ms drops short utterances
    assert segment_signal(sig, SR, gap_ms=100, min_ms=150) and not segment_signal(
        tone, SR, gap_ms=100, min_ms=150
    )


def test_mode_validation():
    sig = np.zeros(10, dtype=np.float32)
    with pytest.raises(ValueError, match="exactly one"):
        segment_signal(sig, SR)
    with pytest.raises(ValueError, match="exactly one"):
        segment_signal(sig, SR, window_ms=100, gap_ms=100)


def test_segment_clips_matches_pandas_twin(spark):
    # 100 clips/partition so the MOD_BADCODEC plant (seq 77) is present
    spec = SynthSpec(partitions=2, clips_per_partition=100)
    clips = generate_clips(spark, spec).dropDuplicates(["clip_id"])
    got = (
        segment_clips(clips, window_ms=400, hop_ms=200, min_ms=100)
        .select(
            "clip_id", "segment_id", "seg_index", "start_ms",
            "dur_ms", "sr_hz", "codec", F.md5("bytes").alias("payload_md5"),
        )
        .orderBy("segment_id")
        .toPandas()
    )
    want = audio_segments_pandas(spec, window_ms=400, hop_ms=200, min_ms=100)
    assert len(got) == len(want) and len(got) > 100
    for c in want.columns:
        assert list(got[c]) == list(want[c]), f"column {c} diverges"
    # undecodable plants (codec 'opus' junk) emit zero segments
    bad = clips.filter(F.col("codec") == "opus").count()
    assert bad > 0
    assert got[got.codec == "opus"].empty
    # segment ids are themselves unique corpus keys
    assert got.segment_id.is_unique


def test_segment_clips_config_error_and_plan(spark):
    spec = SynthSpec(partitions=1, clips_per_partition=8)
    clips = generate_clips(spark, spec)
    with pytest.raises(ValueError, match="exactly one"):
        segment_clips(clips)
    seg = segment_clips(clips, window_ms=300)
    phys = seg._jdf.queryExecution().executedPlan().toString()
    phys = phys.split("== Initial Plan ==")[0]
    # one Arrow pass, decode-once; no per-row Python anywhere
    assert phys.count("MapInArrow") == 1
    assert "BatchEvalPython" not in phys
