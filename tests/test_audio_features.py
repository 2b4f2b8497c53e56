"""Audio feature extraction, transcoding, and audio near-dup invariants.

The audio twin of the text dedup guarantees (SURVEY.md §2 LLM-pipeline
block): features are bit-identical between the Spark mapInArrow path and
the pure-pandas oracle twin; the spectral fingerprint and block keys are
transcode-stable (μ-law re-encode ⇒ same blocking bucket, hamming 0);
and audio_dup_pairs recovers every planted transcoded twin.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from use_case_real_time_anomaly_detection_spark.functions.audio import (
    DECODERS,
    mulaw_decode,
    reference_waveform,
    snr_db,
)
from use_case_real_time_anomaly_detection_spark.functions.audio_features import (
    audio_dup_pairs,
    clip_features,
    reencode_clips,
    with_audio_features,
)
from use_case_real_time_anomaly_detection_spark.sources.synth import (
    REENCODE_MOD,
    SynthSpec,
    audio_features_pandas,
    generate_clips,
)

SPEC = SynthSpec(partitions=3, clips_per_partition=120)


def _spark_features(spark, spec=SPEC):
    from pyspark.sql import functions as F

    clips = generate_clips(spark, spec)
    seq = F.substring("clip_id", 6, 9).cast("long")
    re_src = clips.where(
        (F.col("codec") == "pcm16") & (seq % REENCODE_MOD[0] == REENCODE_MOD[1])
    )
    variants = reencode_clips(re_src).withColumn(
        "clip_id", F.concat("clip_id", F.lit("~re"))
    )
    return with_audio_features(clips.unionByName(variants)).dropDuplicates(
        ["clip_id"]
    )


def test_spark_features_match_pandas_twin_bit_exact(spark):
    """mapInArrow features == pure-pandas twin, doubles compared exactly
    (same numpy ops over the same rendered bytes — no tolerance)."""
    exp = audio_features_pandas(SPEC).set_index("clip_id")
    got_rows = _spark_features(spark).collect()
    assert len(got_rows) == len(exp)
    for r in got_rows:
        e = exp.loc[r["clip_id"]]
        assert r["ok"] == bool(e["ok"]), r["clip_id"]
        if not r["ok"]:
            assert r["err"] == e["err"]
            continue
        for c in (
            "n_samples", "rms", "peak", "zcr", "silence_ratio", "clip_ratio",
            "centroid_hz", "fingerprint", "peak_band", "rms_bucket",
            "rms_bucket_hi",
        ):
            assert r[c] == e[c], (r["clip_id"], c, r[c], e[c])
        assert r["bands"] == list(e["bands"]), r["clip_id"]


def test_reencode_roundtrip_and_passthrough(spark):
    """pcm16 → μ-law transcode keeps the waveform (SNR ≥ 30 dB, G.711
    floor) and the schema; undecodable rows pass through unchanged."""
    from pyspark.sql import functions as F

    clips = generate_clips(spark, SynthSpec(partitions=2, clips_per_partition=60))
    src = clips.where(F.col("codec") == "pcm16").limit(20)
    out = {r["clip_id"]: r for r in reencode_clips(src).collect()}
    orig = {r["clip_id"]: r for r in src.collect()}
    assert out.keys() == orig.keys() and len(out) > 0
    for cid, r in out.items():
        assert r["codec"] == "mulaw"
        sig0 = DECODERS["pcm16"](orig[cid]["bytes"], orig[cid]["sr_hz"])
        sig1 = mulaw_decode(r["bytes"])
        assert len(sig0) == len(sig1)
        assert snr_db(sig0, sig1) >= 30.0
        assert r["transcript"] == orig[cid]["transcript"]

    bad = clips.where(F.col("codec") == "pcm16").limit(3).withColumn(
        "bytes", F.expr("substring(bytes, 1, 4)")
    )
    kept = reencode_clips(bad).collect()
    assert len(kept) == 3
    assert all(r["codec"] == "pcm16" and len(r["bytes"]) == 4 for r in kept)


def test_fingerprint_and_block_keys_transcode_stable():
    """The support fingerprint and both block keys survive μ-law
    quantization (noise ~30 dB below signal can't cross the 10 dB
    support margin or move the argmax band)."""
    from use_case_real_time_anomaly_detection_spark.functions.audio import (
        mulaw_encode,
        pcm16_wav_encode,
    )

    for cid in ("c000-000000011", "c001-000000207", "c002-000000350"):
        sig = reference_waveform(cid, 16000, 900)
        a = clip_features(pcm16_wav_encode(sig, 16000), "pcm16", 16000, 900)
        b = clip_features(mulaw_encode(sig), "mulaw", 16000, 900)
        assert a["ok"] and b["ok"]
        assert a["fingerprint"] == b["fingerprint"], cid
        assert a["peak_band"] == b["peak_band"], cid
        # multi-probe: the two probe sets must intersect
        assert {a["rms_bucket"], a["rms_bucket_hi"]} & {
            b["rms_bucket"], b["rms_bucket_hi"]
        }, cid
        assert math.isclose(a["centroid_hz"], b["centroid_hz"], rel_tol=5e-3)


def test_clip_features_failure_is_data_not_exception():
    out = clip_features(b"\x00\x01", "pcm16", 16000, 100)
    assert out["ok"] is False and out["err"]
    assert out["fingerprint"] is None and out["bands"] is None
    out2 = clip_features(b"abc", "flac", 16000, 100)
    assert out2["ok"] is False and "flac" in out2["err"]


def test_audio_dup_recovers_every_planted_transcode_pair(spark):
    """Recall 1.0 on the planted μ-law twins: every '<id>~re' row pairs
    with its pcm16 source, at hamming 0 (support bits unmoved)."""
    feats = _spark_features(spark)
    pairs = audio_dup_pairs(feats).collect()
    planted = {
        r["clip_id"]
        for r in feats.select("clip_id").collect()
        if r["clip_id"].endswith("~re")
    }
    assert len(planted) > 0
    found = {
        (p["clip_id_a"], p["clip_id_b"]): p["hamming"] for p in pairs
    }
    for twin in planted:
        src = twin[: -len("~re")]
        key = (min(src, twin), max(src, twin))
        assert key in found, f"missing planted pair {key}"
        assert found[key] == 0, (key, found[key])


def test_audio_dup_no_false_positives_on_distinct_content(spark):
    """Clips with different reference waveforms must not pair: every
    reported pair is either a planted twin or shares identical rendered
    content (the synth MOD_DUP twin collision)."""
    feats = _spark_features(spark)
    pairs = audio_dup_pairs(feats).collect()
    sig_of = {}
    for r in generate_clips(spark, SPEC).dropDuplicates(["clip_id"]).collect():
        sig_of[r["clip_id"]] = r["bytes"]
    for p in pairs:
        a, b = p["clip_id_a"], p["clip_id_b"]
        if a.replace("~re", "") == b.replace("~re", ""):
            continue  # planted twin
        ba, bb = sig_of.get(a.replace("~re", "")), sig_of.get(b.replace("~re", ""))
        assert ba is not None and bb is not None
        assert ba == bb, f"false positive: {a} vs {b}"


def test_audio_dup_plan_payload_never_shuffles(spark):
    """The candidate join and verify run over pinned slim frames: the
    feature extraction (and thus the payload bytes) appears in NO
    exchange, and the final plan contains no FileScan (both sides read
    the localCheckpointed feature frame) and no per-row Python."""
    feats = _spark_features(spark)
    plan = audio_dup_pairs(feats)._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan
    assert "BatchEvalPython" not in plan
    assert "bytes" not in plan  # payload column gone before any exchange
    assert "CartesianProduct" not in plan


def test_audio_drift_flags_injected_partitions(spark):
    """n_samples drift must single out the dur-shifted partition (c001:
    +300 ms ⇒ every clip longer) and the sr-flipped partition (c002:
    half the clips at the other rate ⇒ bimodal sample count); rms and
    centroid stay near the background (negative control)."""
    from use_case_real_time_anomaly_detection_spark.functions.audio_features import (
        audio_drift,
    )

    spec = SynthSpec(partitions=6, clips_per_partition=150)
    feats = with_audio_features(
        generate_clips(spark, spec).dropDuplicates(["clip_id"])
    )
    scores = {
        (r["feature"], r["partition_key"]): r["psi"]
        for r in audio_drift(feats).collect()
    }
    assert len(scores) == 3 * 6
    ns = {pk: psi for (f, pk), psi in scores.items() if f == "n_samples"}
    quiet = [psi for pk, psi in ns.items() if pk not in ("c001", "c002")]
    assert ns["c001"] > 1.0 and ns["c002"] > 1.0
    assert all(psi < 0.1 for psi in quiet), ns
    # negative control: no rms/centroid partition stands 10x above 1.0
    for f in ("rms", "centroid_hz"):
        vals = [psi for (ff, _), psi in scores.items() if ff == f]
        assert max(vals) < 1.0, (f, vals)


def test_resample_mechanics_and_passthrough(spark):
    """16 k→8 k: sample count halves, decoded result equals np.interp of
    the source within pcm16 quantization; rows already at the target
    rate are byte-identical pass-throughs; undecodable rows keep their
    payload and sr."""
    from pyspark.sql import functions as F

    from use_case_real_time_anomaly_detection_spark.functions.audio_features import (
        resample_clips,
        resample_signal,
    )

    clips = generate_clips(spark, SynthSpec(partitions=2, clips_per_partition=80))
    out = {r["clip_id"]: r for r in resample_clips(clips, to_sr=8000).collect()}
    orig = {r["clip_id"]: r for r in clips.dropDuplicates(["clip_id"]).collect()}
    n_resampled = 0
    for cid, o in orig.items():
        r = out[cid]
        dec = DECODERS.get(o["codec"])
        if o["sr_hz"] == 8000:
            assert r["bytes"] == o["bytes"] and r["sr_hz"] == 8000
            continue
        if dec is None:  # opus injection: undecodable pass-through
            assert r["bytes"] == o["bytes"] and r["sr_hz"] == o["sr_hz"]
            continue
        try:
            sig0 = dec(o["bytes"], o["sr_hz"])
        except Exception:
            assert r["bytes"] == o["bytes"] and r["sr_hz"] == o["sr_hz"]
            continue
        n_resampled += 1
        assert r["sr_hz"] == 8000 and r["codec"] == o["codec"]
        sig1 = DECODERS[r["codec"]](r["bytes"], 8000)
        exp = resample_signal(sig0, o["sr_hz"], 8000)
        assert len(sig1) == len(exp)
        tol = 1.5 / 32768 if o["codec"] == "pcm16" else 0.02  # codec LSB
        assert float(np.max(np.abs(sig1.astype(np.float64) - exp))) <= tol
    assert n_resampled > 0


def test_resample_preserves_content_snr(spark):
    """A 16 kHz clip resampled to 8 kHz still matches the 8 kHz golden
    rendering of the same clip_id at ≥ 25 dB (sub-Nyquist sine carries
    through linear interp; only the sample-indexed noise term differs)."""
    from use_case_real_time_anomaly_detection_spark.functions.audio import (
        pcm16_wav_encode,
    )
    from use_case_real_time_anomaly_detection_spark.functions.audio_features import (
        resample_signal,
    )

    for cid in ("c000-000000001", "c001-000000042"):
        hi = reference_waveform(cid, 16000, 1000)
        lo_ref = reference_waveform(cid, 8000, 1000)
        lo = resample_signal(
            DECODERS["pcm16"](pcm16_wav_encode(hi, 16000), 16000), 16000, 8000
        )
        assert len(lo) == len(lo_ref)
        assert snr_db(lo_ref, lo) >= 25.0, cid


def test_resample_normalization_removes_sr_drift_keeps_dur_drift(spark):
    """End-to-end: sr-normalizing the corpus erases the c002 sr-flip
    drift (metadata-level skew) while the c001 duration shift — a REAL
    content difference — still flags. The drift detector is measuring
    content, not capture-chain artifacts, once the normalizer runs."""
    from use_case_real_time_anomaly_detection_spark.functions.audio_features import (
        audio_drift,
        resample_clips,
    )

    spec = SynthSpec(partitions=6, clips_per_partition=150)
    clips = generate_clips(spark, spec).dropDuplicates(["clip_id"])
    feats = with_audio_features(resample_clips(clips, to_sr=8000))
    ns = {
        r["partition_key"]: r["psi"]
        for r in audio_drift(feats, feature_cols=("n_samples",)).collect()
    }
    assert ns["c001"] > 1.0  # duration shift survives normalization
    assert ns["c002"] < 0.1, ns  # sr flip is gone
    assert all(psi < 0.1 for pk, psi in ns.items() if pk != "c001"), ns


def test_trim_invariant_pad_then_trim_equals_trim(spark):
    """trim(pad_with_silence(x)) == trim(x) EXACTLY (byte-equal payloads
    and dur_ms): padding differences between capture chains vanish, so
    padded re-recordings collide in exact dedup after trim."""
    from pyspark.sql import functions as F

    from use_case_real_time_anomaly_detection_spark.functions.audio import (
        pcm16_wav_encode,
    )
    from use_case_real_time_anomaly_detection_spark.functions.audio_features import (
        trim_silence_clips,
    )

    clips = generate_clips(
        spark, SynthSpec(partitions=2, clips_per_partition=60)
    ).where((F.col("codec") == "pcm16") & (F.col("sr_hz") == 16000)).limit(12)
    rows = clips.collect()
    assert rows
    padded = []
    for r in rows:
        sig = DECODERS["pcm16"](r["bytes"], r["sr_hz"])
        pad = np.zeros(1600, dtype=np.float32)  # 100 ms dead air each side
        psig = np.concatenate([pad, sig, pad])
        padded.append(
            (r["clip_id"], pcm16_wav_encode(psig, r["sr_hz"]), r["sr_hz"],
             int(r["dur_ms"]) + 200, r["codec"], r["transcript"])
        )
    pdf = spark.createDataFrame(
        padded, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string"
    )
    t_orig = {r["clip_id"]: r for r in trim_silence_clips(clips.select(pdf.columns)).collect()}
    t_pad = {r["clip_id"]: r for r in trim_silence_clips(pdf).collect()}
    assert t_orig.keys() == t_pad.keys()
    for cid in t_orig:
        assert t_pad[cid]["bytes"] == t_orig[cid]["bytes"], cid
        assert t_pad[cid]["dur_ms"] == t_orig[cid]["dur_ms"], cid


def test_trim_handles_all_silence_and_undecodable(spark):
    from use_case_real_time_anomaly_detection_spark.functions.audio import (
        pcm16_wav_encode,
    )
    from use_case_real_time_anomaly_detection_spark.functions.audio_features import (
        trim_silence_clips,
    )

    silent = pcm16_wav_encode(np.zeros(8000, dtype=np.float32), 8000)
    df = spark.createDataFrame(
        [
            ("all-silence", silent, 8000, 1000, "pcm16", "t"),
            ("garbage", b"\x01\x02\x03", 8000, 1000, "pcm16", "t"),
            ("no-codec", silent, 8000, 1000, "opus", "t"),
        ],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string",
    )
    out = {r["clip_id"]: r for r in trim_silence_clips(df).collect()}
    assert out["all-silence"]["dur_ms"] == 0
    dec, sr = DECODERS["pcm16"](out["all-silence"]["bytes"], 8000), 8000
    assert len(dec) == 0
    assert out["garbage"]["bytes"] == b"\x01\x02\x03"
    assert out["garbage"]["dur_ms"] == 1000
    assert out["no-codec"]["bytes"] == silent  # passthrough: no encoder


def test_normalize_loudness_rms_and_fingerprint_invariance(spark):
    """Every decodable non-silent clip lands at rms ≈ target (within
    codec quantization) unless peak-limited — and the spectral-support
    fingerprint + peak_band are INVARIANT under the gain (density
    ratios), so normalization cannot perturb near-dup structure."""
    from pyspark.sql import functions as F

    from use_case_real_time_anomaly_detection_spark.functions.audio_features import (
        normalize_gain,
        normalize_loudness_clips,
    )

    spec = SynthSpec(partitions=2, clips_per_partition=80)
    clips = generate_clips(spark, spec).dropDuplicates(["clip_id"])
    before = {r["clip_id"]: r for r in with_audio_features(clips).collect()}
    after = {
        r["clip_id"]: r
        for r in with_audio_features(
            normalize_loudness_clips(clips, target_rms=0.45)
        ).collect()
    }
    assert before.keys() == after.keys()
    checked = 0
    for cid, b in before.items():
        a = after[cid]
        if not b["ok"]:
            assert not a["ok"]
            continue
        assert a["ok"], cid
        assert a["fingerprint"] == b["fingerprint"], cid
        assert a["peak_band"] == b["peak_band"], cid
        tol = 0.02 if b["codec"] == "mulaw" else 0.002
        if b["peak"] * (0.45 / b["rms"]) <= 0.999:  # gain not peak-limited
            assert abs(a["rms"] - 0.45) <= tol, (cid, a["rms"])
            checked += 1
    assert checked > 50


def test_normalize_gain_peak_limited_never_clips():
    """High-crest signal: the peak ceiling binds before the RMS target,
    and no output sample exceeds it."""
    from use_case_real_time_anomaly_detection_spark.functions.audio_features import (
        normalize_gain,
    )

    sig = np.zeros(8000, dtype=np.float32)
    sig[::400] = 0.9  # sparse impulses: rms tiny, peak large
    g = normalize_gain(sig, target_rms=0.45, peak_ceiling=0.999)
    peak = float(np.max(np.abs(sig.astype(np.float64))))
    assert g == 0.999 / peak  # ceiling binds (rms gain would be far larger)
    assert float(np.max(np.abs(sig.astype(np.float64) * g))) <= 0.999
    assert normalize_gain(np.zeros(100, dtype=np.float32), 0.45, 0.999) == 1.0


def test_clip_pipeline_fused_equals_chained_within_one_quantization(spark):
    """The fused pipeline equals the chained standalone operators up to
    exactly the intermediate codec round-trips it eliminates: ok flags
    and shape-level fields match everywhere; float features agree within
    a few codec LSBs; discrete block keys stay within one probe step."""
    from use_case_real_time_anomaly_detection_spark.functions.audio_features import (
        clip_pipeline,
        normalize_loudness_clips,
    )

    spec = SynthSpec(partitions=2, clips_per_partition=80)
    clips = generate_clips(spark, spec).dropDuplicates(["clip_id"])
    ops = [("trim", {}), ("resample", {"to_sr": 8000}), ("normalize", {})]
    fused = {r["clip_id"]: r for r in clip_pipeline(clips, ops).collect()}
    from use_case_real_time_anomaly_detection_spark.functions.audio_features import (
        resample_clips,
        trim_silence_clips,
    )

    chained_df = with_audio_features(
        normalize_loudness_clips(resample_clips(trim_silence_clips(clips), to_sr=8000))
    )
    chained = {r["clip_id"]: r for r in chained_df.collect()}
    assert fused.keys() == chained.keys()
    n_ok = 0
    for cid, f in fused.items():
        c = chained[cid]
        assert f["ok"] == c["ok"], cid
        if not f["ok"]:
            continue
        n_ok += 1
        assert f["sr_hz"] == c["sr_hz"] == 8000
        assert f["n_samples"] == c["n_samples"], cid
        assert f["dur_ms"] == c["dur_ms"], cid
        tol = 0.03 if c["codec"] == "mulaw" else 0.003  # codec LSB scale
        for k in ("rms", "peak", "silence_ratio", "clip_ratio"):
            assert abs(f[k] - c[k]) <= tol, (cid, k, f[k], c[k])
        assert abs(f["centroid_hz"] / c["centroid_hz"] - 1.0) <= 0.01, cid
        assert abs(f["peak_band"] - c["peak_band"]) <= 1, cid
    assert n_ok > 100


def test_clip_pipeline_single_arrow_pass(spark):
    """The fused plan contains exactly ONE MapInArrow operator; the
    chained formulation carries four — the decode bill the fusion
    eliminates is visible in the physical plan."""
    from use_case_real_time_anomaly_detection_spark.functions.audio_features import (
        clip_pipeline,
        normalize_loudness_clips,
        resample_clips,
        trim_silence_clips,
    )

    clips = generate_clips(spark, SynthSpec(partitions=2, clips_per_partition=20))
    ops = [("trim", {}), ("resample", {"to_sr": 8000}), ("normalize", {})]
    fused_plan = (
        clip_pipeline(clips, ops)._jdf.queryExecution().executedPlan().toString()
    )
    chained_plan = (
        with_audio_features(
            normalize_loudness_clips(
                resample_clips(trim_silence_clips(clips), to_sr=8000)
            )
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert fused_plan.count("MapInArrow") == 1, fused_plan
    assert chained_plan.count("MapInArrow") == 4


def test_clip_pipeline_rejects_unknown_op(spark):
    from use_case_real_time_anomaly_detection_spark.functions.audio_features import (
        clip_pipeline,
    )

    clips = generate_clips(spark, SynthSpec(partitions=1, clips_per_partition=5))
    with pytest.raises(ValueError):
        clip_pipeline(clips, [("reverb", {})])


def _gate_fixture(spark):
    from pyspark.sql import functions as F

    spec = SynthSpec(partitions=4, clips_per_partition=150)
    clips = generate_clips(spark, spec).dropDuplicates(["clip_id"])
    seq = F.substring("clip_id", 6, 9).cast("long")
    corpus = clips.where(~F.col("clip_id").startswith("c003"))
    re_src = clips.where(
        (F.col("codec") == "pcm16") & (seq % REENCODE_MOD[0] == REENCODE_MOD[1])
    )
    batch = (
        clips.where(F.col("clip_id").startswith("c003"))
        .unionByName(
            reencode_clips(
                re_src.where(
                    F.col("clip_id").startswith("c003")
                    | F.col("clip_id").startswith("c000")
                )
            ).withColumn("clip_id", F.concat("clip_id", F.lit("~re")))
        )
        .unionByName(
            clips.where(F.col("clip_id").startswith("c000") & (seq < 5)).withColumn(
                "clip_id", F.concat("clip_id", F.lit("~cp"))
            )
        )
        .unionByName(
            clips.where(F.col("clip_id").startswith("c000") & (seq < 5)).withColumn(
                "clip_id", F.concat("clip_id", F.lit("~cp2"))
            )
        )
    )
    return batch, corpus


def test_audio_ingest_gate_routes_every_planted_dup_to_its_gate(spark):
    """Sequential-gate contract: byte-identical corpus copies (~cp) →
    exact-corpus; their second in-batch copies (~cp2) → exact-batch
    (lower-id twin wins); transcoded corpus twins (~re of c000) →
    near-corpus; the transcoded twin of a batch member (~re of c003) →
    near-batch; every original c003 clip admitted."""
    from use_case_real_time_anomaly_detection_spark.functions.audio_features import (
        audio_ingest_gate,
    )

    batch, corpus = _gate_fixture(spark)
    out = {r["clip_id"]: r["reason"] for r in audio_ingest_gate(batch, corpus).collect()}
    for cid, reason in out.items():
        if cid.endswith("~cp"):
            assert reason == "exact-corpus", (cid, reason)
        elif cid.endswith("~cp2"):
            assert reason == "exact-batch", (cid, reason)
        elif cid.startswith("c000") and cid.endswith("~re"):
            assert reason == "near-corpus", (cid, reason)
        elif cid.startswith("c003") and cid.endswith("~re"):
            assert reason == "near-batch", (cid, reason)
        else:
            assert reason == "admitted", (cid, reason)
    assert sum(r == "exact-corpus" for r in out.values()) == 5
    assert sum(r == "exact-batch" for r in out.values()) == 5
    assert sum(r == "near-corpus" for r in out.values()) >= 1
    assert sum(r == "near-batch" for r in out.values()) >= 1


def test_audio_ingest_gate_bootstrap_and_prebuilt_index(spark):
    """corpus=None (bootstrap) disables only the corpus gates; a
    prebuilt AudioIndex gives the identical verdict set as passing the
    corpus frame (the production incremental path)."""
    from use_case_real_time_anomaly_detection_spark.functions.audio_features import (
        audio_ingest_gate,
        build_audio_index,
    )

    batch, corpus = _gate_fixture(spark)
    boot = {r["clip_id"]: r["reason"] for r in audio_ingest_gate(batch, None).collect()}
    assert "exact-corpus" not in set(boot.values())
    assert "near-corpus" not in set(boot.values())
    assert sum(r == "exact-batch" for r in boot.values()) == 5
    # without the corpus gates, each ~cp twin survives gate 1 (it IS the
    # min id of its md5 group: '~cp' < '~cp2') and ~re twins of c000 now
    # dedup against nothing — they are admitted
    assert boot["c000-000000000~cp"] == "admitted"

    idx = build_audio_index(corpus)
    via_index = {
        r["clip_id"]: r["reason"]
        for r in audio_ingest_gate(batch, index=idx).collect()
    }
    via_corpus = {
        r["clip_id"]: r["reason"]
        for r in audio_ingest_gate(batch, corpus).collect()
    }
    assert via_index == via_corpus


def test_audio_topk_matches_numpy_and_ranks_source_first(spark):
    """Brute acoustic top-k == a numpy cosine oracle over the pandas
    twin (same ordering, cosines equal at the 4-digit contract), the
    query twin's pcm16 source ranks #1 at cosine ≈ 1, degenerate clips
    (not ok / silent) never appear, and the LSH probe returns a subset
    of the corpus ranked by the same exact cosine."""
    from use_case_real_time_anomaly_detection_spark.functions.audio_features import (
        audio_topk,
    )

    twin = audio_features_pandas(SPEC)
    usable = twin[twin["ok"] & (twin["peak"] > 0)].set_index("clip_id")
    qid = min(c for c in usable.index if c.endswith("~re"))
    qv = np.asarray(usable.loc[qid, "bands"], dtype=np.float64)

    def cos(v):
        v = np.asarray(v, dtype=np.float64)
        return float(v @ qv / (math.sqrt(v @ v) * math.sqrt(qv @ qv)))

    scored = sorted(
        ((round(cos(b), 4), cid) for cid, b in usable["bands"].items() if cid != qid),
        key=lambda t: (-t[0], t[1]),
    )
    want = [(cid, c) for c, cid in scored[:10]]

    feats = _spark_features(spark)
    got = [(r["clip_id"], r["cosine"]) for r in audio_topk(feats, qid, k=10).collect()]
    assert got == want
    # the transcode twin's source is the nearest clip, essentially exact
    assert got[0][0] == qid[: -len("~re")]
    assert got[0][1] >= 0.999
    bad = set(twin[~(twin["ok"] & (twin["peak"] > 0))]["clip_id"])
    assert not bad & {cid for cid, _ in got}

    lsh = [
        (r["clip_id"], r["cosine"])
        for r in audio_topk(feats, qid, k=10, method="lsh").collect()
    ]
    exact_rank = {cid: c for c, cid in scored}
    assert all(exact_rank[cid] == c for cid, c in lsh)
    assert [c for _, c in lsh] == sorted((c for _, c in lsh), reverse=True)
    # the probe still surfaces the planted twin source
    assert lsh and lsh[0][0] == qid[: -len("~re")]


def test_audio_topk_rejects_unusable_query(spark):
    from use_case_real_time_anomaly_detection_spark.functions.audio_features import (
        audio_topk,
    )

    feats = _spark_features(spark)
    with pytest.raises(ValueError, match="usable"):
        audio_topk(feats, "no-such-clip")
    with pytest.raises(ValueError, match="method"):
        audio_topk(feats, "c000-000000003~re", method="exact")
