"""Streaming profile-state accumulation + zero-corpus-IO drift gate.

combine_profile_states is the accumulation primitive: many batch state
rows per partition merge to one, bit-identical to profiling the union
directly (exact decimal sums, HLL register unions, element-wise hist
adds). The streaming pipeline writes per-(partition, batch) state rows
(replay-idempotent) and gates drift off the merged view each cycle.
"""

from pyspark.sql import functions as F

from use_case_real_time_anomaly_detection_spark.functions.stats import (
    combine_profile_states,
    profile_state,
)
from use_case_real_time_anomaly_detection_spark.sources.tables import ParquetCatalog
from use_case_real_time_anomaly_detection_spark.streaming.checkpoint import (
    CheckpointStore,
)

KW = dict(
    partition_col="pk",
    numeric_columns=["value"],
    distinct_columns=["user_id", "event_type"],
    histogram_columns={"value": (0.0, 200.0, 20)},
)


def _events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "pk", F.pmod("user_id", F.lit(8)).cast("string")
    )


def test_combine_profile_states_equals_direct(spark):
    """Merging wave-split states == profiling the whole table: exact for
    counts/min/max/decimal moments/histograms; HLL estimates equal
    because register-wise union at equal lgK gives identical registers."""
    import pandas as pd

    ev = _events(spark)
    direct = profile_state(ev, **KW)
    comb = combine_profile_states(
        profile_state(ev.filter("event_id % 3 = 0"), **KW)
        .unionByName(profile_state(ev.filter("event_id % 3 = 1"), **KW))
        .unionByName(profile_state(ev.filter("event_id % 3 = 2"), **KW))
    )
    for c in ["user_id", "event_type"]:
        de = (
            direct.select("partition_key", F.hll_sketch_estimate(f"{c}__hll").alias("e"))
            .orderBy("partition_key").toPandas()
        )
        ce = (
            comb.select("partition_key", F.hll_sketch_estimate(f"{c}__hll").alias("e"))
            .orderBy("partition_key").toPandas()
        )
        pd.testing.assert_frame_equal(de, ce)
    dp = direct.orderBy("partition_key").toPandas()
    cp = comb.orderBy("partition_key").toPandas()
    rest = [c for c in dp.columns if not c.endswith("__hll")]
    pd.testing.assert_frame_equal(
        dp[rest].reset_index(drop=True), cp[rest].reset_index(drop=True)
    )


def test_record_profile_batch_replay_idempotent(spark, tmp_path):
    """A replayed batch overwrites its own (pk, batch) rows — the merged
    view equals the direct profile, never a double count."""
    import pandas as pd

    ev = _events(spark)
    w0 = profile_state(ev.filter("event_id % 2 = 0"), **KW).withColumnRenamed(
        "partition_key", "partition_key"
    )
    w1 = profile_state(ev.filter("event_id % 2 = 1"), **KW)
    store = CheckpointStore(ParquetCatalog(spark, str(tmp_path / "wh")))
    store.record_profile_batch(w0, 0)
    store.record_profile_batch(w0, 0)  # at-least-once replay
    store.record_profile_batch(w1, 1)
    merged = store.streamed_profile_states()
    direct = profile_state(ev, **KW)
    rest = [c for c in direct.columns if not c.endswith("__hll")]
    pd.testing.assert_frame_equal(
        direct.select(rest).orderBy("partition_key").toPandas().reset_index(drop=True),
        merged.select(rest).orderBy("partition_key").toPandas().reset_index(drop=True),
    )


def test_stream_profile_accumulates_and_drift_gates(spark, tmp_path):
    """Two file-arrival waves: the streamed state accumulates across
    batches (per-partition rows equal the full corpus counts) and the
    per-batch drift gate flags exactly the planted drift partition on
    dur_ms once all partitions are represented."""
    from use_case_real_time_anomaly_detection_spark.plans.clips import default_rules
    from use_case_real_time_anomaly_detection_spark.sources.synth import (
        CLIPS_SCHEMA,
        SynthSpec,
        generate_clips,
        generate_manifest,
    )
    from use_case_real_time_anomaly_detection_spark.streaming.pipeline import (
        stream_clips_validation,
    )

    spec = SynthSpec(partitions=4, clips_per_partition=120)
    clips = generate_clips(spark, spec).cache()
    manifest = generate_manifest(spark, spec).cache()
    src = str(tmp_path / "clip_stream")
    ckpt = str(tmp_path / "clip_ckpt")
    store = CheckpointStore(ParquetCatalog(spark, str(tmp_path / "wh")))

    def run_wave():
        stream = spark.readStream.schema(CLIPS_SCHEMA).parquet(src)
        q = stream_clips_validation(
            stream, manifest, store,
            checkpoint_dir=ckpt, rules=default_rules(with_audio=False),
            profile=True, drift_on="dur_ms", drift_psi=0.25,
        )
        q.awaitTermination(300)

    part = F.substring("clip_id", 1, 4)
    clips.filter(part.isin("c000", "c003")).write.mode("append").parquet(src)
    run_wave()
    st1 = store.streamed_profile_states()
    assert {r["partition_key"] for r in st1.select("partition_key").collect()} == {
        "c000", "c003"
    }

    clips.filter(part.isin("c001", "c002")).write.mode("append").parquet(src)
    run_wave()
    st2 = store.streamed_profile_states().orderBy("partition_key").toPandas()
    # accumulated rows == full corpus rows per partition
    expect = (
        clips.withColumn("partition_key", part)
        .groupBy("partition_key").count()
        .orderBy("partition_key").toPandas()
    )
    assert st2["partition_key"].tolist() == expect["partition_key"].tolist()
    assert st2["rows"].tolist() == expect["count"].tolist()

    # drift gate: the latest batch's flags name exactly the planted
    # dur_ms-drift partition (c001, +300 ms shift)
    flags = store.catalog.read("drift_stream")
    latest = flags.filter(
        (F.col("batch_id") == flags.agg(F.max("batch_id")).collect()[0][0])
        & F.col("partition_key").isNotNull()  # drop the batch marker row
    )
    assert {r["partition_key"] for r in latest.select("partition_key").collect()} == {
        "c001"
    }
    clips.unpersist()
    manifest.unpersist()


def test_record_drift_batch_clean_batch_advances_latest(spark, tmp_path):
    """A batch with ZERO flags still writes its batch_id leaf (marker
    row), so max(batch_id) tracks the latest PROCESSED batch — a cleared
    drift must not leave a stale flag presenting as current."""
    store = CheckpointStore(ParquetCatalog(spark, str(tmp_path / "wh")))
    flags = spark.createDataFrame(
        [("c001", 9.9, 0.9)], "partition_key string, psi double, ks double"
    )
    store.record_drift_batch(flags, 0)
    store.record_drift_batch(flags.limit(0), 1)  # clean batch
    t = store.catalog.read("drift_stream")
    latest = t.agg(F.max("batch_id")).collect()[0][0]
    assert latest == 1
    cur = t.filter(
        (F.col("batch_id") == latest) & F.col("partition_key").isNotNull()
    )
    assert cur.count() == 0  # nothing CURRENTLY flagged
    # history retains batch 0's flag
    assert (
        t.filter(F.col("partition_key").isNotNull()).count() == 1
    )
