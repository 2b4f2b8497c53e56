"""compact_partitions: bin-pack fragmented partitions (the maintenance
pass for the per-minute append cadence) without touching healthy ones."""

import glob

from pyspark.sql import functions as F

from use_case_real_time_anomaly_detection_spark.sources.tables import (
    ParquetCatalog,
    compact_partitions,
)


def _files(root, part):
    return glob.glob(f"{root}/t/partition_key={part}/part-*.parquet")


def _frag_table(spark, tmp_path, waves=6):
    cat = ParquetCatalog(spark, str(tmp_path))
    for w in range(waves):
        df = spark.createDataFrame(
            [("c000", f"id{w:02d}{i:03d}", w * 100 + i) for i in range(20)]
            + ([("c001", f"id{w:02d}{i:03d}", w * 100 + i) for i in range(20)]
               if w == 0 else []),
            "partition_key string, clip_id string, v long",
        ).coalesce(1)
        cat.append(df, "t", partition_by=["partition_key"])
    return cat


def test_compact_merges_fragmented_partition_only(spark, tmp_path):
    cat = _frag_table(spark, tmp_path)
    root = str(tmp_path)
    assert len(_files(root, "c000")) == 6
    assert len(_files(root, "c001")) == 1
    before = sorted(map(tuple, cat.read("t").collect()))

    stats = compact_partitions(cat, "t", ["partition_key"])
    assert stats["partitions_compacted"] == 1
    assert stats["files_before"] == 6 and stats["files_after"] == 1
    assert len(_files(root, "c000")) == 1
    assert len(_files(root, "c001")) == 1  # healthy partition untouched
    assert sorted(map(tuple, cat.read("t").collect())) == before

    # idempotent: a second pass finds nothing to do
    again = compact_partitions(cat, "t", ["partition_key"])
    assert again["partitions_compacted"] == 0
    assert sorted(map(tuple, cat.read("t").collect())) == before


def test_compact_respects_target_file_bytes(spark, tmp_path):
    """A partition whose bytes exceed the target splits into several
    shard files (one task writes each), not one monolith."""
    cat = _frag_table(spark, tmp_path, waves=8)
    root = str(tmp_path)
    per_file = sum(
        __import__("os").path.getsize(f) for f in _files(root, "c000")
    ) // 8
    stats = compact_partitions(
        cat, "t", ["partition_key"], target_file_bytes=int(per_file * 2.5)
    )
    assert stats["partitions_compacted"] == 1
    n = len(_files(root, "c000"))
    assert 2 <= n < 8 and n == stats["files_after"]
    # every row still present exactly once
    counts = cat.read("t").groupBy("partition_key", "clip_id").count()
    assert counts.filter(F.col("count") != 1).count() == 0


def test_compact_unpartitioned_whole_table(spark, tmp_path):
    """partition_by=[] → whole-table rewrite (the lineage-history case):
    eager pin decouples the read from the static overwrite, content is
    preserved, and a healthy table is a no-op."""
    cat = ParquetCatalog(spark, str(tmp_path))
    for w in range(12):
        cat.append(
            spark.createDataFrame(
                [(f"r{w}", i) for i in range(30)], "run string, v long"
            ).coalesce(1),
            "lineage",
        )
    before = sorted(map(tuple, cat.read("lineage").collect()))
    stats = compact_partitions(cat, "lineage", [])
    assert stats["files_before"] == 12 and stats["files_after"] == 1
    assert sorted(map(tuple, cat.read("lineage").collect())) == before
    again = compact_partitions(cat, "lineage", [])
    assert again["partitions_compacted"] == 0
