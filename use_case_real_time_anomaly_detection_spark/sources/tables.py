"""Table layer: partitioned, sorted, upsert-capable storage.

Maps the reference's storage engines to Spark table formats
(SURVEY.md §2.1 S2-S6):
- MergeTree + (timestamp, id) sorting key → partitioned parquet/Iceberg
  with write-ordered sort (min/max stats give equivalent data skipping);
- toYear()/toYYYYMM() partition keys → partition transforms (years/
  months) or, for the clip table, (codec, bucket(clip_id));
- ReplacingMergeTree + dedup MV → explicit dedup-before-append or
  MERGE INTO (Iceberg).

Iceberg needs the iceberg-spark-runtime jar; this container doesn't ship
it, so the provider is abstracted: `IcebergCatalog` is used when the jar
is present, else `ParquetCatalog` gives the same API over partitioned
parquet paths (identical logical behavior; Iceberg adds ACID commits +
snapshot time travel in production).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    """True only when a `local` Iceberg catalog is actually usable: the
    catalog must be configured AND the runtime class loadable.
    (py4j returns a JavaPackage stub for missing classes instead of
    raising, so attribute access alone is NOT a valid probe.)"""
    if spark.conf.get("spark.sql.catalog.local", None) is None:
        return False
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class ParquetCatalog:
    """Partitioned-parquet fallback with the table API the engine needs:
    create/append/read/overwrite_partitions (idempotent re-run)."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        return os.path.exists(self.path(name))

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.path(name))

    def append(
        self, df: DataFrame, name: str, partition_by: list[str] | None = None
    ) -> None:
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(name))

    def overwrite_partitions(
        self, df: DataFrame, name: str, partition_by: list[str]
    ) -> None:
        """Idempotent per-partition replace (dynamic partition overwrite) —
        the parquet analog of Iceberg's MERGE/replace-partition commit, and
        the mechanism that makes re-validating a partition idempotent
        (≙ the reference's at-least-once + dedup contract, SURVEY.md §2.8.4)."""
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_by)
            .parquet(self.path(name))
        )


class IcebergCatalog(ParquetCatalog):
    """Iceberg-backed tables (used when the runtime jar is on the
    classpath). Same API; append/overwrite become catalog commits:

        df.writeTo(f"local.{name}").append()
        spark.sql(f"MERGE INTO local.{name} t USING updates u ON ...")

    Partition spec for the clip table (FIXTURES.md §1):
        PARTITIONED BY (codec, bucket(8, clip_id))
    with write-ordered sort on clip_id so the (partition, seq) windows
    read pre-clustered data (≙ MergeTree sorting key, SURVEY.md S2).
    """

    def append(self, df, name, partition_by=None):  # pragma: no cover
        df.writeTo(f"local.{name}").append()

    def read(self, name):  # pragma: no cover
        return self.spark.table(f"local.{name}")


def get_catalog(spark: SparkSession, root: str):
    if iceberg_available(spark):  # pragma: no cover — jar not in container
        return IcebergCatalog(spark, root)
    return ParquetCatalog(spark, root)


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str = "clip_id",
    n_buckets: int = 8,
) -> None:
    """Save as a bucketed+sorted managed table (Hive-style bucketing).

    This is the parquet analog of Iceberg's `bucket(N, clip_id)`
    partition transform for JOIN co-location: two tables bucketed the
    same way on the join key (clips × manifest on clip_id — the one big
    join in the engine, operators/compiler.py manifest join) sort-merge
    join with NO shuffle exchange on either side — at 10^12 rows that
    removes the only full-table shuffle the validation plan would
    otherwise pay. Asserted by tests/test_plan_shapes.py.
    """
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def write_clips_layout(df: DataFrame, catalog: ParquetCatalog, name: str = "clips") -> None:
    """Write the clip table in its at-scale layout: partitioned by codec +
    an 8-way clip_id bucket, rows sorted by clip_id within files (so the
    sequence windows and min/max skipping line up with reads)."""
    bucketed = df.withColumn(
        "id_bucket", F.abs(F.hash("clip_id")) % 8
    ).sortWithinPartitions("clip_id")
    catalog.append(bucketed, name, partition_by=["codec", "id_bucket"])
