"""ClickHouse ``LIMIT n BY key`` → Spark rewrite.

The one reference operator with no direct Spark counterpart
(SURVEY.md §2.5 W3/W4): after an ORDER BY, keep the first n rows per key
(reference uses it for latest-event-per-sensor — tinybird/pipes/
timeout.pipe:22-23, most_recent.pipe:14-15 — and for per-sensor log
throttling — copy_out_of_range.pipe:46-47). Compiled to a row_number()
window + filter, which is the reference's own documented alternative
formulation (content/timeout.md:95-117).

One shuffle by key; at clip-table scale the key is the physical partition
key so the exchange is co-partitioned with the table layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def limit_by(
    df: DataFrame,
    keys: list[str],
    order: list[Column],
    n: int = 1,
    row_col: str = "__rn",
) -> DataFrame:
    """Keep the first ``n`` rows per ``keys`` group under ``order``."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(row_col, F.row_number().over(w))
        .filter(F.col(row_col) <= n)
        .drop(row_col)
    )


def capped_limit_by(
    df: DataFrame,
    keys: list[str],
    order: list[Column],
    n: int,
) -> DataFrame:
    """Skew-proof ``limit_by`` for groups that can be arbitrarily hot.

    A single window partitioned by ``keys`` sends EVERY row of a group
    through one task — fine for the engine's composite-key dedup (groups
    are per-clip, ~2 rows), fatal for evidence capping where one fully-
    drifted (partition, detector) group can hold 10^9 violation rows.
    Two phases bound the hot key:

    1. local pre-cap — window over (keys, spark_partition_id()): each
       exchange key holds at most one input split's rows for the group
       (≤ maxPartitionBytes worth), and the filter leaves ≤ n rows per
       (group, split);
    2. global cap — ordinary ``limit_by`` over the survivors, whose
       largest group is now ≤ n × input-splits rows, not the raw group.

    Result equals the single-window formulation whenever ``order`` is a
    total order within each group (the engine orders by the unique
    clip_id): phase 1 can only drop rows that phase 2 would drop anyway,
    since the n global winners survive any per-split top-n.
    """
    pre = Window.partitionBy(*keys, "__split").orderBy(*order)
    local = (
        df.withColumn("__split", F.spark_partition_id())
        .withColumn("__rn", F.row_number().over(pre))
        .filter(F.col("__rn") <= n)
        .drop("__split", "__rn")
    )
    return limit_by(local, keys, order, n)
