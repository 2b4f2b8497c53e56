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
