"""Column-stat profiling — per-partition aggregates in one pass.

Generalizes the reference's stats CTEs (avg/stddevPop per key —
tinybird/pipes/z_score.pipe:14-19; exact quartiles — iqr.pipe:31-33)
into the north rule's profiling surface: count, null rate, min/max,
approx-distinct (HyperLogLog++ via approx_count_distinct), plus numeric
moments and approx quartiles.

Shape: long format (partition_key, column, stat, value) so adding a
column never changes the schema. One groupBy ⇒ one shuffle for the whole
profile; every aggregate is a JVM built-in with map-side partial
aggregation (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.rules import ProfileSpec

NUMERIC_TYPES = {"int", "bigint", "smallint", "tinyint", "float", "double", "decimal"}


def profile_table(
    df: DataFrame, spec: ProfileSpec, *, partition_col: str = "partition_key"
) -> DataFrame:
    """Per (partition, column) stats, long format.

    Returns columns: partition_key, column, stat, value(double) — string
    min/max are profiled via length to stay in one numeric value column.
    """
    dtypes = dict(df.dtypes)
    cols = list(spec.columns) or [c for c in df.columns if c != partition_col]

    aggs = [F.count(F.lit(1)).alias("__rows")]
    per_col: list[tuple[str, str]] = []  # (column, stat) in output order

    def add(col_name: str, stat: str, expr) -> None:
        aggs.append(expr.alias(f"{col_name}::{stat}"))
        per_col.append((col_name, stat))

    for c in cols:
        t = dtypes.get(c, "")
        base = t.split("(")[0]
        add(c, "null_count", F.sum(F.col(c).isNull().cast("long")))
        add(c, "approx_distinct", F.approx_count_distinct(c, spec.hll_rsd).cast("double"))
        if base in NUMERIC_TYPES:
            add(c, "min", F.min(c).cast("double"))
            add(c, "max", F.max(c).cast("double"))
            if spec.extra_numeric_stats:
                add(c, "avg", F.avg(c))
                add(c, "stddev_pop", F.stddev_pop(c))
                add(c, "q1", F.percentile_approx(c, 0.25, 10000).cast("double"))
                add(c, "median", F.percentile_approx(c, 0.5, 10000).cast("double"))
                add(c, "q3", F.percentile_approx(c, 0.75, 10000).cast("double"))
        elif base == "string":
            add(c, "min_length", F.min(F.length(c)).cast("double"))
            add(c, "max_length", F.max(F.length(c)).cast("double"))
            add(c, "avg_length", F.avg(F.length(c)))
        elif base == "binary":
            add(c, "min_size", F.min(F.length(c)).cast("double"))
            add(c, "max_size", F.max(F.length(c)).cast("double"))
            add(c, "avg_size", F.avg(F.length(c)))

    wide = df.groupBy(F.col(partition_col).alias("partition_key")).agg(*aggs)

    # unpivot wide → long with stack(); null_rate derived from null_count
    stack_items = []
    for c, stat in per_col:
        stack_items.append(f"'{c}', '{stat}', cast(`{c}::{stat}` as double)")
    n = len(stack_items)
    long = wide.select(
        "partition_key",
        F.col("__rows").alias("rows"),
        F.expr(f"stack({n}, {', '.join(stack_items)}) as (column, stat, value)"),
    )
    null_rates = long.filter(F.col("stat") == "null_count").select(
        "partition_key",
        "rows",
        "column",
        F.lit("null_rate").alias("stat"),
        (F.col("value") / F.col("rows")).alias("value"),
    )
    return long.unionByName(null_rates).select(
        "partition_key", "column", "stat", "value", "rows"
    )
