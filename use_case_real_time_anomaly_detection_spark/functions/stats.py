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
                # explicit sum/sumsq moments, not F.stddev_pop: exact for
                # integer/quantized columns regardless of partial-agg
                # order, and a fixed IEEE op sequence the DuckDB oracle
                # mirrors (Welford streaming moments differ per engine in
                # the last ulp, which the driver's value hash would catch)
                cd = F.col(c).cast("double")
                mean = F.sum(cd) / F.count(c)
                add(
                    c,
                    "stddev_pop",
                    F.sqrt(
                        F.greatest(
                            F.sum(cd * cd) / F.count(c) - mean * mean, F.lit(0.0)
                        )
                    ),
                )
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

    # unpivot wide → long with stack(); null_rate folds into the same
    # stack (a union of `long` with a projection of `long` would make
    # Catalyst evaluate the aggregation — and the scan — twice)
    stack_items = []
    for c, stat in per_col:
        stack_items.append(f"'{c}', '{stat}', cast(`{c}::{stat}` as double)")
        if stat == "null_count":
            stack_items.append(
                f"'{c}', 'null_rate', cast(`{c}::{stat}` as double) / cast(__rows as double)"
            )
    n = len(stack_items)
    long = wide.select(
        "partition_key",
        F.col("__rows").alias("rows"),
        F.expr(f"stack({n}, {', '.join(stack_items)}) as (column, stat, value)"),
    )
    return long.select("partition_key", "column", "stat", "value", "rows")


def drift_scores(
    df: DataFrame,
    column: str,
    *,
    partition_col: str,
    bins: int = 20,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Per-partition KS + PSI of `column` vs a robust consensus baseline.

    The engine's drift math (operators/compiler.py DriftRule), exposed as
    a standalone operator so any table/axis can be scored and so the
    DuckDB oracle can verify it SQL-side (__spark_entry__.drift_events):

    - fixed equal-width bins over the global [min, max] (one cheap
      column-pruned driver agg fixes the edges);
    - per (partition, bin) counts — map-side partial agg, then a dense
      grid so empty buckets participate;
    - Laplace-smoothed fractions p = (n + 0.5) / (N + 0.5 * bins);
    - baseline q = per-bin MEDIAN of partition fractions, renormalized
      (robust to a minority of drifted partitions — a global mixture
      baseline would be contaminated by the very partitions under test);
    - PSI = Σ (p - q) ln(p / q); KS = max |CDF_p - CDF_q|.

    Returns (partition_key, psi, ks) for ALL partitions (thresholding is
    the caller's policy). NULLs in `column` are excluded.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    src = df.filter(F.col(column).isNotNull())
    if bounds is None:
        # one cheap column-pruned driver agg fixes the bin edges; callers
        # scoring several columns can batch these into a single agg and
        # pass `bounds` (operators/compiler.py does)
        mm = src.agg(F.min(column).alias("lo"), F.max(column).alias("hi")).collect()[0]
        bounds = (mm["lo"], mm["hi"])
    if bounds[0] is None:
        return spark.createDataFrame([], "partition_key string, psi double, ks double")
    lo, hi = float(bounds[0]), float(bounds[1])
    if hi <= lo:
        hi = lo + 1.0
    width = (hi - lo) / bins

    binned = src.select(
        F.col(partition_col).alias("pk"),
        F.least(
            F.lit(bins - 1),
            F.floor((F.col(column).cast("double") - F.lit(lo)) / F.lit(width)),
        ).alias("bin"),
    )
    # pin the histogram: ≤ partitions × bins rows, but consumed by FIVE
    # downstream subtrees (pks, grid join, median baseline ×2, cum sums)
    # — Catalyst does no cross-branch CSE, so without this every branch
    # re-scans the source column (measured: 6 FileScans per drift column)
    part_counts = (
        binned.groupBy("pk", "bin")
        .agg(F.count(F.lit(1)).alias("pn"))
        .localCheckpoint()
    )
    pks = part_counts.select("pk").distinct()
    bins_df = spark.range(bins).select(F.col("id").alias("bin"))
    grid = pks.crossJoin(F.broadcast(bins_df))
    h = grid.join(part_counts, ["pk", "bin"], "left").fillna(0, subset=["pn"])
    wpk = Window.partitionBy("pk")
    h = h.withColumn("pt", F.sum("pn").over(wpk))
    h = h.withColumn("p", (F.col("pn") + 0.5) / (F.col("pt") + 0.5 * bins))
    med = h.groupBy("bin").agg(F.expr("percentile(p, 0.5D)").alias("qraw"))
    med = med.crossJoin(F.broadcast(med.agg(F.sum("qraw").alias("qsum")))).select(
        "bin", (F.col("qraw") / F.col("qsum")).alias("q")
    )
    h = h.join(F.broadcast(med), "bin")
    h = h.withColumn(
        "psi_term", (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))
    )
    wcum = Window.partitionBy("pk").orderBy("bin")
    h = h.withColumn("pcum", F.sum("p").over(wcum)).withColumn(
        "qcum", F.sum("q").over(wcum)
    )
    return h.groupBy("pk").agg(
        F.sum("psi_term").alias("psi"),
        F.max(F.abs(F.col("pcum") - F.col("qcum"))).alias("ks"),
    ).select(F.col("pk").alias("partition_key"), "psi", "ks")
