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


def corr_profile(
    df: DataFrame,
    pairs: list,
    *,
    partition_col: str = "partition_key",
) -> DataFrame:
    """Per-partition Pearson correlation for each (x, y) column pair —
    the cross-column PROFILE companion to FdRule's hard dependency
    check: "transcript length tracks duration" is a statistical
    contract, not a functional one, and its per-partition correlation
    collapsing toward 0 is how a mis-paired (clip, transcript) delivery
    surfaces while every single-column stat stays healthy.

    Pairwise deletion: a row contributes only where BOTH columns are
    non-null (the n_pairs column reports how many). Computed from the
    five conditional sums in one fused groupBy (map-side combinable,
    ~1 output row per partition·pair):

        r = (n·Sxy − Sx·Sy) / (sqrt(n·Sxx − Sx²) · sqrt(n·Syy − Sy²))

    — a fixed IEEE op sequence over sums that are exact for integer /
    quantized columns, so the DuckDB oracle reproduces every double
    bit-for-bit (the profile_table determinism contract; F.corr's
    streaming co-moments differ per engine in the last ulp). Zero
    variance on either side → r NULL (undefined, not 0).
    """
    aggs = []
    for x, y in pairs:
        both = F.col(x).isNotNull() & F.col(y).isNotNull()
        xd = F.when(both, F.col(x).cast("double"))
        yd = F.when(both, F.col(y).cast("double"))
        p = f"{x}::{y}"
        aggs += [
            F.count(F.when(both, F.lit(1))).alias(f"__n_{p}"),
            F.sum(xd).alias(f"__sx_{p}"),
            F.sum(yd).alias(f"__sy_{p}"),
            F.sum(xd * yd).alias(f"__sxy_{p}"),
            F.sum(xd * xd).alias(f"__sxx_{p}"),
            F.sum(yd * yd).alias(f"__syy_{p}"),
        ]
    sums = df.groupBy(partition_col).agg(*aggs)

    parts = []
    for x, y in pairs:
        p = f"{x}::{y}"
        n = F.col(f"__n_{p}").cast("double")
        sx, sy = F.col(f"__sx_{p}"), F.col(f"__sy_{p}")
        sxy, sxx, syy = (
            F.col(f"__sxy_{p}"),
            F.col(f"__sxx_{p}"),
            F.col(f"__syy_{p}"),
        )
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        r = F.when(
            (vx > 0) & (vy > 0),
            (n * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy)),
        )
        parts.append(
            sums.select(
                F.col(partition_col),
                F.lit(x).alias("x_col"),
                F.lit(y).alias("y_col"),
                F.col(f"__n_{p}").alias("n_pairs"),
                r.alias("pearson_r"),
            )
        )
    from functools import reduce as _reduce

    return _reduce(DataFrame.unionByName, parts)


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
    - PSI = Σ (p - q) ln(p / q); KS = max |CDF_p - CDF_q|;
    - W1 (Wasserstein-1 / earth-mover) = Σ |CDF_p - CDF_q| · bin_width —
      the SCALE-AWARE complement: PSI and KS saturate once supports
      stop overlapping (a 1-bin shift and a 10-bin shift both score
      KS ≈ 1), while W1 keeps growing with HOW FAR the mass moved, in
      the column's own units (the standard discrete identity
      W1 = ∫|CDF_p − CDF_q|; both CDFs end at 1, so the last bin
      contributes ~0 and summing over all bins is exact).

    Returns (partition_key, psi, ks, w1) for ALL partitions
    (thresholding is the caller's policy). NULLs in `column` are
    excluded.
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
        # all-NULL column: keep the FULL result schema (incl. w1) so a
        # DriftRule with any fence set degrades to zero violations
        # instead of an UNRESOLVED_COLUMN crash downstream
        return spark.createDataFrame(
            [], "partition_key string, psi double, ks double, w1 double"
        )
    lo, hi = float(bounds[0]), float(bounds[1])
    if hi <= lo:
        hi = lo + 1.0
    width = (hi - lo) / bins

    binned = src.select(
        F.col(partition_col).alias("pk"),
        # clamp BOTH ends: callers may pass `bounds` from an external
        # source (profile state, column stats) that is narrower than the
        # live data — without the floor-at-0 clamp such rows would land
        # in negative bins and silently vanish at the dense-grid join
        F.greatest(
            F.lit(0),
            F.least(
                F.lit(bins - 1),
                F.floor((F.col(column).cast("double") - F.lit(lo)) / F.lit(width)),
            ),
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
        # Σ|ΔCDF| first, ONE multiply by the width last — the same IEEE
        # op order as drift_from_states' state path, so the two stay
        # bit-comparable under the parity test
        (F.sum(F.abs(F.col("pcum") - F.col("qcum"))) * F.lit(width)).alias("w1"),
    ).select(F.col("pk").alias("partition_key"), "psi", "ks", "w1")


def categorical_scores(
    df: DataFrame,
    column: str,
    *,
    partition_col: str,
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-partition PSI + Shannon entropy of a CATEGORICAL column's
    value mix — the unordered-domain sibling of :func:`drift_scores`
    (codec / sr_hz-mode mixes have no bin order, so KS is meaningless
    and the histogram is the value domain itself).

    Same robust-baseline construction as drift_scores:

    - per (partition, value) counts — map-side partial agg, then a dense
      partition × domain grid so absent categories participate;
    - Laplace-smoothed shares p = (n + α) / (N + α·V), α = `smoothing`,
      V = |observed domain|;
    - baseline q = per-category MEDIAN of partition shares, renormalized
      (robust to a minority of drifted partitions);
    - PSI = Σ (p − q) ln(p / q);
    - entropy H = −Σ (n/N) ln(n/N) over the UNsmoothed observed mix
      (zero-count categories contribute 0; a single-valued partition
      scores exactly 0.0).

    Returns (partition_key, psi, entropy) for ALL partitions
    (thresholding is the caller's policy). NULLs in `column` are
    excluded. Scale shape: the count frame is ≤ partitions × V rows and
    is localCheckpoint-pinned because four downstream subtrees consume
    it (Catalyst does no cross-branch CSE — same measured pathology as
    drift_scores' histogram).
    """
    from pyspark.sql import Window

    src = df.filter(F.col(column).isNotNull()).select(
        F.col(partition_col).alias("pk"),
        F.col(column).cast("string").alias("value"),
    )
    counts = (
        src.groupBy("pk", "value")
        .agg(F.count(F.lit(1)).alias("pn"))
        .localCheckpoint()
    )
    pks = counts.select("pk").distinct()
    vals = counts.select("value").distinct()
    nvals = vals.agg(F.count(F.lit(1)).alias("nv"))
    grid = pks.crossJoin(F.broadcast(vals))
    h = grid.join(counts, ["pk", "value"], "left").fillna(0, subset=["pn"])
    h = h.crossJoin(F.broadcast(nvals))
    wpk = Window.partitionBy("pk")
    h = h.withColumn("pt", F.sum("pn").over(wpk))
    h = h.withColumn(
        "p",
        (F.col("pn") + F.lit(smoothing))
        / (F.col("pt") + F.lit(smoothing) * F.col("nv")),
    )
    med = h.groupBy("value").agg(F.expr("percentile(p, 0.5D)").alias("qraw"))
    med = med.crossJoin(F.broadcast(med.agg(F.sum("qraw").alias("qsum")))).select(
        "value", (F.col("qraw") / F.col("qsum")).alias("q")
    )
    h = h.join(F.broadcast(med), "value")
    h = h.withColumn(
        "psi_term", (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))
    )
    share = F.col("pn") / F.col("pt")
    h = h.withColumn(
        "ent_term",
        F.when(F.col("pn") > 0, -share * F.log(share)).otherwise(F.lit(0.0)),
    )
    return h.groupBy("pk").agg(
        F.sum("psi_term").alias("psi"),
        F.sum("ent_term").alias("entropy"),
    ).select(F.col("pk").alias("partition_key"), "psi", "entropy")


# --- incremental / mergeable profiling --------------------------------------


def profile_state(
    df: DataFrame,
    *,
    partition_col: str = "partition_key",
    numeric_columns: tuple[str, ...] | list[str] = (),
    distinct_columns: tuple[str, ...] | list[str] = (),
    histogram_columns: dict[str, tuple[float, float, int]] | None = None,
    lg_config_k: int = 12,
) -> DataFrame:
    """One MERGEABLE profile-state row per partition: exact decimal
    moments for numeric columns plus a Datasketches HLL binary per
    distinct-counted column.

    The 100 TB shape this enables: global corpus stats maintained
    INCREMENTALLY. Each partition's state is computed from one scan of
    that partition only; `merge_profile_states` rolls the global profile
    up from the slim state table (O(partitions) rows) — re-profiling
    after a partition lands or is re-validated costs one partition scan
    + a rollup that never touches the corpus. This is the profiling
    analog of the lineage-resume contract (streaming/checkpoint.py): the
    reference recomputes its stats CTEs per query
    (tinybird/pipes/z_score.pipe:14-19); at 10^12 rows that recompute is
    the cost being engineered away.

    Mergeability per stat — every one is algebraic, no holistic aggregate:
    - rows / nonnull: longs, merge = sum
    - min / max: doubles, merge = min / max
    - sum / sumsq: EXACT decimal(38,2)/(38,4) sums (values are quantized
      ~2-decimal; decimal addition is associative, so the merged moments
      are bit-identical regardless of partition order — the same
      float-parity discipline as profile_table's stddev)
    - distinct: HLL sketch binary, merge = register-wise max (union);
      exact while the sketch is in its coupon-list regime, ~1.6%/sqrt-k
      beyond (callers pick which columns get a sketch accordingly)

    Quantiles: Spark exposes no mergeable quantile state as a binary
    (percentile_approx is holistic per query), so `histogram_columns`
    carries a fixed-bin histogram instead — `{col: (lo, hi, nbins)}`
    counts per equal-width bin (out-of-range values clamp to the edge
    bins), merged by element-wise sum, quantiles estimated by linear
    interpolation within the covering bin (error ≤ one bin width). The
    bounds are part of the state (self-describing), and MUST be held
    fixed across runs for states to merge — the same fixed-grid contract
    as drift_scores' bins.
    """
    histogram_columns = dict(histogram_columns or {})
    aggs: list = [F.count(F.lit(1)).alias("rows")]
    for c in numeric_columns:
        vd = F.col(c).cast("decimal(18,2)")
        aggs += [
            F.count(c).alias(f"{c}__nonnull"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
            F.sum(vd).cast("decimal(38,2)").alias(f"{c}__sum"),
            F.sum(vd * vd).cast("decimal(38,4)").alias(f"{c}__sumsq"),
        ]
    for c in distinct_columns:
        aggs.append(
            F.hll_sketch_agg(F.col(c).cast("string"), F.lit(lg_config_k)).alias(
                f"{c}__hll"
            )
        )
    for c, (lo, hi, nbins) in histogram_columns.items():
        width = (float(hi) - float(lo)) / int(nbins)
        b = F.floor((F.col(c).cast("double") - F.lit(float(lo))) / F.lit(width))
        b = F.least(F.greatest(b, F.lit(0)), F.lit(int(nbins) - 1))
        aggs += [
            F.sum(
                F.when(F.col(c).isNotNull() & (b == i), 1).otherwise(0)
            ).cast("long").alias(f"{c}__hb{i}")
            for i in range(int(nbins))
        ]
    out = df.groupBy(F.col(partition_col).alias("partition_key")).agg(*aggs)
    for c, (lo, hi, nbins) in histogram_columns.items():
        bins = [f"{c}__hb{i}" for i in range(int(nbins))]
        out = (
            out.withColumn(f"{c}__hist", F.array(*bins))
            .withColumn(f"{c}__hlo", F.lit(float(lo)))
            .withColumn(f"{c}__hhi", F.lit(float(hi)))
            .drop(*bins)
        )
    return out


def combine_profile_states(states: DataFrame) -> DataFrame:
    """Pairwise (n-wise) merge of profile-state rows PER PARTITION: many
    state rows per partition_key in → exactly one out, same schema.

    This is the accumulation primitive the streaming path needs: each
    micro-batch profiles only the rows it delivered, so a partition's
    true state is the merge of all its batch states. merge_profile_states
    rolls everything up to ONE global long-format profile; this keeps the
    per-partition grain so the result can be stored back as the state
    table (and drift_from_states can score it).

    Merge algebra per stat (the profile_state contract): rows/nonnull
    sum; min/max min/max; sum/sumsq EXACT decimal sums (order-invariant);
    HLL sketches register-wise union (hll_union_agg — identical registers
    to sketching the union directly at equal lgK, so estimates are
    bit-equal, not merely close); histograms element-wise long sums.
    __hlo/__hhi ride along via first() — the fixed-grid merge contract
    (profile_state's docstring) makes them constant per column.

    Stat fields are introspected from the schema like
    merge_profile_states, so old states merge without re-declaration.
    """
    numeric = [f.rsplit("__", 1)[0] for f in states.columns if f.endswith("__sum")]
    distinct = [f.rsplit("__", 1)[0] for f in states.columns if f.endswith("__hll")]
    hist = [f.rsplit("__", 1)[0] for f in states.columns if f.endswith("__hist")]

    aggs: list = [F.sum("rows").alias("rows")]
    for c in numeric:
        aggs += [
            F.sum(f"{c}__nonnull").alias(f"{c}__nonnull"),
            F.min(f"{c}__min").alias(f"{c}__min"),
            F.max(f"{c}__max").alias(f"{c}__max"),
            F.sum(f"{c}__sum").cast("decimal(38,2)").alias(f"{c}__sum"),
            F.sum(f"{c}__sumsq").cast("decimal(38,4)").alias(f"{c}__sumsq"),
        ]
    for c in distinct:
        aggs.append(
            F.hll_union_agg(f"{c}__hll", F.lit(True)).alias(f"{c}__hll")
        )
    for c in hist:
        # element-wise sum of the dense per-bin arrays; collect_list's
        # order-nondeterminism is immaterial under a commutative sum
        aggs += [
            F.collect_list(f"{c}__hist").alias(f"__hl_{c}"),
            F.first(f"{c}__hlo").alias(f"{c}__hlo"),
            F.first(f"{c}__hhi").alias(f"{c}__hhi"),
        ]
    out = states.groupBy("partition_key").agg(*aggs)
    for c in hist:
        out = out.withColumn(
            f"{c}__hist",
            F.aggregate(
                f"__hl_{c}",
                F.expr("cast(array() as array<bigint>)"),
                lambda acc, x: F.when(F.size(acc) == 0, x).otherwise(
                    F.zip_with(acc, x, lambda a, b: a + b)
                ),
            ),
        ).drop(f"__hl_{c}")
    # restore profile_state's column order so unionByName-free consumers
    # (and parquet schema evolution) see a stable layout
    return out.select(*states.columns)


def merge_profile_states(states: DataFrame) -> DataFrame:
    """Global long-format profile (column, stat, value:double) from
    per-partition mergeable states — reads ONLY the slim state table.

    Stat fields are introspected from the state schema (`<col>__<stat>`
    names), so states written by an earlier run / release merge without
    the caller re-declaring the column lists."""
    numeric = [f.rsplit("__", 1)[0] for f in states.columns if f.endswith("__sum")]
    distinct = [f.rsplit("__", 1)[0] for f in states.columns if f.endswith("__hll")]

    aggs: list = [F.sum("rows").alias("rows")]
    for c in numeric:
        aggs += [
            F.sum(f"{c}__nonnull").alias(f"{c}__nonnull"),
            F.min(f"{c}__min").alias(f"{c}__min"),
            F.max(f"{c}__max").alias(f"{c}__max"),
            F.sum(f"{c}__sum").alias(f"{c}__sum"),
            F.sum(f"{c}__sumsq").alias(f"{c}__sumsq"),
        ]
    for c in distinct:
        aggs.append(
            F.hll_sketch_estimate(
                F.hll_union_agg(f"{c}__hll", F.lit(True))
            ).alias(f"{c}__nd")
        )
    g = states.agg(*aggs)

    # long projection: one row per (column, stat)
    rows_expr: list = []
    rows_expr.append(("_table_", "rows", F.col("rows").cast("double")))
    for c in numeric:
        nn = F.col(f"{c}__nonnull")
        mean = F.col(f"{c}__sum").cast("double") / nn
        var = F.col(f"{c}__sumsq").cast("double") / nn - mean * mean
        rows_expr += [
            (c, "null_count", (F.col("rows") - nn).cast("double")),
            (c, "null_rate", (F.col("rows") - nn).cast("double") / F.col("rows")),
            (c, "min", F.col(f"{c}__min")),
            (c, "max", F.col(f"{c}__max")),
            (c, "avg", mean),
            (c, "stddev_pop", F.sqrt(F.greatest(var, F.lit(0.0)))),
        ]
    for c in distinct:
        rows_expr.append((c, "n_distinct", F.round(F.col(f"{c}__nd"))))

    structs = F.array(
        *[
            F.struct(
                F.lit(col).alias("column"), F.lit(stat).alias("stat"), v.alias("value")
            )
            for col, stat, v in rows_expr
        ]
    )
    long = g.select(F.explode(structs).alias("s")).select(
        "s.column", "s.stat", "s.value"
    )
    hist = [f.rsplit("__", 1)[0] for f in states.columns if f.endswith("__hist")]
    for c in hist:
        long = long.unionByName(_hist_quantile_rows(states, c))
    return long


def _hist_quantile_rows(
    states: DataFrame, c: str, qs: tuple[float, ...] = (0.25, 0.5, 0.75)
) -> DataFrame:
    """(column, stat, value) quantile estimates from the element-wise sum
    of per-partition fixed-bin histograms: the covering bin is the first
    with cumulative count ≥ q·N, interpolated linearly within the bin.
    Everything operates on the slim (partitions × bins) relation — at any
    corpus size this is a driver-sized computation expressed as
    DataFrame ops."""
    from pyspark.sql import Window

    h = states.select(
        F.posexplode(f"{c}__hist").alias("bin", "cnt"),
        F.col(f"{c}__hlo").alias("lo"),
        F.col(f"{c}__hhi").alias("hi"),
    )
    merged = h.groupBy("bin").agg(
        F.sum("cnt").alias("n"),
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    merged = merged.withColumn("cum", F.sum("n").over(w))
    totals = merged.agg(
        F.sum("n").alias("total_n"), F.count(F.lit(1)).alias("nbins")
    )
    m = merged.crossJoin(F.broadcast(totals))
    out = None
    for q, stat in zip(qs, ("approx_q25", "approx_median", "approx_q75")):
        target = F.col("total_n") * F.lit(q)
        width = (F.col("hi") - F.col("lo")) / F.col("nbins")
        val = F.col("lo") + width * (
            F.col("bin") + (target - (F.col("cum") - F.col("n"))) / F.col("n")
        )
        row = (
            m.filter((F.col("cum") >= target) & (F.col("n") > 0))
            .orderBy("bin")
            .limit(1)
            .select(
                F.lit(c).alias("column"),
                F.lit(stat).alias("stat"),
                val.alias("value"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def topk_values(
    df: DataFrame,
    columns: list,
    *,
    k: int = 5,
    partition_col: str = "partition_key",
) -> DataFrame:
    """Frequent-items profile: the top-k most frequent values per
    (partition, column), with counts — the categorical complement of
    profile_table's numeric stats (a codec mix flipping from 90/10 to
    50/50 is invisible to min/max/null-rate but obvious here; the
    reference surfaces exactly this as its per-detector GROUP BY counts,
    tinybird/pipes/anomalies_summary_api.pipe).

    Output: (partition_key, column, value:string, n, rank), rank 1..k by
    (count DESC, value ASC) — the value tie-break makes the relation
    deterministic, so it is diffable across runs and engine-comparable.

    Scale shape: one unpivot projection (no shuffle) → one partial-agg
    groupBy per (partition, column, value) → a rank window over groups
    of at most |distinct values| rows. Exact counting is the right call
    for the categorical columns this profiles (codec, sr_hz: tiny
    domains); for genuinely high-cardinality columns the groupBy state
    is the full domain per partition — cap those with a domain check
    (ValueSetRule) or profile approx_distinct instead, as noted here
    rather than silently sketching.
    """
    from pyspark.sql import Window

    pairs = []
    for c in columns:
        pairs += [F.lit(c), F.col(c).cast("string")]
    unpivoted = df.select(
        F.col(partition_col),
        F.explode(F.create_map(*pairs)).alias("column", "value"),
    ).filter(F.col("value").isNotNull())
    counts = unpivoted.groupBy(partition_col, "column", "value").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy(partition_col, "column").orderBy(
        F.col("n").desc(), F.col("value").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(partition_col, "column", "value", "n", "rank")
    )


def drift_from_states(states: DataFrame, column: str) -> DataFrame:
    """KS/PSI/W1 drift per partition computed from the MERGEABLE profile
    states' stored histograms — zero corpus IO.

    `drift_scores` re-bins the raw column every run; at 10^12 rows that
    is a full-corpus scan per drift check. The checkpointed state table
    (profile_state's `{column}__hist`, maintained per validated
    partition by every runner invocation) already holds the fixed-grid
    per-partition histograms, so the entire drift computation collapses
    to O(partitions x bins) rows of arithmetic over the slim state
    table. The scoring math is drift_scores' stage-for-stage: Laplace
    smoothing (n + 0.5)/(N + 0.5*bins), per-bin median consensus
    baseline renormalized, PSI = Σ(p-q)ln(p/q), KS = max |ΔCDF| —
    parity with drift_scores over the same grid is test-asserted.

    The one semantic difference is the GRID: drift_scores bins over the
    current run's global [min, max]; the state grid is the FIXED
    (lo, hi, nbins) declared when the state was first written (the
    merge contract). Fixed grids are what make run-over-run drift
    comparable anyway — the bounds travel inside the state
    (`{column}__hlo/__hhi`), self-describing.

    Bin count is derived from the stored array per partition (no
    driver probe, no parameter to keep in sync).
    """
    from pyspark.sql import Window

    # NULL-hist state rows (the column was never histogram-profiled for
    # that partition) would be SILENTLY dropped by posexplode; filter them
    # explicitly so the omission is a stated contract, not an accident.
    h = states.filter(F.col(f"{column}__hist").isNotNull()).select(
        F.col("partition_key").alias("pk"),
        F.posexplode(F.col(f"{column}__hist")).alias("bin", "pn"),
        # the self-describing grid bounds ride along so W1 can be
        # expressed in the column's own units (bin_width = (hi-lo)/nb)
        F.col(f"{column}__hlo").alias("hlo"),
        F.col(f"{column}__hhi").alias("hhi"),
    )
    # the stored array is dense (every bin present, zeros included), so
    # no grid join is needed; nb == nbins recovers the smoothing constant
    wpk = Window.partitionBy("pk")
    h = h.withColumn("pt", F.sum("pn").over(wpk)).withColumn(
        "nb", F.count("pn").over(wpk)
    )
    # degenerate states: a partition whose histogram is all zeros (the
    # column was entirely NULL there) has no distribution to score —
    # drift_scores omits such partitions (no rows survive its binning),
    # so omit them here too instead of scoring a uniform smoothed p that
    # would also contaminate the median consensus baseline
    h = h.filter(F.col("pt") > 0)
    h = h.withColumn("p", (F.col("pn") + 0.5) / (F.col("pt") + 0.5 * F.col("nb")))
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
    # same op order as drift_scores: Σ|ΔCDF| first, one multiply by the
    # (per-state, self-described) bin width last
    width = (F.first("hhi") - F.first("hlo")) / F.first("nb")
    return (
        h.groupBy("pk")
        .agg(
            F.sum("psi_term").alias("psi"),
            F.max(F.abs(F.col("pcum") - F.col("qcum"))).alias("ks"),
            (F.sum(F.abs(F.col("pcum") - F.col("qcum"))) * width).alias("w1"),
        )
        .select(F.col("pk").alias("partition_key"), "psi", "ks", "w1")
    )


def bounds_from_states(states: DataFrame, columns: list[str]) -> dict:
    """Global [min, max] per numeric column from the slim profile-state
    table — ZERO corpus IO.

    The drift bin-edge agg (compile_rules' one driver collect over all
    DriftRule columns) is the only per-run full-corpus scan a
    DriftRule-carrying ruleset adds; at 10^12 rows it is avoidable
    whenever the checkpointed state table (maintained per validated
    partition by every runner invocation — CheckpointStore.
    record_profile) covers the table: min over the states' ``{c}__min``
    / max over ``{c}__max`` IS the exact corpus min/max (the states are
    exact mergeable moments, not sketches). One agg over
    O(partitions) rows serves every drift column at once.

    Columns without state fields, or whose state min/max are NULL
    (never profiled / all-NULL column), are omitted from the result —
    the caller falls back to the corpus agg for those (cold start).
    """
    have = set(states.columns)
    usable = [c for c in columns if f"{c}__min" in have and f"{c}__max" in have]
    if not usable:
        return {}
    aggs = []
    for c in usable:
        aggs += [
            F.min(f"{c}__min").alias(f"__lo_{c}"),
            F.max(f"{c}__max").alias(f"__hi_{c}"),
        ]
    row = states.agg(*aggs).collect()[0]
    out = {}
    for c in usable:
        lo, hi = row[f"__lo_{c}"], row[f"__hi_{c}"]
        if lo is not None and hi is not None:
            out[c] = (float(lo), float(hi))
    return out
