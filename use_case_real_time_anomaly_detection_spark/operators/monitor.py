"""Meta-monitoring: the reference's anomaly detectors turned on the
engine's OWN metrics history.

The reference repo is an anomaly detector over (id, timestamp, value)
series; this engine's lineage table (streaming/checkpoint.CheckpointStore
— append-only verdict history: partition_key, detector, violation_count,
rows_checked, run_id, completed_at_seq) is exactly such a series: one
violation-rate observation per (partition × detector) per run. Pointing
the detectors at it closes the loop — the validation engine validates
its own trend line, catching slow corpus degradation that any single
run's pass/fail verdict cannot see (each run may individually stay under
the fail threshold while the rate quietly triples across a week).

Two complementary detectors over each (partition_key, detector) series,
ordered by (completed_at_seq, run_id), in ONE window pass (single
shuffle — the same plan shape as plans/detectors.running_z_score, whose
prefix-z semantics the z branch reproduces ≙ z_score.pipe's rolling
stats):

- ``zscore`` — this run's violation rate vs the mean/stddev_pop of ALL
  its series' PRIOR runs (self-excluded), flagged when |z| > threshold.
  Needs ≥ min_history prior runs and a non-degenerate history.
- ``step``   — prior history is CONSTANT (min == max over the prior
  frame — e.g. the common all-zeros steady state) and this run's rate
  moved off it. The z-score is undefined there (0/0), yet a first
  regression after a clean history is precisely the event worth paging
  on; zscore is NULL for these rows. Constancy is detected by exact
  min/max equality, NOT by accumulated mean/stddev: the cumulative avg
  of n identical doubles drifts in the last ulp for non-power-of-two n,
  which would flag every run of a perfectly flat series as a step.

Violation rate = violation_count / max(rows_checked, 1) — partition-level
detectors (drift, timeout) record rows_checked = 0 with violation_count
∈ {0, 1}, so their rate degrades to the raw 0/1 flag series and a first
failure after clean history surfaces as a step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lineage_anomalies(
    lineage: DataFrame,
    *,
    threshold: float = 2.0,
    min_history: int = 3,
) -> DataFrame:
    """Anomalous runs in the verdict-history table, one row per flagged
    (partition_key, detector, run_id). Columns: partition_key, detector,
    run_id, completed_at_seq, rate, prior_mean, zscore (NULL for step
    flags), kind ('zscore' | 'step'), is_latest (true iff this flag is
    the LAST observation of its deduped series — the page condition;
    computed here, on the SAME deduped frame the scoring uses, because a
    reused run-id's pessimistic dedup keeps the worst-rate row whose seq
    may not be the raw lineage max, so a consumer re-deriving 'latest'
    from raw lineage would silently drop the flag)."""
    if min_history < 1:
        raise ValueError(
            f"lineage_anomalies: min_history must be >= 1, got {min_history}"
        )
    rate = F.col("violation_count").cast("double") / F.greatest(
        F.col("rows_checked").cast("double"), F.lit(1.0)
    )
    series = lineage.select(
        "partition_key",
        "detector",
        "run_id",
        "completed_at_seq",
        rate.alias("rate"),
    )
    # a reused --run-id appends DUPLICATE rows for the same logical run
    # (the same hazard runner --diff-runs dedups): left in, a duplicated
    # spike contaminates its own twin's prior window and double-pages.
    # One observation per (series, run), pessimistic tie-break — the
    # worst recorded rate wins, so dedup can only make the gate stricter.
    from .limit_by import limit_by

    series = limit_by(
        series,
        ["partition_key", "detector", "run_id"],
        [F.col("rate").desc(), F.col("completed_at_seq").desc()],
        1,
    )
    w = (
        Window.partitionBy("partition_key", "detector")
        .orderBy("completed_at_seq", "run_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy("partition_key", "detector").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    obs = F.struct("completed_at_seq", "run_id")
    scored = series.select(
        "partition_key",
        "detector",
        "run_id",
        "completed_at_seq",
        "rate",
        F.avg("rate").over(w).alias("__mean"),
        F.stddev_pop("rate").over(w).alias("__std"),
        F.count("rate").over(w).alias("__n"),
        F.min("rate").over(w).alias("__mn"),
        F.max("rate").over(w).alias("__mx"),
        (obs == F.max(obs).over(wall)).alias("is_latest"),
    ).where(F.col("__n") >= min_history)
    flat = F.col("__mn") == F.col("__mx")  # exact — no accumulation error
    z = (F.col("rate") - F.col("__mean")) / F.col("__std")
    flagged = scored.where(
        (~flat & (F.col("__std") > 0) & (F.abs(z) > F.lit(threshold)))
        | (flat & (F.col("rate") != F.col("__mn")))
    )
    return flagged.select(
        "partition_key",
        "detector",
        "run_id",
        "completed_at_seq",
        "rate",
        F.round("__mean", 4).alias("prior_mean"),
        F.when(~flat, F.round(z, 4)).alias("zscore"),
        F.when(~flat, F.lit("zscore")).otherwise(F.lit("step")).alias("kind"),
        "is_latest",
    )
