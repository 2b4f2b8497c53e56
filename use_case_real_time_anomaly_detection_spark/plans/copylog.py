"""The unified violations log over the (id, ts, value) shape.

≙ the reference's copy-pipe architecture (SURVEY.md §3.2): five copy
pipes shape their detector output to the common 5-column log schema
(id, timestamp, value, anomaly_type, note) and append into
copy_log_duplicates every minute (copy_out_of_range.pipe:36-51); a
materialized view dedups by (timestamp, id, anomaly_type) into copy_log
(dedup_log.pipe:4-6); consumer endpoints read the deduped log
(get_anomalies.pipe, monitor_logs.pipe).

Here the five detectors are evaluated in ONE pass each, unioned
(O5: implicit UNION ALL into the common schema), deduped (O4), and the
whole thing is a single lazy plan — no per-minute re-scans. Note strings
reproduce the reference's formats byte-for-byte (content/copies-pipes.md:54-63).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import detectors as D


def _s(col, digits: int = 2):
    """toString(ROUND(x, d)) — the reference's note-number idiom."""
    return F.round(col.cast("double"), digits).cast("string")


def violations_log(
    events: DataFrame,
    frontier,
    *,
    min_value: float = 1.0,
    max_value: float = 180.0,
    max_slope: float = 0.005,
    timeout_seconds: int = 2 * D.SECONDS_PER_DAY,
    zscore_threshold: float = 2.0,
    iqr_multiplier: float = 1.5,
) -> DataFrame:
    """Union of all five detectors in the copy_log shape, deduped.

    Output columns: id, ts, value, anomaly_type, note
    (≙ copy_log.datasource:3-8).
    """
    oor = D.out_of_range(
        events, frontier, min_value=min_value, max_value=max_value
    ).select(
        "id",
        "ts",
        "value",
        F.lit("out-of-range").alias("anomaly_type"),
        # ≙ concat('min:', toString(min_value),' max:', toString(max_value))
        #   — copy_out_of_range.pipe:44
        F.concat(
            F.lit("min:"), _s(F.col("min_value")),
            F.lit(" max:"), _s(F.col("max_value")),
        ).alias("note"),
    )

    roc = D.rate_of_change(events, frontier, max_slope=max_slope).select(
        "id",
        "ts",
        "value",
        F.lit("rate-of-change").alias("anomaly_type"),
        # ≙ copy_rate_of_change.pipe:56
        F.concat(
            F.lit("slope:"), _s(F.col("slope")),
            # max_slope is a compile-time constant ≙ the reference's
            # template {% set %} constant (copy_rate_of_change.pipe:24)
            F.lit(f"| max_slope:{max_slope:g}"),
            F.lit("| value_diff: "), _s(F.col("value_diff")),
        ).alias("note"),
    )

    tmo = D.timeout(events, frontier, seconds=timeout_seconds).select(
        "id",
        F.col("last_seen").alias("ts"),
        "value",
        F.lit("timeout").alias("anomaly_type"),
        # ≙ copy_timeout.pipe:39
        F.lit("timestamp is time of last report").alias("note"),
    )

    zs = D.z_score(events, frontier, zscore_threshold=zscore_threshold).select(
        "id",
        "ts",
        "value",
        F.lit("z-score").alias("anomaly_type"),
        # ≙ copy_z_score.pipe:53
        F.concat(
            F.lit("z-score: "), F.substring(F.col("zscore").cast("string"), 1, 6),
            F.lit(" | "), F.col("test"),
            F.lit(" | average: "), _s(F.col("average")),
            F.lit(" | std_dev: "), _s(F.col("stddev")),
        ).alias("note"),
    )

    iq = D.iqr(events, frontier, iqr_multiplier=iqr_multiplier).select(
        "id",
        "ts",
        "value",
        F.lit("interquartile-range").alias("anomaly_type"),
        # ≙ copy_iqr.pipe:80
        F.concat(
            F.lit("lower_bound:"), _s(F.col("lower_bound")),
            F.lit("| upper_bound:"), _s(F.col("upper_bound")),
        ).alias("note"),
    )

    log = oor.unionByName(roc).unionByName(tmo).unionByName(zs).unionByName(iq)
    # ≙ dedup_log.pipe:4-6: LIMIT 1 BY timestamp, id, anomaly_type —
    # compiled to row_number (W3 rewrite) with a deterministic tiebreak
    # (dropDuplicates would keep an arbitrary row when two same-type
    # violations share (ts, id), e.g. duplicate events)
    from ..operators.limit_by import limit_by

    return limit_by(log, ["ts", "id", "anomaly_type"], [F.col("value"), F.col("note")], 1)


def monitor_logs(
    log: DataFrame,
    frontier,
    *,
    hours: int = 24,
    sensor_id: int | None = None,
) -> DataFrame:
    """≙ pipes/monitor_logs.pipe:15-21: SELECT DISTINCT * FROM copy_log
    WHERE ts > addHours(NOW(), -hours) [AND id = sensor_id] — the single
    all-detector consumer endpoint (O3 defensive dedup + F8 window)."""
    df = log.filter(
        F.col("ts") > F.lit(frontier) - F.expr(f"INTERVAL {hours} HOUR")
    )
    if sensor_id is not None:
        df = df.filter(F.col("id") == sensor_id)
    return df.distinct()


def get_anomalies(
    log: DataFrame,
    frontier,
    *,
    hours: int = 24,
    sensor_id: int | None = None,
    anomaly_type: str | None = None,
) -> DataFrame:
    """≙ pipes/get_anomalies.pipe:10-21: trailing-hours slice of the log
    with optional sensor / anomaly_type filters (P5 conditional
    predicates; template `{% if defined %}` ≙ plain Python ifs)."""
    df = log.filter(
        F.col("ts") > F.lit(frontier) - F.expr(f"INTERVAL {hours} HOUR")
    )
    if sensor_id is not None:
        df = df.filter(F.col("id") == sensor_id)
    if anomaly_type is not None:
        df = df.filter(F.col("anomaly_type") == anomaly_type)
    return df


def anomalies_summary(log: DataFrame) -> DataFrame:
    """≙ get_anomalies.pipe:27-29 (GROUP BY anomaly_type over the log) +
    monitor_logs-style counts: per-type row count and time span."""
    return log.groupBy("anomaly_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
