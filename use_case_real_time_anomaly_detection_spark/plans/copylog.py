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
    """All five detectors in ONE pass over the fact table, deduped.

    Output columns: id, ts, value, anomaly_type, note
    (≙ copy_log.datasource:3-8); row set and note bytes are identical
    to ``violations_log_union`` (asserted in tests), but the plan is
    ONE FileScan + ONE shuffle by id instead of five detector subtrees
    each re-reading events — the fix for the reference's own lament
    about its five-copy-pipes architecture (content/copies-pipes.md:13).

    How: the fact frame is hash-shuffled by id ONCE; every per-id
    statistic comes off that one exchange —
    - per-id stats (exact decimal sums for avg/stddevPop — see
      plans/detectors.py z_score for the float determinism contract —
      exact conditional percentiles for the IQR fences, and the latest
      (ts, event_id) for the timeout test) are a groupBy("id") over the
      shuffled frame: partial aggregation runs map-side, so no sensor's
      full history ever concentrates in one task the way the round-2
      UNBOUNDED per-id window did (that shape capped parallelism at the
      key count and made a hot sensor a straggler at 100×). The tiny
      per-id result broadcast-joins back.
    - lag(value/ts) for rate-of-change stays an ordered window over the
      SAME exchange (sequence semantics genuinely need the order), and
      the timeout latest-row test is now max(struct(ts, event_id))
      equality instead of a row_number window.
    Because the groupBy and the window consume the identical shuffled
    subtree, Catalyst's ReuseExchange executes the shuffle once: the
    whole plan is 1 FileScan + 1 hash exchange + 1 broadcast
    (plan-asserted). Ids with no stats-window rows yield NULL stats →
    predicates false, exactly like the inner stats-joins they replace.
    """
    from pyspark.sql import Window

    sec = lambda s: F.expr(f"INTERVAL {s} SECOND")
    in_7d = F.col("ts") > F.lit(frontier) - sec(7 * D.SECONDS_PER_DAY)
    in_stats = F.col("ts").between(
        F.lit(frontier) - sec(14 * D.SECONDS_PER_DAY), F.lit(frontier)
    )
    in_detect = F.col("ts").between(
        F.lit(frontier) - sec(3 * D.SECONDS_PER_DAY), F.lit(frontier)
    )

    # ONE shuffle of the fact table; the stats aggregation and the lag
    # window both hang off this exact frame (same columns — column-parity
    # matters: a pruning difference would break subtree identity and with
    # it the exchange reuse)
    shuffled = events.select("id", "ts", "value", "event_id").repartition("id")

    w_seq = Window.partitionBy("id").orderBy("ts", "event_id")

    vd = F.col("value").cast("decimal(18,2)")
    stats = shuffled.groupBy("id").agg(
        F.sum(F.when(in_stats, vd)).cast("double").alias("__s1"),
        F.sum(F.when(in_stats, vd * vd)).cast("double").alias("__s2"),
        F.count(F.when(in_stats, F.col("value"))).alias("__n"),
        F.percentile(F.when(in_stats, F.col("value")), F.lit(0.25)).alias("__q1"),
        F.percentile(F.when(in_stats, F.col("value")), F.lit(0.75)).alias("__q3"),
        # lexicographic struct max ≡ the (ts DESC, event_id DESC) top row
        F.max(F.struct("ts", "event_id")).alias("__last"),
    )

    s1, s2, n = F.col("__s1"), F.col("__s2"), F.col("__n")
    average = s1 / n
    stddev = F.sqrt(F.greatest(s2 / n - (s1 / n) * (s1 / n), F.lit(0.0)))

    prev_value = F.lag("value", 1).over(w_seq)
    prev_ts = F.lag("ts", 1).over(w_seq)
    tdiff = (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)).cast("double")
    vdiff = F.col("value") - prev_value
    slope_w = F.round(F.when(tdiff > 0, vdiff / tdiff), 6)
    value_diff_w = F.round(vdiff, 2)
    is_last = (F.col("ts") == F.col("__last.ts")) & (
        F.col("event_id") == F.col("__last.event_id")
    )

    # Null-safe join key, for two load-bearing reasons: (a) a null-id
    # group keeps its own stats exactly like the per-id window it
    # replaces (a plain left join would null them out), and (b) a plain
    # equi-join makes Catalyst infer isnotnull(id) on the stats subtree
    # only, breaking the subtree identity that ReuseExchange needs.
    stats = stats.withColumnRenamed("id", "__sid")
    # window expressions can't sit under a generator (explode) in the
    # same projection — materialize them as plain columns first
    enriched = shuffled.join(
        F.broadcast(stats), F.col("id").eqNullSafe(F.col("__sid")), "left"
    ).select(
        "id",
        "ts",
        "value",
        average.alias("__avg"),
        stddev.alias("__std"),
        F.col("__q1"),
        F.col("__q3"),
        slope_w.alias("__slope"),
        value_diff_w.alias("__vdiff"),
        is_last.alias("__is_last"),
    )
    average, stddev = F.col("__avg"), F.col("__std")
    q1, q3 = F.col("__q1"), F.col("__q3")
    iqr_w = (q3 - q1) * iqr_multiplier
    slope, value_diff = F.col("__slope"), F.col("__vdiff")
    is_last = F.col("__is_last")

    zscore = F.round((F.col("value") - average) / stddev, 2)
    ztest = (
        F.when(zscore < -zscore_threshold, "low")
        .when(zscore > zscore_threshold, "high")
        .otherwise("ok")
    )

    def branch(cond, anomaly_type: str, note):
        return F.when(
            cond, F.struct(F.lit(anomaly_type).alias("anomaly_type"), note.alias("note"))
        )

    candidates = F.array(
        branch(
            in_7d & ((F.col("value") < min_value) | (F.col("value") > max_value)),
            "out-of-range",
            F.concat(
                F.lit("min:"), _s(F.lit(float(min_value))),
                F.lit(" max:"), _s(F.lit(float(max_value))),
            ),
        ),
        branch(
            in_7d & (F.abs(slope) > max_slope),
            "rate-of-change",
            F.concat(
                F.lit("slope:"), _s(slope),
                F.lit(f"| max_slope:{max_slope:g}"),
                F.lit("| value_diff: "), _s(value_diff),
            ),
        ),
        branch(
            is_last
            & (F.col("ts") < F.lit(frontier) - sec(timeout_seconds)),
            "timeout",
            F.lit("timestamp is time of last report"),
        ),
        branch(
            in_detect & (stddev > 0) & (F.abs(zscore) > zscore_threshold),
            "z-score",
            F.concat(
                F.lit("z-score: "), F.substring(zscore.cast("string"), 1, 6),
                F.lit(" | "), ztest,
                F.lit(" | average: "), _s(average),
                F.lit(" | std_dev: "), _s(stddev),
            ),
        ),
        branch(
            in_detect
            & (
                (F.col("value") > q3 + iqr_w) | (F.col("value") < q1 - iqr_w)
            ),
            "interquartile-range",
            F.concat(
                F.lit("lower_bound:"), _s(q1 - iqr_w),
                F.lit("| upper_bound:"), _s(q3 + iqr_w),
            ),
        ),
    )

    log = enriched.select(
        "id",
        "ts",
        "value",
        F.explode(F.filter(candidates, lambda c: c.isNotNull())).alias("__v"),
    ).select("id", "ts", "value", F.col("__v.anomaly_type").alias("anomaly_type"), F.col("__v.note").alias("note"))

    from ..operators.limit_by import limit_by

    return limit_by(log, ["ts", "id", "anomaly_type"], [F.col("value"), F.col("note")], 1)


def violations_log_union(
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
    """Union of the five standalone detectors in the copy_log shape,
    deduped — the literal mirror of the reference's five-copy-pipes
    architecture. Kept as the semantic baseline for the fused
    ``violations_log`` (equality asserted in tests); the fused plan is
    what runs, since this one scans the fact table five times.
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
