"""Temporal join operators Spark lacks natively: as-of join and
interval (range) join.

Both are expressed as compositions of built-in DataFrame ops chosen for
their 10^12-row shuffle shape — neither ever degenerates into a
cartesian / broadcast-nested-loop product the way a naive theta-join
(`F.col("ts").between(...)` as the only join condition) does:

- ``asof_join``: the classic union-tagged window formulation — ONE hash
  exchange on the key, then a per-key ``last(_, ignorenulls)`` running
  carry-forward. No join node at all, so there is no candidate-pair
  blow-up to control; per-key cost is the same sequential scan every
  sequence rule in this engine already pays (rate-of-change, CUSUM).
- ``interval_join``: intervals exploded onto a fixed time-bucket grid,
  facts mapped to their single bucket, then an EQUI-join on
  (key, bucket) with the exact containment predicate as a residual
  filter. Each (fact, interval) pair materializes at most once by
  construction (the fact's one bucket), so no post-join dedup is
  needed. Explode factor = ceil(interval span / bucket width) — pick
  ``bucket`` near the typical interval length so the grid stays O(1)
  rows per interval while the equi-key spreads uniformly over time.

Domain use (≙ the validation engine): join each clip/event to the
calibration or ruleset revision in effect at its timestamp (as-of), and
exempt rows falling inside declared maintenance windows (interval).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_is_right"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    strict: bool = False,
    tolerance_s: int | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Join every ``left`` row to the single ``right`` row with the
    nearest timestamp at-or-before it (``direction="backward"``, the
    pandas ``merge_asof`` default) or at-or-after it (``"forward"``),
    per ``on`` key.  ``strict=True`` excludes ties (strictly before /
    after).  ``tolerance_s`` NULLs the match when it is further than
    that many seconds (timestamp axis) — or axis units, when ``ts`` is
    a numeric sequence column — from the left row's position
    (staleness bound — a calibration revision too old to trust is no
    match at all).

    Implementation: tag and union both sides, hash-partition by the
    key, and carry the latest right-side payload forward (backward
    direction) with ``last(payload, ignorenulls=True)`` over
    ``ROWS UNBOUNDED PRECEDING``; the forward direction is the same
    window over the reversed timestamp order.  Ordering within a
    timestamp tie puts the right row first (inclusive semantics) or
    last (strict), so tie handling is exact, not accidental.

    Right rows are first deduplicated to one per (key, ts) —
    deterministically the max over the payload struct — because "the"
    as-of match is otherwise ill-defined; DuckDB's ASOF JOIN would pick
    an arbitrary one and cross-engine parity would be luck.

    Scale shape: one exchange on ``on`` (reused by any downstream
    per-key op), zero join nodes, zero Python.  A single hot key
    serializes its own window scan — the same bound as every sequence
    rule here; salt upstream if one key owns the corpus.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: direction must be backward|forward, got {direction!r}")
    if tolerance_s is not None and tolerance_s <= 0:
        raise ValueError(f"asof_join: tolerance_s must be > 0, got {tolerance_s}")
    rcols = right_cols or [c for c in right.columns if c not in (on, ts)]
    missing = [c for c in rcols if c not in right.columns]
    if missing:
        raise ValueError(f"asof_join: right_cols not in right: {missing}")
    clash = [f"{prefix}{c}" for c in rcols + [ts] if f"{prefix}{c}" in left.columns]
    if clash:
        raise ValueError(f"asof_join: output columns already in left: {clash}")

    payload = F.struct(F.col(ts).alias(ts), *[F.col(c) for c in rcols])
    # one right row per (key, ts): deterministic max over the payload
    # struct (field-wise lexicographic), engine-independent
    r = (
        right.groupBy(on, ts)
        .agg(F.max(payload).alias("__p"))
        .select(on, ts, "__p")
    )
    lt = left.withColumn(_TAG, F.lit(0)).withColumn("__p", F.lit(None).cast(r.schema["__p"].dataType))
    rt = r.select(*[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in (on, ts)], F.col(on), F.col(ts), F.lit(1).alias(_TAG), F.col("__p"))
    u = lt.unionByName(rt.select(*lt.columns))

    # inclusive: right row sorts BEFORE left at equal ts (tag desc);
    # strict: after (tag asc). forward = reversed ts order.
    ts_ord = F.col(ts).desc() if direction == "forward" else F.col(ts).asc()
    tag_ord = (
        (F.col(_TAG).asc() if strict else F.col(_TAG).desc())
    )
    w = (
        Window.partitionBy(on)
        .orderBy(ts_ord, tag_ord)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    carried = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
    out = carried.filter(F.col(_TAG) == 0).drop(_TAG, "__p")

    m = F.col("__m")
    if tolerance_s is not None:
        # the axis may be a timestamp (tolerance in seconds) or any
        # numeric sequence column (tolerance in axis units) — the same
        # dual contract as the sequence rules' seq_col. unix_timestamp
        # on a numeric column is an AnalysisException, so dispatch on
        # the resolved type.
        from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

        if isinstance(
            left.schema[ts].dataType, (TimestampType, TimestampNTZType, DateType)
        ):
            gap = F.abs(F.unix_timestamp(F.col(ts)) - F.unix_timestamp(m[ts]))
        else:
            gap = F.abs(F.col(ts).cast("double") - m[ts].cast("double"))
        m = F.when(gap <= tolerance_s, m)
    cols = [F.col(c) for c in left.columns] + [
        m[ts].alias(f"{prefix}{ts}"),
        *[m[c].alias(f"{prefix}{c}") for c in rcols],
    ]
    return out.select(*cols)


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    *,
    ts: str,
    start: str,
    end: str,
    on: str | None = None,
    bucket_s: int = 3600,
    how: str = "inner",
    broadcast: bool = False,
) -> DataFrame:
    """Join facts to every interval containing them:
    ``start <= facts.ts < end`` (half-open), optionally also equi-keyed
    on ``on``.  ``how="inner"`` emits one row per (fact, interval)
    containment pair; ``how="left_anti"`` keeps only facts inside NO
    interval (the maintenance-window exemption filter).  To annotate
    facts without duplicating them, use :func:`coverage_flags`.

    Never a cartesian: each interval is exploded onto the fixed
    ``bucket_s``-second grid it overlaps (``sequence()`` over bucket
    ids — pure JVM), each fact computes its single bucket id, and the
    join is a plain EQUI-join on (key, bucket) with containment as a
    residual filter.  Each qualifying pair appears exactly once because
    the fact's one bucket intersects the interval's grid row set at
    most once — no dedup pass.

    Scale: shuffle keys are (key, time-bucket) — time-uniform by
    construction, so no single-task hotspot even when all facts share
    one calendar day; interval-side row count multiplies by
    ceil(span / bucket_s), so pick ``bucket_s`` near the typical span
    (explode factor ~2).  AQE's skew-join split covers residual key
    skew.
    """
    if how not in ("inner", "left_anti"):
        raise ValueError(f"interval_join: how must be inner|left_anti, got {how!r}")
    if bucket_s <= 0:
        raise ValueError(f"interval_join: bucket_s must be > 0, got {bucket_s}")

    def _axis(df: DataFrame, col: str) -> Column:
        # the interval axis may be wall-clock (timestamp) or a logical
        # sequence number (the clip table's `seq`) — bucket either
        t = df.schema[col].dataType.typeName()
        c = F.col(col)
        return F.unix_timestamp(c) if t.startswith("timestamp") else c.cast("long")

    b_start = F.floor(_axis(intervals, start) / bucket_s)
    # half-open [start, end): the bucket containing `end` is only needed
    # when end does not fall exactly on a grid line
    b_end = F.floor((_axis(intervals, end) - F.lit(1)) / bucket_s)
    iv = intervals.filter(F.col(start) < F.col(end)).withColumn(
        "__bucket", F.explode(F.sequence(b_start, F.greatest(b_end, b_start)))
    )
    if broadcast:
        # declared-window sets are operator-sized (≪ facts): broadcast
        # the exploded grid so the fact table NEVER shuffles — the
        # maintenance-exemption shape at 10^12 facts
        iv = F.broadcast(iv)
    fc = facts.withColumn("__bucket", F.floor(_axis(facts, ts) / bucket_s))

    keys = ["__bucket"] + ([on] if on else [])
    contained = (F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end))

    if how == "inner":
        return fc.join(iv, keys, "inner").filter(contained).drop("__bucket")
    # left_anti needs containment INSIDE the join condition, not a
    # post-filter — a bucket-matched but not-contained pair must count
    # as "no match", so the fact survives the anti-join
    f, i = fc.alias("__f"), iv.alias("__i")
    cond = F.col("__f.__bucket") == F.col("__i.__bucket")
    if on:
        cond = cond & (F.col(f"__f.{on}") == F.col(f"__i.{on}"))
    cond = cond & (
        (F.col(f"__f.{ts}") >= F.col(f"__i.{start}"))
        & (F.col(f"__f.{ts}") < F.col(f"__i.{end}"))
    )
    return f.join(i, cond, "left_anti").drop("__bucket")


def coverage_flags(
    facts: DataFrame,
    intervals: DataFrame,
    *,
    ts: str,
    start: str,
    end: str,
    on: str | None = None,
    bucket_s: int = 3600,
    flag: str = "in_window",
    broadcast: bool = False,
) -> DataFrame:
    """Annotate each fact with a boolean: does ANY interval contain it?
    One inner interval_join aggregated to fact identity, then a
    broadcast-sized semi-join back — facts are never duplicated in the
    output even when several windows overlap them.

    (Used by the engine's exclusion-window path: violations raised
    during declared maintenance windows are suppressed, not counted.)
    """
    fact_keys = [c for c in facts.columns]
    hit = (
        interval_join(
            facts, intervals, ts=ts, start=start, end=end, on=on,
            bucket_s=bucket_s, broadcast=broadcast,
        )
        .select(*fact_keys)
        .distinct()
        .withColumn(flag, F.lit(True))
    )
    return facts.join(hit, fact_keys, "left").fillna({flag: False})
