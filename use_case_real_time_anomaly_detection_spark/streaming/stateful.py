"""Custom stateful streaming operators: running z-score + CUSUM per key.

The reference's detectors re-evaluate trailing windows per run (no
stream state — SURVEY.md §2.9 ST5). This module adds the genuinely
streaming-native formulation the batch engine cannot express: an
UNBOUNDED running mean/variance per sensor, carried across micro-batches
in Spark state-store state (`applyInPandasWithState`), flagging each
arriving event against the statistics of its entire history so far.

State per key: Welford accumulators (count, mean, M2) — O(1) memory per
key, mergeable, numerically stable; exactly the population stddev the
reference's stddevPop computes (tinybird/pipes/z_score.pipe:18), but
over the full prefix instead of a trailing window. An event is scored
against the state BEFORE it (self-exclusion, like the engine's rolling
z-score frame `rowsBetween(-k, -1)`), so flags are deterministic in
event order and independent of micro-batch boundaries — proven in
tests/test_streaming_resume.py by splitting the same stream 1-batch vs
2-batches-with-checkpoint-restore and comparing to a pandas oracle.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "id long, ts timestamp, value double, zscore double, "
    "average double, std_dev double"
)
STATE_SCHEMA = "count long, mean double, m2 double"


def running_zscore_stream(
    events: DataFrame,
    *,
    threshold: float = 3.0,
    min_periods: int = 30,
    id_col: str = "id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Streaming anomaly flags: |(v - mean_prefix) / std_prefix| > t.

    ``events`` must be a streaming DataFrame. Within a micro-batch rows
    are processed in (ts, *order_cols) order; across micro-batches the
    state store carries the accumulators (and the checkpoint persists
    them across restarts).
    """
    sort_cols = [ts_col, *order_cols]

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cnt, mean, m2 = state.get
        else:
            cnt, mean, m2 = 0, 0.0, 0.0

        out: list[tuple] = []
        # A large group's micro-batch arrives as MULTIPLE Arrow chunks in
        # this iterator, in no guaranteed order — sorting each chunk
        # independently would process rows out of global (ts, *order_cols)
        # order and make flags batch-boundary dependent. Concatenate
        # first, sort once. (Within one micro-batch the whole group must
        # fit in memory anyway — that is applyInPandasWithState's own
        # contract, not an extra bound this concat introduces.)
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                sort_cols, kind="mergesort"
            )
            for row in pdf.itertuples(index=False):
                v = getattr(row, value_col)
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    continue  # nulls neither score nor update state
                v = float(v)
                if cnt >= min_periods:
                    var = m2 / cnt  # population variance of the prefix
                    if var > 0.0:
                        std = math.sqrt(var)
                        z = (v - mean) / std
                        if abs(z) > threshold:
                            out.append(
                                (
                                    key[0],
                                    getattr(row, ts_col),
                                    v,
                                    round(z, 4),
                                    round(mean, 4),
                                    round(std, 4),
                                )
                            )
                cnt += 1
                d = v - mean
                mean += d / cnt
                m2 += d * (v - mean)

        state.update((cnt, mean, m2))
        cols = ["id", "ts", "value", "zscore", "average", "std_dev"]
        yield pd.DataFrame(out, columns=cols)

    return events.groupBy(id_col).applyInPandasWithState(
        fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


CUSUM_OUTPUT_SCHEMA = (
    "id long, ts timestamp, value double, cusum_hi double, cusum_lo double"
)
CUSUM_STATE_SCHEMA = "su double, sd double"


def cusum_stream(
    events: DataFrame,
    *,
    target: float,
    k: float = 0.0,
    h: float = 5.0,
    two_sided: bool = True,
    id_col: str = "id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Streaming CUSUM change-point flags (the continuous sibling of the
    batch CusumRule, operators/rules.py): Page's recursion carried as
    TWO doubles of state per key across micro-batches —

        S⁺ ← max(0, S⁺ + (v − target − k));  S⁻ ← max(0, S⁻ + (target − v − k))

    emitting each row whose S⁺ or S⁻ exceeds ``h``. Where the batch rule
    compiles the closed form over window prefix sums, the stream is the
    recursion itself — O(1) state per key (vs the z-score state's three
    accumulators), checkpoint-persisted, so a restart resumes the
    accumulated evidence instead of re-earning it.

    Rows are processed in (ts, *order_cols) order within a micro-batch;
    the recursion is a fixed float64 op sequence in that total order, so
    flags are deterministic and batch-boundary independent (proven in
    tests/test_cusum_stream.py by 1-batch vs 2-batches-with-restart vs a
    pandas oracle). NULL values leave S unchanged and never flag —
    the same contract as the batch rule.
    """
    if h <= 0 or k < 0:
        # ≙ {{ error(...) }}: config-time, before any stream starts
        raise ValueError(f"cusum_stream: need h > 0 and k >= 0, got h={h}, k={k}")
    sort_cols = [ts_col, *order_cols]

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        su, sd = state.get if state.exists else (0.0, 0.0)

        out: list[tuple] = []
        # concat-then-sort for the same batch-boundary-determinism reason
        # as running_zscore_stream above
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                sort_cols, kind="mergesort"
            )
            for row in pdf.itertuples(index=False):
                v = getattr(row, value_col)
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    continue  # nulls carry S unchanged and never flag
                v = float(v)
                su = max(0.0, su + (v - target - k))
                sd = max(0.0, sd + (target - v - k)) if two_sided else 0.0
                if su > h or sd > h:
                    out.append(
                        (
                            key[0],
                            getattr(row, ts_col),
                            v,
                            round(su, 4),
                            round(sd, 4),
                        )
                    )

        state.update((su, sd))
        cols = ["id", "ts", "value", "cusum_hi", "cusum_lo"]
        yield pd.DataFrame(out, columns=cols)

    return events.groupBy(id_col).applyInPandasWithState(
        fn,
        CUSUM_OUTPUT_SCHEMA,
        CUSUM_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


EWMA_OUTPUT_SCHEMA = "id long, ts timestamp, value double, ewma double"
EWMA_STATE_SCHEMA = "z double"


def ewma_stream(
    events: DataFrame,
    *,
    target: float,
    sigma: float,
    lam: float = 0.25,
    nsigma: float = 3.0,
    id_col: str = "id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Streaming EWMA control chart (the continuous sibling of the batch
    EwmaRule, operators/rules.py): Roberts' recursion carried as ONE
    double of state per key across micro-batches —

        z ← lam·x + (1−lam)·z,   z₀ = target

    emitting each row where |z − target| exceeds the chart's asymptotic
    band nsigma·sigma·sqrt(lam/(2−lam)). Where the batch rule compiles a
    TRUNCATED closed form (bounded error (1-lam)^K·|x−target|), the
    stream runs the exact recursion — O(1) state, checkpoint-persisted,
    so a restart resumes the chart instead of re-centering it at target
    (which would silently un-flag a currently-shifted process).

    Rows are processed in (ts, *order_cols) order within a micro-batch;
    the recursion is a fixed float64 op sequence in that total order, so
    flags are deterministic and batch-boundary independent. NULL values
    contribute ``target`` — z decays one step toward center, the batch
    rule's z_{-1} convention — and are never themselves flagged.
    """
    if not (0.0 < lam <= 1.0):
        # ≙ {{ error(...) }}: config-time, before any stream starts
        raise ValueError(f"ewma_stream: lam must be in (0, 1], got {lam}")
    if sigma <= 0 or nsigma <= 0:
        raise ValueError(
            f"ewma_stream: need sigma > 0 and nsigma > 0, "
            f"got sigma={sigma}, nsigma={nsigma}"
        )
    limit = nsigma * sigma * (lam / (2.0 - lam)) ** 0.5
    sort_cols = [ts_col, *order_cols]

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (z,) = state.get if state.exists else (target,)

        out: list[tuple] = []
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                sort_cols, kind="mergesort"
            )
            for row in pdf.itertuples(index=False):
                v = getattr(row, value_col)
                null = v is None or (isinstance(v, float) and math.isnan(v))
                x = target if null else float(v)
                z = lam * x + (1.0 - lam) * z
                if not null and abs(z - target) > limit:
                    out.append(
                        (key[0], getattr(row, ts_col), float(v), round(z, 4))
                    )

        state.update((z,))
        yield pd.DataFrame(out, columns=["id", "ts", "value", "ewma"])

    return events.groupBy(id_col).applyInPandasWithState(
        fn,
        EWMA_OUTPUT_SCHEMA,
        EWMA_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
