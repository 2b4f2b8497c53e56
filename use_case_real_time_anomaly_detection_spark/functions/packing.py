"""Sequence packing for training-data pipelines.

Turning a curated corpus into fixed-length training sequences is the
last step of every LLM data pipeline: documents are concatenated into a
token stream and cut into `budget`-token sequences (GPT-style packing,
where documents may straddle sequence boundaries), or greedily grouped
whole into sequences (no-split packing, trading some padding for intact
documents).

Scale shape: the global token offset of every document is a PREFIX SUM
over 10^12 rows — the naive Window over a global ORDER BY is a
single-partition straggler, so `pack_sequences` computes it as the
classic two-level distributed scan: an in-bucket running total (one
window task per id bucket) plus a cumsum over the tiny one-row-per-bucket
subtotal relation, broadcast back. No global sort, no driver collect.

Tokenization matches functions/text.py (lowercase whitespace split,
empties dropped) so packed token counts agree with token_counts /
corpus_filter gates.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences", "pack_greedy"]


def _n_tokens(text_col: str) -> "F.Column":
    return F.size(
        F.filter(
            F.split(F.lower(F.col(text_col)), " "), lambda x: x != F.lit("")
        )
    ).cast("long")


def pack_sequences(
    df: DataFrame,
    budget: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_width: int = 100_000,
) -> DataFrame:
    """Split-style (GPT) packing metadata: docs concatenated in id order
    into one token stream, cut every `budget` tokens.

    Returns (id, n_tokens, token_start, seq_start, seq_end): the doc's
    token interval [token_start, token_start+n_tokens) and the
    first/last training sequence it lands in. Zero-token docs occupy no
    stream positions and are dropped.

    The prefix sum is two-level: `bucket_width` consecutive ids form a
    bucket; pass 1 windows WITHIN each bucket (parallel across buckets),
    pass 2 cumsums the per-bucket subtotals (~N/bucket_width rows — the
    only single-task window, over a relation thousands of times smaller
    than the corpus) and broadcasts the offsets back.
    """
    if budget < 1:
        raise ValueError(f"pack_sequences: budget must be >= 1, got {budget}")
    if bucket_width < 1:
        raise ValueError(
            f"pack_sequences: bucket_width must be >= 1, got {bucket_width}"
        )
    base = df.select(
        F.col(id_col),
        _n_tokens(text_col).alias("n_tokens"),
        F.floor(F.col(id_col) / F.lit(bucket_width)).cast("long").alias("__bucket"),
    )
    w_in = Window.partitionBy("__bucket").orderBy(id_col)
    local = base.withColumn("__local_end", F.sum("n_tokens").over(w_in))
    totals = base.groupBy("__bucket").agg(F.sum("n_tokens").alias("__tot"))
    w_b = (
        Window.orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "__bucket",
        F.coalesce(F.sum("__tot").over(w_b), F.lit(0)).alias("__offset"),
    )
    token_end = F.col("__offset") + F.col("__local_end")
    token_start = token_end - F.col("n_tokens")
    return (
        local.join(F.broadcast(offsets), "__bucket")
        .filter(F.col("n_tokens") > 0)
        .select(
            id_col,
            "n_tokens",
            token_start.alias("token_start"),
            F.floor(token_start / F.lit(budget)).alias("seq_start"),
            F.floor((token_end - F.lit(1)) / F.lit(budget)).alias("seq_end"),
        )
    )


def pack_greedy(
    df: DataFrame,
    budget: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_width: int = 100_000,
) -> DataFrame:
    """No-split greedy packing: whole documents only, id order within an
    id shard; a doc that doesn't fit the current sequence's remainder
    starts a new sequence; docs longer than `budget` get a sequence of
    their own with truncated=true (the trainer truncates).

    Returns (id, n_tokens, shard, seq_in_shard, used_tokens, truncated).
    Sequence ids are (shard, seq_in_shard) pairs — packing is per-shard
    (the practical deployment: each shard becomes a training file, so
    sequences never span shards and shards pack in parallel).

    Greedy fill is inherently sequential per shard — the one place
    imperative logic is genuinely required — so it runs as ONE
    applyInPandas pass, one task per shard, Arrow both ways; everything
    before/after is declarative.
    """
    if budget < 1:
        raise ValueError(f"pack_greedy: budget must be >= 1, got {budget}")
    base = df.select(
        F.col(id_col),
        _n_tokens(text_col).alias("n_tokens"),
        F.floor(F.col(id_col) / F.lit(shard_width)).cast("long").alias("shard"),
    ).filter(F.col("n_tokens") > 0)

    schema = (
        f"{id_col} long, n_tokens long, shard long, "
        "seq_in_shard long, used_tokens long, truncated boolean"
    )

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        seq, used = 0, 0
        seqs, useds, truncs = [], [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if used > 0 and used + n > budget:
                seq, used = seq + 1, 0
            truncs.append(n > budget)
            used += min(n, budget)
            seqs.append(seq)
            useds.append(used)
            if n >= budget:  # full (or truncated) sequence: close it
                seq, used = seq + 1, 0
        pdf["seq_in_shard"] = pd.Series(seqs, dtype="int64")
        pdf["used_tokens"] = pd.Series(useds, dtype="int64")
        pdf["truncated"] = pd.Series(truncs, dtype="bool")
        return pdf

    return base.groupBy("shard").applyInPandas(fill, schema)
