"""Sequence packing vs exact pandas/python oracles.

pack_sequences must equal a single-threaded global cumsum regardless of
bucket_width (the distributed prefix-sum is an implementation detail);
pack_greedy must satisfy the no-split invariants and equal a sequential
reference fill.
"""

from __future__ import annotations

import pytest

from use_case_real_time_anomaly_detection_spark.functions.packing import (
    pack_greedy,
    pack_sequences,
)


def _docs(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _texts():
    import random

    rng = random.Random(42)
    texts = []
    for i in range(200):
        n = rng.randint(0, 60)
        texts.append(" ".join(f"w{rng.randint(0, 99)}" for _ in range(n)))
    texts[17] = ""  # zero-token doc: occupies no stream positions
    texts[60] = "  ".join("x" for _ in range(300))  # long doc, double spaces
    return texts


def _tok_counts(texts):
    return [len([t for t in s.lower().split(" ") if t]) for s in texts]


def test_pack_sequences_matches_global_cumsum_oracle(spark):
    texts = _texts()
    counts = _tok_counts(texts)
    budget = 128
    want = {}
    pos = 0
    for i, n in enumerate(counts):
        if n > 0:
            want[i] = (n, pos, pos // budget, (pos + n - 1) // budget)
            pos += n

    got = {
        r.doc_id: (r.n_tokens, r.token_start, r.seq_start, r.seq_end)
        for r in pack_sequences(
            _docs(spark, texts), budget, bucket_width=37
        ).collect()
    }
    assert got == want
    # docs longer than budget really do straddle sequences
    assert any(e > s for (_, _, s, e) in want.values())


def test_pack_sequences_bucket_width_invariant(spark):
    texts = _texts()
    df = _docs(spark, texts)
    a = sorted(map(tuple, pack_sequences(df, 64, bucket_width=1).collect()))
    b = sorted(map(tuple, pack_sequences(df, 64, bucket_width=10_000).collect()))
    c = sorted(map(tuple, pack_sequences(df, 64, bucket_width=7).collect()))
    assert a == b == c


def test_pack_greedy_matches_sequential_oracle(spark):
    texts = _texts()
    counts = _tok_counts(texts)
    budget = 100
    shard_width = 64

    # sequential reference per shard
    want = {}
    shards = {}
    for i, n in enumerate(counts):
        if n > 0:
            shards.setdefault(i // shard_width, []).append((i, n))
    for shard, docs in shards.items():
        seq, used = 0, 0
        for i, n in docs:
            if used > 0 and used + n > budget:
                seq, used = seq + 1, 0
            used += min(n, budget)
            want[i] = (n, shard, seq, used, n > budget)
            if n >= budget:
                seq, used = seq + 1, 0

    got = {
        r.doc_id: (r.n_tokens, r.shard, r.seq_in_shard, r.used_tokens, r.truncated)
        for r in pack_greedy(
            _docs(spark, texts), budget, shard_width=shard_width
        ).collect()
    }
    assert got == want

    # invariants: no sequence exceeds budget; only >budget docs truncate
    from collections import defaultdict

    fill = defaultdict(int)
    for i, (n, shard, seq, _, trunc) in got.items():
        fill[(shard, seq)] += min(n, budget)
        assert trunc == (n > budget)
    assert all(v <= budget for v in fill.values())
    # packing is worthwhile: average fill above 50% of budget
    assert sum(fill.values()) / len(fill) > budget * 0.5


def test_packing_validates_params(spark):
    df = _docs(spark, ["a b"])
    with pytest.raises(ValueError):
        pack_sequences(df, 0)
    with pytest.raises(ValueError):
        pack_sequences(df, 10, bucket_width=0)
    with pytest.raises(ValueError):
        pack_greedy(df, 0)
