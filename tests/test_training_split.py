"""Leakage-guarded split, semantic dedup, quality-weighted sampling —
the training-data corpus-assembly compositions (functions/dedup.
split_assign, functions/similarity.semantic_dedup_ids,
functions/text.quality_weighted_sample)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from use_case_real_time_anomaly_detection_spark.functions.dedup import (
    connected_components,
    split_assign,
)
from use_case_real_time_anomaly_detection_spark.functions.similarity import (
    semantic_dedup_ids,
)
from use_case_real_time_anomaly_detection_spark.functions.text import (
    quality_weighted_sample,
)


def _bucket(salt: str, key) -> int:
    return int(hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:8], 16) % 10000


# ---------------------------------------------------------------------------
# split_assign
# ---------------------------------------------------------------------------


def test_split_assign_leakage_guard(spark):
    """Every member of a near-dup cluster lands in the SAME split, and
    the split is the cluster REPRESENTATIVE's hash bucket — near-dups of
    train docs can never appear in val/test."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 50, 51)], "doc_id long"
    )
    clusters = connected_components(pairs)
    got = {
        r["doc_id"]: (r["cluster_id"], r["split"])
        for r in split_assign(docs, clusters).collect()
    }
    assert len(got) == 7
    # cluster {1,2,3} → rep 1; cluster {10,11} → rep 10; singletons self
    assert {got[i][0] for i in (1, 2, 3)} == {1}
    assert {got[i][0] for i in (10, 11)} == {10}
    assert got[50][0] == 50 and got[51][0] == 51
    # one split per cluster, and it is the rep's bucket
    cuts = [("train", 9000), ("val", 9500), ("test", 10000)]

    def expect(rep):
        b = _bucket("split", rep)
        return next(name for name, cut in cuts if b < cut)

    for doc, (rep, split) in got.items():
        assert split == expect(rep), (doc, rep, split)
    assert len({got[i][1] for i in (1, 2, 3)}) == 1


def test_split_assign_fractions_and_determinism(spark):
    """90/5/5 lands near-proportionally over many singletons; assignment
    is invariant under repartitioning; custom fractions honored."""
    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = split_assign(docs, None).groupBy("split").count()
    got = {r["split"]: r["count"] for r in out.collect()}
    assert set(got) == {"train", "val", "test"}
    assert abs(got["train"] - 1800) < 120  # ±~4σ of Binomial(2000, .9)
    # repartition-invariant (deterministic hash, not rand())
    again = {
        r["doc_id"]: r["split"]
        for r in split_assign(docs.repartition(13), None).collect()
    }
    first = {r["doc_id"]: r["split"] for r in split_assign(docs, None).collect()}
    assert again == first
    two = split_assign(
        docs, None, splits=(("a", 0.5), ("b", 0.5)), salt="s2"
    )
    got2 = {r["split"] for r in two.collect()}
    assert got2 == {"a", "b"}


def test_split_assign_validates_fractions(spark):
    docs = spark.range(1).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(docs, None, splits=(("train", 0.5), ("val", 0.1)))
    with pytest.raises(ValueError, match="> 0"):
        split_assign(docs, None, splits=(("train", 1.0), ("val", 0.0)))
    with pytest.raises(ValueError, match="duplicate"):
        split_assign(docs, None, splits=(("x", 0.5), ("x", 0.5)))


# ---------------------------------------------------------------------------
# semantic_dedup_ids
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def emb(spark):
    """3 planted clusters of near-identical vectors + singletons."""
    rng = np.random.default_rng(7)
    rows = []
    base = {c: rng.normal(size=16) for c in range(3)}
    vid = 0
    planted = {}
    for c in range(3):
        for k in range(3):  # 3 near-copies per cluster
            v = base[c] + rng.normal(scale=1e-3, size=16)
            rows.append((vid, [float(x) for x in v]))
            planted[vid] = c
            vid += 1
    for _ in range(5):  # singletons, far apart
        v = rng.normal(size=16) * 10
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, planted


def test_semantic_dedup_keeps_min_rep_and_singletons(emb):
    df, planted = emb
    kept = {r["vec_id"] for r in semantic_dedup_ids(df, threshold=0.99).collect()}
    # min id of each planted cluster survives, other members dropped
    by_cluster = {}
    for vid, c in planted.items():
        by_cluster.setdefault(c, []).append(vid)
    for members in by_cluster.values():
        assert min(members) in kept
        assert all(m not in kept for m in members if m != min(members))
    # every singleton survives
    singles = set(range(9, 14))
    assert singles <= kept


def test_semantic_dedup_lsh_path_matches_exact(emb):
    """The banded sign-LSH scale path keeps the same ids as the exact
    block-GEMM path on the planted clusters (near-identical vectors
    collide in every band)."""
    df, _ = emb
    exact = {r["vec_id"] for r in semantic_dedup_ids(df, threshold=0.99).collect()}
    lsh = {
        r["vec_id"]
        for r in semantic_dedup_ids(
            df, threshold=0.99, lsh=True, n_planes=6, bands=8
        ).collect()
    }
    assert lsh == exact


# ---------------------------------------------------------------------------
# quality_weighted_sample
# ---------------------------------------------------------------------------


def test_quality_weighted_sample_matches_python_twin(spark):
    docs = spark.createDataFrame(
        [(i, (i % 11) / 10.0) for i in range(400)], "doc_id long, w double"
    )
    got = {r["doc_id"] for r in quality_weighted_sample(docs, "w").collect()}
    expect = {
        i
        for i in range(400)
        if _bucket("qsample", i)
        < math.floor(min(1.0, max(0.0, (i % 11) / 10.0)) * 10000)
    }
    assert got == expect
    # weight 0 admits nothing; weight ≥ 1 admits everything (clamped)
    all_zero = quality_weighted_sample(
        docs.withColumn("w", F.lit(0.0)), "w"
    ).count()
    assert all_zero == 0
    all_one = quality_weighted_sample(
        docs.withColumn("w", F.lit(2.5)), "w"
    ).count()
    assert all_one == 400


def test_quality_weighted_sample_is_row_local(spark):
    """The filter is one scan, no exchange — sampling must not shuffle."""
    docs = spark.range(100).withColumnRenamed("id", "doc_id").withColumn(
        "w", F.lit(0.5)
    )
    plan = quality_weighted_sample(docs, "w")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
