"""Benchmark decontamination (functions/dedup.contamination_*) vs a
pandas oracle — planted eval-leaks must be flagged at substring
granularity, clean docs never."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from use_case_real_time_anomaly_detection_spark.functions.dedup import (
    contamination_pairs,
    contamination_scores,
)

BENCH = [
    (0, "what is the capital of france paris is the capital"),
    (1, "solve for x two x plus three equals seven"),
]

DOCS = [
    # leak: benchmark 0 embedded verbatim inside a longer doc
    (100, "intro text here what is the capital of france paris is the "
          "capital and some trailing words"),
    # leak: benchmark 1 embedded with different surroundings
    (101, "quiz section solve for x two x plus three equals seven end"),
    # clean: shares vocabulary but no 8-gram run
    (102, "the capital of spain is madrid and france is large"),
    # clean: too short to form an 8-gram
    (103, "seven equals three"),
]


def _grams(text: str, n: int = 8) -> set:
    toks = [t for t in text.lower().split(" ") if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "bench_id long, text string")
    return docs, bench


def test_contamination_pairs_match_pandas_oracle(frames):
    docs, bench = frames
    got = {
        (r["doc_id"], r["bench_id"]): r["shared_grams"]
        for r in contamination_pairs(docs, bench, n=8).collect()
    }
    expected = {}
    for (did, dtext), (bid, btext) in itertools.product(DOCS, BENCH):
        k = len(_grams(dtext) & _grams(btext))
        if k >= 1:
            expected[(did, bid)] = k
    assert got == expected
    assert (100, 0) in got and (101, 1) in got  # the planted leaks
    assert all(d not in (102, 103) for d, _ in got)  # clean docs never


def test_contamination_scores_exact_fraction(frames):
    docs, bench = frames
    got = {
        r["doc_id"]: (r["n_grams"], r["shared_grams"], r["score"])
        for r in contamination_scores(docs, bench, n=8).collect()
    }
    bgrams = set().union(*(_grams(t) for _, t in BENCH))
    for did, dtext in DOCS:
        g = _grams(dtext)
        shared = len(g & bgrams)
        if g and shared:
            n, s, sc = got[did]
            assert (n, s) == (len(g), shared)
            assert sc == round(shared / len(g), 4)
        else:
            assert did not in got


def test_contamination_single_corpus_scan(frames, tmp_path, spark):
    """Both counts of the score come from ONE pass over ONE corpus scan
    (the benchmark side is a broadcast set)."""
    docs, bench = frames
    p = str(tmp_path / "docs.parquet")
    docs.write.parquet(p)
    out = contamination_scores(spark.read.parquet(p), bench, n=8)
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert phys.count(p.split("/")[-1]) <= 1  # corpus file appears once
    assert "BroadcastHashJoin" in phys or "BroadcastNestedLoop" not in phys


def test_contamination_validates_config(frames):
    docs, bench = frames
    with pytest.raises(ValueError, match="min_shared"):
        contamination_pairs(docs, bench, min_shared=0)
    with pytest.raises(ValueError, match="min_score"):
        contamination_scores(docs, bench, min_score=1.0)
    with pytest.raises(ValueError, match="n must be"):
        contamination_pairs(docs, bench, n=0)
