"""Dedup + text operators on a corpus with KNOWN near-duplicates."""

from __future__ import annotations

import pytest

from use_case_real_time_anomaly_detection_spark.functions.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from use_case_real_time_anomaly_detection_spark.functions.text import (
    fingerprint,
    quality_score,
    token_counts,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the data pipeline "
    "runs a full validation sweep across every partition of the table"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # one-token change
OTHER = (
    "completely different content about spark shuffles joins aggregations "
    "and the catalyst optimizer rewriting logical plans into physical ones"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),        # exact duplicate of 1
        (3, NEAR),        # near duplicate of 1
        (4, OTHER),
        (5, "short text only"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    got = exact_duplicates(docs).collect()
    assert len(got) == 1
    assert (got[0]["first_id"], got[0]["last_id"], got[0]["dup_count"]) == (1, 2, 2)


def test_minhash_finds_exact_and_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0  # exact dup → jaccard 1
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.7  # near dup
    assert all(4 not in p and 5 not in p for p in pairs)


def test_ngram_jaccard(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert (1, 2) in pairs and (1, 3) in pairs
    assert not any(4 in p for p in pairs)


def test_simhash_properties(docs):
    h = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert h[1] == h[2]  # identical docs → identical simhash
    ham13 = bin(h[1] ^ h[3]).count("1")
    ham14 = bin(h[1] ^ h[4]).count("1")
    assert ham13 < ham14  # near-dup closer than unrelated doc


def test_simhash_near_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in simhash_near_pairs(docs, max_hamming=3).collect()}
    assert (1, 2) in pairs
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_quality_and_token_counts(docs):
    q = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert q[5]["n_tokens"] == 3
    assert q[1]["n_tokens"] == len(BASE.split())
    assert 0 < q[1]["stopword_ratio"] < 1

    t = {r["doc_id"]: r for r in token_counts(docs).collect()}
    assert t[5]["n_ws_tokens"] == 3
    assert t[5]["n_chars"] == len("short text only")


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "hello worlds")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]
    assert len(fp[1]) == 16
