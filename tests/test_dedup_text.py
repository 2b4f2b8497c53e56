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


def test_minhash_recall_vs_exact_jaccard(spark):
    """Measured recall of the 16-hash / 8-band LSH candidate stage vs the
    exact all-pairs shingle-Jaccard baseline at threshold 0.5, on a
    corpus of templated near-duplicates (the realistic dedup workload:
    many pairs sitting just above the threshold)."""
    import random

    from use_case_real_time_anomaly_detection_spark.functions.dedup import (
        set_jaccard,
        shingles,
    )
    from pyspark.sql import functions as F

    rng = random.Random(5)
    vocab = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu "
        "nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    ).split()
    rows = []
    did = 0
    for base_i in range(40):
        base = [rng.choice(vocab) for _ in range(30)]
        rows.append((did, " ".join(base)))
        did += 1
        # a mutated variant: 1-3 token swaps (each swap destroys up to 3
        # word-3-gram shingles) → shingle Jaccard lands around
        # [0.45, 0.85], straddling the 0.5 threshold
        variant = list(base)
        for _ in range(1 + base_i % 3):
            variant[rng.randrange(len(variant))] = rng.choice(vocab)
        rows.append((did, " ".join(variant)))
        did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # exact baseline: all-pairs shingle Jaccard >= 0.5
    grams = shingles(docs).cache()
    ids = grams.select("doc_id").distinct()
    all_pairs = (
        ids.alias("a")
        .join(ids.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    exact = {
        (r["id_a"], r["id_b"])
        for r in set_jaccard(grams, all_pairs).filter(F.col("jaccard") >= 0.5).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert got <= exact  # verify stage keeps precision exact
    assert len(exact) >= 15  # the corpus genuinely straddles the threshold
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, f"minhash LSH recall = {recall} over {len(exact)} pairs"
    grams.unpersist()


def _uf_components(pairs):
    """Union-find oracle: component id = min member id."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_connected_components_matches_union_find(spark):
    """Min-label propagation == union-find, including a 12-node path
    (diameter 11 → forces many propagation iterations) and singletons
    attached to big ids."""
    from use_case_real_time_anomaly_detection_spark.functions.dedup import (
        canonical_corpus_ids,
        connected_components,
    )
    from pyspark.sql import functions as F

    pairs = (
        [(i, i + 1) for i in range(100, 112)]  # long path
        + [(1, 2), (2, 3), (1, 3)]             # triangle
        + [(50, 60), (60, 55)]                 # small star
        + [(7, 900)]                           # bridge to a big id
    )
    pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(pdf).collect()
    }
    expected = set(_uf_components(pairs).items())
    assert got == expected
    # canonical corpus: all ids 0..999, drop non-canonical members
    docs = spark.range(1000).select(F.col("id").alias("doc_id"))
    clusters = connected_components(pdf)
    kept = {r["doc_id"] for r in canonical_corpus_ids(docs, clusters).collect()}
    dropped = {d for d, c in expected if c != d}
    assert kept == set(range(1000)) - dropped


def test_connected_components_long_chain_log_rounds(spark):
    """Star contraction converges in O(log n) rounds regardless of graph
    diameter: a planted 5,000-node CHAIN (diameter 4,999 — min-label
    propagation would need 4,999 join rounds and raise at any practical
    cap) resolves within 30 alternating rounds to a single cluster rooted
    at the minimum id."""
    from use_case_real_time_anomaly_detection_spark.functions.dedup import (
        connected_components,
    )

    n = 5000
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    rows = connected_components(pairs, max_iter=30).collect()
    assert len(rows) == n
    assert all(r["cluster_id"] == 0 for r in rows)
    assert {r["doc_id"] for r in rows} == set(range(n))

    # the non-convergence guard still fires loudly when genuinely capped
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2)


def test_ngram_blocking_caps_fanout_keeps_rare_pairs(spark):
    """max_shingle_df blocks CANDIDATE keys only: pairs sharing a rare
    shingle are still found with their exact (unblocked) Jaccard; pairs
    whose only common shingles are corpus-boilerplate are the documented
    recall trade."""
    from use_case_real_time_anomaly_detection_spark.functions.dedup import ngram_jaccard_pairs

    boiler = "click here to subscribe now"
    rows = [
        (1, boiler + " unique alpha beta gamma delta"),
        (2, boiler + " unique alpha beta gamma delta"),   # near-dup of 1 via rare shingles
        (3, boiler + " totally different xi omicron pi rho"),
        (4, boiler + " else entirely tau upsilon phi chi"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=2, threshold=0.2).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, n=2, threshold=0.2, max_shingle_df=2
        ).collect()
    }
    assert set(capped) <= set(exact)
    assert (1, 2) in capped                      # rare-shingle pair kept
    assert capped[(1, 2)] == exact[(1, 2)]       # Jaccard still exact
    # docs 3/4 share ONLY the df=4 boilerplate shingles -> blocked out
    boiler_only = {p for p in exact if p[0] in (3, 4) or p[1] in (3, 4)}
    assert all(p not in capped for p in boiler_only)


def test_corpus_filter_composition(spark):
    """corpus_filter = quality band ∩ language ∩ canonical-dedup; each
    gate verified on a corpus with one violator per gate."""
    from use_case_real_time_anomaly_detection_spark.functions.dedup import connected_components
    from use_case_real_time_anomaly_detection_spark.functions.text import corpus_filter

    en = "the a of and to in is it " * 5  # 40 tokens, every one a stopword
    good = (
        "the quick brown fox jumps over the lazy dog while the data "
        "pipeline runs a full validation sweep across every partition"
    )
    es = "el la de los con por " * 6
    rows = [
        (1, good),                    # keeps
        (2, good),                    # exact dup of 1 → dropped (non-canonical)
        (3, es),                      # spanish → dropped by lang gate
        (4, "tiny"),                  # too short → dropped by token band
        (5, en),                      # stopword ratio 1.0 > 0.8 → dropped
        (6, good + " extra tail words here"),  # keeps
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    clusters = connected_components(pairs)
    kept = {
        r["doc_id"]
        for r in corpus_filter(
            docs, min_tokens=10, max_tokens=1000, max_stopword_ratio=0.8,
            lang="en", clusters=clusters,
        ).collect()
    }
    assert kept == {1, 6}


def test_hash_sample_deterministic_and_stratified(spark):
    """Content-hash sampling: identical selection across repartitionings
    and runs (the reproducibility contract rand()-sampling lacks), and
    per-stratum rates near their targets."""
    from use_case_real_time_anomaly_detection_spark.functions.text import hash_sample
    from pyspark.sql import functions as F

    docs = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "es").otherwise("en").alias("lang"),
    )
    kw = dict(fraction=0.2, strata_col="lang", fractions={"es": 0.5})
    a = {r["doc_id"] for r in hash_sample(docs, **kw).collect()}
    b = {r["doc_id"] for r in hash_sample(docs.repartition(17), **kw).collect()}
    assert a == b and len(a) > 0
    es = docs.filter(F.col("lang") == "es").count()
    en = docs.filter(F.col("lang") == "en").count()
    es_kept = len({x for x in a if x % 4 == 0})
    en_kept = len(a) - es_kept
    assert abs(es_kept / es - 0.5) < 0.06
    assert abs(en_kept / en - 0.2) < 0.05


def test_pii_scrub(spark):
    from use_case_real_time_anomaly_detection_spark.functions.text import pii_scrub

    rows = [
        (1, "mail me at jane.doe+x@corp.example.org or call +1 (555) 123-4567"),
        (2, "server at 192.168.001.042 and 10.0.0.7, no contacts"),
        (3, "nothing sensitive here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert got[1]["n_email"] == 1 and got[1]["n_phone"] == 1
    assert "<email>" in got[1]["text_redacted"]
    assert "<phone>" in got[1]["text_redacted"]
    assert "jane.doe" not in got[1]["text_redacted"]
    assert got[2]["n_ipv4"] == 2
    assert got[2]["text_redacted"].count("<ipv4>") == 2
    assert got[3]["text_redacted"] == "nothing sensitive here"
    assert (got[3]["n_email"], got[3]["n_phone"], got[3]["n_ipv4"]) == (0, 0, 0)


def test_pii_scrub_leaves_plain_numerics_alone(spark):
    """The phone pattern must require phone STRUCTURE — bare digit runs
    (order ids, timestamps) and dashed dates are corpus data, not PII."""
    from use_case_real_time_anomaly_detection_spark.functions.text import pii_scrub

    rows = [
        (1, "order 123456789 shipped 20260817 at 093000"),
        (2, "from 2026-08-17 to 2026-09-01 range 100-200-3"),
        (3, "dial +14155551234 or (415) 555-1234 today"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert got[1]["n_phone"] == 0 and got[1]["text_redacted"] == rows[0][1]
    assert got[2]["n_phone"] == 0 and got[2]["text_redacted"] == rows[1][1]
    assert got[3]["n_phone"] == 2 and got[3]["text_redacted"].count("<phone>") == 2


def test_connected_components_keeps_self_pair_only_nodes(spark):
    """Contract: every id incident to a pair gets a cluster row — a node
    whose only incidence is a reflexive (a, a) pair is its own singleton
    cluster; a node with BOTH a self-pair and a real edge is not
    duplicated."""
    from use_case_real_time_anomaly_detection_spark.functions.dedup import (
        connected_components,
    )

    pairs = [(9, 9), (1, 2), (2, 2)]
    pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(pdf).collect()
    )
    assert got == [(1, 1), (2, 1), (9, 9)]


def test_repeated_chunks_marks_shared_passage_only(spark):
    """A boilerplate paragraph shared verbatim by three otherwise-unique
    documents is marked in every document at the right start offset;
    unique text produces no rows; docs shorter than one window are
    skipped."""
    from use_case_real_time_anomaly_detection_spark.functions.dedup import (
        repeated_chunks,
    )

    boiler = " ".join(f"b{i}" for i in range(10))  # exactly one window
    docs = [
        # boilerplate at token offset 0
        (1, boiler + " " + " ".join(f"u1x{i}" for i in range(15))),
        # boilerplate at token offset 5 (a window-aligned start)
        (2, " ".join(f"u2x{i}" for i in range(5)) + " " + boiler
            + " " + " ".join(f"u2y{i}" for i in range(10))),
        # boilerplate at the exact end, offset 10
        (3, " ".join(f"u3x{i}" for i in range(10)) + " " + boiler),
        # all-unique doc: long enough, never marked
        (4, " ".join(f"u4x{i}" for i in range(30))),
        # too short for one window: skipped entirely
        (5, "tiny doc"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = repeated_chunks(
        df, chunk_tokens=10, stride=5, min_docs=2
    ).collect()

    marked = {(r["doc_id"], r["start_token"]) for r in out}
    assert marked == {(1, 0), (2, 5), (3, 10)}
    assert all(r["n_docs"] == 3 and r["n_occurrences"] == 3 for r in out)
    assert len({r["chunk_md5"] for r in out}) == 1


def test_duplicate_doc_rows_do_not_inflate_counts(spark):
    """The r4 shuffle-free shingles are distinct per ROW, so a duplicated
    doc row (un-deduped landing union) must not change exact-Jaccard or
    contamination results — count consumers aggregate with
    count_distinct (min-based MinHash/banding are invariant already)."""
    import pandas as pd

    from use_case_real_time_anomaly_detection_spark.functions.dedup import (
        contamination_scores,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dup_rows = docs.limit(25)
    dirty = docs.unionByName(dup_rows)  # 25 docs present twice

    def pairs_pd(d):
        return (
            ngram_jaccard_pairs(d, threshold=0.5)
            .orderBy("id_a", "id_b")
            .toPandas()
        )

    pd.testing.assert_frame_equal(pairs_pd(docs), pairs_pd(dirty))

    bench = docs.selectExpr("doc_id as bench_id", "text").limit(5)

    def scores_pd(d):
        return (
            contamination_scores(d, bench, min_score=0.0)
            .orderBy("doc_id")
            .toPandas()
        )

    pd.testing.assert_frame_equal(scores_pd(docs), scores_pd(dirty))
