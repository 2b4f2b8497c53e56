"""Similarity search vs a numpy oracle; ANN recall measured, not assumed."""

from __future__ import annotations

import numpy as np
import pytest

from use_case_real_time_anomaly_detection_spark.functions.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def np_data(emb):
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    return ids, mat


def _np_topk(ids, mat, q, k=10, exclude=0):
    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    sims = np.round(sims, 4)
    order = sorted(zip(ids, sims), key=lambda t: (-t[1], t[0]))
    return [(int(i), float(s)) for i, s in order if i != exclude][:k]


def test_brute_force_matches_numpy(emb, np_data):
    ids, mat = np_data
    q = mat[list(ids).index(0)]
    got = [
        (r["vec_id"], r["cosine"])
        for r in brute_force_topk(emb, list(q), k=10, exclude_id=0).collect()
    ]
    assert got == _np_topk(ids, mat, q)


def test_ivf_all_probes_equals_brute_force(emb, np_data):
    """Correctness invariant: probing every bucket IS brute force."""
    ids, mat = np_data
    q = mat[list(ids).index(0)]
    n_buckets = len(set(r["label"] for r in emb.select("label").collect()))
    got = [
        (r["vec_id"], r["cosine"])
        for r in ivf_topk(emb, list(q), k=10, n_probe=n_buckets, exclude_id=0).collect()
    ]
    assert got == _np_topk(ids, mat, q)


def test_ivf_partial_probe_recall(emb, np_data):
    """The testdata embeddings have NO cluster structure (labels are
    independent of cosine neighborhoods), so bucket-probing recall is
    ≈ n_probe / n_buckets by construction — assert that floor, and that
    results are a correct top-k of the probed subset (sorted desc)."""
    ids, mat = np_data
    q = mat[list(ids).index(0)]
    exact = {i for i, _ in _np_topk(ids, mat, q)}
    rows = ivf_topk(emb, list(q), k=10, n_probe=2, exclude_id=0).collect()
    sims = [r["cosine"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    recall = len(exact & {r["vec_id"] for r in rows}) / 10
    assert recall >= 0.1, f"IVF recall@10 = {recall}"


def test_lsh_topk_returns_from_query_bucket(emb, np_data):
    ids, mat = np_data
    q = mat[list(ids).index(0)]
    exact = {i for i, _ in _np_topk(ids, mat, q)}
    got = [
        (r["vec_id"], r["cosine"])
        for r in lsh_topk(emb, list(q), k=10, exclude_id=0).collect()
    ]
    assert len(got) > 0
    # results sorted by cosine desc
    sims = [s for _, s in got]
    assert sims == sorted(sims, reverse=True)
    # deterministic data (seed 42) + fixed md5 plane family → recall is a
    # constant per probe depth: measured 0.2 at multi_probe=1 and 0.9 at
    # multi_probe=3 (structureless corpus — clustered data scores far
    # higher). Assert multi-probe buys recall, with slack under the
    # measured values.
    recall1 = len(exact & {i for i, _ in got}) / 10
    assert recall1 >= 0.1, f"LSH recall@10 (mp=1) = {recall1}"
    got3 = {
        r["vec_id"]
        for r in lsh_topk(emb, list(q), k=10, multi_probe=3, exclude_id=0).collect()
    }
    recall3 = len(exact & got3) / 10
    assert recall3 >= 0.6, f"LSH recall@10 (mp=3) = {recall3}"
    assert recall3 > recall1


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs
# ---------------------------------------------------------------------------


def _np_neardup(ids, mat, thr=0.4):
    n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    c = np.round(n @ n.T, 4)
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if c[i, j] >= thr:
                a, b = sorted((int(ids[i]), int(ids[j])))
                out.add((a, b, float(c[i, j])))
    return out


def test_neardup_pairs_matches_numpy(emb, np_data):
    from use_case_real_time_anomaly_detection_spark.functions.similarity import neardup_pairs

    ids, mat = np_data
    got = {
        (r["a_id"], r["b_id"], r["cosine"])
        for r in neardup_pairs(emb, threshold=0.4).collect()
    }
    assert got == _np_neardup(ids, mat, 0.4)


def test_neardup_lsh_is_subset_with_recall(emb, np_data):
    """LSH candidates verify exactly, so results ⊆ brute; recall is
    measured (sign-LSH on near-orthogonal vectors won't be 100%)."""
    from use_case_real_time_anomaly_detection_spark.functions.similarity import (
        neardup_pairs,
        neardup_pairs_lsh,
    )

    brute = {
        (r["a_id"], r["b_id"]) for r in neardup_pairs(emb, threshold=0.4).collect()
    }
    lsh = {
        (r["a_id"], r["b_id"])
        for r in neardup_pairs_lsh(emb, threshold=0.4, n_planes=3).collect()
    }
    assert lsh <= brute
    assert len(brute) > 0
    # measured 0.30 with the md5 plane family at 3 planes / 1 band on this
    # structureless corpus; the banded-recall test below covers the
    # high-recall configuration on a corpus with true near-dups
    assert len(lsh) / len(brute) >= 0.2


def test_neardup_lsh_banded_recall(spark):
    """OR-construction (8 bands x 6 planes) must reach >= 0.95 measured
    recall vs brute at threshold 0.9 on a corpus with real near-dups
    (base vectors + small perturbations)."""
    from use_case_real_time_anomaly_detection_spark.functions.similarity import (
        neardup_pairs,
        neardup_pairs_lsh,
    )

    rng = np.random.default_rng(123)
    base = rng.normal(size=(120, 32))
    rows = []
    vid = 0
    for i in range(120):
        rows.append((vid, [float(x) for x in base[i]]))
        vid += 1
        # two perturbed near-duplicates of each base vector
        for _ in range(2):
            noisy = base[i] + rng.normal(scale=0.08, size=32)
            rows.append((vid, [float(x) for x in noisy]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    brute = {
        (r["a_id"], r["b_id"])
        for r in neardup_pairs(emb, threshold=0.9).collect()
    }
    assert len(brute) >= 100  # the corpus genuinely contains near-dups
    lsh = {
        (r["a_id"], r["b_id"])
        for r in neardup_pairs_lsh(
            emb, threshold=0.9, n_planes=6, bands=8
        ).collect()
    }
    assert lsh <= brute  # exact verify: no false positives
    recall = len(lsh & brute) / len(brute)
    assert recall >= 0.95, f"banded LSH recall = {recall}"


def test_neardup_exact_gate_switches_to_lsh(spark):
    # above max_exact_rows the exact GEMM is declined: default switches
    # to the LSH+verify scale path (schema-identical, pairs subset of
    # exact); on_exceed='error' raises with a pointer
    import warnings

    import pytest

    from use_case_real_time_anomaly_detection_spark.functions.similarity import (
        neardup_pairs,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 16))
    rows = []
    vid = 0
    for i in range(20):
        rows.append((vid, [float(x) for x in base[i]]))
        vid += 1
        noisy = base[i] + rng.normal(scale=0.05, size=16)
        rows.append((vid, [float(x) for x in noisy]))
        vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r.a_id, r.b_id)
        for r in neardup_pairs(emb, threshold=0.9, max_exact_rows=None).collect()
    }
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        gated = neardup_pairs(emb, threshold=0.9, max_exact_rows=10)
        assert any("switching to neardup_pairs_lsh" in str(x.message) for x in w)
    got = {(r.a_id, r.b_id) for r in gated.collect()}
    assert got <= exact
    assert len(got) >= 0.9 * len(exact)  # recall bar
    with pytest.raises(ValueError, match="max_exact_rows"):
        neardup_pairs(emb, threshold=0.9, max_exact_rows=10, on_exceed="error")
