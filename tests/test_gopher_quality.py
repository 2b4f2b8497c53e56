"""gopher_repetition (intra-document repetition signals, Rae et al. 2021).

Pins:
- exact metric values vs a pure-python twin on hand-built docs;
- a looping document flags, a diverse document of the same length does
  not (the operator's reason to exist — corpus-level dedup sees neither);
- short docs (< n tokens) get zero metrics and never flag;
- plan shape: ONE scan of the corpus (the tagged single-explode claim).
"""

from __future__ import annotations

from collections import Counter

from use_case_real_time_anomaly_detection_spark.functions.text import (
    gopher_repetition,
)


def _twin(text: str) -> tuple[float, float, float]:
    toks = [t for t in text.lower().split(" ") if t != ""]

    def grams(n):
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    def top_frac(n):
        g = grams(n)
        if not g:
            return 0.0
        c = Counter(g)
        return max(c.values()) / len(g)

    def dup_frac(n):
        g = grams(n)
        if not g:
            return 0.0
        c = Counter(g)
        return sum(v for v in c.values() if v > 1) / len(g)

    return top_frac(2), top_frac(3), dup_frac(5)


DOCS = {
    "loop": "buy now " * 30,  # degenerate loop: every metric saturates
    "diverse": " ".join(f"w{i} x{i}" for i in range(30)),  # same length
    "half": "a b c d e f g h i j " * 2 + "k l m n o p q r s t",
    "short": "one two",  # 2-grams exist, 3/5-grams do not
    "tiny": "solo",  # no grams at all
    "empty": "",
}


def test_gopher_metrics_match_python_twin(spark):
    df = spark.createDataFrame(
        [(k, v) for k, v in DOCS.items()], "doc_id string, text string"
    )
    got = {
        r.doc_id: (
            r.top_2gram_frac,
            r.top_3gram_frac,
            r.dup_5gram_frac,
            r.repetitive,
        )
        for r in gopher_repetition(df).collect()
    }
    assert set(got) == set(DOCS)
    for k, text in DOCS.items():
        t2, t3, d5 = _twin(text)
        assert got[k][:3] == (t2, t3, d5), k
        assert got[k][3] == (t2 > 0.20 or t3 > 0.18 or d5 > 0.15), k
    assert got["loop"][3] is True
    assert got["diverse"][3] is False
    assert got["tiny"] == (0.0, 0.0, 0.0, False)
    assert got["empty"] == (0.0, 0.0, 0.0, False)
    # the 'half' doc repeats a 10-gram block once: its 5-gram dup share
    # is high while its top-2gram share stays low — the metrics are
    # independent signals
    assert got["half"][2] > 0.15 and got["half"][0] < 0.20


def test_gopher_single_corpus_scan(spark):
    df = spark.createDataFrame(
        [(k, v) for k, v in DOCS.items()], "doc_id string, text string"
    )
    plan = gopher_repetition(df)._jdf.queryExecution().optimizedPlan().toString()
    # the doc relation is a LocalRelation here; the claim is structural —
    # no self-join fan-out of the TEXT column: it is consumed exactly once
    assert plan.lower().count("text#") <= plan.lower().count("doc_id#")
