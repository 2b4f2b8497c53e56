"""Text analysis operators for training-data pipelines.

All JVM-side (built-in pyspark.sql.functions — no Python UDFs): language
ID via stopword-profile scoring, quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting. Each operates
on the driver's `documents` table shape (doc_id, text, lang, source,
n_chars) but takes any (id, text) DataFrame.

Scale: every operator is a single scan with optional one groupBy on the
exploded token stream; token explode multiplies rows ~100× but stays
within a stage (no shuffle before the re-aggregation by doc_id, which is
partial-agg friendly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "it")

# Tiny per-language indicator profiles (n-gram-heuristic structure: score
# each language by indicator-token hits, argmax with deterministic
# tie-break). Profiles are deliberately small and fixed — the operator's
# value is the distributed scoring pattern, not the lexicon.
LANG_PROFILES: dict[str, tuple] = {
    "en": ("the", "and", "of", "is", "data", "with"),
    "es": ("el", "la", "de", "los", "con", "por"),
    "fr": ("le", "la", "les", "des", "avec", "pour"),
}

# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation —
# the common GPT-2-style regex skeleton, simplified to stay portable
# between Java regex (Spark) and RE2 (DuckDB oracle).
BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def tokens(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, token) stream: lowercase, whitespace-split, empties dropped."""
    return df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("token"),
    ).filter(F.col("token") != "")


def quality_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc quality stats: token count, distinct tokens, avg token
    length, stopword ratio — the standard cheap quality filters for a
    pretraining corpus."""
    t = tokens(df, id_col, text_col)
    return t.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct("token").alias("distinct_tokens"),
        F.round(F.avg(F.length("token")), 4).alias("avg_token_len"),
        F.round(
            F.sum(F.col("token").isin(*STOPWORDS_EN).cast("long"))
            / F.count(F.lit(1)),
            4,
        ).alias("stopword_ratio"),
    )


def language_id(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic language ID: score each profile by indicator-token hits,
    argmax with alphabetical tie-break. One token-explode + one groupBy."""
    t = tokens(df, id_col, text_col)
    aggs = [
        F.sum(F.col("token").isin(*words).cast("long")).alias(f"s_{lang}")
        for lang, words in sorted(LANG_PROFILES.items())
    ]
    scored = t.groupBy(id_col).agg(*aggs)
    langs = sorted(LANG_PROFILES)
    # argmax with ties → first alphabetically (deterministic)
    pred = F.col(f"s_{langs[0]}")
    best = F.lit(langs[0])
    for lang in langs[1:]:
        cond = F.col(f"s_{lang}") > pred
        best = F.when(cond, F.lit(lang)).otherwise(best)
        pred = F.when(cond, F.col(f"s_{lang}")).otherwise(pred)
    return scored.select(F.col(id_col), best.alias("lang_pred"), pred.alias("lang_score"))


def corpus_filter(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    max_stopword_ratio: float = 0.8,
    lang: str | None = "en",
    clusters: DataFrame | None = None,
) -> DataFrame:
    """The composed training-data curation pipeline: keep documents that
    pass the quality gates (token-count band, stopword-ratio cap), match
    the target language, and are not non-canonical near-duplicates
    (``clusters`` = connected_components output; the min-id member of
    each cluster survives). Returns the surviving ids.

    One plan, ONE token explode: the quality counters AND the
    per-language indicator scores are aggregates of the same exploded
    token stream, so they fuse into a single groupBy (one partial-agg
    pass over the corpus — round 2 ran two separate explode+agg
    pipelines here); the dedup membership is one anti-join. Thresholds
    compare against the ROUNDED published scores (identical expressions
    to quality_score/language_id) so the filter is engine-reproducible."""
    t = tokens(df, id_col, text_col)
    aggs = [
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(
            F.sum(F.col("token").isin(*STOPWORDS_EN).cast("long"))
            / F.count(F.lit(1)),
            4,
        ).alias("stopword_ratio"),
    ]
    langs = sorted(LANG_PROFILES)
    if lang is not None:
        aggs += [
            F.sum(F.col("token").isin(*words).cast("long")).alias(f"s_{lg}")
            for lg, words in sorted(LANG_PROFILES.items())
        ]
    scored = t.groupBy(id_col).agg(*aggs)
    cond = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("stopword_ratio") <= max_stopword_ratio)
    )
    if lang is not None:
        # argmax with alphabetical tie-break — same contract as language_id
        pred = F.col(f"s_{langs[0]}")
        best = F.lit(langs[0])
        for lg in langs[1:]:
            c = F.col(f"s_{lg}") > pred
            best = F.when(c, F.lit(lg)).otherwise(best)
            pred = F.when(c, F.col(f"s_{lg}")).otherwise(pred)
        cond = cond & (best == lang)
    keep = scored.filter(cond).select(id_col)
    if clusters is not None:
        drop = clusters.filter(F.col("cluster_id") != F.col("doc_id")).select(
            F.col("doc_id").alias(id_col)
        )
        # explicit hint: the cluster frame is checkpoint-backed (no size
        # stats) and Catalyst would otherwise pick a sort-merge join
        keep = keep.join(F.broadcast(drop), id_col, "left_anti")
    return keep


def gopher_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_top2gram_frac: float = 0.20,
    max_top3gram_frac: float = 0.18,
    max_dup5gram_frac: float = 0.15,
) -> DataFrame:
    """Intra-document repetition quality signals (Gopher, Rae et al.
    2021, Table A1): the "quietly degenerate" docs — looping generations,
    boilerplate stutter, scraper echo — that corpus-LEVEL dedup can
    never see because the repetition is inside one document.

    Per doc: ``top_2gram_frac`` / ``top_3gram_frac`` (occurrence share
    of the single most frequent word n-gram) and ``dup_5gram_frac``
    (share of 5-gram occurrences whose gram appears more than once),
    plus ``repetitive`` = any metric above its threshold (defaults are
    the Gopher paper's cutoffs for the corresponding filters; we measure
    occurrence fractions rather than the paper's character fractions —
    same signal, exactly replayable cross-engine without character
    bookkeeping).

    Scale shape: n-grams for all three sizes are built ROW-LOCALLY from
    one split array (array HOFs — no explode+window, the
    functions/dedup.py shingle idiom) and explode ONCE as tagged
    (n, gram) pairs; two partial-agg-friendly groupBys reduce to doc
    grain. One corpus scan total; the doc table re-joins on id only to
    re-attach zero metrics for docs shorter than the smallest n.
    """
    arr = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda t: t != ""
    )

    def grams(n: int):
        # guarded: sequence(1, k) with k < 1 would DESCEND, not empty
        return F.when(
            F.size(arr) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(arr) - n + 1),
                lambda i: F.concat_ws(" ", F.slice(arr, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    def tag(n: int):
        # NB: a 2-arg lambda would make F.transform pass the array INDEX
        # as the second argument — the closure must stay unary
        def f(g):
            return F.struct(F.lit(n).alias("n"), g.alias("gram"))

        return f

    tagged = F.flatten(
        F.array(*[F.transform(grams(n), tag(n)) for n in (2, 3, 5)])
    )
    counts = (
        df.select(F.col(id_col), F.explode(tagged).alias("g"))
        .groupBy(id_col, "g.n", "g.gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_n = counts.groupBy(id_col, "n").agg(
        F.sum("cnt").alias("total"),
        F.max("cnt").alias("top"),
        F.coalesce(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt"))), F.lit(0)
        ).alias("dup"),
    )
    frac = F.col("top").cast("double") / F.col("total").cast("double")
    dupfrac = F.col("dup").cast("double") / F.col("total").cast("double")
    metrics = per_n.groupBy(id_col).agg(
        F.max(F.when(F.col("n") == 2, frac)).alias("__t2"),
        F.max(F.when(F.col("n") == 3, frac)).alias("__t3"),
        F.max(F.when(F.col("n") == 5, dupfrac)).alias("__d5"),
    )
    t2 = F.coalesce(F.col("__t2"), F.lit(0.0))
    t3 = F.coalesce(F.col("__t3"), F.lit(0.0))
    d5 = F.coalesce(F.col("__d5"), F.lit(0.0))
    return (
        df.select(id_col)
        .join(metrics, id_col, "left")
        .select(
            F.col(id_col),
            t2.alias("top_2gram_frac"),
            t3.alias("top_3gram_frac"),
            d5.alias("dup_5gram_frac"),
            (
                (t2 > F.lit(max_top2gram_frac))
                | (t3 > F.lit(max_top3gram_frac))
                | (d5 > F.lit(max_dup5gram_frac))
            ).alias("repetitive"),
        )
    )


def token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count + char count."""
    return df.select(
        F.col(id_col),
        F.size(F.split(F.trim(F.col(text_col)), "\\s+")).alias("n_ws_tokens"),
        # F.lit pattern (not F.expr SQL string) — Spark SQL literals eat
        # backslash escapes, which would corrupt the \s in the pattern
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), F.lit(0))
        ).alias("n_bpe_tokens"),
        F.length(text_col).alias("n_chars"),
    )


# Redaction patterns chosen to mean the same thing in Java regex (Spark)
# and RE2 (DuckDB oracle): no backrefs, no lookaround.
#
# phone: a bare digit run is NOT enough (the round-2 pattern redacted any
# 8+ digits — order ids, timestamps). A match needs structure: either a
# separated 3-group local form with optional +country prefix
# ("(415) 555-1234", "+44 20 7946 0958") — the last group ≥3 digits so
# dashed dates (2026-08-17) don't trip it — or an unseparated
# international form with a MANDATORY leading + ("+14155551234").
# Trade-off stated honestly: 2-group forms ("555-1234") are left alone;
# for a pretraining corpus, under-redacting those beats scrubbing every
# numeric range.
PII_PATTERNS = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone": (
        "(\\+[0-9]{1,3}[\\- ]?)?\\(?[0-9]{2,4}\\)?[\\- ][0-9]{2,4}[\\- ][0-9]{3,6}"
        "|\\+[0-9]{7,15}"
    ),
    "ipv4": "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
}


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII scrubbing for a pretraining corpus: redact emails / phone
    numbers / IPv4 addresses to typed placeholders and count the hits
    per document — all JVM-side regexp_replace/regexp_extract_all, no
    UDFs; redaction order is fixed (email → phone → ipv4) so outputs
    are deterministic and engine-reproducible."""
    out = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS.items():
        counts.append(
            F.size(F.regexp_extract_all(out, F.lit(pat), F.lit(0))).alias(
                f"n_{name}"
            )
        )
        out = F.regexp_replace(out, pat, f"<{name}>")
    return df.select(F.col(id_col), out.alias("text_redacted"), *counts)


def hash_sample(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    fraction: float = 0.1,
    salt: str = "sample",
    strata_col: str | None = None,
    fractions: dict | None = None,
) -> DataFrame:
    """Deterministic content-hash sampling: keep rows whose
    md5(salt:id) bucket (0..9999) falls under fraction·10⁴.

    Unlike rand()-based Bernoulli sampling this is REPRODUCIBLE across
    engines, runs, partitionings, and retries — the property a training
    pipeline needs so a re-run selects the same corpus (and an oracle
    can verify the selection). ``strata_col``+``fractions`` gives
    per-stratum rates (stratified sampling) with the same guarantee;
    strata absent from ``fractions`` default to ``fraction``.
    """
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 10000
    )
    if strata_col is None:
        return df.filter(bucket < int(round(fraction * 10000)))
    fractions = fractions or {}
    thr = F.lit(int(round(fraction * 10000)))
    for k, v in fractions.items():
        thr = F.when(F.col(strata_col) == k, int(round(v * 10000))).otherwise(thr)
    return df.filter(bucket < thr)


def fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercase text,
    truncated to 64 bits of hex — the exact-dedup / provenance key."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " ")
    return df.select(
        F.col(id_col),
        F.substring(F.md5(norm), 1, 16).alias("fingerprint"),
    )


def quality_weighted_sample(
    df: DataFrame,
    weight,
    *,
    id_col: str = "doc_id",
    salt: str = "qsample",
) -> DataFrame:
    """Deterministic quality-weighted (importance) sampling: keep a row
    iff its md5 bucket (0..9999, same scheme as hash_sample) falls under
    floor(clamp(weight, 0, 1) · 10⁴) — each document's admission
    probability IS its quality weight, so E[kept] = Σ weights and the
    kept corpus is biased toward high-quality documents without a sort
    or a global pass (the curriculum/upsampling primitive of a
    pretraining mix).

    ``weight`` is a Column over ``df`` (or a column name). Like
    hash_sample, the selection is REPRODUCIBLE across engines, runs,
    partitionings, and retries — rand()-based weighted sampling is not —
    and the clamp + floor run in IEEE doubles with the identical
    expression shape on the SQL-oracle side, so both engines compute the
    same per-10⁴ threshold bit-for-bit. Row-local filter over one scan:
    no shuffle, fuses into whole-stage codegen.
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    thr = F.floor(
        F.least(F.lit(1.0), F.greatest(F.lit(0.0), w.cast("double")))
        * 10000
    ).cast("long")
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 10000
    )
    return df.filter(bucket < thr)
