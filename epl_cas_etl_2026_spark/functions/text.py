"""Text-analysis expression library (training-data pipeline ops —
BASELINE.json north star; not present in the reference, which has no
free-text analytics).

All pure Column expressions (JVM-side, codegen'd): at 100 TB these run
inside the parquet scan stage with zero Python involvement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small deterministic stopword list for quality scoring / lang-id.
STOPWORDS = ("the", "a", "and", "of", "to", "in")

# BPE-ish tokenizer regex: letter runs, digit runs, single punctuation.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def words(text: Column) -> Column:
    """Whitespace tokens."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(words(text)).cast("long")


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish regex tokens (letters / digits / punct runs)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0))).cast(
        "long"
    )


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are letters or spaces — a cheap
    quality signal (garbled/binary text scores low)."""
    clean = F.regexp_replace(text, "[^A-Za-z ]", "")
    return F.length(clean).cast("double") / F.nullif(
        F.length(text).cast("double"), F.lit(0.0)
    )


def stopword_ratio(text: Column, stopwords=STOPWORDS) -> Column:
    """Fraction of whitespace tokens that are stopwords; natural prose
    sits in a known band, keyword soup doesn't."""
    toks = words(F.lower(text))
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits.cast("double") / F.nullif(F.size(toks).cast("double"), F.lit(0.0))


def quality_class(text: Column) -> Column:
    """Composite keep/review/drop quality verdict (length + alpha
    ratio + stopword band)."""
    n = token_count(text)
    ar = alpha_ratio(text)
    return (
        F.when(n < 5, F.lit("drop"))
        .when(ar < 0.8, F.lit("review"))
        .otherwise(F.lit("keep"))
    )


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip
    non-alphanumerics, collapse whitespace."""
    t = F.lower(text)
    t = F.regexp_replace(t, "[^a-z0-9 ]", " ")
    t = F.regexp_replace(t, "\\s+", " ")
    return F.trim(t)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (md5 so the DuckDB oracle computes the identical value)."""
    return F.md5(normalize_text(text))


def lang_scores(text: Column, markers: dict[str, tuple[str, ...]]) -> Column:
    """N-gram/marker-based language-ID heuristic: hits per language's
    marker list; returns the argmax language (ties → lexicographic)."""
    toks = words(F.lower(text))
    best_lang = None
    best_score = None
    for lang in sorted(markers):
        arr = F.array(*[F.lit(m) for m in markers[lang]])
        score = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        if best_lang is None:
            best_lang, best_score = F.lit(lang), score
        else:
            better = score > best_score
            best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
            best_score = F.when(better, score).otherwise(best_score)
    return best_lang


def greedy_pair_merge(
    arr: Column, w1: Column, w2: Column, merged: Column
) -> Column:
    """BPE-style greedy left-to-right merge of adjacent pair
    (w1, w2) → merged, as a fold over the token array: accumulator is
    the rewritten prefix; a merge consumes its right token so
    overlapping occurrences ('a a a' with pair (a,a)) merge only once
    — exactly the BPE training rule. Mirrors the DuckDB list_reduce
    shape in plans/extensions.docs_bpe_merge_step's oracle."""
    return F.aggregate(
        arr,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == w1) & (x == w2),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def first_fit_pack(items: Column, capacity: int) -> Column:
    """First-fit bin packing as a fold: accumulator is the bin-load
    array; each item lands in the first bin it fits (array_position
    over a predicate transform) or opens a new bin. Feed it a
    size-DESCENDING list for the FFD 11/9·OPT+1 guarantee. Returns
    the final bin loads."""

    def step(acc, x):
        fits = F.transform(acc, lambda v: v + x <= F.lit(capacity))
        pos = F.array_position(fits, F.lit(True))
        return F.when(pos == 0, F.concat(acc, F.array(x))).otherwise(
            F.transform(
                acc, lambda v, i: F.when(i + 1 == pos, v + x).otherwise(v)
            )
        )

    return F.aggregate(items, F.array().cast("array<long>"), step)
