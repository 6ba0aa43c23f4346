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
