"""Exact substring-level dedup (Lee et al. ExactSubstr, round-8):
adversarial fixtures vs a pure-Python third implementation.

The gated query (plans/extensions.docs_exact_substring_dedup) marks
every position whose 50-char gram occurs >= 2 times in the corpus,
merges covered intervals per doc, and rewrites docs by deleting the
merged spans. The reference implementation below recomputes all of it
with dict counters and plain string slicing — no Spark, no SQL — on
fixtures built to hit the edges: overlapping grams merging into one
span, within-doc repeats, whole-doc duplicates, sub-threshold docs,
spans flush against both string edges, and a duplicate straddling two
sources.
"""

from __future__ import annotations

import os
import sys
from collections import Counter

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

L = 50
M = 1000000007


def ref_exact_substring(docs: list[tuple[int, str, str]]):
    """Pure-Python ExactSubstr: returns (spans, rewritten) where spans
    is {doc_id: [(s, e)] 1-based half-open} and rewritten {doc_id: str}."""
    counts: Counter = Counter()
    for _id, _src, text in docs:
        for i in range(len(text) - L + 1):
            counts[text[i : i + L]] += 1
    spans: dict[int, list[tuple[int, int]]] = {}
    rewritten: dict[int, str] = {}
    for doc_id, _src, text in docs:
        marked = [
            i
            for i in range(len(text) - L + 1)
            if counts[text[i : i + L]] >= 2
        ]
        merged: list[list[int]] = []
        for i in marked:
            if merged and i <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], i + L)
            else:
                merged.append([i, i + L])
        spans[doc_id] = [(s + 1, e + 1) for s, e in merged]  # 1-based
        kept, pos = [], 0
        for s, e in merged:
            kept.append(text[pos:s])
            pos = e
        kept.append(text[pos:])
        rewritten[doc_id] = "".join(kept)
    return spans, rewritten


FIXTURE = [
    # two docs sharing a 70-char run -> 21 overlapping dup grams each,
    # merged into ONE span per doc
    (0, "a", "PREFIX0 " + "X" * 31 + "SHARED RUN " + "Y" * 29 + " TAIL0"),
    (1, "a", "other lead " + "X" * 31 + "SHARED RUN " + "Y" * 29 + " end1"),
    # within-doc repeat: the same 55-char block twice in one doc
    (2, "b", ("B" * 20 + " inner repeat block " + "C" * 15) * 2 + " tail2"),
    # sub-threshold doc: 49 chars, never marked
    (3, "b", "z" * 49),
    # whole-doc duplicates (entire text removed)
    (4, "c", "W" * 60 + " entire doc duplicated " + "V" * 10),
    (5, "c", "W" * 60 + " entire doc duplicated " + "V" * 10),
    # span flush at the START of the doc (shares its head with doc 0's
    # head — both get a leading span)
    (6, "a", "PREFIX0 " + "X" * 31 + "SHARED RUN " + "Q" * 40 + "unique tail six"),
]


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("substr_dedup")
    spark.createDataFrame(
        FIXTURE, "doc_id long, source string, text string"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_fixture_matches_reference(spark, fixture_dir):
    from epl_cas_etl_2026_spark.plans.extensions import (
        docs_exact_substring_dedup,
    )

    got = {
        r["source"]: r
        for r in docs_exact_substring_dedup(spark, fixture_dir).collect()
    }
    spans, rewritten = ref_exact_substring(FIXTURE)
    by_src: dict[str, dict] = {}
    for doc_id, src, text in FIXTURE:
        agg = by_src.setdefault(
            src,
            {"affected": 0, "n_spans": 0, "removed": 0, "ck": 0, "kept": 0},
        )
        sp = spans[doc_id]
        if sp:
            agg["affected"] += 1
        agg["n_spans"] += len(sp)
        agg["removed"] += sum(e - s for s, e in sp)
        for s, e in sp:
            agg["ck"] = (agg["ck"] + (doc_id * 1000003 + s * 1009 + e) % M) % M
        agg["kept"] += len(rewritten[doc_id])
    for src, agg in by_src.items():
        if agg["n_spans"] == 0:
            assert src not in got
            continue
        r = got[src]
        assert r["n_docs_affected"] == agg["affected"], src
        assert r["n_spans"] == agg["n_spans"], src
        assert r["chars_removed"] == agg["removed"], src
        assert r["span_checksum"] == agg["ck"], src
        assert r["chars_kept"] == agg["kept"], src


def test_adversarial_shapes_in_reference():
    """Sanity-pin the fixture actually exercises the edge cases the
    docstring claims (so a future fixture edit can't silently defang
    the test)."""
    spans, rewritten = ref_exact_substring(FIXTURE)
    assert len(spans[0]) == 1  # 21 overlapping grams merged to one span
    assert len(spans[2]) == 1  # within-doc repeat: both copies one run
    assert spans[3] == []  # sub-threshold doc untouched
    text4 = FIXTURE[4][2]
    assert spans[4] == [(1, len(text4) + 1)]  # whole doc removed
    assert rewritten[4] == ""
    assert spans[6][0][0] == 1  # span flush at doc start
    assert rewritten[6].endswith("unique tail six")


def test_rewrite_idempotent():
    """Deduping the rewritten corpus finds nothing new (no 50-gram can
    survive with count >= 2 after removal... unless deletion GLUES two
    halves into a new duplicate — ExactSubstr is one-pass by design, so
    assert only that the ORIGINAL duplicated grams are gone)."""
    spans, rewritten = ref_exact_substring(FIXTURE)
    counts: Counter = Counter()
    for _id, _src, text in FIXTURE:
        for i in range(len(text) - L + 1):
            counts[text[i : i + L]] += 1
    dup_grams = {g for g, c in counts.items() if c >= 2}
    for doc_id in rewritten:
        t = rewritten[doc_id]
        for i in range(len(t) - L + 1):
            assert t[i : i + L] not in dup_grams, (doc_id, i)


# -- hypothesis: random block-structured corpora vs the reference ----------
from hypothesis import given, settings, strategies as st


@st.composite
def _block_corpus(draw):
    """Docs built by concatenating blocks from a SMALL pool, so 50-char
    duplicates arise across docs naturally (pure-random text would
    never collide at L=50)."""
    pool_n = draw(st.integers(2, 5))
    blocks = [
        draw(
            st.text(
                alphabet=st.sampled_from("abcdef "),
                min_size=18,
                max_size=30,
            )
        )
        for _ in range(pool_n)
    ]
    docs = []
    n_docs = draw(st.integers(2, 8))
    for i in range(n_docs):
        seq = draw(
            st.lists(st.integers(0, pool_n - 1), min_size=0, max_size=6)
        )
        docs.append((i, f"src{i % 2}", "".join(blocks[j] for j in seq)))
    return docs


@settings(max_examples=4, deadline=None)
@given(_block_corpus())
def test_hypothesis_random_corpus_matches_reference(
    spark, tmp_path_factory, corpus
):
    from epl_cas_etl_2026_spark.plans.extensions import (
        docs_exact_substring_dedup,
    )

    d = tmp_path_factory.mktemp("substr_hyp")
    spark.createDataFrame(
        corpus, "doc_id long, source string, text string"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    got = {
        r["source"]: r
        for r in docs_exact_substring_dedup(spark, str(d)).collect()
    }
    spans, rewritten = ref_exact_substring(corpus)
    by_src: dict[str, dict] = {}
    for doc_id, src, _text in corpus:
        agg = by_src.setdefault(src, {"n_spans": 0, "removed": 0, "kept": 0})
        sp = spans[doc_id]
        agg["n_spans"] += len(sp)
        agg["removed"] += sum(e - s for s, e in sp)
        agg["kept"] += len(rewritten[doc_id])
    for src, agg in by_src.items():
        if agg["n_spans"] == 0:
            assert src not in got
            continue
        assert got[src]["n_spans"] == agg["n_spans"], src
        assert got[src]["chars_removed"] == agg["removed"], src
        assert got[src]["chars_kept"] == agg["kept"], src
