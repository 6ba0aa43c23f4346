"""Distributed BPE trainer (docs_bpe_train_merges) — differential
validation against a pure-Python third implementation (the classic
Sennrich pair-count/merge loop), plus trap fixtures for the greedy
non-overlap rule and tie-breaking.
"""

from __future__ import annotations

import os
import sys
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bpe_train_ref(words: list[str], rounds: int):
    """Pure-Python BPE trainer: overlap-counted pair frequencies
    (zip(seg, seg[1:]) — the Sennrich counting rule), greedy
    left-to-right non-overlapping merge application, ties broken
    (count DESC, lhs ASC, rhs ASC)."""
    freq = Counter(w for w in words if w)
    segs = {w: list(w) for w in freq}
    out = [(0, "", "", 0, sum(f * len(segs[w]) for w, f in freq.items()))]
    for k in range(1, rounds + 1):
        pc: Counter = Counter()
        for w, f in freq.items():
            s = segs[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, s in segs.items():
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            segs[w] = ns
        out.append(
            (k, a, b, c, sum(f * len(segs[w]) for w, f in freq.items()))
        )
    return out


def _spark_rows(spark, tmp_path, texts, rounds=None):
    import pandas as pd

    from epl_cas_etl_2026_spark.plans import extensions as ext

    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    df.to_parquet(os.path.join(sf, "documents.parquet"))
    res = ext.docs_bpe_train_merges(spark, sf)
    return [
        (
            r["merge_rank"], r["lhs"], r["rhs"], r["pair_freq"],
            r["tokens_after"],
        )
        for r in res.collect()
    ]


def test_overlap_count_vs_nonoverlap_merge(spark, tmp_path):
    """'aaaa' has THREE (a,a) pair occurrences (overlap counting) but
    merging rewrites it to just two 'aa' tokens (non-overlap rule) —
    the two-sided trap every naive BPE gets wrong on one side."""
    from epl_cas_etl_2026_spark.plans import extensions as ext

    rows = _spark_rows(spark, tmp_path, ["aaaa aaaa b"])
    ref = bpe_train_ref("aaaa aaaa b".split(), ext._BPE_TRAIN_ROUNDS)
    assert rows == ref
    assert rows[1][1:4] == ("a", "a", 6)  # 3 overlap-counted pairs × 2
    assert rows[1][4] == ref[0][4] - 4  # but only 2 merges per word


def test_tie_break_is_lexicographic(spark, tmp_path):
    rows = _spark_rows(spark, tmp_path, ["zy zy xw xw"])
    # (z,y) and (x,w) both have count 2 → (x,w) wins lexicographically
    assert rows[1][1:3] == ("x", "w")


def test_learned_merges_compose_across_rounds(spark, tmp_path):
    corpus = ["the then they " * 3]
    from epl_cas_etl_2026_spark.plans import extensions as ext

    rows = _spark_rows(spark, tmp_path, corpus)
    ref = bpe_train_ref(corpus[0].split(), ext._BPE_TRAIN_ROUNDS)
    assert rows == ref
    # some later merge must have a multi-char side (e.g. 'th' + 'e')
    assert any(len(r[1]) > 1 or len(r[2]) > 1 for r in rows[2:])


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(alphabet="abcdeXY ", min_size=1, max_size=24),
        min_size=1,
        max_size=6,
    )
)
def test_differential_random_corpora(spark, tmp_path_factory, texts):
    from epl_cas_etl_2026_spark.plans import extensions as ext

    tmp = tmp_path_factory.mktemp("bpe")
    rows = _spark_rows(spark, tmp, texts)
    words = [w for t in texts for w in t.split(" ") if w]
    ref = bpe_train_ref(words, ext._BPE_TRAIN_ROUNDS)
    assert rows == ref


def test_empty_corpus_emits_rank0_only(spark, tmp_path):
    rows = _spark_rows(spark, tmp_path, [])
    assert len(rows) == 1
    assert rows[0][0] == 0 and rows[0][4] is None
