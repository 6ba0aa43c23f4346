"""DSIR importance selection (docs_dsir_topk_select) — differential
validation against a pure-Python third implementation (hashlib md5
bucketing + math.log weights), plus structural checks.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epl_cas_etl_2026_spark.plans import extensions as ext


def _bucket(word: str) -> int:
    return int(hashlib.md5(word.encode()).hexdigest()[:8], 16) % ext._DSIR_BUCKETS


def _lnfp(x: int) -> int:
    """Third implementation of the Q30 fixed-point ln (the r9 exact
    replacement for the float micro-unit terms) in pure Python ints."""
    ONE = ext._LNFP_ONE
    e = x.bit_length() - 1
    z = x // (1 << (e - 30)) if e > 30 else x * (1 << (30 - e)) if e < 30 else x
    u = ((z - ONE) * ONE) // (z + ONE)
    u2 = (u * u) // ONE
    u3 = (u2 * u) // ONE
    u5 = (u3 * u2) // ONE
    u7 = (u5 * u2) // ONE
    u9 = (u7 * u2) // ONE
    u11 = (u9 * u2) // ONE
    fp = e * ext._LNFP_LN2 + 2 * (
        u + u3 // 3 + u5 // 5 + u7 // 7 + u9 // 9 + u11 // 11
    )
    assert abs(fp / ONE - math.log(x)) < 2e-7  # series fidelity pin
    return fp


def dsir_ref(docs: list[tuple[int, str, str, str]], k: int):
    """docs: (doc_id, text, lang, source). Target = lang == 'en'."""
    B = ext._DSIR_BUCKETS
    grams = [
        (d, lang, src, _bucket(w))
        for d, t, lang, src in docs
        for w in t.split(" ")
        if w
    ]
    r_b = Counter(b for *_, b in grams)
    t_b = Counter(b for _, lang, _, b in grams if lang == "en")
    r_tot, t_tot = len(grams), sum(1 for _, lang, *_ in grams if lang == "en")
    term = {
        b: (
            _lnfp(t_b.get(b, 0) + 1)
            - _lnfp(t_tot + B)
            - _lnfp(rb + 1)
            + _lnfp(r_tot + B)
        )
        for b, rb in r_b.items()
    }
    w: dict[int, list] = {}
    for d, lang, src, b in grams:
        row = w.setdefault(d, [lang, src, 0, 0])
        row[2] += 1
        row[3] += term[b]
    rows = [
        (d, lang, src, n, wt) for d, (lang, src, n, wt) in w.items()
    ]
    rows.sort(key=lambda r: (-r[4], r[0]))
    return rows[:k]


def _write_docs(tmp_path, docs):
    import pandas as pd

    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    pd.DataFrame(
        {
            "doc_id": [d for d, *_ in docs],
            "text": [t for _, t, *_ in docs],
            "lang": [l for *_, l, _ in docs],
            "source": [s for *_, s in docs],
            "n_chars": [len(t) for _, t, *_ in docs],
        }
    ).to_parquet(os.path.join(sf, "documents.parquet"))
    return sf


def test_dsir_matches_reference(spark, tmp_path):
    docs = [
        (0, "the cat sat on the mat", "en", "a"),
        (1, "el gato se sento", "es", "a"),
        (2, "the dog and the cat", "en", "b"),
        (3, "xyzzy qwerty plugh", "de", "b"),
        (4, "the the the cat", "fr", "c"),  # en-like words, non-en lang
        (5, "", "en", "c"),  # no grams → absent from output
    ]
    sf = _write_docs(tmp_path, docs)
    got = [
        tuple(r)
        for r in ext.docs_dsir_topk_select(spark, sf).collect()
    ]
    want = dsir_ref(docs, ext._DSIR_K)
    assert got == want
    # the en-vocabulary doc in a non-en lang ranks high: DSIR scores
    # CONTENT against the target distribution, not the label
    ids = [r[0] for r in got]
    assert ids.index(4) < ids.index(3)


def test_dsir_no_target_slice_still_defined(spark, tmp_path):
    docs = [
        (0, "uno dos tres", "es", "a"),
        (1, "quatre cinq six", "fr", "a"),
    ]
    sf = _write_docs(tmp_path, docs)
    got = [tuple(r) for r in ext.docs_dsir_topk_select(spark, sf).collect()]
    assert got == dsir_ref(docs, ext._DSIR_K)
    assert len(got) == 2  # t_tot = 0 degrades smoothly via smoothing
