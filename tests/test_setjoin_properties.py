"""Property tests for the exact-filter mathematics behind the PPJoin
query (plans/setjoin.py) — pure-python models of the integer formulas
the Spark plan and DuckDB oracle share, driven by hypothesis so the
ceil arithmetic can't be off by one on any input."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

T10 = 8  # must mirror plans.setjoin._T10


def prefix_len(sz: int) -> int:
    return sz - (sz * T10 + 9) // 10 + 1


def alpha(sza: int, szb: int) -> int:
    return (T10 * (sza + szb) + (10 + T10 - 1)) // (10 + T10)


@settings(max_examples=300, deadline=None)
@given(
    st.sets(st.integers(0, 60), min_size=1, max_size=40),
    st.sets(st.integers(0, 60), min_size=1, max_size=40),
)
def test_prefix_and_positional_filters_are_lossless(a, b):
    """If J(A,B) >= t then: prefixes (canonical ascending order here —
    any global total order works) intersect, the length-ratio filter
    passes, and the FIRST shared prefix element satisfies the
    positional upper bound."""
    inter = len(a & b)
    union = len(a | b)
    if inter * 10 < T10 * union:
        return  # below threshold — filters may prune freely
    sa, sb = sorted(a), sorted(b)
    pa, pb = set(sa[: prefix_len(len(a))]), set(sb[: prefix_len(len(b))])
    assert pa & pb, "prefix filter dropped a qualifying pair"
    assert len(a) * 10 >= T10 * len(b) and len(b) * 10 >= T10 * len(a)
    shared = pa & pb
    first = min(shared, key=lambda x: (sa.index(x), sb.index(x)))
    rna, rnb = sa.index(first) + 1, sb.index(first) + 1
    bound = 1 + min(len(a) - rna, len(b) - rnb)
    assert bound >= alpha(len(a), len(b)), (
        "positional filter dropped a qualifying pair"
    )


@settings(max_examples=300, deadline=None)
@given(st.integers(1, 10_000))
def test_prefix_len_vs_ceil(sz):
    import math

    assert prefix_len(sz) == sz - math.ceil(0.8 * sz) + 1


@settings(max_examples=300, deadline=None)
@given(st.integers(1, 5_000), st.integers(1, 5_000))
def test_alpha_vs_ceil(sza, szb):
    import math

    assert alpha(sza, szb) == math.ceil(
        (0.8 / 1.8) * (sza + szb) - 1e-9
    ) or alpha(sza, szb) == math.ceil((8 * (sza + szb)) / 18)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(0, 2**16 - 1), min_size=7, max_size=120
    )
)
def test_winnowing_density_python_model(hashes):
    """Winnowing guarantee on the key sequence model: with keys
    h*2^20 + pos, consecutive selected positions differ by <= W."""
    from epl_cas_etl_2026_spark.plans.winnow import POS_SCALE, W

    keys = [h * POS_SCALE + i + 1 for i, h in enumerate(hashes)]
    if len(keys) < W:
        return
    sel = {min(keys[s : s + W]) for s in range(len(keys) - W + 1)}
    pos = sorted(k % POS_SCALE for k in sel)
    assert all(1 <= p <= len(keys) for p in pos)
    for x, y in zip(pos, pos[1:]):
        assert 1 <= y - x <= W
