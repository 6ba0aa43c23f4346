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


def prefix2_len(sz: int) -> int:
    return min(sz - (sz * T10 + 9) // 10 + 2, sz)


@settings(max_examples=400, deadline=None)
@given(
    st.sets(st.integers(0, 60), min_size=2, max_size=40),
    st.sets(st.integers(0, 60), min_size=2, max_size=40),
)
def test_k2_extended_prefix_theorem(a, b):
    """The heavy branch's witness guarantee: a qualifying pair with
    both sizes >= 2 shares at least TWO elements of the extended
    (pi1 + 1)-prefixes — so blocking heavy docs on unordered prefix
    token pairs is lossless."""
    inter = len(a & b)
    union = len(a | b)
    if inter * 10 < T10 * union:
        return
    sa, sb = sorted(a), sorted(b)
    p2a = set(sa[: prefix2_len(len(a))])
    p2b = set(sb[: prefix2_len(len(b))])
    assert len(p2a & p2b) >= 2, (
        f"k=2 prefix theorem violated: {sorted(a)} {sorted(b)}"
    )


def _brute_jaccard_hist(texts: dict[int, str]) -> dict[int, int]:
    """Brute-force all-pairs J>=0.8 histogram — the oracle spec in
    pure Python (word 3-gram distinct shingles)."""
    shs = {}
    for i, t in texts.items():
        ws = [w for w in t.split(" ") if w]
        shs[i] = {
            " ".join(ws[j : j + 3]) for j in range(max(len(ws) - 2, 0))
        }
    hist: dict[int, int] = {}
    ids = sorted(texts)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = shs[ids[ai]], shs[ids[bi]]
            if not a or not b:
                continue
            i = len(a & b)
            u = len(a | b)
            if i * 10 >= T10 * u:
                jp = i * 100 // u
                hist[jp] = hist.get(jp, 0) + 1
    return hist


def test_df_capped_branches_lossless_on_adversarial_corpus(
    spark, tmp_path
):
    """End-to-end branch-split check on a corpus built to exercise all
    THREE candidate branches: 70 boilerplate docs sharing a heavy
    (df > 64) core (heavy-pair branch), 70 identical 3-token docs
    (singleton heavy tiny branch), light rare-token near-dups (light
    branch), and below-threshold decoys. The query's histogram must
    equal the pure-Python brute force exactly."""
    import pandas as pd

    from epl_cas_etl_2026_spark.plans.setjoin import docs_jaccard_prefix_join

    texts: dict[int, str] = {}
    core = " ".join(f"core{i}" for i in range(14))
    # heavy-pair branch: 70 docs = shared core + one unique token at
    # the END (shingle sets overlap heavily; some pairs land >= 0.8,
    # the unique tails keep others below — brute force decides)
    for d in range(70):
        texts[d] = core + (f" tail{d}" if d % 2 else "")
    # tiny branch: 70 identical 3-token docs (one shingle, df 70)
    for d in range(70, 140):
        texts[d] = "tiny a b"
    # light branch: rare-token near-dup pairs
    for d in range(140, 150):
        toks = [f"rare{d}_{i}" for i in range(12)]
        texts[2000 + 2 * d] = " ".join(toks)
        texts[2000 + 2 * d + 1] = " ".join(toks[:11] + [f"alt{d}"])
    # decoys sharing only sub-threshold overlap with the core
    for d in range(150, 160):
        texts[d] = " ".join(f"core{i}" for i in range(5)) + f" odd{d} odd{d}x"
    pdf = pd.DataFrame(
        {"doc_id": list(texts), "text": [texts[k] for k in texts]}
    )
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)
    got = {
        r["j_pct"]: r["n_pairs"]
        for r in docs_jaccard_prefix_join(spark, str(tmp_path)).collect()
    }
    want = _brute_jaccard_hist(texts)
    assert got == want, f"got {got} want {want}"
    # the fixture must actually exercise the heavy regime
    assert want.get(100, 0) >= 70 * 69 // 2, "tiny-branch pairs missing"


def test_two_phase_row_number_matches_window(spark):
    """two_phase_row_number == unpartitioned ROW_NUMBER on randomized
    data with heavy order-key ties (unique via the id tiebreak)."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from epl_cas_etl_2026_spark.operators.ranking import (
        two_phase_row_number,
    )

    rng = random.Random(13)
    rows = [(i, rng.randint(0, 20)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, score long")
    got = {
        r["id"]: r["__rn"]
        for r in two_phase_row_number(
            df, [F.desc("score"), F.asc("id")], num_range_partitions=7
        ).collect()
    }
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_two_phase_grouped_row_number_matches_window(spark):
    """two_phase_grouped_row_number == Window.partitionBy(group) on
    randomized data: several groups of very different sizes, ties on
    the score column."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from epl_cas_etl_2026_spark.operators.ranking import (
        two_phase_grouped_row_number,
    )

    rng = random.Random(17)
    rows = []
    for i in range(3000):
        g = rng.choice(["a", "b", "c", "dd", "e"])
        rows.append((i, g, rng.randint(0, 10)))
    df = spark.createDataFrame(rows, "id long, grp string, score long")
    got = {
        (r["grp"], r["id"]): r["__rn"]
        for r in two_phase_grouped_row_number(
            df,
            "grp",
            [F.asc("score"), F.asc("id")],
            num_range_partitions=9,
        ).collect()
    }
    w = Window.partitionBy("grp").orderBy(F.asc("score"), F.asc("id"))
    want = {
        (r["grp"], r["id"]): r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want
