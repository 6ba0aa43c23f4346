"""Semantic traps + invariants for the dataprep plans (PSI drift,
majority vote, OOF target encoding, Gini skew profile, joinability,
Kaplan-Meier). Oracle parity is covered by the differential sweep;
these tests pin the trap semantics on hand-built fixtures."""

from __future__ import annotations

import os

import pytest

from epl_cas_etl_2026_spark.plans.dataprep import (
    catalog_joinability_profile,
    customers_kaplan_meier_lifetime,
    events_psi_drift,
    lineitem_key_skew_gini,
    orders_label_majority_vote,
    orders_target_encoding_oof,
)


def _write(spark, tmp_path, table, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{table}.parquet")
    )
    return d


_LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, "
    "l_tax double, l_returnflag string, l_linestatus string, "
    "l_shipdate timestamp"
)


def _li_row(orderkey, partkey, flag):
    return (orderkey, partkey, 1, 1, 1.0, 1.0, 0.0, 0.0, flag, "O", None)


def test_majority_vote_tie_breaks_to_smallest_label(spark, tmp_path):
    """2-2 tie must pick the lexicographically smallest label and be
    counted as tied; unanimous single-label orders flagged unanimous."""
    rows = (
        [_li_row(1, 1, "B"), _li_row(1, 2, "A"),
         _li_row(1, 3, "A"), _li_row(1, 4, "B")]  # tie A/B -> A
        + [_li_row(2, 1, "B"), _li_row(2, 2, "B"), _li_row(2, 3, "A")]
        + [_li_row(3, 1, "C")]  # unanimous
    )
    d = _write(spark, tmp_path, "lineitem", rows, _LI_SCHEMA)
    got = {r["label"]: r.asDict() for r in
           orders_label_majority_vote(spark, d).collect()}
    assert set(got) == {"A", "B", "C"}
    assert got["A"]["n_orders"] == 1 and got["A"]["n_tied"] == 1
    assert got["A"]["n_unanimous"] == 0
    # order 1: winner A with 2 of 4 votes -> 500000 ppm
    assert got["A"]["agreement_ppm"] == 500000
    assert got["B"]["n_orders"] == 1 and got["B"]["n_tied"] == 0
    assert got["B"]["agreement_ppm"] == 666667  # 2/3 half-up
    assert got["C"]["n_unanimous"] == 1
    assert got["C"]["agreement_ppm"] == 1000000


def test_gini_zero_on_uniform_counts(spark, tmp_path):
    """Every key appearing exactly twice: Gini == 0, HHI == 1e6/n_keys,
    top-1% share == ceil(n/100)*2/total."""
    rows = [_li_row(i, k, "A") for k in range(1, 201) for i in (1, 2)]
    d = _write(spark, tmp_path, "lineitem", rows, _LI_SCHEMA)
    r = lineitem_key_skew_gini(spark, d).collect()[0]
    assert r["n_keys"] == 200 and r["n_rows"] == 400
    assert r["max_count"] == 2
    assert r["gini_millis"] == 0
    assert r["hhi_ppm"] == 5000  # 200 * (2/400)^2 = 1/200
    assert r["top1pct_share_ppm"] == 10000  # 2 keys * 2 rows / 400


def test_gini_extreme_on_one_hot_key(spark, tmp_path):
    """One key holds nearly all rows: Gini approaches (n_keys-1)/n_keys
    and the top-1% share captures the hot key."""
    rows = [_li_row(i, 1, "A") for i in range(1, 1001)]
    rows += [_li_row(2000 + k, 1 + k, "A") for k in range(1, 100)]
    d = _write(spark, tmp_path, "lineitem", rows, _LI_SCHEMA)
    r = lineitem_key_skew_gini(spark, d).collect()[0]
    assert r["n_keys"] == 100 and r["max_count"] == 1000
    assert r["gini_millis"] >= 900
    assert r["top1pct_share_ppm"] >= 900000


_ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def test_oof_encoding_is_leakage_free(spark, tmp_path):
    """Changing ONLY fold-0 targets of a category must not move that
    category's fold-0 encoding (it is computed from the other folds)."""
    import datetime as dt

    def orders(fold0_price):
        rows = []
        for k in range(1, 81):
            price = fold0_price if k % 4 == 0 else 100.0 + (k % 7)
            rows.append(
                (k, 1, "O", price, dt.datetime(1995, 1, 1), "1-URGENT")
            )
        return rows

    d = _write(spark, tmp_path, "orders", orders(9999.0), _ORD_SCHEMA)
    enc_a = {
        (r["priority"], r["fold"]): r["oof_encoding_cents"]
        for r in orders_target_encoding_oof(spark, d).collect()
    }
    d = _write(spark, tmp_path, "orders", orders(1.0), _ORD_SCHEMA)
    enc_b = {
        (r["priority"], r["fold"]): r["oof_encoding_cents"]
        for r in orders_target_encoding_oof(spark, d).collect()
    }
    assert enc_a[("1-URGENT", 0)] == enc_b[("1-URGENT", 0)]
    # ... while the OTHER folds' encodings (which include fold 0) move
    assert enc_a[("1-URGENT", 1)] != enc_b[("1-URGENT", 1)]


def test_psi_nonnegative_and_alarm_on_shift(spark, tmp_path):
    """PSI is a nonnegative divergence; a hard mean shift between the
    two halves must trip the 0.2 alarm, identical halves must not."""
    import datetime as dt

    def ev(i, t_min, val):
        return (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=t_min),
                7, "click", val, None)

    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    # first half values ~U{0..9}, second half shifted by +50
    rows = [ev(i, i, float(i % 10)) for i in range(500)]
    rows += [ev(1000 + i, 1000 + i, 50.0 + i % 10) for i in range(500)]
    d = _write(spark, tmp_path, "events", rows, schema)
    got = events_psi_drift(spark, d).collect()
    assert len(got) == 1 and got[0]["drifted"]
    assert got[0]["psi_micronats"] > 200000

    rows = [ev(i, i, float(i % 10)) for i in range(500)]
    rows += [ev(1000 + i, 1000 + i, float(i % 10)) for i in range(500)]
    d = _write(spark, tmp_path, "events", rows, schema)
    got = events_psi_drift(spark, d).collect()
    assert not got[0]["drifted"]
    assert got[0]["psi_micronats"] >= 0


def test_kaplan_meier_curve_invariants(spark, sf_smoke):
    """Survival is monotone nonincreasing, starts from the full cohort,
    and the at-risk column telescopes by d+q exactly."""
    rows = customers_kaplan_meier_lifetime(spark, sf_smoke).collect()
    assert rows, "curve must be non-empty"
    surv = [r["survival_ppm"] for r in rows]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    assert all(0 <= s <= 1000000 for s in surv)
    for prev, cur in zip(rows, rows[1:]):
        assert cur["at_risk"] == (
            prev["at_risk"] - prev["n_events"] - prev["n_censored"]
        )


def test_joinability_fk_edges_fully_contained(spark, sf_smoke):
    """True FK edges must show containment 1.0; the negative-control
    pair must not; jaccard <= containment always."""
    got = {r["pair"]: r for r in
           catalog_joinability_profile(spark, sf_smoke).collect()}
    fk = [
        "orders.o_custkey~customer.c_custkey",
        "lineitem.l_orderkey~orders.o_orderkey",
        "lineitem.l_partkey~part.p_partkey",
        "lineitem.l_suppkey~supplier.s_suppkey",
        "customer.c_nationkey~nation.n_nationkey",
    ]
    for p in fk:
        assert got[p]["containment_ppm"] == 1000000, p
    neg = got["orders.o_orderkey~customer.c_custkey"]
    assert neg["containment_ppm"] < 1000000
    for r in got.values():
        assert r["jaccard_ppm"] <= r["containment_ppm"]
        assert r["n_intersect"] <= min(r["ndv_a"], r["ndv_b"])


# --- third-implementation recomputation (numpy / pure Python), the
# --- house convention from tests/test_analytics_props.py -----------


def test_psi_matches_pure_python(spark, sf_smoke):
    """Recompute PSI from raw events with an independent pure-Python
    binning/smoothing pipeline; micronat values must match exactly."""
    import math

    ev = (
        __import__("epl_cas_etl_2026_spark.sources.parquet",
                   fromlist=["load_table"])
        .load_table(spark, sf_smoke, "events")
        .select("event_type", "value", "ts")
        .collect()
    )
    tu = [int(r["ts"].timestamp() * 1_000_000) for r in ev]
    mid = (min(tu) + max(tu)) // 2
    by_type: dict = {}
    for r, t in zip(ev, tu):
        win = "ref" if t < mid else "cur"
        by_type.setdefault(r["event_type"], {"ref": [], "cur": []})[
            win
        ].append(r["value"])
    expect = {}
    for et, d in by_type.items():
        vmin, vmax = min(d["ref"]), max(d["ref"])
        width = (vmax - vmin) / 10.0
        counts = {"ref": [0] * 10, "cur": [0] * 10}
        for win in ("ref", "cur"):
            for v in d[win]:
                b = (
                    min(max(int(math.floor((v - vmin) / width)), 0), 9)
                    if vmax > vmin
                    else 0
                )
                counts[win][b] += 1
        psi = 0.0
        for b in range(10):
            pr = (counts["ref"][b] + 1) / (len(d["ref"]) + 10)
            pc = (counts["cur"][b] + 1) / (len(d["cur"]) + 10)
            psi += (pc - pr) * math.log(pc / pr)
        expect[et] = math.floor(psi * 1_000_000 + 0.5)
    got = {r["event_type"]: r["psi_micronats"]
           for r in events_psi_drift(spark, sf_smoke).collect()}
    assert got == expect


def test_gini_matches_pure_python(spark, sf_smoke):
    """Recompute Gini/HHI/top-share from the raw key frequencies with
    the direct (uncompressed) rank formula."""
    import collections
    import math

    from epl_cas_etl_2026_spark.sources.parquet import load_table

    keys = [
        r["l_partkey"]
        for r in load_table(spark, sf_smoke, "lineitem")
        .select("l_partkey")
        .collect()
    ]
    freq = sorted(collections.Counter(keys).values())
    n_keys, s = len(freq), sum(freq)
    s2ic = 2 * sum((i + 1) * c for i, c in enumerate(freq))
    gini = s2ic / (n_keys * s) - (n_keys + 1) / n_keys
    hhi = sum(c * c for c in freq) / (s * s)
    top_n = (n_keys + 99) // 100
    share = sum(sorted(freq, reverse=True)[:top_n]) / s
    r = lineitem_key_skew_gini(spark, sf_smoke).collect()[0]
    assert r["n_keys"] == n_keys and r["n_rows"] == s
    assert r["gini_millis"] == math.floor(gini * 1000 + 0.5)
    assert r["hhi_ppm"] == math.floor(hhi * 1_000_000 + 0.5)
    assert r["top1pct_share_ppm"] == math.floor(share * 1_000_000 + 0.5)


def test_kaplan_meier_matches_pure_python(spark, sf_smoke):
    """Recompute the KM curve with the textbook sequential product."""
    import math

    from epl_cas_etl_2026_spark.sources.parquet import load_table

    pc = (
        load_table(spark, sf_smoke, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    rows = (
        load_table(spark, sf_smoke, "orders")
        .select("o_custkey", "o_orderdate")
        .collect()
    )
    by_cust: dict = {}
    for r in rows:
        d = r["o_orderdate"].date()
        lo, hi = by_cust.get(r["o_custkey"], (d, d))
        by_cust[r["o_custkey"]] = (min(lo, d), max(hi, d))
    gmax = max(hi for _, hi in by_cust.values())
    pts: dict = {}
    for lo, hi in by_cust.values():
        t = (hi - lo).days // 30
        e = 1 if (gmax - hi).days > 180 else 0
        d, q = pts.get(t, (0, 0))
        pts[t] = (d + e, q + 1 - e)
    n = len(by_cust)
    at_risk, surv = n, 1.0
    expect = {}
    for t in sorted(pts):
        d, q = pts[t]
        surv *= 1.0 - d / at_risk if at_risk > d else 0.0
        expect[t] = (at_risk, d, q, math.floor(surv * 1_000_000 + 0.5)
                     if at_risk > d or d == 0 else 0)
        at_risk -= d + q
    got = customers_kaplan_meier_lifetime(spark, sf_smoke).collect()
    assert len(got) == len(expect)
    for r in got:
        ar, d, q, sp = expect[r["t_months"]]
        assert (r["at_risk"], r["n_events"], r["n_censored"]) == (ar, d, q)
        # exp(sum(ln)) vs sequential product: equal after ppm quantization
        assert abs(r["survival_ppm"] - sp) <= 1
    assert pc == len(by_cust)


def test_bigram_lm_perplexity_orders_gibberish_high(spark, tmp_path):
    """A doc made of corpus-frequent transitions must score LOWER
    cross-entropy than a doc of rare/shuffled transitions; single-token
    docs are excluded from scoring."""
    from epl_cas_etl_2026_spark.plans.extensions import (
        docs_bigram_lm_perplexity,
    )

    common = "the cat sat on the mat"
    rows = [(i, common, "en", "clean", len(common)) for i in range(20)]
    rows.append((100, "mat the on sat cat the", "en", "scrambled", 22))
    rows.append((101, "solo", "en", "tiny", 4))  # no transitions
    d = _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    got = {r["source"]: r for r in
           docs_bigram_lm_perplexity(spark, d).collect()}
    assert "tiny" not in got  # <2 tokens -> unscored
    assert got["clean"]["n_docs_scored"] == 20
    avg_clean = got["clean"]["sum_millibits"] / got["clean"]["n_docs_scored"]
    avg_scr = got["scrambled"]["sum_millibits"]
    assert avg_scr > avg_clean


def test_market_basket_known_rule(spark, tmp_path):
    """Items 1,2 co-occur in every basket that holds either: both rule
    directions get confidence 1.0 and lift N/c = 1.5 exactly."""
    from epl_cas_etl_2026_spark.plans.extensions import (
        orders_market_basket_rules,
    )

    rows = []
    for oid in range(1, 11):  # 10 baskets with items 1 and 2
        rows.append(_li_row(oid, 1, "A"))
        rows.append(_li_row(oid, 2, "A"))
    for oid in range(11, 16):  # 5 baskets with item 3 only
        rows.append(_li_row(oid, 3, "A"))
    d = _write(spark, tmp_path, "lineitem", rows, _LI_SCHEMA)
    got = orders_market_basket_rules(spark, d).collect()
    assert len(got) == 2  # 1->2 and 2->1, item 3 pairs with nothing
    for r in got:
        assert {r["antecedent"], r["consequent"]} == {1, 2}
        assert r["pair_support"] == 10
        assert r["confidence_ppm"] == 1000000
        assert r["lift_ppm"] == 1500000  # 10*15/(10*10)


def test_markov_rows_normalize_and_terminate(spark, sf_smoke):
    """Each row of the transition matrix sums to ~1 (ppm rounding),
    and END transitions equal the number of distinct users."""
    import collections

    from epl_cas_etl_2026_spark.plans.extensions import (
        events_markov_transitions,
    )
    from epl_cas_etl_2026_spark.sources.parquet import load_table

    got = events_markov_transitions(spark, sf_smoke).collect()
    by_cur = collections.defaultdict(list)
    for r in got:
        by_cur[r["cur"]].append(r)
    for cur, rs in by_cur.items():
        s = sum(r["p_ppm"] for r in rs)
        assert abs(s - 1000000) <= len(rs), cur  # half-up per-cell
    n_end = sum(r["n_transitions"] for r in got if r["nxt"] == "END")
    n_users = (
        load_table(spark, sf_smoke, "events")
        .select("user_id").distinct().count()
    )
    assert n_end == n_users


def test_randomized_majority_vote_vs_python(spark, tmp_path):
    """Seeded random vote tables: the full rollup must match a direct
    pure-Python recomputation (winner, ties, unanimity, agreement)."""
    import collections
    import random

    for seed in range(4):
        rng = random.Random(seed)
        labels = "ABCD"
        rows, votes = [], collections.defaultdict(list)
        ln = 0
        for k in range(1, 120):
            for _ in range(rng.randrange(1, 6)):
                f = labels[rng.randrange(len(labels))]
                ln += 1
                rows.append(_li_row(k, ln, f))
                votes[k].append(f)
        d = _write(spark, tmp_path, "lineitem", rows, _LI_SCHEMA)
        agg = collections.defaultdict(
            lambda: {"n": 0, "u": 0, "t": 0, "sw": 0, "st": 0}
        )
        for k, vs in votes.items():
            c = collections.Counter(vs)
            mx = max(c.values())
            winners = sorted(w for w, n in c.items() if n == mx)
            w = winners[0]
            a = agg[w]
            a["n"] += 1
            a["u"] += 1 if mx == len(vs) else 0
            a["t"] += 1 if len(winners) > 1 else 0
            a["sw"] += mx
            a["st"] += len(vs)
        got = {r["label"]: r for r in
               orders_label_majority_vote(spark, d).collect()}
        assert set(got) == set(agg), seed
        for lbl, a in agg.items():
            g = got[lbl]
            assert g["n_orders"] == a["n"] and g["n_unanimous"] == a["u"]
            assert g["n_tied"] == a["t"]
            assert g["agreement_ppm"] == (
                a["sw"] * 1_000_000 + a["st"] // 2
            ) // a["st"]


def test_randomized_gini_vs_python(spark, tmp_path):
    """Seeded zipf-ish key frequency tables: quantized Gini/HHI/share
    must match the direct rank-sum recomputation."""
    import math
    import random

    for seed in range(3):
        rng = random.Random(100 + seed)
        rows, ln = [], 0
        freqs = {}
        for k in range(1, 80):
            f = 1 + int(20 / (1 + rng.randrange(10)))
            freqs[k] = f
            for _ in range(f):
                ln += 1
                rows.append(_li_row(ln, k, "A"))
        d = _write(spark, tmp_path, "lineitem", rows, _LI_SCHEMA)
        c = sorted(freqs.values())
        n_keys, s = len(c), sum(c)
        s2ic = 2 * sum((i + 1) * v for i, v in enumerate(c))
        gini = s2ic / (n_keys * s) - (n_keys + 1) / n_keys
        hhi = sum(v * v for v in c) / (s * s)
        top_n = (n_keys + 99) // 100
        share = sum(sorted(c, reverse=True)[:top_n]) / s
        r = lineitem_key_skew_gini(spark, d).collect()[0]
        assert r["gini_millis"] == math.floor(gini * 1000 + 0.5), seed
        assert r["hhi_ppm"] == math.floor(hhi * 1_000_000 + 0.5)
        assert r["top1pct_share_ppm"] == math.floor(share * 1e6 + 0.5)


def test_randomized_market_basket_vs_python(spark, tmp_path):
    """Seeded random baskets: the top-20 rules (support/confidence/
    lift with the deterministic tiebreak) must match pure Python."""
    import collections
    import itertools
    import math
    import random

    from epl_cas_etl_2026_spark.plans.extensions import (
        orders_market_basket_rules,
    )

    for seed in range(3):
        rng = random.Random(200 + seed)
        rows, ln = [], 0
        baskets = {}
        for oid in range(1, 150):
            items = set(rng.sample(range(1, 15), rng.randrange(1, 5)))
            baskets[oid] = items
            for it in items:
                ln += 1
                rows.append(_li_row(oid, it, "A"))
        d = _write(spark, tmp_path, "lineitem", rows, _LI_SCHEMA)
        isup = collections.Counter(
            it for items in baskets.values() for it in items
        )
        psup = collections.Counter()
        for items in baskets.values():
            for a, b in itertools.combinations(sorted(items), 2):
                psup[(a, b)] += 1
        n = len(baskets)
        rules = []
        for (a, b), c12 in psup.items():
            if c12 < 3:
                continue
            for ant, con in ((a, b), (b, a)):
                conf = (c12 * 1_000_000 + isup[ant] // 2) // isup[ant]
                lift = math.floor(
                    c12 * n / (isup[ant] * isup[con]) * 1e6 + 0.5
                )
                rules.append((lift, ant, con, c12, conf))
        rules.sort(key=lambda r: (-r[0], r[1], r[2]))
        expect = [
            (ant, con, c12, conf, lift)
            for lift, ant, con, c12, conf in rules[:20]
        ]
        got = [
            (r["antecedent"], r["consequent"], r["pair_support"],
             r["confidence_ppm"], r["lift_ppm"])
            for r in orders_market_basket_rules(spark, d).collect()
        ]
        assert got == expect, seed


# ---------------------------------------------------------------------------
# round-6 late additions: WOE/IV, golden record, DP histogram
# ---------------------------------------------------------------------------

_CUST_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey int, "
    "c_acctbal double, c_mktsegment string"
)
_ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)
_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_woe_iv_matches_pure_python(spark, tmp_path):
    """Hand-built 2-category fixture recomputed with math.log: WOE
    sign follows the good/bad balance, total IV = integer sum of the
    quantized contributions."""
    import math

    rows = (
        [(i, 1, "O", 1.0, None, "1-URGENT") for i in range(8)]
        + [(i + 100, 1, "F", 1.0, None, "1-URGENT") for i in range(2)]
        + [(i + 200, 1, "O", 1.0, None, "2-HIGH") for i in range(3)]
        + [(i + 300, 1, "F", 1.0, None, "2-HIGH") for i in range(7)]
    )
    d = _write(spark, tmp_path, "orders", rows, _ORD_SCHEMA)
    from epl_cas_etl_2026_spark.plans.dataprep import orders_woe_iv_binning

    got = {r["priority"]: r.asDict()
           for r in orders_woe_iv_binning(spark, d).collect()}
    tg, tb, k = 11, 9, 2
    exp = {}
    for pr, g, b in (("1-URGENT", 8, 2), ("2-HIGH", 3, 7)):
        pg = (g + 0.5) / (tg + 0.5 * k)
        pb = (b + 0.5) / (tb + 0.5 * k)
        woe = math.floor(math.log(pg / pb) * 1_000_000 + 0.5)
        iv = math.floor((pg - pb) * math.log(pg / pb) * 1_000_000 + 0.5)
        exp[pr] = (g, b, woe, iv)
    for pr, (g, b, woe, iv) in exp.items():
        row = got[pr]
        assert (row["n_good"], row["n_bad"]) == (g, b)
        assert row["woe_micronats"] == woe
        assert row["iv_contrib_micronats"] == iv
    total = sum(v[3] for v in exp.values())
    assert all(r["iv_total_micronats"] == total for r in got.values())
    # good-heavy bin ⇒ positive WOE; bad-heavy ⇒ negative
    assert got["1-URGENT"]["woe_micronats"] > 0
    assert got["2-HIGH"]["woe_micronats"] < 0


def test_golden_record_chain_cluster_and_survivorship(spark, tmp_path):
    """A→B→C name chain (each link distance 1, ends distance 2) must
    land in ONE cluster (CC transitivity); golden record = max
    acctbal, tie → min custkey; singletons and non-%7 rows excluded."""
    rows = [
        (7, "AAAA", 1, 10.0, "BUILDING"),
        (14, "AAAB", 1, 30.0, "BUILDING"),
        (21, "AABB", 1, 20.0, "BUILDING"),   # chain: AAAA~AAAB~AABB
        (28, "ZZZZ", 1, 99.0, "BUILDING"),   # singleton — no pair
        (11, "AAAC", 1, 500.0, "BUILDING"),  # not %7 — filtered out
        (35, "QQQQ", 1, 5.0, "BUILDING"),
        (42, "QQQX", 1, 5.0, "BUILDING"),    # tie on balance → key 35
    ]
    d = _write(spark, tmp_path, "customer", rows, _CUST_SCHEMA)
    from epl_cas_etl_2026_spark.plans.dataprep import customers_golden_record

    got = {r["cluster_id"]: r.asDict()
           for r in customers_golden_record(spark, d).collect()}
    assert set(got) == {7, 35}
    chain = got[7]
    assert chain["n_members"] == 3
    assert chain["golden_custkey"] == 14 and chain["golden_name"] == "AAAB"
    assert chain["total_acctbal_cents"] == 6000
    tie = got[35]
    assert tie["n_members"] == 2
    assert tie["golden_custkey"] == 35  # balance tie → lowest key
    assert tie["total_acctbal_cents"] == 1000


def test_dp_histogram_noise_matches_hashlib(spark, sf_smoke):
    """Third implementation of the seeded Laplace draw: hashlib.md5 +
    math.log per event type must reproduce noise_millis exactly, and
    noisy = true*1000 + noise."""
    import hashlib
    import math

    from epl_cas_etl_2026_spark.plans.dataprep import events_dp_histogram

    rows = events_dp_histogram(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        h32 = int(
            hashlib.md5(
                (r["event_type"] + "|dp-seed-1").encode()
            ).hexdigest()[:8],
            16,
        )
        u = (h32 + 0.5) / 2.0**32
        lap = math.log(2.0 * u) if u < 0.5 else -math.log(2.0 * (1.0 - u))
        assert r["noise_millis"] == math.floor(lap * 1000 + 0.5)
        assert r["noisy_millis"] == r["n_true"] * 1000 + r["noise_millis"]


def test_dp_histogram_is_reproducible(spark, tmp_path):
    """Same input ⇒ bit-identical release (the reproducibility property
    the seeded mechanism exists for), and noise is nonzero somewhere
    (it actually perturbs)."""
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1, i % 24), i, t, 1.0, "{}")
        for i in range(50)
        for t in ("click", "view")
    ]
    rows = [(i * 2 + j, *r[1:]) for i, r in enumerate(rows) for j in (0,)]
    d = _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    from epl_cas_etl_2026_spark.plans.dataprep import events_dp_histogram

    a = [tuple(r) for r in events_dp_histogram(spark, d).collect()]
    b = [tuple(r) for r in events_dp_histogram(spark, d).collect()]
    assert a == b
    assert any(r[2] != 0 for r in a)


def test_golden_record_matches_pure_python_randomized(spark, tmp_path):
    """120 seeded random names (some single-edit variants of a shared
    stem) vs a pure-Python union-find + survivorship reimplementation:
    cluster ids, member counts, golden picks and balance totals all
    equal."""
    import math
    import random

    rng = random.Random(60_602)
    alphabet = "ABCD"
    rows = []
    key = 7
    for _ in range(120):
        stem = "".join(rng.choice(alphabet) for _ in range(6))
        rows.append((key, stem, 1, round(rng.uniform(-50, 50), 2), "X"))
        key += 7
        if rng.random() < 0.5:  # a distance-1 sibling of the stem
            pos = rng.randrange(6)
            sib = stem[:pos] + rng.choice(alphabet) + stem[pos + 1:]
            rows.append((key, sib, 1, round(rng.uniform(-50, 50), 2), "X"))
            key += 7
    d = _write(spark, tmp_path, "customer", rows, _CUST_SCHEMA)

    # pure-python third implementation
    def lev1(a, b):
        if a == b:
            return True
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) <= 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        for i in range(lb):
            if b[:i] + b[i + 1:] == a:
                return True
        return False

    names = {}
    for k, nm, _, bal, _ in rows:
        names.setdefault(nm, []).append((k, bal))
    nodes = {nm: min(k for k, _ in ks) for nm, ks in names.items()}
    parent = {v: v for v in nodes.values()}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nms = sorted(nodes)
    edges = 0
    for i, a in enumerate(nms):
        for b in nms[i + 1:]:
            if lev1(a, b):
                ra, rb = find(nodes[a]), find(nodes[b])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
                edges += 1
    assert edges > 0, "seed produced no pairs — fixture useless"
    clusters = {}
    for nm in nms:
        root = find(nodes[nm])
        # only nodes touching >=1 edge appear in the operator output
        clusters.setdefault(root, []).append(nm)
    exp = {}
    for root, members in clusters.items():
        if len(members) == 1 and all(
            not lev1(members[0], o) for o in nms if o != members[0]
        ):
            continue  # true singleton — excluded by construction
        recs = [
            (k, nm, bal)
            for nm in members
            for k, bal in names[nm]
        ]
        golden = max(recs, key=lambda r: (r[2], -r[0]))
        exp[root] = (
            len(recs),
            golden[0],
            golden[1],
            sum(math.floor(b * 100 + 0.5) for _, _, b in recs),
        )

    from epl_cas_etl_2026_spark.plans.dataprep import customers_golden_record

    got = {
        r["cluster_id"]: (
            r["n_members"],
            r["golden_custkey"],
            r["golden_name"],
            r["total_acctbal_cents"],
        )
        for r in customers_golden_record(spark, d).collect()
    }
    assert got == exp


def test_decile_lift_table_matches_pure_python(spark, tmp_path):
    """Hand-built two-segment fixture recomputed in pure Python:
    ntile assignment (equal buckets, earlier get extras), response
    rates, lift and cumulative capture, all in integer ppm."""
    cust, orders = [], []
    k = 1
    # TINY includes the n < 10 ntile edge: only deciles 1..4 exist
    for seg, n, responders in (
        ("AUTO", 23, 7), ("HOUSE", 10, 10), ("TINY", 4, 2)
    ):
        for i in range(n):
            cust.append((k, f"c{k}", 1, 1000.0 - k, seg))
            if i < responders:
                orders.append((k * 10, k, "O", 1.0, None, "1-URGENT"))
            k += 1
    d = _write(spark, tmp_path, "customer", cust, _CUST_SCHEMA)
    _write(spark, tmp_path, "orders", orders, _ORD_SCHEMA)
    from epl_cas_etl_2026_spark.plans.dataprep import (
        customers_decile_lift_table,
    )

    got = {(r["segment"], r["decile"]): r.asDict()
           for r in customers_decile_lift_table(spark, d).collect()}

    resp_keys = {o[1] for o in orders}
    by_seg = {}
    for ck, _, _, bal, seg in cust:
        by_seg.setdefault(seg, []).append((ck, bal))
    for seg, rows in by_seg.items():
        # score DESC, custkey ASC — balances are distinct by design
        rows.sort(key=lambda r: (-r[1], r[0]))
        n = len(rows)
        base, extra = divmod(n, 10)
        sizes = [base + (1 if i < extra else 0) for i in range(10)]
        tot_resp = sum(1 for ck, _ in rows if ck in resp_keys)
        pos, cum = 0, 0
        for dec, size in enumerate(sizes, start=1):
            if size == 0:
                assert (seg, dec) not in got
                continue
            chunk = rows[pos:pos + size]
            pos += size
            nr = sum(1 for ck, _ in chunk if ck in resp_keys)
            cum += nr
            row = got[(seg, dec)]
            assert row["n_customers"] == size
            assert row["n_responders"] == nr
            rr = nr * 1_000_000 // size
            base = tot_resp * 1_000_000 // n
            assert row["response_rate_ppm"] == rr
            # rate-ratio lift (the overflow-safe form the query uses)
            assert row["lift_ppm"] == (rr * 1_000_000 // base if base else 0)
            assert row["cum_capture_ppm"] == (
                cum * 1_000_000 // tot_resp if tot_resp else 0
            )
    # HOUSE: all 10 respond -> every decile lift == 1e6, capture climbs
    assert got[("HOUSE", 10)]["cum_capture_ppm"] == 1_000_000
    assert all(got[("HOUSE", i)]["lift_ppm"] == 1_000_000
               for i in range(1, 11))


def test_logreg_newton_matches_numpy_irls(spark):
    """Third implementation for lineitem_logreg_newton: both Newton
    iterations recomputed in numpy (linalg.solve instead of Cramer,
    vectorized sigmoid instead of the SQL expression) with the same
    per-row integer quantization — exact micro equality. Plus a
    semantic check: with label-independent features the intercept
    must sit near logit(positive share)."""
    import math

    import numpy as np

    from epl_cas_etl_2026_spark.plans.dataprep import lineitem_logreg_newton
    from epl_cas_etl_2026_spark.sources.parquet import load_table
    from tests.conftest import SF_SMOKE as SF

    row = lineitem_logreg_newton(spark, SF).collect()[0]
    li = (
        load_table(spark, SF, "lineitem")
        .select("l_quantity", "l_discount", "l_returnflag")
        .toPandas()
    )
    x1 = li["l_quantity"].astype(np.int64).to_numpy()
    x2 = np.floor(li["l_discount"].astype(np.float64) * 100 + 0.5).astype(
        np.int64
    )
    y = (li["l_returnflag"] == "R").astype(np.int64).to_numpy()
    X = np.stack([x1, x2, np.ones_like(x1)], axis=1).astype(np.float64)
    # iteration 1 from beta = 0: mu = 1/2, W = I/4 exactly
    S = X.T @ X
    r = X.T @ (2 * y - 1).astype(np.float64)
    b = 2.0 * np.linalg.solve(S, r)
    # iteration 2 with per-row integer quantization
    mu = 1.0 / (1.0 + np.exp(-(X @ b)))
    wq = np.floor(mu * (1 - mu) * 1_000_000).astype(np.int64)
    rq = np.floor((y - mu) * 1_000_000).astype(np.int64)
    A = (X * wq[:, None]).T @ X
    t = X.T @ rq.astype(np.float64)
    b2 = b + np.linalg.solve(A, t)
    got = (
        row["beta_qty_micro"],
        row["beta_disc_micro"],
        row["beta_intercept_micro"],
    )
    want = tuple(math.floor(v * 1_000_000 + 0.5) for v in b2)
    # linalg.solve vs Cramer differ in last-ulp rounding; the micro
    # quantization absorbs it except exactly at a boundary — allow 1
    for g, w in zip(got, want):
        assert abs(g - w) <= 1, (got, want)
    p = y.mean()
    assert abs(b2[2] - math.log(p / (1 - p))) < 0.05
    assert row["n_rows"] == len(li) and row["n_pos"] == int(y.sum())


def test_quantile_normalize_matches_pandas(spark):
    """Third implementation for orders_quantile_normalize_stats:
    the rank→global-value mapping recomputed with pandas sort/searchsorted
    arithmetic; exact equality on all five gated columns."""
    import math

    from epl_cas_etl_2026_spark.plans.dataprep import (
        _QN_P,
        orders_quantile_normalize_stats,
    )
    from epl_cas_etl_2026_spark.sources.parquet import load_table
    from tests.conftest import SF_SMOKE as SF

    got = {
        r["grp"]: tuple(r)[1:]
        for r in orders_quantile_normalize_stats(spark, SF).collect()
    }
    o = (
        load_table(spark, SF, "orders")
        .select("o_orderpriority", "o_totalprice", "o_orderkey")
        .toPandas()
    )
    o["cents"] = (
        o["o_totalprice"].astype(float) * 100 + 0.5
    ).apply(math.floor)
    o = o.sort_values(["cents", "o_orderkey"]).reset_index(drop=True)
    gvals = o["cents"].to_list()  # global sort order
    N = len(o)
    want = {}
    for grp, part in o.groupby("o_orderpriority"):
        part = part.sort_values(["cents", "o_orderkey"])
        ng = len(part)
        acc = []
        for r, (_, row) in enumerate(part.iterrows(), start=1):
            tgt = min(max((r * N + ng // 2) // ng, 1), N)
            acc.append((gvals[tgt - 1], int(row["o_orderkey"])))
        want[grp] = (
            ng,
            sum(v for v, _ in acc),
            min(v for v, _ in acc),
            max(v for v, _ in acc),
            sum(((v % _QN_P) * ((k % 1000) + 1)) % _QN_P for v, k in acc)
            % _QN_P,
        )
    assert got == want


def test_ccnet_buckets_tercile_invariants(spark):
    """docs_ccnet_perplexity_buckets: per lang the three buckets
    partition the scored docs with sizes differing by <= 1, and the
    bucket boundaries respect perplexity order
    (max(head) <= min(middle) <= ... modulo the shared-boundary value
    when ties straddle a cut — compare via <=)."""
    from epl_cas_etl_2026_spark.plans.extensions import (
        docs_ccnet_perplexity_buckets,
    )

    rows = docs_ccnet_perplexity_buckets(
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r
    for lang, b in by_lang.items():
        assert set(b) == {"head", "middle", "tail"}, (lang, set(b))
        sizes = [b[k]["n_docs"] for k in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        assert b["head"]["max_millibits"] <= b["middle"]["min_millibits"] or (
            b["head"]["max_millibits"] == b["middle"]["min_millibits"]
        )
        assert b["head"]["max_millibits"] <= b["middle"]["max_millibits"]
        assert b["middle"]["max_millibits"] <= b["tail"]["max_millibits"]
        assert b["head"]["min_millibits"] <= b["middle"]["min_millibits"]
        assert b["middle"]["min_millibits"] <= b["tail"]["min_millibits"]
