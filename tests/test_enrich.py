"""Enrichment/repair semantics: cross-engine Levenshtein parity (the
fuzzy match is only oracle-comparable if both engines implement the
same metric) and gap-fill spine/fill laws."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from epl_cas_etl_2026_spark.plans.enrich import (
    events_hourly_gap_fill,
    parts_fuzzy_probe_match,
)


def test_levenshtein_parity_spark_vs_duckdb(spark):
    cases = [
        ("kitten", "sitting"),
        ("small ring", "smll ring"),
        ("", "abc"),
        ("abc", ""),
        ("same", "same"),
        ("ab", "ba"),
        ("lavender magenta", "lavander magneta"),
        ("a" * 30, "a" * 29 + "b"),
    ]
    df = spark.createDataFrame(cases, "a string, b string")
    got = {
        (r.a, r.b): r.d
        for r in df.select(
            "a", "b", F.levenshtein("a", "b").alias("d")
        ).collect()
    }
    con = duckdb.connect()
    for a, b in cases:
        (d,) = con.execute(
            "SELECT levenshtein(?, ?)", [a, b]
        ).fetchone()
        assert got[(a, b)] == d, (a, b, got[(a, b)], d)


def test_fuzzy_probe_match_is_band_sound(spark, sf_smoke):
    """Every probe resolves (the corrupted source part is always in
    the probe's length band at distance <= 1), and the reported match
    is at minimal distance: no catalog row in the band beats it."""
    out = parts_fuzzy_probe_match(spark, sf_smoke).collect()
    assert out, "no probes generated at this scale"
    assert all(r.dist <= 1 for r in out), [
        (r.probe_name, r.match_name, r.dist) for r in out if r.dist > 1
    ]


def test_gap_fill_accounting_laws(spark, sf_smoke):
    """Spine accounting: hours = observed + gaps; the spine is the
    user's [first, last] observed hour inclusive; the filled sum is
    at least the observed sum (forward-fill only adds)."""
    out = events_hourly_gap_fill(spark, sf_smoke)
    rows = out.collect()
    assert rows
    assert all(r.n_hours == r.n_observed + r.n_gaps for r in rows)
    assert all(r.n_hours >= 1 and r.n_observed >= 1 for r in rows)

    from epl_cas_etl_2026_spark.sources.parquet import load_table

    events = load_table(spark, sf_smoke, "events")
    span = (
        events.groupBy("user_id")
        .agg(
            (
                (
                    F.unix_timestamp(F.date_trunc("hour", F.max("ts")))
                    - F.unix_timestamp(
                        F.date_trunc("hour", F.min("ts"))
                    )
                )
                / 3600
                + 1
            )
            .cast("long")
            .alias("expect_hours")
        )
        .collect()
    )
    expect = {r.user_id: r.expect_hours for r in span}
    for r in rows:
        assert r.n_hours == expect[r.user_id], (
            r.user_id,
            r.n_hours,
            expect[r.user_id],
        )


def test_prefix_jaccard_join_matches_bruteforce(spark):
    """Synthetic corpus with pairs straddling the t=0.8 threshold:
    the prefix-filtered plan must return exactly the brute-force
    answer (losslessness on a case where filters actually prune)."""
    import itertools

    from epl_cas_etl_2026_spark.plans.setjoin import (
        _NGRAM,
        _T10,
        docs_jaccard_prefix_join,
    )

    base = "a b c d e f g h i j k l m n o p q r s t".split()
    texts = {
        1: " ".join(base),
        2: " ".join(base[:-1] + ["zz"]),          # near-identical
        3: " ".join(base[:10] + ["q r s".split()[0]]),  # partial
        4: "x y z w v u t1 t2 t3 t4",               # unrelated
        5: " ".join(base),                           # exact dup of 1
    }
    df = spark.createDataFrame(
        [(k, v, "s") for k, v in texts.items()],
        "doc_id long, text string, source string",
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        got = {
            (r.j_pct, r.n_pairs)
            for r in docs_jaccard_prefix_join(spark, d).collect()
        }

    def shingles(t):
        ws = t.split()
        return {
            " ".join(ws[i : i + _NGRAM])
            for i in range(len(ws) - _NGRAM + 1)
        }

    from collections import Counter

    hist = Counter()
    for a, b in itertools.combinations(sorted(texts), 2):
        A, B = shingles(texts[a]), shingles(texts[b])
        i, u = len(A & B), len(A | B)
        if i * 10 >= _T10 * u:
            hist[i * 100 // u] += 1
    assert got == {(j, n) for j, n in hist.items()}


def test_gap_fill_properties_random_events(spark):
    """Hypothesis-driven spine laws on random per-user hour offsets:
    n_hours = max-min+1, gaps = hours - observed, and the forward-fill
    sum equals the python reference on every generated case."""
    import datetime as dt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 3, 1)

    @settings(max_examples=12, deadline=None)
    @given(
        st.dictionaries(
            st.integers(0, 3),
            st.lists(
                st.tuples(
                    st.integers(0, 72), st.integers(-5000, 5000)
                ),
                min_size=1,
                max_size=20,
            ),
            min_size=1,
            max_size=3,
        )
    )
    def run(case):
        rows = []
        eid = 0
        for uid, evs in case.items():
            for hoff, cents in evs:
                rows.append(
                    (
                        eid,
                        uid,
                        t0 + dt.timedelta(hours=hoff, minutes=7),
                        cents,
                    )
                )
                eid += 1
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, cents long"
        )
        obs = df.groupBy(
            "user_id", F.date_trunc("hour", "ts").alias("h")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
        spine = (
            obs.groupBy("user_id")
            .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
            .select(
                "user_id",
                F.explode(
                    F.sequence("h0", "h1", F.expr("interval 1 hour"))
                ).alias("h"),
            )
        )
        w = (
            Window.partitionBy("user_id")
            .orderBy("h")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        got = (
            spine.join(obs, ["user_id", "h"], "left")
            .withColumn(
                "fc", F.last("cents", ignorenulls=True).over(w)
            )
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_hours"),
                F.count("n").alias("n_obs"),
                F.sum("fc").alias("fill_sum"),
            )
            .collect()
        )
        for r in got:
            evs = case[r.user_id]
            hours = sorted({h for h, _ in evs})
            span = hours[-1] - hours[0] + 1
            assert r.n_hours == span
            assert r.n_obs == len(hours)
            # python reference forward-fill
            per_hour = {}
            for h, c in evs:
                per_hour[h] = per_hour.get(h, 0) + c
            fill, last = 0, None
            for h in range(hours[0], hours[-1] + 1):
                last = per_hour.get(h, last)
                fill += last
            assert r.fill_sum == fill

    run()


def test_prefix_join_short_docs_do_not_crash_ansi(spark):
    """Sub-3-token docs yield empty shingle sets (no ANSI index error)
    and never pair."""
    import os
    import tempfile

    from epl_cas_etl_2026_spark.plans.setjoin import (
        docs_jaccard_prefix_join,
    )

    df = spark.createDataFrame(
        [(1, "", "s"), (2, "hello world", "s"),
         (3, "a b c d e f", "s"), (4, "a b c d e f", "s")],
        "doc_id long, text string, source string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        out = docs_jaccard_prefix_join(spark, d).collect()
    assert out == [] or all(r.j_pct == 100 for r in out)
    assert sum(r.n_pairs for r in out) == 1  # only the 3-4 exact pair


def test_fastss_blocking_edge_cases(spark, tmp_path):
    """Deletion-neighborhood blocking: substitution / insertion /
    deletion neighbors pair up; transpositions (distance 2) and
    unrelated names do NOT; duplicate-name rows collapse."""
    import os

    from epl_cas_etl_2026_spark.plans.enrich import (
        customers_fastss_editdist_pairs,
    )

    rows = [
        (7, "abcd"),     # base
        (14, "abxd"),    # substitution → pairs with abcd
        (21, "abcde"),   # insertion → pairs with abcd
        (28, "abc"),     # deletion → pairs with abcd
        (35, "abdc"),    # transposition → distance 2, NO pair w/ abcd
        (42, "zzzz"),    # unrelated
        (49, "abcd"),    # duplicate name → no self-pair
        (50, "abce"),    # custkey % 7 != 0 → excluded entirely
    ]
    df = spark.createDataFrame(
        [(k, n, 0.0, 1, "s") for k, n in rows],
        "c_custkey long, c_name string, c_acctbal double, "
        "c_nationkey int, c_mktsegment string",
    )
    d = str(tmp_path)
    df.write.parquet(os.path.join(d, "customer.parquet"))
    got = {
        (r.name_a, r.name_b)
        for r in customers_fastss_editdist_pairs(spark, d).collect()
    }
    assert got == {
        ("abc", "abcd"),    # deletion
        ("abc", "abdc"),    # abc→abdc is ONE insertion — distance 1
        ("abcd", "abcde"),  # insertion
        ("abcd", "abxd"),   # substitution
        # NOT (abcd, abdc): transposition is Levenshtein distance 2
        # NOT anything with zzzz; no self-pair for the dup "abcd";
        # "abce" (custkey 50) excluded by the mod-7 subset
    }
