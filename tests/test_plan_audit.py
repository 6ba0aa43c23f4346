"""Physical-plan regression suite: the plan properties that make the
headline queries scale are asserted, not assumed — a regression that
drops a pushed filter, breaks a broadcast, or sneaks in a cartesian
product fails here before it costs anything at scale.

Assertions are deliberately loose (feature present / absent), not
plan-string snapshots — AQE re-plans freely within them.
"""

from __future__ import annotations

import re

import pytest

from epl_cas_etl_2026_spark.plans import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    return (
        QUERIES[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def _pushed(plan: str) -> str:
    return " ".join(re.findall(r"PushedFilters: \[[^\]]+\]", plan))


# every query here must never build a cartesian product or an
# all-pairs nested loop (the one BroadcastNestedLoopJoin we allow is
# the tiny-build-side range join, tested separately)
NO_CARTESIAN = [
    "pricing_summary",
    "top_unshipped_orders_q3",
    "purchase_attribution_asof",
    "docs_near_dup_pairs",
    "embedding_near_dup_cosine",
    "docs_contamination_check",
    "orders_global_rank_two_phase",
]


@pytest.mark.parametrize("name", NO_CARTESIAN)
def test_no_cartesian_product(spark, sf_oracle, name):
    plan = _plan(spark, sf_oracle, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pricing_summary_scan_is_pruned(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "pricing_summary")
    pushed = _pushed(plan)
    assert "l_shipdate" in pushed  # date filter reaches the parquet scan
    # projection pruning: the scan must not read money columns it
    # doesn't need (l_tax is unused by this query)
    m = re.search(r"ReadSchema: [^\n]*", plan)
    assert m and "l_tax" not in m.group(0)


def test_q3_broadcasts_and_topk(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "top_unshipped_orders_q3")
    pushed = _pushed(plan)
    assert "c_mktsegment" in pushed and "l_shipdate" in pushed
    assert "BroadcastHashJoin" in plan  # dim side broadcast
    assert "TakeOrderedAndProject" in plan  # top-k, not a full sort


def test_asof_filters_pushed_and_window_keyed(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "purchase_attribution_asof")
    pushed = _pushed(plan)
    assert "purchase" in pushed and "click" in pushed
    assert "SinglePartition" not in plan


def test_range_join_build_side_is_broadcast(spark, sf_oracle):
    # J7: the periods dim (~rows) must be the broadcast build side —
    # a BroadcastNestedLoopJoin here is CORRECT (tiny side), the fact
    # side must never shuffle for the join itself
    plan = _plan(spark, sf_oracle, "orders_period_range_join")
    assert "BroadcastNestedLoopJoin" in plan


def test_two_phase_rank_no_single_partition(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "orders_global_rank_two_phase")
    assert "SinglePartition" not in plan


def test_contamination_benchmark_side_broadcast(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "docs_contamination_check")
    assert "BroadcastHashJoin" in plan


def test_topk_cosine_is_take_ordered(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "embedding_topk_cosine")
    assert "TakeOrderedAndProject" in plan


def test_span_dedup_no_cartesian_and_single_gram_exchange(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "docs_span_dedup_stats")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # r11 shape: the gram stream is shuffled ONCE (explicit gram
    # repartition) and there is NO join back at all — the per-gram doc
    # count comes from a window over the same partitioning, so any
    # join node means the single-exchange plan regressed
    assert "Join" not in plan, plan
    assert plan.count("Window") >= 1
    # exchanges must be exactly: the one gram repartition plus the
    # final tiny per-source rollup — a (gram, source) or (gram,
    # doc_id) scheme would mean the aggregation/window stopped
    # reusing the gram partitioning
    exchanges = re.findall(r"hashpartitioning\((\w+)#", plan)
    assert exchanges.count("gram") == 1, exchanges
    assert set(exchanges) <= {"gram", "source"}, exchanges


def test_vocab_topk_is_take_ordered(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "docs_vocab_topk")
    # top-20 must be TakeOrderedAndProject (partial per-partition top-k,
    # no global sort of the vocabulary), and the rank window must run
    # AFTER the cut so its single partition only ever holds 20 rows
    assert "TakeOrderedAndProject" in plan


def test_char_entropy_scan_prunes_text_early(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "docs_char_entropy")
    # only lang + text are needed from the scan
    m = re.search(r"ReadSchema: [^\n]*", plan)
    assert m and "doc_id" not in m.group(0) and "source" not in m.group(0)


def test_gate_window_follows_policy_rule():
    """The driver records only the first 50 queries(): the ordering
    must be exactly what the mechanical policy computes — a priority
    sort over recorded facts — so no query can be hand-curated into or
    out of the gated window."""
    from epl_cas_etl_2026_spark.plans import ORACLES, QUERIES
    from epl_cas_etl_2026_spark.plans import _ALL_ORACLES, _ALL_QUERIES
    from epl_cas_etl_2026_spark.plans.gate_policy import (
        GATE_CAP,
        classify,
        gate_order,
    )

    order = list(QUERIES)
    assert order == gate_order(_ALL_QUERIES, _ALL_ORACLES)
    assert set(order) == set(_ALL_QUERIES)
    assert set(ORACLES) == set(_ALL_ORACLES)

    # priority is monotone along the dict: no lower-priority query may
    # precede a higher-priority one (the rule never-green ≻ plan-changed
    # ≻ data-stale ≻ current-green is what guarantees changed or
    # unproven plans cannot be rotated out of the driver's window)
    keys = classify(_ALL_QUERIES, _ALL_ORACLES)
    classes = [keys[n][0] for n in order]
    assert classes == sorted(classes)

    # every query needing (re-)gating sits before every current-green
    # one; if ≤ GATE_CAP need gating, all of them are inside the window
    needing = [n for n in order if keys[n][0] <= 2]
    if len(needing) <= GATE_CAP:
        assert set(needing) <= set(order[:GATE_CAP])


def test_gate_ledger_matches_current_testdata():
    """A driver-side testdata regeneration expires prior green rows;
    the ledger pins the generation fingerprint so that happening
    without a ledger refresh fails HERE instead of silently leaving
    stale evidence in the rotation (round-3 verdict, gap #3c)."""
    from epl_cas_etl_2026_spark.plans.gate_policy import (
        load_ledger,
        testdata_fingerprint,
    )

    ledger = load_ledger()
    assert ledger, "gate_ledger.json missing — run tools/update_gate_ledger.py"
    actual = testdata_fingerprint()
    if actual == "unavailable":
        pytest.skip("testdata not present on this host")
    assert ledger.get("testdata_fingerprint") == actual, (
        "testdata regenerated since the ledger was written — run "
        "tools/update_gate_ledger.py so prior-generation green rows "
        "expire and re-enter the gate window"
    )


def test_gate_ledger_fresh_against_head():
    """Round-9 verdict item 5: the ledger refresh is run-by-hand, so a
    forgotten run after an engine-module edit must fail HERE — changed
    helper semantics would otherwise stay vouched by fingerprints taken
    before the change. Fix: rerun tools/update_gate_ledger.py, passing
    --assume-changed for every query whose semantics the edit moved."""
    from epl_cas_etl_2026_spark.plans.gate_policy import ledger_staleness

    findings = ledger_staleness()
    assert findings == [], "stale gate ledger:\n  " + "\n  ".join(findings)


def test_ledger_staleness_detects_doctored_ledger():
    """The staleness checker itself: a ledger whose module hashes,
    round map, or testdata fingerprint lag HEAD is flagged with one
    finding per divergence (deliberately-stale unit fixture)."""
    from epl_cas_etl_2026_spark.plans.gate_policy import (
        current_module_hashes,
        ledger_staleness,
        load_ledger,
        testdata_fingerprint,
    )

    real = load_ledger()
    assert real, "gate_ledger.json missing"
    mods = current_module_hashes()
    rounds = {7: {}, 9: {}}

    fresh = {
        "module_hashes": mods,
        "data_gen_by_round": {"7": "g1", "9": "g2"},
        "testdata_fingerprint": testdata_fingerprint(),
    }
    assert ledger_staleness(fresh, mods, rounds) == []

    # one edited module, one missing round mapping, wrong testdata pin
    stale = dict(fresh)
    stale["module_hashes"] = {
        **mods, "sources/versioned.py": "0" * 64, "sources/new_mod.py": "1" * 64
    }
    stale["data_gen_by_round"] = {"7": "g1"}
    stale["testdata_fingerprint"] = "not-the-real-one"
    findings = ledger_staleness(stale, mods, rounds)
    assert any("sources/versioned.py" in f for f in findings)
    assert any("sources/new_mod.py" in f for f in findings)
    assert any("r9" in f for f in findings)
    assert any("testdata fingerprint" in f for f in findings)
    # the empty ledger degrades to a single loud finding
    assert ledger_staleness({}, mods, rounds) == [
        "gate_ledger.json missing or unreadable"
    ]


def test_ledger_staleness_round_boundary_is_pending_not_stale():
    """Round-10 verdict finding #1: the driver drops
    CORRECTNESS_r{N}.json AFTER the builder's final commit, so at every
    round start the newest round is unmapped. With module hashes equal
    to HEAD that is "pending refresh" — no finding — but the moment any
    engine module diverges it reverts to a hard finding (editing code
    against an unrefreshed ledger must still fail loudly)."""
    from epl_cas_etl_2026_spark.plans.gate_policy import (
        current_module_hashes,
        ledger_staleness,
        testdata_fingerprint,
    )

    mods = current_module_hashes()
    ledger = {
        "module_hashes": mods,
        "data_gen_by_round": {"7": "g1", "9": "g2"},
        "testdata_fingerprint": testdata_fingerprint(),
    }
    # newest round (11) postdates every ledger-known round, tree
    # untouched → pending refresh, suite stays green across the boundary
    rounds = {7: {}, 9: {}, 11: {}}
    assert ledger_staleness(ledger, mods, rounds) == []

    # same boundary but an engine module changed → hard finding again
    edited = {**mods, "sources/versioned.py": "f" * 64}
    findings = ledger_staleness(ledger, edited, rounds)
    assert any("r11" in f for f in findings)

    # an unmapped latest round that is NOT newer than every known round
    # (here: only r11 known, latest is r9) is a doctored ledger, not a
    # boundary artifact — hard finding even with clean module hashes
    doctored = dict(ledger)
    doctored["data_gen_by_round"] = {"11": "g2"}
    findings = ledger_staleness(doctored, mods, {7: {}, 9: {}})
    assert any("r9" in f for f in findings)

    # an empty round map can never claim the boundary exemption
    empty_map = dict(ledger)
    empty_map["data_gen_by_round"] = {}
    findings = ledger_staleness(empty_map, mods, {9: {}})
    assert any("r9" in f for f in findings)


def test_assume_changed_is_sticky_until_next_round():
    """The r6/r10 ledger trap, closed: names passed once via
    --assume-changed persist in the ledger and keep applying on plain
    re-runs — until a NEWER CORRECTNESS round lands, which gated the
    changed code and obsoletes the exclusion."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "ugl",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "update_gate_ledger.py",
        ),
    )
    ugl = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ugl)

    ledger = {
        "assume_changed_pending": {"as_of_round": 9, "names": ["q_a", "q_b"]}
    }
    # same round still latest: pending names keep applying, CLI unions
    assert ugl.effective_assume_changed(set(), ledger, 9) == {"q_a", "q_b"}
    assert ugl.effective_assume_changed({"q_c"}, ledger, 9) == {
        "q_a", "q_b", "q_c",
    }
    # a newer round landed: its rows gated the changed code — only the
    # fresh CLI names apply
    assert ugl.effective_assume_changed(set(), ledger, 10) == set()
    assert ugl.effective_assume_changed({"q_c"}, ledger, 10) == {"q_c"}
    # no pending block at all: plain CLI behavior
    assert ugl.effective_assume_changed({"q_c"}, {}, 9) == {"q_c"}


# ---- round-4 additions: plan-shape pins for the new operators ----


def test_winnow_fingerprint_selection_in_scan_stage(spark, sf_oracle):
    """The winnowing claim: fingerprint selection is a per-row
    expression — no Exchange may exist below the first aggregate
    except the aggregate's own shuffles (source key / distinct-hash
    rollup + the final source-key join)."""
    plan = _plan(spark, sf_oracle, "docs_winnow_fingerprints")
    assert "CartesianProduct" not in plan
    # no window, no per-doc repartition — selection never shuffles docs
    assert "Window" not in plan
    assert plan.count("Exchange") <= 6, plan.count("Exchange")


def test_jaccard_prefix_join_no_cartesian(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "docs_jaccard_prefix_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_probe_match_broadcasts_probe_side(spark, sf_oracle):
    """Length-band theta join must be a BroadcastNestedLoopJoin with
    the (tiny) probe side broadcast — never a CartesianProduct."""
    plan = _plan(spark, sf_oracle, "parts_fuzzy_probe_match")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_gap_fill_windows_are_keyed(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "events_hourly_gap_fill")
    assert "CartesianProduct" not in plan
    # forward-fill window partitioned by user_id, never global
    import re as _re

    for m in _re.findall(r"Window .*", plan):
        assert "user_id" in m, m


def test_cms_sketch_shares_exact_aggregate(spark, sf_oracle):
    """The CMS query folds cells from the persisted exact aggregate:
    both branches must read the cached relation (plan text prints the
    cached child per reference, so the runtime guarantee to pin is
    the InMemoryTableScan nodes, not the FileScan count)."""
    plan = _plan(spark, sf_oracle, "events_heavy_hitters_cms")
    assert plan.count("InMemoryTableScan") >= 2, plan


def test_triangles_degree_oriented_no_cartesian(spark, sf_oracle):
    """Triangle counting must stay equi-join shaped (degree-ordered
    wedge enumeration) — no cartesian/nested-loop pair generation, and
    the wedge join is keyed (hub-proof)."""
    plan = _plan(spark, sf_oracle, "docs_near_dup_triangles")
    assert "CartesianProduct" not in plan
    # the only nested-loop joins allowed are the two 1-row scalar
    # cross joins assembling the final (n_edges × wedge-stats ×
    # triangle-count) row — the wedge/closing joins must be equi
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert any(
        j in plan
        for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )


def test_distribution_ranks_window_is_keyed(spark, sf_oracle):
    """ntile/percent_rank/cume_dist run in ONE window pass partitioned
    by segment — a second Window node or a global (unkeyed) window
    would be a plan regression."""
    plan = _plan(spark, sf_oracle, "customer_balance_distribution_ranks")
    windows = re.findall(r"Window .*", plan)
    assert windows, plan
    for w in windows:
        assert "c_mktsegment" in w, w


def test_range_frame_window_is_keyed(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "orders_trailing_30d_range_frame")
    for w in re.findall(r"Window .*", plan):
        assert "o_custkey" in w, w


def test_ols_single_scan_pruned(spark, sf_oracle):
    """Closed-form OLS is one scan over exactly the three needed
    columns — moments fold in the aggregate, nothing else reads the
    table."""
    plan = _plan(spark, sf_oracle, "lineitem_ols_price_on_qty")
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert len(scans) == 1, plan
    assert len(scans[0].split(",")) == 3, scans


def test_heatmap_exchange_budget(spark, sf_smoke):
    """r6 dashboard-latency item: the grouping-sets collapse keeps
    heatmap_matrix at ONE dim-grained shuffle for all three consumers
    (cells / per-group overall / EPL row) — executed-plan Exchange
    count <= 8 at domain scale (the three-consumer shape measured 19)."""
    from epl_cas_etl_2026_spark import api
    from epl_cas_etl_2026_spark.plans.domain_api import domain_tables

    t = domain_tables(spark, sf_smoke)
    plan = (
        api.heatmap_matrix(t, "operativas")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 8, plan.count("Exchange")


def test_runtime_bloom_filter_injection(spark, sf_oracle):
    """Scale feature demo: Spark's runtime bloom-filter injection
    (SPARK-32268) — with a selective build side and a shuffle join,
    the optimizer injects might_contain(bloom_filter_agg(...)) on the
    probe side so the fact scan drops non-joining rows BEFORE the
    shuffle. Local scans sit under the 10 GiB application-side
    threshold, so the test lowers it to 0 (and disables broadcast so a
    join survives to inject into) purely to exercise the path the
    100 TB deployment gets by default; confs restore afterwards."""
    from pyspark.sql import functions as F

    from epl_cas_etl_2026_spark.sources.parquet import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = load_table(spark, sf_oracle, "orders").filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 450000)
        )
        li = load_table(spark, sf_oracle, "lineitem")
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        row = j.collect()[0]
        assert row["n"] > 0
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_decontaminate_broadcasts_benchmark_grams(spark, sf_smoke):
    """The benchmark gram set must broadcast (left-semi, BuildRight) so
    corpus grams never shuffle, and no cartesian form may appear."""
    from epl_cas_etl_2026_spark.plans.extensions import (
        docs_benchmark_decontaminate,
    )

    plan = (
        docs_benchmark_decontaminate(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi, BuildRight" in plan, plan[:1500]
    assert "CartesianProduct" not in plan


def test_weighted_sample_is_take_ordered(spark, sf_smoke):
    """Efraimidis-Spirakis top-k must compile to TakeOrderedAndProject
    (per-partition heaps + driver merge) — zero exchanges, no global
    sort of the fact."""
    from epl_cas_etl_2026_spark.plans.extensions import (
        orders_weighted_sample_noreplace,
    )

    plan = (
        orders_weighted_sample_noreplace(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange") == 0, plan


def test_exact_substring_dedup_single_scan_jvm_rewrite(spark, sf_oracle):
    """ExactSubstr (round 8): the pinned-candidate / pinned-span plan
    must keep exactly ONE parquet scan in the final query (the gram
    explode and its two-phase hash→string confirm live behind the
    checkpoint cuts and run once, not three times), the doc rewrite
    must stay a JVM higher-order fold (no Arrow/Python eval anywhere),
    and post-checkpoint exchanges must stay on the doc/source keys."""
    plan = _plan(spark, sf_oracle, "docs_exact_substring_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("FileScan parquet") == 1, plan.count("FileScan parquet")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    exchanges = set(re.findall(r"hashpartitioning\((\w+)#", plan))
    assert exchanges <= {"doc_id", "source", "h", "gram"}, exchanges
    # scan reads only the three columns the query needs
    m = re.search(r"ReadSchema: [^\n]*", plan)
    assert m and "lang" not in m.group(0), m.group(0)


def test_jpeg_roundtrip_scan_pruned_and_two_arrow_stages(spark, sf_oracle):
    """The real-JPEG gate query must push the doc_id<512 fixture cap
    into the parquet scan, read ONLY doc_id, and spend exactly two
    Arrow batch stages (encode, decode) — no joins, no row-at-a-time
    Python eval."""
    plan = _plan(spark, sf_oracle, "docs_jpeg_roundtrip_stats")
    pushed = _pushed(plan)
    assert "LessThan(doc_id,512)" in pushed, pushed
    m = re.search(r"ReadSchema: [^\n]*", plan)
    assert m and "struct<doc_id:bigint>" in m.group(0), m and m.group(0)
    assert plan.count("MapInPandas") == 2, plan.count("MapInPandas")
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan, re.findall(r"\w*Join\w*", plan)


@pytest.mark.parametrize(
    "name",
    ["docs_png_roundtrip_stats", "docs_gif_roundtrip_stats"],
)
def test_lossless_codec_gates_scan_pruned_two_arrow_stages(
    spark, sf_oracle, name
):
    """The PNG/GIF gates share the JPEG gate's plan contract: fixture
    cap pushed to the scan, doc_id-only read schema, exactly two
    Arrow stages (encode, decode), no joins."""
    plan = _plan(spark, sf_oracle, name)
    assert "LessThan(doc_id,512)" in _pushed(plan), _pushed(plan)
    m = re.search(r"ReadSchema: [^\n]*", plan)
    assert m and "struct<doc_id:bigint>" in m.group(0), m and m.group(0)
    assert plan.count("MapInPandas") == 2, plan.count("MapInPandas")
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan, re.findall(r"\w*Join\w*", plan)


def test_adpcm_roundtrip_plan_contract(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "docs_adpcm_roundtrip_stats")
    assert "LessThan(doc_id,512)" in _pushed(plan), _pushed(plan)
    assert plan.count("MapInPandas") == 2, plan.count("MapInPandas")
    assert "Join" not in plan


def test_dsir_broadcasts_terms_and_takes_ordered(spark, sf_oracle):
    """DSIR's term table (B=256 rows) must broadcast — never shuffle
    the gram stream by bucket for the weight join — and the top-K
    must be TakeOrderedAndProject, not a global sort."""
    plan = _plan(spark, sf_oracle, "docs_dsir_topk_select")
    assert "TakeOrderedAndProject" in plan
    # the corpus-side weight join must broadcast the 256-row term
    # table (a sort-merge join here would shuffle the whole gram
    # stream by bucket a second time); the bucket-count aggregations
    # themselves may exchange — they are map-side combined to <=B
    # rows per partition before any shuffle
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, re.findall(r"\w*Join\w*", plan)
    # the one nested-loop join is the broadcast 1-row totals frame
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_pii_scrub_is_pure_scan_stage(spark, sf_oracle):
    """The scrub must be whole-stage-codegen string work over the
    scan — no Python eval, no joins, and only the final per-source
    aggregation exchange."""
    plan = _plan(spark, sf_oracle, "docs_pii_scrub_stats")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "Join" not in plan
    exchanges = set(re.findall(r"hashpartitioning\((\w+)#", plan))
    assert exchanges <= {"source"}, exchanges
    m = re.search(r"ReadSchema: [^\n]*", plan)
    assert m and "lang" not in m.group(0), m and m.group(0)


def test_warc_ingest_single_arrow_pair_one_exchange(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "docs_warc_ingest_stats")
    assert plan.count("MapInPandas") == 2  # build files, parse records
    assert "Join" not in plan
    exchanges = set(re.findall(r"hashpartitioning\((\w+)#", plan))
    assert exchanges <= {"rec_type"}, exchanges
