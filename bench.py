#!/usr/bin/env python
"""Engine benchmark: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing excludes SparkSession startup and includes a full action
(count via collect of the query result) per query. A warmup query
primes the JVM/codegen paths first.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from epl_cas_etl_2026_spark import get_spark
from epl_cas_etl_2026_spark.plans import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the scan/agg/join/window/dedup/similarity workhorses.
HEADLINE = [
    "pricing_summary",
    "rank_nations_by_custbal",
    "region_revenue_join_chain",
    "latest_order_per_customer",
    "region_segment_matrix",
    "orders_period_range_join",
    "events_tumbling_hourly",
    "events_user_sessions",
    "docs_token_stats",
    "docs_near_dup_pairs",
    "docs_language_id",
    "embedding_topk_cosine",
    "embedding_near_dup_cosine",
    "region_nation_rollup",
    # round-2 additions: corpus capstone, sampling/splitting, native
    # session windows, approx-distinct, two-phase global rank
    "docs_clean_corpus_pipeline",
    "docs_stratified_sample",
    "docs_train_val_test_split",
    "events_session_windows_native",
    "orders_approx_distinct",
    "orders_global_rank_two_phase",
    "top_unshipped_orders_q3",
    "purchase_attribution_asof",
    "events_user_moving_sum",
    "docs_simhash_near_dup",
    "large_orders_q18",
    "lineitem_moments_stats",
    # round-2 late additions: disjunctive pushdown, per-user anomaly scan
    "disjunctive_revenue_q19",
    "events_user_zscore_outliers",
]


def sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return -1.0


def main() -> None:
    spark = get_spark(app_name="epl-cas-bench")
    # warmup: JVM, parquet footer cache, codegen — plus the Arrow /
    # Python-worker pool (the LSH queries' pandas_udf stages), primed
    # at the smoke scale so steady-state throughput is what's measured
    QUERIES["segment_counts"](spark, SF_DIR).collect()
    # sf0.01 (not sf0.001): AQE picks the same physical join strategies
    # as sf0.1 there, so the compiled codegen classes actually get reused
    QUERIES["embedding_near_dup_cosine"](spark, "/root/testdata/sf0.01").collect()

    import gc

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        # min of 2 runs: steady-state engine throughput, not the JIT /
        # GC / IO noise of whichever run a compile lands on (observed
        # 1.4s ↔ 7.1s on the same query+plan across identical runs)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            rows = fn(spark, SF_DIR).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            assert rows is not None
            # Reclaim per-query internals between measurements:
            # LSH/minhash queries persist signature frames (intra-query
            # reuse); accumulating them across 20+ queries drives
            # old-gen GC pressure that distorts later timings.
            # gc.collect() drops Python refs so the ContextCleaner can
            # also reap checkpoints.
            spark.catalog.clearCache()
            gc.collect()
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    # like-for-like vs BENCH_r01 (its headline summed exactly these 14)
    r1_subset = round(sum(timings[n] for n in HEADLINE[:14] if n in timings), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "n_queries": len(timings),
                "r1_subset_sec": r1_subset,
                "sf": sf_from_dir(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
