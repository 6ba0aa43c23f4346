"""Per-query optimization harness (round-11): for each named query,
time the noop-sink materialization (min-of-N on the bench session) and
dump `.explain("formatted")` to plans/<outdir>/<query>_<tag>.txt.

Usage:
    python tools/profile_query.py --queries a,b,c [--tag before]
        [--sf /root/testdata/sf0.1] [--runs 3] [--no-explain]
        [--outdir r12]

Explain is captured BEFORE timing (plan only, no execution cost); the
timed runs use the same get_spark session bench.py uses, so numbers are
comparable to BENCH_FULL.json entries.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-explain", action="store_true")
    ap.add_argument("--warm-sf", default="/root/testdata/sf0.01")
    ap.add_argument("--outdir", default="r12")
    args = ap.parse_args()

    from epl_cas_etl_2026_spark import get_spark
    from epl_cas_etl_2026_spark.plans import QUERIES

    spark = get_spark(app_name="epl-cas-profile")
    import gc

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", args.outdir)
    os.makedirs(outdir, exist_ok=True)

    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    results = {}
    for name in names:
        fn = QUERIES[name]
        if not args.no_explain:
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(outdir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(plan)
        if args.runs < 1:  # explain-only mode
            print(f"{name}: explain captured", flush=True)
            continue
        # warmup at small sf (codegen/Arrow prime), like bench.py
        spark.sparkContext.setJobDescription(f"warmup {name}")
        fn(spark, args.warm_sf).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        gc.collect()
        best = None
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
            gc.collect()
        results[name] = round(best, 3)
        print(f"{name}: {results[name]} s", flush=True)
    print(json.dumps({"tag": args.tag, "sf": args.sf, "timings": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
