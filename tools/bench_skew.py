"""Round-6 skew bench (VERDICT r5 item 5): the TPC-H-ish testdata is
uniform, so the salted-join and AQE-skew paths were correctness-proven
(lineitem_salted_skew_join_rollup) but never MEASURED under real skew.

This script generates a zipf-skewed fact once (gitignored
.localdata/skew: 60M rows whose join key follows a heavy zipf head —
the hottest key owns ~38% of all rows, so ONE reducer gets ~23M rows
while the median gets ~1.2M: a 20× straggler, and a hot shuffle
partition (~460 MB) past AQE's 256 MB skew-split threshold so the
reactive path actually engages) plus a 200k-row dim (too big to
broadcast at the default 10 MB threshold, the salted-join target
zone), then times three strategies for fact ⋈ dim → global agg.

A first cut at 6M rows measured salted 2.6× SLOWER than plain: the
hot reducer held only ~1M rows (<1 s of work, and under AQE's split
threshold), so the bench was timing the salt's dim-replication
overhead against no straggler at all. The lesson is part of the
result: salting pays only when the hot key's single-reducer time
dominates the job — size the bench (and production decision) by
straggler share, not by "the data is skewed".

  plain   — AQE off, sort-merge join on the raw key: the hot key's
            rows land on ONE reducer (the straggler baseline);
  aqe     — AQE on with skew-join splitting (reactive mitigation);
  salted  — AQE off, sources/layout.salted_skew_join (proactive
            16-way salt, the form that also works when the join feeds
            an operator AQE can't re-split, e.g. a window on the key).

Each strategy runs noop-sink min-of-N on the same session (runtime
confs flipped per scenario; results verified equal across strategies
first). Prints one JSON line; the round-6 BENCH note records it.

Usage: python tools/bench_skew.py [--rows 60000000] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKEW_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".localdata",
    "skew",
)
N_DIM = 200_000


def _gen(rows: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(SKEW_DIR, exist_ok=True)
    rng = np.random.default_rng(7)
    # zipf(1.5) clipped to the dim domain: k=1 (→ key 0) captures
    # ~38% of draws (1/ζ(1.5)) — one genuinely hot reducer under
    # hash shuffle, far past AQE's skew-split threshold at 60M rows
    z = rng.zipf(1.5, rows)
    key = np.minimum(z - 1, N_DIM - 1)
    pq.write_table(
        pa.table({"key": key.astype(np.int64),
                  "v": rng.uniform(0, 100, rows)}),
        os.path.join(SKEW_DIR, "fact.parquet"),
    )
    pq.write_table(
        pa.table({"key": np.arange(N_DIM, dtype=np.int64),
                  "w": rng.uniform(0, 1, N_DIM)}),
        os.path.join(SKEW_DIR, "dim.parquet"),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=60_000_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    if not os.path.exists(os.path.join(SKEW_DIR, "fact.parquet")):
        _gen(args.rows)

    from pyspark.sql import functions as F

    from epl_cas_etl_2026_spark import get_spark
    from epl_cas_etl_2026_spark.sources.layout import salted_skew_join

    spark = get_spark(app_name="skew-bench",
                      cpus=os.environ.get("SPARK_GRAFT_CPUS", "16"))
    # dim must NOT broadcast anywhere — the salted join's target zone
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    fact = spark.read.parquet(os.path.join(SKEW_DIR, "fact.parquet"))
    dim = spark.read.parquet(os.path.join(SKEW_DIR, "dim.parquet"))

    def plain():
        return fact.join(dim, "key").agg(
            F.sum(F.col("v") * F.col("w")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )

    def salted():
        return salted_skew_join(fact, dim, "key", n_salts=16).agg(
            F.sum(F.col("v") * F.col("w")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )

    scenarios = {
        "plain": (plain, {"spark.sql.adaptive.enabled": "false"}),
        "aqe": (plain, {
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
        }),
        "salted": (salted, {"spark.sql.adaptive.enabled": "false"}),
    }

    # correctness first: all three must agree (n exactly; the float
    # dot-sum to relative 1e-9 — summation order differs by strategy)
    base = None
    for name, (fn, confs) in scenarios.items():
        for k, v in confs.items():
            spark.conf.set(k, v)
        row = fn().collect()[0]
        if base is None:
            base = row
        else:
            assert row["n"] == base["n"], (name, row["n"], base["n"])
            assert abs(row["s"] - base["s"]) <= abs(base["s"]) * 1e-9, name

    timings = {}
    for name, (fn, confs) in scenarios.items():
        for k, v in confs.items():
            spark.conf.set(k, v)
        best = None
        for _ in range(args.reps):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    hot = (
        fact.groupBy("key").count().orderBy(F.desc("count")).limit(1)
        .collect()[0]
    )
    # denominator from the ACTUAL data, not --rows: a pre-existing
    # fact.parquet generated with a different --rows is reused above,
    # and args.rows would then record a wrong (even > 1) share
    n_fact = fact.count()

    # ---- window-straggler case: the shape the join bench's conclusion
    # names as salting/rewrite territory, now measured. A window
    # partitioned on the hot key puts the key's ENTIRE row set in one
    # task — AQE cannot split a window partition, so the reactive path
    # that won the join bench is unavailable by construction. The
    # mitigation for unbounded-frame ALGEBRAIC window aggs is a
    # rewrite, not a salt: per-key totals via groupBy (map-side
    # partial aggregation is already skew-immune — each task emits ONE
    # partial per key) joined back to the fact, which turns the
    # straggler back into a plain skewed JOIN that AQE can split.
    from pyspark.sql import Window

    def naive_window():
        w = Window.partitionBy("key")
        return fact.select(
            "key", (F.col("v") / F.sum("v").over(w)).alias("share")
        ).agg(F.sum("share").alias("s"), F.count(F.lit(1)).alias("n"))

    def agg_join_rewrite():
        # per-key totals are |keys| rows (~3 MB here) — broadcast them
        # EXPLICITLY: AQE's conservative post-shuffle size estimate
        # keeps the SMJ otherwise (measured), and the whole point of
        # the rewrite is that the fact never shuffles
        totals = fact.groupBy("key").agg(F.sum("v").alias("t"))
        return (
            fact.join(F.broadcast(totals), "key")
            .select("key", (F.col("v") / F.col("t")).alias("share"))
            .agg(F.sum("share").alias("s"), F.count(F.lit(1)).alias("n"))
        )

    # the join bench disables broadcast (its 200k-row dim is the
    # salted-join target zone); for the REWRITE the per-key totals
    # frame is ~3 MB and broadcasting it is exactly what production
    # would do — restore the default threshold for these scenarios so
    # the rewrite is measured in its real shape (skew-immune partial
    # agg + broadcast map-side join: no shuffle of the fact at all)
    wscenarios = {
        "naive_window": (naive_window,
                         {"spark.sql.adaptive.enabled": "false"}),
        "agg_join_rewrite": (agg_join_rewrite, {
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.autoBroadcastJoinThreshold": "10485760",
        }),
    }
    wbase = None
    wtimings = {}
    for name, (fn, confs) in wscenarios.items():
        for k, v in confs.items():
            spark.conf.set(k, v)
        row = fn().collect()[0]
        if wbase is None:
            wbase = row
        else:
            assert row["n"] == wbase["n"], name
            # Σ share = #distinct keys; float fold order differs
            assert abs(row["s"] - wbase["s"]) <= abs(wbase["s"]) * 1e-9
        best = None
        for _ in range(args.reps):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        wtimings[name] = round(best, 3)

    out = {
        "metric": "skew_join_bench_sec",
        "rows": n_fact,
        "dim_rows": N_DIM,
        "hot_key_share": round(hot["count"] / n_fact, 4),
        "timings": timings,
        "salted_vs_plain": round(timings["salted"] / timings["plain"], 3),
        "aqe_vs_plain": round(timings["aqe"] / timings["plain"], 3),
        "window_skew": {
            "timings": wtimings,
            "rewrite_vs_naive": round(
                wtimings["agg_join_rewrite"] / wtimings["naive_window"], 3
            ),
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
