"""Generate a deterministic local sf1 dataset (~10x sf0.1) for the
round-6 scale rehearsal (VERDICT r5 next-round item 4).

Schema-identical to the driver's testdata (TESTDATA.md); value
distributions are matched to what a profile of /root/testdata/sf0.1
shows (synthetic vocab / ranges / weights — generated fresh here, no
rows copied): 31-word document vocab, 5 langs at en=0.4, src{id%20}
sources, uniform 1..7 lines per order, 2dp uniform prices, exponential
event values over a 30-day event window, 10-cluster embeddings.

Output defaults to .localdata/sf1 (gitignored — rehearsal data never
enters the repo). The driver's own sf generators are unavailable, so
absolute near-dup pair volumes at sf1 are only comparable to THIS
generator's distribution, not to a hypothetical driver sf1; the
rehearsal's goals — cross-engine agreement at 10x scale and the
wall-time scaling curve — don't depend on that.

Usage: python tools/gen_sf1.py [outdir]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

N_CUST = 150_000
N_SUPP = 10_000
N_PART = 200_000
N_ORD = 1_500_000
N_EVT = 1_000_000
N_DOC = 50_000
N_EMB = 8_000

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.4, 0.15, 0.15, 0.15, 0.15]
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows")


def _days_ts(rng, n, start="1995-01-01", end="2001-08-01"):
    """Midnight timestamps uniform over [start, end] in whole days."""
    s = np.datetime64(start)
    d = int((np.datetime64(end) - s) / np.timedelta64(1, "D"))
    return (s + rng.integers(0, d + 1, n).astype("timedelta64[D]")).astype(
        "datetime64[us]"
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata",
        "sf1",
    )
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED)

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    k = np.arange(N_CUST)
    _write(out, "customer", pa.table({
        "c_custkey": k,
        "c_name": [f"Customer#{i:09d}" for i in k],
        "c_nationkey": rng.integers(0, 25, N_CUST).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, N_CUST)],
    }))

    k = np.arange(N_SUPP)
    _write(out, "supplier", pa.table({
        "s_suppkey": k,
        "s_name": [f"Supplier#{i:09d}" for i in k],
        "s_nationkey": rng.integers(0, 25, N_SUPP).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2),
    }))

    k = np.arange(N_PART)
    adj = np.array(ADJ)[rng.integers(0, len(ADJ), N_PART)]
    noun = np.array(NOUN)[rng.integers(0, len(NOUN), N_PART)]
    _write(out, "part", pa.table({
        "p_partkey": k,
        "p_name": np.char.add(np.char.add(adj, " "), noun),
        "p_brand": np.array(
            [f"Brand#{i}" for i in range(1, 26)]
        )[rng.integers(0, 25, N_PART)],
        "p_type": np.array(PTYPES)[rng.integers(0, 6, N_PART)],
        "p_size": rng.integers(1, 51, N_PART).astype(np.int32),
        "p_retailprice": np.round(rng.uniform(900, 2000, N_PART), 2),
    }))

    ok = np.arange(N_ORD)
    _write(out, "orders", pa.table({
        "o_orderkey": ok,
        "o_custkey": rng.integers(0, N_CUST, N_ORD),
        "o_orderstatus": np.array(["O", "F", "P"])[rng.integers(0, 3, N_ORD)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORD), 2),
        "o_orderdate": _days_ts(rng, N_ORD),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, N_ORD)],
    }))

    lines_per = rng.integers(1, 8, N_ORD)
    l_ok = np.repeat(ok, lines_per)
    n_li = len(l_ok)
    linenum = np.concatenate([np.arange(1, n + 1) for n in lines_per])
    _write(out, "lineitem", pa.table({
        "l_orderkey": l_ok,
        "l_partkey": rng.integers(0, N_PART, n_li),
        "l_suppkey": rng.integers(0, N_SUPP, n_li),
        "l_linenumber": linenum.astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.uniform(0.0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0.0, 0.08, n_li), 2),
        "l_returnflag": np.array(["N", "A", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
        "l_shipdate": _days_ts(rng, n_li, "1995-01-02", "2001-11-04"),
    }))

    # events: ~30-day window, monotone ts via exponential gaps
    gaps = rng.exponential(30 * 86400 / N_EVT, N_EVT)
    ts = (
        np.datetime64("2024-01-01")
        + (np.cumsum(gaps) * 1e6).astype("timedelta64[us]")
    )
    _write(out, "events", pa.table({
        "event_id": np.arange(N_EVT),
        "ts": ts.astype("datetime64[us]"),
        "user_id": rng.integers(0, 15000, N_EVT),
        "event_type": np.array(ETYPES)[rng.integers(0, 5, N_EVT)],
        "value": np.round(rng.exponential(50.0, N_EVT), 2),
        "props": [json.dumps({"k": int(x)}) for x in rng.integers(0, 100, N_EVT)],
    }))

    lens = rng.integers(10, 101, N_DOC)
    w = np.array(VOCAB)
    texts = [" ".join(w[rng.integers(0, len(w), n)]) for n in lens]
    _write(out, "documents", pa.table({
        "doc_id": np.arange(N_DOC),
        "text": texts,
        "lang": np.array(LANGS)[
            rng.choice(len(LANGS), N_DOC, p=LANG_W)
        ],
        "source": [f"src{i % 20}" for i in range(N_DOC)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    centers = rng.normal(0.0, 0.15, (10, 64))
    labels = rng.integers(0, 10, N_EMB)
    emb = (centers[labels] + rng.normal(0.0, 0.05, (N_EMB, 64))).astype(
        np.float32
    )
    _write(out, "embeddings", pa.table({
        "vec_id": np.arange(N_EMB),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": labels.astype(np.int32),
    }))
    print(f"sf1 written to {out}")


if __name__ == "__main__":
    main()
