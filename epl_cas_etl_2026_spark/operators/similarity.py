"""Similarity search over embedding columns (BASELINE.json north star).

* ``cosine_topk`` — brute-force top-k against one query vector. The
  scan is embarrassingly parallel (one pass, no shuffle except the
  final top-k, which Spark plans as TakeOrderedAndProject — per-
  partition heaps + driver merge of k rows). This IS the correct
  100 TB baseline for a single query.
* ``lsh_bucket_assign`` / ``ann_topk_lsh`` — random-hyperplane LSH:
  each vector gets a sign-bit bucket key; a query probes only its own
  bucket (and optionally neighboring buckets), cutting the candidate
  set by ~2^n_planes. Hyperplanes are generated from a seeded RNG so
  assignment is deterministic and re-computable on read — the scale
  path when queries are many.

All vector math is ``zip_with``/``aggregate`` expressions (JVM,
codegen) — no UDF in the hot path.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from epl_cas_etl_2026_spark.functions.vectors import cosine, dot, to_double


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: tuple[int, ...] = (),
) -> DataFrame:
    """Brute-force cosine top-k: one scan + TakeOrderedAndProject."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    out = embeddings.select(
        F.col(id_col),
        F.round(cosine(to_double(F.col(vec_col)), q), 6).alias("sim"),
    )
    if exclude_ids:
        out = out.filter(~F.col(id_col).isin(*exclude_ids))
    return out.orderBy(F.desc("sim"), F.asc(id_col)).limit(k)


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH."""
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket_assign(
    embeddings: DataFrame,
    planes: list[list[float]],
    vec_col: str = "embedding",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Sign-bit bucket key: bit i = sign(v · plane_i). Pure expression;
    at scale, write bucketed/partitioned by this key so probes prune."""
    v = to_double(F.col(vec_col))
    key = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        pc = F.array(*[F.lit(float(x)) for x in p])
        key = key + F.when(
            dot(v, pc) >= 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return embeddings.withColumn(bucket_col, key)


def ann_topk_lsh(
    embeddings: DataFrame,
    query_vec: list[float],
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket, then exact
    cosine inside it. Recall < 1.0 by design; candidate set shrinks
    ~2^n_planes-fold."""
    qkey = 0
    for i, p in enumerate(planes):
        s = sum(a * b for a, b in zip(query_vec, p))
        if s >= 0:
            qkey |= 1 << i
    bucketed = lsh_bucket_assign(embeddings, planes, vec_col)
    return cosine_topk(
        bucketed.filter(F.col("bucket") == qkey), query_vec, k, id_col, vec_col
    )
