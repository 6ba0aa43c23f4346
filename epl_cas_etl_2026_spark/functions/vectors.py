"""Vector math over ``array<float>`` embedding columns as pure Column
expressions (``zip_with`` / ``aggregate`` — JVM-side, no UDF).

Everything is computed in DOUBLE with a fixed left-to-right summation
order (``F.aggregate`` folds sequentially), so results are bit-stable
and reproducible against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ — sequential fold, deterministic order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
