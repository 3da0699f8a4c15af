"""Vector (embedding) column functions — pure Catalyst expressions over
``array<float>`` columns; no Python in the hot path.

Used by the similarity-search and embedding near-dup operators. At 100 TB
these run inside whole-stage codegen on the JVM; the pandas/numpy variants
in operators/similarity.py exist only where top-k heap semantics genuinely
need them."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Elementwise dot product via zip_with + aggregate (JVM higher-order
    functions)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_c(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_c(a), _c(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def normalize_vec(a: Column | str) -> Column:
    """Unit-normalize so cosine reduces to dot at query time (do it once at
    ingest, not per comparison)."""
    n = norm(a)
    return F.transform(_c(a), lambda x: (x / n).cast("float"))
