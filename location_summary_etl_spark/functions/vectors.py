"""Vector (embedding) column expressions via Catalyst higher-order
functions -- dot product, norm, cosine run JVM-side inside whole-stage
codegen, no Python per row.

Summation is the sequential left fold of ``F.aggregate``, which matches
DuckDB's ``list_dot_product`` ordering, so cosine values agree across
engines to the last ulp on identical inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column,
           norm_a: Column | None = None,
           norm_b: Column | None = None) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    na = norm_a if norm_a is not None else l2_norm(a)
    nb = norm_b if norm_b is not None else l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb))
