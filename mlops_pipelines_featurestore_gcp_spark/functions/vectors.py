"""Vector math over ``array<float/double>`` columns — pure JVM expressions.

Used by the similarity-search operators; no MLlib ``Vector`` boxing, no
Python UDFs. All folds are left-to-right over the array, so results are
bit-deterministic and reproducible by any engine that evaluates the same
expression order (the DuckDB oracle mirrors the same formula).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ (arrays cast to double first)."""
    return _fold_sum(F.zip_with(a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y))


def norm_sq(a: Column) -> Column:
    """Σ aᵢ² as double."""
    ad = a.cast("array<double>")
    return _fold_sum(F.zip_with(ad, ad, lambda x, y: x * y))


def cosine(a: Column, b: Column) -> Column:
    """dot(a,b) / sqrt(‖a‖²·‖b‖²) — one combined sqrt, matching the oracle
    formula exactly."""
    return dot(a, b) / F.sqrt(norm_sq(a) * norm_sq(b))
