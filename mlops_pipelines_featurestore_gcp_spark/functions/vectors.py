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


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Σ aᵢ·bᵢ (elements cast to double first).

    With ``dim`` given, the sum is an explicit left-associated term chain
    (a₁b₁ + a₂b₂ + …) of ``element_at`` expressions — plain arithmetic that
    stays inside WHOLE-STAGE CODEGEN. Without it, a higher-order
    ``aggregate``/``zip_with`` fold — same values, but Spark HOFs are
    CodegenFallback and run ~10× slower per row (profiled on the d05/s01
    scoring passes). Both orders are left-to-right, so either form matches
    the DuckDB ``list_sum(list_transform(...))`` twin bit for bit.
    """
    if dim is not None:
        terms = [
            F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
            for i in range(1, dim + 1)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out
    return _fold_sum(F.zip_with(a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y))


def norm_sq(a: Column, dim: int | None = None) -> Column:
    """Σ aᵢ² as double."""
    if dim is not None:
        return dot(a, a, dim)
    ad = a.cast("array<double>")
    return _fold_sum(F.zip_with(ad, ad, lambda x, y: x * y))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    """dot(a,b) / sqrt(‖a‖²·‖b‖²) — one combined sqrt, matching the oracle
    formula exactly. Pass ``dim`` to stay in codegen (see :func:`dot`)."""
    return dot(a, b, dim) / F.sqrt(norm_sq(a, dim) * norm_sq(b, dim))
