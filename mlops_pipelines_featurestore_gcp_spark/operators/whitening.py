"""PCA rotation / whitening for embedding columns — the OPQ preprocessing
step (Ge et al. 2013, "Optimized Product Quantization"; Jégou 2011 §V.C
notes PQ's sensitivity to coordinate energy balance).

Product quantizers split vectors into contiguous sub-blocks, so their
accuracy depends on variance being spread across coordinates; raw
embedding dimensions are usually energy-skewed. Rotating into the PCA
basis (optionally scaling to unit variance — true whitening) before
`build_pq_codebooks` / `build_ivfpq_index` is the standard fix, and at
100 TB it must not cost more than one aggregation pass.

Scale architecture:

- **fit** is ONE explode + hash aggregate: each vector emits its 64
  first-moment terms and the 2080 upper-triangle second-moment products
  (j ≤ k); map-side combine collapses every partition to ≤ 2145 partial
  rows, so the shuffle is constant-width no matter the corpus. Sums
  accumulate in DECIMAL(38,18) (the house rule for distributively-summed
  doubles — bit-deterministic across partitionings and runs), and the
  64×64 eigendecomposition runs driver-side on the collected gram
  (report-sized: 2080 rows). Eigenvector signs are canonicalized (the
  largest-|component| entry made positive), so the fitted rotation is a
  pure deterministic function of the corpus.
- **apply** is map-side: the (mean, rotation) ride a one-row broadcast
  (the f06 stat-table pattern), projection is a runtime HOF fold per
  output dimension (64×64 multiply-adds per row — the d05 scoring cost
  class), never an unrolled Catalyst expression.

Reference analogue: none (the reference delegates vector work to Vertex
Matching Engine, SURVEY §0); engine-native feature.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fit_whitening(
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int,
    whiten: bool = False,
    eps: float = 1e-6,
) -> tuple[list[float], list[list[float]], list[float]]:
    """Fit a PCA rotation (``whiten=True`` additionally scales each
    component by 1/√(λ+eps)) over ``corpus[vec_col]``.

    Returns ``(mean, rotation, eigenvalues)`` where ``rotation[k]`` is
    the k-th principal COLUMN vector (components sorted by eigenvalue
    descending) — ``y_k = (v - mean) · rotation[k]``.
    """
    import numpy as np

    v = F.col(vec_col).cast("array<double>")
    # one explode per vector: 64 first-moment + 2080 second-moment terms,
    # tagged (j, k) with k = -1 for the mean terms; map-side combine makes
    # the shuffle constant-width
    terms = corpus.select(
        F.explode(
            F.concat(
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda j: F.struct(
                        j.alias("j"),
                        F.lit(-1).alias("k"),
                        F.element_at(v, j + 1).alias("x"),
                    ),
                ),
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(dim - 1)),
                        lambda j: F.transform(
                            F.sequence(j, F.lit(dim - 1)),
                            lambda k: F.struct(
                                j.alias("j"),
                                k.alias("k"),
                                (F.element_at(v, j + 1) * F.element_at(v, k + 1)).alias("x"),
                            ),
                        ),
                    )
                ),
            )
        ).alias("t")
    ).select("t.j", "t.k", "t.x")
    agg = (
        terms.groupBy("j", "k")
        .agg(
            F.sum(F.col("x").cast("decimal(38,18)")).cast("double").alias("s"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    if not agg:
        raise ValueError("fit_whitening: empty corpus — nothing to fit")
    n = agg[0]["n"]
    mean = np.zeros(dim)
    m2 = np.zeros((dim, dim))
    for r in agg:
        if r["k"] == -1:
            mean[r["j"]] = r["s"] / n
        else:
            m2[r["j"], r["k"]] = r["s"] / n
            m2[r["k"], r["j"]] = r["s"] / n
    cov = m2 - np.outer(mean, mean)
    w, vecs = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(w)[::-1]
    w, vecs = w[order], vecs[:, order]
    # canonical signs: deterministic rotation regardless of LAPACK's
    # per-eigenvector sign freedom
    for k in range(dim):
        i = int(np.argmax(np.abs(vecs[:, k])))
        if vecs[i, k] < 0:
            vecs[:, k] = -vecs[:, k]
    if whiten:
        vecs = vecs / np.sqrt(np.maximum(w, 0.0) + eps)
    rotation = [[float(x) for x in vecs[:, k]] for k in range(dim)]
    return [float(x) for x in mean], rotation, [float(x) for x in w]


def _project(centered: Column, rotation: Column) -> Column:
    """``y_k = centered · rotation[k]`` — runtime HOF folds (left-to-right,
    the same accumulation the similarity operators use)."""
    return F.transform(
        rotation,
        lambda col: F.aggregate(
            F.zip_with(centered, col, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
        ),
    )


def apply_whitening(
    df: DataFrame,
    mean: list[float],
    rotation: list[list[float]],
    *,
    vec_col: str = "embedding",
    out_col: str = "whitened",
) -> DataFrame:
    """Map-side projection: ``out_col[k] = (vec - mean) · rotation[k]``.

    The (mean, rotation) table is ONE row (~dim² doubles), broadcast-
    crossed into the frame — the f06 stat-table pattern, whitelisted as a
    by-design broadcast cartesian in the plan audit.
    """
    spark = df.sparkSession
    params = spark.createDataFrame(
        [(mean, rotation)], "__mu array<double>, __w array<array<double>>"
    )
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"), F.col("__mu"), lambda a, b: a - b
    )
    return (
        df.crossJoin(F.broadcast(params))
        .withColumn(out_col, _project(centered, F.col("__w")))
        .drop("__mu", "__w")
    )
