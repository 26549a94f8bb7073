"""Feature-hashed document embeddings: deterministic text → vector, fully
engine-side.

The similarity/dedup family (``operators/similarity.py``) consumes an
embedding column; this operator PRODUCES one from raw text with the
hashing trick (Weinberger et al. 2009 — "feature hashing"): each token is
hashed to one of ``dim`` buckets with a ±1 sign hash, bucket sums form the
vector, and L2 normalization makes cosine comparisons meaningful. No model
weights, no Python on the data path — the classic cheap-but-useful
lexical embedding, and the end of the text → vector → ANN/near-dup loop
inside one engine.

Plan shape (the simhash/minhash signature pattern):
  1. explode tokens → one md5 bucket hash + one md5 sign hash per token —
     narrow, codegen; both hashes are projected ONCE per row before
     aggregation so the ``dim`` conditional sums below see plain columns.
  2. groupBy(id): ``dim`` conditional integer sums in ONE partial-combined
     aggregate → one row per doc crosses the exchange.
  3. row-local normalization (integer sums → exact doubles → IEEE divide).

Determinism: bucket and sign come from md5 of the salted token, so any
engine (or a numpy reference — see tests) reproduces the exact vector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.functions.text import md5_long, normalize, tokens
from mlops_pipelines_featurestore_gcp_spark.operators.dedup import _spread


def hashed_embedding(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    dim: int = 64,
    salt: str = "emb",
) -> DataFrame:
    """Per-document L2-normalized feature-hashed embedding →
    ``(id, embedding array<double>, n_tokens)``.

    Token multiplicity counts (a token appearing twice contributes ±2 to
    its bucket). Documents with zero tokens produce no row — there is no
    meaningful direction for an empty document. A document whose bucket
    sums all cancel to the zero vector keeps its row with an all-zero
    embedding (norm guard, no NaNs).
    """
    tok = F.explode(tokens(normalize(F.col(text_col)))).alias("__tok")
    hashed = _spread(df).select(F.col(id_col), tok).select(
        F.col(id_col),
        (md5_long(F.concat(F.lit(f"{salt}|b|"), F.col("__tok"))) % dim).alias("__b"),
        F.when(
            md5_long(F.concat(F.lit(f"{salt}|s|"), F.col("__tok"))) % 2 == 0, F.lit(1)
        ).otherwise(F.lit(-1)).alias("__s"),
    )
    sums = hashed.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        *[
            F.sum(F.when(F.col("__b") == i, F.col("__s")).otherwise(0)).alias(f"__e{i}")
            for i in range(dim)
        ],
    )
    # r13 optimization: the normalization used to be ``dim`` scalar
    # ``when(norm > 0, e_i / norm)`` expressions where ``norm`` was itself
    # a ``dim``-term chain — fused into the hash aggregate's generated
    # output method that exceeded janino's 64 KB method limit, so the
    # WHOLE stage (per-token hashing included) silently fell back to
    # interpreted execution ("CodeGenerator: ... Code grows beyond
    # 64 KB" on every ml07/c03/t07 run). Building the array<long> first
    # keeps the generated method small (``dim`` plain loads), and the
    # norm/unit folds are HOFs evaluated ONCE PER DOCUMENT (not per
    # token — the cheap side of the repo's HOF rule). Values are
    # bit-identical PROVIDED the running sum of squares stays exact in
    # double (ADVICE r13): the old form summed e_i² in pure long
    # arithmetic, the fold accumulates in double, so identity needs
    # Σe_i² ≤ 2⁵³ — with |e_i| ≤ n_tokens that holds up to ~12M tokens
    # per document at dim 64 (any realistic document; a corpus past it
    # should chunk first anyway).
    arr = F.array(*[F.col(f"__e{i}") for i in range(dim)])
    staged = sums.select(
        F.col(id_col), F.col("n_tokens"), arr.alias("__arr")
    ).withColumn(
        "__norm",
        F.sqrt(F.aggregate(F.col("__arr"), F.lit(0.0), lambda acc, x: acc + x * x)),
    )
    unit = F.transform(
        F.col("__arr"),
        lambda x: F.when(F.col("__norm") > 0, x / F.col("__norm")).otherwise(F.lit(0.0)),
    )
    return staged.select(F.col(id_col), unit.alias("embedding"), F.col("n_tokens").cast("long"))
