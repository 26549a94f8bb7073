"""Unigram language-model scoring — the CCNet-style perplexity quality
signal, self-trained on the corpus being scored.

CCNet (Wenzek et al. 2019) buckets Common Crawl by KenLM perplexity; the
engine-native equivalent trains the LM the engine can train exactly — an
add-1-smoothed unigram model over the corpus token stream — and scores
every document by average log-probability / perplexity. Low-probability
docs (gibberish, boilerplate soup, wrong-language fragments) surface at the
high-perplexity tail, exactly how the published pipeline uses the signal.

Determinism across engines is built in, not hoped for:

- model probabilities derive from exact integer counts;
- each token's log-prob is FLOOR-quantized to integer micro-nats
  (``floor(ln(p)·10⁶ + 0.5)``) BEFORE the per-document sum, so the
  aggregate is exact 64-bit integer addition — immune to float summation
  order, the thing partial aggregation reorders freely at scale;
- only the final per-doc averages/exp are floats, computed from exact
  integers by identical single expressions.

Plan shape: token explode (map-side) → vocab aggregate (one shuffle) →
token⋈vocab equi join (token-keyed; AQE broadcasts when the vocab is
small) → per-doc integer-sum aggregate. No Python, no windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.functions.canonical import round6
from mlops_pipelines_featurestore_gcp_spark.operators.dedup import gram_rows


def unigram_lm_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document unigram LM statistics.

    Returns (id, n_tokens, logp_micro_sum, avg_logp, perplexity): the exact
    integer micro-nat sum plus the derived floats. Documents with no tokens
    are absent (they have no probability under any LM).
    """
    tok = gram_rows(df, id_col, text_col, 1).withColumnRenamed("gram", "token")
    vocab = tok.groupBy("token").agg(F.count("*").alias("tf"))
    stats = vocab.agg(
        F.sum("tf").alias("total"), F.count("*").alias("v")
    )
    scored = (
        tok.join(vocab, "token")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.floor(
                F.log((F.col("tf") + F.lit(1.0)) / (F.col("total") + F.col("v")))
                * F.lit(1_000_000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("lp_micro"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum("lp_micro").alias("logp_micro_sum"),
    )
    avg = F.col("logp_micro_sum") / F.lit(1_000_000.0) / F.col("n_tokens")
    return agg.select(
        F.col(id_col),
        "n_tokens",
        "logp_micro_sum",
        round6(avg).alias("avg_logp"),
        round6(F.exp(-avg)).alias("perplexity"),
    )
