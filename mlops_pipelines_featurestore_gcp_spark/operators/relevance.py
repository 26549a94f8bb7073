"""Corpus relevance scoring: TF-IDF vectors and BM25 ranking.

The training-data companion to the dedup/quality family: TF-IDF feeds
classifier-based quality filters (the CCNet/fastText-style pipeline) and
importance sampling; BM25 is the standard retrieval scorer for picking
in-domain documents against a seed query (DSIR-style data selection uses
exactly these statistics).

Distributed shape (both operators):

1. tokenize + explode — map-only codegen pass;
2. one ``(doc, term)`` groupBy with map-side combine — term frequencies;
3. corpus statistics (N docs, avg doc length, per-term document
   frequency) — for BM25 the query vocabulary bounds the df table at
   |query| rows, so it BROADCASTS; for TF-IDF the df table is
   vocabulary-sized and joins on the term key (one shuffle);
4. per-(doc, term) contributions fold in codegen, one final per-doc sum.

Nothing driver-side, no UDFs, cost ∝ corpus tokens + |vocab|.

Cross-engine determinism follows t11's integer micro-nat contract: each
per-(doc, term) contribution is quantized to micro units (``floor(x·10⁶
+ 0.5)`` — on identical IEEE inputs both engines produce the identical
double, and ``ln`` parity is the same bet t11/f06 already win) and summed
as LONGS, so any partitioning and any engine yields bit-equal totals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.functions.text import normalize, tokens

MICRO = 1_000_000.0


def _micro(col):
    return F.floor(col * F.lit(MICRO) + F.lit(0.5)).cast("long")


def doc_terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf) term frequencies — the shared first pass."""
    toks = tokens(normalize(F.col(text_col)))
    return (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def tf_idf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-(doc, term) TF-IDF: ``tf · ln(N / df)`` with smooth idf
    ``ln((1 + N) / (1 + df)) + 1`` (the scikit-learn convention — never
    negative, defined for df = N).

    Output: (id, term, tf, df_docs, tfidf_micro) — the score is a
    micro-quantized long (divide by 10⁶ for the float value), so the whole
    table is hash-comparable across engines.
    """
    dt = doc_terms(df, id_col, text_col)
    n_docs = df.select(F.col(id_col)).distinct().count()
    dfreq = dt.groupBy("term").agg(F.count("*").alias("df_docs"))
    idf = F.log((1.0 + float(n_docs)) / (1.0 + F.col("df_docs"))) + F.lit(1.0)
    return (
        dt.join(dfreq, "term")
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df_docs",
            _micro(F.col("tf") * idf).alias("tfidf_micro"),
        )
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score of every document against ``query_terms``.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
    with the Robertson/Lucene idf ``ln(1 + (N − df + 0.5)/(df + 0.5))``.

    The per-term contribution is micro-quantized BEFORE the per-doc sum
    (integer addition → order-proof, oracle-replayable). Documents
    matching no query term score 0 and are kept — downstream selection
    needs the full ranking, and dropping them would hide the join's outer
    semantics. Corpus stats and the |query|-row df table broadcast; the
    only shuffles are the two keyed aggregates.

    Output: (id, n_tokens, n_matched, score_micro).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = tokens(normalize(F.col(text_col)))
    tok_rows = df.select(F.col(id_col), F.explode(toks).alias("term"))

    # per-doc length — includes docs with zero query matches
    dl = df.select(
        F.col(id_col), F.size(toks).cast("long").alias("n_tokens")
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("n_tokens").alias("avgdl")
    ).first()
    n_docs, avgdl = stats["n_docs"], float(stats["avgdl"] or 0.0) or 1.0

    q = [t for t in dict.fromkeys(query_terms)]  # dedup, keep order
    matched = tok_rows.where(F.col("term").isin(q))
    tf = matched.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_docs"))

    idf = F.log(
        1.0
        + (float(n_docs) - F.col("df_docs") + 0.5) / (F.col("df_docs") + 0.5)
    )
    # dfreq is |query|-row → broadcast; dl is corpus-sized → keyed join
    contrib = tf.join(F.broadcast(dfreq), "term").join(dl, id_col)
    sat = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("n_tokens") / F.lit(avgdl))
    )
    per_term = contrib.select(
        F.col(id_col), _micro(idf * sat).alias("c_micro")
    )
    scored = per_term.groupBy(id_col).agg(
        F.sum("c_micro").alias("score_micro"), F.count("*").alias("n_matched")
    )
    return (
        dl.join(scored, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            F.coalesce("n_matched", F.lit(0)).cast("long").alias("n_matched"),
            F.coalesce("score_micro", F.lit(0)).cast("long").alias("score_micro"),
        )
    )
