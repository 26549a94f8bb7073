"""Lexical rerank tier over an ANN shortlist (hybrid retrieval).

The production RAG pattern: a vector tier RECALLS a small candidate set
per query (c03's chunk → embed → ANN path), then a lexical scorer
re-orders those candidates by actual term overlap — embedding recall +
BM25 precision, the standard "hybrid search" composition (the same
shape rerankers occupy; a learned cross-encoder would slot in behind
the identical pair-scoring interface, but BM25 is real and
deterministic with zero model dependencies).

Distributed shape (everything shortlist-proportional after one
corpus-stats pass):

1. corpus stats — N docs, avg doc length (one aggregate) and the
   document frequency of QUERY-VOCAB terms only (explode docs → terms,
   broadcast-semi-join against the query vocabulary, one groupBy): the
   df table is bounded by |query vocab| rows and broadcasts. At 100 TB
   this is the one full pass, and it is amortizable — persist the df
   table and refresh with the corpus.
2. per-pair scoring — shortlist pairs join doc term-frequencies on the
   doc key and query terms on the (query, term) key; per-term BM25
   contributions micro-quantized to integer units BEFORE the per-pair
   sum (the t13/t11 order-proof contract), one (query, doc) groupBy.
   Every join key is shortlist- or vocab-bounded; nothing corpus-sized
   shuffles after step 1.

Determinism: integer micro sums, ties broken by neighbor id — the same
total-order discipline as every top-k in this engine.

Reference tie-in: the reference's retrieval surface is the feature
store's entity lookup (`feature_store_helper.py` read paths); ranked
text retrieval is part of the engine-native extension family (SURVEY
§2 north star), composing with c03.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.functions.text import normalize, tokens

MICRO = 1_000_000.0


def _micro(col):
    return F.floor(col * F.lit(MICRO) + F.lit(0.5)).cast("long")


def bm25_rerank(
    shortlist: DataFrame,
    queries: DataFrame,
    docs: DataFrame,
    *,
    query_id_col: str = "query_id",
    doc_id_col: str = "neighbor_id",
    query_text_col: str = "text",
    doc_text_col: str = "text",
    k: int | None = None,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25-score every (query, candidate) pair of ``shortlist`` and
    re-rank within each query.

    ``shortlist``: (query_id, neighbor_id) pairs from any recall tier
    (extra columns pass through). ``queries``: (query_id, text).
    ``docs``: (doc_id, text) — the corpus; only shortlisted docs are
    term-expanded for scoring, but idf statistics come from the FULL
    corpus (a shortlist-local idf would re-weight per query batch).

    Output: shortlist columns + ``bm25_micro`` (integer micro-units,
    0 for no term overlap) + ``rrnk`` (1 = best; ties to the smaller
    neighbor id). ``k`` keeps only the top-k reranked rows per query.
    """
    pairs = shortlist.select(
        F.col(query_id_col).alias("__qid"), F.col(doc_id_col).alias("__did")
    )
    d = docs.select(F.col(doc_id_col if doc_id_col in docs.columns else "doc_id").alias("__did"),
                    F.col(doc_text_col).alias("__dtext"))
    q = queries.select(F.col(query_id_col if query_id_col in queries.columns else "query_id").alias("__qid"),
                       F.col(query_text_col).alias("__qtext"))

    dtoks = tokens(normalize(F.col("__dtext")))
    qtoks = tokens(normalize(F.col("__qtext")))

    # --- corpus statistics (the one full pass; amortizable) ---------------
    dl = d.select("__did", F.size(dtoks).cast("long").alias("__dlen"))
    stats = dl.agg(F.count("*").alias("n"), F.avg("__dlen").alias("avgdl")).first()
    n_docs, avgdl = stats["n"], float(stats["avgdl"] or 0.0) or 1.0

    # distinct query-vocabulary terms (small: queries are the broadcast side)
    qvocab = q.select(F.explode(qtoks).alias("term")).distinct()
    dfreq = (
        d.select("__did", F.explode(dtoks).alias("term"))
        .join(F.broadcast(qvocab), "term")
        .distinct()  # document frequency counts each (doc, term) once
        .groupBy("term")
        .agg(F.count("*").alias("__df"))
    )

    # --- shortlist-proportional scoring -----------------------------------
    # term frequencies for SHORTLISTED docs only (semi-join prune)
    sdocs = d.join(pairs.select("__did").distinct(), "__did")
    dtf = (
        sdocs.select("__did", F.explode(dtoks).alias("term"))
        .groupBy("__did", "term")
        .agg(F.count("*").alias("__tf"))
    )
    qterms = q.select("__qid", F.explode(qtoks).alias("term")).distinct()

    idf = F.log(1.0 + (float(n_docs) - F.col("__df") + 0.5) / (F.col("__df") + 0.5))
    sat = (F.col("__tf") * (k1 + 1.0)) / (
        F.col("__tf") + k1 * (1.0 - b + b * F.col("__dlen") / F.lit(avgdl))
    )
    per_term = (
        pairs.join(dtf, "__did")  # (q, d, term, tf) — shortlist × doc terms
        .join(qterms, ["__qid", "term"])  # keep terms the query contains
        .join(F.broadcast(dfreq), "term")
        .join(dl, "__did")
        .select("__qid", "__did", _micro(idf * sat).alias("__c"))
    )
    scored = per_term.groupBy("__qid", "__did").agg(F.sum("__c").alias("bm25_micro"))
    out = (
        shortlist.join(
            scored,
            (F.col(query_id_col) == F.col("__qid")) & (F.col(doc_id_col) == F.col("__did")),
            "left",
        )
        .drop("__qid", "__did")
        .withColumn("bm25_micro", F.coalesce("bm25_micro", F.lit(0)).cast("long"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("bm25_micro").desc(), F.col(doc_id_col).asc()
    )
    out = out.withColumn("rrnk", F.row_number().over(w))
    return out.where(F.col("rrnk") <= k) if k is not None else out
