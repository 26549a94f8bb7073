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
   this is the one full pass, and it amortizes for real via the
   bm25_fit → BM25Stats → bm25_rerank(stats=...) split (the
   pq_train/pq_topk pattern): fit once, persist dfreq/doc_lengths,
   and every later query batch is shortlist/vocab-proportional.
   The inline no-stats path remains the one-off convenience shape;
   stats go stale if the corpus changes — refit with it.
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

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.functions.text import normalize, tokens

MICRO = 1_000_000.0


def _micro(col):
    return F.floor(col * F.lit(MICRO) + F.lit(0.5)).cast("long")


@dataclass(frozen=True)
class BM25Stats:
    """Fitted corpus statistics for :func:`bm25_rerank` — the
    pq_train/pq_topk split applied to lexical scoring (ADVICE r11):
    build once over the corpus, search many query batches.

    ``dfreq`` is (term, __df) — document frequency over the FULL corpus
    vocabulary (or the ``vocab``-restricted slice the fit was given);
    ``doc_lengths`` is (__did, __dlen). Both are plain DataFrames the
    caller should persist (``localCheckpoint()`` / a scratch write) when
    amortizing across calls — the fit itself stays lazy about them and
    only materializes the two scalar aggregates. The object goes stale
    if the corpus changes; refit with the corpus, exactly like a PQ
    codebook.
    """

    n_docs: int
    avgdl: float
    dfreq: DataFrame
    doc_lengths: DataFrame


def bm25_fit(
    docs: DataFrame,
    *,
    doc_id_col: str = "doc_id",
    doc_text_col: str = "text",
    vocab: DataFrame | None = None,
) -> BM25Stats:
    """One corpus pass → :class:`BM25Stats` (the amortizable step).

    Computes n_docs / avgdl eagerly (two scalars, one aggregate job) and
    builds the document-frequency and doc-length tables lazily. With
    ``vocab`` (a single-column ``term`` DataFrame) the df pass counts
    only those terms — the bounded shape when the query workload's
    vocabulary is known up front; without it the df table covers the
    full corpus vocabulary (the classic inverted-index df pass — one
    explode + distinct + count, term-keyed), and :func:`bm25_rerank`
    prunes it to each call's query vocabulary before broadcasting.
    """
    d = docs.select(
        F.col(doc_id_col).alias("__did"), F.col(doc_text_col).alias("__dtext")
    )
    dtoks = tokens(normalize(F.col("__dtext")))
    dl = d.select("__did", F.size(dtoks).cast("long").alias("__dlen"))
    row = dl.agg(F.count("*").alias("n"), F.avg("__dlen").alias("avgdl")).first()
    n_docs, avgdl = row["n"], float(row["avgdl"] or 0.0) or 1.0
    terms = d.select("__did", F.explode(dtoks).alias("term"))
    if vocab is not None:
        terms = terms.join(F.broadcast(vocab.select("term").distinct()), "term")
    dfreq = terms.distinct().groupBy("term").agg(F.count("*").alias("__df"))
    return BM25Stats(n_docs=n_docs, avgdl=avgdl, dfreq=dfreq, doc_lengths=dl)


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
    stats: BM25Stats | None = None,
) -> DataFrame:
    """BM25-score every (query, candidate) pair of ``shortlist`` and
    re-rank within each query.

    ``shortlist``: (query_id, neighbor_id) pairs from any recall tier
    (extra columns pass through). ``queries``: (query_id, text).
    ``docs``: (doc_id, text) — the corpus; only shortlisted docs are
    term-expanded for scoring, but idf statistics come from the FULL
    corpus (a shortlist-local idf would re-weight per query batch).

    ``stats``: a fitted :class:`BM25Stats` from :func:`bm25_fit` — the
    build-once/search-many path. Without it the fit runs inline (two
    eager corpus jobs at call time, the original convenience shape);
    with it the call is entirely shortlist/vocab-proportional: the
    persisted df table is pruned to this call's query vocabulary with a
    broadcast semi-join and the corpus is touched only for the
    shortlisted docs' term frequencies.

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

    # --- corpus statistics (the one full pass; amortized via `stats`) -----
    if stats is None:
        stats = bm25_fit(
            docs,
            doc_id_col=doc_id_col if doc_id_col in docs.columns else "doc_id",
            doc_text_col=doc_text_col,
            vocab=q.select(F.explode(qtoks).alias("term")).distinct(),
        )
    n_docs, avgdl, dl = stats.n_docs, stats.avgdl, stats.doc_lengths

    # prune the df table to THIS call's query vocabulary before the
    # broadcast — a full-vocab fitted table is corpus-vocabulary-sized
    # and must not ship to every executor wholesale
    qvocab = q.select(F.explode(qtoks).alias("term")).distinct()
    dfreq = stats.dfreq.join(F.broadcast(qvocab), "term")

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


def rrf_fuse(
    ranked: list[DataFrame],
    *,
    query_id_col: str = "query_id",
    id_col: str = "neighbor_id",
    rank_col: str = "rnk",
    k0: int = 60,
    k: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) —
    the standard score-free way to combine rankings from heterogeneous
    retrievers (vector recall, BM25, a future cross-encoder):

        rrf(d) = Σ_lists 1 / (k0 + rank_list(d))

    ``ranked``: one frame per retriever, each with (query, id, rank)
    columns — ``rank_col`` may differ per frame by passing a list of
    (frame, rank_col) tuples instead. A candidate absent from a list
    simply contributes nothing (the union shape — no outer-join chain).

    Distributed shape: each input projects to a per-candidate integer
    micro-contribution ``floor(1e6/(k0+rank)+0.5)`` map-side, the union
    groupBy-sums on (query, id) — ONE shuffle regardless of list count,
    map-side combining, candidate-set-proportional. Integer micro sums
    make the fusion order-proof and oracle-replayable (the t11/t13
    contract); ties break on the smaller id like every top-k here.

    Output: (query, id, rrf_micro, n_lists, frnk); ``k`` keeps the
    fused top-k per query.
    """
    parts = []
    for i, item in enumerate(ranked):
        df, rcol = item if isinstance(item, tuple) else (item, rank_col)
        parts.append(
            df.select(
                F.col(query_id_col).alias("__qid"),
                F.col(id_col).alias("__did"),
                _micro(F.lit(1.0) / (F.lit(float(k0)) + F.col(rcol))).alias("__c"),
            )
        )
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)
    fused = allc.groupBy("__qid", "__did").agg(
        F.sum("__c").alias("rrf_micro"), F.count("*").alias("n_lists")
    )
    w = Window.partitionBy("__qid").orderBy(
        F.col("rrf_micro").desc(), F.col("__did").asc()
    )
    out = (
        fused.withColumn("frnk", F.row_number().over(w))
        .withColumnRenamed("__qid", query_id_col)
        .withColumnRenamed("__did", id_col)
    )
    return out.where(F.col("frnk") <= k) if k is not None else out
