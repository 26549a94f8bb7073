"""BM25 rerank over an ANN shortlist (operators/rerank.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.operators import rerank

DOCS = [
    (0, "spark shuffles data between stages"),
    (1, "the cat sat on the mat"),
    (2, "spark partitions shuffle data data data"),
    (3, "a completely unrelated sentence about gardening"),
    (4, "data data everywhere and not a byte to keep"),
]
QUERIES = [(100, "spark shuffle data"), (101, "gardening cat")]
SHORTLIST = [  # every query paired with every doc: rerank gets full say
    (q, d) for q, _ in QUERIES for d, _ in DOCS
]


def _tok(s):
    return s.lower().split()


def _py_bm25(qtext, dtext, docs, k1=1.2, b=0.75):
    """Pure-Python replica of the operator's math, micro-quantized."""
    n = len(docs)
    lens = {i: len(_tok(t)) for i, t in docs}
    avgdl = sum(lens.values()) / n
    dfreq = {}
    for term in set(_tok(qtext)):
        dfreq[term] = sum(1 for _, t in docs if term in _tok(t))
    total = 0
    dtoks = _tok(dtext)
    for term in set(_tok(qtext)):
        tf = dtoks.count(term)
        if tf == 0 or dfreq[term] == 0:
            continue
        idf = math.log(1.0 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
        sat = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(dtoks) / avgdl))
        total += math.floor(idf * sat * 1e6 + 0.5)
    return total


def _frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, text string")
    sl = spark.createDataFrame(SHORTLIST, "query_id long, neighbor_id long")
    return docs, qs, sl


def test_bm25_rerank_matches_pure_python(spark):
    docs, qs, sl = _frames(spark)
    out = rerank.bm25_rerank(sl, qs, docs).collect()
    got = {(r.query_id, r.neighbor_id): r.bm25_micro for r in out}
    dmap, qmap = dict(DOCS), dict(QUERIES)
    for (qid, did), score in got.items():
        assert score == _py_bm25(qmap[qid], dmap[did], DOCS), (qid, did)
    assert len(got) == len(SHORTLIST)  # zero-overlap pairs kept at 0


def test_bm25_rerank_orders_lexical_relevance(spark):
    docs, qs, sl = _frames(spark)
    out = rerank.bm25_rerank(sl, qs, docs, k=2).collect()
    top = {r.query_id: [] for r in out}
    for r in sorted(out, key=lambda r: (r.query_id, r.rrnk)):
        top[r.query_id].append(r.neighbor_id)
    # query 100 ("spark shuffle data"): docs 2 and 0 are the lexical hits
    assert set(top[100]) == {0, 2}
    # query 101 ("gardening cat"): docs 3 and 1
    assert set(top[101]) == {3, 1}


def test_bm25_rerank_deterministic_and_jvm_side(spark):
    docs, qs, sl = _frames(spark)
    a = sorted(map(tuple, rerank.bm25_rerank(sl, qs, docs).collect()))
    bdf = rerank.bm25_rerank(sl, qs, docs)
    assert a == sorted(map(tuple, bdf.collect()))
    plan = bdf._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_bm25_fitted_stats_match_inline_fit(spark):
    """bm25_fit → rerank(stats=…) (build-once/search-many) is value-equal
    to the inline fit, including across split query batches reusing ONE
    fitted object — the amortized shape c04 registers."""
    docs, qs, sl = _frames(spark)
    stats = rerank.bm25_fit(docs)
    assert stats.n_docs == len(DOCS)
    inline = sorted(map(tuple, rerank.bm25_rerank(sl, qs, docs).collect()))
    fitted = sorted(map(tuple, rerank.bm25_rerank(sl, qs, docs, stats=stats).collect()))
    assert inline == fitted
    # one fit, two query batches: union equals the single-call result
    per_batch = []
    for qid in (100, 101):
        out = rerank.bm25_rerank(
            sl.where(F.col("query_id") == qid),
            qs.where(F.col("query_id") == qid),
            docs,
            stats=stats,
        )
        per_batch += [tuple(r) for r in out.collect()]
    assert sorted(per_batch) == inline


def test_bm25_fit_vocab_restricted(spark):
    """A vocab-restricted fit scores identically for in-vocab queries —
    the bounded-df shape when the workload vocabulary is known."""
    docs, qs, sl = _frames(spark)
    vocab = qs.select(F.explode(F.split(F.col("text"), " ")).alias("term"))
    stats = rerank.bm25_fit(docs, vocab=vocab)
    full = sorted(map(tuple, rerank.bm25_rerank(sl, qs, docs).collect()))
    rest = sorted(map(tuple, rerank.bm25_rerank(sl, qs, docs, stats=stats).collect()))
    assert full == rest


def test_bm25_rerank_passthrough_columns_and_cut(spark):
    docs, qs, _ = _frames(spark)
    sl = spark.createDataFrame(
        [(100, 0, 0.9), (100, 2, 0.8), (100, 3, 0.7)],
        "query_id long, neighbor_id long, cos_sim double",
    )
    out = rerank.bm25_rerank(sl, qs, docs, k=1).collect()
    assert len(out) == 1 and out[0].neighbor_id == 2  # lexical winner
    assert abs(out[0].cos_sim - 0.8) < 1e-12  # extra columns survive


def test_bm25_rerank_empty_shortlist_and_empty_corpus(spark):
    # degenerate-input sweep (r12): an empty shortlist yields an empty,
    # correctly-schemaed frame; an empty corpus keeps every shortlist
    # row at score 0 (the rerank must never shrink the shortlist).
    docs, qs, sl = _frames(spark)
    empty_sl = sl.where(F.lit(False))
    out = rerank.bm25_rerank(empty_sl, qs, docs)
    assert out.count() == 0
    assert set(out.columns) == {"query_id", "neighbor_id", "bm25_micro", "rrnk"}
    empty_docs = docs.where(F.lit(False))
    kept = rerank.bm25_rerank(sl, qs, empty_docs).collect()
    assert len(kept) == len(SHORTLIST)
    assert all(r.bm25_micro == 0 for r in kept)


def test_bm25_fit_empty_corpus_fallbacks(spark):
    docs, qs, sl = _frames(spark)
    stats = rerank.bm25_fit(docs.where(F.lit(False)))
    assert stats.n_docs == 0 and stats.avgdl == 1.0  # documented fallback
    out = rerank.bm25_rerank(sl, qs, docs.where(F.lit(False)), stats=stats).collect()
    assert len(out) == len(SHORTLIST) and all(r.bm25_micro == 0 for r in out)


def test_rrf_fuse_matches_hand_computation(spark):
    # two retriever lists with overlapping + disjoint candidates
    vec = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "query_id long, neighbor_id long, rnk long"
    )
    lex = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], "query_id long, neighbor_id long, rrnk long"
    )
    out = {r.neighbor_id: r for r in
           rerank.rrf_fuse([vec, (lex, "rrnk")]).collect()}

    def c(rank, k0=60):
        return math.floor((1.0 / (k0 + rank)) * 1e6 + 0.5)

    assert out[11].rrf_micro == c(2) + c(1) and out[11].n_lists == 2
    assert out[10].rrf_micro == c(1) and out[10].n_lists == 1
    assert out[12].rrf_micro == c(3)
    assert out[13].rrf_micro == c(2)
    # 11 (two lists) outranks 10 (one first-place): the RRF consensus
    order = sorted(out.values(), key=lambda r: r.frnk)
    assert [r.neighbor_id for r in order] == [11, 10, 13, 12]


def test_rrf_fuse_ties_break_on_smaller_id_and_topk_cut(spark):
    a = spark.createDataFrame(
        [(1, 20, 1), (1, 21, 1)], "query_id long, neighbor_id long, rnk long"
    )  # identical ranks → identical rrf → id tie-break
    out = rerank.rrf_fuse([a], k=1).collect()
    assert len(out) == 1 and out[0].neighbor_id == 20
    plan = rerank.rrf_fuse([a])._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
