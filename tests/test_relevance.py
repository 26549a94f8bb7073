"""TF-IDF / BM25 relevance operators (operators/relevance.py)."""

from __future__ import annotations

import math

import pytest

from mlops_pipelines_featurestore_gcp_spark.operators.relevance import (
    bm25_scores,
    doc_terms,
    tf_idf,
)


@pytest.fixture
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "spark join join scan"),
            (2, "scan scan scan filter"),
            (3, "vector data model"),
            (4, ""),  # empty doc: length 0, no matches, score 0
        ],
        "doc_id long, text string",
    )


def test_doc_terms_counts(spark, corpus):
    got = {(r.doc_id, r.term): r.tf for r in doc_terms(corpus, "doc_id", "text").collect()}
    assert got[(1, "join")] == 2 and got[(1, "spark")] == 1
    assert got[(2, "scan")] == 3
    assert (4, "") not in got and not any(d == 4 for d, _ in got)


def test_tf_idf_matches_closed_form(spark, corpus):
    rows = {(r.doc_id, r.term): r for r in tf_idf(corpus, "doc_id", "text").collect()}
    n_docs = 4
    # 'scan' appears in docs 1 and 2 → df=2
    r = rows[(1, "scan")]
    assert r.df_docs == 2
    expected = 1 * (math.log((1.0 + n_docs) / (1.0 + 2)) + 1.0)
    assert r.tfidf_micro == math.floor(expected * 1e6 + 0.5)
    # df == N would give idf exactly 1 under the smooth convention (never
    # negative): synthesize by checking a term present in every non-empty doc
    assert all(v.tfidf_micro > 0 for v in rows.values())


def test_bm25_scores_closed_form_and_zero_match(spark, corpus):
    out = {r.doc_id: r for r in bm25_scores(
        corpus, "doc_id", "text", ["scan", "spark"], k1=1.2, b=0.75
    ).collect()}
    assert set(out) == {1, 2, 3, 4}  # full ranking, zero-match docs kept
    assert out[3].score_micro == 0 and out[3].n_matched == 0
    assert out[4].score_micro == 0 and out[4].n_tokens == 0
    # closed form for doc 2 / 'scan': N=4, df=2, tf=3, dl=4, avgdl=11/4
    n, df, tf, dl, avgdl, k1, b = 4, 2, 3, 4, 11 / 4, 1.2, 0.75
    idf = math.log(1.0 + (float(n) - df + 0.5) / (df + 0.5))
    sat = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    assert out[2].n_matched == 1
    assert out[2].score_micro == math.floor(idf * sat * 1e6 + 0.5)
    # doc 1 matches both query terms; its two contributions sum as longs
    assert out[1].n_matched == 2
    assert out[1].score_micro > 0


def test_bm25_rejects_empty_query(spark, corpus):
    with pytest.raises(ValueError):
        bm25_scores(corpus, "doc_id", "text", [])


def test_bm25_ranking_prefers_matching_docs(spark):
    rows = [(i, "filler words only here") for i in range(20)]
    rows.append((100, "target target target query"))
    rows.append((101, "target query"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.score_micro for r in bm25_scores(df, "doc_id", "text", ["target"]).collect()}
    assert out[100] > out[101] > 0  # higher tf → higher score
    assert all(out[i] == 0 for i in range(20))


def test_bm25_empty_corpus_and_duplicate_query_terms(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    out = bm25_scores(empty, "doc_id", "text", ["x"]).collect()
    assert out == []
    docs = spark.createDataFrame([(1, "x x y")], "doc_id long, text string")
    a = {r.doc_id: r.score_micro for r in bm25_scores(docs, "doc_id", "text", ["x"]).collect()}
    b = {r.doc_id: r.score_micro for r in bm25_scores(docs, "doc_id", "text", ["x", "x"]).collect()}
    assert a == b  # duplicate query terms are deduped, not double-counted


def test_tf_idf_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert tf_idf(empty, "doc_id", "text").collect() == []
