from __future__ import annotations

import math

from mlops_pipelines_featurestore_gcp_spark.operators.lm_score import unigram_lm_score


def _scores(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r.doc_id: r.asDict() for r in unigram_lm_score(df, "doc_id", "text").collect()}


def test_matches_closed_form(spark):
    # corpus: "a a b" + "a c" → tf: a=3, b=1, c=1; total=5, V=3
    got = _scores(spark, [(1, "a a b"), (2, "a c")])
    total, v = 5, 3
    lp = {t: math.floor(math.log((tf + 1.0) / (total + v)) * 1e6 + 0.5) for t, tf in {"a": 3, "b": 1, "c": 1}.items()}
    exp1 = 2 * lp["a"] + lp["b"]
    assert got[1]["n_tokens"] == 3
    assert got[1]["logp_micro_sum"] == exp1
    avg1 = exp1 / 1e6 / 3
    assert got[1]["avg_logp"] == math.floor(avg1 * 1e6 + 0.5) / 1e6
    assert got[1]["perplexity"] == math.floor(math.exp(-avg1) * 1e6 + 0.5) / 1e6


def test_rare_tokens_score_lower(spark):
    # doc of common tokens vs doc of hapaxes — the rare doc is higher-perplexity
    docs = [(1, "the the the the"), (2, "zq wx kv jp")] + [
        (10 + i, "the and of to") for i in range(5)
    ]
    got = _scores(spark, docs)
    assert got[2]["perplexity"] > got[1]["perplexity"]
    assert got[2]["avg_logp"] < got[1]["avg_logp"]


def test_empty_doc_absent(spark):
    got = _scores(spark, [(1, "some words here"), (2, "   ")])
    assert set(got) == {1}


def test_normalization_casefolds(spark):
    # "The" and "the" are one vocab entry after normalize()
    got = _scores(spark, [(1, "The the"), (2, "the the")])
    assert got[1]["logp_micro_sum"] == got[2]["logp_micro_sum"]
