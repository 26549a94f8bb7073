"""Exact-substring span dedup (operators/dedup.py exact_substring_spans)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.operators.dedup import exact_substring_spans

W = 4  # small window so fixtures stay readable


def _words(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_shared_passage_found_with_exact_boundaries(spark):
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens → 3 windows of 4
    docs = spark.createDataFrame(
        [
            (1, f"{_words('a', 5)} {shared} {_words('b', 5)}"),
            (2, f"{_words('c', 2)} {shared} {_words('d', 9)}"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in exact_substring_spans(docs, "doc_id", "text", window=W).collect()}
    assert set(rows) == {1, 2}
    # doc 1: shared starts at token 6 (1-based), doc 2: token 3
    assert (rows[1].span_start, rows[1].span_end) == (6, 11)
    assert (rows[2].span_start, rows[2].span_end) == (3, 8)
    for r in rows.values():
        assert r.span_tokens == 6
        assert r.n_windows == 3  # 6 tokens, window 4 → 3 stride-1 windows


def test_within_doc_repeat_not_flagged(spark):
    rep = "one two three four"
    docs = spark.createDataFrame(
        [(1, f"{rep} filler0 filler1 {rep}"), (2, _words("z", 12))],
        ["doc_id", "text"],
    )
    assert exact_substring_spans(docs, "doc_id", "text", window=W).count() == 0


def test_short_docs_and_disjoint_docs_yield_nothing(spark):
    docs = spark.createDataFrame(
        [(1, "too short"), (2, _words("p", 10)), (3, _words("q", 10))],
        ["doc_id", "text"],
    )
    assert exact_substring_spans(docs, "doc_id", "text", window=W).count() == 0


def test_two_disjoint_shared_passages_stay_separate_spans(spark):
    s1, s2 = "red green blue cyan", "dogs cats mice birds"
    docs = spark.createDataFrame(
        [
            (1, f"{s1} {_words('x', 6)} {s2}"),
            (2, f"{s2} {_words('y', 6)} {s1}"),
        ],
        ["doc_id", "text"],
    )
    out = exact_substring_spans(docs, "doc_id", "text", window=W)
    per_doc = (
        out.groupBy("doc_id").agg(F.count("*").alias("n"), F.sum("span_tokens").alias("tok"))
    ).collect()
    assert {r.doc_id: (r.n, r.tok) for r in per_doc} == {1: (2, 8), 2: (2, 8)}


def test_identical_docs_flag_full_text(spark):
    text = _words("w", 9)
    docs = spark.createDataFrame([(1, text), (2, text)], ["doc_id", "text"])
    rows = exact_substring_spans(docs, "doc_id", "text", window=W).collect()
    assert len(rows) == 2
    for r in rows:
        assert (r.span_start, r.span_end, r.span_tokens) == (1, 9, 9)


def test_null_and_empty_text_docs_yield_no_windows(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "short"), (4, _words("m", 8)), (5, _words("m", 8))],
        "doc_id long, text string",
    )
    rows = exact_substring_spans(docs, "doc_id", "text", window=W).collect()
    # only the two identical real docs flag; null/empty/short produce nothing
    assert sorted({r.doc_id for r in rows}) == [4, 5]


def test_remove_duplicate_spans_cuts_exact_ranges(spark):
    from mlops_pipelines_featurestore_gcp_spark.operators.dedup import remove_duplicate_spans

    shared = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, f"{_words('a', 5)} {shared} {_words('b', 5)}"),
            (2, f"{_words('c', 2)} {shared} {_words('d', 9)}"),
            (3, "untouched by any span"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    spans = exact_substring_spans(docs, "doc_id", "text", window=W)
    out = {r.doc_id: r for r in remove_duplicate_spans(docs, spans, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1].clean_text == f"{_words('a', 5)} {_words('b', 5)}"
    assert out[2].clean_text == f"{_words('c', 2)} {_words('d', 9)}"
    assert (out[1].n_removed_tokens, out[2].n_removed_tokens) == (6, 6)
    assert out[3].clean_text == "untouched by any span" and out[3].n_removed_tokens == 0
    assert out[4].clean_text == "" and out[4].n_tokens == 0 and out[4].n_removed_tokens == 0
    # idempotent: no cross-doc windows survive in the cleaned corpus
    cleaned = spark.createDataFrame(
        [(k, v.clean_text) for k, v in out.items()], "doc_id long, text string"
    )
    assert exact_substring_spans(cleaned, "doc_id", "text", window=W).count() == 0


def test_remove_spans_keep_one_via_span_filter(spark):
    from pyspark.sql import functions as F
    from mlops_pipelines_featurestore_gcp_spark.operators.dedup import remove_duplicate_spans

    text = _words("w", 6)
    docs = spark.createDataFrame([(1, text), (2, text)], "doc_id long, text string")
    spans = exact_substring_spans(docs, "doc_id", "text", window=W)
    # keep the lowest doc id: drop its spans from the cut list
    keeper = spans.groupBy().agg(F.min("doc_id").alias("k"))
    cut = spans.join(keeper, spans.doc_id == keeper.k, "left_anti")
    out = {r.doc_id: r.clean_text for r in remove_duplicate_spans(docs, cut, "doc_id", "text").collect()}
    assert out == {1: text, 2: ""}
