from __future__ import annotations

from mlops_pipelines_featurestore_gcp_spark.operators import quality

GOOD_DOC = (
    "the quick brown fox jumps over the lazy dog and then runs back home to "
    "rest because it must have been a long day of jumping with all of that "
    "energy spent on the chase and the garden work that follows every single "
    "afternoon when the sun is high and the shade is thin so the animals stay "
    "busy together and of course they do it with great care and joy"
)


def _rows(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = quality.gopher_filters(df, "doc_id", "text")
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_good_doc_keeps(spark):
    rows = _rows(spark, [(1, GOOD_DOC)])
    r = rows[1]
    assert r["keep"] == 1
    assert r["n_words"] >= 50
    assert 3.0 <= r["mean_word_len"] <= 10.0
    assert r["n_required_stopwords"] >= 2


def test_short_doc_fails_word_count(spark):
    rows = _rows(spark, [(1, "too short to be a document")])
    assert rows[1]["pass_word_count"] == 0
    assert rows[1]["keep"] == 0


def test_bullet_heavy_doc_fails_bullet_rule(spark):
    text = "\n".join(f"- bullet item number {i}" for i in range(20))
    rows = _rows(spark, [(1, text)])
    r = rows[1]
    assert r["bullet_line_frac"] == 1.0
    assert r["pass_bullet_lines"] == 0
    assert r["keep"] == 0


def test_ellipsis_rule_counts_line_ends_only(spark):
    # 2 of 4 lines end with an ellipsis (one ASCII, one U+2026); the
    # mid-line "..." on line 3 must NOT count.
    text = "first line...\nsecond line stays\nthird ... middle\nfourth…"
    rows = _rows(spark, [(1, text)])
    r = rows[1]
    assert r["ellipsis_line_frac"] == 0.5
    assert r["pass_ellipsis_lines"] == 0


def test_symbol_ratio_counts_hashes_and_ellipses(spark):
    text = "alpha beta # gamma ### ... delta"
    rows = _rows(spark, [(1, text)])
    # tokens: alpha beta # gamma ### ... delta → 7 words; symbols: #,#,#,#,... → 5
    assert rows[1]["symbol_ratio"] == round(5 / 7, 6)
    assert rows[1]["pass_symbol_ratio"] == 0


def test_alpha_word_frac_excludes_numeric_tokens(spark):
    text = "one 1 two 2 three 3"
    rows = _rows(spark, [(1, text)])
    assert rows[1]["alpha_word_frac"] == 0.5
    assert rows[1]["pass_alpha_words"] == 0


def test_required_stopwords_counted_distinctly(spark):
    # 'the' appears many times but counts once; 'of' adds the second.
    rows = _rows(spark, [(1, "the the the the"), (2, "the of something")])
    assert rows[1]["n_required_stopwords"] == 1
    assert rows[1]["pass_stopwords"] == 0
    assert rows[2]["n_required_stopwords"] == 2
    assert rows[2]["pass_stopwords"] == 1


def test_empty_text_safe(spark):
    rows = _rows(spark, [(1, "")])
    r = rows[1]
    assert r["n_words"] == 0
    assert r["keep"] == 0


def test_apply_filter_returns_surviving_rows(spark):
    df = spark.createDataFrame(
        [(1, GOOD_DOC), (2, "way too short")], "doc_id long, text string"
    )
    kept = quality.apply_gopher_filter(df, "doc_id", "text")
    assert [r["doc_id"] for r in kept.collect()] == [1]
    assert set(kept.columns) == {"doc_id", "text"}


def test_ellipsis_rule_handles_crlf(spark):
    text = "first line...\r\nsecond stays\r\nthird…\r\nfourth"
    rows = _rows(spark, [(1, text)])
    # 2 of 4 lines end with an ellipsis even with Windows terminators
    assert rows[1]["ellipsis_line_frac"] == 0.5
