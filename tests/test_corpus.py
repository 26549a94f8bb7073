"""End-to-end corpus preparation: each gate drops exactly the right docs."""

from __future__ import annotations

from mlops_pipelines_featurestore_gcp_spark.operators.corpus import prepare_corpus

GOOD = "the cat sat on the mat and it was a good day for sitting in the sun"


def _docs(spark):
    rows = [
        (1, GOOD),                                  # keeper
        (2, GOOD),                                  # exact dup of 1 -> dropped (canonical=1)
        (3, GOOD + " indeed"),                      # near dup of 1 -> dropped (3 > 1)
        (4, "tiny"),                                # fails min_tokens
        (5, "the dog ran to the park and it was a fine day for running around outside"),  # keeper
        (6, "zzz qqq xxx vvv www yyy kkk jjj hhh ggg fff ddd sss aaa ppp"),  # no stopwords, low quality but uniq -> keeper
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prepare_corpus_gates(spark):
    out, stats = prepare_corpus(
        _docs(spark), "doc_id", "text",
        min_tokens=5, min_quality=0.3, near_dup_threshold=0.5, with_stats=True,
    )
    assert stats.input_docs == 6
    assert stats.after_quality == 5          # doc 4 gated out
    assert stats.after_exact_dedup == 4      # doc 2 collapsed into 1
    assert stats.after_near_dedup == 3       # doc 3 near-dups doc 1
    assert sorted(r.doc_id for r in out.collect()) == [1, 5, 6]


def test_prepare_corpus_attaches_profile(spark):
    out = prepare_corpus(_docs(spark), "doc_id", "text", near_dup_threshold=0.5)
    cols = set(out.columns)
    assert {"n_tokens", "quality", "stopword_ratio", "uniq_ratio"} <= cols
    row = {r.doc_id: r for r in out.collect()}
    assert row[1].n_tokens == len(GOOD.split())


def test_prepare_corpus_exact_clusters(spark):
    out = prepare_corpus(
        _docs(spark), "doc_id", "text",
        min_tokens=5, min_quality=0.3, near_dup_threshold=0.5, exact_clusters=True,
    )
    # same survivors as the one-pass rule on this fixture (single-edge cluster)
    assert sorted(r.doc_id for r in out.collect()) == [1, 5, 6]


def test_prepare_corpus_all_filtered(spark):
    docs = spark.createDataFrame([(1, "x"), (2, "y")], "doc_id long, text string")
    out, stats = prepare_corpus(docs, "doc_id", "text", min_tokens=5, with_stats=True)
    assert stats.after_quality == 0 and out.count() == 0


def test_prepare_corpus_decontamination_and_chunking(spark):
    bench = spark.createDataFrame(
        [(100, "the dog ran to the park and it was a fine day")],
        "doc_id long, text string",
    )
    out, stats = prepare_corpus(
        _docs(spark), "doc_id", "text",
        min_tokens=5, min_quality=0.3, near_dup_threshold=0.5,
        benchmark=bench, with_stats=True,
    )
    # doc 5 shares a 5-gram with the benchmark -> dropped after near-dedup
    assert stats.after_near_dedup == 3 and stats.after_decontamination == 2
    assert sorted(r.doc_id for r in out.collect()) == [1, 6]

    chunks = prepare_corpus(
        _docs(spark), "doc_id", "text",
        min_tokens=5, min_quality=0.3, near_dup_threshold=0.5,
        chunk_tokens=8, chunk_overlap=2,
    )
    rows = chunks.collect()
    assert {"chunk_idx", "chunk_text", "n_chunk_tokens"} <= set(chunks.columns)
    assert {r.doc_id for r in rows} == {1, 5, 6}
    assert all(r.n_chunk_tokens <= 8 for r in rows)


def test_prepare_corpus_pii_before_dedup(spark):
    # two docs identical except for different emails: with redact_pii the
    # placeholders make them EXACT dups and one is dropped
    rows = [
        (1, "contact alice@example.com for the full report on the findings today"),
        (2, "contact bob@other.org for the full report on the findings today"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = prepare_corpus(docs, "doc_id", "text", min_tokens=5, min_quality=0.0, redact_pii=True)
    got = out.collect()
    assert [r.doc_id for r in got] == [1]
    assert "<EMAIL>" in got[0].text and "alice" not in got[0].text


def test_corpus_diff_classifies_all_statuses(spark):
    from mlops_pipelines_featurestore_gcp_spark.operators.corpus import corpus_diff

    old = spark.createDataFrame(
        [
            (1, "kept exactly the same"),
            (2, "this one gets   edited"),
            (3, "this one is dropped in v2"),
            (4, "whitespace  only\tchange"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "kept exactly the same"),
            (2, "this one gets edited, truly"),
            (4, "whitespace only change"),  # normalizes equal → unchanged
            (5, "brand new document"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {2: "changed", 3: "removed", 5: "added"}
    full = {
        r.doc_id: r.status
        for r in corpus_diff(old, new, include_unchanged=True).collect()
    }
    assert full[1] == "unchanged" and full[4] == "unchanged"


def test_corpus_diff_null_text_present_both_sides_is_unchanged(spark):
    from mlops_pipelines_featurestore_gcp_spark.operators.corpus import corpus_diff

    old = spark.createDataFrame([(1, None), (2, "real text here")], "doc_id long, text string")
    new = spark.createDataFrame([(1, None), (3, None)], "doc_id long, text string")
    got = {r.doc_id: r.status for r in corpus_diff(old, new, include_unchanged=True).collect()}
    # doc 1 exists (with null text) in BOTH versions: unchanged, not added
    assert got == {1: "unchanged", 2: "removed", 3: "added"}


def test_prepare_corpus_gopher_gate(spark):
    long_good = (
        "the quick brown fox jumps over the lazy dog and then runs back home to "
        "rest because it must have been a long day of jumping with all of that "
        "energy spent on the chase and the garden work that follows every single "
        "afternoon when the sun is high and the shade is thin so the animals stay "
        "busy together and of course they do it with great care and joy"
    )
    docs = spark.createDataFrame(
        [(1, long_good), (2, "short but repeated tokens " * 20)],
        "doc_id long, text string",
    )
    from mlops_pipelines_featurestore_gcp_spark.operators.corpus import prepare_corpus

    base = prepare_corpus(docs, min_tokens=5, min_quality=0.0, near_dup_threshold=0.99)
    with_gopher = prepare_corpus(
        docs, min_tokens=5, min_quality=0.0, near_dup_threshold=0.99, gopher_rules=True
    )
    base_ids = {r.doc_id for r in base.select("doc_id").collect()}
    gopher_ids = {r.doc_id for r in with_gopher.select("doc_id").collect()}
    assert gopher_ids <= base_ids
    assert 1 in gopher_ids
    # doc 2 fails the required-stopword floor (no 'the/of/and/...' present)
    assert 2 in base_ids and 2 not in gopher_ids
