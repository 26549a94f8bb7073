"""Incremental dedup index: batch-vs-store semantics, replay idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.operators.incremental import (
    EXACT_DUP,
    KEPT,
    NEAR_DUP,
    IncrementalDedupIndex,
)

DOC_A = "the quick brown fox jumps over the lazy dog and keeps running through the quiet forest"
DOC_B = "completely different content about distributed query engines and shuffle-minimal physical plans"
DOC_C = "a third unrelated document mentioning watermarks event time windows and exactly once sinks"
# DOC_A with one word changed — high shingle overlap
DOC_A_NEAR = "the quick brown fox jumps over the lazy cat and keeps running through the quiet forest"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _index(spark, tmp_path):
    return IncrementalDedupIndex(spark, str(tmp_path / "dedup_idx"), threshold=0.5)


def _report(idx, spark, rows):
    out = idx.ingest(_docs(spark, rows), "doc_id", "text")
    return {r.doc_id: r for r in out.collect()}


def test_first_ingest_keeps_all_and_persists(spark, tmp_path):
    idx = _index(spark, tmp_path)
    rep = _report(idx, spark, [(1, DOC_A), (2, DOC_B)])
    assert {r.status for r in rep.values()} == {KEPT}
    from mlops_pipelines_featurestore_gcp_spark.streaming.upsert import read_upsert_table

    exact = read_upsert_table(spark, f"{idx.path}/exact")
    assert exact.count() == 2
    sigs = read_upsert_table(spark, f"{idx.path}/sigs")
    assert {r.doc_id for r in sigs.collect()} == {1, 2}


def test_second_batch_exact_near_and_fresh(spark, tmp_path):
    idx = _index(spark, tmp_path)
    _report(idx, spark, [(1, DOC_A), (2, DOC_B)])
    rep = _report(idx, spark, [(10, DOC_A), (11, DOC_A_NEAR), (12, DOC_C)])
    assert rep[10].status == EXACT_DUP and rep[10].dup_of == 1 and rep[10].est_jaccard == 1.0
    assert rep[11].status == NEAR_DUP and rep[11].dup_of == 1
    assert 0.5 <= rep[11].est_jaccard <= 1.0
    assert rep[12].status == KEPT and rep[12].dup_of is None
    from mlops_pipelines_featurestore_gcp_spark.streaming.upsert import read_upsert_table

    exact = read_upsert_table(spark, f"{idx.path}/exact")
    assert {r.canonical for r in exact.collect()} == {1, 2, 12}


def test_in_batch_exact_and_near_dups(spark, tmp_path):
    idx = _index(spark, tmp_path)
    rep = _report(idx, spark, [(1, DOC_A), (2, DOC_A), (3, DOC_A_NEAR), (4, DOC_B)])
    assert rep[1].status == KEPT
    assert rep[2].status == EXACT_DUP and rep[2].dup_of == 1
    assert rep[3].status == NEAR_DUP and rep[3].dup_of == 1
    # in-batch near-dup est is the EXACT verified jaccard
    assert 0.5 <= rep[3].est_jaccard <= 1.0
    assert rep[4].status == KEPT


def test_replay_is_idempotent(spark, tmp_path):
    idx = _index(spark, tmp_path)
    batch = [(1, DOC_A), (2, DOC_B)]
    _report(idx, spark, batch)
    rep2 = _report(idx, spark, batch)  # exact same batch again (retry)
    # a doc maps to ITSELF in the exact store → still kept, stores unchanged
    assert {r.status for r in rep2.values()} == {KEPT}
    from mlops_pipelines_featurestore_gcp_spark.streaming.upsert import read_upsert_table

    assert read_upsert_table(spark, f"{idx.path}/exact").count() == 2
    assert read_upsert_table(spark, f"{idx.path}/sigs").count() == 2


def test_near_dup_not_admitted_to_store(spark, tmp_path):
    idx = _index(spark, tmp_path)
    _report(idx, spark, [(1, DOC_A)])
    _report(idx, spark, [(20, DOC_A_NEAR)])
    from mlops_pipelines_featurestore_gcp_spark.streaming.upsert import read_upsert_table

    sigs = read_upsert_table(spark, f"{idx.path}/sigs")
    assert {r.doc_id for r in sigs.collect()} == {1}
    # and a LATER exact copy of the rejected near-dup is still caught
    # against the ORIGINAL (doc 1), not the rejected doc 20
    rep = _report(idx, spark, [(30, DOC_A_NEAR)])
    assert rep[30].status == NEAR_DUP and rep[30].dup_of == 1


def test_report_counts_partition_batch(spark, tmp_path):
    idx = _index(spark, tmp_path)
    rep = _report(idx, spark, [(i, f"{DOC_B} variant token{i} padding words here") for i in range(5)])
    # five docs sharing most shingles: one kept, rest near-dups of min id
    statuses = [rep[i].status for i in range(5)]
    assert statuses.count(KEPT) == 1 and statuses.count(NEAR_DUP) == 4
    assert all(rep[i].dup_of == 0 for i in range(1, 5))


def test_streaming_dedup_sink(spark, tmp_path):
    """File stream → foreachBatch ingest: survivors admitted, report table
    keyed per doc, dedup across the whole stream."""
    src = str(tmp_path / "incoming")
    batch1 = _docs(spark, [(1, DOC_A), (2, DOC_B)])
    batch1.write.mode("overwrite").parquet(src)
    # second file lands in the same directory: one exact dup + one fresh
    _docs(spark, [(10, DOC_A), (12, DOC_C)]).write.mode("append").parquet(src)

    idx = _index(spark, tmp_path)
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = idx.dedup_sink(
        stream,
        str(tmp_path / "ckpt"),
        id_col="doc_id",
        text_col="text",
        report_path=str(tmp_path / "report"),
    )
    q.awaitTermination(120)

    from mlops_pipelines_featurestore_gcp_spark.streaming.upsert import read_upsert_table

    report = {r.doc_id: r for r in read_upsert_table(spark, str(tmp_path / "report")).collect()}
    assert set(report) == {1, 2, 10, 12}
    assert report[12].status == KEPT
    # doc 10 is an exact copy of doc 1; whichever micro-batch order the
    # stream picked, exactly one of {1, 10} was kept and the other flagged
    statuses = {report[1].status, report[10].status}
    assert KEPT in statuses and EXACT_DUP in statuses
    kept_sigs = read_upsert_table(spark, f"{idx.path}/sigs")
    assert kept_sigs.count() == 3  # one of the A-copies + B + C
