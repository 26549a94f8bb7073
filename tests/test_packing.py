"""Sequence packing (operators/packing.py): stream-layout invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.functions.text import tokens
from mlops_pipelines_featurestore_gcp_spark.operators.packing import pack_sequences
from mlops_pipelines_featurestore_gcp_spark.sources.catalog import load_table

SEQ, SHARDS = 512, 8


@pytest.fixture(scope="module")
def packed(spark, sf_small):
    docs = load_table(spark, "documents", sf_small)
    rows = pack_sequences(docs, "doc_id", "text", seq_tokens=SEQ, shards=SHARDS).collect()
    return docs, rows


def test_every_nonempty_doc_packed_once(spark, packed):
    docs, rows = packed
    expected = docs.select("doc_id", F.size(tokens(F.col("text"))).alias("n")).collect()
    nonempty = {r.doc_id for r in expected if r.n > 0}
    assert sorted(r.doc_id for r in rows) == sorted(nonempty)


def test_shard_streams_are_contiguous(packed):
    _, rows = packed
    by_shard: dict[int, list] = {}
    for r in rows:
        assert 0 <= r.shard < SHARDS
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.seq_offset)
        cursor = 0
        for r in shard_rows:
            assert r.seq_offset == cursor, "gap or overlap in the packed stream"
            cursor += r.n_tokens


def test_seq_id_and_pos_derive_from_offset(packed):
    _, rows = packed
    for r in rows:
        assert r.seq_id == r.seq_offset // SEQ
        assert r.pos_in_seq == r.seq_offset % SEQ


def test_subset_preserves_relative_order(spark, sf_small, packed):
    """Hash-ordered streams are diffable: packing a subset keeps the common
    docs' within-shard relative order (new docs splice in, never reorder)."""
    docs, rows = packed
    sub = pack_sequences(
        docs.where(F.col("doc_id") % 3 != 0), "doc_id", "text", seq_tokens=SEQ, shards=SHARDS
    ).collect()
    full_order = {
        s: [r.doc_id for r in sorted((x for x in rows if x.shard == s), key=lambda x: x.seq_offset)]
        for s in range(SHARDS)
    }
    for s in range(SHARDS):
        sub_ids = [
            r.doc_id for r in sorted((x for x in sub if x.shard == s), key=lambda x: x.seq_offset)
        ]
        common = [d for d in full_order[s] if d % 3 != 0]
        assert sub_ids == common


def test_no_global_sort_in_plan(spark, sf_small):
    docs = load_table(spark, "documents", sf_small)
    plan = (
        pack_sequences(docs, "doc_id", "text", seq_tokens=SEQ, shards=SHARDS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" not in plan.lower(), "packing must not globally sort"


def test_bad_params_raise(spark, sf_small):
    docs = load_table(spark, "documents", sf_small)
    with pytest.raises(ValueError):
        pack_sequences(docs, "doc_id", "text", seq_tokens=0)
    with pytest.raises(ValueError):
        pack_sequences(docs, "doc_id", "text", shards=0)


def test_null_and_empty_text_docs_excluded(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "some actual tokens here")],
        "doc_id long, text string",
    )
    rows = pack_sequences(docs, "doc_id", "text", seq_tokens=8, shards=2).collect()
    assert [r.doc_id for r in rows] == [4]
