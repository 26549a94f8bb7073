"""Multimodal-column tests: payload attach metadata, decode-stub plumbing
(batch shapes, schema), feature extraction determinism, frame-sample math,
and the stub boundary (NotImplementedError for real codecs)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.operators import multimodal as mm


@pytest.fixture
def docs(spark):
    rows = [(1, "a" * 100), (2, "hello world"), (3, "x" * 200)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_attach_payload_metadata(spark, docs):
    out = mm.attach_payload(docs, "text", mime="text/plain")
    r = {x.doc_id: x for x in out.collect()}
    assert r[1].media_meta.n_bytes == 100
    assert r[2].media_meta.fingerprint == hashlib.md5(b"hello world").hexdigest()
    assert bytes(r[2].payload) == b"hello world"


def test_decode_stub_matches_digest(spark, docs):
    out = mm.decode_media(mm.attach_payload(docs, "text"))
    r = {x.doc_id: x for x in out.collect()}
    d = hashlib.md5(b"hello world").digest()
    assert (r[2].width, r[2].height, r[2].channels) == (
        16 + d[0] % 240,
        16 + d[1] % 240,
        1 + d[2] % 4,
    )
    # passthrough columns survive the mapInPandas stage
    assert r[2].text == "hello world"


def test_decode_real_codecs_rejects_non_png_without_pil(spark, docs):
    # text payloads are not PNG: without PIL the real-codec path must fail
    # loudly per payload (PNG itself decodes for real — test_png.py)
    with pytest.raises(Exception, match="PNG|NotImplemented"):
        mm.decode_media(mm.attach_payload(docs, "text"), use_real_codecs=True).collect()


def test_extract_features_shape_and_determinism(spark, docs):
    out = mm.extract_features(mm.attach_payload(docs, "text"))
    feats = {r.doc_id: r.features for r in out.collect()}
    assert all(len(v) == mm.FEATURE_DIM for v in feats.values())
    d = hashlib.sha256(b"hello world").digest()
    expected = [round(d[i] / 255.0, 6) for i in range(mm.FEATURE_DIM)]
    assert feats[2] == pytest.approx(expected, abs=1e-6)


def test_frame_sample_math(spark):
    # 200 bytes → frames of 64: sizes [64, 64, 64, 8]; keep idx 0, 2
    df = spark.createDataFrame([(1, "x" * 200)], "doc_id long, text string")
    frames = mm.frame_sample(mm.attach_payload(df, "text"), frame_bytes=64, every=2)
    sizes = [r.frame_meta.n_bytes for r in frames.collect()]
    assert sizes == [64, 64]
    # every=1 keeps all four, including the 8-byte tail
    all_frames = mm.frame_sample(mm.attach_payload(df, "text"), frame_bytes=64, every=1)
    assert [r.frame_meta.n_bytes for r in all_frames.collect()] == [64, 64, 64, 8]


def test_frame_sample_empty_payload_yields_no_rows(spark):
    # ADVICE r3: floor((0-1)/frame_bytes) = -1 made sequence(0,-1) DESCEND,
    # exploding spurious empty frames for a 0-byte payload
    from mlops_pipelines_featurestore_gcp_spark.operators.multimodal import frame_sample

    df = spark.createDataFrame(
        [("a", bytearray(b"")), ("b", bytearray(b"x" * 130))], "id string, payload binary"
    )
    out = frame_sample(df, frame_bytes=64, every=1).select("id").collect()
    ids = sorted(r.id for r in out)
    assert ids == ["b", "b", "b"]  # 130 bytes -> 3 frames; empty -> none
