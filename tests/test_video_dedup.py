"""Video near-dup via sampled-frame fingerprint Jaccard
(operators/multimodal.py video_neardup_pairs — the mm06 machinery)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.operators import multimodal


def _payloads(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return multimodal.attach_payload(df, "text")


def _ref_jaccard(a: str, b: str, frame_bytes=64, every=2) -> float:
    """Independent single-threaded reference: sampled-frame md5 sets."""

    def frames(t: str) -> set[str]:
        bs = t.encode()
        n = (len(bs) - 1) // frame_bytes + 1 if bs else 0
        return {
            hashlib.md5(bs[j * frame_bytes : (j + 1) * frame_bytes]).hexdigest()
            for j in range(n)
            if j % every == 0
        }

    fa, fb = frames(a), frames(b)
    inter = len(fa & fb)
    return inter / (len(fa) + len(fb) - inter)


def test_video_jaccard_matches_reference_on_partial_overlap(spark):
    shared = "I" * 300  # shared intro: aligned identical frames
    a_txt, b_txt, c_txt = shared + "A" * 200, shared + "B" * 260, "Z" * 500
    df = _payloads(spark, [(1, a_txt), (2, b_txt), (3, c_txt)])
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in multimodal.video_neardup_pairs(df, "doc_id", threshold=0.01).collect()
    }
    assert set(got) == {(1, 2)}  # c shares no frames with anyone
    assert abs(got[(1, 2)] - _ref_jaccard(a_txt, b_txt)) < 1e-12


def test_video_exact_duplicates_score_one(spark):
    t = "frame content " * 40
    df = _payloads(spark, [(1, t), (2, t), (3, "other " * 50)])
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in multimodal.video_neardup_pairs(df, "doc_id", threshold=0.5).collect()
    }
    assert got == {(1, 2): 1.0}


def test_video_threshold_cuts_low_overlap(spark):
    shared = "I" * 70  # one shared kept frame (frame 0), rest unique
    df = _payloads(spark, [(1, shared + "A" * 500), (2, shared + "B" * 500)])
    low = multimodal.video_neardup_pairs(df, "doc_id", threshold=0.01).collect()
    assert len(low) == 1 and low[0].jaccard < 0.5
    high = multimodal.video_neardup_pairs(df, "doc_id", threshold=0.5).collect()
    assert high == []


def test_video_max_df_caps_boilerplate_frames(spark):
    # a black/intro card present in EVERY clip must not drive candidates
    intro = "K" * 128  # two full kept-aligned frames? frame 0 kept, frame 1 dropped
    rows = [(i, intro + f"body{i}" * 40) for i in range(1, 7)]
    df = _payloads(spark, rows)
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in multimodal.video_neardup_pairs(df, "doc_id", threshold=0.01).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in multimodal.video_neardup_pairs(df, "doc_id", threshold=0.01, max_df=2).collect()
    }
    # candidates only from sub-hot frames; surviving scores stay EXACT
    assert set(capped) <= set(exact)
    for k, v in capped.items():
        assert abs(v - exact[k]) < 1e-12
