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


def _mm08_fixture(spark, n=120):
    """The mm08 registered fixture shape: aligned shared intro per %89
    bucket + unique body — same-bucket pairs share exactly the intro."""
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    unit_p = F.concat(F.lit("P"), (F.col("doc_id") % 89).cast("string"), F.lit("#"))
    unit_s = F.concat(F.lit("s"), F.col("doc_id").cast("string"), F.lit("."))
    vids = docs.select(
        "doc_id", F.concat(F.repeat(unit_p, 120), F.repeat(unit_s, 60)).alias("text")
    )
    return multimodal.attach_payload(vids, "text", mime="video/raw")


def test_mm08_fixture_pair_graph_is_union_of_cliques(spark):
    """The mm08 oracle labels components as ONE-HOP neighbor-min, which is
    exact only when the pair graph is a union of cliques. Pin that
    precondition against the real connected-components operator on the
    registered fixture shape — if a fixture change ever breaks cliquehood,
    this fails before the oracle can drift."""
    from mlops_pipelines_featurestore_gcp_spark.operators.components import connected_components

    from mlops_pipelines_featurestore_gcp_spark.operators.dedup import key_jaccard_pairs

    payloads = _mm08_fixture(spark)
    hashed = multimodal.video_frame_hashes(payloads, "doc_id", full_frames_only=True)
    pairs = key_jaccard_pairs(hashed, "doc_id", threshold=0.08)
    edges = pairs.select(F.col("doc_a"), F.col("doc_b"))
    comp = {r.node: r.component for r in connected_components(edges).collect()}
    one_hop = {}
    for r in edges.collect():
        one_hop.setdefault(r.doc_a, r.doc_a)
        one_hop.setdefault(r.doc_b, r.doc_b)
        one_hop[r.doc_a] = min(one_hop[r.doc_a], r.doc_b)
        one_hop[r.doc_b] = min(one_hop[r.doc_b], r.doc_a)
    assert comp  # fixture actually produces duplicate clusters
    assert comp == {n: min(n, m) for n, m in one_hop.items()}


def test_keep_best_by_element_sets_matches_pair_graph_path(spark):
    """The linear set-Jaccard keep-best (signature collapse +
    representative graph) must select the SAME keep set as the full
    pair-table composition — the connectivity-exactness claim."""
    from mlops_pipelines_featurestore_gcp_spark.operators import sampling
    from mlops_pipelines_featurestore_gcp_spark.operators.components import dedup_keep_best_set
    from mlops_pipelines_featurestore_gcp_spark.operators.dedup import (
        keep_best_by_element_sets,
        key_jaccard_pairs,
    )

    payloads = _mm08_fixture(spark)
    hashed = multimodal.video_frame_hashes(payloads, "doc_id", full_frames_only=True)
    quality = payloads.select(
        "doc_id", sampling.uniform_hash("doc_id", "vq").alias("q")
    )
    linear = keep_best_by_element_sets(
        hashed, "doc_id", quality, "q", threshold=0.08
    )
    rows = linear.collect()
    assert len(rows) == 120  # one row per video
    kept_linear = {r.doc_id for r in rows if r.kept == 1}

    pairs = key_jaccard_pairs(hashed, "doc_id", threshold=0.08)
    kept_graph = {
        r.doc_id
        for r in dedup_keep_best_set(
            pairs.select("doc_a", "doc_b"),
            payloads.select("doc_id"),
            "doc_id",
            quality,
            "q",
        ).collect()
    }
    assert kept_linear == kept_graph
    # cluster sizes: ids 0..119 over %89 buckets → buckets 0..30 have 2
    # members, 31..88 have 1
    sizes = {r.doc_id: r.cluster_size for r in rows}
    assert sizes[0] == 2 and sizes[89] == 2 and sizes[31] == 1


def test_keep_best_by_element_sets_collapses_exact_multiplicity(spark):
    """The scale claim: EXACT set duplicates collapse before the pairwise
    stage, so the representative graph is sized by DISTINCT content, not
    duplicate multiplicity — 2000 videos over 8 distinct frame sets must
    produce an 8-node representative graph (near-dup-distinct content is
    inherently pairwise and keeps the mm06-style 10× gate)."""
    from mlops_pipelines_featurestore_gcp_spark.operators import sampling
    from mlops_pipelines_featurestore_gcp_spark.operators.dedup import (
        keep_best_by_element_sets,
        key_jaccard_pairs,
    )

    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    # 8 distinct videos, each duplicated 250x byte-identically
    unit = F.concat(F.lit("V"), (F.col("doc_id") % 8).cast("string"), F.lit("#"))
    vids = docs.select("doc_id", F.repeat(unit, 200).alias("text"))
    payloads = multimodal.attach_payload(vids, "text", mime="video/raw")
    hashed = multimodal.video_frame_hashes(payloads, "doc_id")
    quality = docs.select("doc_id", sampling.uniform_hash("doc_id", "cq").alias("q"))

    # the representative element table the operator would pair over
    sig = hashed.groupBy("doc_id").agg(
        F.md5(F.concat_ws(",", F.array_sort(F.collect_set("h")))).alias("s")
    )
    assert sig.select("s").distinct().count() == 8  # content, not multiplicity

    out = keep_best_by_element_sets(hashed, "doc_id", quality, "q", threshold=0.5)
    rows = out.collect()
    assert len(rows) == 2000
    assert sum(r.kept for r in rows) == 8  # one survivor per distinct video
    assert all(r.cluster_size == 250 for r in rows)
    # sanity: the full pair form would have materialized 250 choose 2 per
    # cluster ~ 249k pairs; the representative graph pairs over 8 nodes
    n_rep_pairs = key_jaccard_pairs(
        hashed.join(
            sig.groupBy("s").agg(F.min("doc_id").alias("doc_id")).select("doc_id"),
            "doc_id",
        ),
        "doc_id",
        threshold=0.5,
    ).count()
    assert n_rep_pairs == 0  # 8 distinct periodic videos share no frames


def test_full_frames_only_kills_suffix_tail_edges_at_10x_ids(spark):
    """The 10×-gate failure mode, pinned: 5-digit doc ids whose decimal
    SUFFIX matches ('…042') share the ragged trailing frame and chain
    unrelated cluster groups. full_frames_only=True must produce ZERO
    cross-bucket pairs on a 10×-shaped id range, while the unfiltered
    table reproduces the spurious edges."""
    from mlops_pipelines_featurestore_gcp_spark.operators.dedup import key_jaccard_pairs

    docs = spark.range(18000, 18000 + 30050, 1000).select(F.col("id").alias("doc_id"))
    docs = docs.union(spark.range(18042, 18042 + 30050, 1000).select(F.col("id").alias("doc_id")))
    unit_p = F.concat(F.lit("P"), (F.col("doc_id") % 89).cast("string"), F.lit("#"))
    unit_s = F.concat(F.lit("s"), F.col("doc_id").cast("string"), F.lit("."))
    vids = docs.select(
        "doc_id", F.concat(F.repeat(unit_p, 120), F.repeat(unit_s, 60)).alias("text")
    )
    payloads = multimodal.attach_payload(vids, "text", mime="video/raw")

    raw = multimodal.video_frame_hashes(payloads, "doc_id")
    cross_raw = (
        key_jaccard_pairs(raw, "doc_id", threshold=0.08)
        .where(F.col("doc_a") % 89 != F.col("doc_b") % 89)
        .count()
    )
    assert cross_raw > 0  # the spurious suffix-tail edges exist unfiltered

    full = multimodal.video_frame_hashes(payloads, "doc_id", full_frames_only=True)
    cross_full = (
        key_jaccard_pairs(full, "doc_id", threshold=0.08)
        .where(F.col("doc_a") % 89 != F.col("doc_b") % 89)
        .count()
    )
    assert cross_full == 0
