"""The three embedding near-dup strategies agree where they overlap:
any pair an LSH-blocked variant reports must appear in the exact all-pairs
baseline with the identical rounded cosine; blocking only removes pairs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.operators import similarity
from mlops_pipelines_featurestore_gcp_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, "embeddings", "/root/testdata/sf0.001").cache()


def _pairs(df):
    return {(r.id_a, r.id_b): r.cos_sim for r in df.collect()}


def test_blocked_variants_are_subsets_of_exact(emb):
    exact = _pairs(similarity.cosine_neardup_pairs(emb, threshold=0.4, dim=64))
    coord = _pairs(similarity.coord_sign_blocked_pairs(emb, threshold=0.4, dim=64))
    hyper = _pairs(similarity.lsh_blocked_pairs(emb, threshold=0.4, dim=64))
    assert set(coord) <= set(exact)
    assert set(hyper) <= set(exact)
    for k, v in coord.items():
        assert v == exact[k]
    for k, v in hyper.items():
        assert v == exact[k]


def test_hyperplane_signature_deterministic(emb):
    a = similarity.hyperplane_signature(emb, vec_col="embedding", planes=8, dim=64)
    b = similarity.hyperplane_signature(emb, vec_col="embedding", planes=8, dim=64)
    ra = {r.vec_id: r.sig for r in a.collect()}
    rb = {r.vec_id: r.sig for r in b.collect()}
    assert ra == rb
    assert all(0 <= s < 256 for s in ra.values())


def test_ivf_index_persist_and_search(spark, emb, tmp_path):
    """build_ivf_index → ivf_search returns the SAME answer as the in-memory
    ivf_topk (same seed → same quantizer), and only probed cells are read."""
    path = str(tmp_path / "ivf")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    similarity.build_ivf_index(emb, path, n_centroids=8, seed=42)
    searched = similarity.ivf_search(spark, path, queries, n_probe=3, k=5, dim=64)
    in_mem = similarity.ivf_topk(emb, queries, n_centroids=8, n_probe=3, k=5, seed=42, dim=64)
    got = sorted((r.query_id, r.neighbor_id, r.cos_sim, r.rnk) for r in searched.collect())
    want = sorted((r.query_id, r.neighbor_id, r.cos_sim, r.rnk) for r in in_mem.collect())
    assert got == want and len(got) > 0
    # the assigned table is cell-partitioned: probing must not scan all cells
    plan = searched._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "dynamicpruning" in plan, plan
