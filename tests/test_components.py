"""Connected components: chains, cliques, singletons, determinism."""

from __future__ import annotations

from mlops_pipelines_featurestore_gcp_spark.operators.components import connected_components, dedup_keep_set


def test_chain_and_clique_components(spark):
    # chain 1-2-3-4 (diameter 3) + clique {10,11,12} + isolated edge 20-21
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    comp = {r.node: r.component for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dedup_keep_set(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long")
    all_ids = spark.createDataFrame([(i,) for i in (1, 2, 3, 5, 10, 11, 99)], "doc_id long")
    keep = sorted(r.doc_id for r in dedup_keep_set(pairs, all_ids, "doc_id").collect())
    # clusters {1,2,3}->keep 1, {10,11}->keep 10; 5 and 99 untouched
    assert keep == [1, 5, 10, 99]


def test_transitive_chain_beats_one_pass(spark):
    # one-pass "drop greater side" would drop 2 and 3 but KEEP 4 only if
    # 3-4 was verified; with a chain 1-2, 2-3, 3-4 the closure keeps just 1
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long")
    all_ids = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "doc_id long")
    keep = sorted(r.doc_id for r in dedup_keep_set(pairs, all_ids, "doc_id").collect())
    assert keep == [1]


def test_empty_pair_graph(spark):
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    all_ids = spark.createDataFrame([(1,), (2,)], "doc_id long")
    assert connected_components(pairs).count() == 0
    keep = sorted(r.doc_id for r in dedup_keep_set(pairs, all_ids, "doc_id").collect())
    assert keep == [1, 2]  # nothing paired -> everything kept


def test_nonconvergence_raises_instead_of_silent_split(spark):
    # 7-node chain has diameter 6; 2 iterations cannot reach the fixed
    # point — a silent return here would hand downstream dedup SPLIT
    # components, so the operator must fail loudly.
    import pytest

    pairs = spark.createDataFrame([(i, i + 1) for i in range(1, 7)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="fixed point"):
        connected_components(pairs, max_iter=2)


def test_long_chain_converges_via_pointer_doubling(spark):
    # a 300-node chain has diameter 299: plain neighbor-min propagation
    # would need 299 iterations; pointer doubling must finish in the
    # default max_iter=20 (~log2 diameter + constant)
    pairs = spark.createDataFrame([(i, i + 1) for i in range(1, 300)], "doc_a long, doc_b long")
    comp = connected_components(pairs)
    got = {r.component for r in comp.collect()}
    assert got == {1}
    assert comp.count() == 300


def test_dedup_keep_best_set_picks_quality_canonical(spark):
    from mlops_pipelines_featurestore_gcp_spark.operators.components import dedup_keep_best_set

    # two clusters: {1,2,3} chained, {10,11}; 20 is untouched
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long")
    quality = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.5), (10, 0.4), (11, 0.4), (20, 0.1)],
        "doc_id long, quality double",
    )
    all_ids = quality.select("doc_id")
    keep = {
        r.doc_id
        for r in dedup_keep_best_set(pairs, all_ids, "doc_id", quality, "quality").collect()
    }
    # cluster one keeps its best (2); cluster two ties -> smaller id (10)
    assert keep == {2, 10, 20}


def test_dedup_keep_best_set_survives_missing_quality(spark):
    """A cluster member absent from quality_df must not vanish — missing
    quality sorts last, and a cluster whose EVERY member lacks quality
    still keeps exactly one (review r5: the inner join dropped them)."""
    from mlops_pipelines_featurestore_gcp_spark.operators.components import dedup_keep_best_set

    pairs = spark.createDataFrame([(1, 2), (10, 11)], "doc_a long, doc_b long")
    all_ids = spark.createDataFrame([(i,) for i in (1, 2, 10, 11, 20)], "doc_id long")
    quality = spark.createDataFrame([(1, 0.3), (20, 0.5)], "doc_id long, quality double")
    keep = {
        r.doc_id
        for r in dedup_keep_best_set(pairs, all_ids, "doc_id", quality, "quality").collect()
    }
    # {1,2}: only 1 has quality -> 1 wins; {10,11}: none scored -> min id 10
    assert keep == {1, 10, 20}


def test_dedup_keep_best_set_string_ids(spark):
    """String ids must tie-break to the lexicographically smallest id —
    the max_by(-id) formulation silently null-cast them (review r5)."""
    from mlops_pipelines_featurestore_gcp_spark.operators.components import dedup_keep_best_set

    pairs = spark.createDataFrame([("b", "c"), ("c", "a")], "doc_a string, doc_b string")
    all_ids = spark.createDataFrame([("a",), ("b",), ("c",), ("z",)], "doc_id string")
    quality = spark.createDataFrame(
        [("a", 0.5), ("b", 0.5), ("c", 0.5), ("z", 0.1)], "doc_id string, quality double"
    )
    keep = {
        r.doc_id
        for r in dedup_keep_best_set(pairs, all_ids, "doc_id", quality, "quality").collect()
    }
    assert keep == {"a", "z"}
