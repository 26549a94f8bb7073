"""Connected components over near-duplicate pair graphs — the iterative
closure that turns pairwise dedup verdicts into duplicate CLUSTERS.

``prepare_corpus`` drops the greater side of each verified pair (one-pass;
a doc chained only through a dropped doc survives). When exact transitive
closure matters — "keep ONE doc per duplicate cluster" — run label
propagation to a fixed point:

  each node starts labeled with itself; every iteration, each node takes
  the MIN label among itself and its neighbors, then follows its label's
  OWN label (pointer doubling / path shortcutting).

Neighbor-min alone converges in O(diameter) iterations — fine for unions
of small cliques, a pipeline-killer for the long templated-document
chains web corpora produce. The shortcut step makes the effective
propagation distance double per round, so convergence is O(log diameter):
``max_iter=20`` covers graphs with diameter up to ~2^20 rather than 20.
Each iteration is one join + one aggregate on the edge list plus one
self-join on the (one row per node) label table — all distributed, no
driver-side graph. The early-stop check is a count of changed labels per
iteration (one action per iteration — the unavoidable cost of a
data-dependent fixed point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Label each node of the pair graph with its component's MIN node id.

    Input: an edge list (undirected; ``src``/``dst`` columns). Output:
    ``(node, component)`` — one row per distinct node. Deterministic:
    component ids are the smallest member id.
    """
    # Both orientations via ONE explode, not a self-union: a union's two
    # branches each replay the full upstream pair-generation plan (Spark
    # does no cross-branch common-subexpression elimination), and for the
    # keep-best callers that plan is the expensive candidate join pipeline
    # — mm08's profile showed every candidate-stage job duplicated (r14,
    # guide §2.4: don't compute things twice before the shuffle).
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("__e")
        )
        .select("__e.u", "__e.v")
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .cache()
    )
    seed = labels
    changed = -1
    for _ in range(max_iter):
        # neighbor-min proposal: for each node, the smallest label among its
        # neighbors; keep min(own, proposal)
        prop = (
            edges.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        stepped = labels.join(prop, "node", "left").select(
            "node",
            F.least(F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))).alias("component"),
            (F.col("nbr_min") < F.col("component")).alias("__changed"),
        )
        # pointer doubling: labels are node ids, so each node can jump to
        # its label's own (possibly smaller) label. This shortcut is what
        # turns O(diameter) propagation into O(log diameter).
        hop = stepped.select(F.col("node").alias("component"), F.col("component").alias("__cc"))
        # localCheckpoint truncates the lineage every iteration — without it
        # the plan doubles per round (the classic iterative-algorithm trap)
        # and the optimizer re-analyzes an exponentially growing tree.
        # LAZY (r14, guide §5): the changed-count below is the action that
        # materializes it — one job per iteration instead of an eager
        # checkpoint job plus a count job. The count computes every
        # partition of the checkpointed RDD, so the next iteration reads
        # blocks, never recomputes the join.
        updated = (
            stepped.join(hop, "component", "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce(F.col("__cc"), F.col("component"))).alias("component"),
                "__changed",
            )
            .localCheckpoint(eager=False)
        )
        # convergence is judged on the neighbor-min step alone: if no node
        # saw a smaller neighbor label, every component is already uniform
        # (the shortcut can only accelerate, never unlock, progress)
        changed = updated.where(F.col("__changed")).count()
        labels = updated.drop("__changed")
        if changed == 0:
            break
    edges.unpersist()
    seed.unpersist()
    if changed != 0:
        # A silent exit here would return SPLIT components and downstream
        # dedup would keep several docs per duplicate cluster with no
        # signal — fail loudly instead; the per-iteration changed count
        # makes detection free.
        raise RuntimeError(
            f"connected_components did not reach a fixed point in {max_iter} "
            f"iterations ({changed} labels still changing); the pair graph "
            f"has diameter > {max_iter} — rerun with a larger max_iter"
        )
    return labels


def dedup_keep_set(pairs: DataFrame, all_ids: DataFrame, id_col: str, *, src: str = "doc_a", dst: str = "doc_b") -> DataFrame:
    """Ids to KEEP after exact cluster dedup: every id not in the pair graph,
    plus each component's canonical (minimum) member."""
    comp = connected_components(pairs, src=src, dst=dst)
    keep_in_graph = comp.groupBy("component").agg(F.min("node").alias(id_col)).select(id_col)
    graph_nodes = comp.select(F.col("node").alias(id_col))
    untouched = all_ids.select(id_col).join(graph_nodes, id_col, "left_anti")
    return untouched.union(keep_in_graph)


def dedup_keep_best_set(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str,
    quality_df: DataFrame,
    quality_col: str,
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Ids to KEEP after cluster dedup, canonical = HIGHEST quality.

    The near-dup counterpart of ``exact_dedup_keep_best``: within each
    connected component of the (MinHash / SimHash / semantic) pair graph,
    keep the member with the largest ``quality_col`` value (ties to the
    smallest id) instead of the arbitrary min-id member. ``quality_df``
    is any (id, quality) frame — the composite heuristic, a model score,
    a length prior. ``all_ids`` is the explicit universe, exactly as in
    :func:`dedup_keep_set` — every id outside the pair graph passes
    through, and a cluster ALWAYS keeps one member even if some (or all)
    of its nodes are missing from ``quality_df`` (missing quality sorts
    last, review r5: an inner join here silently deleted such docs).

    Plan: label propagation (O(log diameter) rounds), one left join of
    the node table against ``quality_df``, one rank window per component
    (ordering by (quality desc nulls last, id) works for ANY orderable
    id type — a max_by struct with a negated id would silently
    null-cast string ids).

    Returns (id,) — same contract as :func:`dedup_keep_set`.
    """
    comp = connected_components(pairs, src=src, dst=dst)
    scored = comp.join(
        quality_df.select(F.col(id_col).alias("node"), F.col(quality_col).alias("__q")),
        "node",
        "left",
    )
    w = Window.partitionBy("component").orderBy(
        F.col("__q").desc_nulls_last(), F.col("node").asc()
    )
    best = (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(F.col("node").alias(id_col))
    )
    graph_nodes = comp.select(F.col("node").alias(id_col))
    untouched = all_ids.select(id_col).join(graph_nodes, id_col, "left_anti")
    return untouched.union(best)
