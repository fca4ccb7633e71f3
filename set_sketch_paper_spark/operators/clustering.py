"""Connected components on an edge DataFrame (duplicate clustering).

``connected_components`` runs min-label propagation accelerated with pointer
jumping (path doubling): each round every node takes the minimum label among
itself and its neighbors, then short-circuits through its current label's
label.  Pointer jumping makes long chains converge in O(log diameter) rounds
instead of O(diameter) — each round is a bounded number of key-partitioned
shuffles, so the whole loop is ~2·log2(d) shuffles at any scale.
``label_propagation`` is the plain O(diameter) variant kept as a simple
reference implementation for tests.

localCheckpoint(eager) truncates the iterative lineage each round; without it
Catalyst re-derives the full chain of joins every iteration and the plan
grows without bound (the classic iterative-DataFrame trap).

The reference repo has no clustering; this stage turns its pairwise joint
estimates into the cluster assignments required by the north rule
(cluster id = min member id, deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _symmetric(edges: DataFrame) -> DataFrame:
    return edges.select("id1", "id2").union(
        edges.select(F.col("id2").alias("id1"), F.col("id1").alias("id2"))
    )


def _materialize(df: DataFrame, reliable: bool) -> DataFrame:
    """Truncate iterative lineage.  ``reliable=True`` uses RDD checkpointing
    to the session's checkpoint dir (survives executor loss — on a real
    cluster localCheckpoint blocks die with their executor and the truncated
    lineage cannot be replayed); default localCheckpoint is the fast
    single-box mode."""
    if reliable:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def connected_components(
    edges: DataFrame, max_iterations: int = 40, reliable: bool = False
) -> DataFrame:
    """(id1, id2) undirected edges -> (id, cluster_id = min reachable id).

    Includes every vertex that appears in the edge list (callers union in
    isolated vertices as their own singleton clusters if needed).

    Per round: ONE neighborhood-min shuffle + ONE jump join, materialized
    once; the convergence test rides the materialized frame (the old label
    is carried as a column, so no separate old-vs-new join shuffle) and its
    filter scan reads the just-checkpointed blocks.
    """
    sym = _materialize(_symmetric_dedup(edges.select("id1", "id2")), reliable)
    labels = _materialize(
        sym.groupBy(F.col("id1").alias("id"))
        .agg(F.min("id2").alias("nmin"))
        .select("id", F.least("id", "nmin").alias("label")),
        reliable,
    )

    for _ in range(max_iterations):
        # 1) take the min label over the neighborhood
        nbr = (
            sym.join(labels.withColumnRenamed("id", "id2"), "id2")
            .groupBy(F.col("id1").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = labels.join(nbr, "id", "left").select(
            "id",
            F.col("label").alias("old_label"),
            F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
        )
        # 2) pointer jump: label <- label(label)
        jump_src = stepped.select(F.col("id").alias("jid"), F.col("label").alias("jlabel"))
        jumped = _materialize(
            stepped.join(jump_src, stepped.label == jump_src.jid, "left").select(
                "id",
                "old_label",
                F.least(F.col("label"), F.coalesce("jlabel", "label")).alias("label"),
            ),
            reliable,
        )
        labels = jumped.select("id", "label")
        if jumped.filter(F.col("label") != F.col("old_label")).isEmpty():
            break
    return labels.select("id", F.col("label").alias("cluster_id"))


def _symmetric_dedup(edges: DataFrame) -> DataFrame:
    return _symmetric(edges).dropDuplicates(["id1", "id2"])


def label_propagation(edges: DataFrame, max_iterations: int = 30) -> DataFrame:
    """Plain min-label propagation: O(diameter) rounds, used as the simple
    cross-check implementation in tests."""
    sym = _symmetric(edges).dropDuplicates(["id1", "id2"]).localCheckpoint(eager=True)
    labels = sym.select(F.col("id1").alias("id")).distinct().withColumn(
        "label", F.col("id")
    ).localCheckpoint(eager=True)

    for _ in range(max_iterations):
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "id2"), "id2")
            .groupBy(F.col("id1").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        converged = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .isEmpty()
        )
        labels = new_labels
        if converged:
            break
    return labels.select("id", F.col("label").alias("cluster_id"))
