"""Connected components over pair edges — the cluster step of dedup.

MinHash/SimHash emit near-duplicate PAIRS; an actual deduplicated corpus
needs CLUSTERS (every doc labeled with a canonical representative, e.g.
the min id reachable through any chain of pairs). That is connected
components, an iterative algorithm Spark has no builtin for.

The implementation is hash-to-min label propagation: every node starts
labeled with its own id; each round, a node's label becomes the min of
its own and its neighbors' labels; stop when no label changes. Rounds
needed = graph diameter — for dedup graphs (near-cliques around a
template) that is 2-3, not log n. Each round is one shuffle on node id;
`localCheckpoint` truncates the growing lineage so round N's plan does
not replay rounds 1..N-1 (the classic iterative-DataFrame trap at
scale).

This replaces nothing in the reference (it has no joins at all —
SURVEY §2.1); it is part of the beyond-reference training-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """Label every node in ``edges`` with the min node id of its
    component. Returns (node, component).

    Nodes are whatever appears in ``src``/``dst``; isolated docs (no
    pair) are not emitted — callers left-join and coalesce to the doc's
    own id (see :func:`dedup_clusters`).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    # undirected: propagate both ways each round
    adj = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    adj = adj.localCheckpoint(eager=True)

    labels = (
        adj.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        neighbor_min = (
            adj.join(labels, adj["d"] == labels["node"])
            .groupBy(F.col("s").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", "component")


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    *,
    src: str = "a_id",
    dst: str = "b_id",
    broadcast_threshold: int | None = 5_000_000,
) -> DataFrame:
    """Assign every document a cluster id (min doc id of its
    near-duplicate component; singletons cluster with themselves) and a
    keep flag (True on the canonical representative).

    The components frame is O(docs that appear in some near-dup pair) —
    NOT an invariantly tiny set: at web-crawl dup rates (30-50%) it is a
    large fraction of the corpus, and force-broadcasting it would OOM the
    driver. So the broadcast hint is applied only when the component
    count (a cheap count over an already-checkpointed frame) is under
    ``broadcast_threshold`` rows (~2 longs/row → tens of MB); otherwise
    the join is left to AQE, which picks shuffled-hash/sort-merge on the
    (id, component) pairs — still only 16 bytes/row of shuffle.
    Pass ``broadcast_threshold=None`` to always defer to AQE.
    """
    comp = connected_components(pairs, src, dst).withColumnRenamed("node", id_col)
    if broadcast_threshold is not None:
        # comp is localCheckpoint'ed by connected_components, so this
        # count reuses materialized blocks rather than recomputing.
        if comp.count() <= broadcast_threshold:
            comp = F.broadcast(comp)
    out = (
        docs.join(comp, id_col, "left")
        .withColumn("cluster_id", F.coalesce("component", F.col(id_col)))
        .drop("component")
    )
    return out.withColumn("keep", F.col(id_col) == F.col("cluster_id"))
