"""Entity canonicalization: salted key-normalization + connected-components
alias merging (SURVEY.md §2.5 A2, §7 M4).

The reference canonicalizes by Neo4j's unique-URI MERGE
(/root/reference/process/graph_updater.py:30-45) — one node per URI. At
10^12 docs the graft also merges *alias clusters*: surface forms and
canonical ids form a bipartite graph whose connected components are the
true entities. Implemented as iterative min-label propagation — pure
DataFrame joins, driver loop to fixpoint (bounded by graph diameter), no
GraphFrames dependency. (The alternating large-star/small-star technique
of Kiveris et al., SoCC'14, converges in fewer rounds on high-diameter
graphs; alias graphs are shallow — star-shaped around canonical ids — so
plain propagation converges in 2-3 rounds and skips the extra shuffles.)

Determinism: the component representative is the lexicographic MIN node id,
independent of partitioning and iteration order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, max_iter: int = 25, checkpoint_every: int = 5
) -> DataFrame:
    """edges(src: string, dst: string) → (node: string, component: string).

    component = min node id in the component. Iterates min-label
    propagation until fixpoint (bounded by max_iter); each iteration is a
    shuffle on node id — salting is unnecessary because the label table is
    (node → label), one row per node, and the join key is the node id
    (unique). Giant components cost iterations (graph diameter), not
    single-reducer hotspots.
    """
    spark = edges.sparkSession
    # undirected: normalize to both directions, self-loops dropped
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    sym.persist()
    labels.persist()
    for i in range(max_iter):
        # candidate label per node = min over neighbors' labels and own
        neigh = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .select(F.col("a").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(neigh)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        new_labels.persist()
        # fixpoint check: any node whose label changed?
        changed = (
            labels.withColumnRenamed("component", "old")
            .join(new_labels, "node")
            .filter(F.col("old") != F.col("component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
        if (i + 1) % checkpoint_every == 0:
            # break the lineage chain: long iterative plans blow up the
            # optimizer; localCheckpoint materializes and truncates
            labels = labels.localCheckpoint()
    sym.unpersist()
    return labels


def canonical_map(alias_edges: DataFrame) -> DataFrame:
    """alias_edges(surface_key, canonical_id) → (member, canonical) where
    canonical = deterministic representative of the alias cluster: the
    lexicographic MIN among the cluster's real canonical ids (surface keys
    are 'surface:'-prefixed and only chosen if a component somehow contains
    no canonical id)."""
    edges = alias_edges.select(
        F.concat(F.lit("surface:"), F.col("surface_key")).alias("src"),
        F.col("canonical_id").alias("dst"),
    )
    cc = connected_components(edges)
    rep = cc.groupBy("component").agg(
        F.coalesce(
            F.min(F.when(~F.col("node").startswith("surface:"), F.col("node"))),
            F.min("node"),
        ).alias("canonical")
    )
    return (
        cc.join(rep, "component")
        .select(F.col("node").alias("member"), "canonical")
    )
