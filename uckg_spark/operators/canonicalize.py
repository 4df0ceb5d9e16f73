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
    edges: DataFrame, max_iter: int = 25, checkpoint_every: int = 3
) -> DataFrame:
    """edges(src: string, dst: string) → (node: string, component: string).

    component = min node id in the component. Iterates min-label
    propagation until fixpoint (bounded by max_iter); each iteration is a
    shuffle on node id — salting is unnecessary because the label table is
    (node → label), one row per node, and the join key is the node id
    (unique). Giant components cost iterations (graph diameter), not
    single-reducer hotspots.
    """
    import uuid

    from pyspark.sql import Observation

    spark = edges.sparkSession
    # undirected + both directions from ONE scan of the (possibly
    # expensive) edge input: explode 2 structs per edge instead of a
    # two-branch union that scans the upstream plan twice
    sym = (
        edges.select(
            F.explode(F.array(
                F.struct(F.col("src").alias("a"), F.col("dst").alias("b")),
                F.struct(F.col("dst").alias("a"), F.col("src").alias("b")),
            )).alias("e")
        )
        .select("e.a", "e.b")
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    n_edges = sym.count()
    # size the loop's shuffle width to the LABEL data, not the session
    # default: each iteration shuffles only (node, label) rows, and at
    # bench scale a 32-wide shuffle is pure task-dispatch overhead
    # (measured ~2× per-iteration). ~1M edges/partition keeps partitions
    # comfortably in memory at any scale.
    loop_parts = max(1, n_edges // 1_000_000)
    sp0 = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    try:
        labels = (
            sym.select(F.col("a").alias("node"))
            .distinct()
            .withColumn("component", F.col("node"))
            .persist()
        )
        for i in range(max_iter):
            # candidate label per node = min over neighbors' labels and own.
            # The fixpoint check rides the SAME job: each node's old label
            # is recovered inside the aggregate (min over its single own
            # row) and an Observation sums label changes as rows stream
            # out — ONE action per iteration, no separate old-vs-new
            # join/count job (which previously doubled per-iteration job
            # overhead, the dominant cost of this driver-looped operator).
            neigh = (
                sym.join(labels.withColumnRenamed("node", "b"), "b")
                .select(F.col("a").alias("node"), "component")
            )
            cand = (
                labels.withColumn("_own", F.lit(True))
                .unionByName(neigh.withColumn("_own", F.lit(False)))
            )
            agg = cand.groupBy("node").agg(
                F.min("component").alias("component"),
                F.min(F.when(F.col("_own"), F.col("component"))).alias("_old"),
            )
            obs = Observation(f"cc_changed_{uuid.uuid4().hex[:8]}")
            new_labels = (
                agg.observe(
                    obs,
                    F.sum((F.col("component") != F.col("_old")).cast("long"))
                    .alias("changed"),
                )
                .drop("_old")
                .persist()
            )
            new_labels.count()  # the iteration's ONLY action: fills the
            labels.unpersist()  # cache + populates the changed count
            labels = new_labels
            if int(obs.get["changed"] or 0) == 0:
                break
            if (i + 1) % checkpoint_every == 0:
                # break the lineage chain: each iteration's logical plan
                # nests all previous ones, and Catalyst re-optimizes the
                # whole stack every round (measured: per-iteration wall
                # grows 1 s → 3 s by iteration 4 without truncation).
                # localCheckpoint is safe here even on a multi-executor
                # cluster: losing a block only loses intermediate labels,
                # and re-running the operator is idempotent.
                labels = labels.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", sp0)
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
