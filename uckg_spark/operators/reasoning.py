"""RDFS-style subsumption reasoning (SURVEY.md §2.11 R2 — the optional
``sync_reasoner()`` path, `/root/reference/process/ontology_updater.py:69-74`).

The reference runs an OWL reasoner over the merged ontology; the only
triples that adds over UCKG's T-Box are SUBSUMPTION closures (SURVEY R2:
"reasoner adds only subsumption triples over a tiny T-Box; if needed
later: one multiply-style transitive-closure join loop over
rdfs:subClassOf"). This module is exactly that loop, Spark-native:

- ``transitive_closure`` — all (descendant, ancestor) pairs of a DAG of
  direct subclass edges, by semi-naive iteration (frontier ⋈ edges),
  distinct-merged per round, fixpoint by closure-size convergence.
- ``infer_types`` — the A-Box consequence: every instance typed with a
  class is also typed with every ancestor class (rdfs9 rule).

T-Boxes are small (UCKG's ontology is ~1.2k lines), so every join here
broadcasts at any corpus scale; the A-Box join in ``infer_types`` is the
only corpus-sized side and it streams against the broadcast closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_iter: int = 30,
) -> DataFrame:
    """(child, parent) direct edges → all (descendant, ancestor) pairs.

    Semi-naive: each round joins only the NEW frontier pairs against the
    base edges, unions into the accumulated closure, and stops when the
    distinct pair count stops growing (≤ depth-of-hierarchy rounds).
    Self-loops are dropped; cycles converge (a cycle's members simply
    reach every node on the cycle)."""
    base = (
        edges.select(F.col(child_col).alias("descendant"),
                     F.col(parent_col).alias("ancestor"))
        .filter(F.col("descendant") != F.col("ancestor"))
        .distinct()
        .persist()
    )
    closure = base
    frontier = base
    n = closure.count()
    for _ in range(max_iter):
        # extend the frontier one hop: (d -> a) + (a -> a2) => (d -> a2)
        hop = base.select(F.col("descendant").alias("ancestor"),
                          F.col("ancestor").alias("_a2"))
        stepped = (
            frontier.join(hop, "ancestor")
            .select("descendant", F.col("_a2").alias("ancestor"))
            .filter(F.col("descendant") != F.col("ancestor"))
        )
        new_closure = closure.unionByName(stepped).distinct().persist()
        n_new = new_closure.count()
        frontier = stepped
        if closure is not base:
            closure.unpersist()
        closure = new_closure
        if n_new == n:
            break
        n = n_new
    return closure


def infer_types(types: DataFrame, closure: DataFrame) -> DataFrame:
    """rdfs9: (x type C) + (C subClassOf* D) ⇒ (x type D). Returns the
    UNION of asserted and inferred (instance, cls) rows, deduplicated.
    ``closure`` is broadcast — the T-Box is tiny at any corpus scale."""
    inferred = (
        types.join(
            F.broadcast(closure.withColumnRenamed("descendant", "cls")),
            "cls",
        )
        .select("instance", F.col("ancestor").alias("cls"))
    )
    return types.select("instance", "cls").unionByName(inferred).distinct()
