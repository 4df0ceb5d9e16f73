"""spark-submit entrypoint: graph catalog → N-Triples text export.

  spark-submit --py-files uckg_spark.zip jobs/export_graph.py \
      --graph /data/uckg_graph --out /data/uckg_graph_nt \
      [--edges-snapshot-id ID] [--nodes-snapshot-id ID] [--partitions N]

The reference's terminal artifact is an RDF text file handed to the
graph store (Turtle → Neo4j/n10s, SURVEY §2.1 S9/S10; the RML mapper
writes ``out.ttl`` — reference ``process/shared_functions.py:84`` —
and ``process/graph_updater.py:13-21,87`` streams the .ttl into
Neo4j). This job is that sink run the distributed way: reconstruct
the triple view from the cataloged nodes/edges tables — optionally at
a time-traveled snapshot — and write one N-Triples line per triple at
full cluster width (``to_ntriples`` is a row-map; nothing here
shuffles except the optional output coalesce/repartition).

Datatype note: ``materialize_graph`` stores literal objects as plain
strings (label arrays / props value arrays), so exported literals are
plain (datatype-erased) — a property of the catalog schema, stated
here, not an exporter loss. Round-tripping the export through
``from_ntriples`` reproduces the catalog's triple view exactly
(pinned by ``tests/test_export_job.py``).
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402


def triple_view(
    spark: SparkSession,
    graph_root: str,
    edges_snapshot_id: str | None = None,
    nodes_snapshot_id: str | None = None,
) -> DataFrame:
    """The catalog's graph re-expressed as a triples DataFrame
    (subj, pred, obj, obj_is_literal, obj_datatype) — the inverse of
    ``materialize_graph``: URI-object triples from the edges table,
    rdf:type triples from node labels, literal triples from the node
    props map (each array value becomes its own triple, matching the
    n10s array-property semantics the nodes table preserves)."""
    from uckg_spark.kernel import templates as T
    from uckg_spark.sources.catalog import GraphCatalog

    cat = GraphCatalog(graph_root)
    # the layout-aware readers (NOT read_table): after appends these
    # tables span several snapshot dirs, each its own partitioned root
    edges = cat.read_edges(spark, snapshot_id=edges_snapshot_id)
    nodes = cat.read_nodes(spark, snapshot_id=nodes_snapshot_id)

    iri = edges.select(
        "subj", "pred", "obj",
        F.lit(False).alias("obj_is_literal"),
        F.lit("").alias("obj_datatype"))
    types = nodes.select(
        F.col("uri").alias("subj"),
        F.lit(T.RDF_TYPE).alias("pred"),
        F.explode("labels").alias("obj"),
        F.lit(False).alias("obj_is_literal"),
        F.lit("").alias("obj_datatype"))
    lits = (
        nodes.select("uri", F.explode("props").alias("pred", "vals"))
        .select(
            F.col("uri").alias("subj"), "pred",
            F.explode("vals").alias("obj"),
            F.lit(True).alias("obj_is_literal"),
            F.lit("").alias("obj_datatype"))
    )
    return iri.unionByName(types).unionByName(lits)


def run(
    spark: SparkSession,
    graph_root: str,
    out_path: str,
    edges_snapshot_id: str | None = None,
    nodes_snapshot_id: str | None = None,
    partitions: int | None = None,
) -> dict:
    from uckg_spark.sources.rdfio import to_ntriples

    t = triple_view(spark, graph_root, edges_snapshot_id,
                    nodes_snapshot_id)
    lines = to_ntriples(t)
    if partitions:
        lines = lines.repartition(partitions)
    from pyspark.sql import Observation
    obs = Observation("nt_export")
    lines.observe(obs, F.count(F.lit(1)).alias("n")) \
        .write.mode("overwrite").text(out_path)
    return {"out": out_path, "triples": int(obs.get["n"])}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", required=True, help="graph catalog root")
    ap.add_argument("--out", required=True, help="output N-Triples dir")
    ap.add_argument("--edges-snapshot-id", default=None)
    ap.add_argument("--nodes-snapshot-id", default=None)
    ap.add_argument("--partitions", type=int, default=None)
    args = ap.parse_args()

    from uckg_spark.session import build_session

    spark = build_session(app_name="uckg-export-graph")
    print(json.dumps(run(
        spark, args.graph, args.out,
        args.edges_snapshot_id, args.nodes_snapshot_id,
        args.partitions)))


if __name__ == "__main__":
    main()
