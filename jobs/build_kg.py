"""spark-submit entrypoint: pages table → KG nodes/edges tables.

  spark-submit --py-files uckg_spark.zip jobs/build_kg.py \
      --pages /data/pages_parquet --out /data/uckg_graph \
      [--resume-root /data/uckg_stages] [--n-groups 64]

With --resume-root, the extract+mention stage runs through the lineage
layer (partition-group micro-batches, idempotent re-run — SURVEY.md §2.10
I1/I5); without it, the job runs as one straight pipeline.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="pages parquet/Iceberg path")
    ap.add_argument("--out", required=True, help="output graph catalog root")
    ap.add_argument("--resume-root", default=None, help="lineage/stage root")
    ap.add_argument("--n-groups", type=int, default=64)
    ap.add_argument("--mention-partitions", type=int, default=None)
    args = ap.parse_args()

    from uckg_spark.plans.kg_pipeline import KgDims, build_triples, materialize_graph
    from uckg_spark.session import build_session
    from uckg_spark.sources.catalog import GraphCatalog
    from uckg_spark.sources.pages import read_pages

    spark = build_session(app_name="uckg-build-kg")
    pages = read_pages(spark, args.pages)
    dims = KgDims(spark)

    if args.resume_root:
        from uckg_spark.lineage import run_stage_with_resume
        from uckg_spark.operators.extract import extract_pages

        # stage 1 runs under lineage; a killed run resumes group-by-group
        extracted = run_stage_with_resume(
            spark, pages, "extract", extract_pages, args.resume_root,
            n_groups=args.n_groups,
        )
        # downstream consumes the durable stage output re-joined to pages
        pages = pages.join(extracted.select("url"), "url", "leftsemi")

    t0 = time.time()
    triples = build_triples(spark, pages, dims,
                            mention_partitions=args.mention_partitions)
    nodes, edges = materialize_graph(triples)
    cat = GraphCatalog(args.out)
    edge_snap = cat.write_edges(edges)
    node_snap = cat.write_nodes(nodes)
    print(json.dumps({
        "edges_snapshot": edge_snap,
        "nodes_snapshot": node_snap,
        "wall_s": round(time.time() - t0, 1),
        "edges": cat.latest_snapshot("edges")["rows"],
        "nodes": cat.latest_snapshot("nodes")["rows"],
    }))


if __name__ == "__main__":
    main()
