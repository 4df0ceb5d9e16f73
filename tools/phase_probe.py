"""One-off diagnostic: phase breakdown of the KG pipeline at a given core
count — scan/materialize vs downstream emission — to locate the
core-count-independent wall component that caps strong scaling.

Usage: python tools/phase_probe.py <cores> [n_pages]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

cores = int(sys.argv[1])
n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 360000
corpus = f"/tmp/uckg_scale_corpus_{n_pages}"


def main():
    from uckg_spark.fixtures.pages import synthesize_pages_df
    from uckg_spark.plans.kg_pipeline import KgDims, build_triples, linked_mentions
    from uckg_spark.session import build_session
    from uckg_spark.sources.pages import read_pages

    spark = build_session(
        app_name=f"probe-{cores}", master=f"local[{cores}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        synthesize_pages_df(spark, n_pages, filler_paras=50, partitions=64) \
            .write.mode("overwrite").parquet(corpus)
    dims = KgDims(spark)
    # warm-up on a slice
    build_triples(spark, read_pages(spark, corpus).limit(2000), dims,
                  mention_partitions=cores).count()
    spark.catalog.clearCache()

    pages = read_pages(spark, corpus)
    t0 = time.time()
    m = linked_mentions(spark, pages, dims, mention_partitions=cores)
    t_scan = time.time() - t0  # persist+count barrier inside
    n_m = m["mentions"].count()
    t1 = time.time()
    full = build_triples(spark, pages, dims, mentions=m)
    n_t = full.count()
    t_rest = time.time() - t1
    print(json.dumps({
        "cores": cores, "n_pages": n_pages, "t_scan_s": round(t_scan, 2),
        "t_downstream_s": round(t_rest, 2), "mentions": n_m, "triples": n_t,
    }))


main()
