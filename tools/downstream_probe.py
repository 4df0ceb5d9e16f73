"""One-off diagnostic: where does the flat ~16s downstream cost go?

Runs the post-scan emission phase at 8 cores on a small corpus under
config variants. Usage: python tools/downstream_probe.py [variant...]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

n_pages = 20000
corpus = f"/tmp/uckg_scale_corpus_{n_pages}"

VARIANTS = sys.argv[1:] or ["base", "noaqe", "coalesce1", "noaqe+coalesce1"]


def run(variant: str) -> dict:
    from uckg_spark.fixtures.pages import synthesize_pages_df
    from uckg_spark.plans.kg_pipeline import KgDims, build_triples, linked_mentions
    from uckg_spark.session import build_session
    from uckg_spark.sources.pages import read_pages

    extra = {"spark.ui.showConsoleProgress": "false"}
    if "noaqe" in variant:
        extra["spark.sql.adaptive.enabled"] = "false"
    spark = build_session(app_name=f"dsprobe-{variant}", master="local[8]",
                          extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        synthesize_pages_df(spark, n_pages, filler_paras=50, partitions=32) \
            .write.mode("overwrite").parquet(corpus)
    dims = KgDims(spark)
    pages = read_pages(spark, corpus)
    mp = 1 if "coalesce1" in variant else 8
    # warm-up full pipeline once (JIT, codegen caches)
    build_triples(spark, pages.limit(1000), dims, mention_partitions=mp).count()
    spark.catalog.clearCache()
    t0 = time.time()
    m = linked_mentions(spark, pages, dims, mention_partitions=mp)
    t_scan = time.time() - t0
    t1 = time.time()
    n_t = build_triples(spark, pages, dims, mentions=m).count()
    t_down = time.time() - t1
    # second downstream run over the same cached mentions: re-plans and
    # re-executes — the delta vs the first isolates one-time JIT/codegen
    t2 = time.time()
    build_triples(spark, pages, dims, mentions=m).count()
    t_down2 = time.time() - t2
    r = {"variant": variant, "t_scan_s": round(t_scan, 2),
         "t_downstream_s": round(t_down, 2),
         "t_downstream2_s": round(t_down2, 2), "triples": n_t}
    spark.stop()
    return r


for v in VARIANTS:
    print(json.dumps(run(v)), flush=True)
