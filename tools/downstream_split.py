"""Split the flat downstream cost: DataFrame construction (py4j) vs
Catalyst analyze/optimize vs physical execution."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

n_pages = 20000
corpus = f"/tmp/uckg_scale_corpus_{n_pages}"

from uckg_spark.plans.kg_pipeline import KgDims, build_triples, linked_mentions  # noqa: E402
from uckg_spark.session import build_session  # noqa: E402
from uckg_spark.sources.pages import read_pages  # noqa: E402

spark = build_session(app_name="dssplit", master="local[8]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
dims = KgDims(spark)
pages = read_pages(spark, corpus)
build_triples(spark, pages.limit(1000), dims, mention_partitions=8).count()
spark.catalog.clearCache()
m = linked_mentions(spark, pages, dims, mention_partitions=8)

for rep in range(2):
    t0 = time.time()
    df = build_triples(spark, pages, dims, mentions=m)
    t_construct = time.time() - t0
    t1 = time.time()
    df._jdf.queryExecution().optimizedPlan()
    t_optimize = time.time() - t1
    t2 = time.time()
    n = df.count()
    t_exec = time.time() - t2
    print(json.dumps({
        "rep": rep, "t_construct_s": round(t_construct, 2),
        "t_optimize_s": round(t_optimize, 2),
        "t_exec_s": round(t_exec, 2), "triples": n,
    }), flush=True)
