"""Benchmark driver — prints ONE JSON line.

Headline workload = the KG-construction job itself (pages → triples, the
BASELINE.md metric surface: docs/s and triples/s) + the heavier operator
queries from __spark_entry__ at $SPARK_GRAFT_SF_DIR.

Env:
  SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] cores (default 32)
  UCKG_BENCH_PAGES    synthetic KG corpus size (default 20000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("UCKG_BENCH_PAGES", "20000"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    import __spark_entry__ as entry_mod
    from uckg_spark.fixtures.pages import synthesize_pages_df
    from uckg_spark.plans.kg_pipeline import KgDims, build_triples
    from uckg_spark.session import build_session

    spark = build_session(
        app_name="uckg-bench",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM + parquet footers
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    timings: dict[str, float] = {}

    # --- KG construction headline (Common-Crawl-realistic ~10KB pages,
    # synthesized on executors, persisted before the timed section) ---
    filler = int(os.environ.get("UCKG_BENCH_FILLER", "50"))
    pdf = synthesize_pages_df(
        spark, n_pages, filler_paras=filler, partitions=cpus * 4
    ).persist()
    n_docs = pdf.count()  # materialize outside the timed section
    dims = KgDims(spark)
    # best-of-2: the single-sample headline is exposed to shared-host noise
    # windows (observed 16.8 s vs 47.2 s for identical code minutes apart);
    # the min is the steady-state capability
    kg_walls = []
    for _ in range(2):
        # drop the previous rep's mention/kind caches (plan-identical
        # DataFrames would cache-hit and make rep 2 a no-op), then restore
        # the pages cache OUTSIDE the timed section
        spark.catalog.clearCache()
        pdf.persist()
        pdf.count()
        t0 = time.time()
        n_triples = build_triples(
            spark, pdf, dims, mention_partitions=cpus).count()
        kg_walls.append(time.time() - t0)
    kg_sec = min(kg_walls)
    timings["kg_pipeline"] = round(kg_sec, 3)
    # both rep walls ride in the artifact so cross-round comparisons can
    # see the spread (rep 2 benefits from JIT/page-cache warmth the
    # clearCache() cannot drop) — protocol FROZEN as of round 4:
    # best-of-2 for kg_pipeline and for every query in BENCH_REPS2
    reps: dict[str, list[float]] = {"kg_pipeline": [round(w, 3) for w in kg_walls]}

    # --- operator queries at sf_dir ---
    bench_queries = [
        "explode_tokens", "broadcast_lookup_join", "inner_fk_join",
        "window_dedup", "salted_agg", "event_window", "group_concat",
        "dedup_exact", "dedup_minhash", "dedup_simhash", "ngram_jaccard",
        "ann_cosine_topk", "ann_ivf_topk", "ann_lsh_bucket",
        "minhash_lsh_pairs", "simhash_duplicates", "simhash_near_dup",
        "connected_components",
        "knn_join_pandas", "lang_id", "quality",
        "token_count", "fingerprint",
        # webtext/corpus curation family (added round 4 — new keys, so the
        # frozen per-query protocol and prior-round totals stay comparable
        # on the shared keys; BENCH.md reports both totals)
        "repetition", "dup_shingles", "dedup_span_apply",
        "url_normalize", "stratified_sample", "pack_sequences",
        "vocab_top", "encode_docs", "kg_pattern_2hop", "kg_degree",
        "training_chunks", "kg_pagerank", "contamination",
        "asof_join", "range_join", "curated_corpus", "kg_snapshot_diff",
        # round-4 late additions: graph analytics + cardinality sketch
        "kg_reachability", "kg_triangles", "approx_distinct_kmv",
        "kg_kcore", "doc_quantiles", "cooccur_lift", "sales_rollup",
        "event_funnel", "doc_outliers", "dataset_split",
        "table_checksum", "kg_communities", "bm25_topk", "doc_histogram",
        "inverted_index", "similarity_join", "event_pivot",
        "rolling_counts", "kg_pagerank_seeded", "event_transitions", "fuzzy_name_pairs", "zorder_keys", "kg_query_text", "table_stats", "er_canonical_names",
        # round-4 resume-2 additions
        "containment_pairs", "winnow_fingerprint", "salted_join",
        "embed_project", "gap_fill", "quality_fit", "kg_link_predict",
        "group_sample_k", "pii_scrub", "equi_depth", "scd2_history",
        "bloom_semi", "weighted_quantile", "interval_concurrency",
        "kge_negatives", "doc_chunks", "heavy_hitters", "rank_normalize",
        "pareto_front", "label_spread", "auc", "incremental_pairs",
        "period_over_period", "confusion", "kg_hits", "mad_outliers",
        "kg_struct_groups", "grouped_corr", "source_overlap",
        "kg_struct_pairs", "spike_days", "contingency", "retention",
        "token_cooccur", "pair_audit", "kmv_union", "rdf_roundtrip",
        "resize_images",
        # round-4 resume-5 additions
        "catalog_mor", "catalog_changelog", "catalog_evolution",
        "catalog_tag",
        # round-5 additions
        "label_spread_bucketed", "catalog_prune", "video_metadata",
        "audio_metadata", "dedup_paragraphs", "semantic_dedup",
    ]
    # queries whose r3 wall was ≥~1.5 s run twice (recorded spread, min
    # kept): shared-host noise windows produce 1.5-3x swings on identical
    # code, and a single sample cannot distinguish noise from regression.
    # dedup_minhash is deliberately ABSENT: it populates the shared
    # persisted signature table (by design — minhash_lsh_pairs reuses it),
    # so its rep 2 would measure a cache hit, not the query.
    reps2 = {"dedup_simhash", "simhash_duplicates",
             "ann_ivf_topk", "connected_components", "dedup_minhash_xxh",
             "simhash_near_dup", "lang_id",
             # round-4 keys whose steady walls are >=~1.5 s (same frozen
             # protocol criterion as the set above)
             "repetition", "dup_shingles", "dedup_span_apply",
             "encode_docs", "kg_pattern_2hop", "kg_degree",
             "training_chunks", "kg_pagerank", "contamination",
             "kg_reachability", "kg_triangles", "approx_distinct_kmv",
             "kg_kcore", "cooccur_lift", "kg_communities",
             "similarity_join", "kg_pagerank_seeded",
             "containment_pairs", "winnow_fingerprint", "salted_join",
             "kg_link_predict", "heavy_hitters", "kge_negatives",
             "bloom_semi", "weighted_quantile", "kg_hits",
             # resume-4: late-round keys whose measured steady walls
             # crossed the same >=~1.5 s criterion
             "kg_struct_pairs", "incremental_pairs", "token_cooccur",
             "pair_audit",
             # resume-5: the catalog rows stage a temp catalog (3-4
             # write commits) before the read — write-dominated, >=1.5 s
             "catalog_mor", "catalog_changelog", "catalog_evolution",
             "catalog_tag",
             # round-5 keys with >=1.5 s steady walls
             "label_spread_bucketed", "catalog_prune"}

    def timed(name: str, run) -> None:
        walls = []
        for _ in range(2 if name in reps2 else 1):
            t0 = time.time()
            run()
            walls.append(round(time.time() - t0, 3))
        timings[name] = min(walls)
        if len(walls) > 1:
            reps[name] = walls

    qs = entry_mod.queries()
    for name in bench_queries:
        timed(name, lambda: qs[name](spark, sf_dir)
              .write.format("noop").mode("overwrite").save())

    # production fast-hash path (xxhash64 minhash — not oracle-portable,
    # so it's benched directly rather than through a driver query)
    from uckg_spark.operators.dedup import minhash_signatures

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    timed("dedup_minhash_xxh",
          lambda: minhash_signatures(docs, num_hashes=4, n=3, hasher="xxhash64")
          .write.format("noop").mode("overwrite").save())

    total = round(sum(timings.values()), 3)
    full = {
        "metric": "uckg_kg_construct_and_operators_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "reps": reps,
        "sf": sf,
        "kg_docs": n_docs,
        "kg_triples": n_triples,
        "kg_docs_per_sec": round(n_docs / kg_sec, 1),
        "kg_triples_per_sec": round(n_triples / kg_sec, 1),
        "cpus": cpus,
    }
    # Full object (all ~109 per-query walls + per-rep spreads) goes to a
    # side file: round 4's single 108-key line outgrew the driver's tail
    # capture and BENCH_r04.json recorded "parsed": null.
    side = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_FULL.json")
    try:
        with open(side, "w") as fh:
            json.dump(full, fh, indent=1)
            fh.write("\n")
    except OSError:
        pass  # read-only checkout: the stdout lines still carry everything
    print(json.dumps(full))
    # Compact headline line LAST (the driver keeps the tail of stdout):
    # totals + the r1-r3 shared comparison keys only, guaranteed to fit.
    shared = [
        "kg_pipeline", "explode_tokens", "broadcast_lookup_join",
        "inner_fk_join", "window_dedup", "salted_agg", "event_window",
        "group_concat", "dedup_exact", "dedup_minhash", "dedup_simhash",
        "ngram_jaccard", "ann_cosine_topk", "ann_ivf_topk", "ann_lsh_bucket",
        "minhash_lsh_pairs", "simhash_duplicates", "simhash_near_dup",
        "connected_components", "knn_join_pandas", "lang_id", "quality",
        "token_count", "fingerprint", "dedup_minhash_xxh",
    ]
    print(json.dumps({
        "metric": "uckg_kg_construct_and_operators_total",
        "value": total,
        "unit": "sec",
        "queries": {k: timings[k] for k in shared if k in timings},
        "sf": sf,
        "kg_docs": n_docs,
        "kg_triples": n_triples,
        "kg_docs_per_sec": round(n_docs / kg_sec, 1),
        "kg_triples_per_sec": round(n_triples / kg_sec, 1),
        "cpus": cpus,
        "n_queries_total": len(timings),
        "full_artifact": "BENCH_FULL.json",
    }))


if __name__ == "__main__":
    main()
