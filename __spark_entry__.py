"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the operator inventory of SURVEY.md §2 mapped onto
the driver's TPC-H-ish tables, plus the training-data pipeline operators
(dedup / similarity / text-analysis) from uckg_spark.operators. Each query
has a DuckDB ``oracle_sql()`` twin with IDENTICAL column names; computed
numerics are rounded on both sides to keep float noise out of the driver's
value hash.

Engine-portable hash used throughout (Spark ⇄ DuckDB):
    h32(s) = int(md5(s)[:8], 16)
    Spark : conv(substring(md5(s),1,8),16,10)::bigint
    DuckDB: ('0x' || substr(md5(s),1,8))::BIGINT
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# queries() callables import uckg_spark lazily; make that work no matter
# where the harness's cwd is when it loads this module by path
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SF_DEFAULT = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


# schema cache per (dir, table): every query re-opening a table paid a
# fresh footer schema inference (~7 ms vs ~1 ms with an explicit schema —
# ~200 _t calls across the query surface). Metadata only: the DATA is
# read from parquet on every execution, nothing about results is cached.
_T_SCHEMAS: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    sch = _T_SCHEMAS.get(path)
    if sch is None:
        df = spark.read.parquet(path)
        _T_SCHEMAS[path] = df.schema
        return df
    return spark.read.schema(sch).parquet(path)


N_MINHASH = 4
SHINGLE_N = 3
SIMHASH_BITS = 16
SIMHASH_K = 2  # simhash_near_dup hamming radius (k+1 banding chunks)
# simhash_near_dup uses 32-bit fingerprints: at 16 bits a 5k-doc corpus
# packs ~150 docs per banding chunk value and the candidate join
# quadratizes (measured 3.4 s at sf0.1); 32 bits ≈ production density
SIMHASH_ND_BITS = 32
# IVF refinement samples 1 row in 4 (vec_id % 4 = 0) — deterministic,
# oracle-reproducible; full-corpus refinement doubled ann_ivf_topk's wall
IVF_SAMPLE_MOD = 4
N_PLANES = 6
EMB_DIM = 64
FP_MOD = (1 << 61) - 1


def _h32_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


# ---------------------------------------------------------------------------
# entry — flagship query (driver smoke check at sf0.001)
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: revenue by region/returnflag via a 5-table join chain with
    a window-deduped 'latest order per customer' stage — exercises
    broadcast joins, window dedup (A3), agg, and sort in one plan."""
    sf = SF_DEFAULT
    lineitem, orders, customer = (
        _t(spark, sf, "lineitem"), _t(spark, sf, "orders"), _t(spark, sf, "customer"),
    )
    nation, region = _t(spark, sf, "nation"), _t(spark, sf, "region")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    latest = (
        orders.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return (
        lineitem.join(latest, lineitem.l_orderkey == latest.o_orderkey)
        .join(customer, latest.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "l_returnflag")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("r_name", "l_returnflag")
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- relational operator inventory (SURVEY.md §2) ----

    def q_explode_tokens(spark, sf):  # E1-E9 explode/flatten
        docs = _t(spark, sf, "documents")
        return (
            docs.select(F.explode(F.split("text", " ")).alias("token"))
            .filter(F.col("token") != "")
            .groupBy("token")
            .agg(F.count("*").alias("n"))
        )
    q["explode_tokens"] = q_explode_tokens

    def q_broadcast_lookup_join(spark, sf):  # J1/S7 dictionary lookup
        li, part = _t(spark, sf, "lineitem"), _t(spark, sf, "part")
        return (
            li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left")
            .withColumn("dictionary_found", part.p_partkey.isNotNull())
            .groupBy("dictionary_found", "p_brand")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        )
    q["broadcast_lookup_join"] = q_broadcast_lookup_join

    def q_semi_join(spark, sf):  # P6/J2 membership
        cust, orders = _t(spark, sf, "customer"), _t(spark, sf, "orders")
        return (
            cust.join(orders, cust.c_custkey == orders.o_custkey, "leftsemi")
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_customers"))
        )
    q["semi_join"] = q_semi_join

    def q_anti_join(spark, sf):  # A7 except/anti consistency check
        # "customers with no high-value order" — the plain FK anti-join is
        # empty by generator construction (every custkey is referenced), so
        # filter the right side first to get real survivors (202 at sf0.01)
        cust, orders = _t(spark, sf, "customer"), _t(spark, sf, "orders")
        big = orders.filter(F.col("o_totalprice") > 400000)
        return (
            cust.join(big, cust.c_custkey == big.o_custkey, "leftanti")
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_customers"))
        )
    q["anti_join"] = q_anti_join

    def q_inner_fk_join(spark, sf):  # J4 FK-validating inner join
        orders, cust, nation = (
            _t(spark, sf, "orders"), _t(spark, sf, "customer"), _t(spark, sf, "nation"),
        )
        return (
            orders.join(cust, orders.o_custkey == cust.c_custkey, "inner")
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("n_name")
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("total"))
        )
    q["inner_fk_join"] = q_inner_fk_join

    def q_self_join(spark, sf):  # J3 self equi-join
        nation = _t(spark, sf, "nation")
        a, b = nation.alias("a"), nation.alias("b")
        return (
            a.join(b, (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
                   & (F.col("a.n_nationkey") < F.col("b.n_nationkey")))
            .select(F.col("a.n_name").alias("nation_a"),
                    F.col("b.n_name").alias("nation_b"))
        )
    q["self_join"] = q_self_join

    def q_window_dedup(spark, sf):  # A3 deterministic upsert
        ev = _t(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc())
        return (
            ev.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("user_id", "event_id", "event_type",
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"))
        )
    q["window_dedup"] = q_window_dedup

    def q_global_dedup(spark, sf):  # A1 distinct-set semantics
        ev = _t(spark, sf, "events")
        return (
            ev.select("user_id", "event_type").distinct()
            .groupBy("event_type")
            .agg(F.count("*").alias("n_users"))
        )
    q["global_dedup"] = q_global_dedup

    def q_union_dedup(spark, sf):  # U1/U2 union across sources
        cust, supp = _t(spark, sf, "customer"), _t(spark, sf, "supplier")
        u = cust.select(F.col("c_name").alias("name")).unionByName(
            supp.select(F.col("s_name").alias("name")))
        return (
            u.distinct()
            .select(F.substring("name", 1, 1).alias("initial"))
            .groupBy("initial")
            .agg(F.count("*").alias("n"))
        )
    q["union_dedup"] = q_union_dedup

    def q_group_concat(spark, sf):  # A6 group-concat, deterministic order
        nation, region = _t(spark, sf, "nation"), _t(spark, sf, "region")
        return (
            nation.join(F.broadcast(region),
                        nation.n_regionkey == region.r_regionkey)
            .groupBy("r_name")
            .agg(F.array_join(F.sort_array(F.collect_list("n_name")), "|").alias("nations"))
        )
    q["group_concat"] = q_group_concat

    def q_uri_template(spark, sf):  # F1/F4 URI templating
        orders = _t(spark, sf, "orders")
        return orders.filter(F.col("o_orderkey") < 200).select(
            "o_orderkey",
            F.concat(F.lit("http://purl.org/cyber/uco#ORDER-"),
                     F.col("o_orderkey")).alias("uri"),
        )
    q["uri_template"] = q_uri_template

    def q_datetime_format(spark, sf):  # F2 millisecond truncation
        ev = _t(spark, sf, "events")
        return ev.filter(F.col("event_id") < 500).select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSS").alias("ts_iso"),
        )
    q["datetime_format"] = q_datetime_format

    def q_null_drop(spark, sf):  # P7 null ⇒ no row
        ev = _t(spark, sf, "events")
        return (
            ev.withColumn("et", F.nullif(F.col("event_type"), F.lit("view")))
            .filter(F.col("et").isNotNull())
            .groupBy("et")
            .agg(F.count("*").alias("n"))
        )
    q["null_drop"] = q_null_drop

    def q_first_element(spark, sf):  # P9 first-match-only
        docs = _t(spark, sf, "documents")
        return (
            docs.select(F.get(F.split("text", " "), 0).alias("first_token"))
            .groupBy("first_token")
            .agg(F.count("*").alias("n"))
        )
    q["first_element"] = q_first_element

    def q_sha256(spark, sf):  # F9 content hashing
        docs = _t(spark, sf, "documents")
        return docs.filter(F.col("doc_id") < 100).select(
            "doc_id", F.sha2(F.col("text"), 256).alias("digest"))
    q["sha256"] = q_sha256

    def q_topk(spark, sf):  # TakeOrdered physical op
        orders = _t(spark, sf, "orders")
        return (
            orders.select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
            .orderBy(F.col("price").desc(), F.col("o_orderkey"))
            .limit(10)
        )
    q["topk"] = q_topk

    def q_salted_agg(spark, sf):  # A2 salted two-phase aggregation
        from uckg_spark.operators.skew import salted_agg

        ev = _t(spark, sf, "events").withColumn("url", F.col("event_id").cast("string"))
        return salted_agg(
            ev, ["user_id"],
            [F.count("*").alias("c"), F.sum("value").alias("s")],
            [F.sum("c").alias("n_events"), F.round(F.sum("s"), 2).alias("sum_value")],
            unique_col="url",
        )
    q["salted_agg"] = q_salted_agg

    def q_salted_distinct(spark, sf):
        """Two-phase distinct for skewed keys: partial dedup on
        (keys, salt) shrinks a hot key's shuffle traffic n_salt× before
        the final exact dedup."""
        from uckg_spark.operators.skew import salted_distinct

        ev = _t(spark, sf, "events")
        return salted_distinct(ev, ["user_id", "event_type"])
    q["salted_distinct"] = q_salted_distinct

    def q_event_window(spark, sf):  # event-time tumbling window (streaming analog)
        ev = _t(spark, sf, "events")
        return (
            ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                    "event_type", "n")
        )
    q["event_window"] = q_event_window

    def q_json_props(spark, sf):  # F8 JSON decode
        ev = _t(spark, sf, "events")
        return (
            ev.select(F.get_json_object("props", "$.k").cast("int").alias("k"))
            .groupBy("k").agg(F.count("*").alias("n"))
        )
    q["json_props"] = q_json_props

    # ---- training-data pipeline operators ----

    def q_dedup_exact(spark, sf):
        docs = _t(spark, sf, "documents")
        return (
            docs.select(F.md5(F.col("text")).alias("digest"), "doc_id")
            .groupBy("digest")
            .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n"))
        )
    q["dedup_exact"] = q_dedup_exact

    def _shared_sigs(spark, sf):
        """The MinHash signature table, persisted: dedup_minhash and
        minhash_lsh_pairs both consume it, and Spark's cache-by-plan
        matching makes the SECOND query's identical persist() a cache hit —
        signatures are computed once per session, exactly as a real
        pipeline materializes one signature stage for all consumers."""
        from uckg_spark.operators.dedup import minhash_signatures

        docs = _t(spark, sf, "documents")
        return minhash_signatures(docs, num_hashes=N_MINHASH, n=SHINGLE_N).persist()

    def q_dedup_minhash(spark, sf):
        sigs = _shared_sigs(spark, sf)
        return sigs.select(
            "doc_id", *[F.element_at("sig", i + 1).alias(f"mh{i}") for i in range(N_MINHASH)]
        )
    q["dedup_minhash"] = q_dedup_minhash

    def q_dedup_simhash(spark, sf):
        from uckg_spark.operators.dedup import simhash

        docs = _t(spark, sf, "documents")
        return simhash(docs, bits=SIMHASH_BITS)
    q["dedup_simhash"] = q_dedup_simhash

    def q_ngram_jaccard(spark, sf):
        from uckg_spark.operators.dedup import ngram_jaccard_pairs

        docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
        pairs = ngram_jaccard_pairs(docs, n=SHINGLE_N, threshold=0.2)
        return pairs.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    q["ngram_jaccard"] = q_ngram_jaccard

    def q_ann_cosine_topk(spark, sf):
        emb = _t(spark, sf, "embeddings")
        qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
        from uckg_spark.operators.similarity import brute_force_topk

        return brute_force_topk(emb, [float(x) for x in qrow], k=10)
    q["ann_cosine_topk"] = q_ann_cosine_topk

    def q_ann_ivf_topk(spark, sf):
        """IVF ANN: 16 deterministic HASH-STRATIFIED coarse seeds
        (min-(h32(id), id) rows — content-blind, so id-order skew can't
        collapse the seed spread the way first-n-ids did) refined by ONE
        deterministic k-means pass (fixed-point sums — order-independent,
        so the oracle reproduces the refined centroids bit-for-bit),
        probe the 4 nearest cells, exact cosine top-10 inside them.
        Assignment is shuffle-free column algebra (centroid matrix as
        plan literals). Refinement runs over the deterministic 1/4
        id-stratified sample (vec_id % 4 = 0): centroid means are
        statistics, and the sample cuts the extra refinement scan 4× —
        measured, refinement had doubled this query's wall time."""
        from uckg_spark.operators.similarity import (
            ivf_centroids_hashed, ivf_refine_centroids, ivf_topk)

        emb = _t(spark, sf, "embeddings")
        qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
        cents = ivf_refine_centroids(
            emb, ivf_centroids_hashed(emb, 16), iters=1,
            sample_mod=IVF_SAMPLE_MOD)
        return ivf_topk(emb, [float(x) for x in qrow],
                        n_probe=4, k=10, centroids=cents)
    q["ann_ivf_topk"] = q_ann_ivf_topk

    def q_ann_lsh_bucket(spark, sf):
        from uckg_spark.operators.similarity import hyperplane_signature

        emb = _t(spark, sf, "embeddings")
        vec_d = F.col("embedding").cast("array<double>")
        return emb.select(
            "vec_id",
            hyperplane_signature(vec_d, EMB_DIM, N_PLANES).alias("bucket"),
        )
    q["ann_lsh_bucket"] = q_ann_lsh_bucket

    def q_embed_near_dup(spark, sf):
        # embedding-cosine near-duplicates via hyperplane-LSH buckets,
        # verified by exact cosine (the scale path: pairs only form inside
        # a bucket)
        from uckg_spark.operators.similarity import lsh_bucketed_pairs

        emb = _t(spark, sf, "embeddings")
        # 0.35 yields 16 pairs at sf0.01 / 256 at sf0.1 — a non-vacuous
        # answer (the round-1 0.55 threshold matched on 0 rows both sides)
        pairs = lsh_bucketed_pairs(emb, dim=EMB_DIM, n_planes=N_PLANES,
                                   threshold=0.35)
        return pairs.select("id_a", "id_b", "cos_sim")
    q["embed_near_dup"] = q_embed_near_dup

    def q_minhash_lsh_pairs(spark, sf):
        # banded LSH candidate pairs (the 10^12-scale dedup path: join key
        # is (band, band_signature), shuffle tracks true near-dups)
        from uckg_spark.operators.dedup import minhash_lsh_pairs

        docs = _t(spark, sf, "documents")
        return minhash_lsh_pairs(docs, num_hashes=N_MINHASH, bands=2,
                                 n=SHINGLE_N, sigs=_shared_sigs(spark, sf))
    q["minhash_lsh_pairs"] = q_minhash_lsh_pairs

    def q_dedup_exact_apply(spark, sf):
        """The APPLY step of exact dedup: the kept corpus (one keeper per
        byte-identical group, min doc_id)."""
        from uckg_spark.operators.dedup import exact_dedup_apply

        docs = _t(spark, sf, "documents")
        return exact_dedup_apply(docs).select("doc_id")
    q["dedup_exact_apply"] = q_dedup_exact_apply

    def q_near_dup_keepers(spark, sf):
        """End-to-end near-dup removal: LSH candidate pairs → connected
        components over the pair graph → min-doc_id keeper per cluster +
        all unpaired docs (the full 10^12-scale dedup composition)."""
        from uckg_spark.operators.dedup import near_duplicate_keepers

        docs = _t(spark, sf, "documents")
        return near_duplicate_keepers(
            docs, num_hashes=N_MINHASH, bands=2, n=SHINGLE_N,
            sigs=_shared_sigs(spark, sf))
    q["near_dup_keepers"] = q_near_dup_keepers

    def q_simhash_duplicates(spark, sf):
        from uckg_spark.operators.dedup import simhash_duplicates

        docs = _t(spark, sf, "documents")
        d = simhash_duplicates(docs, bits=SIMHASH_BITS)
        return d.select(
            "simhash",
            F.array_join(F.col("doc_ids").cast("array<string>"), "|").alias("doc_ids"),
            "n",
        )
    q["simhash_duplicates"] = q_simhash_duplicates

    def q_simhash_near_dup(spark, sf):
        """Distance-≤k simhash dedup: chunk-banded candidate generation
        (pigeonhole over k+1 fingerprint chunks) + exact popcount verify —
        the production generalization of the distance-0 grouping above."""
        from uckg_spark.operators.dedup import simhash_near_dup_pairs

        docs = _t(spark, sf, "documents")
        return simhash_near_dup_pairs(docs, bits=SIMHASH_ND_BITS, k=SIMHASH_K)
    q["simhash_near_dup"] = q_simhash_near_dup

    def q_connected_components(spark, sf):
        # doc↔token bipartite graph (first + last token per doc) → alias
        # clusters via iterative min-label propagation
        from uckg_spark.operators.canonicalize import connected_components

        docs = _t(spark, sf, "documents")
        # one doc scan + one split: first/last token edges come from a
        # 2-element explode, not a two-branch union that re-splits text
        base = docs.select("doc_id", F.split("text", " ").alias("_tk"))
        edges = base.select(
            F.concat(F.lit("doc:"), F.col("doc_id")).alias("src"),
            F.explode(F.array(
                F.concat(F.lit("tok:"), F.get("_tk", 0)),
                F.concat(F.lit("tok:"), F.get("_tk", F.size("_tk") - 1)),
            )).alias("dst"),
        )
        return connected_components(edges)
    q["connected_components"] = q_connected_components

    def q_canonical_map(spark, sf):
        """A2 canonicalization end-to-end: surface-form/canonical-id alias
        clusters → one deterministic representative per cluster (the n10s
        unique-URI MERGE analog, /root/reference/process/graph_updater.py:
        30-45, extended to alias merging)."""
        from uckg_spark.operators.canonicalize import canonical_map

        docs = _t(spark, sf, "documents")
        alias_edges = docs.select(
            F.lower(F.get(F.split("text", " "), 0)).alias("surface_key"),
            F.concat(F.lit("ent:"), (F.col("doc_id") % 97).cast("string"))
            .alias("canonical_id"),
        )
        return canonical_map(alias_edges)
    q["canonical_map"] = q_canonical_map

    def q_subsumption_closure(spark, sf):
        """R2 reasoning twin (SURVEY §2.11): rdfs:subClassOf transitive
        closure via semi-naive iteration over a 3-level hierarchy built
        from the TPC-H FK chain (customer ⊂ nation ⊂ region ⊂ world)."""
        from uckg_spark.operators.reasoning import transitive_closure

        cust = _t(spark, sf, "customer").select(
            F.concat(F.lit("cust:"), F.col("c_custkey").cast("string"))
            .alias("child"),
            F.concat(F.lit("nation:"), F.col("c_nationkey").cast("string"))
            .alias("parent"),
        )
        nat = _t(spark, sf, "nation").select(
            F.concat(F.lit("nation:"), F.col("n_nationkey").cast("string"))
            .alias("child"),
            F.concat(F.lit("region:"), F.col("n_regionkey").cast("string"))
            .alias("parent"),
        )
        reg = _t(spark, sf, "region").select(
            F.concat(F.lit("region:"), F.col("r_regionkey").cast("string"))
            .alias("child"),
            F.lit("world").alias("parent"),
        )
        edges = cust.unionByName(nat).unionByName(reg)
        return transitive_closure(edges)
    q["subsumption_closure"] = q_subsumption_closure

    def q_knn_join_pandas(spark, sf):
        # broadcast-query batch kNN (Arrow/numpy partition-local top-k)
        from uckg_spark.operators.similarity import knn_join_pandas

        emb = _t(spark, sf, "embeddings")
        qrows = (emb.filter(F.col("vec_id").isin([1, 2, 3]))
                 .select("vec_id", "embedding").collect())
        queries_ = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
                    for r in qrows]
        return knn_join_pandas(emb, queries_, k=5)
    q["knn_join_pandas"] = q_knn_join_pandas

    def q_extract_features(spark, sf):
        # multimodal plumbing: documents.text as opaque binary payloads →
        # Arrow-batched feature extraction (decoders are deterministic
        # stubs; the Spark machinery — schema, batching, no payload on the
        # shuffle — is the real thing). f0_byte recovers feature[0]*255
        # exactly (the stub maps digest byte b → b/255.0).
        from uckg_spark.operators.multimodal import extract_features

        docs = _t(spark, sf, "documents")
        media = docs.select(
            F.col("doc_id").alias("media_id"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("kind"),
            F.encode("text", "utf-8").alias("payload"),
        )
        feats = extract_features(media)
        return feats.select(
            "media_id", "kind", "n_bytes", "digest",
            F.round(F.get("feature", 0) * 255).cast("int").alias("f0_byte"),
            F.size("feature").alias("feat_dim"),
        )
    q["extract_features"] = q_extract_features

    def q_resize_images(spark, sf):
        # the 'resize' leg of the multimodal plumbing: Arrow-batched
        # thumbnail resample to 4x4 RGB. Driver payloads are text (not
        # PNG) so every row takes the deterministic digest-cycled
        # fallback — the SQL-twin-able path, same convention as
        # extract_features; the REAL decode+exact-box-resample path is
        # pinned by tests/test_scale_operators.py on hand-built PNGs.
        from uckg_spark.operators.multimodal import resize_images

        docs = _t(spark, sf, "documents")
        media = docs.select(
            F.col("doc_id").alias("media_id"),
            F.lit("image").alias("kind"),
            F.encode("text", "utf-8").alias("payload"),
        )
        thumbs = resize_images(media, out_h=4, out_w=4)
        return thumbs.select(
            "media_id", "kind", "src_w", "src_h",
            F.size("pixels").alias("n_px"),
            F.round(F.get("pixels", 0) * 255).cast("int").alias("p0_byte"),
            "decoded",
        )
    q["resize_images"] = q_resize_images

    def q_sessionize(spark, sf):
        # gap-based sessionization (30-min inactivity): classic stateful
        # windowing expressed with lag + cumulative sum
        ev = _t(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        # exact integer microseconds on both sides: events.ts carries
        # sub-second precision, and unix_timestamp() truncates while a
        # DuckDB oracle's epoch() doesn't — the 30-min gap predicate would
        # disagree at fractional boundaries (round-1 red cell). ts is
        # TIMESTAMP_NTZ, so use timestampdiff (NTZ-native, tz-free) rather
        # than unix_micros (TZ-only).
        gap = F.timestamp_diff(
            "MICROSECOND", F.lag("ts").over(w), F.col("ts")) > 1_800_000_000
        sess = (
            ev.withColumn("new_sess", F.coalesce(gap.cast("int"), F.lit(1)))
            .withColumn("session_id", F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, 0)))
        )
        # session_value via exact integer cents (value is 2-decimal by
        # construction — verified 0 rows where value*100 is non-integer):
        # no float sum is ever hashed, so engine summation order can never
        # produce a divergent 2-dp rounding on either side.
        return (
            sess.groupBy("user_id", "session_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(
                     F.sum(F.round(F.col("value") * 100)).cast("bigint")
                     / 100.0, 2
                 ).alias("session_value"))
        )
    q["sessionize"] = q_sessionize

    def q_lang_id(spark, sf):
        from uckg_spark.operators.textstats import language_scores

        docs = _t(spark, sf, "documents")
        s = language_scores(docs)
        return s.select(
            "doc_id", "lang_guess",
            *[F.round(f"score_{lang}", 6).alias(f"score_{lang}")
              for lang in ("de", "en", "es", "fr")],
        )
    q["lang_id"] = q_lang_id

    def q_quality(spark, sf):
        from uckg_spark.operators.textstats import quality_scores

        return quality_scores(_t(spark, sf, "documents"))
    q["quality"] = q_quality

    def q_token_count(spark, sf):
        from uckg_spark.operators.textstats import token_counts

        return token_counts(_t(spark, sf, "documents"))
    q["token_count"] = q_token_count

    def q_fingerprint(spark, sf):
        from uckg_spark.operators.textstats import fingerprints

        return fingerprints(_t(spark, sf, "documents"))
    q["fingerprint"] = q_fingerprint

    def q_repetition(spark, sf):
        from uckg_spark.operators.webtext import repetition_scores

        return repetition_scores(_t(spark, sf, "documents"))
    q["repetition"] = q_repetition

    def q_dup_shingles(spark, sf):
        from uckg_spark.operators.webtext import duplicated_shingles

        return duplicated_shingles(_t(spark, sf, "documents"), n=5)
    q["dup_shingles"] = q_dup_shingles

    def q_url_normalize(spark, sf):
        # the driver tables carry no url column, so the query SYNTHESIZES
        # deterministic messy urls (case noise, default/explicit ports,
        # trailing slash, fragment — keyed off doc_id so every branch of
        # the normalizer is exercised) and canonicalizes them; the oracle
        # builds the identical urls in SQL and mirrors each step.
        from uckg_spark.operators.webtext import normalize_url, url_host

        d = F.col("doc_id")
        url = F.concat(
            F.when(d % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("http")),
            F.lit("://WWW."), F.col("source"), F.lit(".Example.COM"),
            F.when(d % 5 == 0, F.lit(":443")).otherwise(F.lit("")),
            F.lit("/Docs/"), d.cast("string"),
            F.when(d % 3 == 0, F.lit("/")).otherwise(F.lit("")),
            F.when(d % 7 == 0, F.lit("#frag")).otherwise(F.lit("")),
        )
        return _t(spark, sf, "documents").select(
            "doc_id",
            url.alias("url"),
            normalize_url(url).alias("url_norm"),
            url_host(url).alias("host"),
        )
    q["url_normalize"] = q_url_normalize

    def q_dedup_span_apply(spark, sf):
        from uckg_spark.operators.webtext import remove_duplicated_spans

        return remove_duplicated_spans(_t(spark, sf, "documents"), n=5)
    q["dedup_span_apply"] = q_dedup_span_apply

    def q_stratified_sample(spark, sf):
        from uckg_spark.operators.corpus import stratified_sample

        return stratified_sample(
            _t(spark, sf, "documents"), group_col="source", target_per_group=10
        )
    q["stratified_sample"] = q_stratified_sample

    def q_pack_sequences(spark, sf):
        from uckg_spark.operators.corpus import pack_sequences

        return pack_sequences(
            _t(spark, sf, "documents"), budget=128, group_col="source"
        )
    q["pack_sequences"] = q_pack_sequences

    def _kg_edges(spark, sf):
        """(subj, pred, obj) edge table synthesized from the relational
        FKs — orders placed_by customers, customers/suppliers in_nation —
        so the graph-query operators run over a real multi-predicate KG
        shape with an exact SQL twin."""
        orders = _t(spark, sf, "orders").select(
            F.concat(F.lit("order:"), F.col("o_orderkey")).alias("subj"),
            F.lit("placed_by").alias("pred"),
            F.concat(F.lit("cust:"), F.col("o_custkey")).alias("obj"),
        )
        cust = _t(spark, sf, "customer").select(
            F.concat(F.lit("cust:"), F.col("c_custkey")).alias("subj"),
            F.lit("in_nation").alias("pred"),
            F.concat(F.lit("nation:"), F.col("c_nationkey")).alias("obj"),
        )
        supp = _t(spark, sf, "supplier").select(
            F.concat(F.lit("supp:"), F.col("s_suppkey")).alias("subj"),
            F.lit("in_nation").alias("pred"),
            F.concat(F.lit("nation:"), F.col("s_nationkey")).alias("obj"),
        )
        return orders.unionByName(cust).unionByName(supp)

    def q_kg_pattern_2hop(spark, sf):
        from uckg_spark.plans.pattern import match_pattern

        return match_pattern(
            _kg_edges(spark, sf),
            [("?o", "placed_by", "?c"), ("?c", "in_nation", "nation:5")],
        )
    q["kg_pattern_2hop"] = q_kg_pattern_2hop

    def q_kg_degree(spark, sf):
        from uckg_spark.plans.pattern import degree_stats

        return degree_stats(_kg_edges(spark, sf))
    q["kg_degree"] = q_kg_degree

    def q_training_chunks(spark, sf):
        from uckg_spark.operators.corpus import training_chunks
        from uckg_spark.operators.vocab import build_vocab

        docs = _t(spark, sf, "documents")
        return training_chunks(
            docs, build_vocab(docs, max_size=16), budget=128, group_col="source"
        )
    q["training_chunks"] = q_training_chunks

    def q_kg_pagerank(spark, sf):
        from uckg_spark.plans.graphalgs import pagerank_fixed

        return pagerank_fixed(_kg_edges(spark, sf), iterations=3)
    q["kg_pagerank"] = q_kg_pagerank

    def q_kg_reachability(spark, sf):
        # who reaches nation 5 within 3 hops, following edges backwards
        # (customers/suppliers at hop 1, their orders at hop 2)
        from uckg_spark.plans.graphalgs import bfs_hops

        return bfs_hops(
            _kg_edges(spark, sf), ["nation:5"], max_hops=3, reverse=True
        )
    q["kg_reachability"] = q_kg_reachability

    def _kg_edges_closed(spark, sf):
        # _kg_edges plus order→nation (the order's customer's nation), so
        # every order closes an (order, cust, nation) triangle
        on = (
            _t(spark, sf, "orders")
            .join(_t(spark, sf, "customer"),
                  F.col("o_custkey") == F.col("c_custkey"))
            .select(
                F.concat(F.lit("order:"), F.col("o_orderkey")).alias("subj"),
                F.lit("in_nation").alias("pred"),
                F.concat(F.lit("nation:"), F.col("c_nationkey")).alias("obj"),
            )
        )
        return _kg_edges(spark, sf).unionByName(on)

    def q_kg_triangles(spark, sf):
        from uckg_spark.plans.graphalgs import triangle_counts

        return triangle_counts(_kg_edges_closed(spark, sf))
    q["kg_triangles"] = q_kg_triangles

    def q_kg_kcore(spark, sf):
        # cohesive backbone of the closed FK graph: 2 synchronous peels
        # of degree-<2 nodes, surviving nodes with surviving degree
        from uckg_spark.plans.graphalgs import kcore

        return kcore(_kg_edges_closed(spark, sf), k=2, rounds=2)
    q["kg_kcore"] = q_kg_kcore

    def q_doc_quantiles(spark, sf):
        # per-source PERCENTILE_DISC length profile — the distribution
        # scan that picks curation gate thresholds
        from uckg_spark.operators.quantiles import quantiles_disc

        return quantiles_disc(
            _t(spark, sf, "documents"), "n_chars", "source",
            probs=(0.5, 0.9, 0.99),
        )
    q["doc_quantiles"] = q_doc_quantiles

    def q_cooccur_lift(spark, sf):
        # integer-exact co-occurrence lift over parts sharing an order —
        # the PMI-style signal that scores candidate relatedTo KG edges
        from uckg_spark.operators.cooccur import cooccur_lift

        return cooccur_lift(
            _t(spark, sf, "lineitem"), "l_orderkey", "l_partkey",
            min_pair_count=2,
        )
    q["cooccur_lift"] = q_cooccur_lift

    def q_sales_rollup(spark, sf):
        # one-scan ROLLUP: per (flag,status), per-flag subtotal, grand
        # total; money as per-row integer cents so every metric is an
        # exact bigint
        from uckg_spark.operators.olap import rollup_metrics

        return rollup_metrics(
            _t(spark, sf, "lineitem"),
            ["l_returnflag", "l_linestatus"],
            [
                F.count("*").alias("n_rows"),
                F.sum("l_quantity").cast("bigint").alias("sum_qty"),
                F.sum(F.round(F.col("l_extendedprice") * 100))
                .cast("bigint").alias("sum_price_cents"),
            ],
        )
    q["sales_rollup"] = q_sales_rollup

    def q_event_funnel(spark, sf):
        # 4-stage strictly-ordered conversion funnel, one shuffle: all
        # stage reach-times are windows over the same user partitioning
        from uckg_spark.operators.funnel import funnel_counts

        return funnel_counts(
            _t(spark, sf, "events"), "user_id", "event_type", "ts",
            ("view", "click", "signup", "purchase"),
        )
    q["event_funnel"] = q_event_funnel

    def q_doc_outliers(spark, sf):
        # exact no-float 2-sigma length gate per source: the comparison
        # (n*x-S)^2 > k^2(nQ-S^2) is decided in integer arithmetic
        from uckg_spark.operators.outliers import variance_outliers

        return variance_outliers(
            _t(spark, sf, "documents"), "n_chars", "source", "doc_id", k=2
        )
    q["doc_outliers"] = q_doc_outliers

    def q_dataset_split(spark, sf):
        # reproducible hash-ranged train/valid/test assignment — pure
        # function of doc_id (partitioning- and corpus-growth-invariant)
        from uckg_spark.operators.splits import dataset_split

        return dataset_split(
            _t(spark, sf, "documents").select("doc_id"),
            "doc_id",
            {"train": 90, "valid": 5, "test": 5},
        )
    q["dataset_split"] = q_dataset_split

    def q_table_checksum(spark, sf):
        # commutative md5-sum fingerprint per order priority — the
        # sort-free "did the copy land identically" reconciliation audit
        from uckg_spark.operators.integrity import table_checksum

        return table_checksum(
            _t(spark, sf, "orders"),
            ["o_orderkey", "o_custkey", "o_orderstatus"],
            group_col="o_orderpriority",
        )
    q["table_checksum"] = q_table_checksum

    def q_kg_communities(spark, sf):
        # 2 synchronous label-propagation rounds over the closed FK
        # graph: community structure INSIDE connected components
        from uckg_spark.plans.graphalgs import label_propagation

        return label_propagation(_kg_edges_closed(spark, sf), rounds=2)
    q["kg_communities"] = q_kg_communities

    def q_bm25_topk(spark, sf):
        # exact fixed-point BM25 (rational idf + k1=6/5, b=3/4 cleared
        # to integers): top 20 docs for a 3-term keyword query
        from uckg_spark.operators.search import bm25_rank

        return bm25_rank(
            _t(spark, sf, "documents"), "text", "doc_id",
            ("hash", "join", "vector"), top_k=20,
        )
    q["bm25_topk"] = q_bm25_topk

    def q_doc_histogram(spark, sf):
        # fixed-width length histogram per source — the shape profile
        # between the quantile thresholds
        from uckg_spark.operators.quantiles import histogram_fixed

        return histogram_fixed(
            _t(spark, sf, "documents"), "n_chars", "source", width=50
        )
    q["doc_histogram"] = q_doc_histogram

    def q_inverted_index(spark, sf):
        # token → sorted posting list with df gates applied inside the
        # aggregation — the candidate prefilter bm25_topk names
        from uckg_spark.operators.invindex import build_inverted_index

        # postings ride as a space-joined string: the cross-engine hash
        # normalizes arrays differently on the two DuckDB fetch paths
        # (numpy vs list repr), so list outputs are serialized — same
        # convention as encode_docs
        return build_inverted_index(
            _t(spark, sf, "documents"), "text", "doc_id", min_df=2
        ).select(
            "token", "df",
            F.array_join("postings", " ").alias("postings"),
        )
    q["inverted_index"] = q_inverted_index

    def q_similarity_join(spark, sf):
        # EXACT set-similarity join at shingle-set Jaccard >= 1/2 via
        # prefix filtering — zero recall loss, unlike the LSH family
        # (3-gram shingle sets: unigram sets over this corpus's small
        # vocabulary are near-identical for every pair, so they neither
        # discriminate nor let the prefix filter prune)
        from uckg_spark.operators.setjoin import similarity_join

        return similarity_join(
            _t(spark, sf, "documents"), "text", "doc_id", 1, 2,
            shingle_n=3,
        )
    q["similarity_join"] = q_similarity_join

    def q_event_pivot(spark, sf):
        # fixed-domain cross-tab: per-user event-type counts in one
        # conditional-sum aggregate (no discovery scan, no explode)
        from uckg_spark.operators.olap import pivot_counts

        return pivot_counts(
            _t(spark, sf, "events"), "user_id", "event_type",
            ["view", "click", "signup", "purchase", "error"],
        )
    q["event_pivot"] = q_event_pivot

    def q_rolling_counts(spark, sf):
        # trailing 1-hour per-user event count at every event — the
        # RANGE-frame window case, exact via integer-µs frame bounds
        from uckg_spark.operators.temporal import rolling_counts

        return rolling_counts(
            _t(spark, sf, "events"), "user_id", "ts", "event_id", "1 hour"
        )
    q["rolling_counts"] = q_rolling_counts

    def q_kg_pagerank_seeded(spark, sf):
        # personalized PageRank: teleport + initial mass only at the two
        # seed nations — relatedness TO the seeds, not global centrality
        from uckg_spark.plans.graphalgs import pagerank_fixed

        return pagerank_fixed(
            _kg_edges(spark, sf), iterations=3,
            seeds=["nation:5", "nation:7"],
        )
    q["kg_pagerank_seeded"] = q_kg_pagerank_seeded

    def q_event_transitions(spark, sf):
        # first-order Markov transition counts per user, (ts, id)-ordered
        # so equal timestamps are deterministic
        from uckg_spark.operators.funnel import transition_counts

        return transition_counts(
            _t(spark, sf, "events"), "user_id", "ts", "event_type",
            "event_id",
        )
    q["event_transitions"] = q_event_transitions

    def q_fuzzy_name_pairs(spark, sf):
        # exact edit-distance<=1 supplier-name pairs via deletion-
        # signature blocking (FastSS) — no quadratic join
        from uckg_spark.operators.editdist import edit_distance_pairs

        return edit_distance_pairs(
            _t(spark, sf, "supplier"), "s_name", "s_suppkey"
        )
    q["fuzzy_name_pairs"] = q_fuzzy_name_pairs

    def q_zorder_keys(spark, sf):
        # Morton layout keys over (partkey, suppkey) — the clustering
        # key an OPTIMIZE ZORDER job sorts by; bit-exact bigint algebra
        from uckg_spark.functions.layout import zorder_value

        li = _t(spark, sf, "lineitem")
        return li.select(
            "l_orderkey",
            "l_linenumber",
            zorder_value(["l_partkey", "l_suppkey"], bits=16).alias("zval"),
        )
    q["zorder_keys"] = q_zorder_keys

    def q_kg_query_text(spark, sf):
        # SPARQL-ish text front door over match_pattern: every order
        # with its customer AND the customer's nation — an all-variable
        # chain (the 2hop row covers the list form + constant pushdown)
        from uckg_spark.plans.pattern import query_pattern

        return query_pattern(
            _kg_edges(spark, sf), "?o placed_by ?c . ?c in_nation ?n"
        )
    q["kg_query_text"] = q_kg_query_text

    def q_table_stats(spark, sf):
        # ANALYZE analog: one-pass exact per-column stats on orders
        from uckg_spark.operators.integrity import collect_stats

        return collect_stats(
            _t(spark, sf, "orders"),
            ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
        )
    q["table_stats"] = q_table_stats

    def q_er_canonical_names(spark, sf):
        # ER end-to-end: ed<=1 name pairs -> CC -> lexicographic-min
        # canonical per cluster (the vendor/product typo rewrite map)
        from uckg_spark.operators.editdist import er_canonical_names

        return er_canonical_names(_t(spark, sf, "supplier"), "s_name")
    q["er_canonical_names"] = q_er_canonical_names

    def q_containment_pairs(spark, sf):
        # EXACT asymmetric containment join (|src∩dst| >= 0.8|src| over
        # 3-gram shingle sets) via the src-prefix × dst-posting filter —
        # the quote-inclusion dedup pass Jaccard cannot express
        from uckg_spark.operators.setjoin import containment_join

        return containment_join(
            _t(spark, sf, "documents"), "text", "doc_id", 80, 100,
            shingle_n=3,
        )
    q["containment_pairs"] = q_containment_pairs

    def q_winnow_fingerprint(spark, sf):
        # MOSS winnowing (k=3 grams, window w=4): rightmost-min window
        # hashes -> localized copy-detection fingerprints, zero shuffles
        from uckg_spark.operators.dedup import winnow_fingerprints

        return winnow_fingerprints(
            _t(spark, sf, "documents"), k=3, w=4)
    q["winnow_fingerprint"] = q_winnow_fingerprint

    def q_salted_join(spark, sf):
        # skew-replicated fact⋈dim join (salt on the row-unique line id,
        # dim replicated n_salt×), then priority rollup in exact cents —
        # values identical to the plain join by construction
        from uckg_spark.operators.skew import salted_join

        li = _t(spark, sf, "lineitem").withColumn(
            "price_c",
            F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        joined = salted_join(
            li.withColumnRenamed("l_orderkey", "o_orderkey"),
            _t(spark, sf, "orders").select("o_orderkey", "o_orderpriority"),
            "o_orderkey", n_salt=4, salt_src="l_linenumber",
        )
        return joined.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("price_c").alias("revenue_c"),
        )
    q["salted_join"] = q_salted_join

    def q_embed_project(spark, sf):
        # Achlioptas ±1 random projection 64 -> 8 dims (JL transform) in
        # fixed-point micro-units — the shuffle-free dimensionality
        # reduction ahead of ANN at corpus scale
        from uckg_spark.operators.similarity import random_projection

        return random_projection(
            _t(spark, sf, "embeddings"), EMB_DIM, out_dim=8)
    q["embed_project"] = q_embed_project

    def q_gap_fill(spark, sf):
        # per-event-type daily counts + exact-cents sums DENSIFIED over
        # each key's own [first, last] day — gap days appear as zeros
        from uckg_spark.operators.temporal import gap_fill_counts

        return gap_fill_counts(
            _t(spark, sf, "events"), "event_type", "ts", "1 day",
            value_col="value",
        )
    q["gap_fill"] = q_gap_fill

    def q_quality_fit(spark, sf):
        # distributed closed-form OLS: one sufficient-statistics pass,
        # Cramer solve on the 1-row aggregate (no collect), broadcast
        # coefficients score every doc — quality_e6 ~ n_tokens + stop‰
        from uckg_spark.operators.regression import fit_and_score_u
        from uckg_spark.operators.textstats import quality_scores

        feats = quality_scores(_t(spark, sf, "documents")).select(
            "doc_id", "n_tokens",
            F.expr("stop_ratio_e6 div 1000").alias("stop_pm"),
            "quality_e6",
        )
        return fit_and_score_u(
            feats, "n_tokens", "stop_pm", "quality_e6", "doc_id")
    q["quality_fit"] = q_quality_fit

    def q_kg_link_predict(spark, sf):
        # propose new cust–cust KG edges from co-purchase structure:
        # common-neighbor / Jaccard / resource-allocation scores, all
        # integer-exact, super-node cap 40, deterministic top-100
        from uckg_spark.plans.graphalgs import link_prediction

        li = _t(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
        orders = _t(spark, sf, "orders").select("o_orderkey", "o_custkey")
        edges = li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).select(
            F.concat(F.lit("cust:"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("part:"), F.col("l_partkey")).alias("dst"),
        )
        return link_prediction(edges, max_hub_degree=40, k=100)
    q["kg_link_predict"] = q_kg_link_predict

    def q_group_sample_k(spark, sf):
        # exact-quota eval-set draw: the 5 docs per source whose
        # (md5(doc_id), doc_id) sorts smallest — two-phase prefilter+rank
        # so no task ever holds a whole group; fallback keeps it exact
        from uckg_spark.operators.corpus import group_sample_k

        return group_sample_k(
            _t(spark, sf, "documents"), group_col="source", k=5)
    q["group_sample_k"] = q_group_sample_k

    def q_pii_scrub(spark, sf):
        # the corpus tables carry no PII by construction, so the query
        # plants deterministic doc_id-derived email/IP/phone strings in
        # both engines, then exercises the real scrub operator on them
        from uckg_spark.operators.webtext import pii_scrub

        d = F.col("doc_id")
        docs = _t(spark, sf, "documents").select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit(" contact user"), d.cast("string"),
                F.lit("@mail"), (d % 7).cast("string"),
                F.lit(".example.com from 10."), (d % 256).cast("string"),
                F.lit(".0."), (d % 100).cast("string"),
                F.lit(" tel 555-"), (d % 900 + 100).cast("string"),
                F.lit("-"),
                F.lpad((d % 10000).cast("string"), 4, "0"),
            ).alias("text"),
        )
        return pii_scrub(docs)
    q["pii_scrub"] = q_pii_scrub

    def q_equi_depth(spark, sf):
        # optimizer-style equi-depth histogram of doc lengths per
        # source — integer-exact PERCENTILE_DISC breakpoints via
        # cross-multiplied ranks, no float compares anywhere
        from uckg_spark.operators.quantiles import equi_depth_hist

        return equi_depth_hist(
            _t(spark, sf, "documents"), "n_chars", "source", n_buckets=8)
    q["equi_depth"] = q_equi_depth

    def q_scd2_history(spark, sf):
        # type-2 dimension history of each sampled user's event_type
        # runs: no-op repeats collapse, intervals close on the next
        # change, version numbers ride the same window shuffle
        from uckg_spark.operators.temporal import scd2_history

        ev = _t(spark, sf, "events").filter(F.col("user_id") % 20 == 0)
        return scd2_history(
            ev, key_col="user_id", ts_col="ts",
            value_col="event_type", tiebreak_col="event_id")
    q["scd2_history"] = q_scd2_history

    def q_bloom_semi(spark, sf):
        # bloom-prefiltered semi join: the explicit shuffle-volume
        # reducer when the dim can't broadcast — result provably equals
        # the plain semi join (bloom admits false positives only)
        from uckg_spark.operators.skew import bloom_semi_join

        cust = _t(spark, sf, "customer").filter(
            F.col("c_mktsegment") == "BUILDING")
        return bloom_semi_join(
            _t(spark, sf, "orders").select("o_orderkey", "o_custkey"),
            cust, "o_custkey", "c_custkey")
    q["bloom_semi"] = q_bloom_semi

    def q_weighted_quantile(spark, sf):
        # quantity-weighted price quantiles per returnflag: integer
        # cross-multiplied thresholds, exact cents, no float compares
        from uckg_spark.operators.quantiles import weighted_quantiles

        li = _t(spark, sf, "lineitem").select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100)
            .cast("bigint").alias("price_c"),
            F.col("l_quantity").cast("bigint").alias("qty"),
        )
        return weighted_quantiles(
            li, "price_c", "qty", "l_returnflag",
            probs=((1, 2), (9, 10), (99, 100)))
    q["weighted_quantile"] = q_weighted_quantile

    def q_interval_concurrency(spark, sf):
        # sweep-line concurrency of 1-hour activity windows per event
        # type: boundary deltas net out per timestamp BEFORE the cumsum
        # so tie order is unrepresentable
        from uckg_spark.operators.temporal import interval_concurrency

        ev = _t(spark, sf, "events").filter(
            F.col("user_id") % 20 == 0
        ).select(
            "event_type", "ts",
            (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("te"),
        )
        return interval_concurrency(ev, "event_type", "ts", "te")
    q["interval_concurrency"] = q_interval_concurrency

    def q_kge_negatives(spark, sf):
        # reproducible TransE filtered negative sampling over the
        # in_nation KG slice: md5-derived corruption indices through a
        # bucketed dense node index (no global sort), k=2 per edge
        from uckg_spark.plans.graphalgs import kge_negative_samples

        edges = _kg_edges(spark, sf).filter(F.col("pred") == "in_nation")
        return kge_negative_samples(edges, k=2)
    q["kge_negatives"] = q_kge_negatives

    def q_doc_chunks(spark, sf):
        # RAG-style overlapping retrieval chunks: 32-token windows every
        # 24 tokens, zero-shuffle row-local array algebra
        from uckg_spark.operators.corpus import sliding_chunks

        return sliding_chunks(
            _t(spark, sf, "documents"), chunk_size=32, stride=24)
    q["doc_chunks"] = q_doc_chunks

    def q_heavy_hitters(spark, sf):
        # tokens covering >= 2% of the stream: CMS prefilter drops the
        # tail before the exact count's shuffle; threshold from ONE
        # bounded 1-row fetch (the total), result equals plain HAVING
        from uckg_spark.operators.dedup import tokens
        from uckg_spark.operators.sketches import cms_heavy_hitters

        docs = _t(spark, sf, "documents")
        toks = docs.select(F.explode(tokens(F.col("text"))).alias("value"))
        # total token count = sum of per-doc array sizes: one map-side
        # aggregate instead of materializing the exploded stream just to
        # count it (explode drops nothing size() counts — empty arrays
        # contribute 0 rows and 0 alike)
        total = docs.agg(
            F.sum(F.size(tokens(F.col("text")))).alias("n")
        ).collect()[0][0] or 0
        return cms_heavy_hitters(
            toks, "value", threshold=max(1, total // 50), width=256)
    q["heavy_hitters"] = q_heavy_hitters

    def q_rank_normalize(spark, sf):
        # scale-free percentile-rank normalization of doc length within
        # each source — ties share the min rank, integer div throughout
        from uckg_spark.operators.quantiles import rank_normalize

        return rank_normalize(
            _t(spark, sf, "documents").select("doc_id", "source", "n_chars"),
            "n_chars", "source")
    q["rank_normalize"] = q_rank_normalize

    def q_pareto_front(spark, sf):
        # maximal parts under (size, retail cents): one global-sort
        # window form, checked against the quadratic NOT-EXISTS twin —
        # two different algorithms must agree on the exact set
        from uckg_spark.operators.olap import pareto_front_2d

        p = _t(spark, sf, "part").select(
            "p_partkey", "p_size",
            F.round(F.col("p_retailprice") * 100)
            .cast("bigint").alias("price_c"),
        )
        return pareto_front_2d(p, "p_size", "price_c", "p_partkey")
    q["pareto_front"] = q_pareto_front

    def q_label_spread(spark, sf):
        # 1-round transductive kNN pseudo-labeling: vec_id % 5 held
        # out, cosine 5-NN majority vote among the labeled rest
        from uckg_spark.operators.similarity import label_spread

        return label_spread(_t(spark, sf, "embeddings"), k=5, mask_mod=5)
    q["label_spread"] = q_label_spread

    def q_label_spread_bucketed(spark, sf):
        """The scale path for label_spread: IVF-bucketed candidates
        (16 hash-stratified cells, 4-probe queries, candidates meet in
        a cell-id-shuffled join) feeding the same majority-vote tail —
        NO corpus-proportional driver collect anywhere."""
        from uckg_spark.operators.similarity import label_spread_bucketed

        return label_spread_bucketed(
            _t(spark, sf, "embeddings"), k=5, mask_mod=5,
            n_centroids=16, n_probe=4)
    q["label_spread_bucketed"] = q_label_spread_bucketed

    def q_auc(spark, sf):
        # exact rational ROC-AUC (Mann-Whitney, average-rank ties) of
        # doc length as an is-English classifier — no floats anywhere
        from uckg_spark.operators.regression import auc_exact

        d = _t(spark, sf, "documents").select(
            "n_chars", (F.col("lang") == "en").alias("y"))
        return auc_exact(d, "n_chars", "y")
    q["auc"] = q_auc

    def q_incremental_pairs(spark, sf):
        # dedup-on-ingest: near-dup candidates touching the "new" batch
        # (doc_id % 10) via a band join against the existing corpus's
        # LSH index — existing×existing is never examined
        from uckg_spark.operators.dedup import incremental_near_dup_pairs

        docs = _t(spark, sf, "documents")
        return incremental_near_dup_pairs(
            docs.filter(F.col("doc_id") % 10 == 0),
            base_docs=docs.filter(F.col("doc_id") % 10 != 0))
    q["incremental_pairs"] = q_incremental_pairs

    def q_period_over_period(spark, sf):
        # day-over-day deltas per event type on the gap-FILLED series —
        # quiet days compare as real zeros, not silent skips
        from uckg_spark.operators.temporal import period_over_period

        return period_over_period(
            _t(spark, sf, "events"), "event_type", "ts", "1 day")
    q["period_over_period"] = q_period_over_period

    def q_confusion(spark, sf):
        # shipped-gate eval: n_chars >= 250 as an is-English classifier,
        # exact counts + integer-div micro-unit precision/recall/F1
        from uckg_spark.operators.regression import confusion_at_threshold

        d = _t(spark, sf, "documents").select(
            "n_chars", (F.col("lang") == "en").alias("y"))
        return confusion_at_threshold(d, "n_chars", "y", threshold=250)
    q["confusion"] = q_confusion

    def q_kg_hits(spark, sf):
        # hub/authority separation over the KG (2 fixed-point
        # iterations) — reference entities vs aggregator entities,
        # which the single PageRank score conflates
        from uckg_spark.plans.graphalgs import hits_fixed

        return hits_fixed(_kg_edges(spark, sf), iterations=2)
    q["kg_hits"] = q_kg_hits

    def q_mad_outliers(spark, sf):
        # robust median/MAD gate on doc lengths per source — the
        # heavy-tail companion to the k-sigma doc_outliers row
        from uckg_spark.operators.outliers import mad_outliers

        return mad_outliers(
            _t(spark, sf, "documents"), "n_chars", "source", "doc_id", k=3)
    q["mad_outliers"] = q_mad_outliers

    def q_kg_struct_groups(spark, sf):
        # entity resolution by GRAPH SHAPE: groups of nodes whose
        # neighbor-set minhash signatures fully agree (orders of one
        # customer collide structurally even with disjoint labels)
        from uckg_spark.plans.graphalgs import structural_groups

        return structural_groups(_kg_edges(spark, sf), num_hashes=4)
    q["kg_struct_groups"] = q_kg_struct_groups

    def q_grouped_corr(spark, sf):
        # exact n-scaled covariance pair + IEEE-deterministic corr_e6
        # of chars vs tokens per source — the collinearity diagnostic
        # to run before any 2-feature OLS fit
        from uckg_spark.operators.dedup import tokens
        from uckg_spark.operators.integrity import grouped_corr

        d = _t(spark, sf, "documents").select(
            "source", "n_chars",
            F.size(tokens(F.col("text"))).alias("n_tok"))
        return grouped_corr(d, "n_chars", "n_tok", "source")
    q["grouped_corr"] = q_grouped_corr

    def q_source_overlap(spark, sf):
        # mixture-health check: pairwise shingle-set Jaccard between
        # sources as exact inter/uni rationals — double-counted crawls
        # show up as near-1 pairs before they double-weight a voice
        from uckg_spark.operators.corpus import source_overlap

        return source_overlap(_t(spark, sf, "documents"))
    q["source_overlap"] = q_source_overlap

    def q_kg_struct_pairs(spark, sf):
        # the verify stage of structural ER: small-group sketch
        # candidates scored by TRUE neighbor-set Jaccard — sketch
        # collisions are hypotheses, the set intersection decides
        from uckg_spark.plans.graphalgs import structural_pairs

        return structural_pairs(
            _kg_edges(spark, sf), num_hashes=4, max_group_size=8)
    q["kg_struct_pairs"] = q_kg_struct_pairs

    def q_rdf_roundtrip(spark, sf):
        # SURVEY §2.11 R3 made real: a mixed literal/IRI/datatyped
        # triple set serialized to N-Triples text and parsed back,
        # output carrying BOTH the carrier line and the parsed columns
        # so one row checks the wire format AND the parser. Both
        # directions are row maps (codegen string exprs, zero
        # shuffles) — the property that lets a 10^12-triple corpus
        # export/import at full cluster width.
        from uckg_spark.sources.rdfio import from_ntriples, to_ntriples

        d = _t(spark, sf, "documents")
        doc = F.concat(F.lit("uckg:doc/"), F.col("doc_id").cast("string"))
        t = (
            d.select(
                doc.alias("subj"), F.lit("uckg:text").alias("pred"),
                F.col("text").alias("obj"),
                F.lit(True).alias("obj_is_literal"),
                F.lit("xsd:string").alias("obj_datatype"))
            .unionByName(d.select(
                doc.alias("subj"), F.lit("uckg:n_chars").alias("pred"),
                F.col("n_chars").cast("string").alias("obj"),
                F.lit(True).alias("obj_is_literal"),
                F.lit("xsd:integer").alias("obj_datatype")))
            .unionByName(d.select(
                doc.alias("subj"), F.lit("uckg:source").alias("pred"),
                F.concat(F.lit("uckg:source/"), F.col("source")).alias("obj"),
                F.lit(False).alias("obj_is_literal"),
                F.lit("").alias("obj_datatype")))
        )
        return from_ntriples(to_ntriples(t), keep_line=True)
    q["rdf_roundtrip"] = q_rdf_roundtrip

    def q_spike_days(spark, sf):
        # anomaly composition: day-over-day deltas (gap-aware) gated by
        # the robust MAD outlier test per event type — "which days
        # spiked" with no float and no distribution assumption
        from uckg_spark.operators.outliers import mad_outliers
        from uckg_spark.operators.temporal import period_over_period

        pop = period_over_period(
            _t(spark, sf, "events"), "event_type", "ts", "1 day")
        return mad_outliers(
            pop.select("key", F.col("bucket_idx").alias("day"), "delta"),
            "delta", "key", "day", k=4)
    q["spike_days"] = q_spike_days

    def q_contingency(spark, sf):
        # lang × source drift cells with exact rational chi-square
        # contributions — absent cells emitted (a vanished category IS
        # the drift signal)
        from uckg_spark.operators.integrity import contingency_cells

        return contingency_cells(
            _t(spark, sf, "documents"), "lang", "source")
    q["contingency"] = q_contingency

    def q_retention(spark, sf):
        # classic retention triangle: cohort = first-active day, exact
        # n_active/cohort_n rationals per day offset
        from uckg_spark.operators.funnel import retention_cohorts

        return retention_cohorts(_t(spark, sf, "events"), "user_id", "ts")
    q["retention"] = q_retention

    def q_token_cooccur(spark, sf):
        # GloVe/PPMI-style co-occurrence matrix: window-3 canonical
        # token pairs with marginals, pair generation fully row-local
        from uckg_spark.operators.cooccur import token_cooccur

        return token_cooccur(_t(spark, sf, "documents"), window=3)
    q["token_cooccur"] = q_token_cooccur

    def q_pair_audit(spark, sf):
        # the dedup-QA workflow: a deterministic md5-ranked sample of
        # LSH candidate pairs, each verified by EXACT shingle-set
        # Jaccard — what a human (or threshold tuner) audits before
        # trusting the banding parameters at corpus scale
        from uckg_spark.operators.dedup import minhash_lsh_pairs, shingle_rows

        docs = _t(spark, sf, "documents")
        pairs = minhash_lsh_pairs(docs, num_hashes=4, bands=2)
        sample = (
            pairs.withColumn(
                "_k",
                F.md5(F.concat_ws(":", "doc_a", "doc_b")))
            .orderBy("_k").limit(16)
        )
        sh = shingle_rows(docs, 3, "text", distinct=True).select(
            F.col("id").alias("doc_id"), F.col("token").alias("s"))
        # sh feeds THREE consumers (sizes + both verify sides): truncate
        # its lineage in local mode so the corpus-wide shingle kernel
        # runs once, not three times (same idiom as setjoin._ordered_sets)
        if spark.sparkContext.master.startswith("local"):
            sh = sh.localCheckpoint(eager=False)
        sizes = sh.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"))
        sa = sh.select(F.col("doc_id").alias("doc_a"), "s")
        sb = sh.select(F.col("doc_id").alias("doc_b"), "s")
        inter = (
            sample.join(sa, "doc_a").join(sb, ["doc_b", "s"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
        )
        na = sizes.select(F.col("doc_id").alias("doc_a"),
                          F.col("n").alias("_na"))
        nb = sizes.select(F.col("doc_id").alias("doc_b"),
                          F.col("n").alias("_nb"))
        return (
            inter.join(na, "doc_a").join(nb, "doc_b")
            .select(
                "doc_a", "doc_b", "inter",
                (F.col("_na") + F.col("_nb") - F.col("inter"))
                .cast("bigint").alias("uni"),
            )
        )
    q["pair_audit"] = q_pair_audit

    def q_kmv_union(spark, sf):
        # sketch MERGEABILITY: per-priority customer sketches combined
        # into one union cardinality estimate without rescanning rows —
        # the property that makes per-shard sketches production-viable
        from uckg_spark.operators.sketches import (
            kmv_sketch,
            kmv_union_estimate,
        )

        sk = kmv_sketch(
            _t(spark, sf, "orders"), "o_custkey", "o_orderpriority", k=64)
        return kmv_union_estimate(sk, k=64)
    q["kmv_union"] = q_kmv_union

    def q_approx_distinct_kmv(spark, sf):
        # integer-exact KMV cardinality sketch (k=64) of customers per
        # order priority, with the exact count riding along for error
        from uckg_spark.operators.sketches import kmv_distinct

        return kmv_distinct(
            _t(spark, sf, "orders"), "o_custkey", "o_orderpriority", k=64
        )
    q["approx_distinct_kmv"] = q_approx_distinct_kmv

    def q_contamination(spark, sf):
        from uckg_spark.operators.corpus import contamination_report

        return contamination_report(
            _t(spark, sf, "documents"), eval_group="src0", n=5
        )
    q["contamination"] = q_contamination

    def q_asof_join(spark, sf):
        # attribution: every click matched to the user's latest prior
        # (or simultaneous) view — DuckDB twin is a native ASOF JOIN
        from uckg_spark.operators.temporal import asof_join

        ev = _t(spark, sf, "events")
        clicks = ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts")
        views = ev.filter(F.col("event_type") == "view").select(
            "user_id", "ts", F.col("event_id").alias("view_id"), "value")
        out = asof_join(clicks, views, key="user_id", suffix="_v")
        return out.select(
            "event_id", "user_id",
            F.col("view_id_v").alias("view_id"),
            F.expr("timestampdiff(MICROSECOND, ts_v, ts) div 1000000")
            .cast("bigint").alias("gap_s"),
            F.col("value_v").alias("view_value"),
        )
    q["asof_join"] = q_asof_join

    def q_range_join(spark, sf):
        # all view→click pairs of the same user within a 2 h band —
        # bucketized equi-join, never a nested-loop plan
        from uckg_spark.operators.temporal import range_join_pairs

        ev = _t(spark, sf, "events")
        views = ev.filter(F.col("event_type") == "view").select(
            "user_id", "ts", F.col("event_id").alias("view_id"))
        clicks = ev.filter(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("event_id").alias("click_id"))
        return range_join_pairs(
            views, clicks, key="user_id", width_seconds=7200,
            left_cols=["view_id"], right_cols=["click_id"], suffix="",
        )
    q["range_join"] = q_range_join

    def q_curated_corpus(spark, sf):
        # the curation pipeline end-to-end: exact-dedup apply → language
        # gate → quality floor → repetition ceiling (composition of the
        # family's own operators — the job a training-data run executes)
        from uckg_spark.operators.corpus import curate_corpus

        return curate_corpus(
            _t(spark, sf, "documents"),
            min_quality_e6=600_000, max_dup_frac_e6=600_000, lang="en",
        )
    q["curated_corpus"] = q_curated_corpus

    def q_kg_snapshot_diff(spark, sf):
        # incremental maintenance: edge delta between two KG snapshots
        # (old = orders minus every 3rd key, new = minus every 5th)
        from uckg_spark.plans.graphalgs import snapshot_diff

        def order_edges(df):
            return df.select(
                F.concat(F.lit("order:"), F.col("o_orderkey")).alias("subj"),
                F.lit("placed_by").alias("pred"),
                F.concat(F.lit("cust:"), F.col("o_custkey")).alias("obj"),
            )

        orders = _t(spark, sf, "orders")
        old = order_edges(orders.filter(F.col("o_orderkey") % 3 != 0))
        new = order_edges(orders.filter(F.col("o_orderkey") % 5 != 0))
        return snapshot_diff(old, new)
    q["kg_snapshot_diff"] = q_kg_snapshot_diff

    def q_vocab_top(spark, sf):
        from uckg_spark.operators.vocab import build_vocab

        return build_vocab(_t(spark, sf, "documents"), max_size=20)
    q["vocab_top"] = q_vocab_top

    def q_encode_docs(spark, sf):
        from uckg_spark.operators.vocab import build_vocab, encode_docs

        docs = _t(spark, sf, "documents")
        return encode_docs(docs, build_vocab(docs, max_size=16))
    q["encode_docs"] = q_encode_docs

    def _staged_stream(spark, sf, table):
        """Stage a single-file sf table into a fresh dir (FileStreamSource
        sources a DIRECTORY) and return (bounded stream, workdir). The
        workdir stays on disk for the session — the result DataFrame reads
        its sink lazily, and a corpus-sized result must never be collected
        to the driver just to outlive a temp dir."""
        import shutil
        import tempfile

        src = os.path.join(sf, f"{table}.parquet")
        schema = spark.read.parquet(src).schema
        work = tempfile.mkdtemp(prefix="uckg_stream_q_")
        src_dir = os.path.join(work, "src")
        os.makedirs(src_dir)
        shutil.copy(src, os.path.join(src_dir, f"{table}.parquet"))
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )
        return stream, work

    def q_streaming_first_seen(spark, sf):
        """Stateful Structured Streaming dedup (applyInPandasWithState,
        SURVEY.md §2.10 I2's streaming twin): drain the events table as a
        bounded stream (availableNow) and emit each user_id exactly once
        across micro-batches. The emitted SET is batch-slicing-independent,
        so the DuckDB oracle is exactly SELECT DISTINCT user_id."""
        from uckg_spark.streaming.pages_stream import streaming_first_seen_keys

        stream, work = _staged_stream(spark, sf, "events")
        out, ckpt = os.path.join(work, "out"), os.path.join(work, "ckpt")
        q_ = (
            streaming_first_seen_keys(stream, "user_id", "bigint")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
        return spark.read.parquet(out).select("user_id")
    q["streaming_first_seen"] = q_streaming_first_seen

    def q_streaming_dedup_ingest(spark, sf):
        """Dedup-on-ingest, the streaming twin of exact dedup (A1/I2 at
        the ingest boundary): drain the documents table as a bounded
        stream, emit each content digest exactly once across
        micro-batches via the stateful first-seen operator. The emitted
        digest SET is batch-slicing-independent (which doc of a
        duplicate group arrives first varies with slicing; its md5 does
        not), so the oracle is exactly SELECT DISTINCT md5(text)."""
        from uckg_spark.streaming.pages_stream import streaming_first_seen_keys

        stream, work = _staged_stream(spark, sf, "documents")
        digests = stream.select(F.md5(F.col("text")).alias("digest"))
        out, ckpt = os.path.join(work, "out"), os.path.join(work, "ckpt")
        q_ = (
            streaming_first_seen_keys(digests, "digest", "string")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
        return spark.read.parquet(out).select("digest")
    q["streaming_dedup_ingest"] = q_streaming_dedup_ingest

    def q_streaming_mention_rate(spark, sf):
        """Watermarked event-time windowed aggregate (the monitoring
        surface of the streaming ingest mode): 10-minute tumbling counts
        with a 30-minute watermark in APPEND mode — only windows fully
        below the final watermark are emitted, and the oracle reproduces
        that emission rule exactly (window_end <= max_event_time - 30min,
        millisecond-floored like Spark's window assignment)."""
        from uckg_spark.streaming.pages_stream import mention_rate

        stream, work = _staged_stream(spark, sf, "events")
        # watermarks require TIMESTAMP (tz-aware); events.ts is NTZ. The
        # NTZ→timestamp cast reinterprets in the SESSION timezone — pin it
        # to UTC so a harness session built with a non-UTC default can't
        # shift every window boundary. Restored afterward: queries must
        # not leak session-conf changes to whatever runs next.
        prev_tz = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        try:
            mapped = stream.select(
                F.col("ts").cast("timestamp").alias("warc_ts"),
                (F.col("user_id") % 5).cast("string").alias("lang"),
            )
            rated = mention_rate(mapped).select(
                F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
                .alias("window_start"),
                "lang",
                "n_pages",
            )
            out, ckpt = os.path.join(work, "out"), os.path.join(work, "ckpt")
            q_ = (
                rated.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q_.awaitTermination()
        finally:
            # all tz-sensitive work happened inside the (terminated)
            # streaming query; the parquet holds plain strings/longs, so
            # the lazy read below is timezone-independent
            spark.conf.set("spark.sql.session.timeZone", prev_tz)
        return spark.read.parquet(out)
    q["streaming_mention_rate"] = q_streaming_mention_rate

    def q_streaming_sessions(spark, sf):
        """Event-time session windows in APPEND mode — the streaming twin
        of the batch sessionize row. Sessions merge in the state store
        while gaps stay under 6 h; a session is emitted only once the
        final watermark (max event time − 12 h) passes its end (last
        event + gap). The oracle replays the same gap-split with
        lag/cumsum and applies the identical emission cutoff."""
        from uckg_spark.streaming.pages_stream import streaming_sessions

        stream, work = _staged_stream(spark, sf, "events")
        prev_tz = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        try:
            mapped = stream.select(
                F.col("user_id"), F.col("ts").cast("timestamp").alias("ts")
            )
            sess = streaming_sessions(
                mapped, "user_id", "ts", gap="6 hours", delay="12 hours"
            ).select(
                F.col("key").alias("user_id"),
                F.date_format("session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                .alias("session_start"),
                "n_events",
            )
            out, ckpt = os.path.join(work, "out"), os.path.join(work, "ckpt")
            q_ = (
                sess.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q_.awaitTermination()
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev_tz)
        return spark.read.parquet(out)
    q["streaming_sessions"] = q_streaming_sessions

    def q_streaming_attribution(spark, sf):
        """Stream-stream interval join (the attribution join): each view
        paired with the same user's purchases within 24 h after it.
        Inner joins emit on match, so the drained result equals the
        batch interval join exactly."""
        from uckg_spark.streaming.pages_stream import stream_interval_join

        stream, work = _staged_stream(spark, sf, "events")
        stream2, _ = _staged_stream(spark, sf, "events")
        prev_tz = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        try:
            views = stream.where(F.col("event_type") == "view").select(
                "user_id", F.col("ts").cast("timestamp").alias("ts")
            )
            buys = stream2.where(F.col("event_type") == "purchase").select(
                "user_id", F.col("ts").cast("timestamp").alias("ts")
            )
            joined = stream_interval_join(
                views, buys, "user_id", "ts", horizon="24 hours"
            ).select(
                F.col("key").alias("user_id"),
                F.date_format("l_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                .alias("view_ts"),
                F.date_format("r_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                .alias("purchase_ts"),
            )
            out, ckpt = os.path.join(work, "out"), os.path.join(work, "ckpt")
            q_ = (
                joined.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q_.awaitTermination()
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev_tz)
        return spark.read.parquet(out)
    q["streaming_attribution"] = q_streaming_attribution

    def q_catalog_mor(spark, sf):
        """Merge-on-read catalog semantics end to end (the Iceberg v2
        equality-delete analog, `sources/catalog.py`): base snapshot →
        MoR upsert (k%7) → chained MoR re-upsert (k%21, must override
        the first) → equality delete (k%13, must kill base AND upserted
        rows) — then the net table through the real delete-file-applying
        read path (two anti-join-ordered delete files + three data dirs
        at distinct sequence numbers). The oracle reproduces the net
        state with CASE/WHERE algebra, so the row checks the
        sequence-ordering semantics, not just row plumbing. The temp
        catalog stays on disk for the session: the result reads its
        parquet lazily (same rule as the streaming rows' sinks)."""
        import tempfile

        from uckg_spark.sources.catalog import GraphCatalog

        orders = _t(spark, sf, "orders")
        k = F.col("o_orderkey")

        def fact(df, tag):
            return df.select(
                k.alias("k"),
                F.concat(F.lit(tag), F.col("o_custkey")).alias("v"))

        cat = GraphCatalog(tempfile.mkdtemp(prefix="uckg_mor_q_"))
        cat.write_table("fact", fact(orders, "b:"), n_tasks=4)
        cat.merge_table(spark, "fact",
                        fact(orders.filter(k % 7 == 0), "u1:"),
                        ["k"], n_tasks=2, strategy="mor")
        cat.merge_table(spark, "fact",
                        fact(orders.filter(k % 21 == 0), "u2:"),
                        ["k"], n_tasks=2, strategy="mor")
        cat.delete_rows("fact",
                        orders.filter(k % 13 == 0).select(k.alias("k")),
                        ["k"])
        return cat.read_table(spark, "fact")
    q["catalog_mor"] = q_catalog_mor

    def q_catalog_changelog(spark, sf):
        """Changelog scan (`read_changes`, the Iceberg
        create_changelog_view analog): stage base → MoR upsert (k%7) →
        equality delete (k%13), then read the row-level changes since
        the base snapshot — inserts from exactly the data dirs
        committed in the range, deletes as keys-only rows. This is what
        an incremental downstream consumer reads instead of re-scanning
        the table; cost is O(|changes|). NULL-free per the driver-row
        convention: a delete row's undefined v is '' in both engines."""
        import tempfile

        from uckg_spark.sources.catalog import GraphCatalog

        orders = _t(spark, sf, "orders")
        k = F.col("o_orderkey")

        def fact(df, tag):
            return df.select(
                k.alias("k"),
                F.concat(F.lit(tag), F.col("o_custkey")).alias("v"))

        cat = GraphCatalog(tempfile.mkdtemp(prefix="uckg_cdc_q_"))
        s1 = cat.write_table("fact", fact(orders, "b:"), n_tasks=4)
        cat.merge_table(spark, "fact",
                        fact(orders.filter(k % 7 == 0), "u:"),
                        ["k"], n_tasks=2, strategy="mor")
        cat.delete_rows("fact",
                        orders.filter(k % 13 == 0).select(k.alias("k")),
                        ["k"])
        return (cat.read_changes(spark, "fact", s1)
                .withColumn("v", F.coalesce("v", F.lit(""))))
    q["catalog_changelog"] = q_catalog_changelog

    def q_catalog_evolution(spark, sf):
        """Add-column schema evolution through the catalog read path:
        base snapshot (k, v), then an append that ADDS a column — the
        reader conforms both dirs to the union schema, so pre-evolution
        rows surface the new column as NULL (−1 sentinel per the
        NULL-free driver-row convention)."""
        import tempfile

        from uckg_spark.sources.catalog import GraphCatalog

        orders = _t(spark, sf, "orders")
        k = F.col("o_orderkey")
        cat = GraphCatalog(tempfile.mkdtemp(prefix="uckg_evo_q_"))
        cat.write_table(
            "fact",
            orders.filter(k % 2 == 0).select(
                k.alias("k"),
                F.concat(F.lit("v:"), F.col("o_custkey")).alias("v")),
            n_tasks=4)
        cat.write_table(
            "fact",
            orders.filter(k % 2 == 1).select(
                k.alias("k"),
                F.concat(F.lit("v:"), F.col("o_custkey")).alias("v"),
                F.col("o_custkey").alias("extra")),
            n_tasks=4, mode="append")
        return (cat.read_table(spark, "fact")
                .withColumn("extra", F.coalesce("extra", F.lit(-1))))
    q["catalog_evolution"] = q_catalog_evolution

    def q_catalog_tag(spark, sf):
        """Named refs: tag snapshot v1 ("train-v1"), overwrite the
        table with v2, expire old snapshots — the tag PINS v1's data
        through expiry and the read resolves the name back to exactly
        the v1 row set (the audit/rollback pin: reproduce the table a
        model was trained on)."""
        import tempfile

        from uckg_spark.sources.catalog import GraphCatalog

        orders = _t(spark, sf, "orders")
        k = F.col("o_orderkey")
        cat = GraphCatalog(tempfile.mkdtemp(prefix="uckg_tag_q_"))
        cat.write_table(
            "fact",
            orders.filter(k % 3 == 0).select(
                k.alias("k"),
                F.concat(F.lit("v1:"), F.col("o_custkey")).alias("v")),
            n_tasks=4)
        cat.tag("fact", "train-v1")
        cat.write_table(
            "fact",
            orders.select(
                k.alias("k"),
                F.concat(F.lit("v2:"), F.col("o_custkey")).alias("v")),
            n_tasks=4)
        cat.expire_snapshots("fact", keep_last=1)
        return cat.read_table(
            spark, "fact",
            snapshot_id=cat.resolve_tag("fact", "train-v1"))
    q["catalog_tag"] = q_catalog_tag

    def q_catalog_prune(spark, sf):
        """File-level stats pruning (Iceberg manifest-pruning analog):
        commits record per-data-file footer min/max; a selective key
        range resolves to a SUBSET of files before Spark plans the
        scan. The row filter is re-applied on top (pruning may skip
        work, never rows), so the result equals the plain filtered
        table — which is exactly what the oracle runs. The plan-level
        check (fewer files opened) is pinned by pytest; the driver row
        proves no-rows-lost/none-invented under pruning across an
        append + MoR-merge history."""
        import tempfile

        from uckg_spark.sources.catalog import GraphCatalog

        orders = _t(spark, sf, "orders")
        k = F.col("o_orderkey")

        def fact(df, tag):
            return df.select(
                k.alias("k"),
                F.concat(F.lit(tag), F.col("o_custkey")).alias("v"))

        cat = GraphCatalog(tempfile.mkdtemp(prefix="uckg_prune_q_"))
        # range-disjoint files: sort by k so footer min/max actually cut
        lo_half = fact(orders.filter(k % 2 == 0), "b:") \
            .repartitionByRange(4, "k")

        def write(path):
            from pyspark.sql import Observation
            obs = Observation()
            lo_half.observe(obs, F.count(F.lit(1)).alias("n")) \
                .write.mode("overwrite").parquet(path)
            return int(obs.get["n"])

        cat._write_snapshot(
            "fact", write, "overwrite",
            schema=[[c, t] for c, t in lo_half.dtypes])
        cat.write_table("fact", fact(orders.filter(k % 2 == 1), "a:"),
                        n_tasks=4, mode="append")
        cat.merge_table(spark, "fact",
                        fact(orders.filter(k % 7 == 0), "u:"),
                        ["k"], n_tasks=2, strategy="mor")
        hi = 2000
        return (cat.read_table(spark, "fact", prune={"k": (None, hi)})
                .filter(F.col("k") <= hi))
    q["catalog_prune"] = q_catalog_prune

    def q_video_metadata(spark, sf):
        # end-to-end ISO-BMFF round-trip ON EXECUTORS: a deterministic
        # MP4 container is assembled per doc inside the Arrow batch
        # (build_mp4), then parse_mp4 walks the box tree and recovers
        # the structural metadata. The oracle recomputes every field as
        # pure integer arithmetic from doc_id, so drift in EITHER the
        # builder or the parser breaks the value hash. Payloads live and
        # die inside one mapInPandas batch — nothing binary is shuffled.
        from uckg_spark.operators.multimodal import build_mp4, parse_mp4

        docs = _t(spark, sf, "documents").select("doc_id")
        schema = ("media_id bigint, width int, height int, n_frames int, "
                  "duration_ms bigint, n_tracks int, brand string")

        def batches(it):
            import pandas as pd

            for pdf in it:
                rows = []
                for raw in pdf["doc_id"]:
                    i = int(raw)
                    meta = parse_mp4(build_mp4(
                        160 + (i % 32) * 8, 90 + (i % 18) * 6,
                        24 + i % 240))
                    rows.append((i, meta["width"], meta["height"],
                                 meta["n_frames"],
                                 int(round(meta["duration_s"] * 1000)),
                                 meta["n_tracks"], meta["brand"]))
                yield pd.DataFrame(rows, columns=[
                    "media_id", "width", "height", "n_frames",
                    "duration_ms", "n_tracks", "brand"])

        return docs.mapInPandas(batches, schema)
    q["video_metadata"] = q_video_metadata

    def q_audio_metadata(spark, sf):
        # the audio twin of video_metadata: deterministic CBR MP3 frame
        # sequences assembled and parsed back inside the Arrow batch;
        # integer-only output fields so the SQL oracle is exact integer
        # arithmetic (duration is derivable: n_frames*1152/rate).
        from uckg_spark.operators.multimodal import build_mp3, parse_mp3

        docs = _t(spark, sf, "documents").select("doc_id")
        schema = ("media_id bigint, rate int, bitrate_kbps int, "
                  "n_frames int, channels int")

        def batches(it):
            import pandas as pd

            for pdf in it:
                rows = []
                for raw in pdf["doc_id"]:
                    i = int(raw)
                    meta = parse_mp3(build_mp3(
                        n_frames=2 + i % 60,
                        bitrate_idx=1 + i % 14,
                        samplerate_idx=i % 3))
                    rows.append((i, meta["rate"], meta["bitrate_kbps"],
                                 meta["n_frames"], meta["channels"]))
                yield pd.DataFrame(rows, columns=[
                    "media_id", "rate", "bitrate_kbps", "n_frames",
                    "channels"])

        return docs.mapInPandas(batches, schema)
    q["audio_metadata"] = q_audio_metadata

    def q_dedup_paragraphs(spark, sf):
        # CCNet-style paragraph-level boilerplate removal. documents.text
        # carries no newlines, so the paragraphed corpus is constructed
        # deterministically IN the query (both engines build the same
        # bytes): a per-source subscribe header, the doc's own text, and
        # a doc_id%3 copyright footer. min_docs=5 cuts the header/footer
        # boilerplate (and any prose repeated across >=5 docs — the
        # documents table plants exact dups) while unique prose survives.
        from uckg_spark.operators.webtext import dedup_paragraphs

        d = _t(spark, sf, "documents")
        inp = d.select(
            "doc_id",
            F.concat_ws(
                "\n\n",
                F.concat(F.lit("Subscribe to the "), F.col("source"),
                         F.lit(" newsletter")),
                F.col("text"),
                F.concat(F.lit("copyright footer "),
                         (F.col("doc_id") % 3).cast("string")),
            ).alias("text"),
        )
        return dedup_paragraphs(inp, min_docs=5)
    q["dedup_paragraphs"] = q_dedup_paragraphs

    def q_semantic_dedup(spark, sf):
        # SemDeDup: same deterministic quantizer as ann_ivf_topk
        # (hash-stratified seeds + one fixed-point k-means pass over the
        # 1/4 id-stratified sample), then within-cluster pairwise cosine
        # with the keep-farthest-from-centroid rule. 0.35 matches the
        # embed_near_dup threshold (non-vacuous at every SF).
        from uckg_spark.operators.similarity import (
            ivf_centroids_hashed, ivf_refine_centroids, semantic_dedup)

        emb = _t(spark, sf, "embeddings")
        cents = ivf_refine_centroids(
            emb, ivf_centroids_hashed(emb, 16), iters=1,
            sample_mod=IVF_SAMPLE_MOD)
        return semantic_dedup(emb, cents, threshold=0.35)
    q["semantic_dedup"] = q_semantic_dedup

    return q


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB)
# ---------------------------------------------------------------------------


def _stopword_sql(lang_words: list[str], over: str = "lower(text)") -> str:
    pat = r"\b(" + "|".join(lang_words) + r")\b"
    return f"len(regexp_extract_all({over}, '{pat}'))"


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    o["explode_tokens"] = """
        SELECT token, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        WHERE token <> '' GROUP BY token
    """

    o["broadcast_lookup_join"] = """
        SELECT (p.p_partkey IS NOT NULL) AS dictionary_found, p.p_brand,
               count(*) AS n, round(sum(l.l_quantity), 2) AS sum_qty
        FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    """

    o["semi_join"] = """
        SELECT c_mktsegment, count(*) AS n_customers FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY c_mktsegment
    """

    o["anti_join"] = """
        SELECT c_mktsegment, count(*) AS n_customers FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 400000)
        GROUP BY c_mktsegment
    """

    o["inner_fk_join"] = """
        SELECT n_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n_name
    """

    o["self_join"] = """
        SELECT a.n_name AS nation_a, b.n_name AS nation_b
        FROM nation a JOIN nation b
          ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """

    o["window_dedup"] = """
        SELECT user_id, event_id, event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
        FROM (SELECT *, row_number() OVER
                (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events)
        WHERE rn = 1
    """

    o["global_dedup"] = """
        SELECT event_type, count(*) AS n_users
        FROM (SELECT DISTINCT user_id, event_type FROM events)
        GROUP BY event_type
    """

    o["union_dedup"] = """
        SELECT substr(name, 1, 1) AS initial, count(*) AS n
        FROM (SELECT DISTINCT name FROM (
            SELECT c_name AS name FROM customer
            UNION ALL SELECT s_name AS name FROM supplier))
        GROUP BY initial
    """

    o["group_concat"] = """
        SELECT r_name, string_agg(n_name, '|' ORDER BY n_name) AS nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """

    o["uri_template"] = """
        SELECT o_orderkey,
               'http://purl.org/cyber/uco#ORDER-' || o_orderkey AS uri
        FROM orders WHERE o_orderkey < 200
    """

    o["datetime_format"] = """
        SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S.%g') AS ts_iso
        FROM events WHERE event_id < 500
    """

    o["null_drop"] = """
        SELECT et, count(*) AS n
        FROM (SELECT nullif(event_type, 'view') AS et FROM events)
        WHERE et IS NOT NULL GROUP BY et
    """

    o["first_element"] = """
        SELECT string_split(text, ' ')[1] AS first_token, count(*) AS n
        FROM documents GROUP BY first_token
    """

    o["sha256"] = """
        SELECT doc_id, sha256(text) AS digest FROM documents WHERE doc_id < 100
    """

    o["topk"] = """
        SELECT o_orderkey, round(o_totalprice, 2) AS price
        FROM orders ORDER BY price DESC, o_orderkey LIMIT 10
    """

    o["salted_agg"] = """
        SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
        FROM events GROUP BY user_id
    """

    o["salted_distinct"] = """
        SELECT DISTINCT user_id, event_type FROM events
    """

    o["subsumption_closure"] = """
        WITH RECURSIVE e AS (
            SELECT 'cust:' || c_custkey::VARCHAR AS child,
                   'nation:' || c_nationkey::VARCHAR AS parent FROM customer
            UNION ALL
            SELECT 'nation:' || n_nationkey::VARCHAR,
                   'region:' || n_regionkey::VARCHAR FROM nation
            UNION ALL
            SELECT 'region:' || r_regionkey::VARCHAR, 'world' FROM region
        ), tc(child, parent) AS (
            SELECT child, parent FROM e
            UNION
            SELECT tc.child, e.parent FROM tc JOIN e ON tc.parent = e.child
        )
        SELECT child AS descendant, parent AS ancestor FROM tc
    """

    o["event_window"] = """
        SELECT strftime(to_timestamp(floor(epoch(ts) / 600) * 600),
                        '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type, count(*) AS n
        FROM events GROUP BY 1, 2
    """

    o["json_props"] = """
        SELECT (props::JSON ->> 'k')::INT AS k, count(*) AS n
        FROM events GROUP BY k
    """

    o["dedup_exact"] = """
        SELECT md5(text) AS digest, min(doc_id) AS keeper_id, count(*) AS n
        FROM documents GROUP BY digest
    """

    # minhash: min over distinct word-3-gram shingles of h32(i || ':' || sh)
    # (unnest(list_transform(range(...))) — DuckDB 1.0 can't lateral-join
    # generate_series on a column)
    shingle_cte = f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ), sh AS (
            SELECT DISTINCT doc_id,
                   unnest(list_transform(
                       range(1, greatest(len(t) - {SHINGLE_N - 1}, 0) + 1),
                       i -> array_to_string(t[i:i+{SHINGLE_N - 1}], ' '))) AS s
            FROM toks
        )
    """
    # hash j = digest slice j%4 of md5(f"{j//4}:" + shingle) — mirrors
    # uckg_spark.operators.dedup.minhash_signatures exactly
    mh_cols = ", ".join(
        "min((('0x' || substr(md5('{p}:' || s), {off}, 8))::BIGINT)) AS mh{j}".format(
            p=j // 4, off=8 * (j % 4) + 1, j=j
        )
        for j in range(N_MINHASH)
    )
    o["dedup_minhash"] = f"""
        {shingle_cte}
        SELECT doc_id, {mh_cols} FROM sh GROUP BY doc_id
    """

    bit_terms = " + ".join(
        f"(CASE WHEN sum(CASE WHEN (({_h32_sql('tk')} >> {b}) & 1) = 1 "
        f"THEN 1 ELSE -1 END) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    o["dedup_simhash"] = f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents
        )
        SELECT doc_id, ({bit_terms})::BIGINT AS simhash
        FROM tok WHERE tk <> '' GROUP BY doc_id
    """

    o["ngram_jaccard"] = f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t
            FROM documents WHERE doc_id < 200
        ), sh AS (
            SELECT DISTINCT doc_id,
                   unnest(list_transform(
                       range(1, greatest(len(t) - {SHINGLE_N - 1}, 0) + 1),
                       i -> array_to_string(t[i:i+{SHINGLE_N - 1}], ' '))) AS s
            FROM toks
        ), sizes AS (
            SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.2
    """

    o["ann_cosine_topk"] = """
        WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               round(list_dot_product(embedding::DOUBLE[], qv)
                     / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                        * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
        FROM embeddings, q
        ORDER BY cos_sim DESC, vec_id LIMIT 10
    """

    ivf_sums = ", ".join(
        f"sum(floor((e.embedding::DOUBLE[])[{d + 1}] * 1048576.0))::BIGINT AS s{d}"
        for d in range(EMB_DIM)
    )
    ivf_refined_list = ", ".join(
        f"(cl.s{d}::DOUBLE / cl.n) / 1048576.0" for d in range(EMB_DIM)
    )
    # hash-stratified seed pick: the 16 rows minimizing (h32(id), id) —
    # mirrors ivf_centroids_hashed exactly
    ivf_seed_cte = f"""cent0 AS (
            SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv
            FROM embeddings
            ORDER BY {_h32_sql('vec_id::VARCHAR')}, vec_id LIMIT 16)"""
    o["ann_ivf_topk"] = f"""
        WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        {ivf_seed_cte},
        -- ONE deterministic k-means pass (mirrors ivf_refine_centroids):
        -- assign to seed cells, per-cell mean via FIXED-POINT sums
        -- (floor(x*2^20) as bigint — order-independent, so both engines
        -- compute bit-identical refined centroids); empty cells keep
        -- seeds. Refinement runs over the deterministic 1/{IVF_SAMPLE_MOD}
        -- id-stratified sample, exactly as the Spark operator does.
        esample AS (
            SELECT vec_id, embedding FROM embeddings
            WHERE vec_id % {IVF_SAMPLE_MOD} = 0
        ),
        scored0 AS (
            SELECT e.vec_id, c.c_id,
                   list_dot_product(e.embedding::DOUBLE[], c.cv)
                   / sqrt(list_dot_product(c.cv, c.cv)) AS cos_c
            FROM esample e, cent0 c
        ),
        assign0 AS (
            SELECT vec_id, c_id AS centroid_id
            FROM (SELECT vec_id, c_id,
                         row_number() OVER (PARTITION BY vec_id
                                            ORDER BY cos_c DESC, c_id) AS rn
                  FROM scored0)
            WHERE rn = 1
        ),
        cells AS (
            SELECT a.centroid_id AS c_id, count(*) AS n, {ivf_sums}
            FROM esample e JOIN assign0 a USING (vec_id)
            GROUP BY 1
        ),
        cent AS (
            SELECT c0.c_id,
                   CASE WHEN cl.c_id IS NULL THEN c0.cv
                        ELSE [{ivf_refined_list}] END AS cv
            FROM cent0 c0 LEFT JOIN cells cl USING (c_id)
        ),
        -- probe/assignment ranking drops the norm of the FIXED side (a
        -- common positive factor): order equals full cosine, and the SQL
        -- mirrors the Spark operator's arithmetic bit-for-bit
        probes AS (
            SELECT c_id FROM cent, q
            ORDER BY list_dot_product(cv, qv) / sqrt(list_dot_product(cv, cv))
                     DESC, c_id
            LIMIT 4
        ),
        scored AS (
            SELECT e.vec_id, c.c_id,
                   list_dot_product(e.embedding::DOUBLE[], c.cv)
                   / sqrt(list_dot_product(c.cv, c.cv)) AS cos_c
            FROM embeddings e, cent c
        ),
        assign AS (
            SELECT vec_id, c_id AS centroid_id
            FROM (SELECT vec_id, c_id,
                         row_number() OVER (PARTITION BY vec_id
                                            ORDER BY cos_c DESC, c_id) AS rn
                  FROM scored)
            WHERE rn = 1
        )
        SELECT e.vec_id, a.centroid_id,
               round(list_dot_product(e.embedding::DOUBLE[], qv)
                     / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                        * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
        FROM embeddings e JOIN assign a USING (vec_id), q
        WHERE a.centroid_id IN (SELECT c_id FROM probes)
        ORDER BY list_dot_product(e.embedding::DOUBLE[], qv)
                 / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(qv, qv))) DESC, e.vec_id
        LIMIT 10
    """

    # semantic_dedup: identical quantizer chain as ann_ivf_topk (seeds,
    # sampled fixed-point refinement, full-corpus assignment), then the
    # SemDeDup tail. cos-to-centroid mirrors the Spark fold's
    # parenthesization exactly — (dot/|c|)/|v|, NOT dot/(|v|*|c|) — so
    # the dominance comparison (b.cosc < a.cosc) sees bit-identical
    # doubles in both engines.
    o["semantic_dedup"] = f"""
        WITH {ivf_seed_cte},
        esample AS (
            SELECT vec_id, embedding FROM embeddings
            WHERE vec_id % {IVF_SAMPLE_MOD} = 0
        ),
        scored0 AS (
            SELECT e.vec_id, c.c_id,
                   list_dot_product(e.embedding::DOUBLE[], c.cv)
                   / sqrt(list_dot_product(c.cv, c.cv)) AS cos_c
            FROM esample e, cent0 c
        ),
        assign0 AS (
            SELECT vec_id, c_id AS centroid_id
            FROM (SELECT vec_id, c_id,
                         row_number() OVER (PARTITION BY vec_id
                                            ORDER BY cos_c DESC, c_id) AS rn
                  FROM scored0)
            WHERE rn = 1
        ),
        cells AS (
            SELECT a.centroid_id AS c_id, count(*) AS n, {ivf_sums}
            FROM esample e JOIN assign0 a USING (vec_id)
            GROUP BY 1
        ),
        cent AS (
            SELECT c0.c_id,
                   CASE WHEN cl.c_id IS NULL THEN c0.cv
                        ELSE [{ivf_refined_list}] END AS cv
            FROM cent0 c0 LEFT JOIN cells cl USING (c_id)
        ),
        scored AS (
            SELECT e.vec_id, c.c_id,
                   list_dot_product(e.embedding::DOUBLE[], c.cv)
                   / sqrt(list_dot_product(c.cv, c.cv)) AS cos_rank
            FROM embeddings e, cent c
        ),
        assign AS (
            SELECT vec_id, c_id AS cell
            FROM (SELECT vec_id, c_id,
                         row_number() OVER (PARTITION BY vec_id
                                            ORDER BY cos_rank DESC, c_id) AS rn
                  FROM scored)
            WHERE rn = 1
        ),
        withc AS (
            SELECT e.vec_id, a.cell, e.embedding::DOUBLE[] AS v,
                   (list_dot_product(e.embedding::DOUBLE[], c.cv)
                    / sqrt(list_dot_product(c.cv, c.cv)))
                   / sqrt(list_dot_product(e.embedding::DOUBLE[],
                                           e.embedding::DOUBLE[])) AS cosc
            FROM embeddings e
            JOIN assign a USING (vec_id)
            JOIN cent c ON a.cell = c.c_id
        ),
        dropped AS (
            SELECT DISTINCT a.vec_id
            FROM withc a JOIN withc b
              ON a.cell = b.cell AND a.vec_id <> b.vec_id
            WHERE list_dot_product(a.v, b.v)
                  / (sqrt(list_dot_product(a.v, a.v))
                     * sqrt(list_dot_product(b.v, b.v))) >= 0.35
              AND (b.cosc < a.cosc
                   OR (b.cosc = a.cosc AND b.vec_id < a.vec_id))
        )
        SELECT w.vec_id, w.cell::BIGINT AS cell,
               round(w.cosc, 6) AS cos_centroid,
               (d.vec_id IS NULL)::BIGINT AS kept
        FROM withc w LEFT JOIN dropped d ON w.vec_id = d.vec_id
    """

    plane_terms = []
    for p in range(N_PLANES):
        weights = ", ".join(
            f"(CASE WHEN ({_h32_sql(f_lit)} & 1) = 1 THEN 1.0 ELSE -1.0 END)"
            for f_lit in (f"'{p}:{i}'" for i in range(EMB_DIM))
        )
        plane_terms.append(
            f"(CASE WHEN list_dot_product(embedding::DOUBLE[], [{weights}]) > 0 "
            f"THEN {1 << p} ELSE 0 END)"
        )
    o["ann_lsh_bucket"] = f"""
        SELECT vec_id, ({' + '.join(plane_terms)})::BIGINT AS bucket
        FROM embeddings
    """

    bucket_expr = f"({' + '.join(plane_terms)})::BIGINT"
    o["embed_near_dup"] = f"""
        WITH b AS (
            SELECT vec_id, embedding::DOUBLE[] AS v, {bucket_expr} AS bucket
            FROM embeddings
        )
        SELECT a.vec_id AS id_a, c.vec_id AS id_b,
               round(list_dot_product(a.v, c.v)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(c.v, c.v))), 6) AS cos_sim
        FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
        WHERE list_dot_product(a.v, c.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(c.v, c.v))) >= 0.35
    """

    o["minhash_lsh_pairs"] = f"""
        {shingle_cte}, sig AS (
            SELECT doc_id, {mh_cols} FROM sh GROUP BY doc_id
        ), banded AS (
            SELECT doc_id, 0 AS band,
                   mh0::VARCHAR || '_' || mh1::VARCHAR AS bsig FROM sig
            UNION ALL
            SELECT doc_id, 1, mh2::VARCHAR || '_' || mh3::VARCHAR FROM sig
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
    """

    # incremental twin: the FULL-corpus banded pairs restricted to
    # pairs touching the new batch — signatures are per-doc, so the
    # batched computation must produce exactly this set
    o["incremental_pairs"] = f"""
        {shingle_cte}, sig AS (
            SELECT doc_id, {mh_cols} FROM sh GROUP BY doc_id
        ), banded AS (
            SELECT doc_id, 0 AS band,
                   mh0::VARCHAR || '_' || mh1::VARCHAR AS bsig FROM sig
            UNION ALL
            SELECT doc_id, 1, mh2::VARCHAR || '_' || mh3::VARCHAR FROM sig
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
        WHERE a.doc_id % 10 = 0 OR b.doc_id % 10 = 0
    """

    # kmv-union twin: same per-group k-smallest sketches, same
    # explode+dedupe+re-take merge, same estimator read
    o["kmv_union"] = """
        WITH hs AS (
            SELECT DISTINCT o_orderpriority AS grp,
                   ('0x' || substr(md5(o_custkey::VARCHAR), 1, 8))::BIGINT
                       AS h
            FROM orders
        ), sk AS (
            SELECT grp, h FROM (
                SELECT grp, h, row_number() OVER (
                    PARTITION BY grp ORDER BY h) AS r
                FROM hs
            ) WHERE r <= 64
        ), ng AS (
            SELECT count(DISTINCT grp)::BIGINT AS n_groups FROM sk
        ), topk AS (
            SELECT count(*)::BIGINT AS k_used, max(h)::BIGINT AS h_k
            FROM (SELECT DISTINCT h FROM sk ORDER BY h LIMIT 64)
        )
        SELECT ng.n_groups, topk.k_used,
               (CASE WHEN topk.k_used < 64 THEN topk.k_used
                     ELSE (63 * 4294967296) // topk.h_k
                END)::BIGINT AS est_distinct
        FROM topk, ng
    """

    # pair-audit twin: the lsh-pairs CTE + the same md5-ranked 16-pair
    # sample + exact shingle-set intersection
    o["pair_audit"] = f"""
        {shingle_cte}, sig AS (
            SELECT doc_id, {mh_cols} FROM sh GROUP BY doc_id
        ), banded AS (
            SELECT doc_id, 0 AS band,
                   mh0::VARCHAR || '_' || mh1::VARCHAR AS bsig FROM sig
            UNION ALL
            SELECT doc_id, 1, mh2::VARCHAR || '_' || mh3::VARCHAR FROM sig
        ), pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bsig = b.bsig
             AND a.doc_id < b.doc_id
        ), sample AS (
            SELECT doc_a, doc_b FROM pairs
            ORDER BY md5(doc_a::VARCHAR || ':' || doc_b::VARCHAR)
            LIMIT 16
        ), sizes AS (
            SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY doc_id
        ), inter AS (
            SELECT smp.doc_a, smp.doc_b, count(*)::BIGINT AS inter
            FROM sample smp
            JOIN sh x ON x.doc_id = smp.doc_a
            JOIN sh y ON y.doc_id = smp.doc_b AND y.s = x.s
            GROUP BY smp.doc_a, smp.doc_b
        )
        SELECT i.doc_a, i.doc_b, i.inter,
               (na.n + nb.n - i.inter)::BIGINT AS uni
        FROM inter i
        JOIN sizes na ON na.doc_id = i.doc_a
        JOIN sizes nb ON nb.doc_id = i.doc_b
    """

    o["dedup_exact_apply"] = """
        SELECT doc_id FROM (
            SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS k
            FROM documents
        ) WHERE doc_id = k
    """

    # pairs CTE identical to minhash_lsh_pairs, then components over the
    # pair graph (numeric labels — same partition as the operator's string
    # labels) and min-doc_id keeper per cluster + unpaired docs
    o["near_dup_keepers"] = f"""
        {shingle_cte.replace("WITH toks", "WITH RECURSIVE toks")}, sig AS (
            SELECT doc_id, {mh_cols} FROM sh GROUP BY doc_id
        ), banded AS (
            SELECT doc_id, 0 AS band,
                   mh0::VARCHAR || '_' || mh1::VARCHAR AS bsig FROM sig
            UNION ALL
            SELECT doc_id, 1, mh2::VARCHAR || '_' || mh3::VARCHAR FROM sig
        ), pr AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
        ), sym AS (
            SELECT doc_a AS a, doc_b AS b FROM pr
            UNION SELECT doc_b, doc_a FROM pr
        ), walk(node, lab) AS (
            SELECT a, a FROM (SELECT DISTINCT a FROM sym)
            UNION
            SELECT s.b, w.lab FROM walk w JOIN sym s ON s.a = w.node
        ), comp AS (
            SELECT node, min(lab) AS component FROM walk GROUP BY node
        ), keepers AS (
            SELECT component, min(node) AS keeper FROM comp GROUP BY component
        )
        SELECT c.node AS doc_id, k.keeper AS cluster_id
        FROM comp c JOIN keepers k ON c.component = k.component
        WHERE c.node = k.keeper
        UNION ALL
        SELECT d.doc_id, d.doc_id
        FROM documents d
        WHERE NOT EXISTS (SELECT 1 FROM comp WHERE comp.node = d.doc_id)
    """

    o["simhash_duplicates"] = f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents
        ), fp AS (
            SELECT doc_id, ({bit_terms})::BIGINT AS simhash
            FROM tok WHERE tk <> '' GROUP BY doc_id
        )
        SELECT simhash,
               array_to_string(list_sort(list(doc_id)), '|') AS doc_ids,
               count(*) AS n
        FROM fp GROUP BY simhash HAVING count(*) > 1
    """

    nd_bit_terms = " + ".join(
        f"(CASE WHEN sum(CASE WHEN (({_h32_sql('tk')} >> {b}) & 1) = 1 "
        f"THEN 1 ELSE -1 END) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(SIMHASH_ND_BITS)
    )
    n_chunks = SIMHASH_K + 1
    chunk_w = SIMHASH_ND_BITS // n_chunks
    chunk_branches = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {c} AS chunk, "
        f"(simhash >> {c * chunk_w}) & "
        f"{(1 << (SIMHASH_ND_BITS - c * chunk_w if c == n_chunks - 1 else chunk_w)) - 1}"
        f" AS cval FROM fp"
        for c in range(n_chunks)
    )
    o["simhash_near_dup"] = f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents
        ), fp AS (
            SELECT doc_id, ({nd_bit_terms})::BIGINT AS simhash
            FROM tok WHERE tk <> '' GROUP BY doc_id
        ), banded AS (
            {chunk_branches}
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
        FROM banded a JOIN banded b
          ON a.chunk = b.chunk AND a.cval = b.cval AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_K}
    """

    o["connected_components"] = """
        WITH RECURSIVE e AS (
            SELECT 'doc:' || doc_id AS src,
                   'tok:' || string_split(text, ' ')[1] AS dst FROM documents
            UNION ALL
            SELECT 'doc:' || doc_id,
                   'tok:' || string_split(text, ' ')[-1] FROM documents
        ), sym AS (
            SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e
        ), walk(node, lab) AS (
            SELECT a, a FROM (SELECT DISTINCT a FROM sym)
            UNION
            SELECT s.b, w.lab FROM walk w JOIN sym s ON s.a = w.node
        )
        SELECT node, min(lab) AS component FROM walk GROUP BY node
    """

    o["canonical_map"] = """
        WITH RECURSIVE e AS (
            SELECT 'surface:' || lower(string_split(text, ' ')[1]) AS src,
                   'ent:' || (doc_id % 97)::VARCHAR AS dst
            FROM documents
        ), sym AS (
            SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e
        ), walk(node, lab) AS (
            SELECT a, a FROM (SELECT DISTINCT a FROM sym)
            UNION
            SELECT s.b, w.lab FROM walk w JOIN sym s ON s.a = w.node
        ), comp AS (
            SELECT node, min(lab) AS component FROM walk GROUP BY node
        ), rep AS (
            SELECT component,
                   coalesce(min(CASE WHEN node NOT LIKE 'surface:%'
                                THEN node END), min(node)) AS canonical
            FROM comp GROUP BY component
        )
        SELECT c.node AS member, r.canonical AS canonical
        FROM comp c JOIN rep r ON c.component = r.component
    """

    o["streaming_mention_rate"] = """
        -- append-mode emission rule: a window is emitted iff its END is
        -- <= the final watermark (max event time - 30 min). Bucketing
        -- floors by MILLISECOND like Spark's window(): epoch_ms // 600000
        -- (epoch(ts)::BIGINT would ROUND the fractional second and shift
        -- boundary events into the next window).
        WITH m AS (SELECT epoch_ms(max(ts))::BIGINT AS mxms FROM events),
        b AS (
            SELECT ((epoch_ms(ts) // 600000) * 600)::BIGINT AS ws,
                   (user_id % 5)::VARCHAR AS lang
            FROM events
        )
        SELECT strftime(make_timestamp(ws * 1000000),
                        '%Y-%m-%d %H:%M:%S') AS window_start,
               lang, count(*) AS n_pages
        FROM b, m
        WHERE (ws + 600) * 1000 <= mxms - 1800000
        GROUP BY 1, 2
    """

    o["streaming_sessions"] = """
        -- batch replay of the streaming session assembly: new session
        -- when the gap to the previous event is >= 6 h (session_window
        -- merges strictly-overlapping [t, t+gap) intervals), emitted iff
        -- session_end (last event + gap) <= final watermark (ms-floored
        -- max event time - 12 h), all compared in integer microseconds
        WITH m AS (
            SELECT (epoch_ms(max(ts)) - 43200000) * 1000 AS wm_us
            FROM events
        ), s AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                >= 21600000000
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), g AS (
            SELECT user_id, ts,
                   sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
            FROM s
        ), agg AS (
            SELECT user_id, min(ts) AS st, max(ts) AS en,
                   count(*)::BIGINT AS n_events
            FROM g GROUP BY user_id, sid
        )
        SELECT user_id,
               strftime(st, '%Y-%m-%d %H:%M:%S.%f') AS session_start,
               n_events
        FROM agg, m
        WHERE epoch_us(en) + 21600000000 <= wm_us
    """

    # stream-stream inner interval join == the batch interval join
    # (inner joins emit on match; watermarks only bound state)
    o["streaming_attribution"] = """
        SELECT v.user_id,
               strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts
        FROM events v
        JOIN events p
          ON p.user_id = v.user_id
         AND p.event_type = 'purchase'
         AND p.ts >= v.ts
         AND p.ts <= v.ts + INTERVAL 24 HOUR
        WHERE v.event_type = 'view'
    """

    o["knn_join_pandas"] = """
        WITH q AS (
            SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
            FROM embeddings WHERE vec_id IN (1, 2, 3)
        ), s AS (
            SELECT q.qid AS query_id, e.vec_id,
                   round(list_dot_product(e.embedding::DOUBLE[], q.qv)
                         / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                  e.embedding::DOUBLE[]))
                            * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
            FROM embeddings e, q
        ), r AS (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rn
            FROM s
        )
        SELECT query_id, vec_id, cos_sim FROM r WHERE rn <= 5
    """

    o["extract_features"] = """
        WITH m AS (
            SELECT doc_id AS media_id,
                   ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
                   text
            FROM documents
        )
        SELECT media_id, kind,
               strlen(text)::INT AS n_bytes,
               sha256(text) AS digest,
               ('0x' || substr(CASE kind
                               WHEN 'image' THEN sha256(text)
                               WHEN 'audio' THEN sha256('audio:' || text)
                               ELSE sha256('video:' || text) END, 1, 2))::INT
                   AS f0_byte,
               (CASE kind WHEN 'image' THEN 8 WHEN 'audio' THEN 4
                ELSE 6 END) AS feat_dim
        FROM m
    """

    # resize twin: text payloads are never PNGs, so every row is the
    # fallback — p0 is digest byte 0 (pixels cycle the 32 digest bytes),
    # shape constants are 4*4*3 px and -1/-1 source-dim sentinels
    o["resize_images"] = """
        SELECT doc_id AS media_id,
               'image' AS kind,
               -1 AS src_w,
               -1 AS src_h,
               48 AS n_px,
               ('0x' || substr(sha256(text), 1, 2))::INT AS p0_byte,
               FALSE AS decoded
        FROM documents
    """

    o["sessionize"] = """
        WITH g AS (
            SELECT user_id, event_id, value, ts,
                   CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
                        THEN 1
                        WHEN lag(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
        ), s AS (
            -- ::BIGINT: DuckDB's window sum is HUGEINT — the harness's
            -- pandas/Arrow fetch converts HUGEINT to float64/decimal128
            -- (verified: 3 -> 3.0), so Spark's bigint 1 hashed != oracle's
            -- 1.0 despite identical values. The ONLY uncast HUGEINT output
            -- column across all oracle queries (round-2 red cell).
            SELECT user_id, value,
                   (sum(new_sess) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING))::BIGINT
                       AS session_id
            FROM g
        )
        SELECT user_id, session_id, count(*) AS n_events,
               round(sum(round(value * 100))::BIGINT / 100.0, 2)
                   AS session_value
        FROM s GROUP BY user_id, session_id
    """

    from uckg_spark.operators.textstats import STOPWORDS

    ntok = "len(list_filter(string_split(text, ' '), x -> x <> ''))"
    score_exprs = {
        lang: f"({_stopword_sql(words)} * 1.0 / greatest({ntok}, 1))"
        for lang, words in sorted(STOPWORDS.items())
    }
    # argmax with (score desc, lang asc) tie-break via struct min of
    # (-score, lang) — mirrors textstats.language_scores exactly
    pairs = ", ".join(
        f"{{'neg': -{expr}, 'lang': '{lang}'}}" for lang, expr in score_exprs.items()
    )
    score_cols = ", ".join(
        f"round({expr}, 6) AS score_{lang}" for lang, expr in score_exprs.items()
    )
    o["lang_id"] = f"""
        SELECT doc_id, list_min([{pairs}]).lang AS lang_guess, {score_cols}
        FROM documents
    """

    stop_en = _stopword_sql(STOPWORDS["en"])
    # exact parts-per-million integer arithmetic — mirrors
    # uckg_spark.operators.textstats.quality_scores bit-for-bit
    o["quality"] = f"""
        WITH base AS (
            SELECT doc_id,
                   {ntok}::BIGINT AS ntok,
                   length(text)::BIGINT AS nchars,
                   len(regexp_extract_all(text, '[^\\w\\s]'))::BIGINT AS punct,
                   len(regexp_extract_all(text, '[A-Z]'))::BIGINT AS upper,
                   {stop_en}::BIGINT AS stop_en
            FROM documents
        ), e6 AS (
            SELECT doc_id, ntok, punct, upper,
                   least(nchars, 500) * 2000 AS len_norm_e6,
                   least((5000000 * stop_en) // greatest(ntok, 1), 1000000) AS stop_ratio_e6,
                   (1000000 * punct) // greatest(nchars, 1) AS punct_ratio_e6
            FROM base
        )
        SELECT doc_id, ntok AS n_tokens, punct AS n_punct, upper AS n_upper,
               len_norm_e6, stop_ratio_e6, punct_ratio_e6,
               (4 * len_norm_e6 + 3 * stop_ratio_e6
                + 3 * (1000000 - punct_ratio_e6)) // 10 AS quality_e6
        FROM e6
    """

    o["token_count"] = f"""
        SELECT doc_id,
               {ntok} AS ws_tokens,
               len(regexp_extract_all(text, '[A-Za-z0-9]+|[^\\sA-Za-z0-9]')) AS bpeish_tokens
        FROM documents
    """

    o["fingerprint"] = f"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, len(t) + 1),
                       i -> (i * {_h32_sql('t[i]')}) % {FP_MOD})) AS term
            FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        )
        SELECT doc_id, (sum(term) % {FP_MOD})::BIGINT AS fingerprint
        FROM tok GROUP BY doc_id
    """

    # webtext curation family (operators/webtext.py) — exact-integer e6
    # scores, same convention as quality
    o["repetition"] = f"""
        WITH toks AS (
            SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents
        ), base AS (
            SELECT doc_id, len(t)::BIGINT AS n_tokens,
                   len(list_distinct(t))::BIGINT AS n_distinct
            FROM toks
        ), grams AS (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, greatest(len(t) - 1, 0) + 1),
                       i -> array_to_string(t[i:i+1], ' '))) AS gram
            FROM toks
        ), cnt AS (
            SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2
        ), tops AS (
            SELECT doc_id, max(c) AS topc FROM cnt GROUP BY 1
        )
        SELECT b.doc_id, n_tokens,
               ((1000000 * (n_tokens - n_distinct))
                // greatest(n_tokens, 1))::BIGINT AS dup_token_frac_e6,
               coalesce(topc, 0)::BIGINT AS top_2gram_count,
               ((1000000 * 2 * coalesce(topc, 0))
                // greatest(n_tokens, 1))::BIGINT AS top_2gram_frac_e6
        FROM base b LEFT JOIN tops USING (doc_id)
    """

    o["dup_shingles"] = """
        WITH toks AS (
            SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents
        ), sh AS (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, greatest(len(t) - 4, 0) + 1),
                       i -> array_to_string(t[i:i+4], ' '))) AS shingle
            FROM toks
        )
        SELECT shingle, count(DISTINCT doc_id)::BIGINT AS n_docs,
               count(*)::BIGINT AS n_occurrences
        FROM sh GROUP BY shingle
        HAVING count(DISTINCT doc_id) >= 2
    """

    o["url_normalize"] = r"""
        WITH u AS (
            SELECT doc_id,
                   (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END)
                   || '://WWW.' || source || '.Example.COM'
                   || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
                   || '/Docs/' || doc_id
                   || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END)
                   || (CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END) AS url
            FROM documents
        ), parts AS (
            SELECT doc_id, url,
                   lower(regexp_extract(url,
                       '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
                   lower(regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)', 1)) AS host,
                   regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/:?#]*:(\d+)', 1) AS port,
                   regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)', 1) AS pathq
            FROM u
        )
        SELECT doc_id, url,
               scheme || '://' || host
               || (CASE WHEN port = ''
                         OR (scheme = 'http' AND port = '80')
                         OR (scheme = 'https' AND port = '443')
                   THEN '' ELSE ':' || port END)
               || (CASE WHEN pathq = '' THEN '/'
                        WHEN length(pathq) > 1 AND pathq LIKE '%/'
                        THEN substr(pathq, 1, length(pathq) - 1)
                        ELSE pathq END) AS url_norm,
               host
        FROM parts
    """

    # APPLY phase of exact-substring dedup: drop every token covered by a
    # cross-doc duplicated 5-gram (n_docs >= 2), keep order. Equal-length
    # unnests zip in DuckDB, giving (pos, shingle) pairs.
    o["dedup_span_apply"] = """
        WITH toks AS (
            SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents
        ), sh AS (
            SELECT doc_id,
                   unnest(range(1, greatest(len(t) - 4, 0) + 1)) AS pos,
                   unnest(list_transform(
                       range(1, greatest(len(t) - 4, 0) + 1),
                       i -> array_to_string(t[i:i+4], ' '))) AS shingle
            FROM toks
        ), dup AS (
            SELECT shingle FROM sh
            GROUP BY shingle HAVING count(DISTINCT doc_id) >= 2
        ), st AS (
            SELECT doc_id, list(pos) AS starts
            FROM sh JOIN dup USING (shingle) GROUP BY doc_id
        ), kept AS (
            SELECT tk.doc_id, tk.t,
                   list_filter(
                       range(1, len(tk.t) + 1),
                       j -> len(list_filter(coalesce(st.starts, []),
                                            i -> i <= j AND j < i + 5)) = 0
                   ) AS keep
            FROM toks tk LEFT JOIN st ON tk.doc_id = st.doc_id
        )
        SELECT doc_id, len(t)::BIGINT AS n_tokens,
               (len(t) - len(keep))::BIGINT AS n_removed,
               -- array_to_string([]) is NULL in DuckDB; Spark concat_ws is ''
               coalesce(array_to_string(list_transform(keep, j -> t[j]), ' '), '')
                   AS text_clean
        FROM kept
    """

    # hash-threshold stratified sampling: keep doc iff
    # h32(doc_id) mod 1e6 < floor(1e6 * target / group_count)
    o["stratified_sample"] = f"""
        WITH cnt AS (
            SELECT source, count(*) AS group_n FROM documents GROUP BY source
        )
        SELECT doc_id, source,
               least(1000000, floor(1000000 * 10 / group_n))::BIGINT AS rate_e6
        FROM documents JOIN cnt USING (source)
        WHERE {_h32_sql("doc_id::VARCHAR")} % 1000000
              < least(1000000, floor(1000000 * 10 / group_n))
    """

    # GPT-style concatenation packing per source shard, 128-token chunks;
    # window sum is HUGEINT in DuckDB -> ::BIGINT (the sessionize lesson)
    o["pack_sequences"] = """
        WITH toks AS (
            SELECT doc_id, source AS "group",
                   len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
                       AS n_tokens
            FROM documents
        ), off AS (
            SELECT doc_id, "group", n_tokens,
                   coalesce(sum(n_tokens) OVER (
                       PARTITION BY "group" ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0)::BIGINT AS start_offset
            FROM toks
        )
        SELECT doc_id, "group", n_tokens, start_offset,
               floor(start_offset / 128)::BIGINT AS first_chunk,
               floor((start_offset + greatest(n_tokens, 1) - 1) / 128)::BIGINT
                   AS last_chunk,
               (floor((start_offset + greatest(n_tokens, 1) - 1) / 128)
                - floor(start_offset / 128) + 1)::BIGINT AS n_chunks
        FROM off
    """

    # graph-pattern query over the FK-synthesized KG: orders placed by
    # customers in nation 5 (two joined triple patterns, set semantics)
    o["kg_pattern_2hop"] = """
        SELECT DISTINCT 'order:' || o_orderkey AS o, 'cust:' || o_custkey AS c
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_nationkey = 5
    """

    o["kg_degree"] = """
        WITH e AS (
            SELECT 'order:' || o_orderkey AS subj, 'placed_by' AS pred,
                   'cust:' || o_custkey AS obj FROM orders
            UNION ALL
            SELECT 'cust:' || c_custkey, 'in_nation',
                   'nation:' || c_nationkey FROM customer
            UNION ALL
            SELECT 'supp:' || s_suppkey, 'in_nation',
                   'nation:' || s_nationkey FROM supplier
        ), n AS (
            SELECT subj AS node, pred AS p, 1 AS is_out FROM e
            UNION ALL
            SELECT obj, pred, 0 FROM e
        )
        SELECT node, sum(is_out)::BIGINT AS out_degree,
               sum(1 - is_out)::BIGINT AS in_degree,
               count(DISTINCT p)::BIGINT AS n_predicates
        FROM n GROUP BY node
    """

    # the materialized training batches: per-group token-id stream cut
    # every 128 ids (encode -> pack -> chunk assembly composed)
    o["training_chunks"] = """
        WITH toks AS (
            SELECT doc_id, source AS "group",
                   list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents
        ), off AS (
            SELECT doc_id, "group", t,
                   coalesce(sum(len(t)) OVER (
                       PARTITION BY "group" ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0)::BIGINT AS start_offset
            FROM toks
        ), tok AS (
            SELECT "group",
                   start_offset + unnest(range(0, len(t))) AS global_pos,
                   unnest(t) AS token
            FROM off
        ), cnt AS (
            SELECT token, count(*)::BIGINT AS freq FROM tok GROUP BY token
        ), vocab AS (
            SELECT token,
                   row_number() OVER (ORDER BY freq DESC, token)::BIGINT AS vocab_id
            FROM cnt
            QUALIFY vocab_id <= 16
        ), enc AS (
            SELECT "group", global_pos, coalesce(v.vocab_id, 0) AS vid
            FROM tok LEFT JOIN vocab v USING (token)
        )
        SELECT "group", (global_pos // 128)::BIGINT AS chunk_id,
               count(*)::BIGINT AS n_tokens,
               string_agg(vid::VARCHAR, ' ' ORDER BY global_pos) AS ids
        FROM enc GROUP BY 1, 2
    """

    # integer fixed-point PageRank, 3 unrolled iterations — every step is
    # bigint arithmetic (// is floor-div on positives in both engines), so
    # the ranks are bit-exact across engines regardless of sum order
    o["kg_pagerank"] = """
        WITH e AS (
            SELECT DISTINCT src, dst FROM (
                SELECT 'order:' || o_orderkey AS src,
                       'cust:' || o_custkey AS dst FROM orders
                UNION ALL
                SELECT 'cust:' || c_custkey,
                       'nation:' || c_nationkey FROM customer
                UNION ALL
                SELECT 'supp:' || s_suppkey,
                       'nation:' || s_nationkey FROM supplier
            )
        ), nodes AS (
            SELECT src AS node FROM e UNION SELECT dst FROM e
        ), deg AS (
            SELECT src AS node, count(*)::BIGINT AS outdeg FROM e GROUP BY 1
        ), r0 AS (
            SELECT node, 1000000::BIGINT AS rank FROM nodes
        ), s1 AS (
            SELECT e.dst AS node, sum(r.rank // d.outdeg)::BIGINT AS s
            FROM e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.node
            GROUP BY 1
        ), r1 AS (
            SELECT n.node,
                   (150000 + (85 * coalesce(s.s, 0)) // 100)::BIGINT AS rank
            FROM nodes n LEFT JOIN s1 s USING (node)
        ), s2 AS (
            SELECT e.dst AS node, sum(r.rank // d.outdeg)::BIGINT AS s
            FROM e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.node
            GROUP BY 1
        ), r2 AS (
            SELECT n.node,
                   (150000 + (85 * coalesce(s.s, 0)) // 100)::BIGINT AS rank
            FROM nodes n LEFT JOIN s2 s USING (node)
        ), s3 AS (
            SELECT e.dst AS node, sum(r.rank // d.outdeg)::BIGINT AS s
            FROM e JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.node
            GROUP BY 1
        ), r3 AS (
            SELECT n.node,
                   (150000 + (85 * coalesce(s.s, 0)) // 100)::BIGINT AS rank
            FROM nodes n LEFT JOIN s3 s USING (node)
        )
        SELECT node, rank FROM r3
    """

    # bounded reverse BFS from nation:5 — the same level-synchronous
    # frontier unrolled: each level joins the previous frontier and
    # anti-joins everything already settled (min-hop is structural)
    o["kg_reachability"] = """
        WITH e AS (
            SELECT DISTINCT src, dst FROM (
                SELECT 'cust:' || o_custkey AS src,
                       'order:' || o_orderkey AS dst FROM orders
                UNION ALL
                SELECT 'nation:' || c_nationkey,
                       'cust:' || c_custkey FROM customer
                UNION ALL
                SELECT 'nation:' || s_nationkey,
                       'supp:' || s_suppkey FROM supplier
            )
        ), d0 AS (
            SELECT 'nation:5' AS node, 0::BIGINT AS hops
        ), n1 AS (
            SELECT DISTINCT e.dst AS node, 1::BIGINT AS hops
            FROM e JOIN d0 ON e.src = d0.node
            WHERE e.dst NOT IN (SELECT node FROM d0)
        ), n2 AS (
            SELECT DISTINCT e.dst AS node, 2::BIGINT AS hops
            FROM e JOIN n1 ON e.src = n1.node
            WHERE e.dst NOT IN (SELECT node FROM d0
                                UNION ALL SELECT node FROM n1)
        ), n3 AS (
            SELECT DISTINCT e.dst AS node, 3::BIGINT AS hops
            FROM e JOIN n2 ON e.src = n2.node
            WHERE e.dst NOT IN (SELECT node FROM d0
                                UNION ALL SELECT node FROM n1
                                UNION ALL SELECT node FROM n2)
        )
        SELECT node, hops FROM d0
        UNION ALL SELECT node, hops FROM n1
        UNION ALL SELECT node, hops FROM n2
        UNION ALL SELECT node, hops FROM n3
    """

    # ordered wedge-check triangle counting on the FK graph closed with
    # order→nation edges; corners canonicalized a<b<c so each triangle
    # lands once, then exploded to per-node counts
    o["kg_triangles"] = """
        WITH base AS (
            SELECT 'order:' || o_orderkey AS subj,
                   'cust:' || o_custkey AS obj FROM orders
            UNION ALL
            SELECT 'cust:' || c_custkey,
                   'nation:' || c_nationkey FROM customer
            UNION ALL
            SELECT 'supp:' || s_suppkey,
                   'nation:' || s_nationkey FROM supplier
            UNION ALL
            SELECT 'order:' || o_orderkey, 'nation:' || c_nationkey
            FROM orders JOIN customer ON o_custkey = c_custkey
        ), und AS (
            SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
            FROM base WHERE subj <> obj
        ), tri AS (
            SELECT xy.a AS x, xy.b AS y, yz.b AS z
            FROM und xy
            JOIN und yz ON xy.b = yz.a
            JOIN und xz ON xz.a = xy.a AND xz.b = yz.b
        ), n AS (
            SELECT unnest([x, y, z]) AS node FROM tri
        )
        SELECT node, count(*)::BIGINT AS n_triangles FROM n GROUP BY node
    """

    # bounded k-core peeling (k=2, 2 synchronous rounds) on the same
    # closed FK graph; unrolled round-per-CTE like kg_reachability
    o["kg_kcore"] = """
        WITH base AS (
            SELECT 'order:' || o_orderkey AS subj,
                   'cust:' || o_custkey AS obj FROM orders
            UNION ALL
            SELECT 'cust:' || c_custkey,
                   'nation:' || c_nationkey FROM customer
            UNION ALL
            SELECT 'supp:' || s_suppkey,
                   'nation:' || s_nationkey FROM supplier
            UNION ALL
            SELECT 'order:' || o_orderkey, 'nation:' || c_nationkey
            FROM orders JOIN customer ON o_custkey = c_custkey
        ), e0 AS (
            SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
            FROM base WHERE subj <> obj
        ), k0 AS (
            SELECT node FROM (
                SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0
            ) GROUP BY node HAVING count(*) >= 2
        ), e1 AS (
            SELECT a, b FROM e0
            WHERE a IN (SELECT node FROM k0)
              AND b IN (SELECT node FROM k0)
        ), k1 AS (
            SELECT node FROM (
                SELECT a AS node FROM e1 UNION ALL SELECT b FROM e1
            ) GROUP BY node HAVING count(*) >= 2
        ), e2 AS (
            SELECT a, b FROM e1
            WHERE a IN (SELECT node FROM k1)
              AND b IN (SELECT node FROM k1)
        )
        SELECT node, count(*)::BIGINT AS core_deg FROM (
            SELECT a AS node FROM e2 UNION ALL SELECT b FROM e2
        ) GROUP BY node
    """

    # PERCENTILE_DISC via the identical cume_dist()-ratio formulation:
    # rank/total is the same integer division in both engines, so the
    # double compares bit-equal and the picked values are exact bigints
    o["doc_quantiles"] = """
        WITH base AS (
            SELECT source AS grp, n_chars AS v
            FROM documents WHERE n_chars IS NOT NULL
        ), cd AS (
            SELECT grp, v,
                   cume_dist() OVER (PARTITION BY grp ORDER BY v) AS cd
            FROM base
        )
        SELECT grp,
               min(CASE WHEN cd >= 0.5 THEN v END)::BIGINT AS p50,
               min(CASE WHEN cd >= 0.9 THEN v END)::BIGINT AS p90,
               min(CASE WHEN cd >= 0.99 THEN v END)::BIGINT AS p99
        FROM cd GROUP BY grp
    """

    # co-occurrence lift as a pure-bigint ratio: pair/item counts over
    # distinct (order, part) baskets, lift_e6 = pair*total*1e6 div
    # (cnt_a*cnt_b) — same integer fixed-point trick as kg_pagerank
    o["cooccur_lift"] = """
        WITH b AS (
            SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
            FROM lineitem
            WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
        ), ic AS (
            SELECT item, count(*)::BIGINT AS cnt FROM b GROUP BY item
        ), tot AS (
            SELECT count(DISTINCT basket)::BIGINT AS n_baskets FROM b
        ), p AS (
            SELECT l.item AS item_a, r.item AS item_b,
                   count(*)::BIGINT AS pair_cnt
            FROM b l JOIN b r USING (basket)
            WHERE l.item < r.item
            GROUP BY 1, 2 HAVING count(*) >= 2
        )
        SELECT item_a, item_b, pair_cnt,
               ((pair_cnt * n_baskets * 1000000)
                // (ca.cnt * cb.cnt))::BIGINT AS lift_e6
        FROM p
        JOIN ic ca ON ca.item = p.item_a
        JOIN ic cb ON cb.item = p.item_b
        CROSS JOIN tot
    """

    # ROLLUP with explicit per-column GROUPING bits (leftmost = MSB) and
    # 'ALL' sentinel labels; quantity is integer-valued double (exact
    # sum), price rounded to cents per row before the sum
    o["sales_rollup"] = """
        SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
               coalesce(l_linestatus, 'ALL') AS l_linestatus,
               (GROUPING(l_returnflag) * 2
                + GROUPING(l_linestatus))::BIGINT AS lvl,
               count(*)::BIGINT AS n_rows,
               sum(l_quantity)::BIGINT AS sum_qty,
               sum(round(l_extendedprice * 100))::BIGINT AS sum_price_cents
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """

    # funnel reach-time recurrence unrolled stage-per-CTE:
    # r_i = min(ts | type = s_i AND ts > r_{i-1}); count(r_i) per stage
    o["event_funnel"] = """
        WITH s0 AS (
            SELECT user_id, min(ts) AS r FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ), s1 AS (
            SELECT e.user_id, min(e.ts) AS r FROM events e
            JOIN s0 ON e.user_id = s0.user_id
            WHERE e.event_type = 'click' AND e.ts > s0.r
            GROUP BY e.user_id
        ), s2 AS (
            SELECT e.user_id, min(e.ts) AS r FROM events e
            JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'signup' AND e.ts > s1.r
            GROUP BY e.user_id
        ), s3 AS (
            SELECT e.user_id, min(e.ts) AS r FROM events e
            JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.r
            GROUP BY e.user_id
        )
        SELECT 1::BIGINT AS stage, 'view' AS stage_name,
               (SELECT count(*) FROM s0)::BIGINT AS n_users
        UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s1)
        UNION ALL SELECT 3, 'signup', (SELECT count(*) FROM s2)
        UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM s3)
    """

    # exact 2-sigma gate with denominators cleared: HUGEINT here,
    # decimal(38,0) on the Spark side — same integers, same verdicts
    o["doc_outliers"] = """
        WITH base AS (
            SELECT doc_id AS id, source AS grp, n_chars::BIGINT AS v
            FROM documents WHERE n_chars IS NOT NULL
        ), stats AS (
            SELECT grp, count(*)::HUGEINT AS n, sum(v)::HUGEINT AS s,
                   sum(v::HUGEINT * v) AS q
            FROM base GROUP BY grp
        )
        SELECT id, grp, v,
               (n*v - s) * (n*v - s) > 4 * (n*q - s*s) AS is_outlier
        FROM base JOIN stats USING (grp)
    """

    # hash-ranged split: bucket = 32-bit md5 prefix mod 100, ranges in
    # weight order (train<90, valid<95, else test) — pure id function
    o["dataset_split"] = """
        SELECT doc_id,
               CASE WHEN b < 90 THEN 'train'
                    WHEN b < 95 THEN 'valid'
                    ELSE 'test' END AS split
        FROM (
            SELECT doc_id,
                   ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                   % 100 AS b
            FROM documents
        )
    """

    # synchronous LPA unrolled round-per-CTE on the same closed FK graph
    # as kg_kcore; vote pick = highest count, ties to smallest label
    # (row_number twin of Spark's min(struct(-cnt, label)))
    o["kg_communities"] = """
        WITH base AS (
            SELECT 'order:' || o_orderkey AS subj,
                   'cust:' || o_custkey AS obj FROM orders
            UNION ALL
            SELECT 'cust:' || c_custkey,
                   'nation:' || c_nationkey FROM customer
            UNION ALL
            SELECT 'supp:' || s_suppkey,
                   'nation:' || s_nationkey FROM supplier
            UNION ALL
            SELECT 'order:' || o_orderkey, 'nation:' || c_nationkey
            FROM orders JOIN customer ON o_custkey = c_custkey
        ), e0 AS (
            SELECT DISTINCT subj AS a, obj AS b FROM base WHERE subj <> obj
        ), und AS (
            SELECT DISTINCT a, b FROM (
                SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0
            )
        ), l0 AS (
            SELECT DISTINCT a AS node, a AS label FROM und
        ), v1 AS (
            SELECT u.a AS node, l0.label, count(*) AS cnt
            FROM und u JOIN l0 ON u.b = l0.node GROUP BY 1, 2
        ), l1 AS (
            SELECT node, label FROM (
                SELECT node, label, row_number() OVER (
                    PARTITION BY node ORDER BY cnt DESC, label) AS rn
                FROM v1
            ) WHERE rn = 1
        ), v2 AS (
            SELECT u.a AS node, l1.label, count(*) AS cnt
            FROM und u JOIN l1 ON u.b = l1.node GROUP BY 1, 2
        )
        SELECT node, label FROM (
            SELECT node, label, row_number() OVER (
                PARTITION BY node ORDER BY cnt DESC, label) AS rn
            FROM v2
        ) WHERE rn = 1
    """

    # fixed-width histogram: floor bucketing on bigints (n_chars >= 0
    # here, so // and the Spark CASE floor-div agree everywhere)
    o["doc_histogram"] = """
        SELECT source AS grp,
               ((n_chars // 50) * 50)::BIGINT AS bucket_lo,
               count(*)::BIGINT AS n
        FROM documents WHERE n_chars IS NOT NULL
        GROUP BY 1, 2
    """

    # inverted index: per-doc distinct tokens, one token-keyed agg with
    # df HAVING gate; postings sorted so the array compares exactly
    o["inverted_index"] = """
        WITH pairs AS (
            SELECT DISTINCT doc_id AS id,
                   unnest(list_filter(string_split(text, ' '),
                                      x -> x <> '')) AS token
            FROM documents
        )
        SELECT token, count(*)::BIGINT AS df,
               string_agg(id::VARCHAR, ' ' ORDER BY id) AS postings
        FROM pairs GROUP BY token HAVING count(*) >= 2
    """

    # ER end-to-end: ed<=1 edges (quadratic twin), recursive-walk CC,
    # canonical = min name per component — same form as canonical_map
    o["er_canonical_names"] = """
        WITH RECURSIVE names AS (
            SELECT DISTINCT s_name AS name FROM supplier
            WHERE s_name IS NOT NULL
        ), e AS (
            SELECT a.name AS src, b.name AS dst
            FROM names a JOIN names b ON a.name < b.name
            WHERE levenshtein(a.name, b.name) <= 1
        ), sym AS (
            SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e
        ), walk(node, lab) AS (
            SELECT a, a FROM (SELECT DISTINCT a FROM sym)
            UNION
            SELECT s.b, w.lab FROM walk w JOIN sym s ON s.a = w.node
        )
        SELECT node AS member, min(lab) AS canonical
        FROM walk GROUP BY node
    """

    # one-pass exact column stats, unpivoted to (col, ...) rows
    o["table_stats"] = """
        WITH w AS (
            SELECT count(*)::BIGINT AS n,
                   sum((o_orderkey IS NULL)::INT)::BIGINT AS nu1,
                   count(DISTINCT o_orderkey)::BIGINT AS nd1,
                   min(o_orderkey)::VARCHAR AS mn1,
                   max(o_orderkey)::VARCHAR AS mx1,
                   sum((o_custkey IS NULL)::INT)::BIGINT AS nu2,
                   count(DISTINCT o_custkey)::BIGINT AS nd2,
                   min(o_custkey)::VARCHAR AS mn2,
                   max(o_custkey)::VARCHAR AS mx2,
                   sum((o_orderstatus IS NULL)::INT)::BIGINT AS nu3,
                   count(DISTINCT o_orderstatus)::BIGINT AS nd3,
                   min(o_orderstatus) AS mn3, max(o_orderstatus) AS mx3,
                   sum((o_orderpriority IS NULL)::INT)::BIGINT AS nu4,
                   count(DISTINCT o_orderpriority)::BIGINT AS nd4,
                   min(o_orderpriority) AS mn4, max(o_orderpriority) AS mx4
            FROM orders
        )
        SELECT 'o_orderkey' AS col, n AS n_rows, nu1 AS n_nulls,
               nd1 AS ndv, mn1 AS min_val, mx1 AS max_val FROM w
        UNION ALL SELECT 'o_custkey', n, nu2, nd2, mn2, mx2 FROM w
        UNION ALL SELECT 'o_orderstatus', n, nu3, nd3, mn3, mx3 FROM w
        UNION ALL SELECT 'o_orderpriority', n, nu4, nd4, mn4, mx4 FROM w
    """

    # text-pattern chain: joins on the shared variables, DISTINCT set
    # semantics per step and overall (match_pattern's contract)
    o["kg_query_text"] = """
        WITH e AS (
            SELECT 'order:' || o_orderkey AS s, 'placed_by' AS p,
                   'cust:' || o_custkey AS o FROM orders
            UNION ALL
            SELECT 'cust:' || c_custkey, 'in_nation',
                   'nation:' || c_nationkey FROM customer
            UNION ALL
            SELECT 'supp:' || s_suppkey, 'in_nation',
                   'nation:' || s_nationkey FROM supplier
        )
        SELECT DISTINCT a.s AS o, a.o AS c, b.o AS n
        FROM e a JOIN e b ON a.o = b.s
        WHERE a.p = 'placed_by' AND b.p = 'in_nation'
    """

    # Morton interleave, terms generated programmatically — same bigint
    # shifts/masks as the Spark side (column 0 = least significant lane)
    _z_terms = " + ".join(
        f"((({col} >> {b}) & 1) << {b * 2 + ci})"
        for b in range(16)
        for ci, col in enumerate(("l_partkey", "l_suppkey"))
    )
    o["zorder_keys"] = f"""
        SELECT l_orderkey, l_linenumber,
               ({_z_terms})::BIGINT AS zval
        FROM lineitem
    """

    # edit-distance pairs: brute-force levenshtein twin (documented
    # quadratic oracle baseline); both engines run the same DP
    o["fuzzy_name_pairs"] = """
        SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
               levenshtein(a.s_name, b.s_name)::BIGINT AS dist
        FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
        WHERE a.s_name IS NOT NULL AND b.s_name IS NOT NULL
          AND levenshtein(a.s_name, b.s_name) <= 1
    """

    # Markov transitions: lag over the same (ts, id) total order
    o["event_transitions"] = """
        WITH s AS (
            SELECT event_type AS t,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events
        )
        SELECT prev_type, t AS next_type, count(*)::BIGINT AS n
        FROM s WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    """

    # personalized PageRank: same unrolled recurrence as kg_pagerank but
    # initial mass and teleport are masked to the seed set
    o["kg_pagerank_seeded"] = """
        WITH e AS (
            SELECT DISTINCT src, dst FROM (
                SELECT 'order:' || o_orderkey AS src,
                       'cust:' || o_custkey AS dst FROM orders
                UNION ALL
                SELECT 'cust:' || c_custkey,
                       'nation:' || c_nationkey FROM customer
                UNION ALL
                SELECT 'supp:' || s_suppkey,
                       'nation:' || s_nationkey FROM supplier
            )
        ), nodes AS (
            SELECT src AS node FROM e UNION SELECT dst FROM e
        ), seeded AS (
            SELECT node,
                   (CASE WHEN node IN ('nation:5', 'nation:7')
                         THEN 1 ELSE 0 END)::BIGINT AS m
            FROM nodes
        ), deg AS (
            SELECT src AS node, count(*)::BIGINT AS outdeg FROM e GROUP BY 1
        ), r0 AS (
            SELECT node, (1000000 * m)::BIGINT AS rank FROM seeded
        ), s1 AS (
            SELECT e.dst AS node, sum(r.rank // d.outdeg)::BIGINT AS s
            FROM e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.node
            GROUP BY 1
        ), r1 AS (
            SELECT n.node,
                   (150000 * n.m
                    + (85 * coalesce(s.s, 0)) // 100)::BIGINT AS rank
            FROM seeded n LEFT JOIN s1 s USING (node)
        ), s2 AS (
            SELECT e.dst AS node, sum(r.rank // d.outdeg)::BIGINT AS s
            FROM e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.node
            GROUP BY 1
        ), r2 AS (
            SELECT n.node,
                   (150000 * n.m
                    + (85 * coalesce(s.s, 0)) // 100)::BIGINT AS rank
            FROM seeded n LEFT JOIN s2 s USING (node)
        ), s3 AS (
            SELECT e.dst AS node, sum(r.rank // d.outdeg)::BIGINT AS s
            FROM e JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.node
            GROUP BY 1
        ), r3 AS (
            SELECT n.node,
                   (150000 * n.m
                    + (85 * coalesce(s.s, 0)) // 100)::BIGINT AS rank
            FROM seeded n LEFT JOIN s3 s USING (node)
        )
        SELECT node, rank FROM r3
    """

    # RANGE frame over integer microseconds — closed bounds, ties are
    # peers, identical frame semantics in both engines
    o["rolling_counts"] = """
        SELECT event_id AS id, user_id AS key,
               count(*) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
               )::BIGINT AS n_window
        FROM events
    """

    # fixed-domain pivot = conditional-count aggregation in both engines
    o["event_pivot"] = """
        SELECT user_id AS row,
               count(*) FILTER (event_type = 'view')::BIGINT AS view,
               count(*) FILTER (event_type = 'click')::BIGINT AS click,
               count(*) FILTER (event_type = 'signup')::BIGINT AS signup,
               count(*) FILTER (event_type = 'purchase')::BIGINT
                   AS purchase,
               count(*) FILTER (event_type = 'error')::BIGINT AS error
        FROM events GROUP BY user_id
    """

    # exact set-similarity join — the oracle is the documented-quadratic
    # brute force (like ngram_jaccard); the Spark side must equal it
    # EXACTLY because prefix filtering is lossless
    o["similarity_join"] = """
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS tk
            FROM documents
        ), s AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, greatest(len(tk) - 2, 0) + 1),
                       i -> array_to_string(tk[i:i+2], ' '))) AS toks
            FROM t
        ), p AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   len(list_intersect(a.toks, b.toks))::BIGINT AS inter,
                   (len(a.toks) + len(b.toks)
                    - len(list_intersect(a.toks, b.toks)))::BIGINT
                       AS union_sz
            FROM s a JOIN s b ON a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, inter, union_sz,
               ((inter * 1000000) // union_sz)::BIGINT AS jaccard_e6
        FROM p WHERE union_sz > 0 AND 2 * inter >= union_sz
    """

    # fixed-point BM25: per-term contribution
    # (2N-2df+1)*22*tf*S*1e6 div ((2df+1)*(10*S*tf + 3*S + 9*dl*N)),
    # summed in query-term order — all bigint, bit-exact
    o["bm25_topk"] = """
        WITH base AS (
            SELECT doc_id AS id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents
        ), l AS (
            SELECT id, len(toks)::BIGINT AS dl,
                   len(list_filter(toks, x -> x = 'hash'))::BIGINT AS tf0,
                   len(list_filter(toks, x -> x = 'join'))::BIGINT AS tf1,
                   len(list_filter(toks, x -> x = 'vector'))::BIGINT AS tf2
            FROM base
        ), g AS (
            SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS s,
                   sum((tf0 > 0)::INT)::BIGINT AS df0,
                   sum((tf1 > 0)::INT)::BIGINT AS df1,
                   sum((tf2 > 0)::INT)::BIGINT AS df2
            FROM l
        )
        SELECT id,
               ( ((2*n - 2*df0 + 1) * 22 * tf0 * s * 1000000)
                 // ((2*df0 + 1) * (10*s*tf0 + 3*s + 9*dl*n))
               + ((2*n - 2*df1 + 1) * 22 * tf1 * s * 1000000)
                 // ((2*df1 + 1) * (10*s*tf1 + 3*s + 9*dl*n))
               + ((2*n - 2*df2 + 1) * 22 * tf2 * s * 1000000)
                 // ((2*df2 + 1) * (10*s*tf2 + 3*s + 9*dl*n))
               )::BIGINT AS score_e6
        FROM l, g
        ORDER BY score_e6 DESC, id
        LIMIT 20
    """

    # commutative fingerprint: canonical row = values joined by the unit
    # separator (nulls → chr(0) sentinel), 32-bit md5 prefix, summed —
    # addition is order/partitioning-independent, so the engines agree
    # iff the row multisets agree
    o["table_checksum"] = """
        SELECT o_orderpriority AS grp,
               count(*)::BIGINT AS n_rows,
               sum(('0x' || substr(md5(
                   coalesce(o_orderkey::VARCHAR, chr(0)) || chr(31) ||
                   coalesce(o_custkey::VARCHAR, chr(0)) || chr(31) ||
                   coalesce(o_orderstatus, chr(0))
               ), 1, 8))::BIGINT)::BIGINT AS checksum
        FROM orders GROUP BY o_orderpriority
    """

    # KMV distinct sketch, k=64: k smallest distinct 32-bit md5-prefix
    # hashes per group; estimate = (k-1)*2^32 div h_k — all bigint, so
    # bit-exact across engines (HLL never is)
    o["approx_distinct_kmv"] = f"""
        WITH h AS (
            SELECT DISTINCT o_orderpriority AS grp,
                   {_h32_sql("o_custkey::VARCHAR")} AS h
            FROM orders
        ), r AS (
            SELECT grp, h,
                   row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
            FROM h
        ), a AS (
            SELECT grp, count(*)::BIGINT AS k_used, max(h)::BIGINT AS h_k
            FROM r WHERE rn <= 64 GROUP BY grp
        ), t AS (
            SELECT o_orderpriority AS grp,
                   count(DISTINCT o_custkey)::BIGINT AS true_distinct
            FROM orders GROUP BY grp
        )
        SELECT grp, k_used,
               (CASE WHEN k_used < 64 THEN k_used
                     ELSE (63 * 4294967296) // greatest(h_k, 1)
                END)::BIGINT AS est_distinct,
               true_distinct
        FROM a JOIN t USING (grp)
    """

    # train/eval decontamination: distinct 5-gram shingles of each src0
    # (eval) doc that occur anywhere in the rest of the corpus
    o["contamination"] = """
        WITH toks AS (
            SELECT doc_id, source,
                   list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents
        ), sh AS (
            SELECT doc_id, source,
                   unnest(list_transform(
                       range(1, greatest(len(t) - 4, 0) + 1),
                       i -> array_to_string(t[i:i+4], ' '))) AS shingle
            FROM toks
        ), ev AS (
            SELECT DISTINCT doc_id, shingle FROM sh WHERE source = 'src0'
        ), tr AS (
            SELECT DISTINCT shingle FROM sh WHERE source <> 'src0'
        ), per AS (
            SELECT e.doc_id, count(*)::BIGINT AS n_shingles,
                   sum(CASE WHEN t.shingle IS NOT NULL THEN 1 ELSE 0 END)
                       ::BIGINT AS n_contaminated
            FROM ev e LEFT JOIN tr t USING (shingle)
            GROUP BY 1
        )
        SELECT d.doc_id,
               coalesce(p.n_shingles, 0)::BIGINT AS n_shingles,
               coalesce(p.n_contaminated, 0)::BIGINT AS n_contaminated
        FROM documents d LEFT JOIN per p USING (doc_id)
        WHERE d.source = 'src0'
    """

    # backward-inclusive as-of join — DuckDB's native ASOF JOIN; gap in
    # whole seconds via exact integer microsecond floor-division
    o["asof_join"] = """
        SELECT c.event_id, c.user_id, v.event_id AS view_id,
               (datediff('microsecond', v.ts, c.ts) // 1000000)::BIGINT
                   AS gap_s,
               v.value AS view_value
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON c.user_id = v.user_id AND c.ts >= v.ts
    """

    # right-open 2 h band join; gap in exact integer microseconds
    o["range_join"] = """
        SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
               (epoch_us(c.ts) - epoch_us(v.ts))::BIGINT AS gap_us
        FROM events v JOIN events c ON v.user_id = c.user_id
        WHERE v.event_type = 'view' AND c.event_type = 'click'
          AND c.ts >= v.ts AND c.ts < v.ts + INTERVAL 7200 SECOND
    """

    # curation composition: dedup-apply keeper set over the FULL corpus,
    # then lang gate, then the exact quality/repetition integer formulas
    # (same CTEs as o["quality"] / o["repetition"], scoped to survivors)
    o["curated_corpus"] = f"""
        WITH kept AS (
            SELECT doc_id, text FROM (
                SELECT doc_id, text, lang,
                       min(doc_id) OVER (PARTITION BY md5(text)) AS k
                FROM documents
            ) WHERE doc_id = k AND lang = 'en'
        ), qbase AS (
            SELECT doc_id,
                   {ntok}::BIGINT AS ntok,
                   length(text)::BIGINT AS nchars,
                   len(regexp_extract_all(text, '[^\\w\\s]'))::BIGINT AS punct,
                   {stop_en}::BIGINT AS stop_en
            FROM kept
        ), qe6 AS (
            SELECT doc_id,
                   least(nchars, 500) * 2000 AS len_norm_e6,
                   least((5000000 * stop_en) // greatest(ntok, 1), 1000000)
                       AS stop_ratio_e6,
                   (1000000 * punct) // greatest(nchars, 1) AS punct_ratio_e6
            FROM qbase
        ), ql AS (
            SELECT doc_id,
                   ((4 * len_norm_e6 + 3 * stop_ratio_e6
                     + 3 * (1000000 - punct_ratio_e6)) // 10)::BIGINT
                       AS quality_e6
            FROM qe6
        ), toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM kept
        ), rp AS (
            SELECT doc_id,
                   ((1000000 * (len(t) - len(list_distinct(t))))
                    // greatest(len(t), 1))::BIGINT AS dup_token_frac_e6
            FROM toks
        )
        SELECT k.doc_id, ql.quality_e6, rp.dup_token_frac_e6
        FROM kept k JOIN ql USING (doc_id) JOIN rp USING (doc_id)
        WHERE ql.quality_e6 >= 600000 AND rp.dup_token_frac_e6 <= 600000
    """

    # edge delta between two snapshots: EXCEPT both ways, tagged
    o["kg_snapshot_diff"] = """
        WITH olde AS (
            SELECT 'order:' || o_orderkey AS subj, 'placed_by' AS pred,
                   'cust:' || o_custkey AS obj
            FROM orders WHERE o_orderkey % 3 <> 0
        ), newe AS (
            SELECT 'order:' || o_orderkey AS subj, 'placed_by' AS pred,
                   'cust:' || o_custkey AS obj
            FROM orders WHERE o_orderkey % 5 <> 0
        )
        SELECT subj, pred, obj, 'added' AS change
        FROM (SELECT * FROM newe EXCEPT SELECT * FROM olde)
        UNION ALL
        SELECT subj, pred, obj, 'removed' AS change
        FROM (SELECT * FROM olde EXCEPT SELECT * FROM newe)
    """

    # tokenizer-fitting: top-256 tokens by (freq DESC, token ASC)
    o["vocab_top"] = """
        WITH tok AS (
            SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                       AS token
            FROM documents
        ), cnt AS (
            SELECT token, count(*)::BIGINT AS freq FROM tok GROUP BY token
        )
        SELECT token, freq,
               row_number() OVER (ORDER BY freq DESC, token)::BIGINT AS vocab_id
        FROM cnt
        QUALIFY vocab_id <= 20
    """

    # corpus encoding through that vocab, OOV -> 0, order preserved;
    # ids emitted as a space-joined string (list reprs differ across
    # DuckDB fetch paths, strings don't)
    o["encode_docs"] = """
        WITH toks AS (
            SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents
        ), tok AS (
            SELECT doc_id,
                   unnest(range(1, len(t) + 1)) AS pos,
                   unnest(t) AS token
            FROM toks
        ), cnt AS (
            SELECT token, count(*)::BIGINT AS freq FROM tok GROUP BY token
        ), vocab AS (
            SELECT token,
                   row_number() OVER (ORDER BY freq DESC, token)::BIGINT AS vocab_id
            FROM cnt
            QUALIFY vocab_id <= 16
        ), enc AS (
            SELECT tok.doc_id, tok.pos, coalesce(v.vocab_id, 0) AS vid
            FROM tok LEFT JOIN vocab v USING (token)
        ), agg AS (
            SELECT doc_id, count(*)::BIGINT AS n_tokens,
                   string_agg(vid::VARCHAR, ' ' ORDER BY pos) AS ids
            FROM enc GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
               coalesce(a.ids, '') AS ids
        FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    """

    # asymmetric containment twin: the quadratic pair scan IS the
    # correctness spec the prefix filter must reproduce exactly
    o["containment_pairs"] = """
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS tk
            FROM documents
        ), s AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, greatest(len(tk) - 2, 0) + 1),
                       i -> array_to_string(tk[i:i+2], ' '))) AS toks
            FROM t
        ), p AS (
            SELECT a.doc_id AS src, b.doc_id AS dst,
                   len(list_intersect(a.toks, b.toks))::BIGINT AS inter,
                   len(a.toks)::BIGINT AS n_src
            FROM s a JOIN s b ON a.doc_id <> b.doc_id
        )
        SELECT src, dst, inter, n_src,
               ((inter * 1000000) // n_src)::BIGINT AS containment_e6
        FROM p WHERE n_src > 0 AND 100 * inter >= 80 * n_src
    """

    # winnowing twin: same rightmost-min-in-window arithmetic encoding
    # comb[i] = h32 * 2^24 + (2^24 - 1 - i), list-sliced per window
    o["winnow_fingerprint"] = """
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS tk
            FROM documents
        ), g AS (
            SELECT doc_id,
                   list_transform(
                       range(1, greatest(len(tk) - 2, 0) + 1),
                       i -> array_to_string(tk[i:i+2], ' ')) AS grams
            FROM t
        ), c AS (
            SELECT doc_id,
                   list_transform(
                       range(1, len(grams) + 1),
                       i -> ('0x' || substr(md5(grams[i]), 1, 8))::BIGINT
                            * 16777216 + (16777216 - i)) AS comb
            FROM g
        ), sel AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, greatest(len(comb) - 4, -1) + 2),
                       s -> list_min(comb[s:s+3]))) AS fps
            FROM c WHERE len(comb) >= 4
        )
        SELECT doc_id,
               (16777215 - (u.fp % 16777216))::BIGINT AS pos,
               (u.fp // 16777216)::BIGINT AS fp
        FROM sel, unnest(sel.fps) AS u(fp)
    """

    # salted-join twin: the PLAIN join — the salt must be invisible
    o["salted_join"] = """
        SELECT o.o_orderpriority,
               count(*)::BIGINT AS n_lines,
               sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))::BIGINT
                   AS revenue_c
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
    """

    # random-projection twin: same md5-derived ±1 weights, same
    # sequential coordinate-order summation (list_dot_product), same
    # micro-unit fixed-pointing — one UNION ALL branch per output dim
    rp_branches = []
    for p in range(8):
        w = ", ".join(
            f"(CASE WHEN ({_h32_sql(f_lit)} & 1) = 1 THEN 1.0 ELSE -1.0 END)"
            for f_lit in (f"'{p}:{i}'" for i in range(EMB_DIM))
        )
        rp_branches.append(
            f"SELECT vec_id, {p} AS p, CAST(round(list_dot_product("
            f"embedding::DOUBLE[], [{w}]) * 1000000) AS BIGINT) AS proj_e6 "
            f"FROM embeddings"
        )
    o["embed_project"] = " UNION ALL ".join(rp_branches)

    # gap-fill twin: generate_series spine per key over its own
    # [first, last] day-bucket range, zero-filled left join
    o["gap_fill"] = """
        WITH b AS (
            SELECT event_type AS key,
                   epoch_us(ts) // 86400000000 AS bucket_idx,
                   count(*)::BIGINT AS n_events,
                   sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS value_c
            FROM events GROUP BY 1, 2
        ), s AS (
            SELECT key, min(bucket_idx) AS lo, max(bucket_idx) AS hi
            FROM b GROUP BY key
        ), spine AS (
            SELECT key, unnest(range(lo, hi + 1)) AS bucket_idx FROM s
        )
        SELECT spine.key, spine.bucket_idx,
               make_timestamp(spine.bucket_idx * 86400000000) AS bucket_ts,
               coalesce(b.n_events, 0)::BIGINT AS n_events,
               coalesce(b.value_c, 0)::BIGINT AS value_c
        FROM spine LEFT JOIN b USING (key, bucket_idx)
    """

    # closed-form OLS twin: identical sufficient statistics (exact
    # bigints), identical float64 solve tree, identical floor(b*1e6)
    # fixed-pointing — determinism is IEEE 754, not luck
    o["quality_fit"] = f"""
        WITH q AS ({o['quality']}),
        f AS (
            SELECT doc_id, n_tokens::BIGINT AS x1,
                   (stop_ratio_e6 // 1000)::BIGINT AS x2,
                   quality_e6::BIGINT AS y
            FROM q
        ), s AS (
            SELECT count(*)::BIGINT AS n,
                   sum(x1)::BIGINT AS sx1, sum(x2)::BIGINT AS sx2,
                   sum(y)::BIGINT AS sy,
                   sum(x1 * x1)::BIGINT AS sx1x1,
                   sum(x2 * x2)::BIGINT AS sx2x2,
                   sum(x1 * x2)::BIGINT AS sx1x2,
                   sum(x1 * y)::BIGINT AS sx1y,
                   sum(x2 * y)::BIGINT AS sx2y
            FROM f
        ), c AS (
            SELECT n, sx1, sx2, sy,
                   (n * sx1x1 - sx1 * sx1)::DOUBLE AS s11,
                   (n * sx2x2 - sx2 * sx2)::DOUBLE AS s22,
                   (n * sx1x2 - sx1 * sx2)::DOUBLE AS s12,
                   (n * sx1y - sx1 * sy)::DOUBLE AS s1y,
                   (n * sx2y - sx2 * sy)::DOUBLE AS s2y
            FROM s
        ), b AS (
            SELECT
                floor(((sy::DOUBLE
                        - ((s1y * s22 - s2y * s12)
                           / (s11 * s22 - s12 * s12)) * sx1::DOUBLE)
                       - ((s11 * s2y - s12 * s1y)
                          / (s11 * s22 - s12 * s12)) * sx2::DOUBLE)
                      / n::DOUBLE * 1000000.0)::BIGINT AS b0_e6,
                floor(((s1y * s22 - s2y * s12)
                       / (s11 * s22 - s12 * s12)) * 1000000.0)::BIGINT
                    AS b1_e6,
                floor(((s11 * s2y - s12 * s1y)
                       / (s11 * s22 - s12 * s12)) * 1000000.0)::BIGINT
                    AS b2_e6
            FROM c
        )
        SELECT f.doc_id,
               (b.b0_e6 + b.b1_e6 * f.x1 + b.b2_e6 * f.x2)::BIGINT
                   AS score_u,
               (f.y * 1000000
                - (b.b0_e6 + b.b1_e6 * f.x1 + b.b2_e6 * f.x2))::BIGINT
                   AS resid_u
        FROM f, b
    """

    # equi-depth twin: identical integer rank thresholds (cle·n ≥ k·tot)
    # and the same tie rule (v > break_k), so buckets match exactly
    o["equi_depth"] = """
        WITH base AS (
            SELECT source AS grp, n_chars::BIGINT AS v
            FROM documents WHERE n_chars IS NOT NULL
        ), cd AS (
            SELECT grp, v,
                   count(*) OVER (PARTITION BY grp ORDER BY v
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT AS cle,
                   count(*) OVER (PARTITION BY grp)::BIGINT AS total
            FROM base
        ), brk AS (
            SELECT grp,
                   min(CASE WHEN cle * 8 >= 1 * total THEN v END) AS b1,
                   min(CASE WHEN cle * 8 >= 2 * total THEN v END) AS b2,
                   min(CASE WHEN cle * 8 >= 3 * total THEN v END) AS b3,
                   min(CASE WHEN cle * 8 >= 4 * total THEN v END) AS b4,
                   min(CASE WHEN cle * 8 >= 5 * total THEN v END) AS b5,
                   min(CASE WHEN cle * 8 >= 6 * total THEN v END) AS b6,
                   min(CASE WHEN cle * 8 >= 7 * total THEN v END) AS b7
            FROM cd GROUP BY grp
        )
        SELECT base.grp,
               ((v > b1)::INT + (v > b2)::INT + (v > b3)::INT
                + (v > b4)::INT + (v > b5)::INT + (v > b6)::INT
                + (v > b7)::INT)::BIGINT AS bucket,
               count(*)::BIGINT AS n, min(v) AS lo, max(v) AS hi
        FROM base JOIN brk USING (grp)
        GROUP BY base.grp, bucket
    """

    # weighted-quantile twin: same inclusive RANGE-frame weight cumsum,
    # same cross-multiplied integer thresholds
    o["weighted_quantile"] = """
        WITH base AS (
            SELECT l_returnflag AS grp,
                   round(l_extendedprice * 100)::BIGINT AS v,
                   l_quantity::BIGINT AS w
            FROM lineitem
        ), cd AS (
            SELECT grp, v,
                   sum(w) OVER (PARTITION BY grp ORDER BY v
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT AS cw,
                   sum(w) OVER (PARTITION BY grp)::BIGINT AS tw
            FROM base
        )
        SELECT grp,
               min(CASE WHEN cw * 2 >= 1 * tw THEN v END) AS wp50,
               min(CASE WHEN cw * 10 >= 9 * tw THEN v END) AS wp90,
               min(CASE WHEN cw * 100 >= 99 * tw THEN v END) AS wp99
        FROM cd GROUP BY grp
    """

    # period-over-period twin: gap_fill's spine + one lag, first period
    # dropped so the output is NULL-free on both fetch paths
    o["period_over_period"] = """
        WITH b AS (
            SELECT event_type AS key,
                   epoch_us(ts) // 86400000000 AS bucket_idx,
                   count(*)::BIGINT AS n_events
            FROM events GROUP BY 1, 2
        ), s AS (
            SELECT key, min(bucket_idx) AS lo, max(bucket_idx) AS hi
            FROM b GROUP BY key
        ), spine AS (
            SELECT key, unnest(range(lo, hi + 1)) AS bucket_idx FROM s
        ), g AS (
            SELECT spine.key, spine.bucket_idx,
                   make_timestamp(spine.bucket_idx * 86400000000)
                       AS bucket_ts,
                   coalesce(b.n_events, 0)::BIGINT AS n_events
            FROM spine LEFT JOIN b USING (key, bucket_idx)
        )
        SELECT key, bucket_idx, bucket_ts, n_events, prev_n,
               (n_events - prev_n)::BIGINT AS delta
        FROM (
            SELECT *, lag(n_events) OVER (
                PARTITION BY key ORDER BY bucket_idx)::BIGINT AS prev_n
            FROM g
        ) WHERE prev_n IS NOT NULL
    """

    # source-overlap twin: same distinct (group, 3-gram) projection,
    # same shingle-keyed join and size attach
    o["source_overlap"] = """
        WITH toks AS (
            SELECT source, string_split(text, ' ') AS t FROM documents
        ), sh AS (
            SELECT DISTINCT source AS g,
                   unnest(list_transform(
                       range(1, greatest(len(t) - 2, 0) + 1),
                       i -> array_to_string(t[i:i+2], ' '))) AS s
            FROM toks
        ), sizes AS (
            SELECT g, count(*)::BIGINT AS n FROM sh GROUP BY g
        )
        SELECT a.g AS src_a, b.g AS src_b, count(*)::BIGINT AS inter,
               (na.n + nb.n - count(*))::BIGINT AS uni
        FROM sh a
        JOIN sh b ON a.s = b.s AND a.g < b.g
        JOIN sizes na ON na.g = a.g
        JOIN sizes nb ON nb.g = b.g
        GROUP BY a.g, b.g, na.n, nb.n
    """

    # token-cooccur twin: same 1-based window lattice, same canonical
    # (min, max) pairing, same marginal attach
    o["token_cooccur"] = """
        WITH toks AS (
            SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
            FROM documents
        ), pr AS (
            SELECT unnest(flatten(list_transform(
                       range(1, greatest(len(t) - 1, 0) + 1),
                       i -> list_transform(
                           range(i + 1, least(i + 3, len(t)) + 1),
                           j -> [least(t[i], t[j]),
                                 greatest(t[i], t[j])])))) AS p
            FROM toks WHERE len(t) >= 2
        ), pairs AS (
            SELECT p[1] AS tok_a, p[2] AS tok_b,
                   count(*)::BIGINT AS n_pair
            FROM pr GROUP BY 1, 2
        ), cnt AS (
            SELECT unnest(list_filter(string_split(text, ' '),
                                      x -> x <> '')) AS tok
            FROM documents
        ), marg AS (
            SELECT tok, count(*)::BIGINT AS n FROM cnt GROUP BY tok
        )
        SELECT pairs.tok_a, pairs.tok_b, pairs.n_pair,
               ma.n AS n_a, mb.n AS n_b
        FROM pairs
        JOIN marg ma ON ma.tok = pairs.tok_a
        JOIN marg mb ON mb.tok = pairs.tok_b
    """

    # retention twin: same distinct (user, day) set semantics, same
    # first-day cohorts and integer day offsets
    o["retention"] = """
        WITH active AS (
            SELECT DISTINCT user_id AS u,
                   epoch_us(ts) // 86400000000 AS day
            FROM events
        ), cohort AS (
            SELECT u, min(day) AS cohort_day FROM active GROUP BY u
        ), sizes AS (
            SELECT cohort_day, count(*)::BIGINT AS cohort_n
            FROM cohort GROUP BY cohort_day
        ), j AS (
            SELECT a.u, c.cohort_day, (a.day - c.cohort_day) AS k
            FROM active a JOIN cohort c USING (u)
        )
        SELECT j.cohort_day, j.k::BIGINT AS k,
               count(*)::BIGINT AS n_active, sizes.cohort_n
        FROM j JOIN sizes USING (cohort_day)
        GROUP BY j.cohort_day, j.k, sizes.cohort_n
    """

    # contingency twin: same marginals, same dense category product,
    # same cleared-denominator chi-square rationals
    o["contingency"] = """
        WITH base AS (
            SELECT lang AS r, source AS c FROM documents
            WHERE lang IS NOT NULL AND source IS NOT NULL
        ), cells AS (
            SELECT r, c, count(*)::BIGINT AS observed
            FROM base GROUP BY r, c
        ), rt AS (SELECT r, count(*)::BIGINT AS r_tot FROM base GROUP BY r),
        ct AS (SELECT c, count(*)::BIGINT AS c_tot FROM base GROUP BY c),
        nt AS (SELECT count(*)::BIGINT AS n_tot FROM base)
        SELECT rt.r, ct.c,
               coalesce(cells.observed, 0)::BIGINT AS observed,
               rt.r_tot, ct.c_tot, nt.n_tot,
               ((coalesce(cells.observed, 0) * nt.n_tot
                 - rt.r_tot * ct.c_tot)
                * (coalesce(cells.observed, 0) * nt.n_tot
                   - rt.r_tot * ct.c_tot))::BIGINT AS dev_num,
               (nt.n_tot * rt.r_tot * ct.c_tot)::BIGINT AS dev_den
        FROM rt CROSS JOIN ct CROSS JOIN nt
        LEFT JOIN cells ON cells.r = rt.r AND cells.c = ct.c
    """

    # spike twin: the period_over_period spine+lag feeding the same
    # double-median MAD gate
    o["spike_days"] = """
        WITH b AS (
            SELECT event_type AS key,
                   epoch_us(ts) // 86400000000 AS bucket_idx,
                   count(*)::BIGINT AS n_events
            FROM events GROUP BY 1, 2
        ), s AS (
            SELECT key, min(bucket_idx) AS lo, max(bucket_idx) AS hi
            FROM b GROUP BY key
        ), spine AS (
            SELECT key, unnest(range(lo, hi + 1)) AS bucket_idx FROM s
        ), g AS (
            SELECT spine.key, spine.bucket_idx,
                   coalesce(b.n_events, 0)::BIGINT AS n_events
            FROM spine LEFT JOIN b USING (key, bucket_idx)
        ), base AS (
            SELECT key AS grp, bucket_idx AS id,
                   (n_events - prev_n)::BIGINT AS v
            FROM (
                SELECT *, lag(n_events) OVER (
                    PARTITION BY key ORDER BY bucket_idx
                )::BIGINT AS prev_n FROM g
            ) WHERE prev_n IS NOT NULL
        ), cd1 AS (
            SELECT grp, v,
                   count(*) OVER (PARTITION BY grp ORDER BY v
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT AS cle,
                   count(*) OVER (PARTITION BY grp)::BIGINT AS tot
            FROM base
        ), med AS (
            SELECT grp, min(CASE WHEN cle * 2 >= tot THEN v END) AS med
            FROM cd1 GROUP BY grp
        ), dev AS (
            SELECT base.id, base.grp, base.v,
                   abs(base.v - med.med)::BIGINT AS dev
            FROM base JOIN med USING (grp)
        ), cd2 AS (
            SELECT grp, dev,
                   count(*) OVER (PARTITION BY grp ORDER BY dev
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT AS cle,
                   count(*) OVER (PARTITION BY grp)::BIGINT AS tot
            FROM dev
        ), madt AS (
            SELECT grp, min(CASE WHEN cle * 2 >= tot THEN dev END
                   )::BIGINT AS mad
            FROM cd2 GROUP BY grp
        )
        SELECT dev.id, dev.grp, dev.v, dev.dev, madt.mad,
               (dev.dev > 4 * madt.mad) AS is_outlier
        FROM dev JOIN madt USING (grp)
    """

    # rdf round-trip twin: the round-trip is the IDENTITY on the parsed
    # columns, so the twin constructs the raw triple set directly plus
    # the expected carrier line via concatenation with the N-Triples
    # escape chain (backslash first; standard-SQL literals, so '\' is
    # one backslash in DuckDB)
    o["rdf_roundtrip"] = """
        WITH t AS (
            SELECT 'uckg:doc/' || doc_id AS subj, 'uckg:text' AS pred,
                   text AS obj, TRUE AS obj_is_literal,
                   'xsd:string' AS obj_datatype
            FROM documents
            UNION ALL
            SELECT 'uckg:doc/' || doc_id, 'uckg:n_chars',
                   n_chars::VARCHAR, TRUE, 'xsd:integer' FROM documents
            UNION ALL
            SELECT 'uckg:doc/' || doc_id, 'uckg:source',
                   'uckg:source/' || source, FALSE, '' FROM documents
        ), esc AS (
            SELECT *,
                   replace(replace(replace(replace(replace(obj,
                       '\\', '\\\\'), '"', '\\"'), chr(10), '\\n'),
                       chr(13), '\\r'), chr(9), '\\t') AS eobj
            FROM t
        )
        SELECT '<' || subj || '> <' || pred || '> ' ||
               CASE WHEN obj_is_literal THEN
                   '"' || eobj || '"' ||
                   CASE WHEN obj_datatype <> ''
                        THEN '^^<' || obj_datatype || '>' ELSE '' END
               ELSE '<' || obj || '>' END || ' .' AS line,
               subj, pred, obj, obj_is_literal, obj_datatype
        FROM esc
    """

    # struct-pairs twin: same sketch grouping (2..8 members), same
    # exact neighbor-intersection joins
    o["kg_struct_pairs"] = """
        WITH e AS (
            SELECT DISTINCT * FROM (
                SELECT 'order:' || o_orderkey AS src,
                       'cust:' || o_custkey AS dst FROM orders
                UNION ALL
                SELECT 'cust:' || c_custkey,
                       'nation:' || c_nationkey FROM customer
                UNION ALL
                SELECT 'supp:' || s_suppkey,
                       'nation:' || s_nationkey FROM supplier
            )
        ), und AS (
            SELECT src AS node, dst AS nbr FROM e
            UNION
            SELECT dst, src FROM e
        ), sig AS (
            SELECT node,
                   min(('0x' || substr(md5('0:' || nbr), 1, 8))::BIGINT) AS mh0,
                   min(('0x' || substr(md5('0:' || nbr), 9, 8))::BIGINT) AS mh1,
                   min(('0x' || substr(md5('0:' || nbr), 17, 8))::BIGINT) AS mh2,
                   min(('0x' || substr(md5('0:' || nbr), 25, 8))::BIGINT) AS mh3
            FROM und GROUP BY node
        ), small AS (
            SELECT mh0, mh1, mh2, mh3 FROM sig
            GROUP BY mh0, mh1, mh2, mh3
            HAVING count(*) BETWEEN 2 AND 8
        ), members AS (
            SELECT sig.* FROM sig
            JOIN small USING (mh0, mh1, mh2, mh3)
        ), cand AS (
            SELECT a.node AS node_a, b.node AS node_b
            FROM members a JOIN members b
              ON a.mh0 = b.mh0 AND a.mh1 = b.mh1
             AND a.mh2 = b.mh2 AND a.mh3 = b.mh3
             AND a.node < b.node
        ), deg AS (
            SELECT node, count(*)::BIGINT AS deg FROM und GROUP BY node
        ), inter AS (
            SELECT c.node_a, c.node_b, count(*)::BIGINT AS inter
            FROM cand c
            JOIN und ua ON ua.node = c.node_a
            JOIN und ub ON ub.node = c.node_b AND ub.nbr = ua.nbr
            GROUP BY c.node_a, c.node_b
        )
        SELECT i.node_a, i.node_b, i.inter,
               (da.deg + db.deg - i.inter)::BIGINT AS uni
        FROM inter i
        JOIN deg da ON da.node = i.node_a
        JOIN deg db ON db.node = i.node_b
    """

    # corr twin: identical exact bigint moments, identical float64 op
    # tree for the display value (HUGEINT sums cast back to BIGINT)
    o["grouped_corr"] = """
        WITH base AS (
            SELECT source AS grp, n_chars::BIGINT AS x,
                   len(list_filter(string_split(text, ' '),
                                   t -> t <> ''))::BIGINT AS y
            FROM documents WHERE n_chars IS NOT NULL
        ), agg AS (
            SELECT grp, count(*)::BIGINT AS n,
                   sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                   sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy,
                   sum(x * y)::BIGINT AS sxy
            FROM base GROUP BY grp
        )
        SELECT grp, n,
               (n * sxy - sx * sy)::BIGINT AS cov_num,
               (n * sxx - sx * sx)::BIGINT AS varx_num,
               (n * syy - sy * sy)::BIGINT AS vary_num,
               (CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                     THEN floor(1000000.0
                          * (n * sxy - sx * sy)::DOUBLE
                          / sqrt((n * sxx - sx * sx)::DOUBLE
                                 * (n * syy - sy * sy)::DOUBLE))
                     ELSE 0 END)::BIGINT AS corr_e6
        FROM agg
    """

    # struct-groups twin: same symmetrized neighbor set, same md5
    # hash-family slices, same full-signature grouping
    o["kg_struct_groups"] = """
        WITH e AS (
            SELECT DISTINCT * FROM (
                SELECT 'order:' || o_orderkey AS src,
                       'cust:' || o_custkey AS dst FROM orders
                UNION ALL
                SELECT 'cust:' || c_custkey,
                       'nation:' || c_nationkey FROM customer
                UNION ALL
                SELECT 'supp:' || s_suppkey,
                       'nation:' || s_nationkey FROM supplier
            )
        ), und AS (
            SELECT src AS node, dst AS nbr FROM e
            UNION
            SELECT dst, src FROM e
        ), sig AS (
            SELECT node,
                   min(('0x' || substr(md5('0:' || nbr), 1, 8))::BIGINT) AS mh0,
                   min(('0x' || substr(md5('0:' || nbr), 9, 8))::BIGINT) AS mh1,
                   min(('0x' || substr(md5('0:' || nbr), 17, 8))::BIGINT) AS mh2,
                   min(('0x' || substr(md5('0:' || nbr), 25, 8))::BIGINT) AS mh3
            FROM und GROUP BY node
        )
        SELECT mh0, mh1, mh2, mh3, count(*)::BIGINT AS n_nodes,
               min(node) AS rep
        FROM sig GROUP BY mh0, mh1, mh2, mh3
        HAVING count(*) >= 2
    """

    # mad twin: the same cross-multiplied discrete medians (of v, then
    # of |v − med|) and the same raw-MAD-units gate
    o["mad_outliers"] = """
        WITH base AS (
            SELECT doc_id AS id, source AS grp, n_chars::BIGINT AS v
            FROM documents WHERE n_chars IS NOT NULL
        ), cd1 AS (
            SELECT grp, v,
                   count(*) OVER (PARTITION BY grp ORDER BY v
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT AS cle,
                   count(*) OVER (PARTITION BY grp)::BIGINT AS tot
            FROM base
        ), med AS (
            SELECT grp, min(CASE WHEN cle * 2 >= tot THEN v END) AS med
            FROM cd1 GROUP BY grp
        ), dev AS (
            SELECT base.id, base.grp, base.v,
                   abs(base.v - med.med)::BIGINT AS dev
            FROM base JOIN med USING (grp)
        ), cd2 AS (
            SELECT grp, dev,
                   count(*) OVER (PARTITION BY grp ORDER BY dev
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT AS cle,
                   count(*) OVER (PARTITION BY grp)::BIGINT AS tot
            FROM dev
        ), madt AS (
            SELECT grp, min(CASE WHEN cle * 2 >= tot THEN dev END
                   )::BIGINT AS mad
            FROM cd2 GROUP BY grp
        )
        SELECT dev.id, dev.grp, dev.v, dev.dev, madt.mad,
               (dev.dev > 3 * madt.mad) AS is_outlier
        FROM dev JOIN madt USING (grp)
    """

    # hits twin: the same two fixed-point iterations unrolled —
    # a1 = indeg·1e6 (every h0 is 1e6), then h1, a2, h2 as join-sums
    o["kg_hits"] = """
        WITH e AS (
            SELECT DISTINCT * FROM (
                SELECT 'order:' || o_orderkey AS src,
                       'cust:' || o_custkey AS dst FROM orders
                UNION ALL
                SELECT 'cust:' || c_custkey,
                       'nation:' || c_nationkey FROM customer
                UNION ALL
                SELECT 'supp:' || s_suppkey,
                       'nation:' || s_nationkey FROM supplier
            )
        ), nodes AS (
            SELECT src AS node FROM e UNION SELECT dst FROM e
        ), a1 AS (
            SELECT dst AS node, (count(*) * 1000000)::BIGINT AS a
            FROM e GROUP BY dst
        ), h1 AS (
            SELECT e.src AS node, sum(a1.a)::BIGINT AS h
            FROM e JOIN a1 ON e.dst = a1.node GROUP BY e.src
        ), a2 AS (
            SELECT e.dst AS node, sum(h1.h)::BIGINT AS a
            FROM e JOIN h1 ON e.src = h1.node GROUP BY e.dst
        ), h2 AS (
            SELECT e.src AS node, sum(a2.a)::BIGINT AS h
            FROM e JOIN a2 ON e.dst = a2.node GROUP BY e.src
        )
        SELECT n.node, coalesce(a2.a, 0)::BIGINT AS auth,
               coalesce(h2.h, 0)::BIGINT AS hub
        FROM nodes n
        LEFT JOIN a2 ON n.node = a2.node
        LEFT JOIN h2 ON n.node = h2.node
    """

    # confusion twin: same four conditional counts, same integer-div
    # ratios, same -1 undefined sentinel
    o["confusion"] = """
        WITH base AS (
            SELECT n_chars::BIGINT AS s, (lang = 'en') AS y
            FROM documents
            WHERE n_chars IS NOT NULL AND lang IS NOT NULL
        ), agg AS (
            SELECT
                coalesce(sum(CASE WHEN s >= 250 AND y THEN 1 END), 0)::BIGINT AS tp,
                coalesce(sum(CASE WHEN s >= 250 AND NOT y THEN 1 END), 0)::BIGINT AS fp,
                coalesce(sum(CASE WHEN s < 250 AND y THEN 1 END), 0)::BIGINT AS fn,
                coalesce(sum(CASE WHEN s < 250 AND NOT y THEN 1 END), 0)::BIGINT AS tn
            FROM base
        )
        SELECT tp, fp, fn, tn,
               (CASE WHEN tp + fp > 0
                     THEN (tp * 1000000) // (tp + fp)
                     ELSE -1 END)::BIGINT AS prec_e6,
               (CASE WHEN tp + fn > 0
                     THEN (tp * 1000000) // (tp + fn)
                     ELSE -1 END)::BIGINT AS rec_e6,
               (CASE WHEN 2 * tp + fp + fn > 0
                     THEN (2 * tp * 1000000) // (2 * tp + fp + fn)
                     ELSE -1 END)::BIGINT AS f1_e6
        FROM agg
    """

    # auc twin: same doubled average-rank identity, same integer div
    o["auc"] = """
        WITH base AS (
            SELECT n_chars::BIGINT AS s, (lang = 'en') AS y
            FROM documents
            WHERE n_chars IS NOT NULL AND lang IS NOT NULL
        ), ranked AS (
            SELECT y,
                   2 * rank() OVER (ORDER BY s)::BIGINT
                     + count(*) OVER (PARTITION BY s)::BIGINT - 1 AS r2
            FROM base
        ), agg AS (
            SELECT sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS n_pos,
                   sum(CASE WHEN NOT y THEN 1 ELSE 0 END)::BIGINT AS n_neg,
                   sum(CASE WHEN y THEN r2 END)::BIGINT AS r2_pos
            FROM ranked
        )
        SELECT n_pos, n_neg,
               (r2_pos - n_pos * (n_pos + 1))::BIGINT AS auc_num,
               (2 * n_pos * n_neg)::BIGINT AS auc_den,
               (CASE WHEN n_pos * n_neg > 0
                     THEN ((r2_pos - n_pos * (n_pos + 1)) * 1000000)
                          // (2 * n_pos * n_neg) END)::BIGINT AS auc_e6
        FROM agg
    """

    # pareto twin: the O(n²) NOT-EXISTS dominance formulation — a
    # STRUCTURALLY different algorithm than the window form it checks
    o["pareto_front"] = """
        WITH p AS (
            SELECT p_partkey, p_size::BIGINT AS x,
                   round(p_retailprice * 100)::BIGINT AS y
            FROM part
        )
        SELECT a.p_partkey, a.x, a.y FROM p a
        WHERE NOT EXISTS (
            SELECT 1 FROM p b
            WHERE b.x >= a.x AND b.y >= a.y
              AND (b.x > a.x OR b.y > a.y))
    """

    # label-spread twin: same 6-dp cosine, same (cos desc, id) neighbor
    # rank and (votes desc, label) winner rule
    o["label_spread"] = """
        WITH unl AS (
            SELECT vec_id, embedding::DOUBLE[] AS v, label
            FROM embeddings WHERE vec_id % 5 = 0
        ), lab AS (
            SELECT vec_id, embedding::DOUBLE[] AS v, label
            FROM embeddings WHERE vec_id % 5 <> 0
        ), sims AS (
            SELECT u.vec_id AS qid, l.vec_id AS nid, l.label,
                   round(list_dot_product(u.v, l.v)
                         / (sqrt(list_dot_product(u.v, u.v))
                            * sqrt(list_dot_product(l.v, l.v))), 6) AS cs
            FROM unl u, lab l
        ), top AS (
            SELECT qid, label FROM (
                SELECT qid, label,
                       row_number() OVER (PARTITION BY qid
                           ORDER BY cs DESC, nid) AS rn
                FROM sims) WHERE rn <= 5
        ), votes AS (
            SELECT qid, label, count(*)::BIGINT AS votes
            FROM top GROUP BY qid, label
        )
        SELECT w.qid AS vec_id, u.label::BIGINT AS true_label,
               w.label::BIGINT AS pred_label, w.votes
        FROM (SELECT qid, label, votes,
                     row_number() OVER (PARTITION BY qid
                         ORDER BY votes DESC, label) AS wr
              FROM votes) w
        JOIN unl u ON u.vec_id = w.qid
        WHERE w.wr = 1
    """

    # bucketed twin: identical vote tail, but candidates come from the
    # IVF cells (labeled rows assigned to 1 cell, queries probing 4) —
    # the same hash-stratified seed rule and dot/|c| assignment ranking
    # as the ann_ivf_topk twin, unrefined (refine_iters=0)
    o["label_spread_bucketed"] = f"""
        WITH {ivf_seed_cte},
        -- each side normalized ONCE (unit vectors), so per-pair cosine
        -- is a single sequential dot — mirrors the Spark operator's
        -- normalize-then-dot tree exactly (same IEEE op order)
        unl AS (
            SELECT vec_id, embedding::DOUBLE[] AS v,
                   list_transform(
                       embedding::DOUBLE[],
                       x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                                      embedding::DOUBLE[]))
                   ) AS u, label
            FROM embeddings WHERE vec_id % 5 = 0
        ), lab AS (
            SELECT vec_id, embedding::DOUBLE[] AS v,
                   list_transform(
                       embedding::DOUBLE[],
                       x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                                      embedding::DOUBLE[]))
                   ) AS u, label
            FROM embeddings WHERE vec_id % 5 <> 0
        ), lab_assign AS (
            SELECT vec_id, c_id AS cell FROM (
                SELECT l.vec_id, c.c_id,
                       row_number() OVER (PARTITION BY l.vec_id
                           ORDER BY list_dot_product(l.v, c.cv)
                                    / sqrt(list_dot_product(c.cv, c.cv))
                                    DESC, c.c_id) AS rn
                FROM lab l, cent0 c)
            WHERE rn = 1
        ), unl_probe AS (
            SELECT vec_id, c_id AS cell FROM (
                SELECT u.vec_id, c.c_id,
                       row_number() OVER (PARTITION BY u.vec_id
                           ORDER BY list_dot_product(u.v, c.cv)
                                    / sqrt(list_dot_product(c.cv, c.cv))
                                    DESC, c.c_id) AS rn
                FROM unl u, cent0 c)
            WHERE rn <= 4
        ), sims AS (
            SELECT u.vec_id AS qid, l.vec_id AS nid, l.label,
                   round(list_dot_product(u.u, l.u), 6) AS cs
            FROM unl_probe p
            JOIN lab_assign a USING (cell)
            JOIN unl u ON u.vec_id = p.vec_id
            JOIN lab l ON l.vec_id = a.vec_id
        ), top AS (
            SELECT qid, label FROM (
                SELECT qid, label,
                       row_number() OVER (PARTITION BY qid
                           ORDER BY cs DESC, nid) AS rn
                FROM sims) WHERE rn <= 5
        ), votes AS (
            SELECT qid, label, count(*)::BIGINT AS votes
            FROM top GROUP BY qid, label
        )
        SELECT w.qid AS vec_id, u.label::BIGINT AS true_label,
               w.label::BIGINT AS pred_label, w.votes
        FROM (SELECT qid, label, votes,
                     row_number() OVER (PARTITION BY qid
                         ORDER BY votes DESC, label) AS wr
              FROM votes) w
        JOIN unl u ON u.vec_id = w.qid
        WHERE w.wr = 1
    """

    # rank-normalize twin: same min-rank tie rule, same integer division
    o["rank_normalize"] = """
        SELECT doc_id, source, n_chars,
               CASE WHEN cnt > 1
                    THEN ((rk - 1) * 1000000) // (cnt - 1)
                    ELSE 0 END::BIGINT AS pct_e6
        FROM (
            SELECT doc_id, source, n_chars,
                   rank() OVER (PARTITION BY source
                                ORDER BY n_chars)::BIGINT AS rk,
                   count(*) OVER (PARTITION BY source)::BIGINT AS cnt
            FROM documents WHERE n_chars IS NOT NULL
        )
    """

    # heavy-hitters twin: the plain GROUP BY ... HAVING — the CMS stage
    # is a never-undercounting prefilter, so the result is identical
    o["heavy_hitters"] = """
        WITH tok AS (
            SELECT unnest(list_filter(string_split(text, ' '),
                                      x -> x <> '')) AS value
            FROM documents
        ), tot AS (SELECT count(*)::BIGINT AS n FROM tok)
        SELECT value, count(*)::BIGINT AS n
        FROM tok, tot
        GROUP BY value, tot.n
        HAVING count(*) >= greatest(1, tot.n // 50)
    """

    # chunking twin: same start lattice (range excludes n ≡ sequence to
    # n-1), same 1-based inclusive slice, same space re-join
    o["doc_chunks"] = """
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents
        ), ex AS (
            SELECT doc_id, toks, unnest(range(0, len(toks), 24)) AS s
            FROM tok WHERE len(toks) > 0
        )
        SELECT doc_id,
               (s // 24)::BIGINT AS chunk_idx,
               s::BIGINT AS start,
               len(toks[s + 1 : s + 32])::BIGINT AS n_tokens,
               array_to_string(toks[s + 1 : s + 32], ' ') AS text_chunk
        FROM ex
    """

    # kge twin: identical bucketed dense index (md5-bucket + in-bucket
    # row_number + prefix-sum offsets), identical \x01-joined corruption
    # hash, identical filtered-protocol anti-join
    o["kge_negatives"] = """
        WITH e AS (
            SELECT DISTINCT * FROM (
                SELECT 'cust:' || c_custkey AS s, 'in_nation' AS p,
                       'nation:' || c_nationkey AS o FROM customer
                UNION ALL
                SELECT 'supp:' || s_suppkey, 'in_nation',
                       'nation:' || s_nationkey FROM supplier
            )
        ), nodes AS (
            SELECT DISTINCT node FROM (
                SELECT s AS node FROM e UNION SELECT o FROM e)
        ), bucketed AS (
            SELECT node,
                   ('0x' || substr(md5(node), 1, 8))::BIGINT % 64 AS b,
                   row_number() OVER (
                       PARTITION BY ('0x' || substr(md5(node), 1, 8))::BIGINT % 64
                       ORDER BY node)::BIGINT - 1 AS rn
            FROM nodes
        ), offs AS (
            SELECT b, sum(cnt) OVER (ORDER BY b
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT - cnt AS off
            FROM (SELECT b, count(*)::BIGINT AS cnt
                  FROM bucketed GROUP BY b)
        ), indexed AS (
            SELECT node, off + rn AS idx
            FROM bucketed JOIN offs USING (b)
        ), total AS (
            SELECT count(*)::BIGINT AS n_nodes FROM nodes
        ), cand AS (
            SELECT s, p, o, i AS sample_i,
                   ('0x' || substr(md5(
                       s || chr(1) || p || chr(1) || o || chr(1)
                         || i::VARCHAR), 1, 15))::BIGINT % n_nodes AS idx
            FROM e, total, (VALUES (0), (1)) AS t(i)
        )
        SELECT c.s AS subj, c.p AS pred, x.node AS neg_obj,
               c.sample_i::BIGINT AS sample_i
        FROM cand c JOIN indexed x USING (idx)
        WHERE NOT EXISTS (
            SELECT 1 FROM e r
            WHERE r.s = c.s AND r.p = c.p AND r.o = x.node)
    """

    # concurrency twin: same boundary-delta netting per (grp, ts),
    # same running sum — no intra-timestamp ordering exists to disagree
    o["interval_concurrency"] = """
        WITH src AS (
            SELECT event_type AS grp, ts, ts + INTERVAL 1 HOUR AS te
            FROM events WHERE user_id % 20 = 0
        ), ev AS (
            SELECT grp, ts, 1 AS d FROM src
            UNION ALL
            SELECT grp, te AS ts, -1 AS d FROM src
        ), net AS (
            SELECT grp, ts, sum(d)::BIGINT AS net
            FROM ev GROUP BY grp, ts
        )
        SELECT grp, ts,
               sum(net) OVER (PARTITION BY grp ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               )::BIGINT AS concurrent
        FROM net
    """

    # bloom_semi twin: the PLAIN semi join — the bloom stage is a
    # false-positive-only prefilter, so the result set is identical
    o["bloom_semi"] = """
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer
            WHERE c_mktsegment = 'BUILDING')
    """

    # scd2 twin: same null-safe collapse (IS DISTINCT FROM ≡ NOT
    # eqNullSafe), same (ts, event_id) tiebreak in BOTH windows so
    # equal-timestamp runs order identically across engines
    o["scd2_history"] = """
        WITH kept AS (
            SELECT user_id, ts, event_type, event_id FROM (
                SELECT user_id, ts, event_type, event_id,
                       lag(event_type) OVER w AS prev,
                       lag(event_id) OVER w AS prev_id
                FROM events WHERE user_id % 20 = 0
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ) WHERE prev_id IS NULL
                 OR prev IS DISTINCT FROM event_type
        )
        SELECT user_id, event_type, ts AS valid_from,
               coalesce(lead(ts) OVER w,
                        TIMESTAMP '9999-12-31 00:00:00') AS valid_to,
               row_number() OVER w::BIGINT AS version,
               (lead(ts) OVER w IS NULL) AS is_current
        FROM kept WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """

    # pii_scrub twin: identical PII synthesis, then the same three
    # sequential scrub passes — patterns live in the RE2 ∩ Java-regex
    # agreement subset (classes, bounded repeats, ASCII \b), counts on
    # each pass's input, 'g' flag = Spark's replace-all default
    o["pii_scrub"] = r"""
        WITH aug AS (
            SELECT doc_id,
                   text || ' contact user' || doc_id || '@mail'
                        || (doc_id % 7) || '.example.com from 10.'
                        || (doc_id % 256) || '.0.' || (doc_id % 100)
                        || ' tel 555-' || (doc_id % 900 + 100) || '-'
                        || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS t0
            FROM documents
        ), s1 AS (
            SELECT doc_id,
                   len(regexp_extract_all(t0,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'
                   ))::BIGINT AS n_email,
                   regexp_replace(t0,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g') AS t1
            FROM aug
        ), s2 AS (
            SELECT doc_id, n_email,
                   len(regexp_extract_all(t1,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'
                   ))::BIGINT AS n_ipv4,
                   regexp_replace(t1,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                       '<IP>', 'g') AS t2
            FROM s1
        )
        SELECT doc_id, regexp_replace(t2,
                   '\b\d{3}[- ]\d{3,4}[- ]\d{4}\b', '<PHONE>', 'g')
                   AS text_scrubbed,
               n_email, n_ipv4,
               len(regexp_extract_all(t2,
                   '\b\d{3}[- ]\d{3,4}[- ]\d{4}\b'))::BIGINT AS n_phone
        FROM s2
    """

    # exact-quota sampler twin: the two-phase Spark execution (prefilter
    # + rank + deficiency fallback) provably returns the per-group top-k
    # by (md5, id), so the twin is the plain one-window form
    o["group_sample_k"] = """
        SELECT doc_id, source, rk FROM (
            SELECT doc_id, source,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(doc_id::VARCHAR), doc_id
                   )::BIGINT AS rk
            FROM documents
        ) WHERE rk <= 5
    """

    # link-prediction twin: same capped bipartite graph, same integer
    # scores (// is DuckDB integer division ≡ Spark's div on bigints),
    # same strict (cn, ra_e6, a, b) total order so the top-100 SET is
    # deterministic in both engines
    o["kg_link_predict"] = """
        WITH e AS (
            SELECT DISTINCT 'cust:' || o.o_custkey AS node,
                   'part:' || l.l_partkey AS hub
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ), hd AS (
            SELECT hub, count(*)::BIGINT AS hdeg FROM e GROUP BY hub
        ), capped AS (
            SELECT e.node, e.hub, hd.hdeg
            FROM e JOIN hd USING (hub) WHERE hd.hdeg <= 40
        ), nd AS (
            SELECT node, count(*)::BIGINT AS deg FROM capped GROUP BY node
        ), pairs AS (
            SELECT x.node AS a, y.node AS b, count(*)::BIGINT AS cn,
                   sum(1000000 // x.hdeg)::BIGINT AS ra_e6
            FROM capped x JOIN capped y
              ON x.hub = y.hub AND x.node < y.node
            GROUP BY x.node, y.node
        )
        SELECT p.a, p.b, p.cn, p.cn AS jacc_num,
               (da.deg + db.deg - p.cn)::BIGINT AS jacc_den, p.ra_e6
        FROM pairs p
        JOIN nd da ON p.a = da.node
        JOIN nd db ON p.b = db.node
        ORDER BY p.cn DESC, p.ra_e6 DESC, p.a, p.b
        LIMIT 100
    """

    o["streaming_dedup_ingest"] = """
        SELECT DISTINCT md5(text) AS digest FROM documents
    """

    o["streaming_first_seen"] = """
        SELECT DISTINCT user_id FROM events
    """

    # merge-on-read net state: base, overridden by u1 (k%7), overridden
    # by u2 (k%21 — higher sequence wins), minus the k%13 delete which
    # applies to every lower-sequence row (base and upserts alike)
    o["catalog_mor"] = """
        SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 21 = 0 THEN 'u2:' || o_custkey
                    WHEN o_orderkey % 7  = 0 THEN 'u1:' || o_custkey
                    ELSE 'b:' || o_custkey END AS v
        FROM orders
        WHERE o_orderkey % 13 <> 0
    """

    # pruned scan twin: pruning may only SKIP FILES, never change the
    # row set, so the oracle is the plain MoR-merged table under the
    # same key range (base even='b:', appended odd='a:', k%7 upserted)
    # video_metadata twin: the builder's parameters are pure integer
    # functions of doc_id, so the parsed-back fields must equal this
    # arithmetic exactly (duration = n_frames * 40 ms at timescale 1000)
    o["video_metadata"] = """
        SELECT doc_id AS media_id,
               (160 + (doc_id % 32) * 8)::INT AS width,
               (90 + (doc_id % 18) * 6)::INT AS height,
               (24 + doc_id % 240)::INT AS n_frames,
               ((24 + doc_id % 240) * 40)::BIGINT AS duration_ms,
               1 AS n_tracks,
               'isom' AS brand
        FROM documents
    """

    # audio_metadata twin: MPEG-1 Layer III tables as inline SQL arrays —
    # bitrate_idx = 1 + doc_id%14 (indices 1..14 of the kbps table),
    # samplerate_idx = doc_id%3; channels is always 2 (mode bits 00)
    o["audio_metadata"] = """
        SELECT doc_id AS media_id,
               ([44100, 48000, 32000])[(doc_id % 3 + 1)::INT] AS rate,
               ([32, 40, 48, 56, 64, 80, 96, 112, 128,
                 160, 192, 224, 256, 320])[(doc_id % 14 + 1)::INT]
                   AS bitrate_kbps,
               (2 + doc_id % 60)::INT AS n_frames,
               2 AS channels
        FROM documents
    """

    # dedup_paragraphs: same deterministic paragraphed-corpus
    # construction as the Spark side (header \n\n text \n\n footer),
    # then the CCNet rule — cut every paragraph whose normalized form
    # (whitespace-collapsed, trimmed, lowercased) appears in >=5
    # distinct docs; survivors rejoin in original order. Parallel
    # unnests align in DuckDB (same list length), same trick as
    # dedup_span_apply; string_agg of zero rows is NULL -> coalesce ''.
    o["dedup_paragraphs"] = """
        WITH inp AS (
            SELECT doc_id,
                   'Subscribe to the ' || source || ' newsletter'
                   || chr(10) || chr(10) || text
                   || chr(10) || chr(10)
                   || 'copyright footer ' || (doc_id % 3)::VARCHAR AS text
            FROM documents
        ), split AS (
            SELECT doc_id,
                   string_split(text, chr(10) || chr(10)) AS ps
            FROM inp
        ), paras AS (
            SELECT doc_id,
                   unnest(range(1, len(ps) + 1)) AS pos,
                   unnest(ps) AS para
            FROM split
        ), normed AS (
            SELECT doc_id, pos, para,
                   lower(trim(regexp_replace(para, '\\s+', ' ', 'g'))) AS norm
            FROM paras
        ), hot AS (
            SELECT norm FROM normed
            GROUP BY norm HAVING count(DISTINCT doc_id) >= 5
        ), kept AS (
            SELECT doc_id, count(*) AS n_kept,
                   string_agg(para, chr(10) || chr(10) ORDER BY pos)
                       AS text_clean
            FROM normed
            WHERE norm NOT IN (SELECT norm FROM hot)
            GROUP BY doc_id
        ), totals AS (
            SELECT doc_id, count(*)::BIGINT AS n_paras
            FROM normed GROUP BY doc_id
        )
        SELECT t.doc_id, t.n_paras,
               (t.n_paras - coalesce(k.n_kept, 0))::BIGINT AS n_removed,
               coalesce(k.text_clean, '') AS text_clean
        FROM totals t LEFT JOIN kept k ON t.doc_id = k.doc_id
    """

    o["catalog_prune"] = """
        SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 7 = 0 THEN 'u:' || o_custkey
                    WHEN o_orderkey % 2 = 0 THEN 'b:' || o_custkey
                    ELSE 'a:' || o_custkey END AS v
        FROM orders
        WHERE o_orderkey <= 2000
    """

    # changelog since the base snapshot: the MoR merge contributes its
    # update rows as inserts AND its keys as an (inert-on-new-keys)
    # equality-delete file at the same sequence; the delete commit
    # contributes keys-only delete rows one sequence later
    o["catalog_changelog"] = """
        SELECT o_orderkey AS k, 'u:' || o_custkey AS v,
               'insert' AS _change_type, 2::BIGINT AS _commit_seq
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey, '', 'delete', 2::BIGINT
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey, '', 'delete', 3::BIGINT
        FROM orders WHERE o_orderkey % 13 = 0
    """

    # schema evolution: even keys predate the added column (sentinel -1),
    # odd keys carry it
    o["catalog_evolution"] = """
        SELECT o_orderkey AS k, 'v:' || o_custkey AS v,
               CASE WHEN o_orderkey % 2 = 1 THEN o_custkey
                    ELSE -1 END::BIGINT AS extra
        FROM orders
    """

    # the tag resolves to v1's row set even after the overwrite + expiry
    o["catalog_tag"] = """
        SELECT o_orderkey AS k, 'v1:' || o_custkey AS v
        FROM orders WHERE o_orderkey % 3 = 0
    """

    return o
