"""Corpus-composition operators: deterministic stratified sampling and
token-budget sequence packing — the two steps that turn a deduplicated,
filtered web corpus into balanced training batches.

- stratified sampling (domain rebalancing, as in The Pile / RefinedWeb
  mixture construction): cap every group (source/host/language) at a
  target document count WITHOUT a per-group sort. Hash-threshold
  sampling keeps doc d iff h32(doc_id) mod 1e6 < rate_e6(group), where
  the rate comes from a broadcast-sized per-group count table — one
  map-side filter over the corpus, no shuffle of the big side, fully
  deterministic so resume/idempotency hold and the DuckDB oracle
  reproduces it bit-for-bit.
- sequence packing (GPT-style concatenation packing): lay every group's
  token stream end-to-end and cut every ``budget`` tokens; a document
  knows its start offset and which chunks it straddles. Per-group
  window cumsum = one shuffle partitioned by group, sorted by doc_id —
  the per-shard packing a distributed tokenizer job runs. (A single
  GLOBAL stream would need the classic two-phase prefix-sum — per-
  partition totals collected once, then offsets broadcast back — noted
  here because ORDER BY without PARTITION BY is a one-reducer hotspot;
  per-group packing avoids it by construction.)

All rates are exact parts-per-million integers (the repo convention) and
the portable hash is dedup.h32 (md5-based, mirrored in SQL), so both
operators have exact DuckDB twins.

Reference parity note: the reference ingests every record it fetches
(e.g. /root/reference/data_collection/cve_collection.py paginates the
full NVD feed) — corpus composition is part of the web-scale graft
surface, not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import h32, shingles, tokens

E6 = 1000000


def stratified_sample(
    docs: DataFrame, group_col: str = "source", target_per_group: int = 100
) -> DataFrame:
    """Deterministically downsample each group to ≈ ``target_per_group``
    docs via hash-threshold sampling. Groups at or under the target are
    kept whole; a group of size c keeps docs whose
    ``h32(doc_id) mod 1e6`` falls under ``floor(1e6·target/c)``.

    The per-group count table is broadcast (group cardinality — hosts,
    sources, languages — is tiny relative to the corpus by definition),
    so the big side is never shuffled: one scan, one map-side filter.
    Adds ``rate_e6`` so downstream loss-weighting can undo the bias.
    """
    counts = docs.groupBy(group_col).agg(F.count("*").alias("group_n"))
    rate = F.least(
        F.lit(E6),
        F.floor(F.lit(E6) * F.lit(target_per_group) / F.col("group_n")),
    ).cast("bigint")
    bucket = F.pmod(h32(F.col("doc_id").cast("string")), F.lit(E6))
    return (
        docs.join(F.broadcast(counts.withColumn("rate_e6", rate)), group_col)
        .filter(bucket < F.col("rate_e6"))
        .select("doc_id", group_col, "rate_e6")
    )


def group_sample_k(
    docs: DataFrame,
    group_col: str = "source",
    k: int = 5,
    id_col: str = "doc_id",
    safety: int = 4,
) -> DataFrame:
    """EXACT-quota deterministic per-group sample: the ``k`` docs of
    each group whose ``(md5(id), id)`` sorts smallest — the eval-set /
    few-shot-prompt construction contract where quotas are hard.
    ``stratified_sample`` keeps ≈target per group with one map-side
    filter (the right default for corpus downsampling); this guarantees
    exactly ``min(k, |group|)`` rows per group. Returns
    ``(id, group, rk)`` with rk the 1-based rank inside the group.

    md5 (not xxhash64) because the sample membership is part of the
    contract and must be re-derivable OUTSIDE Spark (the DuckDB twin, a
    data loader auditing the split): md5 is engine-portable, xxhash64's
    seed is an implementation detail.

    Scale shape — a naive ``row_number() OVER (PARTITION BY group)``
    puts each group in ONE task (5 TB/task when 100 TB has 20 sources).
    Instead, two phases with an exactness-preserving fallback:

    1. PREFILTER: keep rows whose 32-bit md5 prefix falls under
       ``safety·k/|group|`` of the hash space (threshold from a
       broadcast per-group count table — one scan, map-side filter,
       the stratified_sample shape). Survivors form a downward-closed
       prefix of the (md5, id) order, ~safety·k rows per group, so
       whenever a group keeps ≥ k survivors its true top-k is provably
       inside them.
    2. RANK the survivors (a window over ~safety·k rows per group, not
       the group). Groups that kept < k survivors (Chernoff-rare at
       safety=4, but possible) fall back to ranking their full rows —
       the fallback only changes WHERE the work happens, never the
       result, so the oracle is the plain one-window SQL.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    key = F.md5(F.col(id_col).cast("string"))
    # 32-bit numeric prefix of the md5: lexicographic order on the full
    # digest is prefix-dominated, so {key32 < t} is downward-closed
    key32 = F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint")
    counts = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_gn"))
    thresh = counts.withColumn(
        "_t",
        F.least(
            F.lit(1 << 32).cast("bigint"),
            (F.lit((1 << 32) * safety * k) / F.col("_gn"))
            .cast("bigint") + F.lit(1),
        ),
    )
    tagged = docs.select(F.col(id_col), F.col(group_col)).join(
        F.broadcast(thresh), group_col)
    surv = tagged.filter(key32 < F.col("_t"))
    surv_n = surv.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_sn"))
    group_state = thresh.join(surv_n, group_col, "left").withColumn(
        "_ok", F.coalesce(F.col("_sn"), F.lit(0)) >= F.lit(k))
    candidates = surv.join(
        F.broadcast(group_state.filter("_ok").select(group_col)), group_col
    ).unionByName(
        # fallback: deficient groups rank all their rows (usually none)
        tagged.join(
            F.broadcast(group_state.filter("NOT _ok").select(group_col)),
            group_col,
        )
    )
    w = Window.partitionBy(group_col).orderBy(key, F.col(id_col))
    return (
        candidates.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select(id_col, group_col, "rk")
    )


def training_chunks(
    docs: DataFrame,
    vocab: DataFrame,
    budget: int = 2048,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Materialize the actual training batches: encode every document
    through ``vocab`` (OOV → 0), lay each group's token-id stream
    end-to-end in doc_id order, and cut every ``budget`` ids — the
    chunk table a data loader reads. Returns ``group, chunk_id,
    n_tokens, ids`` (ids space-joined, in stream order; the final chunk
    of a group may be short).

    Composition of the family's pieces, kept fully distributed:
    per-doc token counts feed a per-group window cumsum (one shuffle)
    for start offsets; ids explode with positions, map through the
    BROADCAST vocab (corpus side never shuffles for the lookup), take
    global position = doc start + local position, and aggregate by
    (group, chunk = global_pos div budget) — one final shuffle keyed by
    the chunk, which is exactly the output partitioning a loader wants.
    """
    n_tok = F.size(tokens(F.col(text_col))).cast("bigint")
    w = (
        Window.partitionBy("group")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_off = (
        docs.select(
            "doc_id",
            F.col(group_col).alias("group"),
            F.col(text_col).alias("_text"),
            n_tok.alias("n_tokens"),
        )
        .withColumn(
            "start_offset",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint"),
        )
    )
    toks = with_off.select(
        "group",
        "start_offset",
        F.posexplode(tokens(F.col("_text"))).alias("pos", "token"),
    )
    placed = toks.join(
        F.broadcast(vocab.select("token", "vocab_id")), "token", "left"
    ).select(
        "group",
        (F.col("start_offset") + F.col("pos")).alias("global_pos"),
        F.coalesce(F.col("vocab_id"), F.lit(0)).cast("bigint").alias("vid"),
    )
    return (
        placed.withColumn(
            "chunk_id", F.floor(F.col("global_pos") / budget).cast("bigint")
        )
        .groupBy("group", "chunk_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("global_pos", "vid"))
                    ),
                    lambda s: s["vid"].cast("string"),
                ),
            ).alias("ids"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Concatenation-pack each group's documents (ordered by doc_id)
    into fixed ``budget``-token training chunks. A document starts at
    the running token offset of its group; chunks cut every ``budget``
    tokens regardless of document boundaries (GPT-style packing), so a
    doc may straddle chunks.

    Returns ``doc_id, group, n_tokens, start_offset, first_chunk,
    last_chunk, n_chunks`` — enough for a loader to locate any doc and
    for an auditor to verify no token is dropped or double-counted.

    One shuffle: the window is partitioned by group and sorted by
    doc_id, i.e. per-shard packing. Empty docs get ``last_chunk =
    first_chunk`` (they live AT their offset, spanning nothing).
    """
    w = (
        Window.partitionBy("group")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_tok = F.size(tokens(F.col(text_col))).cast("bigint")
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    first = F.floor(F.col("start_offset") / budget).cast("bigint")
    last = F.floor(
        (F.col("start_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
        / budget
    ).cast("bigint")
    return (
        docs.select("doc_id", F.col(group_col).alias("group"), n_tok.alias("n_tokens"))
        .withColumn("start_offset", start)
        .select(
            "doc_id",
            "group",
            "n_tokens",
            "start_offset",
            first.alias("first_chunk"),
            last.alias("last_chunk"),
            (last - first + 1).alias("n_chunks"),
        )
    )


def contamination_report(
    docs: DataFrame,
    eval_group: str,
    n: int = 5,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/eval decontamination check (Brown et al. 2020 app. C;
    standard before any LLM training run): for every document in
    ``eval_group``, count how many of its distinct word ``n``-gram
    shingles also occur anywhere in the REST of the corpus (the training
    split). Returns ``doc_id, n_shingles, n_contaminated`` for every
    eval doc — rows with ``n_contaminated = 0`` are the provably-clean
    ones, and docs shorter than ``n`` tokens report ``0, 0``.

    Scale shape: the eval side is small by construction (benchmarks are
    KBs, corpora are TBs); the train side reduces to DISTINCT shingles —
    a map-side-combinable aggregation that is also the join key, so the
    one corpus-wide shuffle is keyed exactly right. Hot shingles (stop-
    word runs) skew that shuffle; AQE splits them. In production the
    join key would be h32(shingle) to cut shuffle bytes ~5× (collisions
    only ever OVER-count contamination — conservative in the safe
    direction); the string key here keeps the operator exact.
    """
    from .dedup import shingle_rows

    # split BEFORE shingling (the group filter then pushes into the
    # parquet scan instead of running on exploded rows) and shingle via
    # the Arrow kernel with per-doc dedup — per-doc-distinct followed by
    # the global distinct is the same set as distinct-after-explode,
    # with fewer rows entering each shuffle (guide §2.3)
    eval_sh = shingle_rows(
        docs.filter(F.col(group_col) == eval_group), n, text_col,
        id_col=id_col, distinct=True,
    ).select(F.col("id").alias("doc_id"), F.col("token").alias("shingle"))
    train_sh = (
        shingle_rows(
            docs.filter(F.col(group_col) != eval_group), n, text_col,
            id_col=id_col, distinct=True,
        )
        .select(F.col("token").alias("shingle"))
        .distinct()
        .withColumn("_hit", F.lit(1).cast("bigint"))
    )
    per_doc = (
        eval_sh.join(train_sh, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("bigint")
            .alias("n_contaminated"),
        )
    )
    all_eval = docs.filter(F.col(group_col) == eval_group).select(
        F.col(id_col).alias("doc_id")
    )
    return all_eval.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shingles", F.lit(0)).cast("bigint").alias("n_shingles"),
        F.coalesce("n_contaminated", F.lit(0)).cast("bigint")
        .alias("n_contaminated"),
    )


def curate_corpus(
    docs: DataFrame,
    min_quality_e6: int = 600_000,
    max_dup_frac_e6: int = 600_000,
    lang: str = "en",
    lang_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """The curation pipeline END-TO-END — the composition a real
    training-data job runs, wired from the family's own operators:
    exact dedup APPLY (keep min doc_id per byte-identical group) →
    language gate → Gopher-style quality floor → repetition ceiling.
    Returns ``doc_id, quality_e6, dup_token_frac_e6`` for the kept docs.

    Order matters and is part of the contract: dedup runs over the FULL
    corpus (so the keeper of a cross-language duplicate group is chosen
    before the language gate), while the two score operators run only
    over the deduped, language-gated survivors — at web scale that is
    the difference between scoring 100 TB and scoring the ~half that
    survives. Stage costs: one digest shuffle (dedup), a narrow filter,
    one (doc, token)-keyed shuffle (repetition), column algebra
    (quality), two doc_id joins of already-small score tables.
    """
    from .dedup import exact_dedup_apply
    from .textstats import quality_scores
    from .webtext import repetition_scores

    kept = exact_dedup_apply(docs).filter(F.col(lang_col) == lang)
    ql = quality_scores(kept).select(id_col, "quality_e6")
    rp = repetition_scores(kept).select(id_col, "dup_token_frac_e6")
    return (
        kept.select(id_col)
        .join(ql, id_col)
        .join(rp, id_col)
        .filter(
            (F.col("quality_e6") >= min_quality_e6)
            & (F.col("dup_token_frac_e6") <= max_dup_frac_e6)
        )
    )


def sliding_chunks(
    docs: DataFrame,
    chunk_size: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RAG-style overlapping chunking: windows of ``chunk_size`` tokens
    starting every ``stride`` tokens (``stride < chunk_size`` ⇒ overlap
    of ``chunk_size − stride``), tail windows shorter — the retrieval
    index's unit of text, and the other half of the packing story:
    ``training_chunks`` cuts a CONCATENATED stream for pretraining;
    this cuts PER-DOCUMENT overlapping windows so no retrieval boundary
    splits an answer span. Returns
    ``(id, chunk_idx, start, n_tokens, text_chunk)``.

    Exactness: pure integer array algebra — starts are
    ``sequence(0, n−1, stride)`` (every start < n, so the tail is never
    dropped: the window at the last start always covers the final
    token), the chunk is a 1-based ``slice``. Empty docs yield no rows.

    Scale shape: ZERO shuffles — tokenize, sequence, explode, slice are
    all row-local; the output lands partitioned exactly like the input
    corpus, which is what a retrieval-index writer wants to bucket on.
    """
    if chunk_size < 1:
        raise ValueError("chunk_size must be >= 1")
    if stride < 1:
        raise ValueError("stride must be >= 1")
    t = (
        docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .withColumn("_n", F.size("_toks"))
        .filter(F.col("_n") > 0)
        .select(
            id_col, "_toks",
            F.explode(
                F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
            ).alias("start"),
        )
        .select(
            id_col, "start",
            F.slice(F.col("_toks"), F.col("start") + 1, chunk_size)
            .alias("_chunk"),
        )
    )
    return t.select(
        F.col(id_col),
        F.expr(f"start div {stride}").cast("bigint").alias("chunk_idx"),
        F.col("start").cast("bigint").alias("start"),
        F.size("_chunk").cast("bigint").alias("n_tokens"),
        F.array_join("_chunk", " ").alias("text_chunk"),
    )


def source_overlap(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-composition diagnostic: pairwise shingle-set overlap
    between groups (sources/hosts/dumps) — ``(src_a, src_b, inter,
    uni)`` with Jaccard as the exact ``inter/uni`` rational. This is
    the mixture-health check run before weighting a training mix: two
    "different" sources with near-1 Jaccard are the same crawl twice
    (double-weighting one voice), and near-0 overlap flags a source
    that needs its own curation thresholds.

    Scale shape: distinct (group, shingle) projection (map-side
    combinable), then a self-join KEYED ON THE SHINGLE — per-shingle
    fan-out is bounded by C(G, 2) where G is the number of groups
    (tiny by definition: sources, not documents), so the join never
    approaches |corpus|²; per-group set sizes ride a broadcast join.
    """
    from .dedup import shingle_rows

    sh = shingle_rows(
        docs, 3, text_col, id_col=group_col, distinct=True
    ).select(
        F.col("id").alias("g"), F.col("token").alias("s")
    ).distinct()
    sizes = sh.groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    # per-shingle group-set combinations instead of the shingle-keyed
    # self-join (guide §2.4): one groupBy(s) shuffle, then each sorted
    # group set explodes into its C(|gs|, 2) ordered pairs — the same
    # (src_a < src_b) pair multiset the join produced, and |gs| is
    # bounded by the number of groups (sources), tiny by definition
    # (two chained codegen generators, not flatten(transform(...)) —
    # same C(g, 2) combination multiset, see graphalgs.link_prediction)
    inter = (
        sh.groupBy("s")
        .agg(F.sort_array(F.collect_set("g")).alias("gs"))
        .select("gs", F.posexplode("gs").alias("i", "src_a"))
        .select(
            "src_a",
            F.explode(F.slice("gs", F.col("i") + 2, F.size("gs")))
            .alias("src_b"),
        )
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    na = sizes.select(F.col("g").alias("src_a"), F.col("n").alias("_na"))
    nb = sizes.select(F.col("g").alias("src_b"), F.col("n").alias("_nb"))
    return (
        inter.join(F.broadcast(na), "src_a").join(F.broadcast(nb), "src_b")
        .select(
            "src_a", "src_b", "inter",
            (F.col("_na") + F.col("_nb") - F.col("inter"))
            .cast("bigint").alias("uni"),
        )
    )
