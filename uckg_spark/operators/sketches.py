"""Mergeable cardinality sketches — the approximate-aggregate family a
100 TB curation pipeline runs where exact ``count(DISTINCT ...)`` would
shuffle every distinct value (per-host URL cardinality, per-shard vocab
size, dictionary-coverage monitoring in the KG build).

``kmv_distinct`` is the K-minimum-values estimator (Bar-Yossef et al.
2002): keep the k smallest values of a uniform hash; the k-th smallest
fraction of the hash space estimates the distinct count as
``(k-1) / h_k``. Deliberately INTEGER-exact end to end — the hash is the
repo's portable 32-bit md5 prefix (`operators.dedup.h32`) and the
estimate is one bigint division, so the result is bit-identical across
engines and run-to-run, unlike HyperLogLog whose register layout is
implementation-defined (Spark's approx_count_distinct and DuckDB's can
NEVER be oracle-matched — this sketch can, with the same accuracy
regime).

Reference parity: the reference counts entities per source table to
decide delta-syncs (/root/reference/process/shared_functions.py record-count
queries); at web scale those counts become cardinality sketches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import h32

# h32 draws from [0, 2^32): the estimator's hash-space size
_H_SPACE = 1 << 32


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct-count estimate:
    ``(grp, k_used, est_distinct, true_distinct)``.

    Exact semantics (engine-portable):
      h(v)     = first 8 hex chars of md5(cast(v as string)) as bigint
      H_g      = DISTINCT {h(v) : v in group g}
      k_used   = min(k, |H_g|);  h_k = the k_used-th smallest of H_g
      estimate = |H_g|                     if |H_g| < k   (sketch is exact)
               = (k-1) * 2^32 div h_k      otherwise

    ``true_distinct`` (exact countDistinct) rides along so the estimate's
    error is visible in the result itself — drop it in production use.

    Scale shape: the DISTINCT on (group, hash) is the only full-width
    shuffle, and it combines map-side (duplicate values collapse before
    the exchange). The per-group window sort then runs over DISTINCT
    hashes only. The textbook production refinement — merge
    partition-local k-smallest sketches instead of sorting all distinct
    hashes (KMV is a mergeable sketch: union the hash sets, re-take the
    k smallest) — changes no results and bounds the sort input to
    k × n_partitions per group; worth it only when single groups hold
    billions of distinct values.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    hashed = (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(value_col).cast("string").alias("v"),
        )
        .select("grp", h32(F.col("v")).alias("h"), F.col("v"))
    )
    distinct_h = hashed.select("grp", "h").distinct()
    w = Window.partitionBy("grp").orderBy("h")
    sketch = (
        distinct_h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k_used"),
            F.max("h").alias("h_k"),
        )
    )
    exact = hashed.groupBy("grp").agg(
        F.countDistinct("v").cast("bigint").alias("true_distinct")
    )
    est = F.when(F.col("k_used") < k, F.col("k_used")).otherwise(
        F.expr(f"({k - 1}L * {_H_SPACE}L) div greatest(h_k, 1L)")
    )
    return sketch.join(exact, "grp").select(
        "grp",
        "k_used",
        est.cast("bigint").alias("est_distinct"),
        "true_distinct",
    )


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    threshold: int,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """EXACT heavy hitters — ``(value, n)`` for every value occurring
    ``>= threshold`` times — computed with a count-min-sketch PREFILTER
    (Cormode & Muthukrishnan 2005). The sketch's min-over-rows estimate
    NEVER undercounts, so rows whose estimate clears the threshold are
    a superset of the true heavy hitters; the exact count then runs on
    candidates only. Same architecture as ``skew.bloom_semi_join``:
    approximate structure prunes, exact operator decides, result
    provably identical to the plain ``GROUP BY ... HAVING`` (which is
    therefore the oracle twin).

    Why this matters at 100 TB: token/URL/entity frequencies are
    zipfian — the exact count's shuffle is dominated by the endless
    unique tail that can never reach the threshold. The prefilter
    drops tail occurrences BEFORE the exchange (a row-level filter on
    the scan), so the shuffle carries only heavy keys plus sketch
    false positives (bounded: P[est ≥ T | true n_v] decays as
    (N/(T·width))^depth by the CMS Markov bound).

    Mechanics: depth xxhash64-derived hash rows × width cells, built as ONE
    map-side-combining (row, cell) count aggregation; fact rows read
    their depth cells via BROADCAST left joins on (row, cell) — one
    broadcast of the ≤ depth·width-row cell table, reused across probes
    (ReuseExchange: the build subplans are identical), a missing cell
    reading as 0. Fully lazy, no driver fetch — the literal-array and
    hex-string-constant probe forms were both measured slower (per-row
    CreateArray; JVM-constant-limit codegen fallback — see
    skew.bloom_semi_join). NULL values are ignored (GROUP BY would keep
    a NULL group; a frequency sketch of "missing" is a data-quality
    metric, not a heavy hitter).
    """
    if threshold < 1:
        raise ValueError("threshold must be >= 1")
    if width < 2 or depth < 1:
        raise ValueError("width must be >= 2 and depth >= 1")
    v = F.col(value_col)
    base = df.select(v.cast("string").alias("value")).filter(
        F.col("value").isNotNull())

    def pos(j: int) -> Column:
        # sketch-internal hash: xxhash64, not the portable md5 h32 —
        # legitimate because the RESULT does not depend on the hash
        # family at all: a CMS estimate never undercounts under ANY
        # hash (cells only ever over-count), so the candidate set stays
        # a superset of the true heavy hitters and the final exact
        # HAVING filter decides. md5-in-Catalyst was ~2x this query's
        # row cost (depth hashes per row in the build pass and again in
        # the probe pass); xxhash64 is codegen-native.
        return F.pmod(F.xxhash64(F.col("value"), F.lit(j)), F.lit(width))

    cells_df = (
        base.select(F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"), pos(j).alias("p"))
            for j in range(depth)
        ])).alias("e"))
        .groupBy("e.j", "e.p")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    probe = base
    ests = []
    for j in range(depth):
        ctab = cells_df.select(
            F.col("j").alias(f"_cj{j}"), F.col("p").alias(f"_cp{j}"),
            F.col("n").alias(f"_cn{j}"))
        probe = (
            probe.withColumn(f"_cj{j}", F.lit(j))
            .withColumn(f"_cp{j}", pos(j))
            .join(F.broadcast(ctab), [f"_cj{j}", f"_cp{j}"], "left")
        )
        ests.append(F.coalesce(F.col(f"_cn{j}"), F.lit(0)))
    est = F.least(*ests) if depth > 1 else ests[0]
    return (
        probe.filter(est >= F.lit(threshold))
        .groupBy("value")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .filter(F.col("n") >= threshold)
    )


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """The MERGEABLE state behind :func:`kmv_distinct`: per group, the
    ``k`` smallest distinct h32 hashes as a sorted array —
    ``(grp, k_used, hs)``. Persist THIS (e.g. one sketch per shard /
    day / source in the catalog) and any union of groups can be
    estimated later without rescanning rows: mergeability is the
    property that makes sketches production-viable, and it holds
    exactly because "k smallest of a union" = "k smallest of the
    concatenated k-smallest lists".

    Scale shape: the (grp, hash) DISTINCT combines map-side; the
    per-group k-smallest is a window rank over distinct hashes riding
    the same partitioning.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    from pyspark.sql import Window

    hs = df.select(
        F.col(group_col).alias("grp"),
        h32(F.col(value_col).cast("string")).alias("h"),
    ).filter(F.col("h").isNotNull()).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    return (
        hs.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k_used"),
            F.sort_array(F.collect_list("h")).alias("hs"),
        )
    )


def kmv_union_estimate(sketches: DataFrame, k: int = 64) -> DataFrame:
    """Merge EVERY sketch row of :func:`kmv_sketch` into one union
    cardinality estimate — one row ``(n_groups, k_used, est_distinct)``
    — without touching the original data: explode the stored hash
    arrays, dedupe (the same value hashes identically in every group),
    re-take the k smallest, and read the estimator
    ``(k−1)·2³² div h_k`` (exact count when fewer than k survive).
    The cross-shard "distinct users this quarter" query answered from
    per-day sketch rows.

    Scale shape: the exploded input is ≤ |groups|·k rows by
    construction — sketch-sized, not data-sized.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    from pyspark.sql import Window

    n_groups = sketches.select(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"))
    uh = sketches.select(F.explode("hs").alias("h")).distinct()
    w = Window.orderBy("h")  # <= |groups|*k rows: a sketch-sized sort
    topk = (
        uh.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k_used"),
            F.max("h").cast("bigint").alias("h_k"),
        )
    )
    return topk.crossJoin(F.broadcast(n_groups)).select(
        "n_groups", "k_used",
        F.when(
            F.col("k_used") < k, F.col("k_used")
        ).otherwise(
            F.expr(f"(({k} - 1) * {_H_SPACE}) div h_k")
        ).cast("bigint").alias("est_distinct"),
    )
