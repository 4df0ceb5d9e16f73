"""Skew-handling helpers (north_rule: explicit partitioning/skew handling).

The reference has no skew story (SURVEY.md §4) — at 10^12 docs hot entities
(the FIXTURES.md "hot" CVEs/vendors pattern, i.e. a CVE mentioned on 20% of
pages) would melt any single-reducer key. Two tools:

1. ``salted_agg`` — two-phase aggregation: salt the key with
   ``pmod(hash(<row-unique col>), n_salt)``, partial-aggregate on
   (key, salt), then final-aggregate on key. The partial shrinks each hot
   key's traffic by n_salt×.
2. AQE skew-join splitting is enabled session-wide (session.py) —
   ``spark.sql.adaptive.skewJoin.enabled`` splits oversized partitions of
   sort-merge joins at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, unique_col: str, n_salt: int = 32) -> DataFrame:
    return df.withColumn("_salt", F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salt)))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    unique_col: str,
    n_salt: int = 32,
) -> DataFrame:
    """Two-phase salted aggregation.

    partial_aggs aggregate within (keys, salt); final_aggs combine the
    partials per keys. The caller aliases partial outputs so final_aggs can
    reference them, e.g.::

        salted_agg(df, ["entity"],
                   [F.count("*").alias("c")],
                   [F.sum("c").alias("mentions")],
                   unique_col="url")
    """
    partial = with_salt(df, unique_col, n_salt).groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_distinct(df: DataFrame, keys: list[str], n_salt: int = 32) -> DataFrame:
    """Distinct on possibly-skewed keys. Spark's dropDuplicates already
    partial-aggregates map-side; this variant exists for callers that need
    an explicit two-phase shape (e.g. under a window that would otherwise
    see the skew)."""
    return (
        df.select(*keys)
        .withColumn("_salt", F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_salt)))
        .dropDuplicates(keys + ["_salt"])
        .drop("_salt")
        .dropDuplicates(keys)
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salt: int = 8,
    salt_src: str | None = None,
) -> DataFrame:
    """Skew-replicated equi-join — identical rows to ``fact.join(dim, key)``.

    AQE's skew-join splitter only fires on sort-merge joins and only
    splits a partition AFTER the shuffle has materialized the hot key's
    blocks; when one fact key carries a double-digit percentage of the
    table (the FIXTURES.md hot-CVE pattern), the explicit form is the
    standard fix: the fact side salts each row into one of ``n_salt``
    subkeys via a row-unique column (``salt_src``, default the key
    itself — callers should pass a finer column when the key is the hot
    one), and the dim side is replicated once per salt, so the hot
    key's rows land on ``n_salt`` reducers instead of one. Replication
    multiplies dim traffic by ``n_salt``: the technique is for dims too
    big to broadcast yet far smaller than the fact table.

    The salt never survives the join — output columns are exactly the
    plain join's. Values are join-semantics-identical because every
    fact row meets every copy of its dim row in exactly one salt.
    """
    if n_salt < 1:
        raise ValueError(f"n_salt must be >= 1: {n_salt}")
    src = salt_src or key
    f = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(src)), F.lit(n_salt)).cast("int"))
    d = dim.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>")),
    )
    return f.join(d, [key, "_salt"]).drop("_salt")


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = 1 << 18,
    n_hashes: int = 3,
) -> DataFrame:
    """Semi-join ``fact`` to ``dim`` with a bloom-filter PREFILTER: the
    shuffle-volume reducer for the case the broadcast join can't cover
    (dim too big to broadcast) and the plain shuffle join wastes on
    (at 100 TB, most fact rows match nothing — shuffling them is pure
    loss). Spark's own runtime row-group bloom pruning
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``) is the same
    idea applied by the optimizer when it can; this operator is the
    explicit, tunable form for when it doesn't fire (non-equi plans,
    pre-aggregated facts, or a dim derived mid-query).

    Result is EXACTLY ``fact LEFT SEMI JOIN dim`` — the bloom admits
    false positives only, and survivors still pass the exact semi join;
    the filter just shrinks what reaches that join's shuffle. The
    oracle twin is therefore the plain semi join.

    Mechanics (all integer-deterministic): each dim key sets
    ``n_hashes`` md5-derived positions in an ``n_bits`` bitmap built as
    32-bit words via explode + bit_or aggregation (map-side
    combinable). The word table is ≤ ``n_bits/32`` rows — bounded by a
    PARAMETER, not by data (default 32 KB of bitmap) — and fact rows
    probe it with ``n_hashes`` BROADCAST hash joins on the word index
    (identical build subplans: ReuseExchange materializes the broadcast
    once). Probing via a driver-fetched literal was measured and
    rejected twice over: an ``F.lit(list)`` array is CreateArray,
    rebuilt per row by codegen (3.7× slower at 8k words), and a 64 KB+
    hex-string literal breaches JVM constant limits and drops the whole
    stage out of codegen (6× slower again) — the broadcast join IS the
    idiomatic Spark shape, keeps the operator fully lazy (no collect),
    and a missing word reads as 0 via the left join. NULL fact keys
    fail every probe, matching semi-join semantics.

    Sizing: false-positive rate ≈ (1 − e^(−kn/m))^k; at the 256 Kbit
    default and k=3, ~1% at n≈25k dim keys. fp only costs wasted
    shuffle rows, never correctness.
    """
    if n_bits % 32 != 0:
        raise ValueError("n_bits must be a multiple of 32")
    n_words = n_bits // 32

    def positions(key: Column) -> list[Column]:
        return [
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(key.cast("string"), F.lit(f":{j}"))),
                        1, 15),
                    16, 10,
                ).cast("bigint"),
                F.lit(n_bits),
            )
            for j in range(n_hashes)
        ]

    words_df = (
        dim.select(F.explode(F.array(*positions(F.col(dim_key)))).alias("pos"))
        .filter(F.col("pos").isNotNull())
        .select(
            (F.col("pos") / 32).cast("int").alias("w"),
            # SQL shiftleft takes a column shift amount (the PySpark
            # helper only accepts a literal)
            F.expr("cast(shiftleft(1, cast(pos % 32 as int)) as int)")
            .alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
    )
    mask_of = [1 << i for i in range(32)]  # tiny CreateArray: negligible
    probe = fact
    tests = []
    for j, pos in enumerate(positions(F.col(fact_key))):
        wtab = words_df.select(
            F.col("w").alias(f"_bw{j}"), F.col("word").alias(f"_bword{j}"))
        probe = probe.withColumn(f"_bw{j}", (pos / 32).cast("int")).join(
            F.broadcast(wtab), f"_bw{j}", "left")
        mask = F.element_at(F.lit(mask_of), (pos % 32).cast("int") + F.lit(1))
        tests.append(
            F.coalesce(F.col(f"_bword{j}"), F.lit(0))
            .bitwiseAND(mask) != F.lit(0))
    keep = tests[0]
    for t in tests[1:]:
        keep = keep & t
    return probe.filter(keep).select(*fact.columns).join(
        dim.select(F.col(dim_key).alias(fact_key)).distinct(),
        fact_key, "left_semi",
    )
