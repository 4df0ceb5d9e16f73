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
