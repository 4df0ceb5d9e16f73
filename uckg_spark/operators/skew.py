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
