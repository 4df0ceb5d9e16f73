"""Hierarchical OLAP aggregation (ROLLUP) — one pass, all levels.

A KG/corpus dashboard wants counts at every level of a dimension
hierarchy (per flag+status, per flag subtotal, grand total). The naive
route is one groupBy per level unioned together — L+1 scans and L+1
shuffles. ``rollup_metrics`` is the Spark-native form: a single
``df.rollup(...)`` whose partial aggregation is shared across levels
(Catalyst plans Expand + one hash aggregate pair), so the input is
read once no matter how many levels ride out. The reference computes
only flat per-table record counts (/root/reference/process/shared_functions.py);
at web scale the hierarchy is how humans read 100 TB of counts.

Engine-neutral conventions:
- level id is built from per-column ``grouping()`` bits explicitly
  (``grouping(c1)*2^(L-1) + ...``) rather than engine ``grouping_id``
  functions, so the bit order is pinned by construction in both Spark
  and the DuckDB twin.
- subtotal rows surface as literal 'ALL' via coalesce (group columns
  are required non-null for this op), keeping the output join-friendly
  and NULL-free.
- metric exactness: integer-valued doubles sum exactly in IEEE float
  up to 2^53, and 2-decimal money is rounded to integer cents PER ROW
  before the sum, so every published column is a bit-exact BIGINT.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rollup_metrics(
    df: DataFrame,
    group_cols: list[str],
    metrics: list[Column],
) -> DataFrame:
    """ROLLUP over ``group_cols`` computing ``metrics`` (pre-aliased
    aggregate Columns). Returns one row per rollup level:
    ``(*group_cols coalesced to 'ALL', lvl, *metrics)`` where ``lvl``
    is the bitmask of aggregated-away columns (leftmost column = most
    significant bit; 0 = finest level, 2^L - 1 = grand total).
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    n = len(group_cols)
    lvl = sum(
        (F.grouping(c).cast("bigint") * F.lit(2 ** (n - 1 - i)))
        for i, c in enumerate(group_cols)
    )
    agged = df.rollup(*group_cols).agg(lvl.alias("lvl"), *metrics)
    return agged.select(
        *[F.coalesce(F.col(c), F.lit("ALL")).alias(c) for c in group_cols],
        "lvl",
        *agged.columns[n + 1 :],
    )


def pivot_counts(
    df: DataFrame,
    row_col: str,
    pivot_col: str,
    values: list[str],
) -> DataFrame:
    """Cross-tab: one row per ``row_col`` value, one count column per
    entry of ``values`` (named after it), zero-filled. ``values`` is
    REQUIRED and fixed: passing it keeps the plan single-pass (Spark
    otherwise runs a distinct-scan first to discover columns) and makes
    the output schema deterministic — at web scale the pivot domain is
    a dimension you know, not something to discover per query.

    Scale shape: exactly a groupBy(row_col) hash aggregate whose
    per-value counts are conditional sums folded map-side — one
    shuffle of |rows| × (|values|+1) cells, no explode, no join.
    """
    if not values:
        raise ValueError("values must be non-empty")
    if len(set(values)) != len(values):
        raise ValueError(f"duplicate pivot values: {values}")
    return (
        df.select(F.col(row_col).alias("row"), F.col(pivot_col).alias("p"))
        .groupBy("row")
        .agg(
            *[
                F.count(F.when(F.col("p") == v, 1)).cast("bigint").alias(v)
                for v in values
            ]
        )
    )


def pareto_front_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
) -> DataFrame:
    """Maximal (Pareto) front under (maximize x, maximize y): the rows
    no other row WEAKLY dominates (x' ≥ x and y' ≥ y, strict in at
    least one) — multi-criteria curation's "keep the frontier" filter
    (longest docs at each quality level, best price at each size, ...).
    Duplicate (x, y) pairs do not dominate each other: all stay on the
    front. Returns ``(id, x, y)``.

    The naive form is the O(n²) NOT-EXISTS self-join — which is exactly
    what the oracle twin runs, making the check structural: two
    different algorithms must produce the identical set. This form is
    O(n log n): after one sort by x,

      dominated  ⇔  max{y' : x' > x} ≥ y   (someone strictly right is
                                            at least as high)
                  ∨ max{y' : x' = x} > y   (someone at the same x is
                                            strictly higher)

    both maxima are window frames over that single sort — a RANGE
    [x+1, ∞) frame and an x-partition — so the whole operator is one
    window shuffle, no join at all.

    Scale note: the one unpartitioned window (a global sort — inherent,
    the front is a global property) runs over the PER-X maxima only:
    dominance depends on nothing else, so the full table never sorts —
    it pre-aggregates to one row per distinct x (map-side combinable)
    and joins the two dominance marks back by x.
    """
    base = df.select(
        F.col(id_col),
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    # both dominance maxima depend ONLY on the per-x maximum of y, so
    # aggregate to one candidate row per x first (map-side combinable)
    # and run the global-sort window over |distinct x| rows instead of
    # the full table (optimization round 6 — the round-5 form sorted
    # every row through one unpartitioned window task). The per-x table
    # then broadcasts back onto the rows; the filter is unchanged:
    #   dominated ⇔ max{y' : x' > x} ≥ y  ∨  max{y' : x' = x} > y
    per_x = df.select(
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull()).groupBy(
        "x"
    ).agg(F.max("y").alias("_meq"))
    w_gt = Window.orderBy("x").rangeBetween(1, Window.unboundedFollowing)
    marks = per_x.withColumn("_mgt", F.max("_meq").over(w_gt))
    return (
        base.join(marks, "x")  # AQE broadcasts the per-x table when small
        .filter(
            (F.col("_mgt").isNull() | (F.col("_mgt") < F.col("y")))
            & (F.col("_meq") == F.col("y"))
        )
        .select(id_col, "x", "y")
    )
