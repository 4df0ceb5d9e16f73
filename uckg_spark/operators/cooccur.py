"""Co-occurrence lift — integer-exact PMI-style edge weighting.

KG construction does not stop at extracting entities; it has to decide
which co-mentioned pairs deserve a `relatedTo` edge. The standard
signal is lift (equivalently exp(PMI)): how much more often two items
share a container (document, order, page) than independence predicts.
The reference hard-codes its relations from curated feeds
(/root/reference/process/shared_functions.py:82 (call_mapper_update) emits only dictionary-defined
predicates); at web scale the candidate edges come from co-occurrence
statistics exactly like this, thresholded before linking.

Exactness convention: lift is a ratio of counts, so instead of a float
we publish ``lift_e6 = (pair_cnt * n_baskets * 1_000_000) div
(cnt_a * cnt_b)`` — pure BIGINT arithmetic, bit-identical in Spark and
DuckDB (same trick as kg_pagerank / quality_e6). Overflow audit:
``pair_cnt <= n_baskets``, so the numerator is bounded by
``n_baskets^2 * 1e6`` — safe in int64 up to ~3e6 baskets; beyond that
the production swap is one `.cast("decimal(38,0)")` on the numerator
(DuckDB side is already HUGEINT-exact), noted rather than defaulted
because bigint keeps whole-stage codegen primitive.

Scale shape: one distinct() shuffle on (basket, item), one self-join
shuffled on basket (fan-out bounded by the largest basket, C(k,2) per
basket — skew is a data property; AQE skew-join splits hot baskets),
one groupBy on the pair, then two joins against the item-count table.
The item table is dictionary-bounded (|items| << |rows|) so both
count joins are broadcast by hint. No collect, no cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccur_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
) -> DataFrame:
    """Pairwise co-occurrence lift over distinct (basket, item) rows.

    Returns ``(item_a, item_b, pair_cnt, lift_e6)`` with
    ``item_a < item_b``, keeping pairs seen in at least
    ``min_pair_count`` baskets (support threshold — at web scale the
    count-1 tail is quadratic noise and must be cut before the join
    output is materialized, which is why the filter sits ON the
    pair aggregation, not after a later join).
    """
    if min_pair_count < 1:
        raise ValueError("min_pair_count must be >= 1")
    b = (
        df.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .where(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .distinct()
    )
    item_counts = b.groupBy("item").agg(F.count("*").alias("cnt"))
    total = b.select(F.count_distinct("basket").alias("n_baskets"))
    # per-basket item-set combinations instead of the basket-keyed
    # self-join (guide §2.4): one groupBy(basket) shuffle whose sorted
    # item list explodes into its C(g, 2) ordered pairs — the same
    # (item_a < item_b) multiset the join produced. The C(g, 2) fan-out
    # is inherent to the operator either way; the array materialization
    # is bounded by the basket size (orders hold a handful of items —
    # a pathological mega-basket should be capped upstream in either
    # formulation).
    # (two chained codegen generators, not flatten(transform(...)) —
    # same C(g, 2) combination multiset, see graphalgs.link_prediction)
    pairs = (
        b.groupBy("basket")
        .agg(F.sort_array(F.collect_list("item")).alias("its"))
        .select("its", F.posexplode("its").alias("i", "item_a"))
        .select(
            "item_a",
            F.explode(F.slice("its", F.col("i") + 2, F.size("its")))
            .alias("item_b"),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("pair_cnt"))
        .where(F.col("pair_cnt") >= min_pair_count)
    )
    return (
        pairs.join(
            F.broadcast(item_counts.withColumnsRenamed(
                {"item": "item_a", "cnt": "cnt_a"})),
            "item_a",
        )
        .join(
            F.broadcast(item_counts.withColumnsRenamed(
                {"item": "item_b", "cnt": "cnt_b"})),
            "item_b",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "item_a",
            "item_b",
            "pair_cnt",
            F.expr(
                "(pair_cnt * n_baskets * 1000000) div (cnt_a * cnt_b)"
            ).alias("lift_e6"),
        )
    )


def token_cooccur(
    docs: DataFrame,
    window: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window token co-occurrence counts — the raw matrix every
    count-based embedding (GloVe/PPMI-SVD) trains on, and the
    distributional-similarity signal ("which tokens share contexts")
    that complements :func:`cooccur_lift`'s container-level statistic.
    For each document, every ordered position pair within ``window``
    contributes one observation to its canonicalized (min, max) token
    pair; returns ``(tok_a, tok_b, n_pair, n_a, n_b)`` with the
    marginal token occurrence counts riding along so consumers form
    PMI/lift as exact rationals.

    Scale shape: pair generation is ROW-LOCAL array algebra (two
    chained codegen generators — position posexplode, then explode of
    the ≤``window`` following tokens; no join, no shuffle); the only
    shuffles are the (a, b) pair count and the token-count aggregation,
    both map-side combinable, plus two broadcast joins against the
    vocabulary-bounded marginal table.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    from .dedup import tokens

    t = F.col("_t")
    n = F.size(t)
    base = docs.select(tokens(F.col(text_col)).alias("_t")).filter(n >= 2)
    # two chained generators, not flatten(transform(sequence...)) —
    # higher-order functions are interpreted; posexplode/slice are
    # codegen-native. Position i (0-based) pairs with the ≤window
    # following tokens; the (min, max) canonicalization is unchanged,
    # so the emitted pair multiset is identical.
    pairs = (
        base.select("_t", F.posexplode("_t").alias("i", "_x"))
        .select(
            "_x",
            F.explode(F.slice(t, F.col("i") + 2, window)).alias("_y"),
        )
        .groupBy(
            F.least("_x", "_y").alias("tok_a"),
            F.greatest("_x", "_y").alias("tok_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
    )
    counts = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    ca = counts.select(F.col("tok").alias("tok_a"), F.col("n").alias("n_a"))
    cb = counts.select(F.col("tok").alias("tok_b"), F.col("n").alias("n_b"))
    return pairs.join(F.broadcast(ca), "tok_a").join(F.broadcast(cb), "tok_b")
