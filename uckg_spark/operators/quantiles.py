"""Exact grouped quantiles — the distribution profile a curation
pipeline runs on every numeric signal before picking gate thresholds
(quality-score floors, repetition ceilings, token-count bands: all of
this repo's curation gates are percentile choices in disguise).

``quantiles_disc`` is PERCENTILE_DISC semantics: for each probability p
the smallest actual data value whose cumulative distribution reaches p.
Discrete (no interpolation) on purpose — the result is a value that
exists in the data, so it is exact, type-preserving, and engine-portable
(`cume_dist` is the same rank/total ratio in Spark and DuckDB, computed
on identical integers, so the twin matches to the bit; interpolated
PERCENTILE_CONT would put float arithmetic order between the engines).

Reference parity: the reference eyeballs record counts per table before
sync (/root/reference/process/shared_functions.py); threshold-picking on value
distributions is the web-scale version of that profiling step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def histogram_fixed(
    df: DataFrame,
    value_col: str,
    group_col: str,
    width: int,
) -> DataFrame:
    """Per-group fixed-width histogram: ``(grp, bucket_lo, n)`` where
    ``bucket_lo = floor(v / width) * width`` (exact integer bucketing,
    floor semantics for negatives in both engines via ``div`` on the
    already-floored sign — values are cast to bigint first). The
    companion profile to ``quantiles_disc``: quantiles answer "where
    are the thresholds", the histogram shows the shape between them.

    Scale shape: bucketing is codegen column algebra; the only shuffle
    is the (grp, bucket) count agg, which combines map-side — output
    cardinality is |groups| x |occupied buckets|, independent of rows.
    """
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("bigint").alias("v"),
    ).filter(F.col("v").isNotNull())
    # floor-div for negatives: bigint `div` truncates toward zero, so
    # shift negatives down one width when they don't land on a boundary
    bucket = F.expr(
        f"CASE WHEN v >= 0 OR v % {width} = 0 THEN (v div {width}) * {width}"
        f" ELSE (v div {width}) * {width} - {width} END"
    )
    return (
        base.select("grp", bucket.alias("bucket_lo"))
        .groupBy("grp", "bucket_lo")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def quantiles_disc(
    df: DataFrame,
    value_col: str,
    group_col: str,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-group discrete quantiles: ``(grp, p50, p90, p99, ...)`` —
    one column per probability, named ``p{100*prob:g}`` (0.5 → p50).

    Exact semantics: p-quantile = min(v) over rows where
    ``cume_dist() >= p`` within the group's value order. NULL values are
    dropped first (they would sort into the window but carry no signal).

    Scale shape: ONE shuffle — the per-group window sort — then the
    min-filter aggregation rides the same partitioning (no second
    exchange). This is the exact path; at the scale where a single
    group's values do not fit a partition's sort spill budget, the
    production swap is a mergeable t-digest / KLL sketch
    (``approx_percentile`` in Spark), which is deliberately NOT this
    operator: sketch register layouts differ across engines, so the
    approximate form can never be oracle-matched (same trade as
    operators/sketches.py::kmv_distinct vs HLL).
    """
    if not probs:
        raise ValueError("probs must be non-empty")
    names = []
    for p in probs:
        if not 0 < p <= 1:
            raise ValueError(f"prob {p} outside (0, 1]")
        names.append("p" + format(p * 100, "g").replace(".", "_"))
    if len(set(names)) != len(names):
        raise ValueError(f"probs collide after naming: {names}")
    base = df.select(
        F.col(group_col).alias("grp"), F.col(value_col).alias("v")
    ).filter(F.col("v").isNotNull())
    cd = base.withColumn(
        "cd", F.cume_dist().over(Window.partitionBy("grp").orderBy("v"))
    )
    return cd.groupBy("grp").agg(
        *[
            F.min(F.when(F.col("cd") >= p, F.col("v"))).alias(name)
            for p, name in zip(probs, names)
        ]
    )


def equi_depth_hist(
    df: DataFrame,
    value_col: str,
    group_col: str,
    n_buckets: int = 8,
) -> DataFrame:
    """Per-group equi-depth histogram — the value-boundary histogram
    every optimizer keeps (equal ROW mass per bucket instead of equal
    value width): ``(grp, bucket, n, lo, hi)`` for each OCCUPIED bucket.

    Semantics (exact, integer-only — deliberately no float anywhere):
    breakpoint k (k = 1..n-1) is PERCENTILE_DISC(k/n): the smallest v
    whose inclusive rank satisfies ``rank_le(v) · n_buckets ≥ k · total``
    (cross-multiplied — the float ``cume_dist ≥ p`` compare this family
    avoids). A row lands in ``bucket = Σ_k [v > breakpoint_k]``, so ties
    always share a bucket: counts are only ≈equal under heavy ties,
    which is standard equi-depth histogram semantics (the tie mass is
    indivisible).

    Scale shape: one per-group window sort (RANGE frame for inclusive
    rank), breakpoint aggregation rides the same partitioning, and the
    breakpoint table (|groups| rows, n-1 columns) broadcasts back onto
    the scan for assignment — the corpus never shuffles a second time
    except the final (grp, bucket) count, which is map-side combinable
    with output cardinality |groups| × n_buckets.
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("bigint").alias("v"),
    ).filter(F.col("v").isNotNull())
    w_rank = (
        Window.partitionBy("grp").orderBy("v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("grp")
    cd = base.select(
        "grp", "v",
        F.count(F.lit(1)).over(w_rank).cast("bigint").alias("cle"),
        F.count(F.lit(1)).over(w_tot).cast("bigint").alias("total"),
    )
    breaks = cd.groupBy("grp").agg(*[
        F.min(F.when(
            F.col("cle") * n_buckets >= F.lit(k) * F.col("total"), F.col("v")
        )).alias(f"_b{k}")
        for k in range(1, n_buckets)
    ])
    bucket = sum(
        (F.col("v") > F.col(f"_b{k}")).cast("int")
        for k in range(1, n_buckets)
    ).cast("bigint")
    return (
        base.join(F.broadcast(breaks), "grp")
        .select("grp", "v", bucket.alias("bucket"))
        .groupBy("grp", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
    )


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_col: str,
    probs: tuple[tuple[int, int], ...] = ((1, 2), (9, 10)),
) -> DataFrame:
    """Per-group WEIGHTED discrete quantiles — what "median document
    length weighted by token count" or "p90 price weighted by quantity"
    actually mean: each row counts ``weight`` times. ``probs`` are
    exact rationals (num, den), and the whole computation is integer
    cross-multiplication (``cum_w·den ≥ num·tot_w``) — the same
    no-float-compare discipline as ``equi_depth_hist``, so the
    cross-engine twin is bit-exact. Output columns ``wp{100·num/den}``
    (1/2 → wp50).

    Semantics: quantile = min v whose INCLUSIVE cumulative weight
    (RANGE frame: ties collapse to the tie-group total, exactly like
    cume_dist) reaches the probability of the group's total weight.
    Zero-weight rows are inert (they add nothing to cum_w but can still
    be selected if they sit exactly at a boundary another row reached —
    matching PERCENTILE_DISC-with-repeats semantics). Negative weights
    are rejected: a signed "weight" makes cum_w non-monotone and the
    quantile meaningless.

    Scale shape: identical to ``quantiles_disc`` — one per-group window
    sort, aggregation riding the same partitioning.
    """
    if not probs:
        raise ValueError("probs must be non-empty")
    names = []
    for num, den in probs:
        if not (0 < num <= den):
            raise ValueError(f"prob {num}/{den} outside (0, 1]")
        names.append("wp" + format(100 * num / den, "g").replace(".", "_"))
    if len(set(names)) != len(names):
        raise ValueError(f"probs collide after naming: {names}")
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("bigint").alias("v"),
        F.col(weight_col).cast("bigint").alias("w"),
    ).filter(F.col("v").isNotNull() & F.col("w").isNotNull())
    w_rank = (
        Window.partitionBy("grp").orderBy("v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cd = base.select(
        "grp", "v",
        # fail fast inside the sum so a bad weight can't silently skew
        F.sum(F.when(F.col("w") < 0, F.raise_error(
            F.concat(F.lit("negative weight for value "),
                     F.col("v").cast("string"))
        ).cast("bigint")).otherwise(F.col("w"))).over(w_rank)
        .cast("bigint").alias("cw"),
        F.sum("w").over(Window.partitionBy("grp")).cast("bigint").alias("tw"),
    )
    return cd.groupBy("grp").agg(*[
        F.min(F.when(
            F.col("cw") * F.lit(den) >= F.lit(num) * F.col("tw"), F.col("v")
        )).alias(name)
        for (num, den), name in zip(probs, names)
    ])


def rank_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Percentile-rank feature scaling per group, integer-exact:
    ``pct_e6 = (rank(v) − 1)·1e6 div (n − 1)`` — 0 for the minimum,
    1e6 for the maximum, ties share the MIN rank (so equal inputs get
    equal scores), single-row groups score 0. The scale-free transform
    a multi-signal quality gate applies before combining features that
    live on incomparable scales (chars + stopword ppm + repetition —
    ranks compose, raw units don't). NULL values are dropped (they
    carry no rank). Integer division everywhere, so the cross-engine
    twin is bit-exact.

    Scale shape: one per-group window sort; rank and the group count
    ride the same partitioning (no second exchange).
    """
    base = df.filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(group_col).orderBy(value_col)
    return (
        base.withColumn("_rk", F.rank().over(w).cast("bigint"))
        .withColumn(
            "_n",
            F.count(F.lit(1)).over(Window.partitionBy(group_col))
            .cast("bigint"),
        )
        .withColumn(
            "pct_e6",
            F.when(F.col("_n") > 1,
                   F.expr("((_rk - 1) * 1000000) div (_n - 1)"))
            .otherwise(F.lit(0)).cast("bigint"),
        )
        .drop("_rk", "_n")
    )
