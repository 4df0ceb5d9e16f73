"""Exact variance-threshold outlier gating — no floats anywhere.

Curation pipelines drop documents whose length (or any numeric signal)
sits k standard deviations from their group's mean. Computing that
with doubles makes the gate engine- and order-dependent right at the
boundary; this operator keeps it EXACT by clearing denominators:

    |x - mean| > k * stddev_pop
    <=>  (n*x - S)^2 > k^2 * (n*Q - S^2)      with S = sum(x), Q = sum(x^2)

Every quantity is integer, so the comparison is decided identically in
any engine. Spark computes it in decimal(38,0) (exact 128-bit-ish
integer arithmetic; magnitudes are bounded by n^2 * max(x)^2 — the
caller owns keeping that under 38 digits, which holds for count-like
signals into the billions); the DuckDB twin uses HUGEINT. Published
columns are only bigint/boolean, so cross-engine hashes can't drift.

Scale shape: one groupBy shuffle for the per-group moments, then a
stats join back on the group key — the stats side is |groups| rows, so
AQE broadcasts it at any realistic group count; the flag itself is
whole-stage-codegen column algebra. Population variance (not sample)
on purpose: the gate is applied to the full group, not an estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_D = "decimal(38,0)"


def variance_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    k: int = 2,
) -> DataFrame:
    """Flag rows whose value is more than ``k`` population standard
    deviations from their group mean, decided in exact integer
    arithmetic. Returns ``(id, grp, v, is_outlier)`` for every row
    with a non-null value; ``k`` must be a positive integer (the
    exactness contract — fractional k would reintroduce floats)."""
    if not isinstance(k, int) or k < 1:
        raise ValueError(f"k must be a positive integer, got {k!r}")
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("bigint").alias("v"),
    ).where(F.col(value_col).isNotNull())
    stats = base.groupBy("grp").agg(
        F.count("*").cast(_D).alias("n"),
        F.sum("v").cast(_D).alias("s"),
        F.sum(F.col("v").cast(_D) * F.col("v").cast(_D)).alias("q"),
    )
    dev = F.col("n") * F.col("v").cast(_D) - F.col("s")
    return (
        base.join(stats, "grp")
        .select(
            "id",
            "grp",
            "v",
            (
                dev * dev
                > F.lit(k * k).cast(_D)
                * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
            ).alias("is_outlier"),
        )
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Robust (median/MAD) outlier gate: flag rows with
    ``|v − median| > k·MAD`` where MAD = median of ``|v − median|`` —
    the companion to :func:`variance_outliers` for HEAVY-TAILED signals
    (web doc lengths, token counts), where outliers inflate the mean
    and stddev enough to hide themselves; the median and MAD are
    breakdown-point-0.5 robust and don't move. Returns
    ``(id, grp, v, dev, mad, is_outlier)``.

    Exactness: both medians are PERCENTILE_DISC via the integer
    cross-multiply (``rank_le·2 ≥ total`` — the quantiles-family
    discipline), deviations and the gate are bigint compares. No
    1.4826 normal-consistency scaling: that constant is irrational, so
    ``k`` here is in raw MAD units (k=5 raw ≈ 3.4 sigmas on normal
    data) — documented rather than approximated. MAD = 0 (over half
    the group identical) flags every deviating row, the standard
    robust-gate behavior.

    Scale shape: two window sorts over the SAME group partitioning
    (value order, then deviation order — Spark reuses the exchange) +
    a broadcast-sized per-group stats join, then codegen compares.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("bigint").alias("v"),
    ).filter(F.col("v").isNotNull())

    def disc_median(frame: DataFrame, col: str) -> DataFrame:
        w_rank = (
            Window.partitionBy("grp").orderBy(col)
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_tot = Window.partitionBy("grp")
        cd = frame.select(
            "grp", F.col(col).alias("_x"),
            F.count(F.lit(1)).over(w_rank).cast("bigint").alias("_cle"),
            F.count(F.lit(1)).over(w_tot).cast("bigint").alias("_tot"),
        )
        return cd.groupBy("grp").agg(
            F.min(F.when(
                F.col("_cle") * 2 >= F.col("_tot"), F.col("_x")
            )).alias("med"))

    med = disc_median(base, "v")
    dev = base.join(F.broadcast(med), "grp").select(
        "id", "grp", "v", F.abs(F.col("v") - F.col("med")).alias("dev"))
    mad = disc_median(dev.select("grp", F.col("dev")), "dev") \
        .withColumnRenamed("med", "mad")
    return dev.join(F.broadcast(mad), "grp").select(
        "id", "grp", "v", "dev", F.col("mad").cast("bigint").alias("mad"),
        (F.col("dev") > F.lit(k) * F.col("mad")).alias("is_outlier"),
    )
