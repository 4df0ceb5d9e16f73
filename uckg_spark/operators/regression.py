"""Distributed closed-form linear regression — the one-pass
normal-equations trick, for calibrating cheap document-quality scorers
over the whole corpus without an ML runtime.

Reference parity note: the reference pipeline has no model fitting; this
is part of the training-data-pipeline surface the graft brief adds
(quality scoring at corpus scale). The design is the textbook
sufficient-statistics decomposition:

- PASS 1 (the only full shuffle-free scan): ONE hash aggregate computes
  the 9 sufficient statistics (n, Σx1, Σx2, Σy, Σx1², Σx2², Σx1x2,
  Σx1y, Σx2y) with map-side partial aggregation — at 100 TB this is a
  single all-to-one combine of 9 numbers per partition, the cheapest
  possible reduction.
- SOLVE: 2-feature ordinary least squares in closed form (Cramer's rule
  on the centered 2×2 system), expressed as column algebra ON the
  1-row aggregate — no driver collect, no iteration.
- PASS 2: scores ride a broadcast nested-loop attach of the 1-row
  coefficient frame (the plan doctor's sanctioned scalar-attach BNLJ).

Determinism contract (what makes the DuckDB twin hash-exact): inputs
are INTEGER features, so every sufficient statistic is an exact bigint;
the solve converts those bigints to float64 and performs the SAME
operation tree in both engines — IEEE 754 ops are deterministic given
identical operands and order — and the coefficients are then
fixed-pointed with floor(b·1e6), after which scoring is pure bigint
arithmetic. Caveat at extreme scale: n·Σxy can exceed 2^63 on ~10^9+
rows of large-magnitude features; rescale y (the coefficients rescale
linearly) or pre-aggregate per shard before fitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_linear_e6(
    df: DataFrame,
    x1_col: str,
    x2_col: str,
    y_col: str,
) -> DataFrame:
    """OLS fit of ``y ~ b0 + b1·x1 + b2·x2`` over integer columns.

    Returns a ONE-ROW DataFrame ``(n, b0_e6, b1_e6, b2_e6)`` with the
    coefficients in exact micro-units (``floor(b·1e6)`` bigints).
    Degenerate designs (det = 0: a constant or collinear feature) yield
    non-finite doubles and are the caller's contract violation — fit on
    features with variance.
    """
    # widen BEFORE multiplying: int32 feature products overflow under
    # ANSI mode long before the bigint sufficient statistics do
    x1 = F.col(x1_col).cast("bigint")
    x2 = F.col(x2_col).cast("bigint")
    y = F.col(y_col).cast("bigint")
    s = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x1).cast("bigint").alias("sx1"),
        F.sum(x2).cast("bigint").alias("sx2"),
        F.sum(y).cast("bigint").alias("sy"),
        F.sum(x1 * x1).cast("bigint").alias("sx1x1"),
        F.sum(x2 * x2).cast("bigint").alias("sx2x2"),
        F.sum(x1 * x2).cast("bigint").alias("sx1x2"),
        F.sum(x1 * y).cast("bigint").alias("sx1y"),
        F.sum(x2 * y).cast("bigint").alias("sx2y"),
    )
    # centered 2x2 system, n²-scaled so every term is an exact bigint
    # before the float64 conversion (scale cancels in the solve)
    c = s.select(
        "n", "sx1", "sx2", "sy",
        (F.col("n") * F.col("sx1x1") - F.col("sx1") * F.col("sx1"))
        .cast("double").alias("s11"),
        (F.col("n") * F.col("sx2x2") - F.col("sx2") * F.col("sx2"))
        .cast("double").alias("s22"),
        (F.col("n") * F.col("sx1x2") - F.col("sx1") * F.col("sx2"))
        .cast("double").alias("s12"),
        (F.col("n") * F.col("sx1y") - F.col("sx1") * F.col("sy"))
        .cast("double").alias("s1y"),
        (F.col("n") * F.col("sx2y") - F.col("sx2") * F.col("sy"))
        .cast("double").alias("s2y"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    b1 = (F.col("s1y") * F.col("s22") - F.col("s2y") * F.col("s12")) / det
    b2 = (F.col("s11") * F.col("s2y") - F.col("s12") * F.col("s1y")) / det
    b0 = (
        (F.col("sy").cast("double") - b1 * F.col("sx1").cast("double"))
        - b2 * F.col("sx2").cast("double")
    ) / F.col("n").cast("double")
    return c.select(
        "n",
        F.floor(b0 * F.lit(1000000.0)).cast("bigint").alias("b0_e6"),
        F.floor(b1 * F.lit(1000000.0)).cast("bigint").alias("b1_e6"),
        F.floor(b2 * F.lit(1000000.0)).cast("bigint").alias("b2_e6"),
    )


def linear_score_u(
    df: DataFrame,
    coef: DataFrame,
    x1_col: str,
    x2_col: str,
    id_col: str,
) -> DataFrame:
    """Apply a :func:`fit_linear_e6` coefficient row to every input row:
    ``score_u = b0_e6 + b1_e6·x1 + b2_e6·x2`` — the fitted value in
    exact micro-y bigints. The coefficient frame attaches via an
    explicit broadcast (1 row), so pass 2 stays a scan."""
    return df.crossJoin(
        F.broadcast(coef.select("b0_e6", "b1_e6", "b2_e6"))
    ).select(
        F.col(id_col),
        (
            F.col("b0_e6")
            + F.col("b1_e6") * F.col(x1_col)
            + F.col("b2_e6") * F.col(x2_col)
        ).cast("bigint").alias("score_u"),
    )


def fit_and_score_u(
    df: DataFrame,
    x1_col: str,
    x2_col: str,
    y_col: str,
    id_col: str,
) -> DataFrame:
    """Fit + apply over the same frame; adds the micro-unit residual
    ``resid_u = y·1e6 − score_u`` (exact bigint — the quantity a
    quality-filter threshold or outlier cut runs on)."""
    scored = linear_score_u(
        df, fit_linear_e6(df, x1_col, x2_col, y_col), x1_col, x2_col, id_col
    )
    y_u = df.select(
        F.col(id_col), (F.col(y_col) * F.lit(1000000)).cast("bigint").alias("_yu")
    )
    return scored.join(y_u, id_col).select(
        id_col, "score_u", (F.col("_yu") - F.col("score_u")).alias("resid_u")
    )
