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

from pyspark.sql import DataFrame, Window
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


def auc_exact(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """EXACT ROC-AUC as a rational (one row: ``n_pos, n_neg, auc_num,
    auc_den, auc_e6``) via the Mann-Whitney rank-sum identity — the
    eval metric for any binary gate this repo fits or thresholds
    (quality filters, dedup keep/drop, language gates), computed
    without a single float until the final display value.

    Identity: AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻) where R⁺ is the sum of
    positives' ranks, ties taking the AVERAGE rank. Average ranks are
    halves, so everything is doubled once: with ``2·avg_rank =
    2·min_rank + (tie_size − 1)``, the numerator ``auc_num =
    Σ2·avg_rank(pos) − n⁺(n⁺+1)`` over ``auc_den = 2·n⁺·n⁻`` is an
    exact integer pair; ``auc_e6 = auc_num·1e6 div auc_den`` for
    display. Ties between a positive and a negative contribute ½ —
    exactly the trapezoidal ROC convention.

    Scale shape: one global rank sort (AUC is a global property — same
    caveat as ``olap.pareto_front_2d``) expressed as two frames over a
    single window ordered by score, then a 1-row aggregate. NULL
    scores/labels are dropped. Degenerate inputs (no positives or no
    negatives) yield auc_den = 0 and NULL auc_e6 — the caller's signal
    that AUC is undefined, not a silent 0.5.
    """
    base = df.select(
        F.col(score_col).cast("bigint").alias("s"),
        F.col(label_col).cast("boolean").alias("y"),
    ).filter(F.col("s").isNotNull() & F.col("y").isNotNull())
    w_rank = Window.orderBy("s")
    w_tie = Window.partitionBy("s")
    ranked = base.select(
        "y",
        # 2·avg_rank = 2·min_rank + (ties − 1), all integers
        (F.lit(2) * F.rank().over(w_rank).cast("bigint")
         + F.count(F.lit(1)).over(w_tie).cast("bigint") - F.lit(1)
         ).alias("r2"),
    )
    agg = ranked.agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("bigint").alias("n_pos"),
        F.sum(F.when(~F.col("y"), 1).otherwise(0)).cast("bigint").alias("n_neg"),
        F.sum(F.when(F.col("y"), F.col("r2"))).cast("bigint").alias("r2_pos"),
    )
    num = F.col("r2_pos") - F.col("n_pos") * (F.col("n_pos") + 1)
    den = F.lit(2) * F.col("n_pos") * F.col("n_neg")
    pre = agg.select(
        "n_pos", "n_neg", num.alias("auc_num"), den.alias("auc_den"))
    # integer div keeps auc_e6 exact; auc_num·1e6 fits bigint up to
    # ~3e6 scored rows — beyond that read the exact num/den pair
    return pre.select(
        "*",
        F.when(F.col("auc_den") > 0,
               F.expr("(auc_num * 1000000) div auc_den"))
        .cast("bigint").alias("auc_e6"),
    )


def confusion_at_threshold(
    df: DataFrame,
    score_col: str,
    label_col: str,
    threshold: int,
) -> DataFrame:
    """One-row exact classification report at ``score >= threshold``:
    ``(tp, fp, fn, tn, prec_e6, rec_e6, f1_e6)`` — the companion to
    :func:`auc_exact` (AUC ranks the scorer; this evaluates the actual
    cut a production gate ships). All integer: precision = tp/(tp+fp),
    recall = tp/(tp+fn), F1 = 2tp/(2tp+fp+fn), each floored to e6
    micro-units by integer division. An undefined ratio (zero
    denominator: no predicted positives / no actual positives) is
    reported as **-1**, not NULL — a sentinel keeps the row NULL-free
    (cross-engine fetch paths mangle null ints) and unmistakable, where
    a silent 0 would read as a terrible-but-defined score.

    Scale shape: ONE map-side-combinable aggregate over the scan — four
    conditional counts; the ratios are column algebra on the 1-row
    result.
    """
    s = F.col(score_col).cast("bigint")
    y = F.col(label_col).cast("boolean")
    base = df.filter(s.isNotNull() & y.isNotNull())
    pred = s >= F.lit(threshold)
    agg = base.agg(
        F.sum((pred & y).cast("bigint")).alias("tp"),
        F.sum((pred & ~y).cast("bigint")).alias("fp"),
        F.sum((~pred & y).cast("bigint")).alias("fn"),
        F.sum((~pred & ~y).cast("bigint")).alias("tn"),
    ).select(
        *[F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
          for c in ("tp", "fp", "fn", "tn")])

    def ratio_e6(num_expr: str, den_expr: str):
        # bigint `div`, never float floor: a float quotient that lands
        # microscopically under an exact integer would floor differently
        # than the twin's integer division
        return F.when(
            F.expr(den_expr) > 0,
            F.expr(f"({num_expr} * 1000000) div ({den_expr})"),
        ).otherwise(F.lit(-1)).cast("bigint")

    return agg.select(
        "tp", "fp", "fn", "tn",
        ratio_e6("tp", "tp + fp").alias("prec_e6"),
        ratio_e6("tp", "tp + fn").alias("rec_e6"),
        ratio_e6("2 * tp", "2 * tp + fp + fn").alias("f1_e6"),
    )
