"""Closed-form OLS fit (operators/regression.py): exact recovery on
noiseless integer designs, numpy agreement on noisy ones, and
partitioning-independence of the fixed-point coefficients (the bigint
sufficient statistics are commutative sums, so the fit must not depend
on how the corpus is sharded)."""

import pytest

from uckg_spark.operators.regression import (
    fit_and_score_u,
    fit_linear_e6,
    linear_score_u,
)


def _mk(spark, rows, parts=4):
    return spark.createDataFrame(
        rows, "doc_id string, x1 bigint, x2 bigint, y bigint"
    ).repartition(parts)


def _synth(n=200, b0=7, b1=3, b2=-2, noise=None):
    """Deterministic integer design; optional deterministic 'noise' term
    keeps y integral (so DuckDB/Spark sufficient stats stay exact)."""
    rows = []
    for i in range(n):
        x1 = (i * 37) % 101
        x2 = (i * 53) % 89
        eps = ((i * 29) % 7 - 3) if noise else 0
        rows.append((f"d{i:04d}", x1, x2, b0 + b1 * x1 + b2 * x2 + eps))
    return rows


def test_fit_recovers_exact_linear_relation(spark):
    df = _mk(spark, _synth())
    got = fit_linear_e6(df, "x1", "x2", "y").collect()[0]
    # zero-residual design: the Cramer solve is exact in float64 for
    # these magnitudes, so the e6 fixed-pointing is exact too
    assert (got["b0_e6"], got["b1_e6"], got["b2_e6"]) == (
        7_000_000, 3_000_000, -2_000_000)
    assert got["n"] == 200


def test_fit_matches_numpy_normal_equations(spark):
    np = pytest.importorskip("numpy")
    rows = _synth(noise=True)
    df = _mk(spark, rows)
    got = fit_linear_e6(df, "x1", "x2", "y").collect()[0]
    X = np.array([[1.0, r[1], r[2]] for r in rows])
    y = np.array([float(r[3]) for r in rows])
    beta = np.linalg.lstsq(X, y, rcond=None)[0]
    # different solve trees (SVD vs Cramer) — agree to well under 1e-6
    # relative on a well-conditioned design; allow 1 ulp of e6 rounding
    for k, b in zip(("b0_e6", "b1_e6", "b2_e6"), beta):
        assert abs(got[k] - int(np.floor(b * 1e6))) <= 1, (k, got[k], b)


def test_fit_is_partitioning_independent(spark):
    rows = _synth(noise=True)
    a = fit_linear_e6(_mk(spark, rows, parts=1), "x1", "x2", "y").collect()
    b = fit_linear_e6(_mk(spark, rows, parts=7), "x1", "x2", "y").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_score_and_residual_are_exact_bigints(spark):
    rows = _synth()  # noiseless: every fitted score equals y exactly
    df = _mk(spark, rows)
    out = {r["doc_id"]: r for r in
           fit_and_score_u(df, "x1", "x2", "y", "doc_id").collect()}
    assert len(out) == len(rows)
    for doc_id, _, _, y in rows:
        assert out[doc_id]["score_u"] == y * 1_000_000
        assert out[doc_id]["resid_u"] == 0


def test_score_plan_is_scan_plus_broadcast(spark):
    from uckg_spark.plans.doctor import assert_scalable

    df = _mk(spark, _synth())
    scored = linear_score_u(
        df, fit_linear_e6(df, "x1", "x2", "y"), "x1", "x2", "doc_id")
    # the 1-row coefficient attach is the sanctioned scalar-attach BNLJ
    assert_scalable(scored, allow_bnlj=1)
