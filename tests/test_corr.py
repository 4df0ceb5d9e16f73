"""grouped_corr (operators/integrity.py): exact moments and the
IEEE-deterministic display correlation."""

import pytest

from uckg_spark.operators.integrity import grouped_corr


def _run(spark, rows):
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    return {r["grp"]: r for r in
            grouped_corr(df, "x", "y", "grp").collect()}


def test_perfect_linear_is_exactly_one(spark):
    rows = [("g", i, 2 * i + 3) for i in range(20)]
    r = _run(spark, rows)["g"]
    # cov² == varx·vary exactly, so sqrt is exact and corr is 1.0
    assert r["corr_e6"] == 1_000_000
    assert r["cov_num"] ** 2 == r["varx_num"] * r["vary_num"]


def test_anti_linear_is_minus_one(spark):
    rows = [("g", i, -5 * i) for i in range(10)]
    assert _run(spark, rows)["g"]["corr_e6"] == -1_000_000


def test_zero_variance_degenerates_to_zero(spark):
    r = _run(spark, [("g", 7, i) for i in range(5)])["g"]
    assert r["varx_num"] == 0 and r["corr_e6"] == 0


def test_matches_numpy_on_noisy_data(spark):
    np = pytest.importorskip("numpy")
    rows = [("g", (i * 13) % 40, ((i * 13) % 40) * 3 + (i * 29) % 11 - 5)
            for i in range(100)]
    got = _run(spark, rows)["g"]["corr_e6"]
    xs = np.array([x for _, x, _ in rows], dtype=float)
    ys = np.array([y for _, _, y in rows], dtype=float)
    want = float(np.corrcoef(xs, ys)[0, 1])
    assert abs(got - int(np.floor(want * 1e6))) <= 1
