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


def test_contingency_cells_hand_checked(spark):
    from uckg_spark.operators.integrity import contingency_cells

    rows = [("en", "s1")] * 3 + [("en", "s2")] * 1 + [("de", "s1")] * 2
    df = spark.createDataFrame(rows, "lang string, source string")
    got = {(r["r"], r["c"]): (r["observed"], r["r_tot"], r["c_tot"],
                              r["n_tot"], r["dev_num"], r["dev_den"])
           for r in contingency_cells(df, "lang", "source").collect()}
    # absent cell (de, s2) is emitted with observed 0
    assert set(got) == {("en", "s1"), ("en", "s2"), ("de", "s1"), ("de", "s2")}
    n = 6
    for (rr, cc), (o, rt, ct, nt, num, den) in got.items():
        assert nt == n
        assert num == (o * n - rt * ct) ** 2
        assert den == n * rt * ct
    assert got[("de", "s2")][0] == 0
    # exact chi-square check vs hand arithmetic: sum of rationals
    from fractions import Fraction
    chi2 = sum(Fraction(v[4], v[5]) for v in got.values())
    # E(en,s1)=4*5/6, E(en,s2)=4*1/6, E(de,s1)=2*5/6, E(de,s2)=2*1/6
    want = (Fraction(1, 1) * (3 - Fraction(20, 6)) ** 2 / Fraction(20, 6)
            + (1 - Fraction(4, 6)) ** 2 / Fraction(4, 6)
            + (2 - Fraction(10, 6)) ** 2 / Fraction(10, 6)
            + (0 - Fraction(2, 6)) ** 2 / Fraction(2, 6))
    assert chi2 == want
