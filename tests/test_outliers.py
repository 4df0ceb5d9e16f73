"""variance_outliers: exact boundary semantics vs a Fraction-based
reference, constant groups, nulls, and plan shape."""

from fractions import Fraction

import pytest

from uckg_spark.operators.outliers import variance_outliers


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, v long")


def outliers_py(rows, k):
    groups: dict[str, list[int]] = {}
    for _, g, v in rows:
        if v is not None:
            groups.setdefault(g, []).append(v)
    out = {}
    for i, g, v in rows:
        if v is None:
            continue
        vals = groups[g]
        n = len(vals)
        mean = Fraction(sum(vals), n)
        var = sum((Fraction(x) - mean) ** 2 for x in vals) / n
        out[(i, g)] = (Fraction(v) - mean) ** 2 > k * k * var
    return out


class TestVarianceOutliers:
    def test_matches_fraction_reference(self, spark):
        import random

        rng = random.Random(3)
        rows = [
            (i, f"g{rng.randrange(4)}", rng.randrange(100) ** 2)
            for i in range(200)
        ]
        for k in (1, 2, 3):
            got = {
                (r["id"], r["grp"]): r["is_outlier"]
                for r in variance_outliers(
                    _df(spark, rows), "v", "grp", "id", k
                ).collect()
            }
            assert got == outliers_py(rows, k), k

    def test_exact_boundary_is_not_outlier(self, spark):
        # {0, 0, 3, 3}: mean 1.5, var 2.25, sd 1.5 — every point sits at
        # EXACTLY 1 sd, and the test is strict >, so k=1 flags nothing
        rows = [(1, "g", 0), (2, "g", 0), (3, "g", 3), (4, "g", 3)]
        got = variance_outliers(_df(spark, rows), "v", "grp", "id", 1)
        assert [r["is_outlier"] for r in got.collect()] == [False] * 4

    def test_constant_group_has_no_outliers(self, spark):
        rows = [(i, "g", 7) for i in range(5)]
        got = variance_outliers(_df(spark, rows), "v", "grp", "id", 2)
        assert [r["is_outlier"] for r in got.collect()] == [False] * 5

    def test_null_values_dropped(self, spark):
        rows = [(1, "g", 10), (2, "g", None), (3, "g", 10)]
        got = variance_outliers(_df(spark, rows), "v", "grp", "id", 2)
        assert {r["id"] for r in got.collect()} == {1, 3}

    def test_fractional_or_zero_k_raises(self, spark):
        df = _df(spark, [(1, "g", 1)])
        with pytest.raises(ValueError):
            variance_outliers(df, "v", "grp", "id", k=0)
        with pytest.raises(ValueError):
            variance_outliers(df, "v", "grp", "id", k=2.5)

    def test_plan_single_groupby_no_cartesian(self, spark):
        plan = (
            variance_outliers(_df(spark, [(1, "g", 1)]), "v", "grp", "id")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
