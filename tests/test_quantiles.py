"""quantiles_disc — cross-checked against a pure-Python PERCENTILE_DISC
reference (min value whose cume_dist reaches p), plus edge cases."""

import math
import random

import pytest

from uckg_spark.operators.quantiles import quantiles_disc


def quantile_py(vals, p):
    """Smallest value whose cumulative distribution >= p."""
    s = sorted(vals)
    # cume_dist of s[i] = (index of last tie + 1)/n; min v with cd >= p
    # is the ceil(p*n)-th order statistic
    return s[max(0, math.ceil(p * len(s)) - 1)]


def _df(spark, rows):
    return spark.createDataFrame(rows, ["grp_in", "v_in"])


class TestQuantilesDisc:
    def test_random_matches_reference(self, spark):
        rng = random.Random(11)
        rows = [(f"g{i % 3}", rng.randrange(0, 1000)) for i in range(200)]
        probs = (0.25, 0.5, 0.9, 0.99)
        got = {
            r["grp"]: (r["p25"], r["p50"], r["p90"], r["p99"])
            for r in quantiles_disc(
                _df(spark, rows), "v_in", "grp_in", probs=probs
            ).collect()
        }
        for g in ("g0", "g1", "g2"):
            vals = [v for grp, v in rows if grp == g]
            assert got[g] == tuple(quantile_py(vals, p) for p in probs), g

    def test_result_values_exist_in_data(self, spark):
        rng = random.Random(3)
        rows = [("g", rng.randrange(0, 50) * 7) for _ in range(40)]
        r = quantiles_disc(_df(spark, rows), "v_in", "grp_in").collect()[0]
        data = {v for _, v in rows}
        assert {r["p50"], r["p90"], r["p99"]} <= data

    def test_p100_is_max_and_ties_handled(self, spark):
        rows = [("g", 5), ("g", 5), ("g", 1), ("g", 9)]
        r = quantiles_disc(
            _df(spark, rows), "v_in", "grp_in", probs=(0.5, 1.0)
        ).collect()[0]
        assert (r["p50"], r["p100"]) == (5, 9)

    def test_nulls_dropped(self, spark):
        rows = [("g", None), ("g", 2), ("g", 4)]
        df = _df(spark, rows)
        r = quantiles_disc(df, "v_in", "grp_in", probs=(0.5,)).collect()[0]
        assert r["p50"] == 2

    def test_invalid_probs_raise(self, spark):
        df = _df(spark, [("g", 1)])
        with pytest.raises(ValueError):
            quantiles_disc(df, "v_in", "grp_in", probs=())
        with pytest.raises(ValueError):
            quantiles_disc(df, "v_in", "grp_in", probs=(0.0,))
        with pytest.raises(ValueError):
            quantiles_disc(df, "v_in", "grp_in", probs=(1.5,))


class TestHistogramFixed:
    def test_matches_python_floor_bucketing(self, spark):
        import random

        from uckg_spark.operators.quantiles import histogram_fixed

        rng = random.Random(23)
        rows = [(f"g{i % 3}", rng.randrange(-100, 100)) for i in range(300)]
        rows += [("g0", None)]
        df = spark.createDataFrame(rows, "grp string, v long")
        for width in (1, 7, 50):
            got = {(r["grp"], r["bucket_lo"]): r["n"]
                   for r in histogram_fixed(df, "v", "grp", width).collect()}
            want: dict = {}
            for g, v in rows:
                if v is None:
                    continue
                key = (g, (v // width) * width)
                want[key] = want.get(key, 0) + 1
            assert got == want, width

    def test_negative_boundary_exact(self, spark):
        from uckg_spark.operators.quantiles import histogram_fixed

        df = spark.createDataFrame(
            [("g", -10), ("g", -1), ("g", 0), ("g", 9), ("g", 10)],
            "grp string, v long")
        got = {r["bucket_lo"]: r["n"]
               for r in histogram_fixed(df, "v", "grp", 10).collect()}
        # -10 is ON the boundary (own bucket start); -1 floors to -10
        assert got == {-10: 2, 0: 2, 10: 1}

    def test_invalid_width_raises(self, spark):
        import pytest

        from uckg_spark.operators.quantiles import histogram_fixed

        df = spark.createDataFrame([("g", 1)], "grp string, v long")
        with pytest.raises(ValueError):
            histogram_fixed(df, "v", "grp", 0)
