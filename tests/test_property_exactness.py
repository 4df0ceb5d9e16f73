"""Hypothesis property tests for the exact-arithmetic operators: the
claims the DuckDB twins rest on must hold for ADVERSARIAL inputs, not
just the fixture tables. Few examples per property (each runs Spark
jobs); hypothesis's shrinking is the value, not the volume."""

from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)

grouped_ints = st.lists(
    st.tuples(st.sampled_from(["g1", "g2"]),
              st.integers(min_value=-10**9, max_value=10**9)),
    min_size=1, max_size=40,
)


class TestQuantileProperties:
    @SETTINGS
    @given(rows=grouped_ints, p=st.sampled_from([0.25, 0.5, 0.9, 1.0]))
    def test_disc_quantile_is_min_value_reaching_p(self, spark, rows, p):
        from uckg_spark.operators.quantiles import quantiles_disc

        df = spark.createDataFrame(rows, "grp string, v long")
        got = {r["grp"]: r[1]  # col 1 = the single quantile
               for r in quantiles_disc(df, "v", "grp", (p,)).collect()}
        for g in {g for g, _ in rows}:
            vals = sorted(v for gg, v in rows if gg == g)
            # PERCENTILE_DISC: smallest v whose cume_dist >= p.
            # Fraction(str(p)), not Fraction(p): Fraction(0.9) embeds the
            # binary float (8106479329266893/9007199254740992 > 9/10) and
            # demands the wrong value exactly on cume_dist == p boundaries.
            want = next(v for i, v in enumerate(vals)
                        if Fraction(i + 1, len(vals)) >= Fraction(str(p)))
            assert got[g] == want, (g, vals, p)


class TestOutlierProperties:
    @SETTINGS
    @given(rows=grouped_ints,
           shift=st.integers(min_value=-10**6, max_value=10**6),
           scale=st.integers(min_value=1, max_value=1000))
    def test_flags_invariant_under_affine_map(self, spark, rows, shift,
                                              scale):
        from uckg_spark.operators.outliers import variance_outliers

        base = [(i, g, v) for i, (g, v) in enumerate(rows)]
        mapped = [(i, g, v * scale + shift) for i, g, v in base]
        df_a = spark.createDataFrame(base, "id long, grp string, v long")
        df_b = spark.createDataFrame(mapped, "id long, grp string, v long")
        fa = {r["id"]: r["is_outlier"] for r in variance_outliers(
            df_a, "v", "grp", "id", 2).collect()}
        fb = {r["id"]: r["is_outlier"] for r in variance_outliers(
            df_b, "v", "grp", "id", 2).collect()}
        # |x-mean| vs k*sd is affine-invariant (positive scale): the
        # exact integer form must agree everywhere, including boundaries
        assert fa == fb


class TestZorderProperties:
    @SETTINGS
    @given(vals=st.lists(
        st.tuples(st.integers(min_value=0, max_value=(1 << 16) - 1),
                  st.integers(min_value=0, max_value=(1 << 16) - 1)),
        min_size=1, max_size=50))
    def test_interleave_is_invertible(self, spark, vals):
        from uckg_spark.functions.layout import zorder_value

        df = spark.createDataFrame(vals, "x long, y long")
        rows = df.select("x", "y",
                         zorder_value(["x", "y"]).alias("z")).collect()
        for r in rows:
            x = sum(((r["z"] >> (2 * b)) & 1) << b for b in range(16))
            y = sum(((r["z"] >> (2 * b + 1)) & 1) << b for b in range(16))
            assert (x, y) == (r["x"], r["y"])


class TestHistogramProperties:
    @SETTINGS
    @given(rows=grouped_ints, width=st.sampled_from([1, 7, 1000]))
    def test_counts_partition_group_and_buckets_contain(self, spark, rows,
                                                        width):
        from uckg_spark.operators.quantiles import histogram_fixed

        df = spark.createDataFrame(rows, "grp string, v long")
        got = histogram_fixed(df, "v", "grp", width).collect()
        by_grp: dict = {}
        for r in got:
            by_grp[r["grp"]] = by_grp.get(r["grp"], 0) + r["n"]
            assert r["bucket_lo"] % width == 0
        want = {}
        for g, v in rows:
            want[g] = want.get(g, 0) + 1
            lo = (v // width) * width
            assert lo <= v < lo + width
        assert by_grp == want
