"""Hypothesis properties for the resume-3 exact operators: the
identities their oracle twins rest on, checked on adversarial inputs.
Few examples each (every example runs Spark jobs); shrinking is the
value, not volume."""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)

weighted_rows = st.lists(
    st.tuples(st.integers(min_value=-1000, max_value=1000),   # value
              st.integers(min_value=0, max_value=5)),          # weight
    min_size=1, max_size=25,
).filter(lambda rows: sum(w for _, w in rows) > 0)


class TestWeightedQuantileProperties:
    @SETTINGS
    @given(rows=weighted_rows, num_den=st.sampled_from([(1, 4), (1, 2), (3, 4), (1, 1)]))
    def test_weights_are_repetition(self, spark, rows, num_den):
        """wq(v, w) must equal the UNWEIGHTED discrete quantile of the
        multiset where each v appears w times — weights ARE repetition."""
        from uckg_spark.operators.quantiles import weighted_quantiles

        df = spark.createDataFrame(
            [("g", v, w) for v, w in rows], "g string, v long, w long")
        got = weighted_quantiles(
            df, "v", "w", "g", probs=(num_den,)).collect()[0][1]
        expanded = sorted(v for v, w in rows for _ in range(w))
        num, den = num_den
        n = len(expanded)
        want = next(v for i, v in enumerate(expanded)
                    if (i + 1) * den >= num * n)
        assert got == want, (rows, num_den, expanded)


class TestAucProperties:
    scored = st.lists(
        st.tuples(st.integers(min_value=-50, max_value=50), st.booleans()),
        min_size=2, max_size=40,
    ).filter(lambda rows: len({y for _, y in rows}) == 2)

    @SETTINGS
    @given(rows=scored)
    def test_auc_complement_symmetry(self, spark, rows):
        """AUC(score, y) + AUC(score, NOT y) must be exactly 1 (as
        rationals): swapping the classes mirrors the ROC curve."""
        from uckg_spark.operators.regression import auc_exact

        df = spark.createDataFrame(rows, "s long, y boolean")
        a = auc_exact(df, "s", "y").collect()[0]
        b = auc_exact(df.selectExpr("s", "NOT y AS y"), "s", "y").collect()[0]
        assert a["auc_den"] == b["auc_den"]
        assert a["auc_num"] + b["auc_num"] == a["auc_den"]


class TestParetoProperties:
    points = st.lists(
        st.tuples(st.integers(min_value=0, max_value=20),
                  st.integers(min_value=0, max_value=20)),
        min_size=1, max_size=30,
    )

    @SETTINGS
    @given(pts=points)
    def test_front_is_exactly_the_undominated_set(self, spark, pts):
        from uckg_spark.operators.olap import pareto_front_2d

        rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
        df = spark.createDataFrame(rows, "id long, x long, y long")
        got = {r["id"] for r in
               pareto_front_2d(df, "x", "y", "id").collect()}
        want = {
            i for i, x, y in rows
            if not any(
                bx >= x and by >= y and (bx > x or by > y)
                for j, bx, by in rows if j != i)
        }
        assert got == want, (pts,)


class TestEquiDepthProperties:
    values = st.lists(
        st.integers(min_value=-100, max_value=100), min_size=1, max_size=40)

    @SETTINGS
    @given(vals=values, n=st.sampled_from([2, 4, 8]))
    def test_mass_conservation_and_value_disjointness(self, spark, vals, n):
        """Bucket counts sum to the input size; value ranges of distinct
        buckets never overlap; equal values never split buckets."""
        from uckg_spark.operators.quantiles import equi_depth_hist

        df = spark.createDataFrame(
            [("g", v) for v in vals], "g string, v long")
        got = sorted(
            (r["bucket"], r["n"], r["lo"], r["hi"])
            for r in equi_depth_hist(df, "v", "g", n_buckets=n).collect())
        assert sum(r[1] for r in got) == len(vals)
        for (_, _, _, hi_a), (_, _, lo_b, _) in zip(got, got[1:]):
            assert hi_a < lo_b  # disjoint, ordered ranges
        # ties share a bucket: each distinct value maps to ONE bucket
        counts = Counter(vals)
        per_bucket = {b: c for b, c, _, _ in got}
        for b, c, lo, hi in got:
            assert c == sum(counts[v] for v in counts if lo <= v <= hi)
        assert set(per_bucket) <= set(range(n))


class TestRetentionProperties:
    events = st.lists(
        st.tuples(st.integers(min_value=1, max_value=8),   # user
                  st.integers(min_value=0, max_value=10)), # day
        min_size=1, max_size=40,
    )

    @SETTINGS
    @given(rows=events)
    def test_triangle_invariants(self, spark, rows):
        """k=0 cells equal cohort sizes; n_active never exceeds the
        cohort; per-cohort total active-days equal the distinct
        (user, day) count."""
        import datetime as dt

        from uckg_spark.operators.funnel import retention_cohorts

        df = spark.createDataFrame(
            [(u, dt.datetime(2024, 1, 1 + d, 12)) for u, d in rows],
            "user_id long, ts timestamp_ntz")
        got = [(r["cohort_day"], r["k"], r["n_active"], r["cohort_n"])
               for r in retention_cohorts(df, "user_id", "ts").collect()]
        by_cohort = {}
        for cd, k, n, cn in got:
            assert n <= cn
            if k == 0:
                assert n == cn
            by_cohort[cd] = by_cohort.get(cd, 0) + n
        assert sum(by_cohort.values()) == len({(u, d) for u, d in rows})


class TestTokenCooccurProperties:
    docs = st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]),
                 min_size=0, max_size=10),
        min_size=1, max_size=8,
    )

    @SETTINGS
    @given(docs=docs, w=st.sampled_from([1, 2, 4]))
    def test_pair_mass_identity(self, spark, docs, w):
        """Σ n_pair must equal the exact window-pair count
        Σ_docs Σ_i min(w, n−1−i) — no pair lost or invented."""
        from uckg_spark.operators.cooccur import token_cooccur

        df = spark.createDataFrame(
            [(i, " ".join(d)) for i, d in enumerate(docs)],
            "doc_id long, text string")
        got = token_cooccur(df, window=w).collect()
        total = sum(r["n_pair"] for r in got)
        want = sum(
            min(w, len(d) - 1 - i)
            for d in docs for i in range(max(len(d) - 1, 0)))
        assert total == want
