"""cooccur_lift: exact lift values vs a driver-side reference, edge
cases (dup rows, nulls, support threshold), and plan shape."""

import itertools

import pytest

from uckg_spark.operators.cooccur import cooccur_lift


def _df(spark, rows):
    return spark.createDataFrame(rows, "basket string, item string")


def lift_py(rows, min_pair):
    baskets: dict[str, set[str]] = {}
    for b, i in rows:
        if b is None or i is None:
            continue
        baskets.setdefault(b, set()).add(i)
    n = len(baskets)
    cnt: dict[str, int] = {}
    pair: dict[tuple[str, str], int] = {}
    for items in baskets.values():
        for i in items:
            cnt[i] = cnt.get(i, 0) + 1
        for a, b in itertools.combinations(sorted(items), 2):
            pair[(a, b)] = pair.get((a, b), 0) + 1
    return {
        (a, b): (c, (c * n * 1_000_000) // (cnt[a] * cnt[b]))
        for (a, b), c in pair.items()
        if c >= min_pair
    }


class TestCooccurLift:
    def test_matches_reference_on_random_baskets(self, spark):
        import random

        rng = random.Random(11)
        rows = [
            (f"b{rng.randrange(40)}", f"i{rng.randrange(12)}")
            for _ in range(300)
        ]
        for min_pair in (1, 2, 4):
            got = {
                (r["item_a"], r["item_b"]): (r["pair_cnt"], r["lift_e6"])
                for r in cooccur_lift(
                    _df(spark, rows), "basket", "item", min_pair
                ).collect()
            }
            assert got == lift_py(rows, min_pair), min_pair

    def test_duplicate_rows_count_once(self, spark):
        rows = [("b1", "x"), ("b1", "x"), ("b1", "y"), ("b2", "x"),
                ("b2", "y")]
        got = cooccur_lift(_df(spark, rows), "basket", "item", 1).collect()
        assert len(got) == 1
        r = got[0]
        # both baskets contain both items: lift = 2*2/(2*2) = 1.0
        assert (r["item_a"], r["item_b"], r["pair_cnt"], r["lift_e6"]) == (
            "x", "y", 2, 1_000_000)

    def test_nulls_dropped(self, spark):
        rows = [("b1", "x"), ("b1", None), (None, "y"), ("b1", "y")]
        got = cooccur_lift(_df(spark, rows), "basket", "item", 1).collect()
        assert {(r["item_a"], r["item_b"]) for r in got} == {("x", "y")}

    def test_support_threshold_filters(self, spark):
        rows = [("b1", "x"), ("b1", "y"), ("b2", "x"), ("b2", "z")]
        assert (
            cooccur_lift(_df(spark, rows), "basket", "item", 2).count() == 0
        )

    def test_invalid_support_raises(self, spark):
        with pytest.raises(ValueError):
            cooccur_lift(_df(spark, [("b", "i")]), "basket", "item", 0)

    def test_plan_no_cartesian_and_broadcast_counts(self, spark):
        plan = (
            cooccur_lift(_df(spark, [("b", "i")]), "basket", "item")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        # item-count joins and the n_baskets scalar ride broadcasts
        assert plan.count("BroadcastExchange") >= 2


def test_token_cooccur_hand_checked(spark):
    from uckg_spark.operators.cooccur import token_cooccur

    df = spark.createDataFrame(
        [(1, "a b c a"), (2, "b a")], "doc_id long, text string")
    got = {(r["tok_a"], r["tok_b"]): (r["n_pair"], r["n_a"], r["n_b"])
           for r in token_cooccur(df, window=2).collect()}
    # doc1 window-2 pairs: (a,b) (a,c) (b,c) (b,a) (c,a); doc2: (b,a)
    # canonicalized: ab x3, ac x2, bc x1; marginals a=3, b=2, c=1
    assert got == {
        ("a", "b"): (3, 3, 2),
        ("a", "c"): (2, 3, 1),
        ("b", "c"): (1, 2, 1),
    }


def test_token_cooccur_window_one_is_bigrams(spark):
    from uckg_spark.operators.cooccur import token_cooccur

    df = spark.createDataFrame([(1, "x y x")], "doc_id long, text string")
    got = {(r["tok_a"], r["tok_b"]): r["n_pair"]
           for r in token_cooccur(df, window=1).collect()}
    assert got == {("x", "y"): 2}  # adjacent pairs only
