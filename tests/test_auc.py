"""auc_exact (operators/regression.py): the rank-sum rational must
equal brute-force pair counting (#(pos>neg) + ½·ties), including the
degenerate and all-tie edges."""

from uckg_spark.operators.regression import auc_exact


def _brute_num_den(rows):
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    num = sum(2 * (p > n) + (p == n) for p in pos for n in neg)
    return num, 2 * len(pos) * len(neg)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "s long, y boolean")
    return auc_exact(df.repartition(4), "s", "y").collect()[0]


def test_matches_pair_counting_with_ties(spark):
    rows = [((i * 7) % 23, (i * 13) % 3 == 0) for i in range(200)]
    got = _run(spark, rows)
    num, den = _brute_num_den(rows)
    assert (got["auc_num"], got["auc_den"]) == (num, den)
    assert got["auc_e6"] == num * 1_000_000 // den


def test_perfect_and_inverted_separation(spark):
    perfect = [(10 + i, True) for i in range(5)] + \
              [(i, False) for i in range(5)]
    assert _run(spark, perfect)["auc_e6"] == 1_000_000
    inverted = [(s, not y) for s, y in perfect]
    assert _run(spark, inverted)["auc_e6"] == 0


def test_all_tied_scores_give_half(spark):
    rows = [(7, i % 2 == 0) for i in range(10)]
    got = _run(spark, rows)
    assert (got["auc_num"], got["auc_den"]) == (got["auc_den"] // 2,
                                                got["auc_den"])
    assert got["auc_e6"] == 500_000


def test_degenerate_single_class_is_undefined(spark):
    got = _run(spark, [(1, True), (2, True)])
    assert got["auc_den"] == 0 and got["auc_e6"] is None
