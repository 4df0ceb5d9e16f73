"""bloom_semi_join (operators/skew.py): result must EXACTLY equal the
plain left-semi join under every bitmap configuration — saturated tiny
bitmaps (all false positives), empty dims, null fact keys — and the
prefilter must actually appear in the plan."""

from uckg_spark.operators.skew import bloom_semi_join


def _dfs(spark):
    fact = spark.createDataFrame(
        [(i, i % 50 if i % 7 else None) for i in range(300)],
        "row_id long, k long")
    dim = spark.createDataFrame(
        [(i,) for i in range(0, 50, 3)], "dk long")
    return fact, dim


def _expected(spark, fact, dim):
    return {tuple(r) for r in fact.join(
        dim.selectExpr("dk as k"), "k", "left_semi").collect()}


def test_equals_plain_semi_join(spark):
    fact, dim = _dfs(spark)
    want = _expected(spark, fact, dim)
    got = {tuple(r) for r in
           bloom_semi_join(fact, dim, "k", "dk").collect()}
    assert got == want and len(want) > 0
    # null fact keys never match
    assert not any(r[1] is None for r in got)


def test_saturated_bitmap_still_exact(spark):
    # 32-bit bitmap with 17 keys x 3 hashes: essentially every probe
    # hits — the exact semi join behind the filter must still gate
    fact, dim = _dfs(spark)
    got = {tuple(r) for r in
           bloom_semi_join(fact, dim, "k", "dk", n_bits=32).collect()}
    assert got == _expected(spark, fact, dim)


def test_empty_dim_yields_empty(spark):
    fact, dim = _dfs(spark)
    assert bloom_semi_join(
        fact, dim.filter("dk < 0"), "k", "dk").count() == 0


def test_prefilter_is_in_the_plan(spark):
    fact, dim = _dfs(spark)
    plan = bloom_semi_join(fact, dim, "k", "dk")._jdf.queryExecution() \
        .executedPlan().toString()
    # the bitmap membership test (element_at over the word array) runs
    # BEFORE the exact join — if it disappears the operator degenerated
    # into a plain semi join
    assert "element_at" in plan


def test_rejects_unaligned_bits(spark):
    import pytest

    fact, dim = _dfs(spark)
    with pytest.raises(ValueError):
        bloom_semi_join(fact, dim, "k", "dk", n_bits=100)
