"""source_overlap (operators/corpus.py): hand-computed shingle-set
Jaccard rationals; disjoint pairs produce no row (inner semantics)."""

from uckg_spark.operators.corpus import source_overlap


def _run(spark, rows):
    df = spark.createDataFrame(rows, "source string, text string")
    return {(r["src_a"], r["src_b"]): (r["inter"], r["uni"])
            for r in source_overlap(df).collect()}


def test_hand_computed_overlap(spark):
    got = _run(spark, [
        ("s1", "a b c d"),        # shingles {abc, bcd}
        ("s2", "a b c e"),        # shingles {abc, bce}
        ("s3", "x y z q"),        # disjoint from both
    ])
    assert got == {("s1", "s2"): (1, 3)}  # share abc; union 3; s3 absent


def test_identical_sources_have_full_overlap(spark):
    got = _run(spark, [("s1", "a b c d e"), ("s2", "a b c d e")])
    (inter, uni), = got.values()
    assert inter == uni == 3


def test_duplicate_docs_within_source_collapse(spark):
    # set semantics: repeating a doc inside a source must not change
    # any overlap number
    a = _run(spark, [("s1", "a b c"), ("s2", "a b c d")])
    b = _run(spark, [("s1", "a b c"), ("s1", "a b c"), ("s2", "a b c d")])
    assert a == b
