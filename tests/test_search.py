"""bm25_rank: exact scores vs a Fraction-based reference, ranking
properties (tf saturation, length normalization, idf rarity), and
input validation."""

from fractions import Fraction

import pytest

from uckg_spark.operators.search import bm25_rank


def _df(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string")


def bm25_py(docs, terms, top_k):
    toks = [[t for t in d.split(" ") if t] for d in docs]
    n = len(toks)
    s = sum(len(tk) for tk in toks)
    scores = []
    for i, tk in enumerate(toks):
        dl = len(tk)
        total = 0
        for t in terms:
            tf = tk.count(t)
            df = sum(1 for other in toks if t in other)
            num = (2 * n - 2 * df + 1) * 22 * tf * s * 1_000_000
            den = (2 * df + 1) * (10 * s * tf + 3 * s + 9 * dl * n)
            total += num // den
        scores.append((i, total))
    scores.sort(key=lambda p: (-p[1], p[0]))
    return scores[:top_k]


class TestBm25Rank:
    def test_matches_reference_on_random_corpus(self, spark):
        import random

        rng = random.Random(17)
        vocab = ["hash", "join", "scan", "row", "the", "a", "vector"]
        docs = [
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 30)))
            for _ in range(60)
        ]
        got = [
            (r["id"], r["score_e6"])
            for r in bm25_rank(
                _df(spark, docs), "text", "doc_id",
                ("hash", "vector"), top_k=10,
            ).collect()
        ]
        assert got == bm25_py(docs, ("hash", "vector"), 10)

    def test_rarer_term_outscores_common_term(self, spark):
        docs = (["rare common pad"] + ["common pad"] * 8
                + ["pad filler"])
        by_rare = bm25_rank(_df(spark, docs), "text", "doc_id",
                            ("rare",), top_k=1).collect()[0]
        by_common = bm25_rank(_df(spark, docs), "text", "doc_id",
                              ("common",), top_k=1).collect()[0]
        assert by_rare["id"] == 0
        assert by_rare["score_e6"] > by_common["score_e6"]

    def test_shorter_doc_wins_at_equal_tf(self, spark):
        docs = ["x y", "x y pad pad pad pad"]
        got = bm25_rank(_df(spark, docs), "text", "doc_id",
                        ("x",), top_k=2).collect()
        assert [r["id"] for r in got] == [0, 1]

    def test_tf_saturates_sublinearly(self, spark):
        # doubling tf must raise the score by LESS than 2x (k1 saturation)
        docs = ["x pad pad pad", "x x pad pad", "other junk"]
        got = {r["id"]: r["score_e6"]
               for r in bm25_rank(_df(spark, docs), "text", "doc_id",
                                  ("x",), top_k=3).collect()}
        assert got[1] > got[0]
        assert got[1] < 2 * got[0]

    def test_absent_term_scores_zero(self, spark):
        docs = ["a b", "c d"]
        got = {r["id"]: r["score_e6"]
               for r in bm25_rank(_df(spark, docs), "text", "doc_id",
                                  ("zzz",), top_k=2).collect()}
        assert got == {0: 0, 1: 0}

    def test_invalid_inputs_raise(self, spark):
        df = _df(spark, ["a"])
        with pytest.raises(ValueError):
            bm25_rank(df, "text", "doc_id", ())
        with pytest.raises(ValueError):
            bm25_rank(df, "text", "doc_id", ("a", "a"))
        with pytest.raises(ValueError):
            bm25_rank(df, "text", "doc_id", ("two words",))
        with pytest.raises(ValueError):
            bm25_rank(df, "text", "doc_id", ("a",), top_k=0)
