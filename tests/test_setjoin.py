"""similarity_join: exact recall vs brute force (prefix filtering must
lose NOTHING), integer boundary behavior, size filter, empty docs."""

import itertools

import pytest

from uckg_spark.operators.setjoin import similarity_join


def _df(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string")


def brute_py(docs, num, den):
    sets = [frozenset(t for t in d.split(" ") if t) for d in docs]
    out = {}
    for a, b in itertools.combinations(range(len(docs)), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and den * inter >= num * union:
            out[(a, b)] = (inter, union, inter * 1_000_000 // union)
    return out


class TestSimilarityJoin:
    def test_exact_recall_on_random_corpus(self, spark):
        import random

        rng = random.Random(31)
        vocab = [f"w{i}" for i in range(30)]
        docs = [
            " ".join(rng.sample(vocab, rng.randrange(2, 12)))
            for _ in range(50)
        ]
        for num, den in ((60, 100), (80, 100), (1, 2)):
            got = {
                (r["doc_a"], r["doc_b"]):
                    (r["inter"], r["union_sz"], r["jaccard_e6"])
                for r in similarity_join(
                    _df(spark, docs), "text", "doc_id", num, den
                ).collect()
            }
            assert got == brute_py(docs, num, den), (num, den)

    def test_boundary_pair_included_below_excluded(self, spark):
        # {a b c} vs {a b d}: jaccard = 2/4 = exactly 1/2
        docs = ["a b c", "a b d"]
        at = similarity_join(_df(spark, docs), "text", "doc_id", 1, 2)
        assert at.count() == 1
        above = similarity_join(_df(spark, docs), "text", "doc_id", 51, 100)
        assert above.count() == 0

    def test_identical_docs_score_one(self, spark):
        docs = ["x y z", "z y x", "other stuff"]
        got = similarity_join(
            _df(spark, docs), "text", "doc_id", 99, 100).collect()
        assert len(got) == 1
        r = got[0]
        assert (r["doc_a"], r["doc_b"], r["jaccard_e6"]) == (0, 1, 1_000_000)

    def test_empty_docs_never_pair(self, spark):
        docs = ["", "", "a b"]
        assert similarity_join(
            _df(spark, docs), "text", "doc_id", 1, 2).count() == 0

    def test_invalid_threshold_raises(self, spark):
        df = _df(spark, ["a"])
        with pytest.raises(ValueError):
            similarity_join(df, "text", "doc_id", 0, 100)
        with pytest.raises(ValueError):
            similarity_join(df, "text", "doc_id", 101, 100)


def brute_shingle_py(docs, n, num, den):
    def sh(d):
        tk = [t for t in d.split(" ") if t]
        return frozenset(
            " ".join(tk[i:i + n]) for i in range(len(tk) - n + 1))

    sets = [sh(d) for d in docs]
    out = {}
    for a, b in itertools.combinations(range(len(docs)), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and den * inter >= num * union:
            out[(a, b)] = (inter, union, inter * 1_000_000 // union)
    return out


class TestSimilarityJoinShingles:
    def test_shingle_mode_matches_brute_force(self, spark):
        import random

        rng = random.Random(37)
        vocab = [f"w{i}" for i in range(10)]
        base = [" ".join(rng.choice(vocab) for _ in range(15))
                for _ in range(12)]
        # append near-dups: same text with one word changed
        docs = base + [d.replace("w0", "w9", 1) for d in base[:4]]
        got = {
            (r["doc_a"], r["doc_b"]):
                (r["inter"], r["union_sz"], r["jaccard_e6"])
            for r in similarity_join(
                _df(spark, docs), "text", "doc_id", 1, 2, shingle_n=3
            ).collect()
        }
        assert got == brute_shingle_py(docs, 3, 1, 2)

    def test_shingles_separate_what_unigrams_conflate(self, spark):
        # same word SET, different order ⇒ unigram jaccard 1.0 but
        # shingle jaccard low: shingle mode must NOT pair them
        docs = ["a b c d e", "e d c b a"]
        uni = similarity_join(_df(spark, docs), "text", "doc_id", 9, 10)
        shi = similarity_join(_df(spark, docs), "text", "doc_id", 9, 10,
                              shingle_n=3)
        assert uni.count() == 1
        assert shi.count() == 0


def brute_containment_py(docs, num, den):
    sets = [frozenset(t for t in d.split(" ") if t) for d in docs]
    out = {}
    for a in range(len(docs)):
        for b in range(len(docs)):
            if a == b or not sets[a]:
                continue
            inter = len(sets[a] & sets[b])
            if den * inter >= num * len(sets[a]):
                out[(a, b)] = (
                    inter, len(sets[a]), inter * 1_000_000 // len(sets[a]))
    return out


class TestContainmentJoin:
    def test_exact_recall_on_random_corpus(self, spark):
        # the asymmetric prefix filter must lose NOTHING vs brute force
        import random

        from uckg_spark.operators.setjoin import containment_join

        rng = random.Random(77)
        vocab = [f"w{i}" for i in range(30)]
        docs = [
            " ".join(rng.sample(vocab, rng.randrange(2, 12)))
            for _ in range(50)
        ]
        for num, den in ((80, 100), (1, 2), (99, 100)):
            got = {
                (r["src"], r["dst"]):
                    (r["inter"], r["n_src"], r["containment_e6"])
                for r in containment_join(
                    _df(spark, docs), "text", "doc_id", num, den,
                    shingle_n=None,
                ).collect()
            }
            assert got == brute_containment_py(docs, num, den), (num, den)

    def test_asymmetry_quote_inclusion(self, spark):
        # small doc fully inside a big one: containment fires one way
        # only, and at a threshold where Jaccard is hopeless
        from uckg_spark.operators.setjoin import containment_join, similarity_join

        small = "p q r"
        big = " ".join(f"z{i}" for i in range(40)) + " p q r"
        pairs = containment_join(
            _df(spark, [small, big]), "text", "doc_id", 99, 100,
            shingle_n=None,
        ).collect()
        assert [(r["src"], r["dst"], r["containment_e6"]) for r in pairs] \
            == [(0, 1, 1_000_000)]
        assert similarity_join(
            _df(spark, [small, big]), "text", "doc_id", 1, 2
        ).count() == 0

    def test_empty_and_short_docs_emit_nothing(self, spark):
        from uckg_spark.operators.setjoin import containment_join

        assert containment_join(
            _df(spark, ["", "a b c d", "a b c d"]), "text", "doc_id",
            80, 100, shingle_n=3,
        ).count() == 2  # the identical pair, both directions; "" is inert
