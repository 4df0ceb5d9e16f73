"""build_inverted_index: postings vs a python reference, per-doc
dedup, df gates, and plan shape (one shuffle)."""

import pytest

from uckg_spark.operators.invindex import build_inverted_index


def _df(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string")


def index_py(docs, min_df=1, max_df=None):
    post: dict[str, set[int]] = {}
    for i, d in enumerate(docs):
        for t in {t for t in d.split(" ") if t}:
            post.setdefault(t, set()).add(i)
    return {
        t: (len(ids), sorted(ids))
        for t, ids in post.items()
        if len(ids) >= min_df and (max_df is None or len(ids) <= max_df)
    }


class TestInvertedIndex:
    def test_matches_reference(self, spark):
        import random

        rng = random.Random(29)
        vocab = [f"w{i}" for i in range(15)]
        docs = [
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 25)))
            for _ in range(80)
        ]
        got = {
            r["token"]: (r["df"], list(r["postings"]))
            for r in build_inverted_index(
                _df(spark, docs), "text", "doc_id").collect()
        }
        assert got == index_py(docs)

    def test_repeated_token_in_doc_posts_once(self, spark):
        got = build_inverted_index(
            _df(spark, ["x x x y"]), "text", "doc_id").collect()
        assert {r["token"]: (r["df"], list(r["postings"]))
                for r in got} == {"x": (1, [0]), "y": (1, [0])}

    def test_df_gates(self, spark):
        docs = ["a b", "a b", "a c"]  # df: a=3, b=2, c=1
        got = {r["token"] for r in build_inverted_index(
            _df(spark, docs), "text", "doc_id", min_df=2, max_df=2
        ).collect()}
        assert got == {"b"}

    def test_invalid_gates_raise(self, spark):
        df = _df(spark, ["a"])
        with pytest.raises(ValueError):
            build_inverted_index(df, "text", "doc_id", min_df=0)
        with pytest.raises(ValueError):
            build_inverted_index(df, "text", "doc_id", min_df=3, max_df=2)

    def test_single_shuffle_plan(self, spark):
        plan = (
            build_inverted_index(_df(spark, ["a b"]), "text", "doc_id")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1
