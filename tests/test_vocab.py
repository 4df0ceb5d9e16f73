"""Vocabulary induction + corpus encoding (operators/vocab.py)."""

from uckg_spark.operators.vocab import build_vocab, encode_docs


def _docs(spark):
    rows = [
        (0, "b b b a a c"),
        (1, "a b rare"),
        (2, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestBuildVocab:
    def test_rank_by_freq_then_token(self, spark):
        vocab = {r["token"]: (r["freq"], r["vocab_id"])
                 for r in build_vocab(_docs(spark), max_size=10).collect()}
        # freqs: b=4, a=3, c=1, rare=1 (tie c < rare lexically)
        assert vocab == {"b": (4, 1), "a": (3, 2), "c": (1, 3), "rare": (1, 4)}

    def test_max_size_truncates(self, spark):
        rows = build_vocab(_docs(spark), max_size=2).collect()
        assert sorted((r["token"], r["vocab_id"]) for r in rows) == [("a", 2), ("b", 1)]

    def test_min_freq_filters(self, spark):
        rows = build_vocab(_docs(spark), max_size=10, min_freq=2).collect()
        assert {r["token"] for r in rows} == {"a", "b"}


class TestEncodeDocs:
    def test_order_preserved_and_oov_zero(self, spark):
        docs = _docs(spark)
        vocab = build_vocab(docs, max_size=2)  # ids: b=1, a=2; c/rare OOV
        out = {r["doc_id"]: r for r in encode_docs(docs, vocab).collect()}
        assert out[0]["ids"] == "1 1 1 2 2 0"
        assert out[1]["ids"] == "2 1 0"
        assert out[1]["n_tokens"] == 3

    def test_empty_doc_round_trips(self, spark):
        docs = _docs(spark)
        out = {r["doc_id"]: r for r in
               encode_docs(docs, build_vocab(docs)).collect()}
        assert out[2]["n_tokens"] == 0 and out[2]["ids"] == ""

    def test_every_doc_present(self, spark):
        docs = _docs(spark)
        assert encode_docs(docs, build_vocab(docs)).count() == docs.count()
