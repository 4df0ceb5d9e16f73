"""Webtext curation operators (repetition scores, duplicated shingles,
URL canonicalization) — verified against hand-computed expectations."""

from pyspark.sql import functions as F

from uckg_spark.operators import webtext


def _docs(spark):
    rows = [
        (0, "a a a a"),                       # 4 tokens, 1 distinct; top 2-gram "a a" ×3
        (1, "the cat sat on the mat"),        # 6 tokens, 5 distinct; all 2-grams unique
        (2, "one two three one two three"),   # repeated 3-gram phrase
        (3, "solo"),                          # 1 token → no 2-grams
        (4, "x y x y x y x y"),               # "x y" ×4, "y x" ×3
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestRepetitionScores:
    def test_scores_match_hand_computation(self, spark):
        out = {r["doc_id"]: r for r in webtext.repetition_scores(_docs(spark)).collect()}

        r0 = out[0]
        assert r0["n_tokens"] == 4
        assert r0["dup_token_frac_e6"] == 1000000 * 3 // 4
        assert r0["top_2gram_count"] == 3
        assert r0["top_2gram_frac_e6"] == 1000000 * 2 * 3 // 4

        r1 = out[1]
        assert r1["n_tokens"] == 6
        assert r1["dup_token_frac_e6"] == 1000000 * 1 // 6
        assert r1["top_2gram_count"] == 1

        r4 = out[4]
        assert r4["top_2gram_count"] == 4
        assert r4["top_2gram_frac_e6"] == 1000000 * 2 * 4 // 8

    def test_single_token_doc_has_no_grams(self, spark):
        out = {r["doc_id"]: r for r in webtext.repetition_scores(_docs(spark)).collect()}
        r3 = out[3]
        assert r3["n_tokens"] == 1
        assert r3["dup_token_frac_e6"] == 0
        assert r3["top_2gram_count"] == 0
        assert r3["top_2gram_frac_e6"] == 0


class TestDuplicatedShingles:
    def test_cross_doc_spans_only(self, spark):
        rows = [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "alpha beta gamma delta epsilon eta"),   # shares the first 5-gram
            (2, "totally unrelated words in this line"),
            (3, "p q p q p q p q p q p q"),              # internal repeats, one doc
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["shingle"]: r for r in webtext.duplicated_shingles(docs, n=5).collect()}
        # the only span in >= 2 distinct docs
        assert set(out) == {"alpha beta gamma delta epsilon"}
        assert out["alpha beta gamma delta epsilon"]["n_docs"] == 2
        assert out["alpha beta gamma delta epsilon"]["n_occurrences"] == 2

    def test_min_docs_one_surfaces_internal_repeats(self, spark):
        docs = spark.createDataFrame(
            [(0, "p q r s t p q r s t")], ["doc_id", "text"]
        )
        out = {r["shingle"]: r for r in
               webtext.duplicated_shingles(docs, n=5, min_docs=1).collect()}
        assert out["p q r s t"]["n_docs"] == 1
        assert out["p q r s t"]["n_occurrences"] == 2


class TestNormalizeUrl:
    CASES = [
        # (raw, canonical, host)
        ("HTTP://Example.COM/Path", "http://example.com/Path", "example.com"),
        ("http://example.com:80/a", "http://example.com/a", "example.com"),
        ("https://example.com:443/a", "https://example.com/a", "example.com"),
        ("http://example.com:8080/a", "http://example.com:8080/a", "example.com"),
        ("http://example.com/a/", "http://example.com/a", "example.com"),
        ("http://example.com/", "http://example.com/", "example.com"),
        ("http://example.com", "http://example.com/", "example.com"),
        ("http://example.com/a#frag", "http://example.com/a", "example.com"),
        ("http://example.com/a?q=UPPER#f", "http://example.com/a?q=UPPER", "example.com"),
        ("https://WWW.Example.com:443/Docs/3/#x", "https://www.example.com/Docs/3", "www.example.com"),
        # unparseable: every regexp yields '', empty path becomes '/'
        ("not a url", ":///", ""),
    ]

    def test_normalization_table(self, spark):
        df = spark.createDataFrame([(u,) for u, _, _ in self.CASES], ["url"])
        out = {
            r["url"]: (r["norm"], r["host"])
            for r in df.select(
                "url",
                webtext.normalize_url(F.col("url")).alias("norm"),
                webtext.url_host(F.col("url")).alias("host"),
            ).collect()
        }
        for raw, want_norm, want_host in self.CASES:
            assert out[raw] == (want_norm, want_host), raw

    def test_idempotent(self, spark):
        df = spark.createDataFrame(
            [(u,) for u, _, _ in self.CASES if u.startswith("http")], ["url"]
        )
        once = df.select(webtext.normalize_url(F.col("url")).alias("u"))
        twice = once.select("u", webtext.normalize_url(F.col("u")).alias("u2"))
        for r in twice.collect():
            assert r["u"] == r["u2"]
