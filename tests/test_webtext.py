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


class TestDedupParagraphs:
    """CCNet-style paragraph dedup: boilerplate (paragraphs in >=min_docs
    distinct docs, compared on the whitespace-collapsed lowercased form)
    is cut from every document; survivors keep order."""

    def _corpus(self, spark):
        b = "Subscribe  To The Newsletter"      # boilerplate, messy casing
        rows = [
            (0, f"{b}\n\nalpha prose zero\n\ncopyright footer"),
            (1, f"subscribe to the newsletter\n\nbeta prose one\n\ncopyright footer"),
            (2, f"{b}\n\ngamma prose two"),
            (3, f"{b}\n\ncopyright footer"),    # all paragraphs boilerplate
            (4, "delta prose four"),            # no boilerplate at all
        ]
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_boilerplate_cut_order_kept(self, spark):
        from uckg_spark.operators.webtext import dedup_paragraphs

        out = {r["doc_id"]: r
               for r in dedup_paragraphs(self._corpus(spark), min_docs=3).collect()}
        # header normalizes identically in docs 0-3 (4 >= 3): cut.
        # footer appears in docs 0,1,3 (3 >= 3): cut.
        assert out[0]["text_clean"] == "alpha prose zero"
        assert (out[0]["n_paras"], out[0]["n_removed"]) == (3, 2)
        assert out[1]["text_clean"] == "beta prose one"
        assert out[2]["text_clean"] == "gamma prose two"
        assert (out[2]["n_paras"], out[2]["n_removed"]) == (2, 1)
        # every paragraph boilerplate -> doc survives with empty text
        assert out[3]["text_clean"] == ""
        assert (out[3]["n_paras"], out[3]["n_removed"]) == (2, 2)
        # untouched doc round-trips byte-identically
        assert out[4]["text_clean"] == "delta prose four"
        assert (out[4]["n_paras"], out[4]["n_removed"]) == (1, 0)

    def test_threshold_boundary(self, spark):
        from uckg_spark.operators.webtext import dedup_paragraphs

        # at min_docs=5 nothing crosses the threshold: all docs intact
        out = {r["doc_id"]: r
               for r in dedup_paragraphs(self._corpus(spark), min_docs=5).collect()}
        assert all(r["n_removed"] == 0 for r in out.values())
        src = {r["doc_id"]: r["text"] for r in self._corpus(spark).collect()}
        assert all(out[i]["text_clean"] == src[i] for i in src)

    def test_repeats_within_one_doc_do_not_count(self, spark):
        from uckg_spark.operators.webtext import dedup_paragraphs

        # the same paragraph 3x in ONE doc is 1 distinct doc -> kept
        df = spark.createDataFrame(
            [(0, "same\n\nsame\n\nsame"), (1, "other prose")],
            ["doc_id", "text"])
        out = {r["doc_id"]: r
               for r in dedup_paragraphs(df, min_docs=2).collect()}
        assert out[0]["text_clean"] == "same\n\nsame\n\nsame"
        assert out[0]["n_removed"] == 0


def test_dedup_paragraphs_regex_metachar_sep(spark):
    """sep is used as a Java regex by F.split but as a LITERAL by the
    reassembly join — a metacharacter sep ('||') must split literally."""
    from uckg_spark.operators.webtext import dedup_paragraphs

    df = spark.createDataFrame(
        [(1, "a||boiler||x"), (2, "b||boiler||y"), (3, "c||solo||z")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_paragraphs(df, sep="||").collect()}
    assert out[1]["text_clean"] == "a||x"
    assert out[1]["n_paras"] == 3 and out[1]["n_removed"] == 1
    assert out[3]["text_clean"] == "c||solo||z"
