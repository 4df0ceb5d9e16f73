"""Corpus-composition operators (exact-substring span removal,
stratified sampling, sequence packing) — hand-verified semantics."""

import hashlib

from uckg_spark.operators.corpus import pack_sequences, stratified_sample
from uckg_spark.operators.webtext import remove_duplicated_spans


def h32_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _docs(spark):
    rows = [
        (0, "a", "alpha beta gamma delta epsilon zeta unique0 tail0"),
        (1, "a", "alpha beta gamma delta epsilon eta unique1 tail1"),
        (2, "b", "totally unrelated words in this line here now"),
        (3, "b", "x"),
        (4, "a", ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


class TestRemoveDuplicatedSpans:
    def test_covered_tokens_cut_everywhere(self, spark):
        out = {r["doc_id"]: r for r in
               remove_duplicated_spans(_docs(spark), n=5).collect()}
        # "alpha beta gamma delta epsilon" is in docs 0 and 1 — its 5
        # tokens are cut from BOTH; the distinct tails survive
        assert out[0]["n_removed"] == 5
        assert out[0]["text_clean"] == "zeta unique0 tail0"
        assert out[1]["n_removed"] == 5
        assert out[1]["text_clean"] == "eta unique1 tail1"

    def test_unique_and_short_docs_untouched(self, spark):
        out = {r["doc_id"]: r for r in
               remove_duplicated_spans(_docs(spark), n=5).collect()}
        assert out[2]["n_removed"] == 0
        assert out[2]["text_clean"] == "totally unrelated words in this line here now"
        assert out[3] ["n_removed"] == 0 and out[3]["text_clean"] == "x"
        assert out[4]["n_tokens"] == 0 and out[4]["text_clean"] == ""

    def test_overlapping_spans_union_coverage(self, spark):
        # shared run of 6 tokens -> two overlapping duplicated 5-grams
        # covering tokens 1..6; coverage is the UNION, not double-counted
        docs = spark.createDataFrame(
            [(0, "p q r s t u endA"), (1, "p q r s t u endB")],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r for r in
               remove_duplicated_spans(docs, n=5).collect()}
        assert out[0]["n_removed"] == 6 and out[0]["text_clean"] == "endA"
        assert out[1]["n_removed"] == 6 and out[1]["text_clean"] == "endB"


class TestStratifiedSample:
    def test_rate_and_membership_match_hash(self, spark):
        docs = spark.createDataFrame(
            [(i, "big" if i < 40 else "small", "t") for i in range(50)],
            ["doc_id", "source", "text"],
        )
        kept = stratified_sample(docs, target_per_group=10).collect()
        by_src = {}
        for r in kept:
            by_src.setdefault(r["source"], set()).add(r["doc_id"])
            expected_rate = min(10**6, 10**6 * 10 // (40 if r["source"] == "big" else 10))
            assert r["rate_e6"] == expected_rate
        # small group (10 docs, rate 1e6): kept whole
        assert by_src["small"] == set(range(40, 50))
        # big group: exactly the docs whose portable hash clears the bar
        want = {i for i in range(40) if h32_py(str(i)) % 10**6 < 250000}
        assert by_src["big"] == want

    def test_deterministic(self, spark):
        docs = spark.createDataFrame(
            [(i, "s", "t") for i in range(30)], ["doc_id", "source", "text"]
        )
        a = {r["doc_id"] for r in stratified_sample(docs, target_per_group=7).collect()}
        b = {r["doc_id"] for r in stratified_sample(docs, target_per_group=7).collect()}
        assert a == b and 0 < len(a) < 30


class TestPackSequences:
    def test_offsets_and_chunks(self, spark):
        out = {r["doc_id"]: r for r in
               pack_sequences(_docs(spark), budget=8).collect()}
        # group a in doc_id order: 0 (8 tok), 1 (8 tok), 4 (0 tok)
        assert (out[0]["start_offset"], out[0]["first_chunk"], out[0]["last_chunk"]) == (0, 0, 0)
        assert (out[1]["start_offset"], out[1]["first_chunk"], out[1]["last_chunk"]) == (8, 1, 1)
        # empty doc lives AT its offset, spanning one chunk
        assert (out[4]["start_offset"], out[4]["n_chunks"]) == (16, 1)
        # group b: doc 3 (1 tok) starts after doc 2's 8 tokens
        assert (out[3]["start_offset"], out[3]["first_chunk"]) == (8, 1)

    def test_straddling_doc_spans_multiple_chunks(self, spark):
        docs = spark.createDataFrame(
            [(0, "s", "a b c"), (1, "s", " ".join(["w"] * 10))],
            ["doc_id", "source", "text"],
        )
        out = {r["doc_id"]: r for r in pack_sequences(docs, budget=4).collect()}
        # doc 1: tokens 3..12 -> chunks 0..3
        assert out[1]["start_offset"] == 3
        assert (out[1]["first_chunk"], out[1]["last_chunk"], out[1]["n_chunks"]) == (0, 3, 4)

    def test_no_token_lost_or_double_counted(self, spark):
        rows = pack_sequences(_docs(spark), budget=8).collect()
        for g in ("a", "b"):
            grp = sorted((r for r in rows if r["group"] == g),
                         key=lambda r: r["doc_id"])
            running = 0
            for r in grp:
                assert r["start_offset"] == running
                running += r["n_tokens"]


class TestTrainingChunks:
    def test_stream_integrity(self, spark):
        from uckg_spark.operators.corpus import training_chunks
        from uckg_spark.operators.vocab import build_vocab, encode_docs

        docs = _docs(spark)
        vocab = build_vocab(docs, max_size=3)
        budget = 5
        chunks = sorted(
            training_chunks(docs, vocab, budget=budget).collect(),
            key=lambda r: (r["group"], r["chunk_id"]),
        )
        # rebuild each group's stream from the per-doc encodings
        enc = {r["doc_id"]: r["ids"] for r in encode_docs(docs, vocab).collect()}
        streams = {}
        for doc_id, src, _ in sorted(_docs(spark).collect()):
            ids = enc[doc_id].split() if enc[doc_id] else []
            streams.setdefault(src, []).extend(ids)
        for g, stream in streams.items():
            got = [r for r in chunks if r["group"] == g]
            # chunk ids are dense from 0; every chunk full except the last
            assert [r["chunk_id"] for r in got] == list(range(len(got)))
            rebuilt = []
            for i, r in enumerate(got):
                ids = r["ids"].split()
                assert r["n_tokens"] == len(ids)
                if i < len(got) - 1:
                    assert len(ids) == budget
                rebuilt.extend(ids)
            # no token lost, duplicated, or reordered
            assert rebuilt == stream, g


class TestContaminationReport:
    def test_known_overlap(self, spark):
        from uckg_spark.operators.corpus import contamination_report

        # eval doc 10 shares its first five tokens with train doc 0;
        # eval doc 11 is clean; eval doc 12 is shorter than n
        rows = [
            (0, "train", "alpha beta gamma delta epsilon zeta"),
            (1, "train", "one two three four five six"),
            (10, "eval", "alpha beta gamma delta epsilon other words here"),
            (11, "eval", "completely fresh material nothing shared at all"),
            (12, "eval", "too short"),
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
        out = {r["doc_id"]: r for r in
               contamination_report(docs, "eval", n=5).collect()}
        assert set(out) == {10, 11, 12}  # every eval doc reports
        # doc 10: 4 distinct shingles, exactly 1 in train
        assert out[10]["n_shingles"] == 4
        assert out[10]["n_contaminated"] == 1
        assert out[11]["n_shingles"] == 3  # 7 tokens -> 3 five-grams
        assert out[11]["n_contaminated"] == 0
        assert out[12]["n_shingles"] == 0
        assert out[12]["n_contaminated"] == 0

    def test_train_side_never_reports(self, spark):
        from uckg_spark.operators.corpus import contamination_report

        rows = [(0, "train", "a b c d e f"), (1, "eval", "a b c d e f")]
        docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
        out = contamination_report(docs, "eval", n=5).collect()
        assert [r["doc_id"] for r in out] == [1]
        assert out[0]["n_contaminated"] == 2  # both 5-gram shingles shared


class TestCurateCorpus:
    def test_dedup_runs_before_language_gate(self, spark):
        from uckg_spark.operators.corpus import curate_corpus

        # docs 0 (de) and 1 (en) are byte-identical: the keeper is the
        # MIN doc_id (0, de), which the language gate then drops — doc 1
        # must NOT sneak through (it lost the dedup), doc 2 survives
        rows = [
            (0, "de", "the of and to a in that it is was here now"),
            (1, "en", "the of and to a in that it is was here now"),
            (2, "en", "the of and to a in that it is was again later"),
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
        kept = {r["doc_id"] for r in curate_corpus(
            docs, min_quality_e6=0, max_dup_frac_e6=1_000_000).collect()}
        assert kept == {2}

    def test_quality_and_repetition_thresholds(self, spark):
        from uckg_spark.operators.corpus import curate_corpus

        stopword_rich = " ".join(
            "the of and to a in that it is was for on".split() * 12)
        rows = [
            (0, "en", stopword_rich),        # high quality, high dup_frac
            (1, "en", "!!!! ???? ;;;; ****"),  # punctuation: low quality
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
        # dup ceiling at 1e6: only the quality floor filters
        kept = {r["doc_id"] for r in curate_corpus(
            docs, min_quality_e6=600_000, max_dup_frac_e6=1_000_000).collect()}
        assert kept == {0}
        # tighten the repetition ceiling: the stopword loop is pure dup
        kept = {r["doc_id"] for r in curate_corpus(
            docs, min_quality_e6=600_000, max_dup_frac_e6=600_000).collect()}
        assert kept == set()
