"""Randomized cross-checks of the webtext/corpus/vocab operators against
independent pure-Python references. Complements the fixed DuckDB oracles:
random word-soup corpora (with planted duplicates, short docs, empty
docs) exercise shapes the sf tables never produce.

Deterministic: corpora come from seeded ``random.Random``."""

import random
from collections import Counter

from uckg_spark.operators.corpus import pack_sequences
from uckg_spark.operators.vocab import build_vocab, encode_docs
from uckg_spark.operators.webtext import (
    duplicated_shingles,
    remove_duplicated_spans,
    repetition_scores,
)

WORDS = [f"w{i}" for i in range(12)]


def _random_docs(seed, n_docs=20):
    """Word-soup docs over a tiny vocabulary so shingle collisions are
    common; includes planted copies, a short doc, and an empty doc."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        length = rng.choice([0, 2, 4] + [rng.randrange(8, 28)] * 5)
        rows.append((i, " ".join(rng.choice(WORDS) for _ in range(length))))
    # planted duplicate run shared by two docs
    run = " ".join(rng.choice(WORDS) for _ in range(7))
    rows.append((n_docs, run + " uniqA"))
    rows.append((n_docs + 1, "uniqB " + run))
    return rows


def _toks(text):
    return [t for t in text.split(" ") if t]


def _py_shingles(text, n):
    t = _toks(text)
    return [" ".join(t[i:i + n]) for i in range(len(t) - n + 1)]


class TestRepetitionVsPython:
    def test_matches_reference(self, spark):
        for seed in (1, 2, 3):
            rows = _random_docs(seed)
            docs = spark.createDataFrame(rows, ["doc_id", "text"])
            got = {r["doc_id"]: r for r in repetition_scores(docs).collect()}
            for doc_id, text in rows:
                t = _toks(text)
                n = len(t)
                grams = Counter(_py_shingles(text, 2))
                top = max(grams.values()) if grams else 0
                r = got[doc_id]
                assert r["n_tokens"] == n
                assert r["dup_token_frac_e6"] == 10**6 * (n - len(set(t))) // max(n, 1)
                assert r["top_2gram_count"] == top
                assert r["top_2gram_frac_e6"] == 10**6 * 2 * top // max(n, 1)


class TestSpanRemovalVsPython:
    def test_matches_reference(self, spark):
        n = 4
        for seed in (4, 5):
            rows = _random_docs(seed)
            docs = spark.createDataFrame(rows, ["doc_id", "text"])
            # reference: spans in >= 2 distinct docs, union coverage
            by_span = {}
            for doc_id, text in rows:
                for s in set(_py_shingles(text, n)):
                    by_span.setdefault(s, set()).add(doc_id)
            dup = {s for s, ids in by_span.items() if len(ids) >= 2}
            got = {r["doc_id"]: r for r in
                   remove_duplicated_spans(docs, n=n).collect()}
            for doc_id, text in rows:
                t = _toks(text)
                covered = set()
                for i in range(len(t) - n + 1):
                    if " ".join(t[i:i + n]) in dup:
                        covered.update(range(i, i + n))
                kept = [tk for j, tk in enumerate(t) if j not in covered]
                r = got[doc_id]
                assert r["n_removed"] == len(covered), (seed, doc_id)
                assert r["text_clean"] == " ".join(kept), (seed, doc_id)

    def test_composes_with_counting_phase(self, spark):
        # after removal, no 4-gram may appear in >= 2 docs EXCEPT spans
        # newly formed by the cut (stitched-together survivors) — so
        # re-running on cleaned text only ever finds stitched spans,
        # never an original duplicated span
        rows = _random_docs(6)
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        original_dup = {r["shingle"] for r in
                        duplicated_shingles(docs, n=4).collect()}
        cleaned = remove_duplicated_spans(docs, n=4).selectExpr(
            "doc_id", "text_clean AS text")
        remaining = {r["shingle"] for r in
                     duplicated_shingles(cleaned, n=4).collect()}
        assert not (remaining & original_dup)


class TestVocabEncodeVsPython:
    def test_round_trip_matches_reference(self, spark):
        for seed in (7, 8):
            rows = _random_docs(seed)
            docs = spark.createDataFrame(rows, ["doc_id", "text"])
            freq = Counter(t for _, text in rows for t in _toks(text))
            ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
            ids = {tok: i + 1 for i, (tok, _) in enumerate(ranked)}
            vocab = build_vocab(docs, max_size=5)
            got_vocab = {r["token"]: r["vocab_id"] for r in vocab.collect()}
            assert got_vocab == ids
            got = {r["doc_id"]: r["ids"] for r in
                   encode_docs(docs, vocab).collect()}
            for doc_id, text in rows:
                want = " ".join(str(ids.get(t, 0)) for t in _toks(text))
                assert got[doc_id] == want, (seed, doc_id)


class TestPackingVsPython:
    def test_matches_reference(self, spark):
        budget = 16
        for seed in (9, 10):
            rows = [(i, f"s{i % 3}", text) for i, (_, text) in
                    enumerate(_random_docs(seed))]
            docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
            got = {r["doc_id"]: r for r in
                   pack_sequences(docs, budget=budget).collect()}
            offsets = {}
            for doc_id, src, text in sorted(rows):
                n = len(_toks(text))
                start = offsets.get(src, 0)
                offsets[src] = start + n
                first = start // budget
                last = (start + max(n, 1) - 1) // budget
                r = got[doc_id]
                assert (r["start_offset"], r["first_chunk"], r["last_chunk"]) == (
                    start, first, last), (seed, doc_id)


def _random_para_docs(seed, n_docs=18):
    """Paragraphed docs over a tiny paragraph pool so cross-doc repeats
    are common; casing/whitespace jitter exercises normalization."""
    rng = random.Random(seed)
    pool = [f"para {i} body text" for i in range(6)]
    rows = []
    for i in range(n_docs):
        n_p = rng.randrange(1, 5)
        paras = []
        for _ in range(n_p):
            p = rng.choice(pool + [f"unique {i} {rng.randrange(999)}"])
            if rng.random() < 0.3:
                p = p.upper()
            if rng.random() < 0.3:
                p = "  " + p.replace(" ", "   ", 1)
            paras.append(p)
        rows.append((i, "\n\n".join(paras)))
    return rows


def _py_dedup_paragraphs(rows, min_docs):
    """Independent reference: normalize, count distinct docs per norm,
    cut every paragraph at/over threshold, rejoin in order."""
    import re

    def norm(p):
        return re.sub(r"\s+", " ", p).strip().lower()

    by_norm = {}
    split = {i: t.split("\n\n") for i, t in rows}
    for i, ps in split.items():
        for p in ps:
            by_norm.setdefault(norm(p), set()).add(i)
    hot = {k for k, v in by_norm.items() if len(v) >= min_docs}
    out = {}
    for i, ps in split.items():
        kept = [p for p in ps if norm(p) not in hot]
        out[i] = (len(ps), len(ps) - len(kept), "\n\n".join(kept))
    return out


class TestDedupParagraphsVsPython:
    def test_matches_reference(self, spark):
        from uckg_spark.operators.webtext import dedup_paragraphs

        for seed in (11, 12, 13):
            rows = _random_para_docs(seed)
            docs = spark.createDataFrame(rows, ["doc_id", "text"])
            for min_docs in (2, 3):
                want = _py_dedup_paragraphs(rows, min_docs)
                got = {
                    r["doc_id"]: (r["n_paras"], r["n_removed"], r["text_clean"])
                    for r in dedup_paragraphs(docs, min_docs=min_docs).collect()
                }
                assert got == want, (seed, min_docs)

    def test_idempotent(self, spark):
        """A second pass removes nothing: kept paragraphs had < min_docs
        distinct docs, and removal never raises any count."""
        from uckg_spark.operators.webtext import dedup_paragraphs

        rows = _random_para_docs(7)
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        # fully-cleaned docs drop out: their '' text would otherwise be
        # a new (empty) paragraph duplicated across every such doc
        once = dedup_paragraphs(docs, min_docs=2).filter(
            "text_clean <> ''").select("doc_id", "text_clean")
        again = dedup_paragraphs(
            once.withColumnRenamed("text_clean", "text"), min_docs=2)
        assert all(r["n_removed"] == 0 for r in again.collect())
