"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All JVM-side column algebra (regexp_count / aggregate / transform) so the
DuckDB oracle can reproduce every number exactly — no UDFs, no floats from
Python. The documents table shape is the driver's
/root/testdata/*/documents.parquet: (doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import h32, tokens

# tiny deterministic stopword gazetteers (language-ID n-gram heuristic)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que"],
}


def _stopword_hits(text_col: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(text_col), F.lit(pat))


def language_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language stopword-hit ratios + argmax guess (ties → language
    name ascending, deterministic).

    lower(text) and the token count are materialized once — inlining them
    repeats the lowercase pass and the tokenization once per language."""
    t = F.col(text_col)
    pre = docs.select(
        "doc_id",
        F.lower(t).alias("_lt"),
        F.size(tokens(t)).alias("_ntok"),
    )
    cols = {
        lang: (
            F.regexp_count(F.col("_lt"), F.lit(r"\b(" + "|".join(words) + r")\b"))
            / F.greatest(F.col("_ntok"), F.lit(1))
        ).alias(f"score_{lang}")
        for lang, words in sorted(STOPWORDS.items())
    }
    scored = pre.select("doc_id", *cols.values())
    pairs = F.array(*[
        F.struct((-F.col(f"score_{lang}")).alias("neg"), F.lit(lang).alias("lang"))
        for lang in sorted(STOPWORDS)
    ])
    return scored.withColumn("lang_guess", F.array_min(pairs)["lang"])


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / uppercase ratios + a composite
    quality score, ALL in exact parts-per-million integers:
      quality_e6 = (4·len_norm_e6 + 3·stop_e6 + 3·(1e6 − punct_e6)) div 10
    Integer arithmetic (div = floor division) is bit-identical in every
    engine — float summation order can flip the 6th decimal between Spark
    and an oracle engine, integers can't.
    """
    t = F.col(text_col)
    n_chars = F.length(t).cast("bigint")
    ntok = F.size(tokens(t)).cast("bigint")
    punct = F.regexp_count(t, F.lit(r"[^\w\s]")).cast("bigint")
    upper = F.regexp_count(t, F.lit(r"[A-Z]")).cast("bigint")
    stop_en = _stopword_hits(t, STOPWORDS["en"]).cast("bigint")
    M = F.lit(1000000).cast("bigint")
    len_e6 = F.least(n_chars, F.lit(500)) * F.lit(2000)
    # floor of int/int division is exact while numerators stay < 2^53
    stop_e6 = F.least(
        F.floor((F.lit(5) * M * stop_en) / F.greatest(ntok, F.lit(1))).cast("bigint"), M
    )
    punct_e6 = F.floor((M * punct) / F.greatest(n_chars, F.lit(1))).cast("bigint")
    quality_e6 = F.floor(
        (F.lit(4) * len_e6 + F.lit(3) * stop_e6 + F.lit(3) * (M - punct_e6)) / F.lit(10)
    ).cast("bigint")
    return docs.select(
        "doc_id",
        ntok.alias("n_tokens"),
        punct.alias("n_punct"),
        upper.alias("n_upper"),
        len_e6.alias("len_norm_e6"),
        stop_e6.alias("stop_ratio_e6"),
        punct_e6.alias("punct_ratio_e6"),
        quality_e6.alias("quality_e6"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword proxy: count of
    alphanumeric runs and punctuation marks (what a byte-level BPE would
    roughly split on), via one regexp_count."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.size(tokens(t)).alias("ws_tokens"),
        F.regexp_count(t, F.lit(r"[A-Za-z0-9]+|[^\sA-Za-z0-9]")).alias("bpeish_tokens"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Position-weighted rolling document fingerprint:
    sum over tokens of (pos+1)·h32(token) mod 2^61−1. Order-sensitive (a
    shuffled doc fingerprints differently), portable to SQL via
    unnest-with-ordinality."""
    MOD = (1 << 61) - 1
    toks = tokens(F.col(text_col))
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)))
    terms = F.zip_with(toks, idx, lambda tk, i: i.cast("bigint") * h32(tk))
    fp = F.aggregate(terms, F.lit(0).cast("bigint"),
                     lambda acc, v: (acc + F.pmod(v, F.lit(MOD))) % F.lit(MOD))
    return docs.select("doc_id", fp.alias("fingerprint"))
