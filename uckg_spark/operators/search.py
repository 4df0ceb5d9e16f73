"""Keyword search over the corpus — BM25 ranking in exact integer math.

The retrieval step of every data-curation loop ("find the documents
about X in 100 TB") is a BM25 ranker. Textbook BM25 is float-laden
(ln idf, fractional k1/b), which makes rankings engine- and
sum-order-dependent right where scores tie. This implementation keeps
the SAME ranking family but exact:

- idf is the odds ratio the log is usually wrapped around, kept as a
  rational: (N - df + 1/2) / (df + 1/2) → halves cleared →
  (2N - 2df + 1) / (2df + 1). Monotone in df exactly like log-idf, so
  per-term ordering is preserved (absolute scores are a different —
  steeper — scale, disclosed rather than hidden).
- k1 = 6/5 and b = 3/4 are exact rationals; multiplying the classic
  tf*(k1+1) / (tf + k1*(1-b) + k1*b*dl/avgdl) through by 10*S (where
  S = Σ dl, avgdl = S/N) gives 22*tf*S / (10*S*tf + 3*S + 9*dl*N) —
  pure integers.
- per-term contributions are floored to e6 fixed point and summed in
  the FIXED query-term order, so the total is bit-identical in any
  engine: score_e6 = Σ_t num_t*1e6 div den_t.

Overflow: num ≤ 2N * 22*tf*S * 1e6 — int64-safe through corpora of
~10^5 docs of ~10^2 tokens; past that cast the two products to
decimal(38,0) (DuckDB side is HUGEINT-ready), semantics unchanged.

Scale shape: tf/dl are per-row higher-order functions over one
materialized token array (no shuffle — and plan-checked: the tokenizer
runs once per scan branch, not once per term); the corpus stats are
ONE global aggregate broadcast back; top-k is TakeOrdered (no full
sort). The plan scans the corpus twice (stats branch + scoring
branch) — at 10^12 docs persist the 4-ints-per-doc ``base`` frame
between them, and put an inverted-index prefilter before the scorer so
only candidate docs are scored; the scorer is unchanged by both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens


def bm25_rank(
    df: DataFrame,
    text_col: str,
    id_col: str,
    terms: tuple[str, ...],
    top_k: int = 20,
) -> DataFrame:
    """Top-``top_k`` documents for the bag-of-terms query ``terms`` by
    exact fixed-point BM25: ``(id, score_e6)``, ranked by score then id.
    Terms must be plain tokens (the tokenizer's alphabet — no spaces or
    quotes); duplicates are rejected rather than double-counted."""
    if not terms:
        raise ValueError("terms must be non-empty")
    if len(set(terms)) != len(terms):
        raise ValueError(f"duplicate query terms: {terms}")
    for t in terms:
        if not t or any(ch in t for ch in " \t\n'\""):
            raise ValueError(f"not a plain token: {t!r}")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    toked = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks")
    )
    base = toked.select(
        "id",
        F.size("toks").cast("bigint").alias("dl"),
        *[
            F.size(F.filter("toks", lambda x: x == F.lit(t)))
            .cast("bigint")
            .alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = base.agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("s"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("bigint")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    per_term = [
        f"((2*n - 2*df{i} + 1) * 22 * tf{i} * s * 1000000)"
        f" div ((2*df{i} + 1) * (10*s*tf{i} + 3*s + 9*dl*n))"
        for i in range(len(terms))
    ]
    return (
        base.crossJoin(F.broadcast(stats))
        .select("id", F.expr(" + ".join(per_term)).alias("score_e6"))
        .orderBy(F.col("score_e6").desc(), "id")
        .limit(top_k)
    )
