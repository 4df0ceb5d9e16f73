"""Vocabulary induction and corpus encoding — the tokenizer-fitting step
of an LLM training pipeline, whitespace-token granularity (the documents
table's convention; a production run swaps the token column for BPE
pieces without touching the plan shape).

- build_vocab: global token frequencies → the top ``max_size`` tokens
  with deterministic ids (freq DESC, token ASC). The corpus-wide count
  is one explode + one map-side-combining shuffle on the token; the
  rank window runs AFTER a top-k limit, so the single-partition window
  sees at most ``max_size`` rows — vocab size is a constant independent
  of corpus size, which is what makes the one-reducer window safe at
  100 TB.
- encode_docs: map every document to its id sequence through a
  broadcast vocab join (vocab ≤ a few 100k rows ≈ MBs), OOV → 0.
  One explode, one broadcast hash join (no shuffle of the corpus side),
  one groupBy doc_id to reassemble order via array_sort on (pos, id)
  structs. Ids are emitted as a space-joined string so the cross-engine
  value hash is list-representation-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens


def build_vocab(
    docs: DataFrame,
    max_size: int = 1024,
    min_freq: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Top-``max_size`` tokens by (freq DESC, token ASC) with 1-based
    ``vocab_id``. Deterministic: ties break on the token string."""
    counts = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("freq"))
        .filter(F.col("freq") >= min_freq)
    )
    top = counts.orderBy(F.desc("freq"), F.asc("token")).limit(max_size)
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    return top.select(
        "token", "freq", F.row_number().over(w).cast("bigint").alias("vocab_id")
    )


def encode_docs(
    docs: DataFrame, vocab: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Encode each document as its vocab-id sequence (OOV → 0), order
    preserved. Returns ``doc_id, n_tokens, ids`` with ``ids`` the
    space-joined id string ('' for an empty doc)."""
    toks = docs.select(
        "doc_id", F.posexplode(tokens(F.col(text_col))).alias("pos", "token")
    )
    encoded = (
        toks.join(F.broadcast(vocab.select("token", "vocab_id")), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("pos"),
                        F.coalesce(F.col("vocab_id"), F.lit(0)).alias("vid"),
                    )
                )
            ).alias("seq")
        )
        .select(
            "doc_id",
            F.size(F.col("seq")).cast("bigint").alias("n_tokens"),
            F.concat_ws(
                " ", F.transform(F.col("seq"), lambda s: s["vid"].cast("string"))
            ).alias("ids"),
        )
    )
    # keep empty docs (posexplode drops them): '' sequence, 0 tokens
    return (
        docs.select("doc_id")
        .join(encoded, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce(F.col("ids"), F.lit("")).alias("ids"),
        )
    )
