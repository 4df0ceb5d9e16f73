"""spark-submit entrypoint: documents → snapshot-cataloged RETRIEVAL
INDEX — the serving-side twin of jobs/curate_corpus.py (that job feeds
the trainer; this one feeds RAG retrieval over the same corpus).

  spark-submit --py-files uckg_spark.zip jobs/build_index.py \\
      --docs /data/documents_parquet --out /data/retrieval_index \\
      [--chunk-size 64] [--stride 48] [--min-df 1] [--max-df N] \\
      [--num-hashes 4] [--bands 2]

Builds, into one ``GraphCatalog`` (so every artifact is snapshot-
versioned, time-travelable, and OCC-committed):

  chunks          sliding-window retrieval units (operators/corpus.py::
                  sliding_chunks — zero-shuffle), with a synthetic
                  ``chunk_uid = doc_id·1e6 + chunk_idx`` (documents are
                  capped at 1e6 chunks — fail-fast guarded)
  inverted_index  token → (df, sorted postings of chunk_uid) with
                  df gates applied inside the aggregation
  lsh_index       banded MinHash signatures of the SOURCE documents —
                  the pre-built index ``incremental_near_dup_pairs``
                  joins each ingest batch against, so dedup-on-ingest
                  never rescans the corpus

``query()`` answers a bag-of-terms query with exact fixed-point BM25
over the cataloged chunks — what a serving layer calls per request.
``run()`` returns the summary dict; ``main()`` prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

CHUNKS_PER_DOC_CAP = 1_000_000


def run(
    spark,
    docs_path: str,
    out_path: str,
    chunk_size: int = 64,
    stride: int = 48,
    min_df: int = 1,
    max_df: int | None = None,
    num_hashes: int = 4,
    bands: int = 2,
) -> dict:
    from pyspark.sql import functions as F

    from uckg_spark.operators.corpus import sliding_chunks
    from uckg_spark.operators.dedup import (
        banded_signatures,
        minhash_signatures,
    )
    from uckg_spark.operators.invindex import build_inverted_index
    from uckg_spark.sources.catalog import GraphCatalog

    t0 = time.time()
    docs = spark.read.parquet(docs_path)
    cat = GraphCatalog(out_path)

    chunks = sliding_chunks(
        docs, chunk_size=chunk_size, stride=stride
    ).select(
        # fail fast on the uid packing cap instead of silently colliding
        (F.col("doc_id") * CHUNKS_PER_DOC_CAP
         + F.when(F.col("chunk_idx") < CHUNKS_PER_DOC_CAP, F.col("chunk_idx"))
         .otherwise(F.raise_error(F.lit(
             "chunk_idx exceeds the uid packing cap")).cast("bigint"))
         ).alias("chunk_uid"),
        "doc_id", "chunk_idx", "n_tokens", "text_chunk",
    ).persist()
    s_chunks = cat.write_table("chunks", chunks)

    inv = build_inverted_index(
        chunks, "text_chunk", "chunk_uid", min_df=min_df, max_df=max_df)
    s_inv = cat.write_table("inverted_index", inv)

    lsh = banded_signatures(
        minhash_signatures(docs, num_hashes=num_hashes), num_hashes, bands)
    s_lsh = cat.write_table("lsh_index", lsh)

    n_docs = docs.count()
    n_chunks = chunks.count()
    chunks.unpersist()
    return {
        "docs": n_docs,
        "chunks": n_chunks,
        "index_terms": cat.read_table(spark, "inverted_index").count(),
        "snapshots": {"chunks": s_chunks, "inverted_index": s_inv,
                      "lsh_index": s_lsh},
        "wall_s": round(time.time() - t0, 1),
        "catalog": out_path,
    }


def query(spark, out_path: str, terms: tuple[str, ...], top_k: int = 10,
          snapshot_id: str | None = None):
    """Bag-of-terms BM25 lookup over the cataloged chunks; pass
    ``snapshot_id`` to query a historical index version (time travel).
    Returns (chunk_uid→``id``, score_e6) ranked (score desc, id)."""
    from uckg_spark.operators.search import bm25_rank
    from uckg_spark.sources.catalog import GraphCatalog

    chunks = GraphCatalog(out_path).read_table(
        spark, "chunks", snapshot_id=snapshot_id)
    return bm25_rank(chunks, "text_chunk", "chunk_uid", terms, top_k=top_k)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents parquet path")
    ap.add_argument("--out", required=True, help="index catalog root")
    ap.add_argument("--chunk-size", type=int, default=64)
    ap.add_argument("--stride", type=int, default=48)
    ap.add_argument("--min-df", type=int, default=1)
    ap.add_argument("--max-df", type=int, default=None)
    ap.add_argument("--num-hashes", type=int, default=4)
    ap.add_argument("--bands", type=int, default=2)
    args = ap.parse_args()

    from uckg_spark.session import build_session

    spark = build_session(app_name="uckg-build-index")
    print(json.dumps(run(
        spark, args.docs, args.out,
        chunk_size=args.chunk_size, stride=args.stride,
        min_df=args.min_df, max_df=args.max_df,
        num_hashes=args.num_hashes, bands=args.bands,
    )))


if __name__ == "__main__":
    main()
