"""spark-submit entrypoint: raw documents → curated, split, packed
training corpus — the training-data twin of jobs/build_kg.py.

  spark-submit --py-files uckg_spark.zip jobs/curate_corpus.py \\
      --docs /data/documents_parquet --out /data/training_corpus \\
      [--budget 2048] [--lang en] [--min-quality-e6 600000] \\
      [--max-dup-frac-e6 600000] [--vocab-size 32768] \\
      [--weights train=98,valid=1,test=1] [--salt exp1]

Stages, in the order a 100 TB job must run them (dedup before gates —
see operators/corpus.py::curate_corpus for why keeper choice depends
on it):

  1. curate   exact-dedup APPLY → language gate → quality floor →
              repetition ceiling (survivor-only scoring)
  2. split    reproducible hash-ranged train/valid/test on doc_id
              (partitioning/growth-invariant — eval stays eval forever)
  3. vocab    fit on the TRAIN split only (no eval leakage into ids)
  4. chunks   encode + pack fixed-budget training chunks per split

Output layout: ``<out>/corpus`` (curated docs with ``split`` column,
partitioned by split — a data loader prunes to its split at scan time)
and ``<out>/chunks`` (budget-packed token chunks, partitioned by
split). ``run()`` returns the summary dict; ``main()`` prints it as
one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def parse_weights(spec: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for part in spec.split(","):
        name, _, w = part.partition("=")
        out[name.strip()] = int(w)
    return out


def run(
    spark,
    docs_path: str,
    out_path: str,
    budget: int = 2048,
    lang: str = "en",
    min_quality_e6: int = 600_000,
    max_dup_frac_e6: int = 600_000,
    vocab_size: int = 32_768,
    weights: dict[str, int] | None = None,
    salt: str = "",
) -> dict:
    from pyspark.sql import functions as F

    from uckg_spark.operators.corpus import curate_corpus, training_chunks
    from uckg_spark.operators.splits import dataset_split
    from uckg_spark.operators.vocab import build_vocab

    if weights is None:
        weights = {"train": 98, "valid": 1, "test": 1}
    t0 = time.time()
    docs = spark.read.parquet(docs_path)

    kept = curate_corpus(
        docs,
        min_quality_e6=min_quality_e6,
        max_dup_frac_e6=max_dup_frac_e6,
        lang=lang,
    )
    # curate_corpus returns the kept ids + scores; re-attach payloads
    corpus = docs.join(kept.select("doc_id"), "doc_id", "inner")
    corpus = dataset_split(corpus, "doc_id", weights, salt=salt).persist()

    corpus_path = f"{out_path}/corpus"
    corpus.write.mode("overwrite").partitionBy("split").parquet(corpus_path)

    train = corpus.where(F.col("split") == "train")
    vocab = build_vocab(train, max_size=vocab_size)

    chunks_path = f"{out_path}/chunks"
    for i, split in enumerate(weights):
        ch = training_chunks(
            corpus.where(F.col("split") == split), vocab, budget=budget
        ).withColumn("split", F.lit(split))
        mode = "overwrite" if i == 0 else "append"
        ch.write.mode(mode).partitionBy("split").parquet(chunks_path)
    written = spark.read.parquet(chunks_path)
    chunk_counts = {
        r["split"]: r["n"]
        for r in written.groupBy("split").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    n_in = docs.count()
    n_kept = corpus.count()
    corpus.unpersist()
    return {
        "docs_in": n_in,
        "docs_kept": n_kept,
        "chunks": chunk_counts,
        "vocab_size": vocab.count(),
        "wall_s": round(time.time() - t0, 1),
        "corpus": corpus_path,
        "chunks_path": chunks_path,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents parquet path")
    ap.add_argument("--out", required=True, help="output corpus root")
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--lang", default="en")
    ap.add_argument("--min-quality-e6", type=int, default=600_000)
    ap.add_argument("--max-dup-frac-e6", type=int, default=600_000)
    ap.add_argument("--vocab-size", type=int, default=32_768)
    ap.add_argument("--weights", default="train=98,valid=1,test=1")
    ap.add_argument("--salt", default="")
    args = ap.parse_args()

    from uckg_spark.session import build_session

    spark = build_session(app_name="uckg-curate-corpus")
    print(json.dumps(run(
        spark, args.docs, args.out,
        budget=args.budget, lang=args.lang,
        min_quality_e6=args.min_quality_e6,
        max_dup_frac_e6=args.max_dup_frac_e6,
        vocab_size=args.vocab_size,
        weights=parse_weights(args.weights),
        salt=args.salt,
    )))


if __name__ == "__main__":
    main()
