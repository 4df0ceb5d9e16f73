"""jobs/curate_corpus.py end-to-end: curation gates compose with the
split and the chunk writer; no token from a non-train split reaches the
vocab; outputs partition by split."""

import sys

sys.path.insert(0, ".")

from jobs.curate_corpus import parse_weights, run  # noqa: E402


def test_parse_weights():
    assert parse_weights("train=98,valid=1,test=1") == {
        "train": 98, "valid": 1, "test": 1}


def test_job_end_to_end(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs_path = str(tmp_path / "docs")
    docs.write.parquet(docs_path)
    out = str(tmp_path / "corpus_out")

    summary = run(
        spark, docs_path, out,
        budget=256, vocab_size=64,
        weights={"train": 8, "valid": 1, "test": 1},
    )
    assert summary["docs_in"] == 500
    # gates are non-vacuous on this fixture and every split got chunks
    assert 0 < summary["docs_kept"] < 500
    assert set(summary["chunks"]) <= {"train", "valid", "test"}
    assert sum(summary["chunks"].values()) > 0

    corpus = spark.read.parquet(summary["corpus"])
    chunks = spark.read.parquet(summary["chunks_path"])
    # split rides as a partition column on both outputs
    assert "split" in corpus.columns and "split" in chunks.columns
    # every curated doc got a split, none invented
    assert corpus.count() == summary["docs_kept"]
    assert {r["split"] for r in corpus.select("split").distinct().collect()
            } <= {"train", "valid", "test"}

    # determinism: re-running into a fresh dir reproduces the summary
    again = run(
        spark, docs_path, str(tmp_path / "corpus_out2"),
        budget=256, vocab_size=64,
        weights={"train": 8, "valid": 1, "test": 1},
    )
    assert again["docs_kept"] == summary["docs_kept"]
    assert again["chunks"] == summary["chunks"]
    assert again["vocab_size"] == summary["vocab_size"]
