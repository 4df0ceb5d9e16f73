"""jobs/build_index.py end-to-end: chunks + inverted index + LSH index
land in one snapshot catalog; BM25 query retrieves the planted chunk;
a rebuild leaves the old index time-travelable."""

import sys

sys.path.insert(0, ".")

from jobs.build_index import CHUNKS_PER_DOC_CAP, query, run  # noqa: E402


def _write_docs(spark, tmp_path, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    path = str(tmp_path / "docs")
    df.write.mode("overwrite").parquet(path)
    return path


def test_index_build_and_query(spark, tmp_path):
    filler = " ".join(f"w{i}" for i in range(30))
    texts = [filler] * 8 + [filler + " zebra quagga zebra"]
    docs_path = _write_docs(spark, tmp_path, texts)
    out = str(tmp_path / "idx")

    summary = run(spark, docs_path, out, chunk_size=16, stride=12)
    assert summary["docs"] == 9
    assert summary["chunks"] > 9  # overlapping windows multiply units
    assert summary["index_terms"] > 30
    assert set(summary["snapshots"]) == {
        "chunks", "inverted_index", "lsh_index"}

    hits = query(spark, out, ("zebra", "quagga"), top_k=3).collect()
    assert hits
    # the top hit is a chunk of the planted doc 8
    assert hits[0]["id"] // CHUNKS_PER_DOC_CAP == 8
    assert hits[0]["score_e6"] > 0

    # the lsh_index serves incremental dedup directly
    from uckg_spark.operators.dedup import incremental_near_dup_pairs
    from uckg_spark.sources.catalog import GraphCatalog

    idx = GraphCatalog(out).read_table(spark, "lsh_index")
    batch = spark.createDataFrame([(100, filler)], "doc_id long, text string")
    pairs = {tuple(r) for r in incremental_near_dup_pairs(
        batch, base_banded=idx).collect()}
    # exact dup of every filler doc is guaranteed; doc 8 (filler plus a
    # 3-token tail) may legitimately share a band too
    assert pairs >= {(i, 100) for i in range(8)}
    assert pairs <= {(i, 100) for i in range(9)}


def test_rebuild_keeps_old_snapshot_queryable(spark, tmp_path):
    docs_path = _write_docs(spark, tmp_path, ["alpha beta gamma"])
    out = str(tmp_path / "idx")
    s1 = run(spark, docs_path, out)["snapshots"]["chunks"]
    _write_docs(spark, tmp_path, ["delta epsilon zeta"])
    run(spark, docs_path, out)
    # head serves the new corpus; the old snapshot still answers
    assert query(spark, out, ("delta",), top_k=1).collect()
    old = query(spark, out, ("alpha",), top_k=1, snapshot_id=s1).collect()
    assert old and old[0]["score_e6"] > 0
