"""Streaming dedup-on-ingest (streaming/pages_stream.py::
run_dedup_ingest): after streaming the corpus in ANY batching, the
maintained pair table equals the full-corpus batch recompute; replays
change nothing."""

from uckg_spark.operators.dedup import minhash_lsh_pairs
from uckg_spark.sources.catalog import GraphCatalog
from uckg_spark.streaming.pages_stream import dedup_ingest_sink, run_dedup_ingest


def _texts():
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    out = {}
    for i in range(30):
        words = base.split()
        if i % 4 == 0:
            words[i % 10] = f"x{i}"      # near-dup family
        elif i % 3 == 0:
            words = [f"w{i}_{j}" for j in range(10)]  # unique
        out[i] = " ".join(words)
    return out


def _full_pairs(spark, texts):
    df = spark.createDataFrame(sorted(texts.items()),
                               "doc_id long, text string")
    return {(r["doc_a"], r["doc_b"]) for r in
            minhash_lsh_pairs(df, num_hashes=4, bands=2).collect()}


def _pairs_table(spark, root):
    return {(r["doc_a"], r["doc_b"]) for r in
            GraphCatalog(root).read_table(spark, "dup_pairs").collect()}


def test_streamed_pairs_equal_full_recompute(spark, tmp_path):
    texts = _texts()
    src = str(tmp_path / "docs_stream")
    # three uneven file-batches
    for lo, hi in ((0, 7), (7, 19), (19, 30)):
        spark.createDataFrame(
            [(i, texts[i]) for i in range(lo, hi)],
            "doc_id long, text string",
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    root = str(tmp_path / "cat")
    run_dedup_ingest(spark, stream, root, str(tmp_path / "ckpt"))

    want = _full_pairs(spark, texts)
    assert _pairs_table(spark, root) == want and len(want) > 0
    # the index covers the whole corpus (4 banded rows per doc at 2 bands)
    idx = GraphCatalog(root).read_table(spark, "lsh_index")
    assert idx.select("doc_id").distinct().count() == 30

    # rerunning the drained stream with the same checkpoint is a no-op
    run_dedup_ingest(
        spark,
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(src),
        root, str(tmp_path / "ckpt"))
    assert _pairs_table(spark, root) == want


def test_direct_replay_of_committed_batch_is_noop(spark, tmp_path):
    texts = _texts()
    root = str(tmp_path / "cat")
    cat = GraphCatalog(root)
    sink = dedup_ingest_sink(spark, cat)
    b0 = spark.createDataFrame(
        [(i, texts[i]) for i in range(15)], "doc_id long, text string")
    b1 = spark.createDataFrame(
        [(i, texts[i]) for i in range(15, 30)], "doc_id long, text string")
    sink(b0, 0)
    sink(b1, 1)
    want = _pairs_table(spark, root)
    n_idx = cat.read_table(spark, "lsh_index").count()
    sink(b1, 1)  # crash-replay of the last committed batch
    assert _pairs_table(spark, root) == want
    assert cat.read_table(spark, "lsh_index").count() == n_idx
    assert want == _full_pairs(spark, texts)
