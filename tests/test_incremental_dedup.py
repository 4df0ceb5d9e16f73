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
