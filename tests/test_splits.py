"""dataset_split: assignments match a hashlib reference, are invariant
to partitioning (the randomSplit failure mode), and plan shuffle-free."""

import hashlib

import pytest

from uckg_spark.operators.splits import dataset_split


def split_py(ids, weights, salt=""):
    total = sum(weights.values())
    out = {}
    for i in ids:
        b = int(hashlib.md5((salt + str(i)).encode()).hexdigest()[:8], 16)
        b %= total
        edge = 0
        for name, w in weights.items():
            edge += w
            if b < edge:
                out[i] = name
                break
    return out


def _df(spark, ids, parts=4):
    return spark.createDataFrame(
        [(i,) for i in ids], "doc_id long").repartition(parts)


class TestDatasetSplit:
    def test_matches_hashlib_reference(self, spark):
        ids = list(range(300))
        w = {"train": 8, "valid": 1, "test": 1}
        got = {r["doc_id"]: r["split"]
               for r in dataset_split(_df(spark, ids), "doc_id", w).collect()}
        assert got == split_py(ids, w)
        # every split non-empty at this size (sanity on the ranging)
        assert set(got.values()) == {"train", "valid", "test"}

    def test_partitioning_invariant(self, spark):
        ids = list(range(100))
        a = {r["doc_id"]: r["split"] for r in dataset_split(
            _df(spark, ids, parts=1), "doc_id").collect()}
        b = {r["doc_id"]: r["split"] for r in dataset_split(
            _df(spark, ids, parts=16), "doc_id").collect()}
        assert a == b

    def test_growing_corpus_never_reassigns(self, spark):
        w = {"train": 3, "valid": 1}
        small = {r["doc_id"]: r["split"] for r in dataset_split(
            _df(spark, range(50)), "doc_id", w).collect()}
        grown = {r["doc_id"]: r["split"] for r in dataset_split(
            _df(spark, range(200)), "doc_id", w).collect()}
        assert all(grown[i] == s for i, s in small.items())

    def test_salt_rerolls(self, spark):
        ids = list(range(200))
        w = {"a": 1, "b": 1}
        base = {r["doc_id"]: r["split"] for r in dataset_split(
            _df(spark, ids), "doc_id", w).collect()}
        salted = {r["doc_id"]: r["split"] for r in dataset_split(
            _df(spark, ids), "doc_id", w, salt="exp2").collect()}
        assert base != salted
        assert salted == split_py(ids, w, salt="exp2")

    def test_invalid_weights_raise(self, spark):
        df = _df(spark, [1])
        with pytest.raises(ValueError):
            dataset_split(df, "doc_id", {})
        with pytest.raises(ValueError):
            dataset_split(df, "doc_id", {"train": 0, "test": 1})
        with pytest.raises(ValueError):
            dataset_split(df, "doc_id", {"train": 0.9})

    def test_shuffle_free_plan(self, spark):
        plan = (
            dataset_split(spark.range(10), "id")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
