"""edit_distance_pairs: exact recall vs brute-force levenshtein,
insert/delete/substitute cases, empty strings, unsupported k."""

import itertools

import pytest

from uckg_spark.operators.editdist import edit_distance_pairs


def lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def brute_py(names):
    return {
        (i, j): lev(a, b)
        for (i, a), (j, b) in itertools.combinations(enumerate(names), 2)
        if lev(a, b) <= 1
    }


def _df(spark, names):
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "id long, name string")


class TestEditDistancePairs:
    def test_exact_recall_on_random_names(self, spark):
        import random

        rng = random.Random(53)
        base = ["".join(rng.choice("abcd") for _ in range(rng.randrange(3, 8)))
                for _ in range(30)]
        # seed near-dups of all three edit kinds
        names = base + [base[0][1:], base[1] + "x",
                        "z" + base[2][1:], base[3]]
        got = {(r["id_a"], r["id_b"]): r["dist"]
               for r in edit_distance_pairs(
                   _df(spark, names), "name", "id").collect()}
        assert got == brute_py(names)

    def test_each_edit_kind_found(self, spark):
        names = ["gear", "gea", "gearx", "bear", "zzzz"]
        got = {(r["id_a"], r["id_b"]): r["dist"]
               for r in edit_distance_pairs(
                   _df(spark, names), "name", "id").collect()}
        # (1,2): "gea" vs "gearx" is distance 2 — must NOT appear even
        # though the two share a deletion signature (verify filters it)
        assert got == {(0, 1): 1, (0, 2): 1, (0, 3): 1}

    def test_empty_and_single_char(self, spark):
        names = ["", "a", "b", "ab"]
        got = {(r["id_a"], r["id_b"]): r["dist"]
               for r in edit_distance_pairs(
                   _df(spark, names), "name", "id").collect()}
        assert got == brute_py(names)

    def test_unsupported_k_raises(self, spark):
        with pytest.raises(ValueError):
            edit_distance_pairs(_df(spark, ["a"]), "name", "id", max_dist=2)


class TestErCanonicalNames:
    def test_clusters_and_canonical_min(self, spark):
        from uckg_spark.operators.editdist import er_canonical_names

        # cluster 1: gear/gea/bear chained by single edits;
        # cluster 2: zz/z; singleton: unrelated
        names = ["gear", "gea", "bear", "zz", "z", "unrelated"]
        df = spark.createDataFrame([(n,) for n in names], "name string")
        got = {(r["member"], r["canonical"])
               for r in er_canonical_names(df, "name").collect()}
        assert got == {
            ("gear", "bear"), ("gea", "bear"), ("bear", "bear"),
            ("zz", "z"), ("z", "z"),
        }

    def test_duplicate_rows_collapse_first(self, spark):
        from uckg_spark.operators.editdist import er_canonical_names

        df = spark.createDataFrame(
            [("ab",), ("ab",), ("ac",)], "name string")
        got = {(r["member"], r["canonical"])
               for r in er_canonical_names(df, "name").collect()}
        assert got == {("ab", "ab"), ("ac", "ab")}
