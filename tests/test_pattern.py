"""Graph-pattern matching + degree stats (plans/pattern.py)."""

import pytest

from uckg_spark.plans.pattern import degree_stats, match_pattern


def _edges(spark):
    rows = [
        ("a", "knows", "b"),
        ("b", "knows", "c"),
        ("a", "knows", "c"),
        ("c", "likes", "c"),       # self-loop
        ("a", "knows", "b"),       # duplicate edge
        ("d", "in", "g1"),
        ("b", "in", "g1"),
    ]
    return spark.createDataFrame(rows, ["subj", "pred", "obj"])


class TestMatchPattern:
    def test_single_step_constant_pred(self, spark):
        got = {(r["x"], r["y"]) for r in
               match_pattern(_edges(spark), [("?x", "knows", "?y")]).collect()}
        assert got == {("a", "b"), ("b", "c"), ("a", "c")}

    def test_two_hop_join(self, spark):
        got = {(r["x"], r["y"], r["z"]) for r in match_pattern(
            _edges(spark),
            [("?x", "knows", "?y"), ("?y", "knows", "?z")]).collect()}
        assert got == {("a", "b", "c")}

    def test_constant_object_binds(self, spark):
        got = {r["m"] for r in match_pattern(
            _edges(spark), [("?m", "in", "g1")]).collect()}
        assert got == {"d", "b"}

    def test_repeated_var_in_one_step_means_equality(self, spark):
        got = {r["x"] for r in match_pattern(
            _edges(spark), [("?x", "likes", "?x")]).collect()}
        assert got == {"c"}

    def test_duplicate_edges_do_not_multiply(self, spark):
        rows = match_pattern(
            _edges(spark),
            [("?x", "knows", "?y"), ("?y", "in", "g1")]).collect()
        assert sorted((r["x"], r["y"]) for r in rows) == [("a", "b")]

    def test_variable_predicate(self, spark):
        got = {(r["p"],) for r in match_pattern(
            _edges(spark), [("c", "?p", "c")]).collect()}
        assert got == {("likes",)}

    def test_disconnected_pattern_raises(self, spark):
        with pytest.raises(ValueError, match="cartesian"):
            match_pattern(
                _edges(spark),
                [("?x", "knows", "?y"), ("?a", "in", "?b")])

    def test_no_variable_step_raises(self, spark):
        with pytest.raises(ValueError, match="binds no variable"):
            match_pattern(_edges(spark), [("a", "knows", "b")])

    def test_empty_pattern_raises(self, spark):
        with pytest.raises(ValueError, match="empty"):
            match_pattern(_edges(spark), [])


class TestDegreeStats:
    def test_hand_computed(self, spark):
        got = {r["node"]: (r["out_degree"], r["in_degree"], r["n_predicates"])
               for r in degree_stats(_edges(spark)).collect()}
        # duplicate (a,knows,b) counts twice in degrees (edge-table rows),
        # c's self-loop counts one out and one in
        assert got["a"] == (3, 0, 1)
        assert got["b"] == (2, 2, 2)
        assert got["c"] == (1, 3, 2)
        assert got["g1"] == (0, 2, 1)
        assert got["d"] == (1, 0, 1)
