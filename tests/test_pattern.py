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


class TestPatternOnBuiltKg:
    """End-to-end: Cypher-style pattern queries over the KG the pipeline
    actually builds from fixture pages, cross-checked against a Python
    evaluation of the collected edge set."""

    def test_two_hop_on_real_edges(self, spark, fixture_pages, kg_dims):
        from uckg_spark.plans.kg_pipeline import build_triples, materialize_graph
        from uckg_spark.sources.pages import pages_df

        triples = build_triples(
            spark, pages_df(spark, fixture_pages[:40]), kg_dims).persist()
        try:
            _, edges = materialize_graph(triples)
            edges = edges.persist()
            erows = [(r["subj"], r["pred"], r["obj"]) for r in edges.collect()]
            assert erows, "fixture KG built no edges"

            # pick the predicate pair with the largest real 2-hop join
            by_pred_so = {}
            for s, p, o in erows:
                by_pred_so.setdefault(p, set()).add((s, o))
            best = None
            for p1, so1 in by_pred_so.items():
                for p2, so2 in by_pred_so.items():
                    hop = {(s, m, o2) for s, m in so1 for m2, o2 in so2
                           if m2 == m}
                    if hop and (best is None or len(hop) > len(best[2])):
                        best = (p1, p2, hop)
            assert best, "fixture KG has no joinable predicate pair"
            p1, p2, want = best

            got = {(r["a"], r["b"], r["c"]) for r in match_pattern(
                edges, [("?a", p1, "?b"), ("?b", p2, "?c")]).collect()}
            assert got == want

            # degree stats agree with the collected edge multiset
            from collections import Counter
            out_c = Counter(s for s, _, _ in erows)
            in_c = Counter(o for _, _, o in erows)
            stats = {r["node"]: (r["out_degree"], r["in_degree"])
                     for r in degree_stats(edges).collect()}
            for node, (od, ind) in stats.items():
                assert od == out_c.get(node, 0) and ind == in_c.get(node, 0)
        finally:
            triples.unpersist()
            edges.unpersist()


class TestParsePattern:
    def test_parse_and_query_equal_list_form(self, spark):
        from uckg_spark.plans.pattern import (match_pattern, parse_pattern,
                                              query_pattern)

        edges = spark.createDataFrame(
            [("a", "knows", "b"), ("b", "knows", "c"), ("b", "likes", "c")],
            "subj string, pred string, obj string")
        text = "?x knows ?y . ?y likes ?z"
        assert parse_pattern(text) == [
            ("?x", "knows", "?y"), ("?y", "likes", "?z")]
        got = {(r["x"], r["y"], r["z"])
               for r in query_pattern(edges, text).collect()}
        want = {(r["x"], r["y"], r["z"])
                for r in match_pattern(edges, parse_pattern(text)).collect()}
        assert got == want == {("a", "b", "c")}

    def test_trailing_dot_ok(self):
        from uckg_spark.plans.pattern import parse_pattern

        assert parse_pattern("?x p ?y .") == [("?x", "p", "?y")]

    def test_malformed_raises(self):
        import pytest

        from uckg_spark.plans.pattern import parse_pattern

        for bad in ("", "?x p", "?x p ?y ?z", "?x p ?y . . ?a q ?b"):
            with pytest.raises(ValueError):
                parse_pattern(bad)
