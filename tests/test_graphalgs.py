"""pagerank_fixed — cross-checked against a pure-Python reference of the
same integer recurrence, plus semantic edge cases."""

import random

from pyspark.sql import functions as F

from uckg_spark.plans.graphalgs import pagerank_fixed


def pagerank_py(edges: list[tuple[str, str]], iterations: int) -> dict[str, int]:
    """The exact integer recurrence, driver-side."""
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    outdeg: dict[str, int] = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {n: 1_000_000 for n in nodes}
    for _ in range(iterations):
        incoming = {n: 0 for n in nodes}
        for s, d in e:
            incoming[d] += rank[s] // outdeg[s]
        rank = {n: 150_000 + (85 * incoming[n]) // 100 for n in nodes}
    return rank


def _df(spark, edges):
    return spark.createDataFrame(
        [(s, "rel", d) for s, d in edges], ["subj", "pred", "obj"]
    )


class TestPagerankFixed:
    def test_random_graph_matches_reference(self, spark):
        rng = random.Random(42)
        nodes = [f"n{i}" for i in range(40)]
        edges = list({
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(160)
        })
        got = {
            r["node"]: r["rank"]
            for r in pagerank_fixed(_df(spark, edges), iterations=4).collect()
        }
        assert got == pagerank_py(edges, 4)

    def test_multigraph_collapses_to_set(self, spark):
        # duplicate (s, d) pairs across predicates count once
        df = spark.createDataFrame(
            [("a", "p1", "b"), ("a", "p2", "b"), ("b", "p1", "a")],
            ["subj", "pred", "obj"],
        )
        got = {r["node"]: r["rank"]
               for r in pagerank_fixed(df, iterations=3).collect()}
        assert got == pagerank_py([("a", "b"), ("b", "a")], 3)

    def test_dangling_node_keeps_teleport_only(self, spark):
        # c has no out-edges; nothing flows FROM it, but it still ranks
        edges = [("a", "b"), ("b", "c")]
        got = {r["node"]: r["rank"]
               for r in pagerank_fixed(_df(spark, edges), iterations=1).collect()}
        assert got == pagerank_py(edges, 1)
        # after one step: b and c each receive a's/b's full share
        assert got["a"] == 150_000
        assert got["b"] == 150_000 + (85 * 1_000_000) // 100

    def test_zero_iterations_is_uniform(self, spark):
        got = pagerank_fixed(_df(spark, [("a", "b")]), iterations=0)
        assert {tuple(r) for r in got.collect()} == {
            ("a", 1_000_000), ("b", 1_000_000)}

    def test_symmetric_nodes_rank_equal(self, spark):
        # a 4-cycle is vertex-transitive: every node must rank identically
        edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
        ranks = {r["rank"]
                 for r in pagerank_fixed(_df(spark, edges), iterations=5).collect()}
        assert len(ranks) == 1

    def test_hub_outranks_leaves(self, spark):
        # star pointing at h: h must outrank every leaf
        edges = [(f"l{i}", "h") for i in range(5)]
        got = {r["node"]: r["rank"]
               for r in pagerank_fixed(_df(spark, edges), iterations=3).collect()}
        assert all(got["h"] > got[f"l{i}"] for i in range(5))
