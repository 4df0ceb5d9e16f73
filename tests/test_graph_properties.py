"""Randomized cross-checks of the graph operators against independent
pure-Python references (union-find / DFS closure). Complements the fixed
DuckDB oracles: random graphs exercise shapes (multi-component, cycles,
self-loops, isolated stars) the sf tables never produce.

Deterministic: graphs come from seeded ``random.Random`` — no flakiness,
no hypothesis shrinking time on a 4-core Spark session.
"""

import random

import pytest

from uckg_spark.operators.canonicalize import canonical_map, connected_components
from uckg_spark.operators.reasoning import transitive_closure


def _random_edges(seed, n_nodes=24, n_edges=30):
    rng = random.Random(seed)
    return [
        (f"n{rng.randrange(n_nodes)}", f"n{rng.randrange(n_nodes)}")
        for _ in range(n_edges)
    ]


def _uf_components(edges):
    """Union-find reference: node -> min node id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for a, b in edges:
        if a == b:
            continue  # operator drops self-loops (and their nodes if isolated)
        nodes.update((a, b))
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps = {}
    for x in nodes:
        comps.setdefault(find(x), []).append(x)
    return {x: min(members) for members in comps.values() for x in members}


class TestConnectedComponentsRandom:
    @pytest.mark.parametrize("seed", [1, 7, 42, 99, 1234])
    def test_matches_union_find(self, spark, seed):
        edges = _random_edges(seed)
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r["node"]: r["component"]
               for r in connected_components(df).collect()}
        assert got == _uf_components(edges)

    @pytest.mark.parametrize("seed", [5, 21, 77])
    def test_multi_round_contraction(self, spark, seed):
        """Force the residual-star loop across rounds: a tiny
        edges_per_partition budget splits a 200-edge graph over many
        union-find partitions, so nodes come back with several local reps
        and the contraction must iterate (the 100-TB code path — a single
        partition solving everything in round 1 never exercises it)."""
        rng = random.Random(seed)
        edges = [(f"n{rng.randrange(60)}", f"n{rng.randrange(60)}")
                 for _ in range(200)]
        df = spark.createDataFrame(edges, ["src", "dst"]).repartition(8)
        got = {r["node"]: r["component"]
               for r in connected_components(
                   df, edges_per_partition=20).collect()}
        assert got == _uf_components(edges)


def _py_closure(edges):
    """DFS reachability reference over the direct-edge DAG/graph."""
    adj = {}
    for c, p in edges:
        if c != p:
            adj.setdefault(c, set()).add(p)
    out = set()
    for start in adj:
        seen, stack = set(), list(adj[start])
        while stack:
            x = stack.pop()
            if x in seen:
                continue
            seen.add(x)
            stack.extend(adj.get(x, ()))
        out.update((start, a) for a in seen if a != start)
    return out


class TestTransitiveClosureRandom:
    @pytest.mark.parametrize("seed", [2, 11, 56])
    def test_matches_dfs_dag(self, spark, seed):
        # random DAG: edges only from lower to higher index (acyclic)
        rng = random.Random(seed)
        edges = []
        for _ in range(25):
            a, b = sorted(rng.sample(range(16), 2))
            edges.append((f"c{a}", f"c{b}"))
        df = spark.createDataFrame(edges, ["child", "parent"])
        got = {(r["descendant"], r["ancestor"])
               for r in transitive_closure(df).collect()}
        assert got == _py_closure(edges)

    def test_matches_dfs_cyclic(self, spark):
        # cycles allowed: reachability semantics still hold
        edges = [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a"), ("e", "e")]
        df = spark.createDataFrame(edges, ["child", "parent"])
        got = {(r["descendant"], r["ancestor"])
               for r in transitive_closure(df).collect()}
        assert got == _py_closure(edges)


class TestCanonicalMapRandom:
    @pytest.mark.parametrize("seed", [3, 17])
    def test_representative_rule(self, spark, seed):
        """canonical = min non-surface node of the component (surface keys
        only if a component somehow holds no canonical id)."""
        rng = random.Random(seed)
        rows = [(f"s{rng.randrange(12)}", f"ENT-{rng.randrange(8)}")
                for _ in range(20)]
        df = spark.createDataFrame(rows, ["surface_key", "canonical_id"])
        got = {r["member"]: r["canonical"]
               for r in canonical_map(df).collect()}
        comp = _uf_components(
            [(f"surface:{s}", e) for s, e in rows])
        want = {}
        by_label = {}
        for node, label in comp.items():
            by_label.setdefault(label, []).append(node)
        for members in by_label.values():
            ents = [m for m in members if not m.startswith("surface:")]
            rep = min(ents) if ents else min(members)
            for m in members:
                want[m] = rep
        assert got == want
