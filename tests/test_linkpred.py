"""link_prediction (plans/graphalgs.py): exact scores vs a brute-force
Python oracle, super-node cap semantics, and determinism of the top-k
set under repartitioning."""

from itertools import combinations

import pytest

from uckg_spark.plans.graphalgs import link_prediction

# bipartite (node, hub) fixture: c1/c2 share h1,h2; c2/c3 share h2;
# c4 only touches the mega-hub h9 (degree 5 — capped at max_hub_degree=4)
EDGES = [
    ("c1", "h1"), ("c1", "h2"),
    ("c2", "h1"), ("c2", "h2"), ("c2", "h3"),
    ("c3", "h2"), ("c3", "h3"),
    ("c1", "h9"), ("c2", "h9"), ("c3", "h9"), ("c4", "h9"), ("c5", "h9"),
    ("c1", "h1"),  # duplicate edge: must collapse (set semantics)
]


def _brute(edges, cap):
    hubs = {}
    for n, h in set(edges):
        hubs.setdefault(h, set()).add(n)
    kept = {h: ns for h, ns in hubs.items() if len(ns) <= cap}
    nbr = {}
    for h, ns in kept.items():
        for n in ns:
            nbr.setdefault(n, set()).add(h)
    out = {}
    for a, b in combinations(sorted(nbr), 2):
        common = nbr[a] & nbr[b]
        if common:
            ra = sum(1_000_000 // len(kept[h]) for h in common)
            out[(a, b)] = (
                len(common), len(common),
                len(nbr[a]) + len(nbr[b]) - len(common), ra)
    return out


def _run(spark, edges, cap=4, k=100, parts=1):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = link_prediction(df.repartition(parts), max_hub_degree=cap, k=k)
    return {(r["a"], r["b"]): (r["cn"], r["jacc_num"], r["jacc_den"], r["ra_e6"])
            for r in got.collect()}


def test_matches_brute_force_with_hub_cap(spark):
    got = _run(spark, EDGES)
    want = _brute(EDGES, cap=4)
    assert got == want
    # the mega-hub h9 generated no pairs: c4/c5 appear nowhere
    assert not any("c4" in p or "c5" in p for p in got)
    # spot-check one exact score: c1–c2 share h1 (deg 2) + h2 (deg 3)
    assert got[("c1", "c2")] == (2, 2, 2 + 3 - 2, 500_000 + 333_333)


def test_topk_cut_is_deterministic_across_partitioning(spark):
    # many tied-cn pairs: the (cn, ra_e6, a, b) total order must pick
    # the same k regardless of how the input was sharded
    edges = [(f"c{i}", f"h{i // 2}") for i in range(40)] + \
            [(f"c{i}", "hx") for i in range(0, 40, 3)]
    a = _run(spark, edges, cap=64, k=5, parts=1)
    b = _run(spark, edges, cap=64, k=5, parts=7)
    assert a == b and len(a) == 5


def test_degrees_computed_on_capped_graph(spark):
    # c1's degree must NOT count the capped hub h9: jacc_den for
    # (c1, c3) is deg(c1)+deg(c3)-cn computed post-cap
    got = _run(spark, EDGES)
    cn, _, den, _ = got[("c1", "c3")]
    assert (cn, den) == (1, 2 + 2 - 1)  # h2 shared; both degs 2 post-cap


def test_rejects_degenerate_cap(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(ValueError):
        link_prediction(df, max_hub_degree=1)
