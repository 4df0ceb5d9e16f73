"""hits_fixed (plans/graphalgs.py): hand-unrolled two-iteration values
on a hub/authority fixture, zero for dangling directions, and
multigraph edge collapse."""

import pytest

from uckg_spark.plans.graphalgs import hits_fixed

E6 = 1_000_000

# h1 and h2 are pure hubs pointing at authorities a1 (both) and a2 (h1)
EDGES = [("h1", "r", "a1"), ("h2", "r", "a1"), ("h1", "r", "a2"),
         ("h1", "r", "a1")]  # duplicate edge must collapse


def _run(spark, iterations):
    df = spark.createDataFrame(EDGES, "subj string, pred string, obj string")
    got = hits_fixed(df, iterations=iterations)
    return {r["node"]: (r["auth"], r["hub"]) for r in got.collect()}


def test_two_iterations_hand_unrolled(spark):
    # a1: h0+h0=2e6 -> h1(h1)=3e6, h1(h2)=2e6 -> a2(a1)=5e6, a2(a2)=3e6
    # -> h2(h1)=8e6, h2(h2)=5e6
    got = _run(spark, iterations=2)
    assert got == {
        "h1": (0, 8 * E6),
        "h2": (0, 5 * E6),
        "a1": (5 * E6, 0),
        "a2": (3 * E6, 0),
    }


def test_one_iteration_is_degree_seeded(spark):
    got = _run(spark, iterations=1)
    # a_1 = indeg * 1e6; h_1 = sum of pointed-at auths
    assert got["a1"] == (2 * E6, 0)
    assert got["a2"] == (1 * E6, 0)
    assert got["h1"] == (0, 3 * E6)
    assert got["h2"] == (0, 2 * E6)


def test_rejects_zero_iterations(spark):
    df = spark.createDataFrame(EDGES, "subj string, pred string, obj string")
    with pytest.raises(ValueError):
        hits_fixed(df, iterations=0)
