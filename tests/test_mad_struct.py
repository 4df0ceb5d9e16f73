"""mad_outliers (operators/outliers.py) and the structural node-sketch
family (plans/graphalgs.py)."""

from uckg_spark.operators.outliers import mad_outliers
from uckg_spark.plans.graphalgs import node_neighbor_minhash, structural_groups


def _mad(spark, vals, k=3):
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)],
        "id long, grp string, v long")
    got = {r["id"]: (r["dev"], r["mad"], r["is_outlier"])
           for r in mad_outliers(df, "v", "grp", "id", k=k).collect()}
    return got


def test_mad_zero_flags_any_deviation(spark):
    got = _mad(spark, [1, 1, 1, 1, 100])
    # median 1, MAD 0: the single deviant is flagged, the rest are not
    assert got[4] == (99, 0, True)
    for i in range(4):
        assert got[i] == (0, 0, False)


def test_mad_hand_checked_thresholds(spark):
    got = _mad(spark, [10, 20, 30, 100], k=3)
    # sorted [10,20,30,100]: disc median (cle·2 >= 4) = 20
    # devs [10,0,10,80] -> sorted [0,10,10,80] -> MAD = 10; gate 3·10
    assert got[3] == (80, 10, True)
    assert got[0] == (10, 10, False)


def test_mad_survives_extreme_contamination(spark):
    # 40% wild values: the mean/stddev gate would inflate and miss
    # them; median/MAD still centers on the majority
    vals = [50, 51, 52, 49, 48, 47, 10_000, 20_000, 30_000, 40_000]
    got = _mad(spark, vals, k=5)
    flagged = {i for i, (_, _, f) in got.items() if f}
    assert flagged == {6, 7, 8, 9}


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string")


def test_structural_groups_collide_same_neighborhoods(spark):
    e = _edges(spark, [
        ("o1", "r", "c1"), ("o2", "r", "c1"), ("o3", "r", "c2"),
        ("c1", "r", "n1"), ("c2", "r", "n1"),
    ])
    # 8 hashes: at 4, this fixture demonstrated the inherent MinHash
    # superset collision ({c1} vs {c1,c2} agree with prob ~2^-k — why
    # the docstring mandates exact verification of candidates)
    groups = structural_groups(e, num_hashes=8)
    got = [(r["n_nodes"], r["rep"]) for r in groups.collect()]
    # exactly one structural group: the two orders whose whole
    # neighborhood is {c1}
    assert got == [(2, "o1")]


def test_signatures_are_neighbor_set_functions(spark):
    # direction and duplicate edges must not matter: the signature is a
    # function of the undirected neighbor SET
    a = node_neighbor_minhash(_edges(spark, [("x", "r", "y")]))
    b = node_neighbor_minhash(
        _edges(spark, [("y", "r", "x"), ("x", "r", "y")]))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_structural_pairs_expose_false_candidates(spark):
    from uckg_spark.plans.graphalgs import structural_pairs

    e = _edges(spark, [
        ("o1", "r", "c1"), ("o2", "r", "c1"), ("o3", "r", "c2"),
        ("c1", "r", "n1"), ("c2", "r", "n1"),
    ])
    # at k=4 this fixture's sketch groups {o1, o2, n1} (the superset
    # collision) — the verify stage must EXPOSE n1 as a false
    # candidate (inter < uni) while confirming the true pair exactly
    got = {(r["node_a"], r["node_b"]): (r["inter"], r["uni"])
           for r in structural_pairs(e, num_hashes=4).collect()}
    assert got[("o1", "o2")] == (1, 1)          # true duplicates: N = {c1}
    for pair, (inter, uni) in got.items():
        if "n1" in pair:
            assert inter < uni                   # exposed, not merged


def test_structural_pairs_skip_giant_groups(spark):
    from uckg_spark.plans.graphalgs import structural_pairs

    rows = [(f"o{i}", "r", "hub") for i in range(12)]
    e = _edges(spark, rows)
    # all 12 orders share neighborhood {hub}: one structural group of
    # 12 > max_group_size 8 — skipped, so no pairwise blow-up
    assert structural_pairs(e, num_hashes=4, max_group_size=8).count() == 0
