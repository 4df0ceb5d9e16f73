"""pareto_front_2d (operators/olap.py) vs brute-force dominance, and
label_spread (operators/similarity.py) on separable clusters."""

import math

from uckg_spark.operators.olap import pareto_front_2d
from uckg_spark.operators.similarity import label_spread


def _front_brute(pts):
    out = set()
    for i, (x, y) in pts.items():
        dominated = any(
            (bx >= x and by >= y and (bx > x or by > y))
            for j, (bx, by) in pts.items() if j != i)
        if not dominated:
            out.add((i, x, y))
    return out


def _front(spark, pts, parts=4):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in pts.items()],
        "id long, x long, y long").repartition(parts)
    got = pareto_front_2d(df, "x", "y", "id")
    return {tuple(r) for r in got.collect()}


def test_front_matches_brute_force(spark):
    pts = {i: ((i * 37) % 50, (i * 91) % 70) for i in range(120)}
    assert _front(spark, pts) == _front_brute(pts)


def test_duplicate_points_both_survive(spark):
    pts = {1: (5, 5), 2: (5, 5), 3: (1, 1)}
    assert _front(spark, pts) == {(1, 5, 5), (2, 5, 5)}


def test_same_x_strictly_higher_y_dominates(spark):
    pts = {1: (5, 5), 2: (5, 7), 3: (9, 1)}
    assert _front(spark, pts) == {(2, 5, 7), (3, 9, 1)}


def test_label_spread_recovers_separable_clusters(spark):
    # 3 well-separated direction clusters on the unit circle; labels =
    # cluster id. Every held-out vector's 5-NN are its own cluster, so
    # pseudo-labels must equal the held-out true labels with 5-0 votes.
    rows = []
    for c, base in enumerate((0.0, 2.1, 4.2)):
        for i in range(12):
            a = base + 0.02 * i
            rows.append((c * 12 + i, [math.cos(a), math.sin(a)], c))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    got = {r["vec_id"]: (r["true_label"], r["pred_label"], r["votes"])
           for r in label_spread(df, k=5, mask_mod=6).collect()}
    held_out = [i for i, _, _ in rows if i % 6 == 0]
    assert sorted(got) == held_out
    for vid in held_out:
        t, p, v = got[vid]
        assert p == t and v == 5
