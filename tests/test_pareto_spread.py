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


def _clusters_df(spark):
    rows = []
    for c, base in enumerate((0.0, 2.1, 4.2)):
        for i in range(12):
            a = base + 0.02 * i
            rows.append((c * 12 + i, [math.cos(a), math.sin(a)], c))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"), rows


def test_label_spread_bucketed_matches_exact_on_separable(spark):
    """The scale path (IVF-bucketed candidates, no driver collect of the
    query side) must agree with the exact form on separable clusters:
    same held-out key set, identical predicted labels."""
    from uckg_spark.operators.similarity import label_spread_bucketed

    df, rows = _clusters_df(spark)
    exact = {r["vec_id"]: r["pred_label"]
             for r in label_spread(df, k=5, mask_mod=6).collect()}
    bucketed = {r["vec_id"]: r["pred_label"]
                for r in label_spread_bucketed(
                    df, k=5, mask_mod=6, n_centroids=6, n_probe=3).collect()}
    assert sorted(bucketed) == sorted(exact)
    agree = sum(bucketed[k] == exact[k] for k in exact) / len(exact)
    assert agree == 1.0


def test_label_spread_bucketed_agreement_bound_on_skewed_ids(spark):
    """Id-skewed fixture (all of cluster A packed into the low ids that
    first-n seeding would pick): bucketed predictions still agree with
    the exact form on >= 90% of held-out points, and every prediction
    set covers the same held-out keys."""
    import random

    from uckg_spark.operators.similarity import label_spread_bucketed

    rng = random.Random(11)

    def jitter(base, amp=0.05):
        return [x + rng.uniform(-amp, amp) for x in base]

    a, b, c = [1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]
    rows = [(i, jitter(a), 0) for i in range(10)]
    rows += [(i, jitter(b), 1) for i in range(10, 42)]
    rows += [(i, jitter(c), 2) for i in range(42, 66)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    exact = {r["vec_id"]: r["pred_label"]
             for r in label_spread(df, k=5, mask_mod=5).collect()}
    bucketed = {r["vec_id"]: r["pred_label"]
                for r in label_spread_bucketed(
                    df, k=5, mask_mod=5, n_centroids=8, n_probe=3).collect()}
    assert sorted(bucketed) == sorted(exact)
    agree = sum(bucketed[k] == exact[k] for k in exact) / len(exact)
    assert agree >= 0.9
