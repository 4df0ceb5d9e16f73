"""kge_negative_samples (plans/graphalgs.py): exact match vs a Python
replication of the bucketed-index + md5-corruption algorithm, the
filtered-protocol guarantee, and partitioning independence."""

import hashlib

from uckg_spark.plans.graphalgs import kge_negative_samples

EDGES = [
    ("a", "r1", "x"), ("a", "r1", "y"), ("b", "r1", "x"),
    ("b", "r2", "z"), ("c", "r2", "x"), ("c", "r2", "c2"),
    ("a", "r1", "x"),  # duplicate edge: set semantics
]


def _md5i(s, n_chars):
    return int(hashlib.md5(s.encode()).hexdigest()[:n_chars], 16)


def _brute(edges, k, n_buckets=64):
    real = set(edges)
    nodes = sorted({s for s, _, _ in real} | {o for _, _, o in real})
    by_bucket = {}
    for n in nodes:
        by_bucket.setdefault(_md5i(n, 8) % n_buckets, []).append(n)
    indexed = []
    for b in sorted(by_bucket):
        indexed.extend(sorted(by_bucket[b]))
    out = set()
    for s, p, o in real:
        for i in range(k):
            h = _md5i("\x01".join((s, p, o, str(i))), 15) % len(indexed)
            neg = indexed[h]
            if (s, p, neg) not in real:
                out.add((s, p, neg, i))
    return out


def _run(spark, edges, k, parts=1):
    df = spark.createDataFrame(
        edges, "subj string, pred string, obj string").repartition(parts)
    got = kge_negative_samples(df, k=k)
    return {(r["subj"], r["pred"], r["neg_obj"], r["sample_i"])
            for r in got.collect()}


def test_matches_python_replication(spark):
    got = _run(spark, EDGES, k=3)
    want = _brute(EDGES, k=3)
    assert got == want and len(got) > 0


def test_filtered_protocol_and_node_closure(spark):
    got = _run(spark, EDGES, k=4)
    real = set(EDGES)
    nodes = {s for s, _, _ in real} | {o for _, _, o in real}
    for s, p, neg, _ in got:
        assert (s, p, neg) not in real     # never a true triple
        assert neg in nodes                # corruption stays in-graph


def test_partitioning_independent(spark):
    assert _run(spark, EDGES, k=2, parts=1) == _run(spark, EDGES, k=2, parts=5)


def test_sample_count_bound(spark):
    got = _run(spark, EDGES, k=2)
    distinct_edges = len(set(EDGES))
    assert len(got) <= 2 * distinct_edges
