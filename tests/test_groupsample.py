"""group_sample_k (operators/corpus.py): exact per-group top-k by
(md5(id), id) vs a Python oracle, including a fixture that forces the
prefilter's deficiency fallback, and the hard-quota guarantee."""

import hashlib

from uckg_spark.operators.corpus import group_sample_k


def _brute(rows, k):
    by_g = {}
    for i, g in rows:
        by_g.setdefault(g, []).append(i)
    out = set()
    for g, ids in by_g.items():
        ranked = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        for rk, i in enumerate(ranked[:k], start=1):
            out.add((i, g, rk))
    return out


def _run(spark, rows, k, safety):
    df = spark.createDataFrame(rows, "doc_id int, source string")
    got = group_sample_k(
        df.repartition(7), group_col="source", k=k, safety=safety)
    return {(r["doc_id"], r["source"], r["rk"]) for r in got.collect()}


def test_exact_topk_and_hard_quota(spark):
    rows = [(i, f"s{i % 6}") for i in range(300)]
    got = _run(spark, rows, k=4, safety=4)
    assert got == _brute(rows, 4)
    # hard quota: exactly 4 per group (every group has >= 4 docs)
    per_group = {}
    for _, g, _ in got:
        per_group[g] = per_group.get(g, 0) + 1
    assert set(per_group.values()) == {4}


def test_small_groups_kept_whole(spark):
    rows = [(1, "tiny"), (2, "tiny")] + [(i, "big") for i in range(10, 60)]
    got = _run(spark, rows, k=5, safety=4)
    assert got == _brute(rows, 5)
    assert sum(1 for _, g, _ in got if g == "tiny") == 2


def test_fallback_branch_still_exact(spark):
    # safety=1 makes the prefilter threshold ~k/|group| of the hash
    # space: with 40 groups of 50 the fixture deterministically contains
    # deficient groups (verified below), so the fallback path executes
    # and the result must STILL equal the brute-force top-k
    rows = [(i, f"g{i % 40}") for i in range(2000)]
    k, safety = 5, 1
    got = _run(spark, rows, k=k, safety=safety)
    assert got == _brute(rows, k)
    # prove the fixture exercises the fallback: recompute the prefilter
    # survivor counts exactly as the operator does
    thresh = min(1 << 32, (1 << 32) * safety * k // 50 + 1)
    deficient = 0
    for g in range(40):
        ids = [i for i in range(2000) if i % 40 == g]
        surv = [i for i in ids
                if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) < thresh]
        if len(surv) < k:
            deficient += 1
    assert deficient > 0
