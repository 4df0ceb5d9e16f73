"""kmv_distinct — cross-checked against a pure-Python KMV of the same
portable md5-prefix hash, plus the exact-below-k and estimator regimes."""

import hashlib
import random

from uckg_spark.operators.sketches import kmv_distinct


def h32_py(v: str) -> int:
    return int(hashlib.md5(v.encode()).hexdigest()[:8], 16)


def kmv_py(rows, k):
    """rows: (grp, value-as-string). Returns grp -> row dict."""
    groups: dict[str, set] = {}
    for g, v in rows:
        groups.setdefault(g, set()).add(v)
    out = {}
    for g, vals in groups.items():
        hashes = sorted({h32_py(v) for v in vals})
        k_used = min(k, len(hashes))
        h_k = hashes[k_used - 1]
        est = k_used if len(hashes) < k else ((k - 1) << 32) // max(h_k, 1)
        out[g] = {"k_used": k_used, "est_distinct": est,
                  "true_distinct": len(vals)}
    return out


def _check(spark, rows, k):
    df = spark.createDataFrame(rows, ["grp", "v"])
    got = {r["grp"]: {"k_used": r["k_used"],
                      "est_distinct": r["est_distinct"],
                      "true_distinct": r["true_distinct"]}
           for r in kmv_distinct(df, "v", "grp", k=k).collect()}
    assert got == kmv_py(rows, k)
    return got


class TestKmvDistinct:
    def test_exact_when_below_k(self, spark):
        rows = [("g", f"v{i}") for i in range(10)] * 3  # dups collapse
        got = _check(spark, rows, k=64)
        assert got["g"]["est_distinct"] == 10  # sketch exact below k

    def test_estimator_regime_matches_reference(self, spark):
        rng = random.Random(5)
        rows = [(f"g{i % 3}", f"v{rng.randrange(4000)}") for i in range(9000)]
        got = _check(spark, rows, k=32)
        for g, r in got.items():
            # KMV with k=32 has ~18% rel. stddev; 2x band is a smoke
            # bound on accuracy, the equality above is the real check
            assert r["true_distinct"] / 2 <= r["est_distinct"] \
                <= r["true_distinct"] * 2

    def test_groups_are_independent(self, spark):
        rows = [("big", f"v{i}") for i in range(500)] + [("small", "only")]
        got = _check(spark, rows, k=16)
        assert got["small"] == {"k_used": 1, "est_distinct": 1,
                                "true_distinct": 1}
        assert got["big"]["k_used"] == 16

    def test_non_string_values_hash_via_cast(self, spark):
        rows = [("g", i % 7) for i in range(50)]
        df = spark.createDataFrame(rows, ["grp", "v"])
        got = kmv_distinct(df, "v", "grp", k=8).collect()[0]
        assert got["est_distinct"] == 7 == got["true_distinct"]

    def test_k_lower_bound(self, spark):
        import pytest

        df = spark.createDataFrame([("g", "v")], ["grp", "v"])
        with pytest.raises(ValueError, match="k must be"):
            kmv_distinct(df, "v", "grp", k=1)


class TestKmvMerge:
    def test_union_estimate_matches_single_global_sketch(self, spark):
        """Mergeability: estimating the union from per-group sketches
        must give EXACTLY the same answer as sketching the ungrouped
        stream directly — k-smallest of a union == k-smallest of the
        concatenated k-smallest lists."""
        from uckg_spark.operators.sketches import (
            kmv_distinct,
            kmv_sketch,
            kmv_union_estimate,
        )

        rows = [(f"v{i % 400}", f"g{i % 7}") for i in range(3000)]
        df = spark.createDataFrame(rows, "v string, g string")
        merged = kmv_union_estimate(
            kmv_sketch(df, "v", "g", k=32), k=32).collect()[0]
        direct = kmv_distinct(
            df.selectExpr("v", "'all' AS g"), "v", "g", k=32).collect()[0]
        assert merged["est_distinct"] == direct["est_distinct"]
        assert merged["k_used"] == direct["k_used"]
        assert merged["n_groups"] == 7

    def test_small_union_is_exact(self, spark):
        from uckg_spark.operators.sketches import (
            kmv_sketch,
            kmv_union_estimate,
        )

        rows = [(f"v{i}", f"g{i % 3}") for i in range(20)]
        df = spark.createDataFrame(rows, "v string, g string")
        got = kmv_union_estimate(
            kmv_sketch(df, "v", "g", k=64), k=64).collect()[0]
        assert got["est_distinct"] == 20  # < k survivors: sketch is exact
