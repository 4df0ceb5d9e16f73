"""table_checksum: order/partitioning invariance, sensitivity to any
row change, null-vs-empty disambiguation, hashlib reference parity."""

import hashlib

import pytest

from uckg_spark.operators.integrity import table_checksum


def checksum_py(rows):
    total = 0
    for vals in rows:
        canon = "\x1f".join(
            "\x00" if v is None else str(v) for v in vals)
        total += int(hashlib.md5(canon.encode()).hexdigest()[:8], 16)
    return len(rows), total


def _df(spark, rows, parts=3):
    return spark.createDataFrame(
        rows, "k long, s string").repartition(parts)


class TestTableChecksum:
    def test_matches_hashlib_and_ignores_partitioning(self, spark):
        rows = [(i, f"v{i % 7}") for i in range(200)]
        want = checksum_py(rows)
        for parts in (1, 16):
            got = table_checksum(
                _df(spark, rows, parts), ["k", "s"]).collect()[0]
            assert (got["n_rows"], got["checksum"]) == want

    def test_any_row_change_changes_checksum(self, spark):
        rows = [(1, "a"), (2, "b")]
        base = table_checksum(_df(spark, rows), ["k", "s"]).collect()[0]
        bent = table_checksum(
            _df(spark, [(1, "a"), (2, "c")]), ["k", "s"]).collect()[0]
        assert base["n_rows"] == bent["n_rows"]
        assert base["checksum"] != bent["checksum"]

    def test_null_differs_from_empty_string(self, spark):
        a = table_checksum(_df(spark, [(1, None)]), ["k", "s"]).collect()[0]
        b = table_checksum(_df(spark, [(1, "")]), ["k", "s"]).collect()[0]
        assert a["checksum"] != b["checksum"]

    def test_grouped_form(self, spark):
        rows = [(1, "x"), (1, "y"), (2, "z")]
        got = {r["grp"]: (r["n_rows"], r["checksum"])
               for r in table_checksum(
                   _df(spark, rows), ["s"], group_col="k").collect()}
        assert got[1] == checksum_py([("x",), ("y",)])
        assert got[2] == checksum_py([("z",)])

    def test_empty_cols_raise(self, spark):
        with pytest.raises(ValueError):
            table_checksum(_df(spark, [(1, "a")]), [])


class TestCollectStats:
    def test_matches_manual_stats(self, spark):
        from uckg_spark.operators.integrity import collect_stats

        rows = [(1, "b"), (2, None), (2, "a"), (None, "a")]
        df = spark.createDataFrame(rows, "k long, s string")
        got = {r["col"]: (r["n_rows"], r["n_nulls"], r["ndv"],
                          r["min_val"], r["max_val"])
               for r in collect_stats(df, ["k", "s"]).collect()}
        assert got == {
            "k": (4, 1, 2, "1", "2"),
            "s": (4, 1, 2, "a", "b"),
        }

    def test_no_expand_plan(self, spark):
        from uckg_spark.operators.integrity import collect_stats

        df = spark.createDataFrame([(1, "a")], "k long, s string")
        plan = (collect_stats(df, ["k", "s"])
                ._jdf.queryExecution().executedPlan().toString())
        # per-column single-distinct aggregate branches (optimization
        # round 6): the multi-count_distinct wide row compiled through
        # an Expand that multiplied the scan by (distinct aggs + 1) and
        # shuffled the expanded rows — measured 3x slower at sf0.1.
        # Each branch must stay a plain two-phase aggregate.
        assert "Expand" not in plan

    def test_empty_cols_raise(self, spark):
        import pytest

        from uckg_spark.operators.integrity import collect_stats

        with pytest.raises(ValueError):
            collect_stats(spark.range(1), [])
