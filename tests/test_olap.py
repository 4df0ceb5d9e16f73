"""rollup_metrics: all-levels correctness vs hand-built subtotals,
level bitmask order, single-scan plan shape."""

import pytest
from pyspark.sql import functions as F

from uckg_spark.operators.olap import rollup_metrics


@pytest.fixture(scope="module")
def sales(spark):
    rows = [
        ("eu", "de", 2), ("eu", "de", 3), ("eu", "fr", 5),
        ("us", "ny", 7), ("us", "ny", 1), ("us", "ca", 4),
    ]
    return spark.createDataFrame(rows, "reg string, loc string, qty long")


class TestRollupMetrics:
    def test_all_levels_match_manual_subtotals(self, spark, sales):
        got = {
            (r["reg"], r["loc"], r["lvl"]): (r["n"], r["sum_qty"])
            for r in rollup_metrics(
                sales, ["reg", "loc"],
                [F.count("*").alias("n"),
                 F.sum("qty").cast("bigint").alias("sum_qty")],
            ).collect()
        }
        assert got == {
            ("eu", "de", 0): (2, 5), ("eu", "fr", 0): (1, 5),
            ("us", "ny", 0): (2, 8), ("us", "ca", 0): (1, 4),
            ("eu", "ALL", 1): (3, 10), ("us", "ALL", 1): (3, 12),
            ("ALL", "ALL", 3): (6, 22),
        }

    def test_level_bitmask_leftmost_msb_three_cols(self, spark):
        df = spark.createDataFrame(
            [("a", "b", "c", 1)], "x string, y string, z string, v long")
        lvls = {
            (r["x"], r["y"], r["z"]): r["lvl"]
            for r in rollup_metrics(
                df, ["x", "y", "z"], [F.count("*").alias("n")]
            ).collect()
        }
        # rollup aggregates away suffixes: z first (bit 0), then y (1)…
        assert lvls == {
            ("a", "b", "c"): 0, ("a", "b", "ALL"): 1,
            ("a", "ALL", "ALL"): 3, ("ALL", "ALL", "ALL"): 7,
        }

    def test_empty_group_cols_raise(self, sales):
        with pytest.raises(ValueError):
            rollup_metrics(sales, [], [F.count("*").alias("n")])

    def test_single_scan_plan(self, sales):
        plan = (
            rollup_metrics(sales, ["reg", "loc"],
                           [F.count("*").alias("n")])
            ._jdf.queryExecution().executedPlan().toString()
        )
        # one Expand feeding one partial/final aggregate pair — not a
        # union of per-level scans
        assert plan.count("Expand") == 1
        assert "Union" not in plan


class TestPivotCounts:
    def test_matches_manual_crosstab(self, spark):
        from uckg_spark.operators.olap import pivot_counts

        rows = [("u1", "view"), ("u1", "view"), ("u1", "click"),
                ("u2", "view"), ("u2", "error"), ("u3", "other")]
        df = spark.createDataFrame(rows, "u string, t string")
        got = {r["row"]: (r["view"], r["click"])
               for r in pivot_counts(df, "u", "t",
                                     ["view", "click"]).collect()}
        # zero-filled; values outside the domain ignored but the row kept
        assert got == {"u1": (2, 1), "u2": (1, 0), "u3": (0, 0)}

    def test_single_shuffle_plan(self, spark):
        from uckg_spark.operators.olap import pivot_counts

        df = spark.createDataFrame([("u", "v")], "u string, t string")
        plan = (pivot_counts(df, "u", "t", ["v", "w"])
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Exchange hashpartitioning") == 1

    def test_invalid_values_raise(self, spark):
        import pytest

        from uckg_spark.operators.olap import pivot_counts

        df = spark.createDataFrame([("u", "v")], "u string, t string")
        with pytest.raises(ValueError):
            pivot_counts(df, "u", "t", [])
        with pytest.raises(ValueError):
            pivot_counts(df, "u", "t", ["v", "v"])
