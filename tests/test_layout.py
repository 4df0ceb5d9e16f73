"""zorder_value / cluster_by_zorder: bit-exact Morton interleave vs a
python reference, locality property, plan shape, bit-budget guard."""

import pytest
from pyspark.sql import functions as F

from uckg_spark.functions.layout import cluster_by_zorder, zorder_value


def morton_py(vals, bits):
    z = 0
    k = len(vals)
    for ci, v in enumerate(vals):
        for b in range(bits):
            z |= ((v >> b) & 1) << (b * k + ci)
    return z


class TestZorder:
    def test_matches_python_interleave(self, spark):
        import random

        rng = random.Random(59)
        rows = [(rng.randrange(1 << 16), rng.randrange(1 << 16))
                for _ in range(100)]
        df = spark.createDataFrame(rows, "x long, y long")
        got = [r["z"] for r in df.select(
            zorder_value(["x", "y"]).alias("z")).collect()]
        assert got == [morton_py([x, y], 16) for x, y in rows]

    def test_locality_beats_lexicographic(self, spark):
        # on a grid, z-order buckets bound BOTH columns; a lexicographic
        # sort leaves the second column unbounded per bucket
        rows = [(x, y) for x in range(32) for y in range(32)]
        df = spark.createDataFrame(rows, "x long, y long")
        clustered = cluster_by_zorder(df, ["x", "y"], n_files=16, bits=5)
        spans = (
            clustered.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg((F.max("x") - F.min("x")).alias("sx"),
                 (F.max("y") - F.min("y")).alias("sy"))
            .collect()
        )
        # every file bounds y as well as x: lexicographic would give
        # sy = 31 for every bucket
        assert all(r["sy"] < 31 for r in spans)
        assert all(r["sx"] < 31 for r in spans)

    def test_cluster_plan_is_range_exchange_plus_sort(self, spark):
        df = spark.createDataFrame([(1, 2)], "x long, y long")
        plan = (cluster_by_zorder(df, ["x", "y"])
                ._jdf.queryExecution().executedPlan().toString())
        assert "rangepartitioning" in plan
        assert "Sort" in plan

    def test_bit_budget_and_empty_cols_raise(self, spark):
        with pytest.raises(ValueError):
            zorder_value([])
        with pytest.raises(ValueError):
            zorder_value(["a", "b", "c", "d"], bits=16)  # 64 > 62
