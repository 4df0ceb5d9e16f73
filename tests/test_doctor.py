"""audit_plan / assert_scalable: each counter actually detects its
plan shape, and the hard floor raises with the audit attached."""

import pytest
from pyspark.sql import functions as F

from uckg_spark.plans.doctor import assert_scalable, audit_plan


def test_clean_aggregate_is_ok(spark):
    df = spark.range(100).groupBy((F.col("id") % 5).alias("k")).count()
    audit = assert_scalable(df)
    assert audit["ok"] and audit["exchanges"] >= 1
    # codegen marks appear once AQE finalizes — audit again post-action
    df.collect()
    assert audit_plan(df)["codegen_spans"] >= 1


def test_cartesian_detected_and_raises(spark):
    a, b = spark.range(3), spark.range(3)
    cart = a.crossJoin(b)
    # Spark plans a small crossJoin as BNLJ unless both sides are
    # non-broadcastable; force the cartesian with a no-broadcast hint
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cart = a.crossJoin(b.hint("shuffle_replicate_nl"))
        audit = audit_plan(cart)
        assert audit["cartesian"] >= 1 and not audit["ok"]
        with pytest.raises(AssertionError, match="CartesianProduct"):
            assert_scalable(cart)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_python_eval_detected(spark):
    from pyspark.sql.functions import udf

    @udf("long")
    def slow(x):
        return x + 1

    df = spark.range(5).select(slow("id").alias("y"))
    audit = audit_plan(df)
    assert audit["python_eval"] >= 1 and not audit["ok"]
    with pytest.raises(AssertionError, match="Python eval"):
        assert_scalable(df)


def test_bnlj_budget(spark):
    one_row = spark.range(100).agg(F.count("*").alias("n"))
    df = spark.range(10).crossJoin(F.broadcast(one_row))
    audit = audit_plan(df)
    assert audit["bnlj"] == 1
    with pytest.raises(AssertionError, match="BroadcastNestedLoopJoin"):
        assert_scalable(df)           # default budget 0
    assert assert_scalable(df, allow_bnlj=1)["bnlj"] == 1


def test_pushed_filters_counted(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(100).withColumn("v", F.col("id") * 2).write.parquet(p)
    df = spark.read.parquet(p).where(F.col("id") > 50).select("v")
    audit = audit_plan(df)
    assert audit["scans"] == 1
    assert audit["pushed_filters"] == 1
