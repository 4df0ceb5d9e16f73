"""Bucketed co-located join: the join over two same-key bucketed tables
plans with ZERO Exchange nodes, while the identical non-bucketed join
shuffles both sides — the write-once-join-often layout for 100 TB fact
tables (sources/bucketed.py)."""

import pytest

from uckg_spark.sources.bucketed import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucket_db(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucket_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buckettest LOCATION '{loc}'")
    yield "buckettest"
    spark.sql("DROP DATABASE IF EXISTS buckettest CASCADE")


def _sides(spark):
    left = spark.range(0, 500).selectExpr("id AS k", "id * 2 AS lval")
    right = spark.range(0, 500).selectExpr("id AS k", "id * 3 AS rval")
    return left, right


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucket_db):
    left, right = _sides(spark)
    write_bucketed(left, f"{bucket_db}.lhs", "k", n_buckets=4)
    write_bucketed(right, f"{bucket_db}.rhs", "k", n_buckets=4)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, f"{bucket_db}.lhs", f"{bucket_db}.rhs", "k")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan

        # the control: identical data joined from plain DataFrames
        # shuffles BOTH sides
        l2, r2 = _sides(spark)
        control = _plan(l2.join(r2, "k"))
        assert control.count("Exchange") >= 2, control

        # and it is not just a pretty plan — the values are right
        rows = {r["k"]: (r["lval"], r["rval"]) for r in joined.collect()}
        assert len(rows) == 500
        assert rows[7] == (14, 21)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_mismatched_bucket_counts_fall_back_to_shuffle(spark, bucket_db):
    left, right = _sides(spark)
    write_bucketed(left, f"{bucket_db}.lhs8", "k", n_buckets=8)
    write_bucketed(right, f"{bucket_db}.rhs4b", "k", n_buckets=4)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(
            bucketed_join(spark, f"{bucket_db}.lhs8", f"{bucket_db}.rhs4b", "k")
        )
        # one side re-shuffles (Spark coalesces/shuffles the mismatched
        # side) — documents WHY n_buckets must match across tables
        assert "Exchange" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
