"""asof_join / range_join_pairs — brute-force cross-checks on a seeded
random fixture, tie/edge semantics, and the no-nested-loop plan property."""

import datetime as dt
import random

from uckg_spark.operators.temporal import asof_join, range_join_pairs

T0 = dt.datetime(2024, 1, 1)


def _ts(seconds: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=seconds)


def _fixture(spark, seed=7, n_left=60, n_right=80, n_keys=5):
    rng = random.Random(seed)
    lrows = [(i, rng.randrange(n_keys), _ts(rng.uniform(0, 3600)))
             for i in range(n_left)]
    rrows = [(1000 + i, rng.randrange(n_keys), _ts(rng.uniform(0, 3600)),
              round(rng.uniform(0, 100), 2)) for i in range(n_right)]
    left = spark.createDataFrame(lrows, ["lid", "k", "ts"])
    right = spark.createDataFrame(rrows, ["rid", "k", "ts", "val"])
    return lrows, rrows, left, right


class TestAsofJoin:
    def test_matches_brute_force(self, spark):
        lrows, rrows, left, right = _fixture(spark)
        got = {r["lid"]: (r["rid_m"], r["ts_m"])
               for r in asof_join(left, right, key="k", suffix="_m").collect()}
        want = {}
        for lid, k, lts in lrows:
            cands = [(rts, rid) for rid, rk, rts, _ in rrows
                     if rk == k and rts <= lts]
            if cands:
                want[lid] = max(cands)
        assert got == {lid: (rid, rts) for lid, (rts, rid) in want.items()}

    def test_simultaneous_right_row_matches(self, spark):
        left = spark.createDataFrame([(1, "a", _ts(10))], ["lid", "k", "ts"])
        right = spark.createDataFrame(
            [(9, "a", _ts(10)), (8, "a", _ts(5))], ["rid", "k", "ts"])
        out = asof_join(left, right, key="k").collect()
        assert len(out) == 1 and out[0]["rid_matched"] == 9

    def test_left_keeps_unmatched(self, spark):
        left = spark.createDataFrame(
            [(1, "a", _ts(0)), (2, "a", _ts(20))], ["lid", "k", "ts"])
        right = spark.createDataFrame([(9, "a", _ts(10))], ["rid", "k", "ts"])
        inner = asof_join(left, right, key="k").collect()
        assert [r["lid"] for r in inner] == [2]
        outer = {r["lid"]: r["rid_matched"]
                 for r in asof_join(left, right, key="k", how="left").collect()}
        assert outer == {1: None, 2: 9}


class TestRangeJoinPairs:
    def test_matches_brute_force(self, spark):
        lrows, rrows, left, right = _fixture(spark, seed=11)
        width = 600
        got = {(r["lid"], r["rid_r"], r["gap_us"])
               for r in range_join_pairs(
                   left, right, key="k", width_seconds=width).collect()}
        want = set()
        for lid, k, lts in lrows:
            for rid, rk, rts, _ in rrows:
                if rk == k and lts <= rts < lts + dt.timedelta(seconds=width):
                    gap = (rts - lts) // dt.timedelta(microseconds=1)
                    want.add((lid, rid, gap))
        assert got == want

    def test_band_edges(self, spark):
        # inclusive at gap 0, exclusive at exactly width
        left = spark.createDataFrame([(1, "a", _ts(0))], ["lid", "k", "ts"])
        right = spark.createDataFrame(
            [(7, "a", _ts(0)), (8, "a", _ts(59.999999)), (9, "a", _ts(60)),
             (10, "b", _ts(1))],
            ["rid", "k", "ts"])
        got = {r["rid_r"] for r in range_join_pairs(
            left, right, key="k", width_seconds=60).collect()}
        assert got == {7, 8}

    def test_plan_is_equi_join(self, spark):
        _, _, left, right = _fixture(spark)
        df = range_join_pairs(left, right, key="k", width_seconds=60)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestRollingCounts:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, user string, ts timestamp_ntz")

    def test_matches_bruteforce(self, spark):
        import datetime
        import random

        from uckg_spark.operators.temporal import rolling_counts

        rng = random.Random(41)
        rows = [
            (i, f"u{rng.randrange(5)}",
             datetime.datetime(2024, 1, 1) + datetime.timedelta(
                 minutes=rng.randrange(600)))
            for i in range(200)
        ]
        got = {r["id"]: r["n_window"]
               for r in rolling_counts(
                   self._df(spark, rows), "user", "ts", "event_id",
                   "1 hour").collect()}
        want = {}
        for i, u, ts in rows:
            want[i] = sum(
                1 for j, v, t2 in rows
                if v == u and ts - datetime.timedelta(hours=1) <= t2 <= ts)
        assert got == want

    def test_boundary_inclusive_and_ties_are_peers(self, spark):
        import datetime

        from uckg_spark.operators.temporal import rolling_counts

        t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            (1, "u", t0),
            (2, "u", t0),  # tie: both count each other
            (3, "u", t0 + datetime.timedelta(hours=1)),        # on boundary
            (4, "u", t0 + datetime.timedelta(hours=1, seconds=1)),  # outside
        ]
        got = {r["id"]: r["n_window"]
               for r in rolling_counts(
                   self._df(spark, rows), "user", "ts", "event_id",
                   "1 hour").collect()}
        assert got == {1: 2, 2: 2, 3: 3, 4: 2}

    def test_bad_duration_raises(self, spark):
        import pytest

        from uckg_spark.operators.temporal import rolling_counts

        df = self._df(spark, [])
        for bad in ("1h", "0 hours", "-1 hour", "1 fortnight"):
            with pytest.raises(ValueError):
                rolling_counts(df, "user", "ts", "event_id", bad)


class TestGapFill:
    def test_gaps_are_zero_filled(self, spark):
        from uckg_spark.operators.temporal import gap_fill_counts

        # key 'a' has events on days 0, 1 and 4 — days 2, 3 must appear
        # as zeros; key 'b' has one day — a single row, no spine growth
        rows = [
            (1, "a", _ts(0), 1.25),
            (2, "a", _ts(10), 2.0),
            (3, "a", _ts(86400 + 5), 0.5),
            (4, "a", _ts(4 * 86400 + 5), 3.0),
            (5, "b", _ts(2 * 86400), 7.0),
        ]
        df = spark.createDataFrame(rows, ["event_id", "event_type", "ts", "value"])
        out = gap_fill_counts(df, "event_type", "ts", "1 day", value_col="value")
        got = {(r["key"], r["bucket_idx"]): (r["n_events"], r["value_c"])
               for r in out.collect()}
        base = min(b for (k, b) in got if k == "a")
        assert len(got) == 6  # a: 5 consecutive days, b: 1
        assert got[("a", base)] == (2, 325)
        assert got[("a", base + 1)] == (1, 50)
        assert got[("a", base + 2)] == (0, 0)
        assert got[("a", base + 3)] == (0, 0)
        assert got[("a", base + 4)] == (1, 300)
        # bucket_ts is the exact bucket start
        ts = {r["bucket_idx"]: r["bucket_ts"] for r in out.collect()}
        assert ts[base] == dt.datetime(2024, 1, 1)
        assert ts[base + 2] == dt.datetime(2024, 1, 3)

    def test_no_value_col(self, spark):
        from uckg_spark.operators.temporal import gap_fill_counts

        df = spark.createDataFrame(
            [(1, "k", _ts(0)), (2, "k", _ts(2 * 3600))],
            ["event_id", "event_type", "ts"])
        out = gap_fill_counts(df, "event_type", "ts", "1 hour")
        assert sorted(out.columns) == ["bucket_idx", "bucket_ts", "key",
                                       "n_events"]
        assert [r["n_events"] for r in out.orderBy("bucket_idx").collect()] \
            == [1, 0, 1]

    def test_span_guard_raises(self, spark):
        import pytest as _pytest
        from uckg_spark.operators.temporal import gap_fill_counts

        df = spark.createDataFrame(
            [(1, "k", _ts(0), 1.0), (2, "k", _ts(9 * 86400), 1.0)],
            ["event_id", "event_type", "ts", "value"])
        with _pytest.raises(Exception, match="spans"):
            gap_fill_counts(df, "event_type", "ts", "1 day",
                            max_buckets_per_key=5).collect()
