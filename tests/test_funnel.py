"""funnel_counts: staged-reach semantics vs a driver-side reference,
strictly-after ordering, and one-Exchange plan shape."""

import datetime

import pytest

from uckg_spark.operators.funnel import funnel_counts


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp")


def funnel_py(rows, stages):
    by_user: dict[int, list[tuple]] = {}
    for u, t, ts in rows:
        by_user.setdefault(u, []).append((ts, t))
    counts = [0] * len(stages)
    for evs in by_user.values():
        prev = None
        for i, s in enumerate(stages):
            cand = [ts for ts, t in evs
                    if t == s and (prev is None or ts > prev)]
            if not cand:
                break
            prev = min(cand)
            counts[i] += 1
    return {i + 1: (s, counts[i]) for i, s in enumerate(stages)}


class TestFunnelCounts:
    def test_matches_reference_on_random_stream(self, spark):
        import random

        rng = random.Random(5)
        types = ["view", "click", "purchase", "error"]
        rows = [
            (rng.randrange(20), rng.choice(types), _ts(rng.randrange(59)))
            for _ in range(400)
        ]
        got = {
            r["stage"]: (r["stage_name"], r["n_users"])
            for r in funnel_counts(
                _df(spark, rows), "user_id", "event_type", "ts",
                ("view", "click", "purchase"),
            ).collect()
        }
        assert got == funnel_py(rows, ("view", "click", "purchase"))

    def test_out_of_order_stage_does_not_count(self, spark):
        # purchase BEFORE the first view: user reaches view only
        rows = [(1, "purchase", _ts(0)), (1, "view", _ts(1)),
                (1, "click", _ts(2))]
        got = {r["stage_name"]: r["n_users"]
               for r in funnel_counts(
                   _df(spark, rows), "user_id", "event_type", "ts",
                   ("view", "click", "purchase")).collect()}
        assert got == {"view": 1, "click": 1, "purchase": 0}

    def test_equal_timestamp_is_not_after(self, spark):
        rows = [(1, "view", _ts(3)), (1, "click", _ts(3))]
        got = {r["stage_name"]: r["n_users"]
               for r in funnel_counts(
                   _df(spark, rows), "user_id", "event_type", "ts",
                   ("view", "click")).collect()}
        assert got == {"view": 1, "click": 0}

    def test_later_earlier_event_revives_stage(self, spark):
        # first click at t1 pre-dates view at t2, second click at t3
        # post-dates it: reach = min(ts > r_prev), so click counts via t3
        rows = [(1, "click", _ts(0)), (1, "view", _ts(1)),
                (1, "click", _ts(2))]
        got = {r["stage_name"]: r["n_users"]
               for r in funnel_counts(
                   _df(spark, rows), "user_id", "event_type", "ts",
                   ("view", "click")).collect()}
        assert got == {"view": 1, "click": 1}

    def test_invalid_stages_raise(self, spark):
        df = _df(spark, [(1, "view", _ts(0))])
        with pytest.raises(ValueError):
            funnel_counts(df, "user_id", "event_type", "ts", ("view",))
        with pytest.raises(ValueError):
            funnel_counts(df, "user_id", "event_type", "ts",
                          ("view", "view"))

    def test_single_exchange_plan(self, spark):
        plan = (
            funnel_counts(
                _df(spark, [(1, "view", _ts(0))]),
                "user_id", "event_type", "ts", ("view", "click", "purchase"),
            )._jdf.queryExecution().executedPlan().toString()
        )
        # windows + per-user collapse share one hash-partitioning; the
        # only other exchange is the single-row global-agg reduce
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Join" not in plan


class TestTransitionCounts:
    def test_matches_reference(self, spark):
        import random

        from uckg_spark.operators.funnel import transition_counts

        rng = random.Random(47)
        types = ["a", "b", "c"]
        rows = [(i, rng.randrange(6), rng.choice(types),
                 _ts(rng.randrange(59)))
                for i in range(200)]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string,"
            " ts timestamp")
        got = {(r["prev_type"], r["next_type"]): r["n"]
               for r in transition_counts(
                   df, "user_id", "ts", "event_type", "event_id"
               ).collect()}
        want: dict = {}
        by_u: dict = {}
        for i, u, t, ts in rows:
            by_u.setdefault(u, []).append((ts, i, t))
        for evs in by_u.values():
            evs.sort()
            for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
                want[(a, b)] = want.get((a, b), 0) + 1
        assert got == want

    def test_tie_broken_by_id(self, spark):
        from uckg_spark.operators.funnel import transition_counts

        t = _ts(0)
        df = spark.createDataFrame(
            [(2, 1, "b", t), (1, 1, "a", t)],
            "event_id long, user_id long, event_type string, ts timestamp")
        got = transition_counts(
            df, "user_id", "ts", "event_type", "event_id").collect()
        assert [(r["prev_type"], r["next_type"], r["n"]) for r in got] == [
            ("a", "b", 1)]


def test_retention_cohorts_hand_checked(spark):
    import datetime as dt

    from uckg_spark.operators.funnel import retention_cohorts

    def t(day, h=9):
        return dt.datetime(2024, 1, 1 + day, h)

    rows = [
        # cohort day0: u1 active d0,d1,d2; u2 active d0,d2; u3 only d0
        (1, t(0)), (1, t(1)), (1, t(2)),
        (2, t(0)), (2, t(2)), (2, t(2, 20)),  # same-day repeat: set sem.
        (3, t(0)),
        # cohort day1: u4 active d1,d3
        (4, t(1)), (4, t(3)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
    got = {(r["cohort_day"], r["k"]): (r["n_active"], r["cohort_n"])
           for r in retention_cohorts(df, "user_id", "ts").collect()}
    d0 = (dt.datetime(2024, 1, 1) - dt.datetime(1970, 1, 1)).days
    assert got == {
        (d0, 0): (3, 3), (d0, 1): (1, 3), (d0, 2): (2, 3),
        (d0 + 1, 0): (1, 1), (d0 + 1, 2): (1, 1),
    }
