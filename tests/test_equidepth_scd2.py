"""equi_depth_hist (operators/quantiles.py) and scd2_history
(operators/temporal.py): hand-computed bucket/interval semantics,
tie handling, and determinism."""

import datetime as dt

from uckg_spark.operators.quantiles import equi_depth_hist
from uckg_spark.operators.temporal import scd2_history


def _hist(spark, vals, n_buckets, parts=3):
    df = spark.createDataFrame(
        [("g", v) for v in vals], "source string, v long").repartition(parts)
    got = equi_depth_hist(df, "v", "source", n_buckets=n_buckets)
    return {r["bucket"]: (r["n"], r["lo"], r["hi"]) for r in got.collect()}


def test_uniform_values_split_evenly(spark):
    got = _hist(spark, list(range(1, 81)), 8)
    assert len(got) == 8
    for b in range(8):
        n, lo, hi = got[b]
        assert n == 10
        assert (lo, hi) == (10 * b + 1, 10 * b + 10)


def test_ties_share_a_bucket(spark):
    # 50x value 1, 50x value 2 at n=4: the tie mass is indivisible, so
    # buckets 1 and 3 are empty and each value owns one bucket
    got = _hist(spark, [1] * 50 + [2] * 50, 4)
    assert got == {0: (50, 1, 1), 2: (50, 2, 2)}


def test_single_value_degenerates_to_one_bucket(spark):
    got = _hist(spark, [7] * 30, 8)
    assert got == {0: (30, 7, 7)}


def test_partitioning_invariance(spark):
    vals = [(i * 37) % 101 for i in range(300)]
    assert _hist(spark, vals, 8, parts=1) == _hist(spark, vals, 8, parts=11)


def _scd2(spark, rows):
    df = spark.createDataFrame(
        rows, "k string, ts timestamp_ntz, v string, id long")
    got = scd2_history(df, "k", "ts", "v", "id")
    rows = [(r["k"], r["v"], r["valid_from"], r["valid_to"], r["version"],
             r["is_current"]) for r in got.collect()]
    return sorted(rows, key=lambda t: (t[0], t[4]))  # (key, version)


_T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
_HIGH = dt.datetime(9999, 12, 31)


def test_runs_collapse_and_intervals_chain(spark):
    rows = [
        ("u", _T(0), "a", 1),
        ("u", _T(1), "a", 2),   # no-op: extends the first interval
        ("u", _T(2), "b", 3),
        ("u", _T(3), "a", 4),   # back to a: NEW interval, not merged
    ]
    assert _scd2(spark, rows) == [
        ("u", "a", _T(0), _T(2), 1, False),
        ("u", "b", _T(2), _T(3), 2, False),
        ("u", "a", _T(3), _HIGH, 3, True),
    ]


def test_null_values_collapse_null_safely(spark):
    rows = [("u", _T(0), None, 1), ("u", _T(1), None, 2),
            ("u", _T(2), "x", 3)]
    got = _scd2(spark, rows)
    assert got == [
        ("u", None, _T(0), _T(2), 1, False),
        ("u", "x", _T(2), _HIGH, 2, True),
    ]


def test_equal_timestamps_order_by_tiebreak(spark):
    rows = [("u", _T(0), "b", 2), ("u", _T(0), "a", 1)]
    got = _scd2(spark, rows)
    # id=1 ("a") sorts first at the tied timestamp
    assert got == [
        ("u", "a", _T(0), _T(0), 1, False),
        ("u", "b", _T(0), _HIGH, 2, True),
    ]
