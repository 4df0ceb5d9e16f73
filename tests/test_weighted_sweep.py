"""weighted_quantiles (operators/quantiles.py) and interval_concurrency
(operators/temporal.py): hand-computed semantics, tie/touch edges, and
fail-fast guards."""

import datetime as dt

import pytest

from uckg_spark.operators.quantiles import weighted_quantiles
from uckg_spark.operators.temporal import interval_concurrency


def _wq(spark, rows, probs):
    df = spark.createDataFrame(rows, "g string, v long, w long")
    got = weighted_quantiles(df, "v", "w", "g", probs=probs)
    return {r["grp"]: tuple(r)[1:] for r in got.collect()}


def test_weighted_median_hand_checked(spark):
    rows = [("a", 1, 9), ("a", 10, 1)]
    got = _wq(spark, rows, ((1, 2), (9, 10), (99, 100)))
    # cw(1)=9 of 10: reaches 50% and 90% (9*10 >= 9*10) but not 99%
    assert got["a"] == (1, 1, 10)


def test_zero_weight_rows_are_inert(spark):
    with_zero = _wq(spark, [("a", 5, 0), ("a", 7, 4)], ((1, 2),))
    without = _wq(spark, [("a", 7, 4)], ((1, 2),))
    assert with_zero["a"] == without["a"] == (7,)


def test_tied_values_pool_their_weight(spark):
    rows = [("a", 3, 1), ("a", 3, 1), ("a", 9, 1)]
    assert _wq(spark, rows, ((1, 2),))["a"] == (3,)


def test_unit_weights_match_percentile_disc(spark):
    from uckg_spark.operators.quantiles import quantiles_disc

    vals = [("a", (i * 13) % 37, 1) for i in range(50)]
    got = _wq(spark, vals, ((1, 2), (9, 10)))
    df = spark.createDataFrame(
        [(g, v) for g, v, _ in vals], "g string, v long")
    ref = {r["grp"]: (r["p50"], r["p90"])
           for r in quantiles_disc(df, "v", "g", probs=(0.5, 0.9)).collect()}
    assert got == ref


def test_negative_weight_fails_fast(spark):
    df = spark.createDataFrame([("a", 1, -2)], "g string, v long, w long")
    with pytest.raises(Exception, match="negative weight"):
        weighted_quantiles(df, "v", "w", "g", probs=((1, 2),)).collect()


_T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)


def _conc(spark, rows):
    df = spark.createDataFrame(
        rows, "g string, s timestamp_ntz, e timestamp_ntz")
    got = interval_concurrency(df, "g", "s", "e")
    return sorted((r["grp"], r["ts"], r["concurrent"])
                  for r in got.collect())


def test_sweep_line_timeline(spark):
    rows = [("g", _T(0), _T(10)), ("g", _T(5), _T(15)), ("g", _T(7), _T(8))]
    assert _conc(spark, rows) == [
        ("g", _T(0), 1), ("g", _T(5), 2), ("g", _T(7), 3),
        ("g", _T(8), 2), ("g", _T(10), 1), ("g", _T(15), 0),
    ]


def test_touching_intervals_never_double_count(spark):
    # half-open: [0,5) then [5,10) — at t=5 the release nets against
    # the acquire, so concurrency never reads 2
    got = _conc(spark, [("g", _T(0), _T(5)), ("g", _T(5), _T(10))])
    assert got == [("g", _T(0), 1), ("g", _T(5), 1), ("g", _T(10), 0)]


def test_inverted_interval_fails_fast(spark):
    with pytest.raises(Exception, match="precedes"):
        _conc(spark, [("g", _T(5), _T(1))])
