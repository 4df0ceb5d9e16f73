"""period_over_period (operators/temporal.py) and confusion_at_threshold
(operators/regression.py): gap-as-zero comparison semantics and exact
ratio/sentinel arithmetic."""

import datetime as dt

from uckg_spark.operators.regression import confusion_at_threshold
from uckg_spark.operators.temporal import period_over_period

_DAY_US = 86_400_000_000


def _pop(spark, day_counts):
    rows = []
    eid = 0
    for day, n in day_counts.items():
        for _ in range(n):
            rows.append(("k", dt.datetime(2024, 1, 1 + day, 12, 0, 0), eid))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp_ntz, event_id long")
    got = period_over_period(df, "event_type", "ts", "1 day")
    return {r["bucket_idx"]: (r["n_events"], r["prev_n"], r["delta"])
            for r in got.collect()}


def test_gap_days_compare_as_zero(spark):
    got = _pop(spark, {0: 3, 2: 5})  # day 1 is silent
    day0 = dt.datetime(2024, 1, 1).timestamp()  # noqa: F841 (doc only)
    idxs = sorted(got)
    assert len(idxs) == 2  # days 1 and 2 (day 0 has no predecessor)
    assert got[idxs[0]] == (0, 3, -3)   # the drop to zero is REAL
    assert got[idxs[1]] == (5, 0, 5)    # and so is the recovery
    # no NULLs anywhere
    assert all(v is not None for t in got.values() for v in t)


def _conf(spark, rows, threshold):
    df = spark.createDataFrame(rows, "s long, y boolean")
    return confusion_at_threshold(df, "s", "y", threshold).collect()[0]


def test_confusion_hand_counts_and_ratios(spark):
    rows = [(10, True), (10, False), (1, True), (1, False), (1, False)]
    got = _conf(spark, rows, threshold=5)
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (1, 1, 1, 2)
    assert got["prec_e6"] == 500_000
    assert got["rec_e6"] == 500_000
    assert got["f1_e6"] == 500_000


def test_confusion_undefined_sentinels(spark):
    # threshold above every score: no predicted positives -> prec -1
    got = _conf(spark, [(1, True), (2, False)], threshold=100)
    assert got["prec_e6"] == -1 and got["rec_e6"] == 0
    # no actual positives but one (wrong) prediction: recall undefined,
    # precision and F1 defined at 0 (the fp keeps their denominators > 0)
    got = _conf(spark, [(1, False), (200, False)], threshold=100)
    assert got["rec_e6"] == -1 and got["prec_e6"] == 0 and got["f1_e6"] == 0
    # nothing predicted AND nothing positive: all three undefined
    got = _conf(spark, [(1, False)], threshold=100)
    assert (got["prec_e6"], got["rec_e6"], got["f1_e6"]) == (-1, -1, -1)


def test_spike_composition_flags_planted_burst(spark):
    from uckg_spark.operators.outliers import mad_outliers
    from uckg_spark.operators.temporal import period_over_period

    rows, eid = [], 0
    for day in range(12):
        n = 50 if day == 7 else 5  # planted burst on day 7
        for _ in range(n):
            rows.append(("k", dt.datetime(2024, 1, 1 + day, 9), eid))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp_ntz, event_id long")
    pop = period_over_period(df, "event_type", "ts", "1 day")
    got = {r["id"]: r["is_outlier"] for r in mad_outliers(
        pop.select("key", pop.bucket_idx.alias("day"), "delta"),
        "delta", "key", "day", k=4).collect()}
    days = sorted(got)
    # the burst day (+45) and the collapse day after it (-45) are the
    # only flags; steady days are quiet
    flagged = {d for d in days if got[d]}
    assert flagged == {days[6], days[7]}
