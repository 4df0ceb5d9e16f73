"""Temporal joins Spark's DataFrame API lacks as primitives — as-of join
and bounded range join — expressed as compositions of built-in operators
(per the graft brief: composition first, Pandas UDF only if semantics
demand it; these don't).

Both take an event-table shape (key, timestamp, payload) — the driver's
``events.parquet`` — and both are engine-portable: the DuckDB twins use
native ``ASOF JOIN`` / inequality joins, and every emitted value is
integer-exact (timestamp gaps in whole microseconds).

Scale design:
- ``asof_join`` is the union-window formulation: tag both sides, ONE
  shuffle partitioned by key and sorted by (ts, side), carry the last
  right payload forward with ``last(ignorenulls)``. A sort-merge
  inequality join would re-sort both sides AND explode candidate pairs
  before picking the max — the window form touches each row once and
  never materializes a candidate pair. Skewed keys (one hot user) are
  a window-partition hotspot; at web scale, pre-split hot keys by time
  range (the same salting recipe as operators/skew.py) since as-of
  only needs the carried value at each split boundary.
- ``range_join_pairs`` is the bucketized band join: candidates meet in
  ``width``-sized time buckets (each right row lands in its bucket and
  the next lower one), so the join is a pure equi-join on (key, bucket)
  and the inequality is a post-filter — Spark never plans a nested-loop
  or cartesian (plan-tested), and the candidate set is |pairs within
  2×width|, not |left|×|right| per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_EPOCH = "1970-01-01 00:00:00"


def _epoch_us(ts_col: Column) -> Column:
    """Exact integer microseconds since the epoch for TIMESTAMP_NTZ
    (unix_micros is TZ-only; DuckDB twin: epoch_us(ts))."""
    return F.timestamp_diff(
        "MICROSECOND", F.lit(_EPOCH).cast("timestamp_ntz"), ts_col
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_matched",
    how: str = "inner",
) -> DataFrame:
    """For every left row, attach the LATEST right row of the same ``key``
    with ``right_ts <= left_ts`` (backward as-of, inclusive — DuckDB's
    ``ASOF JOIN ... ON l.ts >= r.ts`` semantics).

    Returns all left columns plus every non-key right column renamed
    ``<col><suffix>`` (including the right timestamp). ``how='inner'``
    drops unmatched left rows; ``'left'`` keeps them with nulls.

    The right side must be unique per (key, right_ts): with duplicates
    the "latest" row at a tied timestamp is not well defined (DuckDB's
    ASOF has the same caveat) — pre-aggregate duplicates away first.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    rpay = [c for c in right.columns if c != key]
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).alias(c + suffix) for c in rpay]).alias("_pay"),
    )
    l = left.select(
        "*",
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
    )
    # right rows sort BEFORE left rows at an equal timestamp (side 0 < 1),
    # so an exactly-simultaneous right row matches (inclusive backward)
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        u.withColumn("_m", F.last("_pay", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if how == "inner":
        matched = matched.filter(F.col("_m").isNotNull())
    return matched.select(*left.columns, F.col("_m.*"))


def rolling_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    window: str = "1 hour",
) -> DataFrame:
    """Per-event trailing-window count: for every row, how many of the
    same key's events (inclusive of this one) fall in
    ``[ts - window, ts]`` — the rate-limiter / burst-detector feature
    every event pipeline derives, and the RANGE-frame window case the
    rest of the repo's window ops don't exercise (rows frames and
    partition-only frames are covered elsewhere).

    Exact semantics: the frame is closed on both ends and ordered by
    integer MICROSECONDS (``rangeBetween`` needs a numeric key; the
    epoch-µs cast keeps ties and bounds bit-identical in the DuckDB
    twin's ``RANGE BETWEEN INTERVAL ... PRECEDING AND CURRENT ROW``).
    Equal timestamps are peers: each sees the other (both engines).

    Scale shape: ONE shuffle (the per-key window sort); the running
    count is a frame aggregate inside it — no self-join, which is the
    naive form and quadratic per burst. Window length is data-bounded
    state, not memory-bounded: Spark evaluates RANGE frames with a
    sliding two-pointer over the sorted partition.
    """
    dur = _parse_duration_us(window)
    w = (
        Window.partitionBy("key")
        .orderBy("ts_us")
        .rangeBetween(-dur, 0)
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.col(key_col).alias("key"),
            _epoch_us(F.col(ts_col)).alias("ts_us"),
        )
        .select(
            "id",
            "key",
            F.count(F.lit(1)).over(w).cast("bigint").alias("n_window"),
        )
    )


_DUR_UNITS_US = {
    "second": 1_000_000,
    "seconds": 1_000_000,
    "minute": 60_000_000,
    "minutes": 60_000_000,
    "hour": 3_600_000_000,
    "hours": 3_600_000_000,
    "day": 86_400_000_000,
    "days": 86_400_000_000,
}


def _parse_duration_us(spec: str) -> int:
    parts = spec.strip().split()
    if len(parts) != 2 or not parts[0].isdigit() or int(parts[0]) < 1:
        raise ValueError(f"duration must be '<n> <unit>': {spec!r}")
    n, unit = int(parts[0]), parts[1].lower()
    if unit not in _DUR_UNITS_US:
        raise ValueError(f"unknown duration unit {unit!r} in {spec!r}")
    return n * _DUR_UNITS_US[unit]


def range_join_pairs(
    left: DataFrame,
    right: DataFrame,
    key: str,
    width_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """All (left, right) pairs with the same ``key`` and
    ``left_ts <= right_ts < left_ts + width_seconds`` (right-open band).

    Bucketized band join: bucket = epoch_us div width; a qualifying right
    row's bucket is the left's bucket or the next one, so each right row
    is duplicated into (bucket, bucket-1) and the join is an EQUI-join on
    (key, bucket) with the exact band as a post-filter. Output carries
    ``left_cols`` as-is, ``right_cols`` with ``suffix``, plus ``gap_us``
    (exact integer microseconds right - left).
    """
    if width_seconds <= 0:
        raise ValueError("width_seconds must be positive")
    width_us = int(width_seconds) * 1_000_000
    lcols = left_cols if left_cols is not None else [
        c for c in left.columns if c != key]
    rcols = right_cols if right_cols is not None else [
        c for c in right.columns if c != key]
    l = left.select(
        F.col(key).alias("_k"),
        _epoch_us(F.col(left_ts)).alias("_lus"),
        *[F.col(c) for c in lcols],
    ).withColumn("_b", F.expr(f"_lus div {width_us}"))
    r = right.select(
        F.col(key).alias("_k"),
        _epoch_us(F.col(right_ts)).alias("_rus"),
        *[F.col(c).alias(c + suffix) for c in rcols],
    ).withColumn(
        "_b", F.explode(F.array(
            F.expr(f"_rus div {width_us}"),
            F.expr(f"_rus div {width_us} - 1"),
        ))
    )
    return (
        l.join(r, ["_k", "_b"])
        .filter((F.col("_rus") >= F.col("_lus"))
                & (F.col("_rus") < F.col("_lus") + width_us))
        .select(
            F.col("_k").alias(key),
            *lcols,
            *[F.col(c + suffix) for c in rcols],
            (F.col("_rus") - F.col("_lus")).cast("bigint").alias("gap_us"),
        )
    )


def gap_fill_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    bucket: str = "1 hour",
    value_col: str | None = None,
    max_buckets_per_key: int = 100_000,
) -> DataFrame:
    """Per-key fixed-width bucket counts DENSIFIED over each key's own
    [first, last] bucket range — gap buckets appear with zero counts.
    The resample / gap-fill primitive every monitoring and time-series
    feature pipeline needs, and the one aggregation shape a plain
    groupBy cannot express (absent groups produce no row).

    Returns ``(key, bucket_idx, bucket_ts, n_events, value_c)``:
    ``bucket_idx`` = epoch-µs div width (bigint — the exact join key),
    ``bucket_ts`` its start timestamp, ``value_c`` the exact
    integer-cents sum of ``value_col`` (0 for gaps; omitted when
    ``value_col`` is None).

    Scale shape: the only full-data shuffle is the (key, bucket) partial
    agg — map-side combined, output ≈ |observed buckets| ≪ |events|.
    The dense spine is built FROM the aggregate (per-key min/max is a
    second agg over already-bucketed rows, then one row-local
    sequence+explode), so spine size is time-span-bounded, never
    event-count-bounded, and the zero-fill join runs aggregate-vs-spine
    — both tiny relative to the input. A key idle for years with a
    1-second bucket would explode the spine; ``max_buckets_per_key``
    fails fast at plan-build time semantics (runtime assert per key)
    rather than OOM-ing an executor.
    """
    width = _parse_duration_us(bucket)
    agg_cols = [F.count(F.lit(1)).cast("bigint").alias("n_events")]
    fill = {"n_events": F.lit(0).cast("bigint")}
    if value_col is not None:
        agg_cols.append(
            F.sum(F.round(F.col(value_col) * 100).cast("bigint"))
            .alias("value_c"))
        fill["value_c"] = F.lit(0).cast("bigint")
    bucketed = (
        df.select(
            F.col(key_col).alias("key"),
            _epoch_us(F.col(ts_col)).alias("_us"),
            *( [F.col(value_col)] if value_col is not None else [] ),
        )
        .select(
            "key",
            F.expr(f"_us div {width}L").alias("bucket_idx"),
            *( [F.col(value_col)] if value_col is not None else [] ),
        )
        .groupBy("key", "bucket_idx")
        .agg(*agg_cols)
    )
    spans = bucketed.groupBy("key").agg(
        F.min("bucket_idx").alias("_lo"), F.max("bucket_idx").alias("_hi"))
    # the guard rides INSIDE the sequence bound so Catalyst cannot prune
    # it: a key spanning too many buckets fails the job, not the executor
    hi_guarded = F.when(
        F.col("_hi") - F.col("_lo") < F.lit(max_buckets_per_key),
        F.col("_hi"),
    ).otherwise(
        F.raise_error(
            f"gap_fill_counts: a key spans >= {max_buckets_per_key} "
            f"buckets at width {bucket!r} — widen the bucket"
        ).cast("bigint")
    )
    spine = spans.select(
        "key",
        F.explode(F.sequence("_lo", hi_guarded)).alias("bucket_idx"),
    )
    out = spine.join(bucketed, ["key", "bucket_idx"], "left")
    return out.select(
        "key",
        "bucket_idx",
        F.timestamp_add(
            "MICROSECOND",
            (F.col("bucket_idx") * F.lit(width)).cast("bigint"),
            F.lit(_EPOCH).cast("timestamp_ntz"),
        ).alias("bucket_ts"),
        *[F.coalesce(F.col(c), fill[c]).alias(c) for c in fill],
    )


def scd2_history(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Change log → slowly-changing-dimension TYPE-2 history: one
    validity interval per (key, value run) — ``(key, value, valid_from,
    valid_to, version, is_current)``, ``valid_to`` NULL for the open
    (current) interval. This is the MERGE-INTO-with-history pattern a
    lakehouse dimension table runs on every sync (the reference's Neo4j
    MERGE keeps only latest state, /root/reference/process/
    graph_updater.py:30-45; the graft keeps the full timeline so
    point-in-time KG queries — "what did we believe about this CVE in
    March" — stay answerable, same motivation as the snapshot catalog).

    Consecutive no-op writes are collapsed FIRST (null-safe value
    compare): a re-ingest that writes the same value must extend the
    interval, never split it — the idempotency contract resume relies
    on. ``tiebreak_col`` (any row-unique column) makes the order within
    equal timestamps deterministic in both engines. The open interval's
    ``valid_to`` is the SCD2 high-date sentinel (9999-12-31), not NULL —
    the standard convention, so point-in-time lookups are a plain
    ``ts BETWEEN valid_from AND valid_to`` with no NULL branch (and the
    column stays non-null for engines/fetch paths that mangle null
    timestamps).

    Scale shape: everything is windows over ONE partitioning (the key):
    the collapse lag, the valid_to lead, and the version number reuse
    the same shuffle — Catalyst plans a single Exchange; no joins, no
    driver state. Hot keys are bounded by a key's own change count
    (dimension churn, not corpus size).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    # lag(tiebreak) — row-unique and non-null — distinguishes "no
    # previous row" from "previous value is NULL": a key whose FIRST
    # value is NULL must still open an interval (eqNullSafe alone would
    # collapse it into the nonexistent predecessor)
    kept = (
        changes.select(key_col, ts_col, value_col, tiebreak_col)
        .withColumn("_prev", F.lag(value_col).over(w))
        .withColumn("_prev_tb", F.lag(tiebreak_col).over(w))
        .filter(
            F.col("_prev_tb").isNull()
            | ~F.col(value_col).eqNullSafe(F.col("_prev"))
        )
    )
    sentinel = F.lit("9999-12-31 00:00:00").cast(
        changes.schema[ts_col].dataType)
    return kept.select(
        F.col(key_col),
        F.col(value_col),
        F.col(ts_col).alias("valid_from"),
        F.coalesce(F.lead(ts_col).over(w), sentinel).alias("valid_to"),
        F.row_number().over(w).cast("bigint").alias("version"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )


def interval_concurrency(
    intervals: DataFrame,
    group_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Sweep-line concurrency over half-open ``[start, end)`` intervals:
    ``(grp, ts, concurrent)`` — the number of intervals active from
    ``ts`` (inclusive) until the next boundary. "Max concurrent
    sessions", license-seat peaks, connection-pool sizing: all reads of
    this timeline (peak = ``max(concurrent)`` per group).

    Half-open semantics make touching intervals unambiguous: an
    interval ending at t releases BEFORE one starting at t acquires —
    encoded structurally, not by sort order: both boundary deltas at
    one (grp, ts) collapse into a single net row BEFORE the running
    sum, so the cumsum never depends on intra-timestamp event order
    (the classic sweep-line tie bug this construction makes
    unrepresentable).

    Scale shape: one 2-rows-per-interval explode, one (grp, ts) net
    aggregation (map-side combinable), one per-group window cumsum
    riding the same partitioning. Intervals with ``end < start`` fail
    fast inside the aggregate (corrupt data, not a sortable opinion).
    """
    bad = F.col(end_col) < F.col(start_col)
    ev = intervals.select(
        F.col(group_col).alias("grp"),
        F.explode(F.array(
            F.struct(
                F.col(start_col).alias("ts"),
                F.when(bad, F.raise_error(F.lit(
                    "interval end precedes start"
                )).cast("int")).otherwise(F.lit(1)).alias("d"),
            ),
            F.struct(F.col(end_col).alias("ts"), F.lit(-1).alias("d")),
        )).alias("e"),
    ).select("grp", "e.ts", "e.d")
    net = ev.groupBy("grp", "ts").agg(
        F.sum("d").cast("bigint").alias("net"))
    w = (
        Window.partitionBy("grp").orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return net.select(
        "grp", "ts",
        F.sum("net").over(w).cast("bigint").alias("concurrent"),
    )


def period_over_period(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    bucket: str = "1 day",
) -> DataFrame:
    """Period-over-period event-count deltas on the DENSIFIED timeline:
    ``(key, bucket_idx, bucket_ts, n_events, prev_n, delta)`` — the
    WoW/DoD metric every monitoring dashboard runs, composed as
    ``gap_fill_counts`` + one lag. Composing on the gap-FILLED series
    is the point: a key that went quiet shows a real drop to zero and
    the recovery shows a real rise from zero, where the naive
    lag-over-sparse-groupBy silently compares across the gap (the
    classic WoW bug). The first period of each key is dropped (no
    predecessor), so every output column is non-null; the change ratio
    is the caller's ``delta / prev_n`` — delivered as the exact integer
    pair, not a float (prev_n = 0 periods stay representable).

    Scale shape: gap_fill's one partial agg + the spine join, then a
    lag over the per-key aggregate rows — all post-aggregate, sized by
    buckets, not events.
    """
    filled = gap_fill_counts(df, key_col, ts_col, bucket)
    w = Window.partitionBy("key").orderBy("bucket_idx")
    return (
        filled.withColumn(
            "prev_n", F.lag("n_events").over(w).cast("bigint"))
        .filter(F.col("prev_n").isNotNull())
        .withColumn(
            "delta", (F.col("n_events") - F.col("prev_n")).cast("bigint"))
    )
