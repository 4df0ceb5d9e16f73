"""Ordered event funnel — staged conversion counts over a user stream.

Given an ordered list of stage event types (view → click → purchase),
count how many users reached each stage, where "reached stage i" means
an event of type i STRICTLY AFTER the user's reach-time of stage i-1
(the classic funnel semantics: a purchase before the first view does
not count). This is the engagement-analysis twin of the repo's
sessionize operator and the shape of every conversion/abandonment
report run over a 100 TB event log.

Scale shape: ONE shuffle. All stage reach-times are unbounded
partition-only windows over the same user partitioning, so Catalyst
plans a single Exchange feeding a chain of Window operators (no
orderBy → no sort, each window is a running min over the partition);
the per-user collapse then rides that same partitioning, and the
final stage counts are a single-row global aggregate. No joins, no
per-stage re-scan of the input.

Reach-time recurrence: r_0 = min(ts | type = s_0);
r_i = min(ts | type = s_i AND ts > r_{i-1}). A NULL r_{i-1} nulls the
comparison, the when() yields NULL, and min ignores it — users who
never reached stage i-1 fall out of stage i for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
) -> DataFrame:
    """First-order Markov transition counts over each key's event
    sequence: ``(prev_type, next_type, n)`` — the behavioral-model
    summary (what follows what) that funnels are a special case of.

    Determinism: the sequence order is ``(ts, id)`` — the id tiebreak
    matters because equal timestamps are routine in event logs and an
    order-dependent lag over ties would differ per engine/partitioning.
    One window shuffle on the key, then a map-side-combining count agg
    whose output cardinality is |types|² — independent of row count.
    """
    w = Window.partitionBy("k").orderBy("ts", "id")
    return (
        df.select(
            F.col(key_col).alias("k"),
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("id"),
            F.col(type_col).alias("t"),
        )
        .withColumn("prev_type", F.lag("t").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("t").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def funnel_counts(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    stages: tuple[str, ...],
) -> DataFrame:
    """Per-stage funnel reach: ``(stage, stage_name, n_users)`` with
    ``stage`` 1-based in funnel order. Users reach stage i only via an
    event strictly after their stage-(i-1) reach time."""
    if len(stages) < 2:
        raise ValueError("a funnel needs at least 2 stages")
    if len(set(stages)) != len(stages):
        raise ValueError(f"duplicate stage types: {stages}")
    w = Window.partitionBy("u")
    cur = df.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.col(ts_col).alias("ts"),
    )
    for i, s in enumerate(stages):
        cond = F.col("t") == s
        if i > 0:
            cond = cond & (F.col("ts") > F.col(f"r{i - 1}"))
        cur = cur.withColumn(f"r{i}", F.min(F.when(cond, F.col("ts"))).over(w))
    per_user = cur.groupBy("u").agg(
        *[F.max(f"r{i}").alias(f"r{i}") for i in range(len(stages))]
    )
    totals = per_user.agg(
        *[
            F.count(f"r{i}").alias(f"n{i}")  # count skips NULLs
            for i in range(len(stages))
        ]
    )
    stacked = ", ".join(
        f"{i + 1}L, '{s}', n{i}" for i, s in enumerate(stages)
    )
    return totals.selectExpr(
        f"stack({len(stages)}, {stacked}) AS (stage, stage_name, n_users)"
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Classic retention triangle: users grouped by FIRST-ACTIVE day
    (their cohort), then for each later offset k the fraction still
    active — ``(cohort_day, k, n_active, cohort_n)`` with retention the
    exact ``n_active/cohort_n`` rational (k = 0 rows are the cohort
    definition itself, n_active = cohort_n). The engagement metric
    every event product reports, and the missing sibling of the funnel
    / session / attribution family.

    Day arithmetic is epoch-µs integer division (the repo's
    TIMESTAMP_NTZ convention — no timezone, no DST edge); "active" is
    set-semantics per (user, day), so event volume doesn't inflate
    retention. Offsets with zero active users produce NO row (the
    triangle is naturally sparse; densify with gap_fill-style spines
    downstream if a chart needs zeros).

    Scale shape: one distinct (user, day) projection (map-side
    combinable), a per-user min for the cohort (same shuffle key), a
    user-keyed join back, then the (cohort, k) count — every stage
    keyed on the user or the cohort, nothing quadratic.
    """
    day = (_epoch_us_days(F.col(ts_col))).alias("day")
    active = df.select(F.col(user_col).alias("u"), day).distinct()
    cohort = active.groupBy("u").agg(F.min("day").alias("cohort_day"))
    joined = active.join(cohort, "u").select(
        "u", "cohort_day", (F.col("day") - F.col("cohort_day")).alias("k"))
    sizes = cohort.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_n"))
    return (
        joined.groupBy("cohort_day", "k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_day")
        .select("cohort_day", F.col("k").cast("bigint").alias("k"),
                "n_active", "cohort_n")
    )


def _epoch_us_days(ts):
    """Whole days since the epoch for TIMESTAMP_NTZ (integer µs div)."""
    return (
        F.timestamp_diff(
            "MICROSECOND",
            F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), ts)
        / F.lit(86_400_000_000)
    ).cast("bigint")
