"""Z-order data layout — multi-column clustering for scan pruning.

Parquet/Iceberg data skipping works off per-file min/max ranges; a
table sorted by one column prunes on that column only. Z-ordering
(Morton curve) interleaves the bits of several columns so that rows
close in EVERY dimension land in the same files — the lakehouse
OPTIMIZE ZORDER BY feature (Delta/Iceberg), rebuilt as plain Spark:
compute the interleaved key, range-partition by it, sort within
partitions, write. Range stats on each output file then bound ALL
z-ordered columns at once.

Exact semantics (oracle-portable): each value is first rank-compressed
by the caller or used raw as a non-negative bigint; ``zorder_value``
interleaves the low ``bits`` bits of each column, column 0 owning the
LEAST significant interleave lane. Pure bigint shifts/masks — the same
expression evaluates identically in DuckDB, so layout keys can be
verified cross-engine (they decide file placement, so silent drift
would scatter the layout).

Scale shape: the key is codegen column algebra; clustering is ONE
repartitionByRange (a range-exchange with sampled bounds) + in-
partition sort — exactly what a sort-based OPTIMIZE job does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each column (values
    must be non-negative; callers rank-compress skewed domains first).
    With ``k`` columns the result uses ``k*bits`` bits — keep
    ``k*bits <= 62`` so the key stays a positive bigint."""
    if not cols:
        raise ValueError("cols must be non-empty")
    if not 1 <= bits or len(cols) * bits > 62:
        raise ValueError(
            f"{len(cols)} cols x {bits} bits exceeds the 62-bit budget")
    k = len(cols)
    z = F.lit(0).cast("bigint")
    for ci, c in enumerate(cols):
        v = F.col(c).cast("bigint") if isinstance(c, str) else c.cast("bigint")
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftright(v, b).bitwiseAND(F.lit(1)), b * k + ci
            ).cast("bigint")
    return z


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    n_files: int = 32,
    bits: int = 16,
) -> DataFrame:
    """Return ``df`` re-clustered on the Morton key of ``cols`` —
    range-partitioned into ``n_files`` buckets and sorted within each,
    ready to write (one output file per partition ⇒ per-file min/max
    ranges are tight on every z-ordered column)."""
    keyed = df.withColumn("_z", zorder_value(list(cols), bits))
    return (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
