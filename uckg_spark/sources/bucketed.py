"""Bucketed table layout for shuffle-free co-located joins.

At the 100 TB design point the expensive joins are the ones whose BOTH
sides are corpus-scale (doc↔doc pair tables, mention↔mention co-occurrence,
fact tables keyed by entity URI) — too big to broadcast, so a plain join
shuffles both sides on every query. Bucketing pays that shuffle ONCE at
write time: both tables are hash-partitioned into the same number of
buckets on the join key and every later join on that key is planned with
zero Exchange nodes — each task reads bucket i of both sides locally.
``sortBy`` additionally persists the within-bucket order so a
single-file-per-bucket layout also skips the sort phase of the
sort-merge join.

This is the disk-layout twin of the pipeline's in-memory co-location
(kg_pipeline pre-repartitions mention tables once and reuses the
partitioning across stages); use it for tables that are WRITTEN once and
JOINED often across jobs — the catalog's nodes/edges snapshots being the
canonical case.

Bucket metadata lives in the session catalog (saveAsTable), because
path-based parquet has nowhere to record it — the same reason production
deployments put these tables in a metastore/Iceberg catalog
(COVERAGE.md documents the in-container Iceberg probe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by ``key``.

    ``n_buckets`` must MATCH across tables that will be joined — unequal
    bucket counts force a re-shuffle of one side. Pick it for the target
    scale (≈ one bucket per expected scan task), not the test corpus.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left: str, right: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-key, same-bucket-count tables. The plan this yields
    has NO Exchange on either side (asserted by
    tests/test_bucketed_join.py against a non-bucketed control)."""
    return spark.table(left).join(spark.table(right), key, how)
