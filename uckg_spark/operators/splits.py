"""Deterministic dataset splitting — hash-ranged train/valid/test.

Every training pipeline's first operator: assign each document to a
split with weights (say 98/1/1) such that (a) the assignment is a pure
function of the document id — reproducible across runs, clusters, and
engines, (b) adding new data NEVER reassigns an existing id (no eval
contamination when the corpus grows), and (c) no coordination or
shuffle is needed — the split is computed row-local.

``randomSplit`` fails (a) and (b): it is seeded per-partition, so the
same row flips splits when partitioning changes. The portable form is
hash-ranging: bucket = h(salt || id) mod total_weight, assigned to the
split owning that bucket range. The hash is the repo's portable 32-bit
md5 prefix (operators.dedup.h32), so the DuckDB twin reproduces every
assignment bit-exactly — auditable eval membership, which is exactly
what contamination reviews demand.

Scale shape: zero shuffles, whole-stage-codegen column algebra; the
split column then acts as a partition column downstream
(``.write.partitionBy('split')``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import h32


def dataset_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, int] | None = None,
    salt: str = "",
) -> DataFrame:
    """Append a ``split`` column: id → hash bucket → weighted range.

    ``weights`` maps split name → positive integer weight (insertion
    order defines the bucket ranges, so pass the same dict everywhere —
    the default is train/valid/test 98/1/1). ``salt`` re-rolls the
    assignment wholesale (a new experiment) without touching ids.
    """
    if weights is None:
        weights = {"train": 98, "valid": 1, "test": 1}
    if not weights or any(
        not isinstance(w, int) or w < 1 for w in weights.values()
    ):
        raise ValueError(f"weights must be positive integers: {weights}")
    total = sum(weights.values())
    bucket = F.pmod(
        h32(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
        F.lit(total),
    )
    edge = 0
    expr = None
    for name, w in weights.items():
        edge += w
        cond = bucket < edge
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)
