"""Order-independent table fingerprints — reconciliation at copy scale.

After replicating 100 TB between clusters (or between this engine and
another), "did every row land?" cannot be answered by sorting both
sides. The scalable check is a COMMUTATIVE fingerprint: hash each row
canonically, SUM the hashes — addition is order- and
partitioning-independent, so two engines agree iff the multisets of
rows agree (modulo adversarial collisions, which an integrity check —
unlike a security boundary — does not defend against). The repo's
lineage already uses this trick for stage idempotency
(lineage.py row-hash sums, SURVEY §2 I2); this operator surfaces it as
a first-class per-partition-group audit.

Canonical row form: values cast to string, NULL → a sentinel that
cannot collide with data ('\\x00'), joined with the unit separator
'\\x1f', then the portable 32-bit md5 prefix (operators.dedup.h32).
Caller contract: pass engine-stable string renderings (bigints,
strings, pre-rounded integer cents) — raw doubles render differently
across engines and belong nowhere near a checksum.

Scale shape: map-side partial sums make the fingerprint one short
shuffle of |groups| rows; no sort anywhere. Sum overflow is fine up to
~2^31 rows per group in bigint; past that, swap the sum to
decimal(38,0) (the comparison semantics are unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import h32

NULL_SENTINEL = "\x00"
SEP = "\x1f"


def table_checksum(
    df: DataFrame,
    cols: list[str],
    group_col: str | None = None,
) -> DataFrame:
    """Commutative fingerprint of ``cols``: ``(grp?, n_rows, checksum)``
    — one row per ``group_col`` value (or a single global row). Two
    tables match iff both columns match per group."""
    if not cols:
        raise ValueError("cols must be non-empty")
    canon = F.concat_ws(
        SEP,
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(NULL_SENTINEL))
            for c in cols
        ],
    )
    keyed = df.select(
        *([F.col(group_col).alias("grp")] if group_col else []),
        h32(canon).alias("h"),
    )
    agg = [
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("h").cast("bigint").alias("checksum"),
    ]
    return keyed.groupBy("grp").agg(*agg) if group_col else keyed.agg(*agg)
