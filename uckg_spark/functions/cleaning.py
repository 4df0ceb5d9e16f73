"""Column-cleaning helpers (SURVEY.md §2.7).

F10 — NaN→None normalization: the reference scrubs pandas NaN before JSON
(``df.replace({np.nan: None})``,
/root/reference/data_collection/attack_collection.py:119) and skips NaN
source ids (/root/reference/parse.py:232-234). Spark ingestion of
pandas-origin data needs the same scrub: NaN is NOT null to Catalyst.

F5 — trim discipline for id columns (strip before compare, pervasive:
/root/reference/data_collection/cve_collection.py:246, parse.py:282-288).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as Ty


def nan_to_null(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Replace NaN with NULL in float/double columns (F10). Idempotent."""
    targets = cols or [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, (Ty.FloatType, Ty.DoubleType))
    ]
    out = df
    for c in targets:
        out = out.withColumn(
            c, F.when(F.isnan(F.col(c)), F.lit(None)).otherwise(F.col(c))
        )
    return out


def trimmed(df: DataFrame, cols: list[str]) -> DataFrame:
    """F5: trim string id columns before joins/compares."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.trim(F.col(c)))
    return out
