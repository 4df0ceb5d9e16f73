"""Vectorized HTML→text extraction (Arrow/pandas UDF over mapInPandas).

The reference's analog is BeautifulSoup scraping + ``itertext()`` joins
(/root/reference/data_collection/cwe_collection.py:23-36, 71-74). Here the
shared ``kernel.extract.extract_text`` runs inside ``mapInPandas``: Arrow
batches in, Arrow batches out, no per-row Python crossing the JVM boundary
(input_hint requirement). Byte-identity with the oracle holds because both
call the same kernel function.

Scale notes: each Arrow batch (≤ spark.sql.execution.arrow.maxRecordsPerBatch
rows) is processed independently — memory is flat in corpus size. The UDF
keeps url alongside text so downstream stages never need to re-join against
the raw html (the widest column is dropped as early as possible — at 100 TB
the html column IS the table).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as Ty

from ..kernel.extract import extract_text, text_sha256

EXTRACT_SCHEMA = Ty.StructType([
    Ty.StructField("url", Ty.StringType(), False),
    Ty.StructField("text", Ty.StringType(), True),
    Ty.StructField("text_sha256", Ty.StringType(), True),
])


def _extract_batches(batches):
    import pandas as pd

    for pdf in batches:
        texts = [extract_text(h) for h in pdf["html"]]
        yield pd.DataFrame({
            "url": pdf["url"],
            "text": texts,
            "text_sha256": [text_sha256(t) for t in texts],
        })


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → (url, text, text_sha256).

    Projects to (url, html) FIRST so the scan prunes every other column
    (check ReadSchema in .explain). The input's pre-extracted ``text``
    column is deliberately ignored — the extraction contract is ours.
    """
    return pages.select("url", "html").mapInPandas(
        _extract_batches, schema=EXTRACT_SCHEMA
    )
