"""Pages-table IO (the Iceberg `pages` table stand-in).

Schema per BASELINE.json input_hint:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.
In production this is an Iceberg table partitioned by ``days(warc_ts)`` and
bucketed by url; in the sandbox it's the same layout on parquet through the
catalog shim (SURVEY.md §7.0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as Ty

PAGES_SCHEMA = Ty.StructType([
    Ty.StructField("url", Ty.StringType(), False),
    Ty.StructField("warc_ts", Ty.TimestampType(), True),
    Ty.StructField("html", Ty.BinaryType(), True),
    Ty.StructField("text", Ty.StringType(), True),
    Ty.StructField("lang", Ty.StringType(), True),
])


def pages_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    data = [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows]
    return spark.createDataFrame(data, PAGES_SCHEMA)


def write_pages(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").parquet(path)


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(PAGES_SCHEMA).parquet(path)
