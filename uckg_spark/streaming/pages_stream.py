"""Structured Streaming variant of the ingest path.

The reference is batch-with-checkpoints (SURVEY.md §2.10 — no watermarks or
event-time windows exist there), so streaming is an OPTIONAL ingest mode:
the same extract → mention stages run as a file-source stream with
checkpointed exactly-once sinks. Mention detection and extraction reuse the
exact batch operators — mapInPandas works unchanged under readStream.

A windowed mention-rate aggregate (warc_ts event time + watermark) is
included as the monitoring surface (the reference's Prometheus counter
analog, /root/reference/network.py:15-18).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_pages
from ..operators.mentions import detect_mentions
from ..sources.pages import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, path: str, max_files: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def streaming_mentions(
    spark: SparkSession, pages_stream: DataFrame, alias_rows: list[dict]
) -> DataFrame:
    """Stream of (url, kind, token, canonical_id) mention rows."""
    extracted = extract_pages(pages_stream)
    return detect_mentions(spark, extracted, alias_rows)


def mention_rate(pages_stream: DataFrame) -> DataFrame:
    """10-minute tumbling page counts by lang with a 30-minute watermark —
    late pages beyond the watermark are dropped deterministically."""
    return (
        pages_stream.withWatermark("warc_ts", "30 minutes")
        .groupBy(F.window("warc_ts", "10 minutes").alias("w"), "lang")
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("w.start").alias("window_start"), "lang", "n_pages")
    )


def run_stream_once(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    alias_rows: list[dict],
) -> None:
    """Drain all available input once (Trigger.AvailableNow) into a parquet
    mention sink with an exactly-once checkpoint — the batch pipeline's
    resume contract, expressed in streaming."""
    stream = read_pages_stream(spark, in_path)
    mentions = streaming_mentions(spark, stream, alias_rows)
    q = (
        mentions.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
