"""Web link-graph construction over Common-Crawl-style page tables.

The corpus input (url, warc_ts, html, text, lang) is a web graph in
disguise: every ``<a href>`` is an edge. This family materializes it —
the upstream of host-level PageRank (plans/graphalgs.py), seed-list
discovery, and anchor-text relevance signals (anchor text is the classic
external document description, e.g. BM25F fields).

Scale shape:
- ONE Arrow kernel pass over (url, html) — the html column (the table,
  at 100 TB) is projected away inside the kernel and never shuffles;
  what leaves the scan stage is the edge list (~50-100 bytes/edge).
- link normalization is JVM column algebra (webtext.normalize_url);
- the host-graph rollup is one groupBy keyed on (src_host, dst_host) —
  map-side combinable, and hub hosts (the skew) are exactly what AQE
  skew-split handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as Ty

from ..kernel.links import extract_links
from .webtext import normalize_url, url_host

LINKS_SCHEMA = Ty.StructType([
    Ty.StructField("src", Ty.StringType(), False),
    Ty.StructField("dst", Ty.StringType(), False),
    Ty.StructField("anchor", Ty.StringType(), True),
    Ty.StructField("pos", Ty.IntegerType(), False),
])


def _links_batches(batches):
    import pandas as pd

    for pdf in batches:
        src, dst, anchor, pos = [], [], [], []
        for u, h in zip(pdf["url"], pdf["html"]):
            for i, (link, text) in enumerate(extract_links(h, u)):
                src.append(u)
                dst.append(link)
                anchor.append(text)
                pos.append(i)
        if src:
            yield pd.DataFrame(
                {"src": src, "dst": dst, "anchor": anchor, "pos": pos})


def page_links(pages: DataFrame) -> DataFrame:
    """pages(url, …, html, …) → (src, dst, anchor, pos): one row per
    extracted hyperlink, ``dst`` RFC-3986-normalized, ``pos`` the
    document-order index of the anchor within its page."""
    raw = pages.select("url", "html").mapInPandas(
        _links_batches, schema=LINKS_SCHEMA)
    return raw.select(
        "src", normalize_url(F.col("dst")).alias("dst"), "anchor", "pos")


def host_graph(links: DataFrame) -> DataFrame:
    """Edge list → host-level graph: (src_host, dst_host, n_links,
    n_pages, is_internal). ``n_pages`` = distinct linking pages —
    the host-pair support PageRank-over-hosts and link-spam scoring
    want (a single page with 10k sitewide-footer links counts once)."""
    return (
        links.groupBy(
            url_host(F.col("src")).alias("src_host"),
            url_host(F.col("dst")).alias("dst_host"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_links"),
            F.countDistinct("src").cast("bigint").alias("n_pages"),
        )
        .withColumn("is_internal", F.col("src_host") == F.col("dst_host"))
    )


def anchor_texts(links: DataFrame, k: int = 3) -> DataFrame:
    """Per-target anchor-text profile: the ``k`` most frequent distinct
    non-empty anchor strings pointing at each normalized url, with
    counts — the external-description signal web search indexes as a
    separate field. Deterministic order: (count desc, anchor asc).

    Scale: groupBy (dst, anchor) count (map-side combinable), then a
    per-dst window top-k — bounded by distinct anchors per target,
    which the first aggregation already collapsed."""
    from pyspark.sql import Window

    counts = (
        links.filter(F.col("anchor") != "")
        .groupBy("dst", "anchor")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.partitionBy("dst").orderBy(F.col("n").desc(), F.col("anchor"))
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
    )
