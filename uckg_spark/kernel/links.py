"""Hyperlink extraction kernel: (href, anchor text) pairs from HTML.

Pure-stdlib (html.parser + urllib.parse), shared by the Spark Arrow
kernel (operators/webgraph.py) and the pytest oracle so both produce
identical link sets — the same shared-kernel byte-identity discipline as
kernel/extract.py. The reference scrapes pages for CONTENT only
(/root/reference/data_collection/cwe_collection.py:23-36); link-graph
construction is web-scale graft surface (a Common-Crawl corpus IS a web
graph — anchors are the edges PageRank, host-level spam scoring, and
seed discovery all consume).

Semantics (deterministic, documented quirks included):

- only ``<a href=...>`` elements produce links; an ``<a>`` opened inside
  an unclosed ``<a>`` implicitly closes it (HTML5 parsing behavior);
- anchor text is every text node between the open and close tag
  (nested formatting tags contribute), whitespace-normalized;
- ``javascript:``/``mailto:``/``tel:``/``data:`` and fragment-only
  hrefs are dropped; everything else resolves against the page url via
  RFC 3986 ``urljoin``; only http(s) results are kept.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin

_SKIP_SCHEMES = ("javascript:", "mailto:", "tel:", "data:")


class _LinkParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str]] = []
        self._href: str | None = None
        self._text: list[str] = []

    def _close_anchor(self) -> None:
        if self._href is not None:
            self.links.append((self._href, " ".join("".join(self._text).split())))
        self._href, self._text = None, []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag.rsplit(":", 1)[-1].lower() == "a":
            self._close_anchor()  # implicit close of a dangling <a>
            for k, v in attrs:
                if k.lower() == "href" and v is not None:
                    self._href = v.strip()
                    break

    def handle_endtag(self, tag: str) -> None:
        if tag.rsplit(":", 1)[-1].lower() == "a":
            self._close_anchor()

    def handle_data(self, data: str) -> None:
        if self._href is not None:
            self._text.append(data)


def extract_links(
    html: bytes | str | None, base_url: str
) -> list[tuple[str, str]]:
    """→ list of (absolute_url, anchor_text), in document order (the
    order is part of the contract: position-sensitive consumers like
    first-anchor attribution rely on it). Unparseable html → []."""
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _LinkParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        return []
    p._close_anchor()  # EOF inside an unclosed <a>
    out: list[tuple[str, str]] = []
    for href, text in p.links:
        if not href or href.startswith("#"):
            continue
        if href.lower().startswith(_SKIP_SCHEMES):
            continue
        absu = urljoin(base_url, href)
        if absu.startswith(("http://", "https://")):
            out.append((absu, text))
    return out
