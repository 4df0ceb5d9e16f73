"""Deterministic HTML → text extraction kernel.

Reference semantics: ``get_clean_text(element) =
''.join(element.itertext()).strip()`` — concatenate ALL descendant text
nodes with NO separators, then strip the ends
(/root/reference/data_collection/cwe_collection.py:71-74). The web-page
analog adds two rules the reference applies at scrape time via
BeautifulSoup (/root/reference/data_collection/cwe_collection.py:23-36):
markup is not text, and ``<script>``/``<style>`` payloads are code, not
prose.

This extractor is stdlib-only (``html.parser``) so the byte-level output
cannot drift with bs4/lxml versions (SURVEY.md §7.3 risk 1). Entity and
character references are decoded by the parser (``convert_charrefs=True``),
matching ``itertext()``'s decoded view of the DOM.

Rules, exactly:
1. All character data outside <script>/<style> subtrees is concatenated in
   document order with no inserted separators.
2. Entity/char refs decode to their code points (&amp; → &, &#x2019; → ’).
3. CDATA-ish declarations and comments contribute nothing.
4. The final string is ``.strip()``-ped (ends only — interior whitespace
   runs are preserved verbatim, as ``itertext`` preserves them).
"""

from __future__ import annotations

import hashlib
from html.parser import HTMLParser

_SKIP_TAGS = ("script", "style")


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._chunks: list[str] = []
        self._skip_depth = 0

    @staticmethod
    def _local(tag: str) -> str:
        # namespace-qualified tags (<xhtml:p>) compare on the local name
        return tag.rsplit(":", 1)[-1]

    def handle_starttag(self, tag: str, attrs) -> None:
        if self._local(tag) in _SKIP_TAGS:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if self._local(tag) in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and data:
            self._chunks.append(data)

    def text(self) -> str:
        return "".join(self._chunks).strip()


def extract_text(html: bytes | str | None) -> str | None:
    """Extract visible text from an HTML document, deterministically.

    ``None`` in → ``None`` out (null ⇒ no triple downstream, the RML rule
    P7, SURVEY.md §2.2). Bytes are decoded UTF-8 with replacement — the
    decode must itself be deterministic for byte-identity.
    """
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return p.text()


def xml_clean_text(parts: list[str | None]) -> str | None:
    """The reference's ``get_clean_text`` join semantics over pre-split text
    nodes: no-separator join then strip
    (/root/reference/data_collection/cwe_collection.py:71-74)."""
    if parts is None:
        return None
    return "".join(x for x in parts if x).strip()


def text_sha256(text: str | None) -> str | None:
    if text is None:
        return None
    return hashlib.sha256(text.encode("utf-8")).hexdigest()
