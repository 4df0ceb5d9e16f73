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
import re
from html import unescape as _unescape
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


# ---------------------------------------------------------------------------
# Fast scanner path (optimization round 6, guide §4.2 — make the per-task
# work fast once the job shape is right). ``html.parser`` walks the document
# with per-tag Python frames (goahead/parse_starttag/updatepos) and was
# ~75% of the fused extract+scan kernel's CPU. The scanner below replicates
# the parser's OBSERVABLE semantics for this extractor (character data
# outside script/style, entity-decoded, concatenated, stripped) using only
# C-speed str.find/regex work per tag, and FALLS BACK to the real parser
# for any construct whose handling it cannot prove identical (malformed
# tags, unterminated comments/PIs, marked sections, quoted '<' in
# attributes). Equivalence rests on mirroring html.parser 3.x internals:
# - data runs are rawdata[i : find('<', i)] passed through html.unescape
#   (goahead's convert_charrefs branch) — the scanner does exactly that;
# - start-tag extent comes from the parser's own
#   ``locatestarttagend_tolerant`` + the '>'/'/>' check
#   (check_for_whole_start_tag); a conservative strict-subset regex must
#   ALSO match the same extent, which proves the attr loop consumes every
#   attribute and parse_starttag emits no data;
# - <script>/<style> enter cdata mode whose end is the parser's own
#   ``re.compile(r'</\s*%s\s*>' % tag, re.I)`` (set_cdata_mode) — content
#   contributes nothing to this extractor either way;
# - end tags use the parser's ``endtagfind`` verbatim; comments use
#   ``--\s*>``; <!doctype ...> and bogus comments consume to the next '>'
#   and contribute nothing — all exactly the parser's terminated-case
#   behavior, with every unterminated/-1 case sent to the fallback.
# Byte-identity fast-vs-parser is pinned by tests (fixture corpus +
# adversarial strings).

_LOCATE_START = re.compile(
    r"""<[a-zA-Z][^\t\n\r\f />\x00]*      # tag name (html.parser tolerant)
  (?:[\s/]*
    (?:(?<=['"\s/])[^\s/>][^\s/=>]*
      (?:\s*=+\s*
        (?:'[^']*'
          |"[^"]*"
          |(?!['"])[^>\s]*
         )
        \s*
       )?(?:\s|/(?!>))*
     )*
   )?
  \s*
""",
    re.VERBOSE,
)
# strict subset: simple name, attrs are name or name=value with quote-free
# values — when THIS matches to the same extent, the parser's attr loop
# provably consumes everything and end.strip() is '>' or '/>'
_STRICT_TAG = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9:._-]*)"
    r"(?:\s+[a-zA-Z_:][a-zA-Z0-9_:.-]*"
    r"(?:\s*=\s*(?:'[^'<>]*'|\"[^\"<>]*\"|[^\s<>'\"`=/]+))?)*"
    r"\s*/?>")
_ENDTAG = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_COMMENT_CLOSE = re.compile(r"--\s*>")
_CDATA_CLOSE = {
    t: re.compile(r"</\s*%s\s*>" % t, re.IGNORECASE)
    for t in _SKIP_TAGS
}

_FALLBACK = object()


def _fast_extract(html: str):
    """Scanner twin of ``_TextExtractor``; returns the stripped text or
    ``_FALLBACK`` when the input needs the real parser."""
    out: list[str] = []
    emit = out.append
    pos = 0
    n = len(html)
    depth = 0  # suppression depth for namespaced <xhtml:script>-style tags
    while pos < n:
        lt = html.find("<", pos)
        if lt < 0:
            if depth == 0 and pos < n:
                emit(_unescape(html[pos:]))
            break
        if depth == 0 and lt > pos:
            emit(_unescape(html[pos:lt]))
        nxt = html[lt + 1 : lt + 2]
        if nxt and (("a" <= nxt <= "z") or ("A" <= nxt <= "Z")):
            sm = _STRICT_TAG.match(html, lt)
            if sm is None:
                return _FALLBACK
            lm = _LOCATE_START.match(html, lt)
            j = lm.end()
            if html.startswith("/>", j):
                endpos = j + 2
            elif html.startswith(">", j):
                endpos = j + 1
            else:
                return _FALLBACK
            if endpos != sm.end():
                return _FALLBACK
            # parser: end = rawdata[k:endpos].strip(); within the strict
            # subset that tail ends '/>' iff the tag text does (the '/'
            # may have been consumed by locatestarttagend's [\s/]* —
            # <script/> — so the j-based check alone is wrong)
            selfclose = html.endswith("/>", lt, endpos)
            tag = sm.group(1).lower()
            local = tag.rsplit(":", 1)[-1]
            pos = endpos
            if selfclose or local not in _SKIP_TAGS:
                continue
            if tag in _CDATA_CLOSE:
                # real <script>/<style>: parser cdata mode — content is
                # raw until the parser's own end pattern, or EOF
                em = _CDATA_CLOSE[tag].search(html, pos)
                if em is None:
                    break  # unterminated cdata: parser drops the tail too
                pos = em.end()
            else:
                depth += 1  # namespaced variant: normal scan, suppressed
        elif nxt == "/":
            em = _ENDTAG.match(html, lt)
            if em is None:
                return _FALLBACK
            if depth and em.group(1).lower().rsplit(":", 1)[-1] in _SKIP_TAGS:
                depth -= 1
            pos = em.end()
        elif html.startswith("<!--", lt):
            cm = _COMMENT_CLOSE.search(html, lt + 4)
            if cm is None:
                return _FALLBACK
            pos = cm.end()
        elif html.startswith("<?", lt):
            g = html.find(">", lt + 2)
            if g < 0:
                return _FALLBACK
            pos = g + 1
        elif html.startswith("<!", lt):
            if html.startswith("<![", lt):
                return _FALLBACK
            if html[lt : lt + 9].lower() == "<!doctype":
                g = html.find(">", lt + 9)
            else:  # bogus comment: consume to '>'
                g = html.find(">", lt + 2)
            if g < 0:
                return _FALLBACK
            pos = g + 1
        else:
            # lone '<' (not a construct): parser emits it as data
            if depth == 0:
                emit("<")
            pos = lt + 1
    return "".join(out).strip()


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
    fast = _fast_extract(html)
    if fast is not _FALLBACK:
        return fast
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
