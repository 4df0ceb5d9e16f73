"""Identifier gazetteers + a pure-Python Aho–Corasick automaton.

Regex shapes are inferred from the id formats the reference manipulates:
- CVE ``CVE-\\d{4}-\\d{4,}`` — ids built/compared at
  /root/reference/data_collection/cve_collection.py:388-389, 431-433
- CWE ``CWE-\\d+`` — prefixing at
  /root/reference/data_collection/cwe_collection.py:126 and
  /root/reference/data_collection/cve_collection.py:245
- CAPEC ``CAPEC-\\d+`` — /root/reference/parse.py:315-316
- ATT&CK technique ``T\\d{4}(\\.\\d{3})?`` — /root/reference/parse.py:428
- CPE 2.3 names — template at /root/reference/mapping/cve/cve_rml.ttl:155
  and the paper's Table IV.

Word-boundary discipline: a match must not be embedded in a longer
alphanumeric/dash run — ``CVE-123`` must NOT match (4-digit year missing)
and ``XCVE-2024-1234`` / ``CVE-2024-12345Z`` must not match either
(FIXTURES.md decoy spec).
"""

from __future__ import annotations

import re
from collections import deque

# fullmatch-able core patterns (validators)
CVE_RE = r"CVE-\d{4}-\d{4,}"
CWE_RE = r"CWE-\d+"
CAPEC_RE = r"CAPEC-\d+"
ATTACK_RE = r"T\d{4}(?:\.\d{3})?"
# cpe:2.3:<part a|h|o>:vendor:product:version:update:edition:lang:sw_edition
#   :target_sw:target_hw:other  — 11 colon-separated components after "2.3"
CPE_RE = r"cpe:2\.3:[aho](?::[^\s:]+){10}"

# scanner with boundary guards; longest-first alternation so T1059.003
# beats T1059 and CVE before CWE ordering never matters (disjoint prefixes)
_SCAN_RE = re.compile(
    r"(?<![A-Za-z0-9.-])"
    r"(?P<id>"
    + "|".join([CPE_RE, CVE_RE, CWE_RE, CAPEC_RE, ATTACK_RE])
    + r")(?![A-Za-z0-9])(?!\.\d)"
)

_KIND_VALIDATORS = [
    ("cpe", re.compile(CPE_RE + r"\Z")),
    ("cve", re.compile(CVE_RE + r"\Z")),
    ("cwe", re.compile(CWE_RE + r"\Z")),
    ("capec", re.compile(CAPEC_RE + r"\Z")),
    ("attack", re.compile(ATTACK_RE + r"\Z")),
]


def classify_id(token: str) -> str | None:
    for kind, rx in _KIND_VALIDATORS:
        if rx.match(token):
            return kind
    return None


def scan_ids(text: str | None) -> list[tuple[str, str, int]]:
    """Return [(kind, id, char_offset)] for every well-formed identifier.

    Deterministic: document order, overlaps resolved longest-match by the
    alternation order above.
    """
    if not text:
        return []
    out: list[tuple[str, str, int]] = []
    for m in _SCAN_RE.finditer(text):
        tok = m.group("id")
        kind = classify_id(tok)
        if kind is not None:
            out.append((kind, tok, m.start("id")))
    return out


# ---------------------------------------------------------------------------
# prefixers (F4, SURVEY.md §2.7)
# ---------------------------------------------------------------------------


def cwe_prefix(raw_id: str) -> str:
    """``"CWE-" + str(id)`` then strip
    (/root/reference/data_collection/cwe_collection.py:126,
    /root/reference/data_collection/cve_collection.py:245-246)."""
    return ("CWE-" + str(raw_id)).strip()


def capec_prefix(raw_id: str) -> str:
    """``"CAPEC-" + id`` (/root/reference/parse.py:315)."""
    return "CAPEC-" + str(raw_id)


def technique_prefix(entry_id: str) -> str:
    """``"T" + entry_id`` (/root/reference/parse.py:428)."""
    return "T" + str(entry_id)


# ---------------------------------------------------------------------------
# Aho–Corasick automaton for dictionary surface forms (vendor/product
# strings, ATT&CK technique names). Pure Python, built once on the driver,
# broadcast to executors; matching runs inside mapInPandas batches.
# ---------------------------------------------------------------------------


def normalize_surface(s: str) -> str:
    """Normalization applied to both dictionary entries and scanned text:
    casefold + collapse whitespace runs to single spaces. Deterministic and
    locale-independent."""
    return " ".join(s.casefold().split())


class AhoCorasick:
    """Classic trie + failure-link automaton. ``find(text)`` returns
    whole-word, non-overlapping-normalized matches as
    [(surface_form, char_offset)] in document order.

    Sized for real dictionaries (~1.3M CPE vendor/product strings): build is
    O(total pattern chars); the automaton is pickled into a Spark broadcast
    once per job, not per task.
    """

    def __init__(self, patterns: list[str]):
        # nodes: list of dicts char->node_id
        self._next: list[dict[str, int]] = [{}]
        self._fail: list[int] = [0]
        self._out: list[list[str]] = [[]]
        for p in sorted(set(patterns)):
            norm = normalize_surface(p)
            if not norm:
                continue
            node = 0
            for ch in norm:
                nxt = self._next[node].get(ch)
                if nxt is None:
                    nxt = len(self._next)
                    self._next.append({})
                    self._fail.append(0)
                    self._out.append([])
                    self._next[node][ch] = nxt
                node = nxt
            self._out[node].append(norm)
        # BFS failure links
        q: deque[int] = deque()
        for ch, nxt in self._next[0].items():
            q.append(nxt)
        while q:
            node = q.popleft()
            for ch, nxt in self._next[node].items():
                q.append(nxt)
                f = self._fail[node]
                while f and ch not in self._next[f]:
                    f = self._fail[f]
                self._fail[nxt] = self._next[f].get(ch, 0) if self._next[f].get(ch, 0) != nxt else 0
                self._out[nxt] = self._out[nxt] + self._out[self._fail[nxt]]

    @staticmethod
    def _is_word_char(ch: str) -> bool:
        return ch.isalnum() or ch in "._"

    def find(self, text: str) -> list[tuple[str, int]]:
        """Whole-word matches over the normalized text. Offsets are into the
        normalized string (deterministic given the shared normalizer)."""
        norm = normalize_surface(text)
        out: list[tuple[str, int]] = []
        node = 0
        for i, ch in enumerate(norm):
            while node and ch not in self._next[node]:
                node = self._fail[node]
            node = self._next[node].get(ch, 0)
            for pat in self._out[node]:
                start = i - len(pat) + 1
                before_ok = start == 0 or not self._is_word_char(norm[start - 1])
                after_ok = i + 1 >= len(norm) or not self._is_word_char(norm[i + 1])
                if before_ok and after_ok:
                    out.append((pat, start))
        out.sort(key=lambda t: (t[1], -len(t[0]), t[0]))
        return out
