"""Canonical JSON encoding matching the reference's ``json.dumps`` defaults.

The CPE ``titles`` literal must match byte-for-byte what the collector wrote
with ``json.dumps(titles_list)``
(/root/reference/data_collection/cve_collection.py:179-181) and the
lang-keyed variant ``json.dumps({t["lang"]: t["title"] ...})`` (:402):
default separators ``", "`` / ``": "``, ``ensure_ascii=True``, no sort_keys
(insertion order preserved).
"""

from __future__ import annotations

import json
from typing import Any


def dumps_reference(obj: Any) -> str:
    return json.dumps(obj)  # stock defaults — the whole point


def titles_literal(titles: list[dict[str, str]] | None) -> str | None:
    """cve_collection.py:179-181 — the dictionary collector stores the raw
    title list as a JSON string."""
    if titles is None:
        return None
    return json.dumps(titles)


def titles_lang_map_literal(titles: list[dict[str, str]] | None) -> str | None:
    """cve_collection.py:402 — the CVE-side enrichment re-keys titles by
    language before dumping. Insertion order = list order (dict preserves
    it; later duplicates of a lang overwrite earlier, same as the dict
    comprehension in the reference)."""
    if titles is None:
        return None
    return json.dumps({t["lang"]: t["title"] for t in titles})
