"""Deterministic entity-linking score kernel (TF-IDF cosine + alias prior).

Graft extension mandated by BASELINE.json north_star — the reference links
by exact id only (/root/reference/data_collection/cve_collection.py:384-389,
:261-287); fuzzy vendor/product surface forms need scoring. Shared by the
Spark mapInPandas linker and the oracle so scores are bit-identical.

Determinism contract (SURVEY.md §7 M3): fixed tokenizer (casefold,
alnum runs), IDF from the alias table ONLY (a broadcast-side constant, never
corpus-dependent), ties broken on (score desc, candidate_id asc).
"""

from __future__ import annotations

import math
import re
from collections import Counter

_TOKEN_RE = re.compile(r"[a-z0-9]+")

LINK_THRESHOLD = 0.20


def tokenize(s: str) -> list[str]:
    return _TOKEN_RE.findall(s.casefold())


def build_idf(alias_surface_forms: list[str]) -> dict[str, float]:
    """Document frequency over alias surface forms; idf = ln((1+N)/(1+df))+1."""
    n = len(alias_surface_forms)
    df: Counter[str] = Counter()
    for s in alias_surface_forms:
        df.update(set(tokenize(s)))
    return {t: math.log((1 + n) / (1 + c)) + 1.0 for t, c in df.items()}


def _tfidf(tokens: list[str], idf: dict[str, float]) -> dict[str, float]:
    tf = Counter(tokens)
    return {t: c * idf.get(t, 1.0) for t, c in tf.items()}


def cosine(a: dict[str, float], b: dict[str, float]) -> float:
    dot = sum(v * b.get(t, 0.0) for t, v in a.items())
    na = math.sqrt(sum(v * v for v in a.values()))
    nb = math.sqrt(sum(v * v for v in b.values()))
    if na == 0.0 or nb == 0.0:
        return 0.0
    return dot / (na * nb)


def candidate_tokens(canonical_id: str) -> list[str]:
    """vendor:product → tokens; technique ids score against themselves."""
    return tokenize(canonical_id.replace(":", " "))


def score_candidates(
    surface: str,
    candidates: list[tuple[str, float]],
    idf: dict[str, float],
) -> tuple[str, float] | None:
    """candidates: [(canonical_id, prior)]. Returns best (canonical_id,
    score) above LINK_THRESHOLD, ties → smallest canonical_id."""
    sv = _tfidf(tokenize(surface), idf)
    best: tuple[float, str] | None = None
    for cand_id, prior in candidates:
        cv = _tfidf(candidate_tokens(cand_id), idf)
        # token-identity shortcut keeps styled forms ("acmesoft-webgate")
        # at full score; cosine handles typo/split forms
        score = prior * max(
            cosine(sv, cv),
            1.0 if set(tokenize(surface)) == set(candidate_tokens(cand_id)) else 0.0,
        )
        score = round(score, 9)  # kill float-order noise across engines
        key = (-score, cand_id)
        if best is None or key < (-best[0], best[1]):
            best = (score, cand_id)
    if best is None or best[0] < LINK_THRESHOLD:
        return None
    return best[1], best[0]
