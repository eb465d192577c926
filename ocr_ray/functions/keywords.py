"""Keyword-based chunk retrieval (top-k).

* :func:`keyword_search`          — ``ocr_app/utils/text_utils.py:117-155``
* :func:`fallback_keyword_search` — ``src/utils.py:60-78``

Both are pure; tie order among equal scores follows numpy's DEFAULT
``argsort`` (quicksort — not stable in general, though it coincides with
insertion-sort order for the small chunk counts here; the
``rag_keyword_topk`` oracle encodes the observed last-index-first tie
order and bounds chunk counts accordingly).  The final-score floor
behavior is part of the contract.
"""

from __future__ import annotations

import re
from typing import List, Tuple

import numpy as np

_WORD = re.compile(r"\w+")
_NON_WORD_SPACE = re.compile(r"[^\w\s]")


def keyword_search(query: str, chunks: List[str], k: int = 3) -> List[Tuple[str, float]]:
    """Score = 0.5*|query∩chunk words| + substring hits of >3-char query words;
    top-k by numpy default argsort (reference parity — NOT kind='stable'),
    normalized by max score; floor-0.1 fallback when nothing scores > 0."""
    query = query.lower()
    query_words = set(_WORD.findall(query))
    scores: List[float] = []
    for chunk in chunks:
        chunk_lower = chunk.lower()
        chunk_words = set(_WORD.findall(chunk_lower))
        word_matches = len(query_words.intersection(chunk_words))
        phrase_score = 0
        for word in query_words:
            if len(word) > 3 and word in chunk_lower:
                phrase_score += 1
        scores.append(word_matches * 0.5 + phrase_score)
    if not scores:
        return []
    top = np.argsort(scores)[-k:][::-1]
    max_score = max(scores) if max(scores) > 0 else 1
    result = [(chunks[i], scores[i] / max_score) for i in top if scores[i] > 0]
    if not result and chunks:
        return [(chunks[i], 0.1) for i in top[:k]]
    return result


def fallback_keyword_search(chunks: List[str], query: str, k: int = 3) -> List[str]:
    """Score = count of query words present in the cleaned chunk word set;
    stable sort descending; return top-k chunks with score > 0."""
    query_words = set(_NON_WORD_SPACE.sub("", query.lower()).split())
    scored = []
    for chunk in chunks:
        clean = _NON_WORD_SPACE.sub("", chunk.lower())
        chunk_words = set(clean.split())
        score = sum(1 for w in query_words if w in chunk_words)
        scored.append((chunk, score))
    scored.sort(key=lambda cs: cs[1], reverse=True)
    return [c for c, s in scored[:k] if s > 0]
