"""Heuristic answer extraction from retrieved context.

Semantics: ``ocr_app/rag/rag_processor.py:167-236``.  Pure regex/string
logic: wh-word detection, stop-word strip, sentence split, name/date
extraction for who/when, else the sentence with most query terms.
"""

from __future__ import annotations

import re

_PUNCT = re.compile(r"[^\w\s]")
_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")
_NAME = re.compile(r"(?<!^)(?<![\.\!\?]\s)([A-Z][a-z]+(?:\s[A-Z][a-z]+)*)")
_DATE = re.compile(
    r"\b\d{1,2}[/-]\d{1,2}[/-]\d{2,4}\b"
    r"|\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]* \d{1,2},? \d{4}\b"
    r"|\b\d{4}\b"
)
_STOP_WORDS = {
    "the", "a", "an", "is", "are", "was", "were", "in", "on", "at",
    "by", "to", "for", "with", "about",
}


def extract_answer_from_context(query: str, context: str) -> str:
    query = query.lower().strip()
    query = _PUNCT.sub("", query)

    who = re.search(r"\bwho\b", query)
    when = re.search(r"\bwhen\b", query)

    query_terms = [t for t in query.split() if t.lower() not in _STOP_WORDS]

    sentences = _SENT_SPLIT.split(context)
    relevant = [s for s in sentences if any(t in s.lower() for t in query_terms)]
    if not relevant:
        return context

    if who:
        for sentence in relevant:
            names = _NAME.findall(sentence)
            if names:
                return names[0]
    elif when:
        for sentence in relevant:
            dates = _DATE.findall(sentence)
            if dates:
                return dates[0]

    if relevant:
        scores = [sum(1 for t in query_terms if t in s.lower()) for s in relevant]
        return relevant[scores.index(max(scores))].strip()

    return context.split(".")[0] + "."


_SUMM_WORD = re.compile(r"[a-z0-9]+")


def summarize_extractive(text: str, k: int = 2) -> str:
    """Luhn-style extractive summary: split sentences with the shared
    ``_SENT_SPLIT`` regex (the R5 answer-extraction splitter — identical
    semantics to the oracle's ``([.!?])\\s+`` -> chr(1) split), score each
    sentence by its count of significant words (lowercased ``[a-z0-9]+``
    tokens of length >= 5), keep the top ``k`` by (score DESC, position
    ASC), and emit them IN POSITION ORDER joined by one space — summaries
    read in document order, not score order.  Leading/trailing SPACES
    (only) are stripped, matching DuckDB ``trim()`` in the oracle — a
    trailing newline after a terminator is a real sentence boundary on
    both sides."""
    sents = _SENT_SPLIT.split(text.strip(" "))
    scored = sorted(
        (-sum(1 for w in _SUMM_WORD.findall(s.lower()) if len(w) >= 5), i)
        for i, s in enumerate(sents)
    )[:k]
    return " ".join(sents[i] for _, i in sorted(scored, key=lambda t: t[1]))
