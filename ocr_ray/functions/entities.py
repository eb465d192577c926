"""Entity extraction (dates / emails / phones / urls).

Semantics: ``ocr_app/utils/text_utils.py:191-231``.  The three date
patterns run in order (IGNORECASE) and their matches are concatenated,
so overlapping formats can yield duplicates — kept as-is.
"""

from __future__ import annotations

import re
from typing import Dict, List

_DATE_PATTERNS = [
    re.compile(r"\b\d{1,2}[/-]\d{1,2}[/-]\d{2,4}\b", re.IGNORECASE),
    re.compile(r"\b\d{4}[/-]\d{1,2}[/-]\d{1,2}\b", re.IGNORECASE),
    re.compile(
        r"\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]* \d{1,2},? \d{4}\b",
        re.IGNORECASE,
    ),
]
_EMAIL = re.compile(r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b")
_PHONE = re.compile(r"\b(?:\+\d{1,3}[- ]?)?\(?\d{3}\)?[- ]?\d{3}[- ]?\d{4}\b")
_URL = re.compile(r"https?://(?:[-\w.]|(?:%[\da-fA-F]{2}))+")


def extract_entities(text: str) -> Dict[str, List[str]]:
    """Return ``{'dates': [...], 'emails': [...], 'phones': [...], 'urls': [...]}``."""
    dates: List[str] = []
    for pat in _DATE_PATTERNS:
        dates.extend(pat.findall(text))
    return {
        "dates": dates,
        "emails": _EMAIL.findall(text),
        "phones": _PHONE.findall(text),
        "urls": _URL.findall(text),
    }

_REDACT_ORDER = [
    (_URL, "[URL]"),
    (_EMAIL, "[EMAIL]"),
    (_PHONE, "[PHONE]"),
    (_DATE_PATTERNS[0], "[DATE]"),
    (_DATE_PATTERNS[1], "[DATE]"),
    (_DATE_PATTERNS[2], "[DATE]"),
]


def redact_pii(text: str) -> Dict[str, object]:
    """PII redaction over the M11 entity patterns: sequential replace in a
    FIXED order (url -> email -> phone -> the three date patterns), counts
    taken on the ORIGINAL text.  Order and count basis are part of the
    contract — the DuckDB oracle nests ``regexp_replace(..., 'g')`` in the
    same order and runs ``regexp_extract_all`` on the raw column."""
    counts = {
        "n_urls": len(_URL.findall(text)),
        "n_emails": len(_EMAIL.findall(text)),
        "n_phones": len(_PHONE.findall(text)),
        "n_dates": sum(len(p.findall(text)) for p in _DATE_PATTERNS),
    }
    red = text
    for pat, tag in _REDACT_ORDER:
        red = pat.sub(tag, red)
    return {"redacted": red, **counts}
