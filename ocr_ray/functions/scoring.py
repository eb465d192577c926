"""Result-quality scoring — the best-of-N combiner's objective.

* :func:`score_ocr_result` — additive heuristic, ``src/ocr_module.py:448-476``
* :func:`score_result_01`  — 0..1 variant, ``ocr_app/core/ocr_engine.py:415-437``
"""

from __future__ import annotations

import re

_WORD = re.compile(r"\b\w+\b")

# byte -> 1 if ASCII alphanumeric: C-speed alnum counting via
# bytes.translate + count for the (dominant) all-ASCII case; identical to
# per-char str.isalnum for ASCII inputs
_ALNUM_TBL = bytes(
    1 if (48 <= b <= 57 or 65 <= b <= 90 or 97 <= b <= 122) else 0
    for b in range(256)
)


def score_ocr_result(text: str) -> float:
    """Additive quality score; higher is better.

    ``min(len/100, 10) + min(distinct_words/10, 10) + alnum_ratio*10
    + 5 if '\\n' in text, -5 if len < 20``; empty -> 0.
    Semantics: ``src/ocr_module.py:448-476``.
    """
    if not text:
        return 0.0
    score = 0.0
    score += min(len(text) / 100, 10)
    distinct = set(_WORD.findall(text.lower()))
    score += min(len(distinct) / 10, 10)
    if text.isascii():
        alnum = text.encode().translate(_ALNUM_TBL).count(1)
    else:
        alnum = sum(c.isalnum() for c in text)
    if len(text) > 0:
        score += (alnum / len(text)) * 10
    if "\n" in text:
        score += 5
    if len(text) < 20:
        score -= 5
    return score


def score_result_01(text: str) -> float:
    """0..1 quality score: ``min(1, len/100) * (alnum-or-space ratio)``.

    Empty -> 0.0.  Semantics: ``ocr_app/core/ocr_engine.py:415-437``.
    """
    if not text:
        return 0.0
    score = min(1.0, len(text) / 100)
    n = len(text)
    if n > 0:
        score *= sum(c.isalnum() or c.isspace() for c in text) / n
    return score
