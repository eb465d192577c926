"""Language identification — the deterministic Unicode-range fallback.

Semantics: the except-branch of ``src/utils.py:96-122`` (the langdetect
path is nondeterministic and out of the exact-match surface).  Order of
checks matters: zh -> ja -> ko -> ar -> ru -> en.
"""

from __future__ import annotations

import re

_RANGES = [
    ("zh", re.compile("[\u4e00-\u9fff]")),
    ("ja", re.compile("[\u3040-\u30ff]")),
    ("ko", re.compile("[\uac00-\ud7af]")),
    ("ar", re.compile("[\u0600-\u06ff]")),
    ("ru", re.compile("[\u0400-\u04ff]")),
]


def detect_language_fallback(text: str, min_len: int = 20) -> str:
    """Return a 2-letter code by first matching Unicode range; 'en' default.

    Texts shorter than ``min_len`` chars return 'en' (src/utils.py:98-99).
    """
    if not text or len(text) < min_len:
        return "en"
    for code, pat in _RANGES:
        if pat.search(text):
            return code
    return "en"
