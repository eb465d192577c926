"""Post-extraction text cleanup — exact-match semantics.

Reproduces the two cleanup modes of the reference:

* :func:`preprocess_text`      — ``ocr_app/utils/text_utils.py:12-34``
* :func:`clean_extracted_text` — ``src/utils.py:80-94``

Both are per-string, pure, and order-sensitive regex chains.  Note the
reference quirk (kept deliberately): in ``preprocess_text`` the ``\\s+``
collapse runs *first*, so the subsequent ``\\n{3,}`` rule can never fire —
the composed behavior, not the apparent intent, is the contract.
"""

from __future__ import annotations

import re

# preprocess_text chain (ocr_app/utils/text_utils.py:26,29,32)
_WS_RUN = re.compile(r"\s+")
_NL_RUN3 = re.compile(r"\n{3,}")
_NON_ASCII_RUN = re.compile(r"[^\x00-\x7F]+")

# clean_extracted_text chain (src/utils.py:86,89,92)
_NON_PRINTABLE = re.compile(r"[^\x20-\x7E\n\t]")
_BREAK_RUN3 = re.compile(r"(\r\n|\r|\n){3,}")


def preprocess_text(text: str) -> str:
    """Whitespace-collapse + ASCII-only cleanup.

    Chain: ``\\s+``->' ', ``\\n{3,}``->'\\n\\n' (dead after the first rule),
    ``[^\\x00-\\x7F]+``->'' , then ``strip()``.  Empty/None input -> "".
    Semantics: ``ocr_app/utils/text_utils.py:12-34``.
    """
    if not text:
        return ""
    text = _WS_RUN.sub(" ", text)
    text = _NL_RUN3.sub("\n\n", text)
    text = _NON_ASCII_RUN.sub("", text)
    return text.strip()


def clean_extracted_text(text: str) -> str:
    """Whitespace-collapse + printable-ASCII(+\\n\\t) cleanup.

    Chain: ``\\s+``->' ', ``[^\\x20-\\x7E\\n\\t]``->'' ,
    ``(\\r\\n|\\r|\\n){3,}``->'\\n\\n', then ``strip()``.
    Semantics: ``src/utils.py:80-94``.
    """
    if not text:
        return ""
    text = _WS_RUN.sub(" ", text)
    text = _NON_PRINTABLE.sub("", text)
    text = _BREAK_RUN3.sub("\n\n", text)
    return text.strip()


CLEANUP_MODES = {
    "preprocess": preprocess_text,
    "extracted": clean_extracted_text,
}
