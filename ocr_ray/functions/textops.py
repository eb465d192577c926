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


# ---------------------------------------------------------------- vectorized
# Column-level Arrow (RE2) forms of the two cleanup chains, byte-identical to
# the scalar functions above for EVERY input string (property-tested in
# tests/test_textops_vector.py), ~3x faster on real payload batches.
#
# Why this is exact, not approximate:
# * RE2's ``\s`` is ASCII-only while Python's is Unicode-aware, so the
#   whitespace class below spells out Python's full ``\s`` charset for str
#   patterns — [\t\n\x0b\f\r\x1c-\x1f \x85\xa0  -
#      　] (nothing above U+3000 has the property).
# * After the leading ``\s+``-> ' ' collapse no \n/\r/\t survives anywhere
#   in the string, so the break-run rules (``\n{3,}`` / ``(\r\n|\r|\n){3,}``)
#   can never fire — the same documented dead-rule quirk the scalar chain
#   inherits from the reference — and are therefore omitted here.
# * ``utf8_trim_whitespace`` equals Python ``str.strip()`` on the chains'
#   outputs: rule 1 removed every whitespace char the two trim definitions
#   disagree on (\x1c-\x1f), and the residue is pure ASCII.
_PY_WS_CLASS = (
    "[\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f \x85\xa0  - "
    "    　]+"
)


def preprocess_column(arr):
    """Vectorized :func:`preprocess_text` over a pyarrow string array."""
    import pyarrow.compute as pc

    arr = pc.fill_null(arr, "")  # scalar chain maps None -> "" (the guard)
    ws = pc.replace_substring_regex(arr, pattern=_PY_WS_CLASS, replacement=" ")
    kept = pc.replace_substring_regex(ws, pattern=r"[^\x00-\x7F]+", replacement="")
    return pc.utf8_trim_whitespace(kept)


def clean_extracted_column(arr):
    """Vectorized :func:`clean_extracted_text` over a pyarrow string array."""
    import pyarrow.compute as pc

    arr = pc.fill_null(arr, "")  # scalar chain maps None -> "" (the guard)
    ws = pc.replace_substring_regex(arr, pattern=_PY_WS_CLASS, replacement=" ")
    kept = pc.replace_substring_regex(ws, pattern=r"[^\x20-\x7E\n\t]", replacement="")
    return pc.utf8_trim_whitespace(kept)


CLEANUP_COLUMN_MODES = {
    "preprocess": preprocess_column,
    "extracted": clean_extracted_column,
}
