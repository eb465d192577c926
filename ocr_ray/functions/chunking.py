"""Text chunking for retrieval.

* :func:`split_text_into_chunks` — paragraph-aware, char-budget packing with
  word-count overlap; ``ocr_app/utils/text_utils.py:36-90``.
  Quirk kept: the text is cleaned with ``preprocess_text`` first, which
  collapses every newline, so the paragraph split ``\\n\\s*\\n`` never fires
  and the whole text packs as one paragraph.
* :func:`get_text_chunks` — fixed word-window with stride; ``src/utils.py:10-24``.
"""

from __future__ import annotations

import re
from typing import List

from ocr_ray.functions.textops import preprocess_text

_PARA_SPLIT = re.compile(r"\n\s*\n")


def split_text_into_chunks(text: str, chunk_size: int = 200, overlap: int = 50) -> List[str]:
    """Pack words into chunks of <= ``chunk_size`` chars, overlapping by up to
    ``overlap`` *words* (the reference measures overlap in list items)."""
    if not text:
        return []
    text = preprocess_text(text)
    chunks: List[str] = []
    for para in _PARA_SPLIT.split(text):
        if len(para) <= chunk_size:
            chunks.append(para)
            continue
        words = para.split()
        current: List[str] = []
        current_len = 0
        for word in words:
            word_len = len(word) + 1
            if current_len + word_len > chunk_size and current:
                chunks.append(" ".join(current))
                keep = min(overlap, len(current))
                current = current[-keep:]
                current_len = sum(len(w) + 1 for w in current)
            current.append(word)
            current_len += word_len
        if current:
            chunks.append(" ".join(current))
    return chunks


def get_text_chunks(text: str, chunk_size: int = 100, overlap: int = 20) -> List[str]:
    """Word windows ``words[i:i+chunk_size]`` at stride ``chunk_size-overlap``."""
    if not text:
        return []
    words = text.split()
    if not words:
        return []
    chunks: List[str] = []
    for i in range(0, len(words), chunk_size - overlap):
        chunk = " ".join(words[i : i + chunk_size])
        if chunk:
            chunks.append(chunk)
    return chunks
