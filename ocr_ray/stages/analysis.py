"""Text-analysis operators over document tables (SURVEY §2.2 M9-M15 applied
at table scale, plus the training-data-pipeline extras: token counting,
quality scoring, language-ID).

All stages are ``map_batches`` functions over pandas/pyarrow batches; the
per-row scalar semantics come from ocr_ray.functions (reference parity).
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa

from ocr_ray.functions.chunking import get_text_chunks
from ocr_ray.functions.langid import detect_language_fallback
from ocr_ray.functions.scoring import score_ocr_result
from ocr_ray.functions.textops import clean_extracted_text, preprocess_text

_WORD = re.compile(r"\w+")

# stop-word set from the reference's answer extraction
# (ocr_app/rag/rag_processor.py:193)
STOP_WORDS = (
    "the", "a", "an", "is", "are", "was", "were", "in", "on", "at",
    "by", "to", "for", "with", "about",
)
_STOP_SET = frozenset(STOP_WORDS)


def clean_docs_batch(batch: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "clean_preprocess": [preprocess_text(t) for t in batch["text"]],
            "clean_extracted": [clean_extracted_text(t) for t in batch["text"]],
        }
    )


def score_docs_batch(batch: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "score": [round(score_ocr_result(t), 6) for t in batch["text"]],
        }
    )


def quality_docs_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Token counting + quality signals (length / stopword ratio / mean token
    length) — the language-model-data quality-scoring analog of M15."""
    rows: Dict[str, List] = {
        "doc_id": [], "n_chars": [], "n_tokens": [], "n_distinct": [],
        "stop_ratio": [], "mean_token_len": [], "lang_fallback": [],
    }
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        toks = _WORD.findall(text.lower())
        n = len(toks)
        rows["doc_id"].append(doc_id)
        rows["n_chars"].append(len(text))
        rows["n_tokens"].append(n)
        rows["n_distinct"].append(len(set(toks)))
        rows["stop_ratio"].append(round(sum(t in _STOP_SET for t in toks) / max(1, n), 6))
        rows["mean_token_len"].append(round(sum(len(t) for t in toks) / max(1, n), 6))
        rows["lang_fallback"].append(detect_language_fallback(text))
    return pd.DataFrame(rows)


def chunk_docs_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Flat-map each document into its word-window chunks (R2 semantics,
    ``src/utils.py:10-24``): one output row per (doc_id, chunk_idx)."""
    doc_ids: List[int] = []
    idxs: List[int] = []
    chunks: List[str] = []
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        for i, chunk in enumerate(get_text_chunks(text, 100, 20)):
            doc_ids.append(doc_id)
            idxs.append(i)
            chunks.append(chunk)
    return pd.DataFrame({"doc_id": doc_ids, "chunk_idx": idxs, "chunk": chunks})


def fingerprint_docs_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Document fingerprinting: deterministic 64-bit content hash + a rolling
    polynomial hash over the token stream (Rabin-Karp style)."""
    import hashlib

    out = {"doc_id": [], "content_sha": [], "rolling_fp": []}
    B, M = 1000003, (1 << 61) - 1
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        out["doc_id"].append(doc_id)
        out["content_sha"].append(hashlib.sha256(text.encode()).hexdigest()[:16])
        fp = 0
        for tok in text.split():
            h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
            fp = (fp * B + h) % M
        out["rolling_fp"].append(fp)
    return pd.DataFrame(out)
