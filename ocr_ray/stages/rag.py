"""RAG retrieval operators as table stages (SURVEY §2.6 R1/R3/R5).

The per-string semantics are the parity-verified functions in
ocr_ray.functions; these stages lift them over document tables:

* :func:`para_chunk_batch`  — R1 paragraph-aware chunk flat-map
  (``ocr_app/utils/text_utils.py:36-90``)
* :class:`KeywordTopK`      — R3 keyword retrieval per document
  (``ocr_app/utils/text_utils.py:117-155``); the query set is compiled once
  per actor
* :class:`AnswerExtractor`  — R5 heuristic answer extraction
  (``ocr_app/rag/rag_processor.py:167-236``)
"""

from __future__ import annotations

from typing import List

import pandas as pd

from ocr_ray.functions.answers import extract_answer_from_context
from ocr_ray.functions.chunking import get_text_chunks, split_text_into_chunks
from ocr_ray.functions.keywords import keyword_search


def para_chunk_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Flat-map each doc into R1 paragraph chunks: (doc_id, chunk_idx, chunk)."""
    doc_ids, idxs, chunks = [], [], []
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        for i, c in enumerate(split_text_into_chunks(text)):
            doc_ids.append(doc_id)
            idxs.append(i)
            chunks.append(c)
    return pd.DataFrame({"doc_id": doc_ids, "chunk_idx": idxs, "chunk": chunks})


class KeywordTopK:
    """Per-document keyword top-k over window chunks (R2 chunks + R3 scoring)."""

    def __init__(self, query: str, k: int = 3):
        self.query = query
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_id": [], "rank": [], "chunk": [], "rel_score": []}
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            chunks = get_text_chunks(text, 100, 20)
            for rank, (chunk, score) in enumerate(keyword_search(self.query, chunks, self.k)):
                out["doc_id"].append(doc_id)
                out["rank"].append(rank)
                out["chunk"].append(chunk)
                out["rel_score"].append(round(float(score), 6))
        return pd.DataFrame(out)


class AnswerExtractor:
    """Per-document heuristic QA: context = whole doc text (R5 semantics)."""

    def __init__(self, query: str):
        self.query = query

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "answer": [
                    extract_answer_from_context(self.query, t) for t in batch["text"]
                ],
            }
        )


class EmbedRAG:
    """R6 full RAG orchestration (``ocr_app/rag/rag_processor.py:33-110``):
    per document, paragraph-chunk -> embed chunks AND the query with the
    same embedder -> cosine retrieve top-k (``text_utils.py:158-169``:
    ``np.argsort(sims)[-k:][::-1]`` — reference tie order kept verbatim) ->
    context = top chunks joined with ' ' -> heuristic answer extraction
    (the QA-model slot).  Confidence = best cosine, per the reference's
    result dict shape.

    Actor-pool stage: the embedder (with its token cache) and the query
    vector are built once per actor; everything per batch is local to the
    batch — no shuffle."""

    def __init__(self, query: str, k: int = 3, dim: int = 64):
        import numpy as np

        from ocr_ray.stages.embed import HashingEmbedder

        self.np = np
        self.embedder = HashingEmbedder(dim=dim)
        self.qv, _ = self.embedder.embed_one(query)
        self.query = query
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        np = self.np
        out = {"doc_id": [], "answer": [], "confidence": [], "n_chunks": []}
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            chunks = split_text_into_chunks(text)
            if not chunks:
                answer, conf = "No text available to answer the question.", 0.0
            else:
                m = np.stack([self.embedder.embed_one(c)[0] for c in chunks])
                sims = m @ self.qv
                top = np.argsort(sims)[-self.k:][::-1]
                context = " ".join(chunks[i] for i in top)
                answer = extract_answer_from_context(self.query, context)
                conf = float(sims[top[0]])
            out["doc_id"].append(doc_id)
            out["answer"].append(answer)
            out["confidence"].append(round(conf, 6))
            out["n_chunks"].append(len(chunks))
        return pd.DataFrame(out)
