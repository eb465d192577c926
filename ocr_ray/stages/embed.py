"""Text → embedding computation (A7 analog).

The reference embeds text with a SentenceTransformer held by its model
manager (``ocr_app/models/model_manager.py:159-245``: lazy model load, then
``encode(chunks)`` → ndarray).  This environment has no model weights, so
the engine ships a **deterministic feature-hash embedder** with the same
pipeline role and the same actor shape: the "model" (hash spec) is built
once per actor in ``__init__``; ``__call__`` embeds a batch.

The hash is chosen to be *SQL-replicable* so the embedding pipeline gets a
real value-level DuckDB oracle (not just a rows-only check):

    token   = [a-z0-9]+ runs of lower(text)
    h(tok)  = fold over codepoints:  h = (h*31 + code) % 1000003,  h0 = 7
    bucket  = h % dim
    sign    = +1 if (h // dim) even else -1
    v[bucket] += sign  per token occurrence;  embedding = v / ||v||

Per-token hashes are memoized in the actor (the cache persists across
batches — the point of an actor pool over a stateless task pool); bucket
accumulation is one ``np.add.at`` per row.

Downstream consumers: ``embed_docs`` (oracle-checked), ``embed_text_knn``
(query-string → embedding → cosine top-k, oracle-checked), and the full
RAG orchestration in stages/rag.py (chunk → embed → retrieve → answer,
``ocr_app/rag/rag_processor.py:33-165`` analog).
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd

_TOKEN = re.compile(r"[a-z0-9]+")

HASH_MOD = 1000003
HASH_INIT = 7
HASH_MULT = 31


def hash_token(tok: str) -> int:
    """Polynomial codepoint hash — bit-identical to the DuckDB oracle's
    ``list_reduce(list_prepend(7, codes), (a,b) -> (a*31+b) % 1000003)``."""
    h = HASH_INIT
    for ch in tok:
        h = (h * HASH_MULT + ord(ch)) % HASH_MOD
    return h


class HashingEmbedder:
    """Actor-pool stage: adds ``embedding`` (float64 list, L2-normalized),
    ``emb_norm`` (pre-normalization norm), ``nnz`` and ``e0`` (first
    normalized component) columns to a text batch."""

    def __init__(self, dim: int = 64, text_col: str = "text",
                 id_col: str = "doc_id", keep_text: bool = False):
        self.dim = dim
        self.text_col = text_col
        self.id_col = id_col
        self.keep_text = keep_text
        self._cache: Dict[str, Tuple[int, float]] = {}

    def _feature(self, tok: str) -> Tuple[int, float]:
        f = self._cache.get(tok)
        if f is None:
            if len(self._cache) > 2_000_000:
                # bound actor heap on high-vocabulary corpora (same cap as
                # the lm/bloom token caches)
                self._cache.clear()
            h = hash_token(tok)
            f = (h % self.dim, 1.0 if (h // self.dim) % 2 == 0 else -1.0)
            self._cache[tok] = f
        return f

    def embed_one(self, text: str) -> Tuple[np.ndarray, float]:
        """(normalized embedding, pre-normalization norm) for one string."""
        m, norms = self.embed_many([text])
        return m[0], float(norms[0])

    def embed_many(self, texts) -> Tuple[np.ndarray, np.ndarray]:
        """(n, dim) normalized embeddings + per-row pre-norm norms in ONE
        vectorized pass: tokenize per row, hash only the batch's DISTINCT
        tokens (factorize + the actor cache), then a single flat
        scatter-add over (row*dim + bucket).  Value-identical to the
        per-row path — the accumulated quantities are ±1 integers, exact
        in float64 under any summation order."""
        import itertools

        n = len(texts)
        v = np.zeros((n, self.dim), dtype=np.float64)
        toks_per = [_TOKEN.findall(t.lower()) for t in texts]
        flat = list(itertools.chain.from_iterable(toks_per))
        if flat:
            counts = np.fromiter((len(t) for t in toks_per),
                                 dtype=np.int64, count=n)
            rows = np.repeat(np.arange(n, dtype=np.int64), counts)
            codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
            feats = [self._feature(t) for t in uniq]
            buckets = np.fromiter((f[0] for f in feats), dtype=np.int64,
                                  count=len(feats))
            signs = np.fromiter((f[1] for f in feats), dtype=np.float64,
                                count=len(feats))
            np.add.at(v.ravel(), rows * self.dim + buckets[codes],
                      signs[codes])
        norms = np.sqrt((v * v).sum(axis=1))
        nz = norms > 0
        v[nz] /= norms[nz, None]
        return v, norms

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m, norms = self.embed_many(list(batch[self.text_col]))
        out = {self.id_col: batch[self.id_col].to_numpy()}
        if self.keep_text:
            out[self.text_col] = batch[self.text_col].to_numpy()
        out.update({
            "embedding": [row.tolist() for row in m],
            # Python round(), not np.round: the oracle pinned the
            # correctly-rounded builtin; np.round's scale-rint-unscale can
            # differ in the last ulp on ties
            "emb_norm": [round(float(x), 6) for x in norms],
            "nnz": (m != 0).sum(axis=1).astype("int64"),
            "e0": [round(float(x), 6) for x in (m[:, 0] if len(m) else ())],
        })
        return pd.DataFrame(out)


def embed_query(query: str, dim: int = 64) -> np.ndarray:
    """Driver-side one-off: the normalized embedding of a query string
    (broadcast via ``ray.put`` to retrieval stages)."""
    emb, _ = HashingEmbedder(dim=dim).embed_one(query)
    return emb


# ---------------------------------------------------------------- store (S7)
def embed_documents(docs, dim: int = 64, text_col: str = "text",
                    id_col: str = "doc_id", concurrency: int = 2):
    """Text table -> embedding table (id, embedding, emb_norm, nnz, e0).
    Task pool (stages/taskpool.py): cheap setup, full task parallelism,
    no reservation deadlock; `concurrency` kept for API compat, ignored."""
    from ocr_ray.stages.taskpool import task_pool

    return docs.map_batches(
        task_pool(HashingEmbedder, dim=dim, text_col=text_col, id_col=id_col),
        batch_format="pandas",
    )


def save_embedding_store(embedded, path: str) -> None:
    """Persist an embedding table as a Parquet side table — the engine's
    analog of the reference's pickle store
    (``ocr_app/models/model_manager.py:204-245``): resumable, columnar,
    readable by any stage via ``load_embedding_store`` (no Python-object
    pickles in the data plane)."""
    embedded.write_parquet(path)


def load_embedding_store(path: str):
    import ray.data as rd

    return rd.read_parquet(path)
