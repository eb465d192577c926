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

from typing import Callable, List, Optional

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


class SentenceOverlapQA:
    """Deterministic stand-in for the reference's HF QA pipeline
    (``ocr_app/models/model_manager.py:114-157`` loads
    ``pipeline("question-answering", model="distilbert-...-squad")``):
    same call contract — ``qa(question, context)`` returns
    ``{"answer", "score", "start", "end"}`` — with extractive semantics
    (the answer is a span of the context): the sentence with the highest
    query-word overlap wins, score = overlap fraction.  A real deployment
    replaces this class with the HF pipeline object and nothing else in
    the stage changes; construction happens once per actor (load-once)."""

    def __init__(self):
        import re

        self._sent = re.compile(r"[^.!?]+[.!?]?")
        self._word = re.compile(r"[a-z0-9]+")

    def __call__(self, question: str, context: str) -> dict:
        qwords = {w for w in self._word.findall(question.lower()) if len(w) > 2}
        best, best_n, best_span = "", -1, (-1, -1)
        for m in self._sent.finditer(context):
            g = m.group()
            sent = g.strip()
            # DISTINCT matched query words over word tokens (punctuation
            # stripped): sentence-final words match despite the trailing
            # '.', and repeating one query word cannot push score past 1
            n = len(qwords.intersection(self._word.findall(sent.lower())))
            if n > best_n:
                # span from the MATCH position (+ leading-strip offset),
                # not context.find(sent): overlapping top-k chunks repeat
                # sentences, and find() would point at the first copy
                # even when a later occurrence won
                lead = len(g) - len(g.lstrip())
                best, best_n = sent, n
                best_span = (m.start() + lead, m.start() + lead + len(sent))
        score = max(best_n, 0) / max(len(qwords), 1)  # [0, 1] by construction
        start, end = best_span if best else (-1, -1)
        return {"answer": best, "score": round(float(score), 6),
                "start": start, "end": end}


class EmbedRAG:
    """R6 full RAG orchestration (``ocr_app/rag/rag_processor.py:33-110``):
    per document, paragraph-chunk -> embed chunks AND the query with the
    same embedder -> cosine retrieve top-k (``text_utils.py:158-169``:
    ``np.argsort(sims)[-k:][::-1]`` — reference tie order kept verbatim) ->
    context = top chunks joined with ' ' -> answer extraction.

    ``answer_fn`` is the pluggable QA-model slot (A6): any callable with
    the HF question-answering pipeline contract
    ``fn(question, context) -> {"answer", "score", ...}`` — e.g.
    :class:`SentenceOverlapQA`, or a real
    ``transformers.pipeline("question-answering", ...)`` where available.
    ``None`` keeps the parity-verified heuristic extractor (R5) and the
    output schema of previous rounds; with a model the per-row ``answer``
    comes from the model and ``answer_score`` carries its score.
    Confidence stays the best cosine, per the reference's result dict.

    Actor-pool stage: the embedder (with its token cache), the query
    vector AND the answer model are built once per actor; everything per
    batch is local to the batch — no shuffle."""

    def __init__(
        self,
        query: str,
        k: int = 3,
        dim: int = 64,
        answer_fn: "Optional[Callable[[], Callable]]" = None,
    ):
        import numpy as np

        from ocr_ray.stages.embed import HashingEmbedder

        self.np = np
        self.embedder = HashingEmbedder(dim=dim)
        self.qv, _ = self.embedder.embed_one(query)
        self.query = query
        self.k = k
        # answer_fn is a zero-arg FACTORY (e.g. the class itself) so model
        # construction/weight load happens here, once per actor — passing a
        # constructed model from the driver would serialize its weights
        # into every task submission instead
        self.answer_model = answer_fn() if answer_fn is not None else None

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        np = self.np
        out = {"doc_id": [], "answer": [], "confidence": [], "n_chunks": []}
        scores = [] if self.answer_model is not None else None
        # one vectorized embed over every chunk in the batch (value-
        # identical to per-chunk embed_one; distinct-token hashing
        # amortizes across documents), then per-doc similarity slices
        chunk_lists = [split_text_into_chunks(t) for t in batch["text"]]
        flat = [c for cl in chunk_lists for c in cl]
        if flat:
            m, _ = self.embedder.embed_many(flat)
            sims_flat = m @ self.qv
        bounds = np.cumsum([0] + [len(cl) for cl in chunk_lists])
        for i, (doc_id, chunks) in enumerate(zip(batch["doc_id"],
                                                 chunk_lists)):
            ans_score = 0.0
            if not chunks:
                answer, conf = "No text available to answer the question.", 0.0
            else:
                sims = sims_flat[bounds[i]:bounds[i + 1]]
                top = np.argsort(sims)[-self.k:][::-1]
                context = " ".join(chunks[i] for i in top)
                if self.answer_model is not None:
                    res = self.answer_model(self.query, context)
                    answer, ans_score = res["answer"], float(res["score"])
                else:
                    answer = extract_answer_from_context(self.query, context)
                conf = float(sims[top[0]])
            out["doc_id"].append(doc_id)
            out["answer"].append(answer)
            out["confidence"].append(round(conf, 6))
            out["n_chunks"].append(len(chunks))
            if scores is not None:
                scores.append(round(ans_score, 6))
        res_df = pd.DataFrame(out)
        if scores is not None:
            res_df["answer_score"] = scores
        return res_df


def bm25_topk(
    docs,
    query_terms: List[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
):
    """Corpus-level BM25 retrieval (Robertson/Spärck Jones; the classic
    probabilistic upgrade of the R3 keyword scorer and the TF-IDF stage):
    rank documents against ``query_terms`` and return the global top-k.

    Scale shape: ONE pass over the text emits per-doc integer metadata
    only — ``(doc_id, dl, tf_<term>...)``, a handful of ints per document
    — which is materialized once (tiny at any corpus size relative to the
    text) and serves both the corpus-stats aggregate (N, total dl, per-term
    document frequencies: one bounded reduction, scalars to the driver)
    and the scoring pass; the text column is never re-scanned and never
    shuffled.  Top-k runs per-block + driver finish (aggregate.global_topk
    — k rows per block move, no range shuffle).

    Determinism: tf/dl/df are exact integers; idf/score are computed in
    float64 with the textbook formulas
    ``idf = ln(1 + (N - df + .5)/(df + .5))`` and
    ``score = sum_t idf_t * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``,
    then rounded to 6 dp BEFORE the top-k cut so the selection boundary is
    reproducible against a SQL oracle (ties at the rounded score break on
    doc_id ascending).
    """
    import re as _re

    import numpy as np
    import ray.data as rd  # noqa: F401  (docs is a Dataset)

    from ocr_ray.stages.aggregate import global_topk

    term_re = _re.compile(r"[a-z0-9]+")
    terms = list(dict.fromkeys(query_terms))  # stable-dedup
    tf_cols = [f"tf_{i}" for i in range(len(terms))]

    def meta(batch: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_id": batch["doc_id"].to_numpy(), "dl": [],
               **{c: [] for c in tf_cols}}
        for text in batch["text"]:
            # NULL text is an EMPTY document (dl=0, no terms) — str(None)
            # would tokenize to the literal word "none", silently polluting
            # dl/df stats and even matching a query term "none"
            if text is None or (isinstance(text, float) and np.isnan(text)):
                toks = []
            else:
                toks = term_re.findall(str(text).lower())
            out["dl"].append(len(toks))
            if toks:
                from collections import Counter
                c = Counter(toks)
            else:
                c = {}
            for col, t in zip(tf_cols, terms):
                out[col].append(c.get(t, 0))
        d = pd.DataFrame(out)
        d["dl"] = d["dl"].astype("int64")
        for c in tf_cols:
            d[c] = d[c].astype("int64")
        return d

    md = docs.map_batches(meta, batch_format="pandas").materialize()

    def stats(bdf: pd.DataFrame) -> pd.DataFrame:
        row = {"n_docs": [len(bdf)], "sum_dl": [int(bdf["dl"].sum())]}
        for c in tf_cols:
            row[f"df_{c}"] = [int((bdf[c] > 0).sum())]
        return pd.DataFrame(row)

    st = md.map_batches(stats, batch_format="pandas").to_pandas()
    # Ray drops columns on an all-empty Dataset -> treat as empty corpus
    n_docs = int(st["n_docs"].sum()) if "n_docs" in st.columns else 0
    if n_docs == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    avgdl = st["sum_dl"].sum() / n_docs
    idf = {c: float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))
           for c, df in ((c, int(st[f"df_{c}"].sum())) for c in tf_cols)}

    def score(bdf: pd.DataFrame) -> pd.DataFrame:
        dl = bdf["dl"].to_numpy(dtype="float64")
        denom_dl = k1 * (1.0 - b + b * dl / avgdl)
        s = np.zeros(len(bdf), dtype="float64")
        for c in tf_cols:
            tf = bdf[c].to_numpy(dtype="float64")
            s += idf[c] * tf * (k1 + 1.0) / (tf + denom_dl)
        return pd.DataFrame({"doc_id": bdf["doc_id"].to_numpy(),
                             "score": np.round(s, 6)})

    top = global_topk(md.map_batches(score, batch_format="pandas"),
                      ["score", "doc_id"], k, descending=[True, False])
    top["doc_id"] = top["doc_id"].astype("int64")
    top["score"] = top["score"].astype("float64")
    return top.reset_index(drop=True)
