"""Corpus-trained hashed bigram language model — the CCNet/KenLM-style
perplexity quality filter as a two-pass streaming stage.

Web-scale curation (CCNet, RefinedWeb, the reference's quality ladder in
``src/ocr_module.py:549-587`` generalized to corpus statistics) scores
each document against a language model TRAINED ON THE CORPUS ITSELF and
gates on the score.  This stage is the genuine model-in-the-loop shape —
unlike the hash-derived stand-in weights of ``stages/classify.py``, the
LM table here is learned from pass 1's data:

  * **pass 1 (train)** — one streaming scan counts token unigrams and
    bigrams into two fixed-size hashed count tables (feature hashing, the
    KenLM-pruning analog: collisions merge counts, table size bounds
    memory regardless of vocabulary).  Per-batch partials are sparse
    ``(bucket, count)`` rows, reduced by ONE bounded hash exchange on the
    bucket id; the driver receives at most ``b_uni + b_big`` rows (a few
    MB at the 2^16/2^20 defaults — fixed, independent of corpus size).
  * **pass 2 (score)** — the dense count arrays are broadcast once via
    ``ray.put`` and every scoring actor indexes them per batch: pure
    ``map_batches``, no shuffle.

Integer-exact scoring (the repo's oracle discipline): per bigram
``q = (c2 * 1_000_000) // c1`` — the conditional probability
``P(w2 | w1) = c2/c1`` in parts-per-million, exact in int64 (c2*1e6 <
2^63 up to ~9e12 bigram occurrences per bucket; raise the scale factor's
precision trade-off beyond that) — and per document ``lm_ppm = sum(q) //
n_bigrams``.  Sums of int64 are order-insensitive, so the score is
bit-identical across any block partitioning AND replicable in SQL, unlike
a float log-prob accumulation.  ``keep = lm_ppm >= threshold`` gates
exactly like a perplexity cut (monotone in geometric-mean probability's
arithmetic-mean surrogate).

Token hashing is the SQL-replicable polynomial codepoint hash shared
with the embedder/classifier (``stages/embed.py:hash_token``); the
bigram combine ``(t1[i] * 1000003 + t1[i+1]) % (2^31 - 1)`` mirrors the
shingle construction of ``stages/dedup.py:PolySimHasher`` so the DuckDB
oracle reuses proven CTE shapes.  Documents with fewer than two
whitespace tokens carry no bigram evidence and are not scored.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pandas as pd

from ocr_ray.stages.embed import HASH_INIT, HASH_MULT, HASH_MOD, hash_token

_MOD31 = (1 << 31) - 1
_PPM = 1_000_000

B_UNI = 1 << 16
B_BIG = 1 << 20


class _TokenHasher:
    """Per-actor memoized token -> polynomial hash (family 1 only)."""

    def __init__(self) -> None:
        self._cache: Dict[str, int] = {}

    def h1(self, tokens: List[str]) -> np.ndarray:
        cache = self._cache
        out = np.empty(len(tokens), dtype=np.int64)
        for i, t in enumerate(tokens):
            h = cache.get(t)
            if h is None:
                if len(cache) > 2_000_000:  # bound actor memory
                    cache.clear()
                h = cache.setdefault(t, hash_token(t))
            out[i] = h
        return out


def _doc_hash_arrays(texts, hasher: _TokenHasher) -> List[np.ndarray]:
    """Per-doc token-hash arrays; <2-token docs yield empty arrays."""
    out = []
    for t in texts:
        toks = t.split()
        out.append(hasher.h1(toks) if len(toks) >= 2 else
                   np.array([], dtype=np.int64))
    return out

def _bigram_buckets(t1: np.ndarray, b_big: int) -> np.ndarray:
    # t1 < 1000003 so t1*1000003 + t1 < 2^40: exact in int64
    return ((t1[:-1] * HASH_MOD + t1[1:]) % _MOD31) % b_big


def train_bigram_counts(
    docs: "object",
    text_col: str = "text",
    b_uni: int = B_UNI,
    b_big: int = B_BIG,
    n_partitions: "int | None" = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pass 1: hashed unigram/bigram count tables over the corpus.

    Returns dense int64 arrays ``(C1[b_uni], C2[b_big])``.  Driver-side
    data is bounded by the table sizes, never by the corpus.

    KEEP IN SYNC with dsir.py:train_unigram_counts (same scaffolding
    and empty-input guards — see the note there)."""
    from ocr_ray.stages.join import exchange_map_partitions

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        hasher = _TokenHasher()
        arrs = _doc_hash_arrays(b[text_col], hasher)
        # unigram counts include every token position (also doc 1-token?
        # no: <2-token docs carry no bigram evidence and are excluded
        # from BOTH tables, keeping train and score populations equal)
        uni = [a % b_uni for a in arrs if a.size]
        big = [_bigram_buckets(a, b_big) for a in arrs if a.size]
        frames = []
        if uni:
            ub, uc = np.unique(np.concatenate(uni), return_counts=True)
            frames.append(pd.DataFrame(
                {"kind": 0, "bucket": ub, "c": uc.astype(np.int64)}))
        if big:
            bb, bc = np.unique(np.concatenate(big), return_counts=True)
            frames.append(pd.DataFrame(
                {"kind": 1, "bucket": bb, "c": bc.astype(np.int64)}))
        if not frames:
            return pd.DataFrame({"kind": pd.Series([], dtype="int64"),
                                 "bucket": pd.Series([], dtype="int64"),
                                 "c": pd.Series([], dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    def reduce_counts(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "kind" not in g.columns:
            # all-empty exchange delivers the pre-map schema
            return pd.DataFrame({"kind": pd.Series(dtype="int64"),
                                 "bucket": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        return g.groupby(["kind", "bucket"], as_index=False)["c"].sum()

    reduced = exchange_map_partitions(
        docs.map_batches(partials, batch_format="pandas"),
        "bucket", reduce_counts, n_partitions=n_partitions,
    ).to_pandas()  # <= b_uni + b_big rows by construction

    c1 = np.zeros(b_uni, dtype=np.int64)
    c2 = np.zeros(b_big, dtype=np.int64)
    if "kind" not in reduced.columns:
        # corpus with no 2-token document: every partial is empty and
        # to_pandas drops the columns — all-zero count tables
        return c1, c2
    u = reduced[reduced["kind"] == 0]
    b_ = reduced[reduced["kind"] == 1]
    c1[u["bucket"].to_numpy(dtype="int64")] = u["c"].to_numpy(dtype="int64")
    c2[b_["bucket"].to_numpy(dtype="int64")] = b_["c"].to_numpy(dtype="int64")
    return c1, c2


class BigramLMScorer:
    """Actor-pool stage: scores each doc against the broadcast LM tables.
    ``__init__`` fetches the tables once per actor (zero-copy object
    store reads); ``__call__`` is vectorized per batch."""

    def __init__(self, c1_ref, c2_ref, text_col: str = "text",
                 id_col: str = "doc_id", threshold_ppm: int = 0,
                 carry_cols=()):
        import ray

        self.c1 = ray.get(c1_ref) if not isinstance(c1_ref, np.ndarray) else c1_ref
        self.c2 = ray.get(c2_ref) if not isinstance(c2_ref, np.ndarray) else c2_ref
        self.b_uni = len(self.c1)
        self.b_big = len(self.c2)
        self.text_col = text_col
        self.id_col = id_col
        self.threshold_ppm = threshold_ppm
        self.carry_cols = tuple(carry_cols)
        self._hasher = _TokenHasher()

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        arrs = _doc_hash_arrays(batch[self.text_col], self._hasher)
        ids = batch[self.id_col].to_numpy(dtype="int64")
        rows, n_bigrams, lm_ppm = [], [], []
        for i, t1 in enumerate(arrs):
            if not t1.size:
                continue
            denom = self.c1[t1[:-1] % self.b_uni]
            if denom.size and int(denom.min()) <= 0:
                # numpy int64 // 0 is a SILENT 0 (RuntimeWarning only),
                # which would deflate lm_ppm and spuriously drop docs —
                # fail loudly instead: a zero unigram count means the
                # score pass saw tokens the train pass never counted
                raise RuntimeError(
                    "BigramLMScorer: zero unigram training count for a "
                    "scored token — train and score scans diverged. Both "
                    "must read the SAME deterministic input; materialize "
                    "any nondeterministic upstream before lm_score.")
            q = (self.c2[_bigram_buckets(t1, self.b_big)] * _PPM) // denom
            rows.append(i)
            n_bigrams.append(len(q))
            lm_ppm.append(int(q.sum()) // len(q))
        rows = np.asarray(rows, dtype=np.int64)
        nb = np.asarray(n_bigrams, dtype=np.int64)
        ppm = np.asarray(lm_ppm, dtype=np.int64)
        out = {self.id_col: ids[rows]}
        for c in self.carry_cols:
            out[c] = batch[c].to_numpy()[rows]
        out.update({
            "n_bigrams": nb,
            "lm_ppm": ppm,
            "keep": (ppm >= self.threshold_ppm).astype(np.int64),
        })
        return pd.DataFrame(out)


def lm_score(
    docs: "object",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_ppm: int = 200,
    b_uni: int = B_UNI,
    b_big: int = B_BIG,
    concurrency: int = 2,
    n_partitions: "int | None" = None,
    carry_cols=(),
) -> "object":
    """Train-then-score: pass 1 learns the hashed bigram LM from
    ``docs``, pass 2 scores every (>=2-token) doc against it.  The input
    is scanned twice — at 100 TB persist pass 1's tables (two small
    arrays) and re-read the input rather than materializing it."""
    import ray

    from ocr_ray.stages.taskpool import task_pool

    c1, c2 = train_bigram_counts(docs, text_col=text_col, b_uni=b_uni,
                                 b_big=b_big, n_partitions=n_partitions)
    c1_ref, c2_ref = ray.put(c1), ray.put(c2)
    # task pool, not a fixed actor pool: setup is one zero-copy ray.get,
    # so a reservation-holding pool would cap parallelism and (measured at
    # num_cpus=4) deadlock chained composites; `concurrency` is kept for
    # API compatibility and ignored
    return docs.map_batches(
        task_pool(BigramLMScorer, c1_ref=c1_ref, c2_ref=c2_ref,
                  text_col=text_col, id_col=id_col,
                  threshold_ppm=threshold_ppm, carry_cols=tuple(carry_cols)),
        batch_format="pandas",
    )
