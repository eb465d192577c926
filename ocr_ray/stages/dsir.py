"""DSIR-style importance scoring — select raw data that *looks like* a
target corpus (Data Selection via Importance Resampling, Xie et al. 2023,
arXiv:2302.03169), the standard pretraining-mixture selection move.

DSIR fits bag-of-hashed-ngrams distributions over a TARGET corpus (the
data you want more of — here a language slice; in production Wikipedia /
books) and the RAW pool, then weighs every raw document by its
likelihood ratio and resamples.  This stage keeps that shape with the
repo's integer-exact scoring discipline:

  * **pass 1 (fit)** — two streaming scans count hashed token unigrams
    into fixed-size tables ``T`` (target) and ``R`` (raw): feature
    hashing bounds memory regardless of vocabulary; partials reduce
    through ONE bounded hash exchange per table (same machinery as the
    bigram LM, ``stages/lm.py:train_bigram_counts``), so the driver
    holds two dense int64 arrays of ``b_uni`` cells — never the corpus.
  * **pass 2 (score)** — both tables broadcast once via ``ray.put``;
    a pure ``map_batches`` actor pool computes each document's ratio
    score.  No shuffle.

Scoring: per token in bucket ``b``, ``q = (T[b] * 1_000_000) //
(R[b] + 1)`` — the target/raw frequency ratio in ppm with add-one
smoothing on the raw side (a never-seen-in-raw token cannot divide by
zero) — and per document ``dsir_ppm = sum(q) // n_tokens``.  This is the
arithmetic-mean-of-ratios surrogate for DSIR's mean log-ratio: the
corpus-size normalization ``N_raw / N_tgt`` is a constant factor across
all documents and cancels for ranking/thresholding, so it is dropped and
every quantity stays int64 (order-insensitive sums -> bit-identical
across any partitioning, replicable in DuckDB; the same trade made by
``stages/lm.py``'s ppm perplexity gate).  Chain ``stages/shuffle.py:
value_rank`` on ``dsir_ppm`` for an exact top-X% resample instead of a
fixed threshold.

Token hashing is the shared SQL-replicable polynomial codepoint hash
(``stages/embed.py:hash_token``).  Empty documents carry no evidence and
are not scored.  Reference analog: the quality-ladder scoring of
``src/ocr_module.py:549-587`` generalized to corpus-relative statistics.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from ocr_ray.stages.lm import _TokenHasher

_PPM = 1_000_000

B_UNI = 1 << 16


def train_unigram_counts(
    docs: "object",
    text_col: str = "text",
    b_uni: int = B_UNI,
    n_partitions: "int | None" = None,
) -> np.ndarray:
    """One streaming scan -> dense hashed unigram count table (int64,
    ``b_uni`` cells).  Driver-side data is bounded by the table size.

    KEEP IN SYNC with lm.py:train_bigram_counts — the partial/reduce/
    exchange/densify scaffolding and its three empty-input guards
    (typed-empty partial, pre-map-schema reduce guard, to_pandas
    column-drop fallback) are the same design in both; a fix to one
    guard must be applied to both."""
    from ocr_ray.stages.join import exchange_map_partitions

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        hasher = _TokenHasher()
        per_doc = [hasher.h1(toks) % b_uni
                   for toks in (t.split() for t in b[text_col]) if toks]
        if not per_doc:
            return pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                                 "c": pd.Series([], dtype="int64")})
        ub, uc = np.unique(np.concatenate(per_doc), return_counts=True)
        return pd.DataFrame({"bucket": ub, "c": uc.astype(np.int64)})

    def reduce_counts(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "bucket" not in g.columns:
            # all-empty exchange delivers the pre-map schema
            return pd.DataFrame({"bucket": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        return g.groupby("bucket", as_index=False)["c"].sum()

    reduced = exchange_map_partitions(
        docs.map_batches(partials, batch_format="pandas"),
        "bucket", reduce_counts, n_partitions=n_partitions,
    ).to_pandas()  # <= b_uni rows by construction

    table = np.zeros(b_uni, dtype=np.int64)
    if "bucket" in reduced.columns:
        # (an all-empty corpus drops the columns in to_pandas — the
        # all-zero table is then already correct)
        table[reduced["bucket"].to_numpy(dtype="int64")] = \
            reduced["c"].to_numpy(dtype="int64")
    return table


class DsirScorer:
    """Actor-pool stage: per-doc target/raw frequency-ratio score against
    the broadcast count tables.  Tables fetched once per actor."""

    def __init__(self, tgt_ref, raw_ref, text_col: str = "text",
                 id_col: str = "doc_id", threshold_ppm: int = 0,
                 carry_cols: Sequence[str] = ()):
        import ray

        self.tgt = ray.get(tgt_ref) if not isinstance(tgt_ref, np.ndarray) else tgt_ref
        self.raw = ray.get(raw_ref) if not isinstance(raw_ref, np.ndarray) else raw_ref
        self.b_uni = len(self.tgt)
        self.text_col = text_col
        self.id_col = id_col
        self.threshold_ppm = threshold_ppm
        self.carry_cols = tuple(carry_cols)
        self._hasher = _TokenHasher()

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[self.id_col].to_numpy(dtype="int64")
        rows, n_tok, score = [], [], []
        for i, t in enumerate(batch[self.text_col]):
            toks = t.split()
            if not toks:
                continue
            b = self._hasher.h1(toks) % self.b_uni
            q = (self.tgt[b] * _PPM) // (self.raw[b] + 1)
            rows.append(i)
            n_tok.append(len(q))
            score.append(int(q.sum()) // len(q))
        rows = np.asarray(rows, dtype=np.int64)
        ppm = np.asarray(score, dtype=np.int64)
        out = {self.id_col: ids[rows]}
        for c in self.carry_cols:
            out[c] = batch[c].to_numpy()[rows]
        out.update({
            "n_tokens": np.asarray(n_tok, dtype=np.int64),
            "dsir_ppm": ppm,
            "keep": (ppm >= self.threshold_ppm).astype(np.int64),
        })
        return pd.DataFrame(out)


def dsir_score(
    raw: "object",
    target: "object",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_ppm: int = 0,
    b_uni: int = B_UNI,
    concurrency: int = 2,
    n_partitions: "int | None" = None,
    carry_cols: Sequence[str] = (),
) -> "object":
    """Fit-then-score: learn hashed unigram tables from ``target`` and
    ``raw``, then score every non-empty ``raw`` doc by its target/raw
    ratio.  ``raw`` is scanned twice (fit + score) — at 100 TB persist
    the two small count arrays and re-read the input rather than
    materializing it; ``target`` is typically a small curated set."""
    import ray

    from ocr_ray.stages.taskpool import task_pool

    tgt = train_unigram_counts(target, text_col=text_col, b_uni=b_uni,
                               n_partitions=n_partitions)
    rawc = train_unigram_counts(raw, text_col=text_col, b_uni=b_uni,
                                n_partitions=n_partitions)
    tgt_ref, raw_ref = ray.put(tgt), ray.put(rawc)
    # task pool (stages/taskpool.py): setup is one zero-copy ray.get, so
    # a reservation-holding actor pool would only cap parallelism (and
    # can deadlock chained composites on small clusters); `concurrency`
    # kept for API compatibility, ignored
    return raw.map_batches(
        task_pool(DsirScorer, tgt_ref=tgt_ref, raw_ref=raw_ref,
                  text_col=text_col, id_col=id_col,
                  threshold_ppm=threshold_ppm,
                  carry_cols=tuple(carry_cols)),
        batch_format="pandas",
    )
