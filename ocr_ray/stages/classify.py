"""Model-based quality filtering: a fasttext-style linear text classifier
as a streaming stage.

Web-scale curation pipelines (CCNet, FineWeb, the reference's quality
ladder in ``src/ocr_module.py:549-587`` writ large) gate documents with a
cheap linear classifier over hashed token features: score every document,
keep the ones above a threshold.  The *shape* is what matters at 100 TB:

  * pure ``map_batches`` — no shuffle, no driver state, embarrassingly
    parallel over blocks;
  * the weight table is per-actor state (built once in ``__init__``,
    memoized per token across batches) — in production it would be a
    trained vector broadcast once via ``ray.put`` and indexed by feature
    hash, exactly the HashingEmbedder actor shape (stages/embed.py);
  * integer-exact scoring, so even the *keep/drop decision* is
    value-checked by the DuckDB oracle (no float accumulation-order
    drift across block boundaries).

No trained weights ship in this environment, so the weight table is a
deterministic hash-derived stand-in (documented, like the multimodal
decode stubs): ``w(tok) = ((h(tok) * 2654435761) % (2^31-1)) % 2001 -
1000`` where ``h`` is the SQL-replicable polynomial codepoint hash shared
with the embedder.  Zero-mean integer weights in [-1000, 1000]; a real
deployment swaps ``_weight`` for a lookup into the broadcast trained
table and nothing else changes.

Per doc: ``clf_logit`` = sum of weights over token occurrences (int64),
``clf_score`` = logit / (1000 * n_tokens) rounded to 6 dp (in [-1, 1]),
``keep`` = logit > 0.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np
import pandas as pd

from ocr_ray.stages.embed import hash_token

_TOKEN = re.compile(r"[a-z0-9]+")

_WEIGHT_MIX = 2654435761  # Knuth multiplicative constant
_WEIGHT_MOD = 2147483647  # 2^31 - 1 (keeps every int64 product exact)
_WEIGHT_RANGE = 2001  # weights in [-1000, 1000]


def token_weight(tok: str) -> int:
    """Deterministic integer weight of one token — bit-identical to the
    oracle's ``((h * 2654435761) % 2147483647) % 2001 - 1000``."""
    return (hash_token(tok) * _WEIGHT_MIX) % _WEIGHT_MOD % _WEIGHT_RANGE - 1000


class HashedLinearClassifier:
    """Actor-pool stage: adds ``n_tokens``, ``clf_logit``, ``clf_score``
    and ``keep`` columns to a text batch.  Token→weight lookups are
    memoized across batches (the point of an actor over a task)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 keep_text: bool = False, carry_cols=()):
        self.text_col = text_col
        self.id_col = id_col
        self.keep_text = keep_text
        self.carry_cols = tuple(carry_cols)
        self._cache: Dict[str, int] = {}

    def _weight(self, tok: str) -> int:
        w = self._cache.get(tok)
        if w is None:
            if len(self._cache) > 2_000_000:  # bound actor memory
                self._cache.clear()
            w = self._cache.setdefault(tok, token_weight(tok))
        return w

    def score_one(self, text: str) -> "tuple[int, int]":
        """(n_tokens, logit) of one document."""
        toks = _TOKEN.findall(text.lower())
        if not toks:
            return 0, 0
        weight = self._weight
        return len(toks), sum(weight(t) for t in toks)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        n_tokens = np.zeros(n, dtype=np.int64)
        logits = np.zeros(n, dtype=np.int64)
        for i, text in enumerate(batch[self.text_col]):
            n_tokens[i], logits[i] = self.score_one(text)
        # floor(x*1e6+0.5)/1e6 — identical IEEE ops to the DuckDB oracle
        denom = np.where(n_tokens > 0, n_tokens, 1).astype(np.float64) * 1000.0
        score = np.floor(logits.astype(np.float64) / denom * 1e6 + 0.5) / 1e6
        score[n_tokens == 0] = 0.0
        out = {self.id_col: batch[self.id_col].to_numpy()}
        if self.keep_text:
            out[self.text_col] = batch[self.text_col].to_numpy()
        for c in self.carry_cols:
            out[c] = batch[c].to_numpy()
        out.update({
            "n_tokens": n_tokens,
            "clf_logit": logits,
            "clf_score": score,
            "keep": (logits > 0).astype(np.int64),
        })
        return pd.DataFrame(out)


def classify_documents(docs, text_col: str = "text", id_col: str = "doc_id",
                       concurrency: int = 2, keep_text: bool = False):
    """Text table -> per-doc classifier scores (streaming, no shuffle).

    Runs as a task pool (stages/taskpool.py), not a fixed actor pool:
    setup is a cheap hash-weight build, so reserving CPUs per actor would
    only cap parallelism — and, measured at ``num_cpus=4``, chained
    actor-pool stages that reserve every core starve the plan's task
    operators (ReadParquet, exchanges) into a hard deadlock.
    ``concurrency`` is kept for API compatibility and ignored."""
    from ocr_ray.stages.taskpool import task_pool

    return docs.map_batches(
        task_pool(HashedLinearClassifier, text_col=text_col, id_col=id_col,
                  keep_text=keep_text),
        batch_format="pandas",
    )


def classifier_filter(docs, text_col: str = "text", id_col: str = "doc_id",
                      concurrency: int = 2):
    """The curation gate itself: keep only docs the classifier accepts.
    Text is carried through so downstream stages keep streaming."""
    scored = classify_documents(docs, text_col=text_col, id_col=id_col,
                                keep_text=True)
    return scored.filter(expr="keep == 1")
