"""Worked model-backed engine example — the A4 (Nanonets VLM) analog with
real model-shaped compute: a trained, serialized artifact loaded ONCE per
actor, batched vectorized inference, text + metadata out, errors in-band.

Mirrors the reference's load-once/generate/batch contract
(``src/ocr/nanonets_ocr.py:13-123``): the reference caches AutoProcessor +
AutoModelForVision2Seq behind ``lru_cache`` and moves them to the detected
device in ``__init__``, then ``extract_text``/``batch_process`` run
``model.generate`` per call.  Here the artifact is a ridge-regression
quality scorer (closed-form fit, integer-quantized weights) instead of VLM
weights — the transformers/torch stack is absent in this sandbox — but the
Ray-side shape is exactly what a real VLM stage needs:

* **Load once per actor.**  :class:`ModelScorer` is a callable CLASS for
  ``map_batches``; the pickle is deserialized in ``__init__`` (once per
  actor process), never per batch.  A real model swaps
  ``pickle.load`` for ``AutoModel.from_pretrained`` and nothing else moves.
* **Resource plumbing.**  GPU inference declares its device need at the
  stage, not in the model code::

      ds.map_batches(
          ModelScorer,
          fn_constructor_kwargs={"artifact_path": path},
          concurrency=4,          # actor-pool size
          batch_size=64,          # small batches: weights + batch fit heap
          num_gpus=1,             # reserve a GPU per actor (0 here: CPU)
          batch_format="pandas",
      )

  Ray schedules each actor onto a node with a free GPU and sets
  ``CUDA_VISIBLE_DEVICES``; the ``__init__`` body (``self.device = ...``)
  is where the reference's ``torch.cuda.is_available()`` check lands.
* **Batched inference.**  ``__call__`` featurizes the whole batch into one
  matrix and scores with a single matmul — the analog of passing a list of
  images to ``processor(...)``/``model.generate`` instead of looping.
* **In-band errors.**  Null/absent text scores with empty-text features
  and flags ``model_error`` instead of raising, matching the reference's
  ``{"text": "", "error": ...}`` fallback dict.

The artifact is integer-exact on purpose: a score is a BIGINT dot product
of character-class counts, so the DuckDB oracle can replicate it and the
driver value-checks the query end-to-end (``model_score_docs``).
"""

from __future__ import annotations

import pickle
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

ARTIFACT_VERSION = "quality-ridge-1"

# feature order is part of the artifact contract (and the oracle SQL)
FEATURES = ("n_chars", "n_alpha", "n_space", "n_digit", "n_upper", "n_punct")
_PUNCT = ".,;:!?"
WEIGHT_SCALE = 1_000_000  # fixed-point: w_int = round(w_float * SCALE)


def featurize(texts: List[Optional[str]]) -> np.ndarray:
    """(n, 6) int64 character-class count matrix, vectorized per class.

    Counts (not ratios) keep the model integer-exact: the score is a
    BIGINT dot product the SQL oracle reproduces with
    ``length(regexp_replace(...))`` arithmetic."""
    s = pd.Series(texts, dtype="object").fillna("")
    n_chars = s.str.len().to_numpy(dtype=np.int64)
    n_alpha = s.str.count(r"[a-zA-Z]").to_numpy(dtype=np.int64)
    n_space = s.str.count(r" ").to_numpy(dtype=np.int64)
    n_digit = s.str.count(r"[0-9]").to_numpy(dtype=np.int64)
    n_upper = s.str.count(r"[A-Z]").to_numpy(dtype=np.int64)
    n_punct = s.str.count(r"[.,;:!?]").to_numpy(dtype=np.int64)
    return np.stack([n_chars, n_alpha, n_space, n_digit, n_upper, n_punct],
                    axis=1)


def _training_corpus(seed: int = 0):
    """Deterministic synthetic (text, quality) pairs standing in for a
    labeled training set: clean prose scores high, markup residue / digit
    soup / shouting scores low.  The FIT is real (closed-form ridge); only
    the data is synthesized, because no corpus ships with the sandbox."""
    rng = np.random.default_rng(seed)
    words = ["record", "segment", "payload", "quality", "layout", "batch",
             "column", "system", "metric", "stream", "window", "answer"]
    texts, targets = [], []
    for i in range(400):
        n = int(rng.integers(5, 60))
        body = " ".join(rng.choice(words, size=n))
        kind = i % 4
        if kind == 0:          # clean prose
            t, y = body.capitalize() + ".", 1.0
        elif kind == 1:        # markup residue
            t, y = "<div>" + body.replace(" ", "><") + "</div>", -1.0
        elif kind == 2:        # digit soup
            t, y = " ".join(str(int(x)) for x in rng.integers(0, 9999, n)), -0.5
        else:                  # shouting
            t, y = body.upper() + "!!!", -0.2
        texts.append(t)
        targets.append(y + float(rng.normal(0, 0.05)))
    return texts, np.asarray(targets, dtype=np.float64)


def fit_artifact(seed: int = 0, ridge: float = 10.0) -> Dict:
    """Fit the scorer in memory: closed-form ridge regression
    ``w = (X^T X + λI)^{-1} X^T y`` over per-length-normalized count
    features, weights quantized to int64 fixed-point so inference (and the
    SQL oracle) is integer-exact.  Deterministic for a given seed."""
    texts, y = _training_corpus(seed)
    counts = featurize(texts).astype(np.float64)
    # normalize counts by text length so the linear model learns character
    # CLASS COMPOSITION, not raw document length
    denom = np.maximum(counts[:, 0:1], 1.0)
    x = np.concatenate([counts / denom, np.ones((len(texts), 1))], axis=1)
    xtx = x.T @ x + ridge * np.eye(x.shape[1])
    w = np.linalg.solve(xtx, x.T @ y)
    artifact = {
        "version": ARTIFACT_VERSION,
        "features": list(FEATURES),
        # fixed-point: score_int = sum(w_int[i] * count[i]) + b_int * n_chars
        # (multiplying the bias by n_chars clears the length denominator, so
        # integer counts alone reproduce sign and ORDER of the float score
        # per fixed length; absolute scale is score_float * len * SCALE)
        "w_int": [int(round(v * WEIGHT_SCALE)) for v in w[:-1]],
        "b_int": int(round(w[-1] * WEIGHT_SCALE)),
        "seed": seed,
        "ridge": ridge,
    }
    return artifact


def build_model_artifact(path: str, seed: int = 0, ridge: float = 10.0) -> Dict:
    """Fit (:func:`fit_artifact`) and serialize the scorer — the
    real-engine analog of downloading pretrained weights into the model
    cache (``nanonets_ocr.py:34-44``); returns the artifact dict and
    writes the pickle to ``path``."""
    artifact = fit_artifact(seed, ridge)
    with open(path, "wb") as f:
        pickle.dump(artifact, f)
    return artifact


def score_counts_int(counts: np.ndarray, artifact: Dict) -> np.ndarray:
    """BIGINT score per row: ``counts @ w_int + n_chars * b_int``.  Exact
    int64 (weights ~1e6, counts bounded by payload caps)."""
    w = np.asarray(artifact["w_int"], dtype=np.int64)
    return counts @ w + counts[:, 0] * np.int64(artifact["b_int"])


class ModelScorer:
    """Actor-pool stage: artifact loaded once per actor, one matmul per
    batch.  Adds ``model_score`` (BIGINT), ``model_version`` and
    ``model_error`` columns to the incoming batch (metadata in-band, like
    the reference's result dict)."""

    def __init__(self, artifact_path: str, text_col: str = "text"):
        # ONCE PER ACTOR — the load-once contract.  A GPU engine would
        # detect its device here (Ray already pinned it via num_gpus).
        with open(artifact_path, "rb") as f:
            self.artifact = pickle.load(f)
        if self.artifact.get("version") != ARTIFACT_VERSION:
            raise ValueError(
                f"artifact version {self.artifact.get('version')!r} != "
                f"engine {ARTIFACT_VERSION!r}"
            )
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        texts = list(batch[self.text_col])
        counts = featurize(texts)
        out["model_score"] = score_counts_int(counts, self.artifact)
        out["model_version"] = self.artifact["version"]
        # isinstance, not `is not None`: a float-NaN text (pandas null)
        # is also null — featurize scores it as "" and the in-band flag
        # must say so
        out["model_error"] = ["" if isinstance(t, str) else "null text"
                              for t in texts]
        return out


def model_score_fn(artifact: Dict):
    """Scalar ``text -> int score`` closure over a loaded artifact — the
    hook :class:`ocr_ray.stages.extract.Extractor` uses for model-backed
    best-of-N when ``PipelineConfig.model_artifact`` is set."""
    def score(text: str) -> int:
        return int(score_counts_int(featurize([text]), artifact)[0])

    return score


# ---------------------------------------------------------------- A5 analog

TRANSCRIBER_VERSION = "char-seq2seq-1"
DECODE_VOCAB = "abcdefghijklmnopqrstuvwxyz "  # 27 decoder symbols
_GEN_CAP = 64  # decoder max_new_tokens analog


def fit_transcriber_artifact() -> Dict:
    """Deterministic closed-form 'training' of the generative A5 stand-in
    (the Dolphin TrOCR analog, ``ocr_core/dolphin_reader.py:12-40``:
    ``VisionEncoderDecoderModel.generate`` + ``confidence = min(1,
    len/100)``).  The artifact holds real model-shaped state:

    * ``trans`` — a (V, V) int64 decoder transition table, add-one
      smoothed bigram counts over a fixed seed corpus (the 'pretrained
      decoder weights');
    * ``enc`` — a (256, V) int64 encoder-bias table mapping each input
      byte to per-symbol logit offsets (the 'cross-attention' from the
      encoded payload into each decode step).

    Everything is integer, so greedy decoding is bit-deterministic across
    batches, actors and partitionings — the property a replica pytest can
    pin without an ML runtime."""
    seed = ("the quick brown fox jumps over the lazy dog "
            "pack my box with five dozen liquor jugs "
            "how vexingly quick daft zebras jump "
            "sphinx of black quartz judge my vow")
    v = len(DECODE_VOCAB)
    idx = {c: i for i, c in enumerate(DECODE_VOCAB)}
    trans = np.ones((v, v), dtype=np.int64)  # add-one smoothing
    prev = None
    for ch in seed:
        i = idx.get(ch)
        if prev is not None and i is not None:
            trans[prev, i] += 1
        prev = i
    enc = (np.arange(256, dtype=np.int64)[:, None] * 31
           + np.arange(v, dtype=np.int64)[None, :] * 7) % 13
    return {"version": TRANSCRIBER_VERSION, "vocab": DECODE_VOCAB,
            "trans": trans, "enc": enc}


def build_transcriber_artifact(path: str) -> str:
    """Serialize the fitted transcriber (the 'model download')."""
    with open(path, "wb") as f:
        pickle.dump(fit_transcriber_artifact(), f)
    return path


def greedy_decode(payload: bytes, artifact: Dict, max_len: int = _GEN_CAP) -> str:
    """Greedy autoregressive decode of one payload: start symbol from the
    first byte's encoder bias, then ``next = argmax(trans[cur] * 100 +
    enc[byte_t])`` with numpy-argmax first-hit tie semantics; length =
    ``min(max_len, n_bytes // 16 + 4)``.  Pure integer — deterministic."""
    if not payload:
        return ""
    b = np.frombuffer(payload, dtype=np.uint8)
    trans, enc, vocab = artifact["trans"], artifact["enc"], artifact["vocab"]
    n_steps = min(max_len, len(b) // 16 + 4)
    cur = int(enc[b[0]].argmax())
    out = [vocab[cur]]
    for t in range(1, n_steps):
        scores = trans[cur] * 100 + enc[b[t % len(b)]]
        cur = int(scores.argmax())
        out.append(vocab[cur])
    return "".join(out)


class ModelTranscriber:
    """A5 worked example — the generative engine contract
    (``ocr_core/dolphin_reader.py:12-40``) with real model-shaped compute:
    the pickled encoder/decoder tables load ONCE PER ACTOR in ``__init__``
    (swap ``pickle.load`` for ``VisionEncoderDecoderModel.from_pretrained``
    and nothing else moves; a GPU deployment adds ``num_gpus=1`` at the
    ``map_batches`` call site exactly as documented on :class:`ModelScorer`),
    and ``__call__`` runs the autoregressive generate per payload with the
    reference's ``confidence = min(1, len(text)/100)``.  Errors in-band:
    a null payload transcribes to "" with ``model_error='null payload'``."""

    def __init__(self, artifact_path: str, max_len: int = _GEN_CAP):
        with open(artifact_path, "rb") as f:
            self.artifact = pickle.load(f)
        if self.artifact.get("version") != TRANSCRIBER_VERSION:
            raise ValueError(
                f"artifact version {self.artifact.get('version')!r} != "
                f"engine {TRANSCRIBER_VERSION!r}")
        self.max_len = max_len

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts, confs, errs = [], [], []
        for raw in batch["payload"]:
            ok = isinstance(raw, (bytes, bytearray)) and len(raw) > 0
            t = greedy_decode(bytes(raw), self.artifact, self.max_len) if ok else ""
            texts.append(t)
            confs.append(round(min(1.0, len(t) / 100), 6))
            errs.append("" if ok else "null payload")
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "transcribed_text": texts,
            "confidence": confs,
            "model_error": errs,
        })
