"""Similarity search over embedding columns.

* :class:`CosineTopK` — brute-force cosine against a broadcast query matrix:
  the query vectors go into the object store ONCE (``ray.put``) and each
  actor reads them in ``__init__``; per batch it's one float64 matmul.
  The baseline and the verifier for the ANN paths.
* LSH-bucketed ANN (`RandomProjectionLSH`) — the scale path: signed random
  projections bucket vectors; queries probe only their own bucket (and
  optionally neighbors).  Recall < 1 by design; verified against brute force
  in tests.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd

import ray


def _as_matrix(col) -> np.ndarray:
    return np.asarray([np.asarray(v, dtype=np.float64) for v in col])


class CosineTopK:
    """Adds a ``sim`` column = max cosine similarity vs the broadcast query
    matrix (single query -> plain cosine score)."""

    def __init__(self, query_ref, id_col: str = "vec_id", vec_col: str = "embedding"):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.q = np.asarray(q, dtype=np.float64)
        if self.q.ndim == 1:
            self.q = self.q[None, :]
        self.qn = self.q / np.linalg.norm(self.q, axis=1, keepdims=True)
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = _as_matrix(batch[self.vec_col])
        norms = np.linalg.norm(m, axis=1)
        sims = (m @ self.qn.T) / np.maximum(norms, 1e-30)[:, None]
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col].to_numpy(),
                "sim": np.round(sims.max(axis=1), 6),
            }
        )


def kmeans_fit(sample: np.ndarray, n_centroids: int, n_iter: int = 10,
               seed: int = 29) -> np.ndarray:
    """Deterministic Lloyd k-means on a (small, driver-side) sample — the
    coarse quantizer for IVF.  At 100 TB the sample comes from
    ``ds.random_sample``; the centroid matrix stays tiny (k x dim) and is
    broadcast via ``ray.put``."""
    rng = np.random.RandomState(seed)
    n = len(sample)
    cent = sample[rng.choice(n, size=min(n_centroids, n), replace=False)].copy()
    for _ in range(n_iter):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                cent[c] = sample[mask].mean(axis=0)
    return cent


class IVFAssign:
    """IVF cell assignment: nearest-centroid id per vector (one matmul per
    batch against the broadcast centroid matrix).  Emits (id, cell, sim-ready
    normalized vector untouched).  The query path probes only the ``nprobe``
    cells nearest the query centroid."""

    def __init__(self, centroids_ref, id_col: str = "vec_id", vec_col: str = "embedding"):
        c = ray.get(centroids_ref) if isinstance(centroids_ref, ray.ObjectRef) else centroids_ref
        self.cent = np.asarray(c, dtype=np.float64)
        self.cent_sq = (self.cent ** 2).sum(axis=1)
        self.id_col = id_col
        self.vec_col = vec_col

    def assign(self, m: np.ndarray) -> np.ndarray:
        # argmin ||v - c||^2 = argmin (||c||^2 - 2 v.c); ||v||^2 constant per row
        return (self.cent_sq[None, :] - 2.0 * (m @ self.cent.T)).argmin(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = _as_matrix(batch[self.vec_col])
        return pd.DataFrame(
            {self.id_col: batch[self.id_col].to_numpy(), "cell": self.assign(m)}
        )


class RandomProjectionLSH:
    """Signed-random-projection bucketer: ``bucket = bits(sign(R @ v))``.

    Emits (id, bucket) rows; co-bucketed vectors are ANN candidates.  The
    projection matrix is deterministic (seeded) and compiled once per actor.
    """

    def __init__(self, dim: int, n_bits: int = 12, seed: int = 13,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        rng = np.random.RandomState(seed)
        self.r = rng.normal(size=(dim, n_bits))
        self.id_col = id_col
        self.vec_col = vec_col
        self.weights = (1 << np.arange(n_bits)).astype(np.int64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = _as_matrix(batch[self.vec_col])
        bits = (m @ self.r) > 0
        buckets = bits.astype(np.int64) @ self.weights
        return pd.DataFrame(
            {self.id_col: batch[self.id_col].to_numpy(), "bucket": buckets}
        )
