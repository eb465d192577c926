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


def _as_matrix(col, dim: "int | None" = None) -> np.ndarray:
    if len(col) == 0:
        # an empty list-of-arrays collapses to shape (0,), which breaks
        # every downstream (N, dim) matmul — give empties their real width
        return np.zeros((0, dim if dim is not None else 0), dtype=np.float64)
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
        m = _as_matrix(batch[self.vec_col], self.qn.shape[1])
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
    # gram-form distances (|x|^2 + |c|^2 - 2 x·c): the (n, k) matmul
    # replaces the (n, k, d) difference tensor — a d-fold memory blowup
    # per Lloyd iteration (~6.5 GB at 50k x 256 cents x 64 dims vs
    # ~100 MB).  Distances are float either way; argmin is what matters
    # and IVF recall is threshold-checked, not bit-pinned.
    xx = np.einsum("nd,nd->n", sample, sample)
    for _ in range(n_iter):
        cc = np.einsum("kd,kd->k", cent, cent)
        d = xx[:, None] + cc[None, :] - 2.0 * (sample @ cent.T)
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
        m = _as_matrix(batch[self.vec_col], self.cent.shape[1])
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
        self.n_bits = n_bits
        self.id_col = id_col
        self.vec_col = vec_col
        self.weights = (1 << np.arange(n_bits)).astype(np.int64)

    def bucket_of(self, v: np.ndarray) -> int:
        bits = (np.asarray(v, dtype=np.float64) @ self.r) > 0
        return int(bits.astype(np.int64) @ self.weights)

    def probe_set(self, v: np.ndarray, max_hamming: int = 1) -> set:
        """Multi-probe bucket set: the query's bucket plus every bucket
        within ``max_hamming`` bit flips (2^n_bits small by construction)."""
        qb = self.bucket_of(v)
        all_b = np.arange(1 << self.n_bits, dtype=np.int64)
        xor = all_b ^ qb
        ham = np.unpackbits(
            xor.view(np.uint8).reshape(len(all_b), 8), axis=1
        ).sum(axis=1)
        return set(all_b[ham <= max_hamming].tolist())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = _as_matrix(batch[self.vec_col], self.r.shape[0])
        bits = (m @ self.r) > 0
        buckets = bits.astype(np.int64) @ self.weights
        return pd.DataFrame(
            {self.id_col: batch[self.id_col].to_numpy(), "bucket": buckets}
        )


class SignHashLSH:
    """SQL-replicable sign-projection bucketer (Rademacher LSH): the
    projection entries are ±1 derived from the engine's polynomial
    codepoint hash of ``"<dim>:<bit>"`` — so a DuckDB oracle recomputes
    the identical buckets (``bit_b = sum_j v[j]*s[j][b] > 0``).  ±1
    projections carry the same cosine-LSH guarantee as Gaussian ones
    (sign-random-projection theory); what's lost is only seed freedom.
    """

    def __init__(self, dim: int, n_bits: int = 8,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        from ocr_ray.stages.embed import hash_token

        s = np.empty((dim, n_bits), dtype=np.float64)
        for j in range(dim):
            for b in range(n_bits):
                s[j, b] = 1.0 if hash_token(f"{j}:{b}") % 2 == 0 else -1.0
        self.s = s
        self.n_bits = n_bits
        self.id_col = id_col
        self.vec_col = vec_col
        self.weights = (1 << np.arange(n_bits)).astype(np.int64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = _as_matrix(batch[self.vec_col], self.s.shape[0]).astype(np.float64)
        bits = (m @ self.s) > 0
        buckets = bits.astype(np.int64) @ self.weights
        return pd.DataFrame(
            {self.id_col: batch[self.id_col].to_numpy(), "bucket": buckets}
        )


class MultiTableLSH:
    """T independent signed-random-projection tables — the candidate
    generator for embedding NEAR-DUP at scale (one table's recall at
    moderate cosine thresholds is poor; T tables give
    1-(1-p^bits)^T).  Emits (id, table_id, bucket) rows."""

    def __init__(self, dim: int, n_bits: int = 8, n_tables: int = 12,
                 seed: int = 101, id_col: str = "vec_id", vec_col: str = "embedding"):
        rng = np.random.RandomState(seed)
        self.r = rng.normal(size=(n_tables, dim, n_bits))
        self.n_tables = n_tables
        self.weights = (1 << np.arange(n_bits)).astype(np.int64)
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = _as_matrix(batch[self.vec_col], self.r.shape[1])
        ids = batch[self.id_col].to_numpy()
        out_id, out_t, out_b = [], [], []
        for t in range(self.n_tables):
            bits = (m @ self.r[t]) > 0
            buckets = bits.astype(np.int64) @ self.weights
            out_id.append(ids)
            out_t.append(np.full(len(ids), t, dtype=np.int32))
            out_b.append(buckets)
        return pd.DataFrame(
            {
                self.id_col: np.concatenate(out_id),
                "table_id": np.concatenate(out_t),
                "bucket": np.concatenate(out_b),
            }
        )


def lsh_embed_dedup_pairs(
    embeddings: "object",
    threshold: float = 0.9,
    dim: int | None = None,
    n_bits: int = 8,
    n_tables: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_partitions: "int | None" = None,
) -> "object":
    """Embedding near-dup at scale: multi-table LSH candidates + the same
    raw-task exchange plan as the text dedup paths (stages/dedup.py) —
    bucket rows → per-partition pair enumeration → pair dedupe fused with
    the left-embedding attach → right attach + exact-cosine verify.
    Approximate by construction (recall pytest vs the all-pairs kernel);
    the sanctioned path when the all-pairs ``dedup_embed`` cap trips."""
    import pyarrow as pa

    import ray
    import ray.data as rd

    from ocr_ray.stages.dedup import (
        _concat_pd,
        _exchange,
        _pairs_from_bucket_partition,
    )
    from ocr_ray.stages.taskpool import task_pool

    # single materialization: the input feeds FOUR consumers (dim probe,
    # band map, left attach, right attach); launch_splits documents
    # single-consumer inputs — a lazy input would re-execute once per
    # consumer (3 extra full scans), and a nondeterministic upstream would
    # desynchronize the bucket table from the vectors it verifies against
    # (same rule simhash_dedup_pairs and minhash_dedup_pairs follow)
    embeddings = embeddings.materialize()

    if dim is None:
        first = embeddings.take(1)
        if not first:
            # empty corpus: no pairs (and no row to probe the dim from)
            return rd.from_pandas(pd.DataFrame(
                {"left_id": pd.Series(dtype="int64"),
                 "right_id": pd.Series(dtype="int64"),
                 "sim": pd.Series(dtype="float64")}))
        dim = len(first[0][vec_col])

    @ray.remote(num_cpus=0)
    def pairs_task(*pieces):
        g = _concat_pd(pieces)
        out = _pairs_from_bucket_partition(g, ["table_id", "bucket"], id_col)
        return pa.Table.from_pandas(out, preserve_index=False)

    @ray.remote(num_cpus=0)
    def dedupe_attach_left(n_pairs: int, *pieces):
        cands = _concat_pd(pieces[:n_pairs])
        lv = _concat_pd(pieces[n_pairs:])
        if ("left_id" not in cands.columns or "left_id" not in lv.columns
                or not len(cands) or not len(lv)):
            # all-empty exchange side may carry the pre-map schema (same
            # guard as the minhash twin, dedup.py dedupe_attach_left):
            # merge on a missing key would KeyError in the worker
            out = pd.DataFrame({"left_id": pd.Series(dtype="int64"),
                                "right_id": pd.Series(dtype="int64"),
                                "_lvec": pd.Series(dtype="object")})
            return pa.Table.from_pandas(out, preserve_index=False)
        cands = cands.drop_duplicates(["left_id", "right_id"])
        out = cands.merge(lv, on="left_id", how="inner")
        return pa.Table.from_pandas(out, preserve_index=False)

    @ray.remote(num_cpus=0)
    def attach_right_verify(n_left: int, *pieces):
        left = _concat_pd(pieces[:n_left])
        rv = _concat_pd(pieces[n_left:])
        if ("right_id" not in left.columns or "right_id" not in rv.columns
                or not len(left) or not len(rv)):
            # pre-map schema on an all-empty side (same guard as above)
            out = pd.DataFrame(
                {"left_id": pd.Series([], dtype="int64"),
                 "right_id": pd.Series([], dtype="int64"),
                 "sim": pd.Series([], dtype="float64")})
            return pa.Table.from_pandas(out, preserve_index=False)
        b = left.merge(rv, on="right_id", how="inner")
        if not len(b):
            out = pd.DataFrame(
                {"left_id": pd.Series([], dtype="int64"),
                 "right_id": pd.Series([], dtype="int64"),
                 "sim": pd.Series([], dtype="float64")}
            )
            return pa.Table.from_pandas(out, preserve_index=False)
        lm = np.asarray([np.asarray(v, dtype=np.float64) for v in b["_lvec"]])
        rm = np.asarray([np.asarray(v, dtype=np.float64) for v in b["_rvec"]])
        ln = np.maximum(np.linalg.norm(lm, axis=1), 1e-30)
        rn = np.maximum(np.linalg.norm(rm, axis=1), 1e-30)
        sims = (lm * rm).sum(axis=1) / (ln * rn)
        keep = sims >= threshold
        out = pd.DataFrame(
            {
                "left_id": b["left_id"].to_numpy(dtype="int64")[keep],
                "right_id": b["right_id"].to_numpy(dtype="int64")[keep],
                "sim": np.round(sims[keep], 6),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    buckets = embeddings.map_batches(
        task_pool(MultiTableLSH, dim=dim, n_bits=n_bits, n_tables=n_tables,
                  id_col=id_col, vec_col=vec_col),
        batch_format="pandas",
    )

    def as_left(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"left_id": b[id_col].astype("int64"), "_lvec": b[vec_col]}
        )

    def as_right(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"right_id": b[id_col].astype("int64"), "_rvec": b[vec_col]}
        )

    from ocr_ray.stages.join import resolve_partitions

    P = n_partitions = resolve_partitions(embeddings, n_partitions)
    bsplit = _exchange(buckets, ["table_id", "bucket"], P)
    pair_refs = [pairs_task.remote(*[s[j] for s in bsplit]) for j in range(P)]

    psplit = _exchange(pair_refs, "left_id", P)
    lsplit = _exchange(embeddings.map_batches(as_left, batch_format="pandas"),
                       "left_id", P)
    j1_refs = [
        dedupe_attach_left.remote(
            len(psplit), *[s[j] for s in psplit], *[s[j] for s in lsplit]
        )
        for j in range(P)
    ]

    j1split = _exchange(j1_refs, "right_id", P)
    rsplit = _exchange(embeddings.map_batches(as_right, batch_format="pandas"),
                       "right_id", P)
    out_refs = [
        attach_right_verify.remote(
            len(j1split), *[s[j] for s in j1split], *[s[j] for s in rsplit]
        )
        for j in range(P)
    ]
    return rd.from_arrow_refs(out_refs)


class LSHProbeScore:
    """End-to-end LSH ANN query stage: per batch, bucket each vector with
    the same seeded projection, keep only rows whose bucket is in the
    broadcast multi-probe set, and score exact cosine vs the query there —
    the scale path answers a KNN query while touching only ~(probed/2^bits)
    of the data."""

    def __init__(self, dim: int, n_bits: int, probe_ref, query_ref,
                 seed: int = 13, id_col: str = "vec_id", vec_col: str = "embedding"):
        import ray

        self.lsh = RandomProjectionLSH(dim, n_bits=n_bits, seed=seed,
                                       id_col=id_col, vec_col=vec_col)
        self.probe = ray.get(probe_ref) if isinstance(probe_ref, ray.ObjectRef) else probe_ref
        qn = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        qn = np.asarray(qn, dtype=np.float64)
        # normalize HERE (idempotent for already-unit queries) so "exact
        # cosine vs the query" holds for raw queries too — CosineTopK
        # normalizes internally and this stage must not differ
        self.qn = qn / max(float(np.linalg.norm(qn)), 1e-30)
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = _as_matrix(batch[self.vec_col], self.lsh.r.shape[0])
        bits = (m @ self.lsh.r) > 0
        buckets = bits.astype(np.int64) @ self.lsh.weights
        mask = np.isin(buckets, list(self.probe))
        if not mask.any():
            return pd.DataFrame({self.id_col: pd.Series([], dtype="int64"),
                                 "sim": pd.Series([], dtype="float64")})
        mm = m[mask]
        sims = (mm @ self.qn) / np.maximum(np.linalg.norm(mm, axis=1), 1e-30)
        return pd.DataFrame(
            {self.id_col: batch[self.id_col].to_numpy()[mask].astype("int64"),
             "sim": np.round(sims, 6)}
        )


def quantize_int8(m: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    """Per-vector symmetric int8 scalar quantization — the 4x-memory ANN
    path (float32 corpus -> one signed byte per component).

    ``q_i = floor(v_i * 127.0 / max_abs(v) + 0.5)`` in float64 with exactly
    this operation order, so the DuckDB oracle (same IEEE ops on the same
    promoted-from-float32 doubles) reproduces every code bit-for-bit;
    an all-zero vector quantizes to zeros.  Returns ``(codes int64 (N,D),
    scales float64 (N,))``; dequantize ``v ~= q * mx / 127``.  Range is
    [-127, 127] (symmetric; -128 unused), so int8 dots fit easily in int64:
    D * 127^2 << 2^63.
    """
    mx = np.abs(m).max(axis=1)
    safe = np.where(mx > 0.0, mx, 1.0)
    q = np.floor(m * 127.0 / safe[:, None] + 0.5).astype(np.int64)
    q[mx == 0.0] = 0
    return q, mx


class QuantizedDot:
    """Actor-pool stage: integer dot product of each row's int8-quantized
    embedding against the broadcast quantized query — exact int64 scoring
    over the compressed representation (symmetric distance; per-vector
    scales are deliberately not applied, matching plain int8 SQ search).
    The query codes go into the object store once."""

    def __init__(self, query_codes_ref, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        import ray

        qc = (ray.get(query_codes_ref)
              if isinstance(query_codes_ref, ray.ObjectRef) else query_codes_ref)
        self.qc = np.asarray(qc, dtype=np.int64)
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = _as_matrix(batch[self.vec_col], len(self.qc))
        codes, _ = quantize_int8(m)
        return pd.DataFrame(
            {self.id_col: batch[self.id_col].to_numpy().astype("int64"),
             "dot": codes @ self.qc}
        )


class RPReducer:
    """Random-projection dimensionality reduction (Johnson-Lindenstrauss,
    Achlioptas 2003 ±1 variant): int8-quantize each vector, project with a
    deterministic ±1 sign matrix -> exact int64 reduced components.

    Quantize-then-project keeps every output an exact integer (no
    float-sum order dependence), so the DuckDB oracle value-checks every
    reduced component; signs come from the engine's polynomial hash of
    ``"rp:<dim>:<out>"`` (namespace distinct from SignHashLSH's buckets).
    The reduced table is the cheap input for downstream KNN / clustering:
    r_dim=16 cuts the dot-product cost 4x while ±1 JL preserves cosine
    ordering approximately (recall bound pytest-checked)."""

    def __init__(self, dim: int = 64, r_dim: int = 16,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        from ocr_ray.stages.embed import hash_token

        s = np.empty((dim, r_dim), dtype=np.int64)
        for j in range(dim):
            for b in range(r_dim):
                s[j, b] = 1 if hash_token(f"rp:{j}:{b}") % 2 == 0 else -1
        self.s = s
        self.r_dim = r_dim
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = _as_matrix(batch[self.vec_col], self.s.shape[0]).astype(np.float64)
        q, _ = quantize_int8(m)
        y = q @ self.s                       # exact: |y| <= dim*127 << 2^63
        n = len(batch)
        return pd.DataFrame(
            {self.id_col: np.repeat(
                batch[self.id_col].to_numpy().astype("int64"), self.r_dim),
             "b": np.tile(np.arange(self.r_dim, dtype="int64"), n),
             "y": y.ravel()}
        )


def rp_reduce(
    ds, r_dim: int = 16, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding",
):
    """Reduced projection table (id, b, y) — see :class:`RPReducer`."""
    from ocr_ray.stages.taskpool import task_pool

    return ds.map_batches(
        task_pool(RPReducer, dim=dim, r_dim=r_dim,
                  id_col=id_col, vec_col=vec_col),
        batch_format="pandas",
    )
