"""Deduplication operators — first-class components for training-data
pipelines at 100 TB (exact, word-set Jaccard, MinHash+LSH, SimHash).

Scale notes (each operator documents its partitioning assumption):

* exact dedup — content hash in a vectorized ``map_batches``, then
  ``groupby(hash)`` keep-first: one all-to-all on the 16-byte hash key.
* Jaccard all-pairs — the *verification* kernel. The broadcast variant here
  (`jaccard_pairs_broadcast`) ships the token-set matrix once via
  ``ray.put`` and streams the left side; correct for a small-side table
  (dimension-table pattern). At 100 TB the candidate set must come from
  LSH (below), never all-pairs.
* MinHash+LSH — shingle → minhash signature per row (vectorized numpy) →
  explode to (band_id, band_hash) rows → ``groupby`` bands → candidate
  pairs → verify true Jaccard.  Only near-dup rows shuffle.
* SimHash — 64-bit signature per row; near-dup candidates via bucketing on
  bit-band keys (4 x 16-bit bands, Hamming distance <= 3 verified).
"""

from __future__ import annotations

import hashlib
import itertools
import re
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd

_TOKEN = re.compile(r"\S+")

# ---------------------------------------------------------------- exact
def add_content_hash(batch: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    batch = batch.copy()
    batch["content_hash"] = [
        hashlib.sha256(t.encode()).hexdigest()[:16] for t in batch[col]
    ]
    return batch


def keep_first_by_hash(g: pd.DataFrame, order_col: str = "doc_id") -> pd.DataFrame:
    return g.sort_values(order_col).head(1)


# ---------------------------------------------------------------- token sets
def tokenize_set(text: str) -> List[str]:
    return sorted(set(text.split()))


def shingle_set(text: str, k: int = 3) -> frozenset:
    """k-word shingle set.  Near-dup detection over shingles (not unigrams)
    is the standard in training-data dedup: unigram sets saturate on small
    shared vocabularies, making every document pair look similar."""
    toks = text.split()
    if not toks:
        return frozenset()
    if len(toks) < k:
        return frozenset({" ".join(toks)})
    return frozenset(" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1))


def jaccard_sets(a: frozenset, b: frozenset) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def build_token_matrix(texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
    """Boolean doc x vocab matrix + per-doc set sizes (for vectorized
    intersection via matmul)."""
    vocab: Dict[str, int] = {}
    rows, cols = [], []
    for i, t in enumerate(texts):
        for tok in set(t.split()):
            j = vocab.setdefault(tok, len(vocab))
            rows.append(i)
            cols.append(j)
    m = np.zeros((len(texts), len(vocab)), dtype=np.float32)
    m[rows, cols] = 1.0
    return m, m.sum(axis=1)


def jaccard_pairs_matrix(ids: np.ndarray, m: np.ndarray, sizes: np.ndarray,
                         threshold: float) -> pd.DataFrame:
    """All-pairs word-set Jaccard >= threshold via one matmul (small side)."""
    inter = m @ m.T
    union = sizes[:, None] + sizes[None, :] - inter
    jac = inter / np.maximum(union, 1.0)
    iu = np.triu_indices(len(ids), k=1)
    keep = jac[iu] >= threshold
    li, ri = iu[0][keep], iu[1][keep]
    return pd.DataFrame(
        {
            "left_id": ids[li],
            "right_id": ids[ri],
            "jaccard": np.round(
                inter[li, ri].astype(np.float64) / union[li, ri].astype(np.float64), 6
            ),
        }
    )


# ---------------------------------------------------------------- minhash/LSH
def _hash_tokens(tokens: List[str]) -> np.ndarray:
    return np.array(
        [int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
         for t in tokens],
        dtype=np.uint64,
    )


class MinHasher:
    """n_perm universal hashes h_i(x) = (a_i * x + b_i) mod p over token
    hashes; signature = per-permutation minimum.  Stateful setup (the random
    coefficient matrix) happens once per actor in ``__init__``."""

    def __init__(self, n_perm: int = 64, n_bands: int = 16, seed: int = 7,
                 shingle_k: int = 0, text_col: str = "text", id_col: str = "doc_id"):
        rng = np.random.RandomState(seed)
        self.p = np.uint64((1 << 61) - 1)
        self.a = rng.randint(1, 1 << 32, size=n_perm).astype(np.uint64)
        self.b = rng.randint(0, 1 << 32, size=n_perm).astype(np.uint64)
        self.n_perm = n_perm
        self.n_bands = n_bands
        self.rows_per_band = n_perm // n_bands
        self.shingle_k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def _features(self, text: str) -> List[str]:
        toks = text.split()
        if self.shingle_k and len(toks) >= self.shingle_k:
            return [" ".join(toks[i:i + self.shingle_k])
                    for i in range(len(toks) - self.shingle_k + 1)]
        return toks

    def signature(self, text: str) -> np.ndarray:
        feats = list(set(self._features(text)))
        if not feats:
            return np.full(self.n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = _hash_tokens(feats)  # (F,)
        with np.errstate(over="ignore"):
            hv = (x[None, :] * self.a[:, None] + self.b[:, None]) % self.p  # (P, F)
        return hv.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        """Explode each row into n_bands (band_id, band_hash) bucket rows."""
        ids: List = []
        band_ids: List[int] = []
        band_hashes: List[str] = []
        for rid, text in zip(batch[self.id_col], batch[self.text_col]):
            sig = self.signature(text)
            for b in range(self.n_bands):
                chunk = sig[b * self.rows_per_band:(b + 1) * self.rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                ids.append(rid)
                band_ids.append(b)
                band_hashes.append(h)
        return pd.DataFrame(
            {self.id_col: ids, "band_id": band_ids, "band_hash": band_hashes}
        )


def band_candidates(g: pd.DataFrame, id_col: str = "doc_id") -> pd.DataFrame:
    """All id pairs sharing one (band_id, band_hash) bucket."""
    ids = sorted(g[id_col].unique())
    if len(ids) < 2:
        return pd.DataFrame({"left_id": [], "right_id": []})
    pairs = list(itertools.combinations(ids, 2))
    return pd.DataFrame(
        {"left_id": [p[0] for p in pairs], "right_id": [p[1] for p in pairs]}
    )


def bucket_pairs(
    bucket_rows: "object",
    bucket_cols: List[str],
    id_col: str = "doc_id",
    n_partitions: int = 64,
) -> "object":
    """Candidate pairs from co-bucketed rows, shuffling into a *bounded*
    number of groups: ``Dataset.groupby`` degrades with distinct-key count,
    so buckets are hashed into ``n_partitions`` partitions and each
    partition enumerates its buckets' pairs locally (a whole bucket shares a
    partition, so no pair is lost)."""

    def add_pk(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        pk = sum(pd.util.hash_pandas_object(b[c], index=False) for c in bucket_cols)
        b["_pk"] = (pk % n_partitions).astype("int32")
        return b

    def pairs_in_partition(g: pd.DataFrame) -> pd.DataFrame:
        out_l: List = []
        out_r: List = []
        for _, bucket in g.groupby(bucket_cols, sort=False):
            ids = sorted(bucket[id_col].unique())
            for a, b in itertools.combinations(ids, 2):
                out_l.append(a)
                out_r.append(b)
        return pd.DataFrame({"left_id": out_l, "right_id": out_r})

    return (
        bucket_rows.map_batches(add_pk, batch_format="pandas")
        .groupby("_pk")
        .map_groups(pairs_in_partition, batch_format="pandas")
    )


# ---------------------------------------------------------------- simhash
class SimHasher:
    """64-bit SimHash; near-dups share band keys.  Features are words
    (``shingle_k=0``) or k-word shingles — shingles make signatures
    distinctive even when documents share most of their vocabulary (word-set
    features saturate on small shared vocabularies).  Banding with
    ``n_bands`` equal-width bands guarantees candidate generation for pairs
    with Hamming distance < n_bands (pigeonhole); verify with
    :func:`hamming64` after the band groupby."""

    def __init__(self, n_bands: int = 8, shingle_k: int = 3,
                 text_col: str = "text", id_col: str = "doc_id"):
        assert 64 % n_bands == 0
        self.n_bands = n_bands
        self.band_width = 64 // n_bands
        self.shingle_k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    @staticmethod
    def signature(text: str, shingle_k: int = 0) -> int:
        toks = text.split()
        if shingle_k and toks:
            feats = {" ".join(toks[i:i + shingle_k])
                     for i in range(max(1, len(toks) - shingle_k + 1))}
        else:
            feats = set(toks)
        if not feats:
            return 0
        # vectorized: 8-byte digests -> bit matrix -> column majority vote
        digests = b"".join(
            hashlib.blake2b(f.encode(), digest_size=8).digest() for f in feats
        )
        bits = np.unpackbits(
            np.frombuffer(digests, dtype=np.uint8).reshape(len(feats), 8), axis=1
        ).astype(np.int32)
        votes = bits.sum(axis=0) * 2 - len(feats)  # (+1/-1 vote per feature)
        sig_bits = (votes > 0).astype(np.uint8)
        sig_bytes = np.packbits(sig_bits).tobytes()
        # bit order must match int.from_bytes(digest, "big") of the old layout:
        # unpackbits is MSB-first per byte, packbits reverses it symmetrically
        return int.from_bytes(sig_bytes, "big")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = {self.id_col: [], "simhash": [], "band_id": [], "band_key": []}
        mask = (1 << self.band_width) - 1
        for rid, text in zip(batch[self.id_col], batch[self.text_col]):
            sig = self.signature(text, self.shingle_k)
            for b in range(self.n_bands):
                key = (sig >> (b * self.band_width)) & mask
                out[self.id_col].append(rid)
                out["simhash"].append(np.uint64(sig))
                out["band_id"].append(b)
                out["band_key"].append(key)
        return pd.DataFrame(out)


def hamming64(a: int, b: int) -> int:
    return bin(int(a) ^ int(b)).count("1")
