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
* MinHash+LSH — shingle → minhash signature per row (vectorized numpy,
  task pool) → explode to (band_id, band_hash) rows → THREE raw-task hash
  exchanges: band buckets → candidate pairs; pairs + doc table on left_id
  (partition-local pair dedupe fused — exact, duplicates of a pair share
  their left_id); right_id attach + true shingle-Jaccard verify.  No
  driver-side materialization anywhere; no Dataset.groupby sort-shuffles.
* SimHash — 64-bit signature per row; candidates via bit-band bucketing,
  same exchange plan with the (id, simhash) side table and vectorized
  Hamming verification.

Token/shingle hashing is vectorized: one ``pandas.util.hash_array`` call
per batch (C-level SipHash over the flat token array, deterministic across
processes — fixed default hash key) plus numpy rolling-polynomial combine
for k-word shingles.  No per-shingle ``hashlib`` calls in any hot path.
"""

from __future__ import annotations

import hashlib
import itertools
import os
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd

_SHINGLE_PRIME = np.uint64(0x9E3779B97F4A7C15)  # odd 64-bit mix constant


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
            # floor(x*1e6+0.5): DuckDB round() ties-away semantics on
            # these non-negative integer ratios (np.round is ties-to-even)
            "jaccard": np.floor(
                inter[li, ri].astype(np.float64)
                / union[li, ri].astype(np.float64) * 1e6 + 0.5) / 1e6,
        }
    )


# ------------------------------------------------------- vectorized hashing
def hash_tokens_flat(tokens: List[str]) -> np.ndarray:
    """uint64 hash per token — ONE C-level pass (pandas SipHash with the
    library's fixed default key: deterministic across runs and workers)."""
    if not tokens:
        return np.array([], dtype=np.uint64)
    return pd.util.hash_array(np.asarray(tokens, dtype=object))


def shingle_hashes(token_hashes: np.ndarray, k: int) -> np.ndarray:
    """Rolling-polynomial k-shingle hashes over a row's token-hash array.

    k <= 1: unigram features (each token hash is its own feature);
    n >= k: n-k+1 shingles; 0 < n < k: one shingle combining all tokens
    (mirrors :func:`shingle_set`'s short-document case); n == 0: empty.
    uint64 wraparound multiply is the mix (same trick as FxHash)."""
    n = token_hashes.size
    if n == 0 or k <= 1:
        return token_hashes
    with np.errstate(over="ignore"):
        if n < k:
            v = np.uint64(0)
            for x in token_hashes:
                v = v * _SHINGLE_PRIME + x
            return np.array([v], dtype=np.uint64)
        sh = token_hashes[: n - k + 1].copy()
        for j in range(1, k):
            sh = sh * _SHINGLE_PRIME + token_hashes[j: n - k + 1 + j]
    return sh


def _batch_shingle_hashes(texts, k: int) -> Tuple[List[np.ndarray], np.ndarray]:
    """Per-row shingle-hash arrays for a batch: one flat hash_array call,
    then numpy slicing per row (no per-token Python hashing)."""
    tok_lists = [t.split() for t in texts]
    flat = list(itertools.chain.from_iterable(tok_lists))
    th = hash_tokens_flat(flat)
    counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                         count=len(tok_lists))
    starts = np.concatenate(([0], np.cumsum(counts)))
    return (
        [shingle_hashes(th[starts[i]:starts[i + 1]], k) for i in range(len(tok_lists))],
        counts,
    )


# ---------------------------------------------------------------- minhash/LSH
def _require_non_null(batch: "pd.DataFrame", cols) -> None:
    """Loud dedup input contract: a null id rides float NaN through the
    band tables and casts to INT64_MIN in the pair kernels (silent
    corruption); a null text dies as a cryptic AttributeError inside a
    worker.  Same contract as shuffle's _col_i64 guard."""
    for c in cols:
        n = int(batch[c].isna().sum())
        if n:
            raise ValueError(
                f"{n} null value(s) in column {c!r} — dedup signatures "
                f"and pair ids are undefined for null; filter or fill "
                f"nulls before deduplication")


class MinHasher:
    """n_perm universal hashes h_i(x) = (a_i * x + b_i) mod p over shingle
    hashes; signature = per-permutation minimum.  Stateful setup (the random
    coefficient matrix) happens once per actor in ``__init__``; per batch the
    work is one flat token-hash pass + numpy matrix min-reductions."""

    def __init__(self, n_perm: int = 64, n_bands: int = 16, seed: int = 7,
                 shingle_k: int = 0, text_col: str = "text", id_col: str = "doc_id"):
        if n_perm % n_bands:
            # fail at the driver with guidance, not as a cryptic reshape
            # ValueError inside every worker task (simhash validates the
            # analogous 64 % n_bands constraint the same way)
            raise ValueError(
                f"n_bands must divide n_perm (got n_perm={n_perm}, "
                f"n_bands={n_bands}): each band is a contiguous block of "
                f"n_perm//n_bands signature rows")
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

    def _sig_from_shingles(self, sh: np.ndarray) -> np.ndarray:
        if sh.size == 0:
            return np.full(self.n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        with np.errstate(over="ignore"):
            hv = (sh[None, :] * self.a[:, None] + self.b[:, None]) % self.p  # (P, S)
        return hv.min(axis=1)

    def signature(self, text: str) -> np.ndarray:
        th = hash_tokens_flat(text.split())
        return self._sig_from_shingles(shingle_hashes(th, self.shingle_k))

    def _band_keys(self, sig: np.ndarray) -> np.ndarray:
        """uint64 key per band: rolling-polynomial combine of the band's
        signature rows (replaces the old per-band hashlib call)."""
        sig2d = sig.reshape(self.n_bands, self.rows_per_band)
        bk = np.zeros(self.n_bands, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(self.rows_per_band):
                bk = bk * _SHINGLE_PRIME + sig2d[:, i]
        return bk

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        """Explode each row into n_bands (band_id, band_hash) bucket rows."""
        _require_non_null(batch, (self.id_col, self.text_col))
        texts = list(batch[self.text_col])
        per_row, _ = _batch_shingle_hashes(texts, self.shingle_k)
        n = len(texts)
        keys = np.empty((n, self.n_bands), dtype=np.uint64)
        for i, sh in enumerate(per_row):
            keys[i] = self._band_keys(self._sig_from_shingles(sh))
        ids = np.repeat(np.asarray(batch[self.id_col]), self.n_bands)
        return pd.DataFrame(
            {
                self.id_col: ids,
                "band_id": np.tile(np.arange(self.n_bands, dtype=np.int32), n),
                "band_hash": keys.ravel(),
            }
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
    n_partitions: "int | None" = None,
) -> "object":
    """Candidate pairs from co-bucketed rows, shuffling into a *bounded*
    number of groups: ``Dataset.groupby`` degrades with distinct-key count,
    so buckets are hashed into ``n_partitions`` partitions and each
    partition enumerates its buckets' pairs locally (a whole bucket shares a
    partition, so no pair is lost)."""
    n_partitions = resolve_partitions(bucket_rows, n_partitions, default=64)

    def add_pk(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        pk = sum(pd.util.hash_pandas_object(b[c], index=False) for c in bucket_cols)
        b["_pk"] = (pk % n_partitions).astype("int32")
        return b

    def pairs_in_partition(g: pd.DataFrame) -> pd.DataFrame:
        return _pairs_from_bucket_partition(g, bucket_cols, id_col)

    return (
        bucket_rows.map_batches(add_pk, batch_format="pandas")
        .groupby("_pk")
        .map_groups(pairs_in_partition, batch_format="pandas")
    )


# --------------------------------------------- exchange-based LSH dedup
# Pure two-sided hash exchanges over raw Ray tasks (the reassembly-shuffle
# mechanism, SURVEY §2 last-resort tier, justified by measurement: each
# Dataset.groupby stage carries ~1-2 s fixed sort-shuffle cost, and the
# former pipeline had two of them plus four exchange materializations).

# one bucket holding B ids emits C(B,2) pairs — quadratic by the PAIRS
# output contract itself (a 100k-member identical-content class, e.g.
# whitespace-only scrapes, means ~5e9 pairs no matter the engine).  Fail
# loudly at the bucket instead of OOMing the partition; run exact dedup
# first to collapse identical-content classes.
MAX_BUCKET_IDS = int(os.environ.get("OCR_RAY_MAX_BUCKET_IDS", "20000"))


def _pairs_vectorized(keys: List[np.ndarray],
                      ids: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    """(left, right) id arrays of all within-bucket combinations, given
    rows ALREADY SORTED by (*keys, id) and deduplicated on (*keys, id).
    Pure numpy O(rows + pairs): run detection on the key columns, then
    one repeat/arange expansion — no per-bucket Python loop (the old
    itertools.combinations walk was the hot kernel of every LSH pairs
    exchange).  Pair order within a bucket is (smaller id, larger id),
    identical to the sorted-combinations contract."""
    n = len(ids)
    if n < 2:
        e = np.array([], dtype=np.int64)
        return e, e
    change = np.zeros(n - 1, dtype=bool)
    for k in keys:
        change |= k[1:] != k[:-1]
    starts = np.r_[0, np.flatnonzero(change) + 1]
    run_len = np.diff(np.r_[starts, n])
    if run_len.max() > MAX_BUCKET_IDS:
        worst = int(run_len.max())
        raise ValueError(
            f"LSH bucket holds {worst} ids (> OCR_RAY_MAX_BUCKET_IDS="
            f"{MAX_BUCKET_IDS}): a duplicate class this large emits "
            f"~{worst * (worst - 1) // 2:.0e} pairs; run exact "
            "dedup first to collapse identical-content classes")
    # row i (local rank r in a bucket of size s) is the LEFT of s-1-r
    # pairs whose rights are the next s-1-r rows
    run_start = np.repeat(starts, run_len)
    cnt = (run_start + np.repeat(run_len, run_len)
           - np.arange(n, dtype=np.int64) - 1)
    tot = int(cnt.sum())
    if not tot:
        e = np.array([], dtype=np.int64)
        return e, e
    row_of_pair = np.repeat(np.arange(n, dtype=np.int64), cnt)
    block_start = np.repeat(np.cumsum(cnt) - cnt, cnt)
    offs = np.arange(tot, dtype=np.int64) - block_start
    return ids[row_of_pair], ids[row_of_pair + offs + 1]


def _pairs_from_bucket_partition(g: pd.DataFrame, bucket_cols: List[str],
                                 id_col: str) -> pd.DataFrame:
    if not len(g) or any(c not in g.columns for c in (*bucket_cols, id_col)):
        # all-empty exchange input delivers the pre-map schema (Ray Data
        # skips the UDF on zero-row blocks — join._split_blocks); the
        # pair set of an empty corpus is empty, not a KeyError
        return pd.DataFrame({"left_id": pd.Series(dtype="int64"),
                             "right_id": pd.Series(dtype="int64")})
    g = (g[[*bucket_cols, id_col]]
         .drop_duplicates()
         .sort_values([*bucket_cols, id_col], kind="mergesort"))
    l, r = _pairs_vectorized([g[c].to_numpy() for c in bucket_cols],
                             g[id_col].to_numpy(dtype="int64"))
    return pd.DataFrame({"left_id": l, "right_id": r})


# --------------------------------------------- task-pool hasher functions
# Hashers as plain map_batches FUNCTIONS with a per-worker-process instance
# cache: same amortized setup as an actor pool (the coefficient matrix is
# built once per process) without pinning a fixed-size pool — the task pool
# scales to all free CPUs and costs no actor spin-up per query.  The cache
# is taskpool's shared BOUNDED one (one mechanism to maintain, no unbounded
# per-query accumulation on long-lived workers).


class MinHashSigner(MinHasher):
    """Full-signature emitter: one row per doc carrying the n_perm
    uint64 MinHash signature as ``sig`` bytes — the side table the
    ``verify="estimate"`` mode of :func:`minhash_dedup_pairs` ships
    through the attach exchanges INSTEAD of document texts (8*n_perm
    bytes per doc vs the whole payload; same coefficient matrix as the
    band pass, so band collisions and estimates agree)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        _require_non_null(batch, (self.id_col, self.text_col))
        texts = list(batch[self.text_col])
        per_row, _ = _batch_shingle_hashes(texts, self.shingle_k)
        sigs = np.empty((len(texts), self.n_perm), dtype=np.uint64)
        for i, sh in enumerate(per_row):
            sigs[i] = self._sig_from_shingles(sh)
        return pd.DataFrame({
            self.id_col: np.asarray(batch[self.id_col]),
            "sig": [sigs[i].tobytes() for i in range(len(texts))],
        })


def minhash_bands_batch(batch: pd.DataFrame, **kw) -> pd.DataFrame:
    from ocr_ray.stages.taskpool import task_pool

    return task_pool(MinHasher, **kw)(batch)


def minhash_sigs_batch(batch: pd.DataFrame, **kw) -> pd.DataFrame:
    from ocr_ray.stages.taskpool import task_pool

    return task_pool(MinHashSigner, **kw)(batch)


def simhash_bands_batch(batch: pd.DataFrame, scheme: str = "poly", **kw) -> pd.DataFrame:
    from ocr_ray.stages.taskpool import task_pool

    cls = PolySimHasher if scheme == "poly" else SimHasher
    return task_pool(cls, **kw)(batch)


from ocr_ray.stages.join import (  # shared exchange helpers
    _concat_pa,
    _concat_pd,
    resolve_partitions,
)


def _pairs_from_bucket_table(t, bucket_cols: List[str], id_col: str):
    """Arrow-native sibling of :func:`_pairs_from_bucket_partition`:
    sort + dedupe + vectorized pair expansion straight off the Arrow
    partition — no pandas round-trip (bucket keys are fixed-width ints;
    object-dtype conversion was pure overhead in the hot LSH exchange)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    empty = pa.table({"left_id": pa.array([], pa.int64()),
                      "right_id": pa.array([], pa.int64())})
    names = set(t.schema.names)
    if not t.num_rows or any(c not in names for c in (*bucket_cols, id_col)):
        return empty
    t = (t.select([*bucket_cols, id_col])
         .group_by([*bucket_cols, id_col]).aggregate([]))  # distinct rows
    idx = pc.sort_indices(
        t, sort_keys=[(c, "ascending") for c in (*bucket_cols, id_col)])
    t = t.take(idx)
    keys = [t.column(c).combine_chunks().to_numpy(zero_copy_only=False)
            for c in bucket_cols]
    ids = (t.column(id_col).combine_chunks()
           .to_numpy(zero_copy_only=False).astype(np.int64, copy=False))
    l, r = _pairs_vectorized(keys, ids)
    return pa.table({"left_id": pa.array(l, pa.int64()),
                     "right_id": pa.array(r, pa.int64())})


def _exchange(src, by, n_partitions: int) -> List[List]:
    """Split a Dataset (STREAMING — split tasks launch as upstream blocks
    materialize) or a list of block refs by key hash; returns per-input
    lists of per-partition sub-table refs."""
    from ocr_ray.stages.join import launch_splits

    return launch_splits(src, by, n_partitions)


def minhash_dedup_pairs(
    docs: "object",
    n_perm: int = 64,
    n_bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.95,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_partitions: "int | None" = None,
    concurrency: int = 2,  # kept for API compat; task pool self-scales
    verify: str = "exact",
) -> "object":
    """MinHash+LSH near-dup pairs, end-to-end distributed.

    shingle → signature → band explode (task pool), then three raw-task
    hash exchanges: (1) band buckets → candidate pairs, (2) pairs+docs on
    left_id → per-partition pair dedupe + left-text attach (fused — every
    duplicate of a pair shares its left_id, so partition-local
    drop_duplicates is exact), (3) on right_id → right-text attach + true
    shingle-Jaccard verify.  Returns a Dataset of (left_id, right_id,
    jaccard); nothing materializes on the driver.  Partitioning
    assumptions: a band bucket fits one partition (near-dup buckets are
    small by construction) and one id's rows fit a join partition.

    ``verify="estimate"`` is the SCALE path for candidate-heavy corpora:
    the attach exchanges ship each doc's full n_perm MinHash signature
    (8*n_perm bytes) instead of its text, and the verify step scores
    ``jaccard_est = matching permutations / n_perm`` vectorized (std
    ~sqrt(J(1-J)/n_perm) ≈ 0.04 at n_perm=64).  Exact verify moves
    O(candidate_pairs x text_bytes) — measured quadratic-fatal on
    self-similar corpora (templated conversations: 100k docs -> 5.15M
    candidates; at ~17 KB texts that is ~90 GB of attach traffic where
    signatures are ~2.6 GB).  Output column is ``jaccard_est`` (not
    ``jaccard``) so callers can't silently treat the estimate as the
    exact filter; set ``threshold`` with the estimator noise in mind."""
    import pyarrow as pa

    import ray
    import ray.data as rd

    @ray.remote(num_cpus=0)
    def pairs_task(*pieces):
        # Arrow-native end-to-end: concat stays Arrow, pair expansion is
        # the vectorized numpy kernel — no pandas round-trip in the
        # hottest LSH exchange stage
        return _pairs_from_bucket_table(
            _concat_pa(pieces), ["band_id", "band_hash"], id_col)

    @ray.remote(num_cpus=0)
    def dedupe_attach_left(n_pairs: int, *pieces):
        cands = _concat_pa(pieces[:n_pairs])
        ldocs = _concat_pa(pieces[n_pairs:])
        empty = (pa.table({"left_id": pa.array([], pa.int64()),
                           "right_id": pa.array([], pa.int64()),
                           "_lsig": pa.array([], pa.binary())})
                 if verify == "estimate" else
                 pa.table({"left_id": pa.array([], pa.int64()),
                           "right_id": pa.array([], pa.int64()),
                           "_ltext": pa.array([], pa.string())}))
        if (not cands.num_rows or not ldocs.num_rows
                or "left_id" not in cands.schema.names
                or "left_id" not in ldocs.schema.names):
            # all-empty exchange side may carry the pre-map schema
            # (join._split_blocks): the join result is empty either way
            return empty
        # group_by-with-no-aggs = DISTINCT; Table.join is Arrow's C++
        # hash join — texts never widen to object dtype in this task
        cands = cands.group_by(["left_id", "right_id"]).aggregate([])
        return cands.join(ldocs, keys="left_id", join_type="inner")

    @ray.remote(num_cpus=0)
    def attach_right_verify(n_left: int, *pieces):
        leftt = _concat_pa(pieces[:n_left])
        rdocst = _concat_pa(pieces[n_left:])
        empty = pa.table({"left_id": pa.array([], pa.int64()),
                          "right_id": pa.array([], pa.int64()),
                          "jaccard": pa.array([], pa.float64())})
        if (not leftt.num_rows or not rdocst.num_rows
                or "right_id" not in leftt.schema.names
                or "right_id" not in rdocst.schema.names):
            return empty
        b = leftt.join(rdocst, keys="right_id", join_type="inner")
        # one shingle set per DISTINCT text: ids recur across candidate
        # pairs, and on long documents (conversation-level dedup) set
        # construction dominates the verify without this memo
        _sets: Dict[str, frozenset] = {}

        def _ss(t: str) -> frozenset:
            s = _sets.get(t)
            if s is None:
                if len(_sets) > 4096:  # bound task heap on huge partitions
                    _sets.clear()
                s = _sets.setdefault(t, shingle_set(t, shingle_k))
            return s

        if not b.num_rows:
            return empty
        lts = b.column("_ltext").to_pylist()
        rts = b.column("_rtext").to_pylist()
        jac = np.array(
            [jaccard_sets(_ss(lt), _ss(rt)) for lt, rt in zip(lts, rts)],
            dtype=np.float64,
        )
        keep = jac >= threshold
        lid = (b.column("left_id").combine_chunks()
               .to_numpy(zero_copy_only=False).astype(np.int64,
                                                      copy=False)[keep])
        rid = (b.column("right_id").combine_chunks()
               .to_numpy(zero_copy_only=False).astype(np.int64,
                                                      copy=False)[keep])
        return pa.table({
            "left_id": pa.array(lid, pa.int64()),
            "right_id": pa.array(rid, pa.int64()),
            # floor(x*1e6+0.5) == DuckDB round() ties-away; np.round
            # is ties-to-even and diverges on dyadic ratios like 125/128
            "jaccard": pa.array(np.floor(jac[keep] * 1e6 + 0.5) / 1e6,
                                pa.float64()),
        })

    @ray.remote(num_cpus=0)
    def attach_right_verify_sig(n_left: int, *pieces):
        leftt = _concat_pa(pieces[:n_left])
        rdocst = _concat_pa(pieces[n_left:])
        empty = pa.table({"left_id": pa.array([], pa.int64()),
                          "right_id": pa.array([], pa.int64()),
                          "jaccard_est": pa.array([], pa.float64())})
        if (not leftt.num_rows or not rdocst.num_rows
                or "right_id" not in leftt.schema.names
                or "right_id" not in rdocst.schema.names):
            return empty
        b = leftt.join(rdocst, keys="right_id", join_type="inner")
        if not b.num_rows:
            return empty
        L = np.frombuffer(b"".join(b.column("_lsig").to_pylist()),
                          dtype=np.uint64).reshape(b.num_rows, n_perm)
        R = np.frombuffer(b"".join(b.column("_rsig").to_pylist()),
                          dtype=np.uint64).reshape(b.num_rows, n_perm)
        est = (L == R).mean(axis=1)
        keep = est >= threshold
        lid = (b.column("left_id").combine_chunks()
               .to_numpy(zero_copy_only=False).astype(np.int64,
                                                      copy=False)[keep])
        rid = (b.column("right_id").combine_chunks()
               .to_numpy(zero_copy_only=False).astype(np.int64,
                                                      copy=False)[keep])
        return pa.table({
            "left_id": pa.array(lid, pa.int64()),
            "right_id": pa.array(rid, pa.int64()),
            "jaccard_est": pa.array(np.floor(est[keep] * 1e6 + 0.5) / 1e6,
                                    pa.float64()),
        })

    if verify not in ("exact", "estimate"):
        raise ValueError(
            f"minhash_dedup_pairs: verify must be 'exact' or 'estimate', "
            f"got {verify!r}")

    # the (id, text) projection feeds THREE consumers (band explode +
    # both text-attach sides); materialize it once so the source is
    # scanned a single time — a lazy read_parquet input would otherwise
    # be re-read per consumer (2 extra corpus scans at 100 TB).  Mirrors
    # simhash_dedup_pairs' single-materialize of its signature table.
    from ray.data.dataset import MaterializedDataset

    if not isinstance(docs, MaterializedDataset):
        docs = docs.map_batches(
            lambda b: pd.DataFrame({id_col: b[id_col], text_col: b[text_col]}),
            batch_format="pandas",
        ).materialize()

    bands = docs.map_batches(
        minhash_bands_batch, batch_format="pandas",
        fn_kwargs={"n_perm": n_perm, "n_bands": n_bands, "shingle_k": shingle_k,
                   "text_col": text_col, "id_col": id_col},
    )

    # estimate mode: the attach exchanges move the signature side table
    # (8*n_perm bytes/doc), never texts — one extra hashing scan of docs
    # buys O(pairs x sig) instead of O(pairs x text) exchange traffic
    attach_src = docs
    if verify == "estimate":
        attach_src = docs.map_batches(
            minhash_sigs_batch, batch_format="pandas",
            fn_kwargs={"n_perm": n_perm, "n_bands": n_bands,
                       "shingle_k": shingle_k, "text_col": text_col,
                       "id_col": id_col},
        ).materialize()

    def as_left(b: pd.DataFrame) -> pd.DataFrame:
        if verify == "estimate":
            return pd.DataFrame(
                {"left_id": b[id_col].astype("int64"), "_lsig": b["sig"]}
            )
        return pd.DataFrame(
            {"left_id": b[id_col].astype("int64"), "_ltext": b[text_col]}
        )

    def as_right(b: pd.DataFrame) -> pd.DataFrame:
        if verify == "estimate":
            return pd.DataFrame(
                {"right_id": b[id_col].astype("int64"), "_rsig": b["sig"]}
            )
        return pd.DataFrame(
            {"right_id": b[id_col].astype("int64"), "_rtext": b[text_col]}
        )

    P = n_partitions = resolve_partitions(docs, n_partitions)
    # memory-aware merge admission (join.py module docs): each task
    # requests ~3x its partition's doc bytes so 200+ concurrent
    # text-attach merges can't heap-OOM the node at soak scale
    from ocr_ray.stages.join import exchange_task_memory

    mem = exchange_task_memory(int(attach_src.size_bytes() or 0), P)
    pt, dal = pairs_task, dedupe_attach_left
    arv = (attach_right_verify_sig if verify == "estimate"
           else attach_right_verify)
    if mem:
        pt = pt.options(memory=mem)
        dal = dal.options(memory=mem)
        arv = arv.options(memory=mem)
    bsplit = _exchange(bands, ["band_id", "band_hash"], P)
    pair_refs = [pt.remote(*[s[j] for s in bsplit]) for j in range(P)]

    psplit = _exchange(pair_refs, "left_id", P)
    lsplit = _exchange(attach_src.map_batches(as_left, batch_format="pandas"),
                       "left_id", P)
    j1_refs = [
        dal.remote(
            len(psplit), *[s[j] for s in psplit], *[s[j] for s in lsplit]
        )
        for j in range(P)
    ]

    j1split = _exchange(j1_refs, "right_id", P)
    rsplit = _exchange(attach_src.map_batches(as_right, batch_format="pandas"),
                       "right_id", P)
    out_refs = [
        arv.remote(
            len(j1split), *[s[j] for s in j1split], *[s[j] for s in rsplit]
        )
        for j in range(P)
    ]
    return rd.from_arrow_refs(out_refs)


def simhash_dedup_pairs(
    docs: "object",
    n_bands: int = 10,
    shingle_k: int = 3,
    max_hamming: int = 9,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_partitions: "int | None" = None,
    concurrency: int = 2,  # kept for API compat; task pool self-scales
    scheme: str = "poly",
) -> "object":
    """SimHash near-dup pairs, end-to-end distributed: 62-bit
    SQL-replicable signatures (:class:`PolySimHasher`; ``scheme="siphash"``
    selects the 64-bit SipHash variant), bit-band bucketing (pigeonhole
    guarantees candidates for Hamming < n_bands — with the default
    ``max_hamming = n_bands - 1`` the output provably equals the all-pairs
    Hamming filter), then the same three raw-task exchanges as
    :func:`minhash_dedup_pairs` — the signature side table (one row per
    band, deduped per partition) replaces doc texts and each partition
    verifies Hamming <= max_hamming vectorized (xor + popcount)."""
    if scheme == "siphash" and 64 % n_bands != 0:
        # fail at the driver with guidance, not as an AssertionError in
        # every worker task: SimHasher requires equal-width 64-bit bands
        raise ValueError(
            f"scheme='siphash' bands a 64-bit signature: n_bands must "
            f"divide 64 (got {n_bands}); use n_bands=8 with "
            "max_hamming < 8 to keep the provably-exact banding guarantee")
    import pyarrow as pa

    import ray
    import ray.data as rd

    @ray.remote(num_cpus=0)
    def pairs_task(*pieces):
        g = _concat_pd(pieces)
        out = _pairs_from_bucket_partition(g, ["band_id", "band_key"], id_col)
        return pa.Table.from_pandas(out, preserve_index=False)

    @ray.remote(num_cpus=0)
    def dedupe_attach_left(n_pairs: int, *pieces):
        cands = _concat_pd(pieces[:n_pairs])
        sigs = _concat_pd(pieces[n_pairs:])
        if not len(cands) or not len(sigs):
            # all-empty exchange side may carry the pre-map schema
            # (join._split_blocks): the join result is empty either way
            return pa.Table.from_pandas(pd.DataFrame(
                {"left_id": pd.Series(dtype="int64"),
                 "right_id": pd.Series(dtype="int64"),
                 "_lsig": pd.Series(dtype="uint64")}),
                preserve_index=False)
        sigs = sigs.drop_duplicates("left_id")
        cands = cands.drop_duplicates(["left_id", "right_id"])
        out = cands.merge(sigs, on="left_id", how="inner")
        return pa.Table.from_pandas(out, preserve_index=False)

    @ray.remote(num_cpus=0)
    def attach_right_verify(n_left: int, *pieces):
        left = _concat_pd(pieces[:n_left])
        sigs = _concat_pd(pieces[n_left:])
        if not len(left) or not len(sigs):
            return pa.Table.from_pandas(pd.DataFrame(
                {"left_id": pd.Series(dtype="int64"),
                 "right_id": pd.Series(dtype="int64"),
                 "hamming": pd.Series(dtype="int64")}),
                preserve_index=False)
        sigs = sigs.drop_duplicates("right_id")
        b = left.merge(sigs, on="right_id", how="inner")
        if not len(b):
            out = pd.DataFrame(
                {"left_id": pd.Series([], dtype="int64"),
                 "right_id": pd.Series([], dtype="int64"),
                 "hamming": pd.Series([], dtype="int64")}
            )
            return pa.Table.from_pandas(out, preserve_index=False)
        xor = b["_lsig"].to_numpy(dtype=np.uint64) ^ b["_rsig"].to_numpy(dtype=np.uint64)
        ham = np.unpackbits(xor.view(np.uint8).reshape(-1, 8), axis=1).sum(
            axis=1, dtype=np.int64
        )
        keep = ham <= max_hamming
        out = pd.DataFrame(
            {
                "left_id": b["left_id"].to_numpy(dtype="int64")[keep],
                "right_id": b["right_id"].to_numpy(dtype="int64")[keep],
                "hamming": ham[keep],
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    sig_rows = docs.map_batches(
        simhash_bands_batch, batch_format="pandas",
        fn_kwargs={"scheme": scheme, "n_bands": n_bands,
                   "shingle_k": shingle_k,
                   "text_col": text_col, "id_col": id_col},
    ).materialize()  # consumed three times: buckets + both signature sides

    def as_left(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"left_id": b[id_col].astype("int64"),
             "_lsig": b["simhash"].astype("uint64")}
        )

    def as_right(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"right_id": b[id_col].astype("int64"),
             "_rsig": b["simhash"].astype("uint64")}
        )

    P = n_partitions = resolve_partitions(sig_rows, n_partitions)
    # same memory-aware merge admission as minhash (join.py module docs)
    from ocr_ray.stages.join import exchange_task_memory

    mem = exchange_task_memory(int(sig_rows.size_bytes() or 0), P)
    pt, dal, arv = pairs_task, dedupe_attach_left, attach_right_verify
    if mem:
        pt = pt.options(memory=mem)
        dal = dal.options(memory=mem)
        arv = arv.options(memory=mem)
    bsplit = _exchange(sig_rows, ["band_id", "band_key"], P)
    pair_refs = [pt.remote(*[s[j] for s in bsplit]) for j in range(P)]

    psplit = _exchange(pair_refs, "left_id", P)
    lsplit = _exchange(sig_rows.map_batches(as_left, batch_format="pandas"), "left_id", P)
    j1_refs = [
        dal.remote(
            len(psplit), *[s[j] for s in psplit], *[s[j] for s in lsplit]
        )
        for j in range(P)
    ]

    j1split = _exchange(j1_refs, "right_id", P)
    rsplit = _exchange(sig_rows.map_batches(as_right, batch_format="pandas"), "right_id", P)
    out_refs = [
        arv.remote(
            len(j1split), *[s[j] for s in j1split], *[s[j] for s in rsplit]
        )
        for j in range(P)
    ]
    return rd.from_arrow_refs(out_refs)


# ---------------------------------------------------------------- simhash
class SimHasher:
    """64-bit SimHash; near-dups share band keys.  Features are words
    (``shingle_k=0``) or k-word shingles — shingles make signatures
    distinctive even when documents share most of their vocabulary (word-set
    features saturate on small shared vocabularies).  Banding with
    ``n_bands`` equal-width bands guarantees candidate generation for pairs
    with Hamming distance < n_bands (pigeonhole); verify with
    :func:`hamming64` after the band groupby.

    Feature hashing is the vectorized pipeline above (flat SipHash pass +
    rolling-polynomial shingles); the bit-majority vote is numpy."""

    def __init__(self, n_bands: int = 8, shingle_k: int = 3,
                 text_col: str = "text", id_col: str = "doc_id"):
        assert 64 % n_bands == 0
        self.n_bands = n_bands
        self.band_width = 64 // n_bands
        self.shingle_k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    @staticmethod
    def _sig_from_shingles(sh: np.ndarray) -> int:
        feats = np.unique(sh)  # set semantics: each distinct shingle votes once
        if feats.size == 0:
            return 0
        bits = np.unpackbits(
            feats.view(np.uint8).reshape(feats.size, 8), axis=1
        ).astype(np.int32)
        votes = bits.sum(axis=0) * 2 - feats.size  # (+1/-1 vote per feature)
        sig_bits = (votes > 0).astype(np.uint8)
        return int.from_bytes(np.packbits(sig_bits).tobytes(), "little")

    @staticmethod
    def signature(text: str, shingle_k: int = 0) -> int:
        th = hash_tokens_flat(text.split())
        return SimHasher._sig_from_shingles(shingle_hashes(th, shingle_k))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        _require_non_null(batch, (self.id_col, self.text_col))
        texts = list(batch[self.text_col])
        per_row, _ = _batch_shingle_hashes(texts, self.shingle_k)
        n = len(texts)
        sigs = np.fromiter(
            (self._sig_from_shingles(sh) for sh in per_row),
            dtype=np.uint64, count=n,
        )
        mask = np.uint64((1 << self.band_width) - 1)
        shifts = (np.arange(self.n_bands, dtype=np.uint64) * np.uint64(self.band_width))
        keys = (sigs[:, None] >> shifts[None, :]) & mask  # (n, n_bands)
        return pd.DataFrame(
            {
                self.id_col: np.repeat(np.asarray(batch[self.id_col]), self.n_bands),
                "simhash": np.repeat(sigs, self.n_bands),
                "band_id": np.tile(np.arange(self.n_bands, dtype=np.int32), n),
                "band_key": keys.ravel(),
            }
        )


def hamming64(a: int, b: int) -> int:
    return bin(int(a) ^ int(b)).count("1")


# ---------------------------------------------- cross-split contamination
def cross_split_contamination(
    docs: "object",
    split_of,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_partitions: "int | None" = None,
    max_df: int = 0,
) -> "object":
    """Train/eval contamination check — a first-class guard for training
    pipelines: every non-train document that shares ANY k-word shingle with
    any train document is flagged.

    ``split_of(ids: int64 array) -> (is_train bool array, label str array)``
    must be a pure function of the id (deterministic hash split), so no
    side table needs shipping.  Shingles are the SQL-replicable 62-bit
    polynomial features (:class:`PolySimHasher`), exploded to (h, id,
    is_train, label) rows and hash-exchanged BY SHINGLE — each partition
    independently builds its local train-shingle set and emits its local
    contaminated ids; a second exchange by id dedupes.  Both sides of the
    oracle join on the same 62-bit hashes, so collision behavior is
    identical by construction.

    ``max_df > 0`` drops shingles occurring in more than ``max_df``
    documents from the check (partition-local — a shingle's rows all land
    in one partition, so its document frequency is computable there).
    This is BOTH the skew guard (a boilerplate shingle shared by millions
    of docs would otherwise pile its rows into one partition's train-set
    and match every eval doc) and standard decontamination practice:
    ultra-common n-grams carry no leakage signal."""
    import pyarrow as pa

    import ray
    import ray.data as rd

    hasher = PolySimHasher(shingle_k=shingle_k)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        _require_non_null(b, (id_col, text_col))
        ids = b[id_col].to_numpy(dtype="int64")
        is_train, label = split_of(ids)
        hs, out_id, out_tr, out_lb = [], [], [], []
        for i, t in enumerate(b[text_col]):
            f = hasher.features(t)
            hs.append(f)
            out_id.append(np.full(f.size, ids[i], dtype=np.int64))
            out_tr.append(np.full(f.size, is_train[i], dtype=bool))
            out_lb.extend([label[i]] * f.size)
        if not hs:
            return pd.DataFrame({"h": pd.Series([], dtype="int64"),
                                 "id": pd.Series([], dtype="int64"),
                                 "is_train": pd.Series([], dtype="bool"),
                                 "split": pd.Series([], dtype="object")})
        return pd.DataFrame(
            {"h": np.concatenate(hs), "id": np.concatenate(out_id),
             "is_train": np.concatenate(out_tr), "split": out_lb}
        )

    @ray.remote(num_cpus=0)
    def contaminated_local(*pieces):
        g = _concat_pd(pieces)
        if not len(g):
            out = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                "split": pd.Series([], dtype="object")})
            return pa.Table.from_pandas(out, preserve_index=False)
        if max_df > 0:
            g = g[g.groupby("h")["id"].transform("nunique") <= max_df]
        train_h = set(g.loc[g["is_train"], "h"].tolist())
        ev = g[~g["is_train"] & g["h"].isin(train_h)]
        out = (ev[["id", "split"]].drop_duplicates("id")
               .rename(columns={"id": "doc_id"}))
        return pa.Table.from_pandas(out.reset_index(drop=True),
                                    preserve_index=False)

    @ray.remote(num_cpus=0)
    def dedupe(*pieces):
        g = _concat_pd(pieces).drop_duplicates("doc_id")
        return pa.Table.from_pandas(g.reset_index(drop=True),
                                    preserve_index=False)

    rows = docs.map_batches(explode, batch_format="pandas")
    P = n_partitions = resolve_partitions(docs, n_partitions)
    hsplit = _exchange(rows, "h", P)
    local_refs = [
        contaminated_local.remote(*[s[j] for s in hsplit]) for j in range(P)
    ]
    dsplit = _exchange(local_refs, "doc_id", P)
    out_refs = [dedupe.remote(*[s[j] for s in dsplit]) for j in range(P)]
    return rd.from_arrow_refs(out_refs)


def keep_representatives(
    docs: "object",
    clusters: "object",
    id_col: str = "doc_id",
    n_partitions: "int | None" = None,
) -> "object":
    """Survivor ids after cluster-collapse dedup: every id in ``docs``
    except cluster members whose ``cluster_id`` label differs from their
    own id (non-representatives).  Hash-exchange anti-join on the id: both
    sides split by id hash, each partition keeps ids whose max removal
    flag is 0 — the removed set never lands on the driver."""
    import ray.data as rd

    from ocr_ray.stages.join import exchange_map_partitions

    def nonreps(b: pd.DataFrame) -> pd.DataFrame:
        out = b.loc[b[id_col] != b["cluster_id"], [id_col]].copy()
        out["removed"] = np.int64(1)
        return out

    def ids_only(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {id_col: b[id_col].astype("int64"), "removed": np.int64(0)}
        )

    both = docs.map_batches(ids_only, batch_format="pandas").union(
        clusters.map_batches(nonreps, batch_format="pandas")
    )

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        if id_col not in g.columns or "removed" not in g.columns:
            # all-empty union legs skip their UDFs -> pre-map schema
            return pd.DataFrame({id_col: pd.Series(dtype="int64")})
        m = g.groupby(id_col, as_index=False)["removed"].max()
        return m.loc[m["removed"] == 0, [id_col]]

    return exchange_map_partitions(both, id_col, anti, n_partitions)


def keep_best_representatives(
    meta: "object",
    clusters: "object",
    id_col: str = "doc_id",
    score_col: str = "n_chars",
    n_partitions: "int | None" = None,
) -> "object":
    """Quality-aware cluster collapse: per near-dup cluster keep the member
    with the HIGHEST ``score_col`` (tie: lowest id) — what production
    curation actually does (keep the longest / best-quality copy), vs the
    min-id convention of :func:`keep_representatives`.  Reference analog:
    the keep-first result-cache semantics upgraded to a ranked choice
    (ocr_app/utils/result_cache.py); cf. Lee et al. 2022 §4.

    Fully distributed, three bounded metadata exchanges (ids + one int
    score; document text never moves):

    1. id-hash join of cluster members against ``meta`` (id, score);
    2. cluster_id exchange — per-cluster vectorized sort picks the winner,
       every other member is emitted as a removal flag;
    3. id-hash anti-join of removal flags against the full ``meta`` id
       column (the removed set never lands on the driver).

    ``meta`` must carry ``id_col`` + ``score_col`` only (prune at the
    read); output is the survivor table ``(id_col, score_col)``."""
    from ocr_ray.stages.join import exchange_join, exchange_map_partitions

    joined = exchange_join(clusters, meta, on=id_col,
                           n_partitions=n_partitions)

    def losers(g: pd.DataFrame) -> pd.DataFrame:
        # score dtype is PRESERVED end to end (an int64 cast would
        # silently truncate float scores like quality_score in [0,1]);
        # the placeholder zeros below match it so the union's blocks
        # agree on the physical schema
        sdt = g[score_col].dtype if score_col in g.columns else np.dtype(
            "int64")
        if "cluster_id" not in g.columns or not len(g):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "removed": pd.Series(dtype="int64"),
                                 score_col: pd.Series(dtype=sdt)})
        g = g.sort_values(["cluster_id", score_col, id_col],
                          ascending=[True, False, True], kind="mergesort")
        out = g.loc[g["cluster_id"].duplicated(), [id_col]].copy()
        out["removed"] = np.int64(1)
        out[score_col] = np.zeros(len(out), dtype=sdt)  # placeholder; true
        return out                 # score rides the meta leg (anti: max)

    flagged = exchange_map_partitions(joined, "cluster_id", losers,
                                      n_partitions)

    def base(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: b[id_col].astype("int64"),
                             "removed": np.int64(0),
                             score_col: b[score_col]})

    both = meta.map_batches(base, batch_format="pandas").union(flagged)

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        if id_col not in g.columns or not len(g):
            sdt = (g[score_col].dtype if score_col in g.columns
                   else np.dtype("int64"))
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 score_col: pd.Series(dtype=sdt)})
        m = g.groupby(id_col, as_index=False).agg(
            removed=("removed", "max"), **{score_col: (score_col, "max")})
        return m.loc[m["removed"] == 0, [id_col, score_col]]

    return exchange_map_partitions(both, id_col, anti, n_partitions)


def shingle_novelty(
    docs: "object",
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_partitions: "int | None" = None,
) -> "object":
    """Per-document novelty score — the fraction of a doc's distinct k-word
    shingles whose global first occurrence (minimum doc id among all docs
    containing the shingle) is this doc.  The standard "how much new
    content does this document contribute" signal for corpus curation:
    novelty ~0 marks near-total rehashes that survive pairwise dedup
    thresholds, novelty 1 marks fully original text.

    Same SQL-replicable 62-bit polynomial shingle features as
    :func:`cross_split_contamination` (:class:`PolySimHasher`), so the
    DuckDB oracle joins on identical hashes.  Two bounded exchanges, no
    driver state: explode (h, id) distinct rows, exchange BY SHINGLE —
    each partition owns every occurrence of its shingles, so min-id and
    per-doc partial counts are local — then exchange the per-(partition,
    doc) partials BY DOC and sum.  Rows moved: one per (doc, distinct
    shingle) in phase 1, at most one per (doc, partition) in phase 2."""
    import pyarrow as pa

    import ray
    import ray.data as rd

    hasher = PolySimHasher(shingle_k=shingle_k)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        _require_non_null(b, (id_col, text_col))
        ids = b[id_col].to_numpy(dtype="int64")
        hs, out_id = [], []
        for i, t in enumerate(b[text_col]):
            f = hasher.features(t)
            if f.size:
                hs.append(f)
                out_id.append(np.full(f.size, ids[i], dtype=np.int64))
        if not hs:
            return pd.DataFrame({"h": pd.Series([], dtype="int64"),
                                 "id": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {"h": np.concatenate(hs), "id": np.concatenate(out_id)}
        )

    @ray.remote(num_cpus=0)
    def novel_local(*pieces):
        g = _concat_pd(pieces)
        if not len(g):
            out = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                "n_shingles": pd.Series([], dtype="int64"),
                                "n_novel": pd.Series([], dtype="int64")})
            return pa.Table.from_pandas(out, preserve_index=False)
        first = g.groupby("h")["id"].transform("min")
        g = pd.DataFrame({"doc_id": g["id"],
                          "is_novel": (g["id"] == first).astype("int64")})
        out = g.groupby("doc_id", as_index=False).agg(
            n_shingles=("is_novel", "size"), n_novel=("is_novel", "sum")
        )
        out["n_shingles"] = out["n_shingles"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    @ray.remote(num_cpus=0)
    def combine(*pieces):
        g = _concat_pd(pieces)
        if not len(g):
            out = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                "n_shingles": pd.Series([], dtype="int64"),
                                "n_novel": pd.Series([], dtype="int64"),
                                "novelty": pd.Series([], dtype="float64")})
            return pa.Table.from_pandas(out, preserve_index=False)
        out = g.groupby("doc_id", as_index=False).agg(
            n_shingles=("n_shingles", "sum"), n_novel=("n_novel", "sum")
        )
        # floor(x*1e6+0.5)/1e6: identical IEEE ops to the DuckDB oracle
        out["novelty"] = np.floor(
            out["n_novel"].to_numpy(dtype="float64")
            / out["n_shingles"].to_numpy(dtype="float64") * 1e6 + 0.5
        ) / 1e6
        return pa.Table.from_pandas(out, preserve_index=False)

    rows = docs.map_batches(explode, batch_format="pandas")
    P = n_partitions = resolve_partitions(docs, n_partitions)
    hsplit = _exchange(rows, "h", P)
    local_refs = [novel_local.remote(*[s[j] for s in hsplit]) for j in range(P)]
    dsplit = _exchange(local_refs, "doc_id", P)
    out_refs = [combine.remote(*[s[j] for s in dsplit]) for j in range(P)]
    return rd.from_arrow_refs(out_refs)


# ------------------------------------------------- connected components
def connected_components(
    pairs: "object",
    left_col: str = "left_id",
    right_col: str = "right_id",
    n_partitions: "int | None" = None,
    max_rounds: int = 50,
) -> "object":
    """Duplicate-cluster labels from a near-dup pair table: every id that
    appears in a pair gets ``cluster_id`` = the minimum id reachable
    through pairs (the canonical representative — "keep the smallest id,
    drop the rest" is then a filter).

    Distributed min-label propagation over the raw-task hash exchange:
    edges are split ONCE by src-id hash; each round, per-partition "emit"
    tasks join local labels to local edges and scatter candidate labels to
    the neighbor's partition (``num_returns=n_partitions`` — the message
    shuffle never touches the driver), and "update" tasks take the
    per-partition min and report only a changed-count int back.  Each
    round also POINTER-JUMPS (label <- label[label]): every non-root
    label row asks the partition OWNING its current label (same id-hash
    partitioning, so the owner lookup is one exchange) for that label's
    label and takes the min — path lengths halve per round, so long-chain
    graphs converge in O(log diameter) rounds instead of O(diameter),
    while near-clique dup clusters still finish in 2-3.  Terminates when
    a propagation+jump round changes nothing (propagation fixpoint ==
    every node holds its component minimum; jumps only move labels to
    other in-component ids, so the invariant and the result are exact).
    Driver-side state per round: 2P integers, never row data."""
    import pyarrow as pa

    import ray
    import ray.data as rd

    # floor at 2: num_returns=1 makes Ray return a bare ObjectRef (not a
    # 1-list), which the per-partition indexing below can't subscript
    P = n_partitions = max(2, resolve_partitions(pairs, n_partitions))

    def to_adj(b: pd.DataFrame) -> pd.DataFrame:
        u = b[left_col].to_numpy(dtype="int64")
        v = b[right_col].to_numpy(dtype="int64")
        return pd.DataFrame(
            {"src": np.concatenate([u, v]), "dst": np.concatenate([v, u])}
        )

    adj = pairs.map_batches(to_adj, batch_format="pandas")
    esplit = _exchange(adj, "src", P)
    edge_parts = [[s[j] for s in esplit] for j in range(P)]

    @ray.remote(num_cpus=0)
    def init_labels(*pieces):
        g = _concat_pd(pieces)
        ids = np.unique(g["src"].to_numpy(dtype="int64")) if len(g) else np.array([], dtype="int64")
        return pa.Table.from_pandas(
            pd.DataFrame({"id": ids, "label": ids}), preserve_index=False
        )

    @ray.remote(num_cpus=0)
    def emit(labels_tbl, *pieces):
        lab = labels_tbl.to_pandas()
        g = _concat_pd(pieces)
        if len(g) and len(lab):
            m = g.merge(lab, left_on="src", right_on="id", how="inner")
            msgs = pd.DataFrame(
                {"id": m["dst"].to_numpy(dtype="int64"),
                 "label": m["label"].to_numpy(dtype="int64")}
            ).groupby("id", as_index=False)["label"].min()
        else:
            msgs = pd.DataFrame({"id": pd.Series([], dtype="int64"),
                                 "label": pd.Series([], dtype="int64")})
        h = pd.util.hash_pandas_object(msgs["id"].astype("int64"), index=False).to_numpy()
        part = (h % P).astype(np.int64)
        return tuple(
            pa.Table.from_pandas(msgs[part == j], preserve_index=False)
            for j in range(P)
        )

    @ray.remote(num_returns=2, num_cpus=0)
    def update(labels_tbl, *msg_pieces):
        lab = labels_tbl.to_pandas()
        msgs = _concat_pd(msg_pieces)
        if not len(msgs) or not len(lab):
            return labels_tbl, 0
        best = msgs.groupby("id", as_index=False)["label"].min()
        # nullable Int64 keeps ids exact through the left join: a float64
        # NaN column would lose precision above 2^53 and
        # fillna(INT64_MAX) overflows the int64 cast to INT64_MIN for ids
        # with no message this round (jump messages cover only non-roots)
        best["label"] = best["label"].astype("Int64")
        m = lab.merge(best, on="id", how="left", suffixes=("", "_new"))
        own = m["label"].to_numpy(dtype="int64")
        cand = (m["label_new"].where(m["label_new"].notna(), m["label"])
                .astype("int64").to_numpy())
        new = np.minimum(own, cand)
        changed = int((new != own).sum())
        out = pa.Table.from_pandas(
            pd.DataFrame({"id": m["id"].to_numpy(dtype="int64"), "label": new}),
            preserve_index=False,
        )
        return out, changed

    @ray.remote(num_cpus=0)
    def jump_request(labels_tbl):
        # route each non-root (id, label) row to the partition that OWNS
        # the label id (same hash as the label partitioning itself)
        lab = labels_tbl.to_pandas()
        sub = lab[lab["label"] != lab["id"]]
        h = pd.util.hash_pandas_object(sub["label"].astype("int64"),
                                       index=False).to_numpy()
        part = (h % P).astype(np.int64)
        return tuple(
            pa.Table.from_pandas(sub[part == j], preserve_index=False)
            for j in range(P)
        )

    @ray.remote(num_cpus=0)
    def jump_reply(labels_tbl, *req_pieces):
        # this partition owns the requested label ids: answer with the
        # label's label, routed back to the requester's id partition
        lab = labels_tbl.to_pandas()
        req = _concat_pd(req_pieces)
        if len(req) and len(lab):
            m = req.merge(lab, left_on="label", right_on="id", how="inner",
                          suffixes=("", "_owner"))
            msgs = pd.DataFrame(
                {"id": m["id"].to_numpy(dtype="int64"),
                 "label": m["label_owner"].to_numpy(dtype="int64")}
            )
        else:
            msgs = pd.DataFrame({"id": pd.Series([], dtype="int64"),
                                 "label": pd.Series([], dtype="int64")})
        h = pd.util.hash_pandas_object(msgs["id"].astype("int64"),
                                       index=False).to_numpy()
        part = (h % P).astype(np.int64)
        return tuple(
            pa.Table.from_pandas(msgs[part == j], preserve_index=False)
            for j in range(P)
        )

    labels = [init_labels.remote(*edge_parts[j]) for j in range(P)]
    for _ in range(max_rounds):
        # propagation: neighbors' labels
        outs = [
            emit.options(num_returns=P).remote(labels[j], *edge_parts[j])
            for j in range(P)
        ]
        new_labels, counts = [], []
        for j in range(P):
            nl, ch = update.remote(labels[j], *[outs[i][j] for i in range(P)])
            new_labels.append(nl)
            counts.append(ch)
        labels = new_labels
        # pointer jump: label <- min(label, label[label])
        reqs = [jump_request.options(num_returns=P).remote(labels[j])
                for j in range(P)]
        replies = [
            jump_reply.options(num_returns=P).remote(
                labels[j], *[reqs[i][j] for i in range(P)]
            )
            for j in range(P)
        ]
        new_labels = []
        for j in range(P):
            nl, ch = update.remote(labels[j], *[replies[i][j] for i in range(P)])
            new_labels.append(nl)
            counts.append(ch)
        labels = new_labels
        if sum(ray.get(counts)) == 0:
            break
    else:
        # with jumping, rounds needed ~ log2(diameter) + propagation
        # constant; hitting the backstop means something is wrong — fail
        # loudly rather than return mislabeled clusters
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "(unexpected with pointer jumping; raise max_rounds)"
        )

    @ray.remote(num_cpus=0)
    def finalize(tbl):
        lab = tbl.to_pandas()
        return pa.Table.from_pandas(
            pd.DataFrame({"doc_id": lab["id"].to_numpy(dtype="int64"),
                          "cluster_id": lab["label"].to_numpy(dtype="int64")}),
            preserve_index=False,
        )

    return rd.from_arrow_refs([finalize.remote(t) for t in labels])


# ----------------------------------------------- SQL-replicable simhash
# Two independent polynomial codepoint hashes per token (same family as the
# embedder/fingerprint hash, stages/embed.py:hash_token), combined per
# k-shingle by rolling polynomials mod 2^31-1 into a 62-bit feature.  Every
# operation is exact BIGINT arithmetic, so a DuckDB oracle can recompute the
# full signature — the dedup_simhash query is value-checked end to end, not
# rows-only.  Constants are frozen: changing any of them silently breaks
# the oracle.
_P1_MULT, _P1_MOD, _P1_INIT = 31, 1000003, 7
_P2_MULT, _P2_MOD, _P2_INIT = 37, 1000033, 11
_MOD31 = (1 << 31) - 1
POLY_SIG_BITS = 62


def _poly_hash_token(tok: str) -> Tuple[int, int]:
    h1, h2 = _P1_INIT, _P2_INIT
    for ch in tok:
        c = ord(ch)
        h1 = (h1 * _P1_MULT + c) % _P1_MOD
        h2 = (h2 * _P2_MULT + c) % _P2_MOD
    return h1, h2


class PolySimHasher:
    """62-bit SimHash over k-word shingles with SQL-replicable hashing.

    Feature = (rolling poly of token-hash-1 mod 2^31-1)
            + (rolling poly of token-hash-2 mod 2^31-1) << 31,
    distinct features vote ±1 per bit, bit = (vote sum > 0).

    Banding: ``n_bands`` contiguous bit ranges (widths differing by at most
    one).  Pigeonhole: any pair with Hamming < n_bands shares at least one
    full band, so with ``max_hamming = n_bands - 1`` in the verify step the
    pipeline's output EXACTLY equals the all-pairs Hamming filter — no
    recall assumption, which is what makes the DuckDB oracle sound.
    Scale note: n_bands=10 means 6-7-bit band keys (<=128 buckets per
    band); at billions of rows, raise the signature width / band width and
    lower the guaranteed radius, or pre-partition by a coarse length key.
    """

    def __init__(self, n_bands: int = 10, shingle_k: int = 3,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.n_bands = n_bands
        self.shingle_k = shingle_k
        self.text_col = text_col
        self.id_col = id_col
        base, rem = divmod(POLY_SIG_BITS, n_bands)
        widths = [base + 1] * rem + [base] * (n_bands - rem)
        self._offsets = np.cumsum([0] + widths[:-1]).astype(np.uint64)
        self._masks = np.array([(1 << w) - 1 for w in widths], dtype=np.uint64)
        self._cache: Dict[str, Tuple[int, int]] = {}

    def _token_hashes(self, tokens: List[str]) -> np.ndarray:
        out = np.empty((len(tokens), 2), dtype=np.int64)
        cache = self._cache
        for i, t in enumerate(tokens):
            f = cache.get(t)
            if f is None:
                if len(cache) > 2_000_000:  # bound actor memory on open vocab
                    cache.clear()
                f = cache.setdefault(t, _poly_hash_token(t))
            out[i] = f
        return out

    def features(self, text: str) -> np.ndarray:
        """Distinct 62-bit shingle features of one document."""
        toks = text.split()
        n = len(toks)
        if n == 0:
            return np.array([], dtype=np.int64)
        th = self._token_hashes(toks)
        t1, t2 = th[:, 0], th[:, 1]
        k = self.shingle_k
        if n < k:  # short doc: one shingle folding every token
            s1, s2 = 0, 0
            for a, b in zip(t1.tolist(), t2.tolist()):
                s1 = (s1 * _P1_MOD + a) % _MOD31
                s2 = (s2 * _P2_MOD + b) % _MOD31
            return np.array([s1 + (s2 << 31)], dtype=np.int64)
        m = n - k + 1
        s1 = t1[:m].copy()
        s2 = t2[:m].copy()
        for j in range(1, k):  # products < 2^51: exact in int64
            s1 = (s1 * _P1_MOD + t1[j:m + j]) % _MOD31
            s2 = (s2 * _P2_MOD + t2[j:m + j]) % _MOD31
        return np.unique(s1 + (s2 << 31))

    def signature_of(self, text: str) -> int:
        h = self.features(text)
        if h.size == 0:
            return 0
        bits = (h[:, None] >> np.arange(POLY_SIG_BITS)[None, :]) & 1
        votes = bits.sum(axis=0, dtype=np.int64) * 2 - h.size
        return int(((votes > 0).astype(np.int64)
                    << np.arange(POLY_SIG_BITS)).sum())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        _require_non_null(batch, (self.id_col, self.text_col))
        n = len(batch)
        sigs = np.fromiter(
            (self.signature_of(t) for t in batch[self.text_col]),
            dtype=np.uint64, count=n,
        )
        keys = (sigs[:, None] >> self._offsets[None, :]) & self._masks[None, :]
        return pd.DataFrame(
            {
                self.id_col: np.repeat(np.asarray(batch[self.id_col]), self.n_bands),
                "simhash": np.repeat(sigs, self.n_bands),
                "band_id": np.tile(np.arange(self.n_bands, dtype=np.int32), n),
                "band_key": keys.ravel(),
            }
        )


def incremental_containment(
    corpus: "object",
    shard: "object",
    shingle_k: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_partitions: "int | None" = None,
) -> "object":
    """Incremental shard-vs-corpus dedup: score each NEW document by the
    fraction of its distinct k-word shingles already present anywhere in
    the existing corpus (containment), and flag ``is_dup`` when that
    fraction reaches ``threshold``.  This is the crawl-refresh /
    decontamination primitive: the corpus side is never re-deduped, only
    streamed once to expose its shingle-hash set, so admitting a new
    shard costs O(shard + corpus scan) instead of re-clustering the
    world.  (Persist the exchanged corpus shingle partitions once and
    the per-shard cost drops to O(shard).)

    Same SQL-replicable polynomial shingle features as
    :func:`shingle_novelty` (:class:`PolySimHasher`), same two bounded
    exchanges: explode both sides to (h[, id]) rows, exchange BY SHINGLE
    so membership tests are partition-local (corpus rows carry no id —
    only distinct hashes move), then exchange per-(partition, doc)
    partial counts BY DOC and sum.  No driver row data, no broadcast of
    the corpus set (which at 100 TB would dwarf worker heaps)."""
    import pyarrow as pa

    import ray
    import ray.data as rd

    hasher = PolySimHasher(shingle_k=shingle_k)

    def explode_shard(b: pd.DataFrame) -> pd.DataFrame:
        _require_non_null(b, (id_col, text_col))
        ids = b[id_col].to_numpy(dtype="int64")
        hs, out_id = [], []
        for i, t in enumerate(b[text_col]):
            f = hasher.features(t)
            if f.size:
                hs.append(f)
                out_id.append(np.full(f.size, ids[i], dtype=np.int64))
        if not hs:
            return pd.DataFrame({"h": pd.Series([], dtype="int64"),
                                 "id": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {"h": np.concatenate(hs), "id": np.concatenate(out_id)}
        )

    def explode_corpus(b: pd.DataFrame) -> pd.DataFrame:
        _require_non_null(b, (text_col,))
        hs = [hasher.features(t) for t in b[text_col]]
        hs = [f for f in hs if f.size]
        if not hs:
            return pd.DataFrame({"h": pd.Series([], dtype="int64")})
        # batch-local dedup only bounds the exchange; cross-batch dups
        # collapse inside the h-partition
        return pd.DataFrame({"h": np.unique(np.concatenate(hs))})

    @ray.remote(num_cpus=0)
    def seen_local(n_shard: int, *pieces):
        g = _concat_pd(pieces[:n_shard])
        if not len(g):
            out = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                "n_shingles": pd.Series([], dtype="int64"),
                                "n_seen": pd.Series([], dtype="int64")})
            return pa.Table.from_pandas(out, preserve_index=False)
        ctab = _concat_pd(pieces[n_shard:])
        # empty corpus (crawl-refresh bootstrap: first shard vs a not-yet-
        # populated corpus) delivers the pre-map corpus schema — no
        # shingle has been seen
        corpus_h = (pd.unique(ctab["h"]) if "h" in ctab.columns
                    else np.array([], dtype="int64"))
        seen = g["h"].isin(corpus_h).astype("int64")
        out = pd.DataFrame({"doc_id": g["id"], "seen": seen}).groupby(
            "doc_id", as_index=False
        ).agg(n_shingles=("seen", "size"), n_seen=("seen", "sum"))
        out["n_shingles"] = out["n_shingles"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    @ray.remote(num_cpus=0)
    def combine(thr: float, *pieces):
        g = _concat_pd(pieces)
        if not len(g):
            out = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                "n_shingles": pd.Series([], dtype="int64"),
                                "n_seen": pd.Series([], dtype="int64"),
                                "containment": pd.Series([], dtype="float64"),
                                "is_dup": pd.Series([], dtype="int64")})
            return pa.Table.from_pandas(out, preserve_index=False)
        out = g.groupby("doc_id", as_index=False).agg(
            n_shingles=("n_shingles", "sum"), n_seen=("n_seen", "sum")
        )
        # floor(x*1e6+0.5)/1e6: identical IEEE ops to the DuckDB oracle
        out["containment"] = np.floor(
            out["n_seen"].to_numpy(dtype="float64")
            / out["n_shingles"].to_numpy(dtype="float64") * 1e6 + 0.5
        ) / 1e6
        out["is_dup"] = (out["containment"] >= thr).astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    P = n_partitions = resolve_partitions(corpus, n_partitions)
    ssplit = _exchange(shard.map_batches(explode_shard, batch_format="pandas"),
                       "h", P)
    csplit = _exchange(corpus.map_batches(explode_corpus, batch_format="pandas"),
                       "h", P)
    local_refs = [
        seen_local.remote(len(ssplit), *[s[j] for s in ssplit + csplit])
        for j in range(P)
    ]
    dsplit = _exchange(local_refs, "doc_id", P)
    out_refs = [combine.remote(threshold, *[s[j] for s in dsplit])
                for j in range(P)]
    return rd.from_arrow_refs(out_refs)


def _block_hashes(t1: np.ndarray, t2: np.ndarray, w: int) -> np.ndarray:
    """62-bit hash per non-overlapping w-token block (tail may be short).
    Same two-family polynomial fold as :class:`PolySimHasher`'s short-doc
    case, vectorized ACROSS blocks (w mod-fold passes over a (n_blocks,
    w) view — no per-block Python loop in the full-block path)."""
    n = t1.size
    nfull, tail = divmod(n, w)
    nb = nfull + (1 if tail else 0)
    out = np.empty(nb, dtype=np.int64)
    if nfull:
        a = t1[:nfull * w].reshape(nfull, w)
        b = t2[:nfull * w].reshape(nfull, w)
        s1 = np.zeros(nfull, dtype=np.int64)
        s2 = np.zeros(nfull, dtype=np.int64)
        for j in range(w):  # t1 < 1000003: products < 2^51, exact int64
            s1 = (s1 * _P1_MOD + a[:, j]) % _MOD31
            s2 = (s2 * _P2_MOD + b[:, j]) % _MOD31
        out[:nfull] = s1 + (s2 << 31)
    if tail:
        s1 = s2 = 0
        for x, y in zip(t1[nfull * w:].tolist(), t2[nfull * w:].tolist()):
            s1 = (s1 * _P1_MOD + x) % _MOD31
            s2 = (s2 * _P2_MOD + y) % _MOD31
        out[nfull] = s1 + (s2 << 31)
    return out


def _window_hashes(t1: np.ndarray, t2: np.ndarray, L: int) -> np.ndarray:
    """62-bit hash per OVERLAPPING L-token window (one per start position)
    — the positional variant of :func:`_block_hashes`; same two-family
    polynomial fold, vectorized across windows."""
    n = t1.size
    if n < L:
        return np.array([], dtype=np.int64)
    m = n - L + 1
    s1 = np.zeros(m, dtype=np.int64)
    s2 = np.zeros(m, dtype=np.int64)
    for j in range(L):  # t1 < 1000003: products < 2^51, exact int64
        s1 = (s1 * _P1_MOD + t1[j:j + m]) % _MOD31
        s2 = (s2 * _P2_MOD + t2[j:j + m]) % _MOD31
    return s1 + (s2 << 31)


def duplicated_spans(
    docs: "object",
    L: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_partitions: "int | None" = None,
) -> "object":
    """Exact duplicated-span detection — the ExactSubstr primitive of Lee
    et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"), via overlapping window hashing instead of a suffix array:
    every L-token window whose content occurs anywhere else in the corpus
    (another doc OR another position of the same doc) is flagged, and per
    doc the flagged windows merge into MAXIMAL duplicated spans
    [span_start, span_end] (token indices, inclusive).  Any duplicated
    token run of length >= L is covered by flagged windows, so the merged
    spans exactly tile the duplicated regions.

    Windows are keyed by the SQL-replicable two-family 62-bit polynomial
    hash (:func:`_window_hashes` — same families as
    :class:`PolySimHasher`), so the DuckDB oracle recomputes identical
    keys and the dup test is deterministic on both sides; at ~2^62 key
    space, cross-content collisions are negligible (~n^2/2^63) and
    IDENTICAL in engine and oracle.  Two bounded exchanges: (h, id, pos)
    rows BY HASH (a partition owns every occurrence of its hashes, so
    the >=2 test is local and only flagged int pairs come out), then
    flagged positions BY DOC for the vectorized island merge.  Exchange
    volume: one 3-int row per token position — never text."""
    import pyarrow as pa

    import ray
    import ray.data as rd

    hasher = PolySimHasher()

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy(dtype="int64")
        hs, out_id, out_pos = [], [], []
        for i, t in enumerate(b[text_col]):
            toks = t.split()
            if len(toks) < L:
                continue
            th = hasher._token_hashes(toks)
            wh = _window_hashes(th[:, 0], th[:, 1], L)
            hs.append(wh)
            out_id.append(np.full(wh.size, ids[i], dtype=np.int64))
            out_pos.append(np.arange(wh.size, dtype=np.int64))
        if not hs:
            return pd.DataFrame({"h": pd.Series([], dtype="int64"),
                                 "id": pd.Series([], dtype="int64"),
                                 "pos": pd.Series([], dtype="int64")})
        return pd.DataFrame({"h": np.concatenate(hs),
                             "id": np.concatenate(out_id),
                             "pos": np.concatenate(out_pos)})

    @ray.remote(num_cpus=0)
    def flag_dups(*pieces):
        g = _concat_pd(pieces)
        if not len(g):
            return pa.Table.from_pandas(
                pd.DataFrame({"id": pd.Series([], dtype="int64"),
                              "pos": pd.Series([], dtype="int64")}),
                preserve_index=False)
        c = g.groupby("h")["h"].transform("size")
        return pa.Table.from_pandas(
            g.loc[c >= 2, ["id", "pos"]].reset_index(drop=True),
            preserve_index=False)

    @ray.remote(num_cpus=0)
    def merge_spans(*pieces):
        g = _concat_pd(pieces)
        if not len(g):
            return pa.Table.from_pandas(
                pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                              "span_start": pd.Series([], dtype="int64"),
                              "span_end": pd.Series([], dtype="int64")}),
                preserve_index=False)
        g = g.sort_values(["id", "pos"], kind="mergesort")
        prev = g.groupby("id")["pos"].shift()
        brk = ((g["pos"] - prev > L) | prev.isna()).astype("int64")
        gid = brk.cumsum()
        out = g.assign(_g=gid).groupby(["id", "_g"], as_index=False).agg(
            span_start=("pos", "min"), span_end=("pos", "max"))
        out["span_end"] = out["span_end"] + (L - 1)
        out = out.rename(columns={"id": "doc_id"}).drop(columns=["_g"])
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    rows = docs.map_batches(explode, batch_format="pandas")
    P = n_partitions = resolve_partitions(docs, n_partitions)
    hsplit = _exchange(rows, "h", P)
    flag_refs = [flag_dups.remote(*[s[j] for s in hsplit]) for j in range(P)]
    dsplit = _exchange(flag_refs, "id", P)
    return rd.from_arrow_refs(
        [merge_spans.remote(*[s[j] for s in dsplit]) for j in range(P)]
    )


def remove_duplicated_spans(
    docs: "object",
    L: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_partitions: "int | None" = None,
    materialize_input: bool = True,
) -> "object":
    """The ExactSubstr REMOVE step: splice every duplicated span found by
    :func:`duplicated_spans` out of its document (remove-all semantics,
    as in block_dedup — rows keep their id with counts and the rebuilt
    text).  One extra exchange: spans BY DOC meet the doc texts (moved
    once); the splice is a numpy position mask per doc.  Docs with no
    tokens are dropped (no token stream to rebuild); span-free docs pass
    through intact.

    ``docs`` is consumed twice (span detection + the text side of the
    splice); by default it is materialized once so a lazy or
    nondeterministic upstream is not re-executed (spans applied to texts
    they were not computed from).  Pass ``materialize_input=False`` only
    when the input is a deterministic source read (e.g. a plain
    ``read_parquet``), where a second scan is cheaper than pinning the
    table in the object store."""
    import pyarrow as pa

    import ray
    import ray.data as rd

    if materialize_input:
        docs = docs.materialize()
    spans = duplicated_spans(docs, L=L, text_col=text_col, id_col=id_col,
                             n_partitions=n_partitions)

    def span_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "id": b["doc_id"].astype("int64"),
            "s": b["span_start"].astype("int64"),
            "e": b["span_end"].astype("int64"),
        })

    def doc_side(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"id": b[id_col].astype("int64"),
                             "_text": b[text_col]})

    @ray.remote(num_cpus=0)
    def splice(n_span: int, *pieces):
        sp = _concat_pd(pieces[:n_span])
        d = _concat_pd(pieces[n_span:])
        if not len(d):
            return pa.Table.from_pandas(
                pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                              "n_tokens": pd.Series([], dtype="int64"),
                              "n_dup_tokens": pd.Series([], dtype="int64"),
                              "dedup_text": pd.Series([], dtype="object")}),
                preserve_index=False)
        by_doc = {k: v for k, v in sp.groupby("id")} if len(sp) else {}
        ids, ntok, ndup, texts = [], [], [], []
        for did, text in zip(d["id"].tolist(), d["_text"]):
            toks = text.split()
            if not toks:
                continue
            mask = np.zeros(len(toks), dtype=bool)
            g = by_doc.get(did)
            if g is not None:
                for s, e in zip(g["s"].tolist(), g["e"].tolist()):
                    mask[s:e + 1] = True
            ids.append(did)
            ntok.append(len(toks))
            ndup.append(int(mask.sum()))
            texts.append(" ".join(t for t, m in zip(toks, mask) if not m))
        return pa.Table.from_pandas(
            pd.DataFrame({"doc_id": np.asarray(ids, dtype=np.int64),
                          "n_tokens": np.asarray(ntok, dtype=np.int64),
                          "n_dup_tokens": np.asarray(ndup, dtype=np.int64),
                          "dedup_text": texts}),
            preserve_index=False)

    P = n_partitions = resolve_partitions(docs, n_partitions)
    ssplit = _exchange(spans.map_batches(span_rows, batch_format="pandas"),
                       "id", P)
    dsplit = _exchange(docs.map_batches(doc_side, batch_format="pandas"),
                       "id", P)
    return rd.from_arrow_refs(
        [splice.remote(len(ssplit), *[s[j] for s in ssplit + dsplit])
         for j in range(P)]
    )


def block_dedup(
    docs: "object",
    w: int = 6,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_partitions: "int | None" = None,
    carry_cols=(),
) -> "object":
    """Cross-document duplicated-block removal — the CCNet/MassiveText
    "drop lines repeated across the corpus" boilerplate filter, at
    non-overlapping w-token block granularity (the segment unit that
    exists in any text; swap the splitter for newline paragraphs when
    the corpus has them).  A block whose 62-bit content hash appears in
    >= ``min_docs`` DISTINCT documents is removed from EVERY document
    (remove-all, CCNet semantics); each doc's surviving blocks are
    rejoined in order.

    Three bounded exchanges, no broadcast of the banned set (at 100 TB
    boilerplate is unbounded — navigation chrome, legal footers):
    (1) blocks exchange BY HASH; a partition owns every occurrence of
    its hashes, so the >=min_docs test is local and only banned-hash
    rows (ints) come out; (2) the same hash partitions anti-join blocks
    against banned locally, emitting only REMOVED (doc, block_idx) int
    pairs; (3) removed pairs exchange BY DOC against the doc text
    (moved once) for order-preserving reassembly."""
    import pyarrow as pa

    import ray
    import ray.data as rd

    hasher = PolySimHasher()

    def doc_block_hashes(text: str) -> np.ndarray:
        toks = text.split()
        if not toks:
            return np.array([], dtype=np.int64)
        th = hasher._token_hashes(toks)
        return _block_hashes(th[:, 0], th[:, 1], w)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy(dtype="int64")
        hs, out_id, out_idx = [], [], []
        for i, t in enumerate(b[text_col]):
            bh = doc_block_hashes(t)
            if bh.size:
                hs.append(bh)
                out_id.append(np.full(bh.size, ids[i], dtype=np.int64))
                out_idx.append(np.arange(bh.size, dtype=np.int64))
        if not hs:
            return pd.DataFrame({"bh": pd.Series([], dtype="int64"),
                                 "id": pd.Series([], dtype="int64"),
                                 "idx": pd.Series([], dtype="int64")})
        return pd.DataFrame({"bh": np.concatenate(hs),
                             "id": np.concatenate(out_id),
                             "idx": np.concatenate(out_idx)})

    @ray.remote(num_cpus=0)
    def removed_local(*pieces):
        """Partition owns all occurrences of its hashes: ban and
        anti-join in one task."""
        g = _concat_pd(pieces)
        if not len(g):
            return pa.Table.from_pandas(
                pd.DataFrame({"id": pd.Series([], dtype="int64"),
                              "idx": pd.Series([], dtype="int64")}),
                preserve_index=False)
        nd = g.groupby("bh")["id"].transform("nunique")
        out = g.loc[nd >= min_docs, ["id", "idx"]]
        return pa.Table.from_pandas(out, preserve_index=False)

    carry = tuple(carry_cols)

    @ray.remote(num_cpus=0)
    def reassemble(n_removed: int, *pieces):
        rem = _concat_pd(pieces[:n_removed])
        d = _concat_pd(pieces[n_removed:])
        if not len(d):
            empty = {"doc_id": pd.Series([], dtype="int64"),
                     "n_blocks": pd.Series([], dtype="int64"),
                     "n_dup_blocks": pd.Series([], dtype="int64"),
                     "dedup_text": pd.Series([], dtype="object")}
            for c in carry:
                empty[c] = pd.Series([], dtype="object")
            return pa.Table.from_pandas(pd.DataFrame(empty),
                                        preserve_index=False)
        rem_by_doc = {k: set(v.tolist())
                      for k, v in rem.groupby("id")["idx"]}
        ids, nb, ndup, texts, rows = [], [], [], [], []
        for j, (did, text) in enumerate(zip(d["id"].tolist(), d[text_col])):
            toks = text.split()
            if not toks:
                continue
            blocks = [" ".join(toks[i:i + w]) for i in range(0, len(toks), w)]
            removed = rem_by_doc.get(did, ())
            kept = [blk for i, blk in enumerate(blocks) if i not in removed]
            ids.append(did)
            nb.append(len(blocks))
            ndup.append(len(blocks) - len(kept))
            texts.append(" ".join(kept))
            rows.append(j)
        out = {"doc_id": np.asarray(ids, dtype=np.int64),
               "n_blocks": np.asarray(nb, dtype=np.int64),
               "n_dup_blocks": np.asarray(ndup, dtype=np.int64),
               "dedup_text": texts}
        for c in carry:
            out[c] = d[c].to_numpy()[rows]
        return pa.Table.from_pandas(pd.DataFrame(out), preserve_index=False)

    def doc_side(b: pd.DataFrame) -> pd.DataFrame:
        out = {"id": b[id_col].to_numpy(dtype="int64"),
               text_col: b[text_col]}
        for c in carry:
            out[c] = b[c].to_numpy()
        return pd.DataFrame(out)

    P = n_partitions = resolve_partitions(docs, n_partitions)
    hsplit = _exchange(docs.map_batches(explode, batch_format="pandas"),
                       "bh", P)
    removed_refs = [removed_local.remote(*[s[j] for s in hsplit])
                    for j in range(P)]
    rsplit = _exchange(removed_refs, "id", P)
    dsplit = _exchange(docs.map_batches(doc_side, batch_format="pandas"),
                       "id", P)
    out_refs = [
        reassemble.remote(len(rsplit), *[s[j] for s in rsplit + dsplit])
        for j in range(P)
    ]
    return rd.from_arrow_refs(out_refs)


# ------------------------------------------- per-source signature similarity
# 16 frozen permutation coefficients for the per-SOURCE MinHash sketch.
# Coefficients < 2^20 and shingle hashes < 2^31, so every a*h + b product
# stays < 2^51 — exact in int64 AND in DuckDB BIGINT (no HUGEINT needed;
# the same bound trick as aggregate.py's CountMin rows).  The constants
# are part of the oracle contract (queries.py interpolates them into the
# SQL verbatim); changing any silently breaks value checks.
SRC_SIM_A = (999983, 911383, 824393, 711427, 645131, 524287, 442151, 370261,
             291167, 217645, 175447, 131071, 98947, 65521, 32749, 16381)
SRC_SIM_B = (17, 89, 251, 499, 1021, 2039, 4093, 8191,
             16381, 32749, 65521, 98947, 131071, 175447, 217645, 291167)


def source_minhash_similarity(
    docs: "object",
    text_col: str = "text",
    group_col: str = "source",
    n_partitions: "int | None" = None,
) -> pd.DataFrame:
    """Pairwise content-overlap estimate BETWEEN SOURCES via per-source
    MinHash signatures — the corpus-curation question "which of my feeds
    are near-copies of each other?" answered without any doc-level
    pairing: a source's signature is the per-permutation MINIMUM over
    all its docs' 3-gram shingle hashes.  Min is order- and
    partition-insensitive, so signatures build in one streaming corpus
    pass (per-batch elementwise mins per source) plus one bounded
    (source, perm) exchange of <= |sources| x 16 integer rows; the
    pairwise step then runs over the tiny signature table on the driver
    (|sources|^2 x 16 compares).  Sources are the SMALL cardinality by
    design — for millions of groups, route the signature table through
    the band-bucket LSH path (minhash_dedup_pairs) instead of all-pairs.

    Estimate: Pr[per-perm minima agree] = Jaccard of the shingle sets,
    so ``jaccard_est_ppm = n_agree * 1e6 // 16`` is the standard
    16-sample MinHash estimate in exact integer form.  Shingles are the
    SQL-replicable 31-bit family-1 rolling polynomial (the
    split_contamination oracle idiom); docs under 3 tokens carry no
    shingles and sources with no shingled doc are absent.  Output
    ``(src_a, src_b, n_perm, n_agree, jaccard_est_ppm)``, src_a < src_b,
    sorted — deterministic, value-checked by the DuckDB oracle.
    """
    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.lm import _TokenHasher

    a = np.asarray(SRC_SIM_A, dtype=np.int64)[:, None]
    bb = np.asarray(SRC_SIM_B, dtype=np.int64)[:, None]
    n_perm = len(SRC_SIM_A)
    m31 = (1 << 31) - 1

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        hasher = _TokenHasher()
        best: dict = {}
        for src, txt in zip(b[group_col], b[text_col]):
            toks = txt.split()
            if len(toks) < 3:
                continue
            t1 = hasher.h1(toks)
            # t1 < 1000003: t1*1000003 + t1 < 2^40, then (...%m31)*1000003
            # < 2^51 — exact int64 (and BIGINT on the oracle side)
            sh = ((t1[:-2] * 1000003 + t1[1:-1]) % m31
                  * 1000003 + t1[2:]) % m31
            u = np.unique(sh)
            mins = ((u[None, :] * a + bb) % m31).min(axis=1)
            cur = best.get(src)
            best[src] = mins if cur is None else np.minimum(cur, mins)
        if not best:
            return pd.DataFrame({group_col: pd.Series(dtype="object"),
                                 "perm": pd.Series(dtype="int64"),
                                 "m": pd.Series(dtype="int64")})
        srcs = sorted(best)
        return pd.DataFrame({
            group_col: np.repeat(np.asarray(srcs, dtype=object), n_perm),
            "perm": np.tile(np.arange(n_perm, dtype=np.int64), len(srcs)),
            "m": np.concatenate([best[s] for s in srcs]).astype("int64"),
        })

    sig = hash_aggregate(
        docs.map_batches(partial, batch_format="pandas"),
        keys=[group_col, "perm"], aggs={"m": "min"}, n_partitions=n_partitions,
    ).to_pandas()
    empty = pd.DataFrame({
        "src_a": pd.Series(dtype="object"), "src_b": pd.Series(dtype="object"),
        "n_perm": pd.Series(dtype="int64"), "n_agree": pd.Series(dtype="int64"),
        "jaccard_est_ppm": pd.Series(dtype="int64")})
    if group_col not in sig.columns or not len(sig):
        return empty  # shingle-less corpus (to_pandas drops cols on empty)
    piv = sig.pivot(index=group_col, columns="perm", values="m").sort_index()
    if len(piv) < 2:
        return empty  # one source: no pairs
    mat = piv.to_numpy(dtype="int64")            # (S, 16): every present
    srcs = list(piv.index)                       # source has all 16 perms
    agree = (mat[:, None, :] == mat[None, :, :]).sum(axis=2)
    iu, ju = np.triu_indices(len(srcs), k=1)     # sorted index: i<j == a<b
    n_agree = agree[iu, ju].astype("int64")
    return pd.DataFrame({
        "src_a": [srcs[i] for i in iu],
        "src_b": [srcs[j] for j in ju],
        "n_perm": np.full(len(iu), n_perm, dtype="int64"),
        "n_agree": n_agree,
        "jaccard_est_ppm": n_agree * 1_000_000 // n_perm,
    })
