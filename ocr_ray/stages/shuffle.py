"""Deterministic global shuffle with exact positions — reproducible
training-data ordering at corpus scale.

Trainers need a global random-looking order that is (a) reproducible
across reruns and resumes, (b) cheap — ``Dataset.random_shuffle`` is a
full materializing all-to-all, and a global ``sort`` is a range-shuffle
with a sampling pass.  This stage gets an exact global permutation from
hashing instead:

  * shuffle key ``h = (id * 2685821657736338717) mod 2^62`` — the same
    bijective-odd-multiply mix as the KMV sketch (stages/aggregate.py),
    chosen because HUGEINT arithmetic reproduces numpy's
    uint64-wrap-then-mask exactly, so the permutation is SQL-replicable
    and the operator gets a value-level DuckDB oracle;
  * pass 1 streams once counting rows per hash bucket (top bits of
    ``h``; ``n_buckets`` tiny rows reach the driver — never row data);
  * pass 2 exchanges rows by bucket (hash exchange, no sort-shuffle),
    sorts each bucket locally by ``(h, id)`` and adds the driver-computed
    bucket prefix offset: ``pos`` is the exact rank in the global
    ``ORDER BY (h, id)``.

Hash buckets are uniform by construction, so no skew handling is needed
(unlike key-grouped exchanges); raise ``n_buckets`` until one bucket fits
a worker's heap (2^20 buckets ≈ 8 MB of driver counts at any corpus
size).  Two streaming passes over the input, zero driver row data —
compare ``random_shuffle``'s single materializing pass that moves every
row twice (map + reduce) and holds the permutation in memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ocr_ray.stages.aggregate import KMV_MIX, KMV_MOD

_MULT = np.uint64(KMV_MIX)
_MASK = np.uint64(KMV_MOD - 1)
SHUFFLE_BITS = 62


def shuffle_hash(ids: np.ndarray) -> np.ndarray:
    """62-bit mixed hash of int64 ids (uint64 wraparound, SQL-replicable)."""
    return (ids.astype(np.uint64) * _MULT & _MASK).astype(np.int64)


def deterministic_shuffle(
    ds: "object",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    n_partitions: int = 16,
) -> "object":
    """Add ``shuffle_hash`` and ``pos`` (exact global rank under
    ``ORDER BY (shuffle_hash, id)``) to every row.  Carries all input
    columns through, so downstream stages keep streaming."""
    from ocr_ray.stages.join import exchange_map_partitions

    shift = np.uint64(SHUFFLE_BITS - int(n_buckets - 1).bit_length())
    n_buckets = 1 << int(int(n_buckets - 1).bit_length())

    def with_key(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        h = shuffle_hash(b[id_col].to_numpy(dtype="int64"))
        b["shuffle_hash"] = h
        b["_bucket"] = (h.astype(np.uint64) >> shift).astype(np.int64)
        return b

    keyed = ds.map_batches(with_key, batch_format="pandas")

    # pass 1: per-bucket counts -> prefix offsets (n_buckets rows, driver)
    def count_buckets(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("_bucket").size()
        return pd.DataFrame({"_bucket": g.index.to_numpy(dtype="int64"),
                             "n": g.to_numpy(dtype="int64")})

    counts = (
        keyed.map_batches(count_buckets, batch_format="pandas")
        .to_pandas().groupby("_bucket")["n"].sum()
    )
    offsets = np.zeros(n_buckets + 1, dtype=np.int64)
    offsets[counts.index.to_numpy(dtype="int64") + 1] = counts.to_numpy()
    offsets = np.cumsum(offsets)

    # pass 2: exchange by bucket, rank locally, add the bucket offset
    def rank_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_bucket", "shuffle_hash", id_col],
                          kind="mergesort").reset_index(drop=True)
        b = g["_bucket"].to_numpy(dtype="int64")
        # rank within each bucket run = index - run start
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        run_start = np.repeat(starts, np.diff(np.r_[starts, len(b)]))
        g["pos"] = offsets[b] + (np.arange(len(b)) - run_start)
        return g.drop(columns=["_bucket"])

    return exchange_map_partitions(keyed, "_bucket", rank_partition,
                                   n_partitions=n_partitions)
