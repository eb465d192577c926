"""Bloom-filter corpus membership (bounded-memory exact-dup screening).

The crawl-refresh primitive complementing incremental_containment
(dedup.py): instead of shipping shingle state, the corpus is summarized
into an ``m``-bit Bloom filter of whole-document content keys; a new
shard is then screened against the filter with k probes per doc.  At
100 TB the filter stays a fixed ``m/8`` bytes regardless of corpus size
(build cost: one streaming pass + a <=m-row position aggregate), and the
screen is a pure broadcast map — ``ray.put`` the bitmask once, no
shuffle, no driver materialization of either table.

Everything is SQL-replicable so the DuckDB oracle value-checks the
*filter semantics themselves* (including any false positives):

* doc key = the 62-bit whole-document polynomial hash — the same rolling
  token-hash polynomials (mod 2^31-1, combined ``h1 + h2<<31``) as the
  contamination/novelty shingle features (dedup.py:PolySimHasher family),
  applied over the full token list;
* probe i = top-16-bits multiplicative hash
  ``((key * A_i + B_i) mod 2^64) >> 48`` — exact HUGEINT arithmetic in
  DuckDB, arbitrary-precision ints here.

Constants are frozen: changing any silently breaks the oracle.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from ocr_ray.stages.dedup import _MOD31, _poly_hash_token

BLOOM_M_BITS = 1 << 16           # filter width (positions in [0, 2^16))
_SHIFT = 64 - 16                 # take the top 16 bits of the 64-bit mix
_U64 = (1 << 64) - 1

# k=4 odd multiplicative constants (splitmix64 / golden-ratio family) —
# frozen, mirrored verbatim in the doc_bloom oracle SQL
BLOOM_CONSTS: Tuple[Tuple[int, int], ...] = (
    (0x9E3779B97F4A7C15, 0xD1B54A32D192ED03),
    (0xBF58476D1CE4E5B9, 0x94D049BB133111EB),
    (0x2545F4914F6CDD1D, 0x9E6C63D0876A9F4B),
    (0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53),
)

_TOKEN_CACHE: Dict[str, Tuple[int, int]] = {}


def doc_key62(text: str) -> int:
    """62-bit whole-document content key (rolling token-hash polynomials)."""
    h1 = h2 = 0
    cache = _TOKEN_CACHE
    for tok in text.split():
        f = cache.get(tok)
        if f is None:
            if len(cache) > 2_000_000:
                cache.clear()
            f = cache.setdefault(tok, _poly_hash_token(tok))
        h1 = (h1 * 1000003 + f[0]) % _MOD31
        h2 = (h2 * 1000033 + f[1]) % _MOD31
    return h1 + (h2 << 31)


def bloom_positions(key: int) -> List[int]:
    """The k probe positions of one content key."""
    return [((key * a + b) & _U64) >> _SHIFT for a, b in BLOOM_CONSTS]


def build_bloom(corpus: "rd.Dataset", text_col: str = "text",
                n_partitions: int = 8) -> np.ndarray:
    """One streaming pass over the corpus -> boolean bit array (length m).

    Each batch emits its DISTINCT probe positions (<= m rows per batch),
    the bounded hash aggregate reduces them to <= m total rows, and only
    that fixed-size position list reaches the driver."""
    from ocr_ray.stages.aggregate import hash_aggregate

    def emit_positions(b: pd.DataFrame) -> pd.DataFrame:
        pos = set()
        for t in b[text_col]:
            pos.update(bloom_positions(doc_key62(t)))
        return pd.DataFrame({"pos": sorted(pos)}, dtype="int64")

    agg = hash_aggregate(
        corpus.map_batches(emit_positions, batch_format="pandas"),
        keys=["pos"], aggs={"n": "count"}, n_partitions=n_partitions,
    ).to_pandas()
    bits = np.zeros(BLOOM_M_BITS, dtype=bool)
    if len(agg):
        bits[agg["pos"].to_numpy()] = True
    return bits


def bloom_screen(
    corpus: "rd.Dataset",
    shard: "rd.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_partitions: int = 8,
) -> "rd.Dataset":
    """Screen ``shard`` docs against the corpus Bloom filter.

    Returns one row per shard doc: (``id_col``, key62, in_corpus) — the
    id column keeps the CALLER'S name (a hardcoded 'doc_id' would
    silently rename e.g. conv_id and break downstream joins).  The
    bitmask ships once via ``ray.put``; the screen is a stateless map."""
    bits_ref = ray.put(build_bloom(corpus, text_col=text_col,
                                   n_partitions=n_partitions))

    def screen(b: pd.DataFrame, *, bits_ref=bits_ref) -> pd.DataFrame:
        bits = ray.get(bits_ref)
        keys = [doc_key62(t) for t in b[text_col]]
        hit = [all(bits[p] for p in bloom_positions(k)) for k in keys]
        return pd.DataFrame({
            id_col: b[id_col].astype("int64").to_numpy(),
            "key62": pd.Series(keys, dtype="int64"),
            "in_corpus": pd.Series(hit, dtype="bool"),
        })

    return shard.map_batches(screen, batch_format="pandas")
