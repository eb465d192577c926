"""Deterministic mixture resampling — fit a corpus to target group weights.

A 100-TB training corpus is rarely consumed at its natural source/language
proportions: the mixture is a tuning knob (cf. data-mixture work such as
DoReMi, arXiv:2305.10429).  This stage downsamples each group to hit a
target weight vector **without upsampling and without any RNG state**:

  pass 1  per-group counts ``n_g`` — a per-batch combiner then a tiny
          driver-side sum (group cardinality = #languages/#sources, a few
          dozen rows; never the data);
  driver  the binding group sets the scale:  ``C6 = min_g floor(n_g * 1e6
          / w_g)`` over groups with positive weight, then per-group keep
          rate ``rate_ppm_g = min(1e6, floor(C6 * w_g / n_g))`` — all
          int64, so the DuckDB oracle reproduces every rate exactly;
  pass 2  streaming filter: keep row iff ``(((id % 2^32) * 2654435761) %
          2^32) % 1e6 < rate_ppm_g`` (mod-first, exact for any int64
          id) — the same multiplicative hash as the
          train/val split, so resampling is reproducible across runs,
          engines and partitionings.  (The split uses ``% 100`` buckets
          and this uses ``% 1e6`` of the same hash, so stacking both on
          one corpus correlates them; callers who need independence
          should offset ``id_col`` or use a different multiplier.)

Groups with zero / missing weight are dropped.  The output mixture matches
``weights`` up to the ppm floor (exact expected counts ``n_g * rate_ppm_g
/ 1e6``); nothing is ever repeated, so dedup guarantees upstream survive.

Scale shape: pass 1 moves O(#groups) ints per block to the driver; pass 2
is embarrassingly parallel.  No shuffle, no materialization.
"""

from __future__ import annotations

from typing import Dict, Sequence

import pandas as pd

MIX_MULT = 2654435761  # Knuth multiplicative constant (same as doc_split)
PPM = 1_000_000


def mixture_rates(counts: Dict[str, int], weights: Dict[str, int]) -> Dict[str, int]:
    """Integer-exact per-group keep rates (ppm) hitting ``weights`` with
    no upsampling: the group with the least headroom keeps ~100%."""
    live = {g: n for g, n in counts.items() if weights.get(g, 0) > 0 and n > 0}
    if not live:
        return {}
    c6 = min(n * PPM // weights[g] for g, n in live.items())
    return {g: min(PPM, c6 * weights[g] // n) for g, n in live.items()}


def mixture_resample(
    ds: "object",
    weights: Dict[str, int],
    group_col: str = "lang",
    id_col: str = "doc_id",
    keep_cols: Sequence[str] = (),
) -> "object":
    """Filter ``ds`` down to the target group mixture.  Adds ``rate_ppm``
    (the group's keep rate) so consumers can re-weight exactly."""

    def count_groups(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(group_col, observed=True).size()
        return pd.DataFrame({group_col: g.index.astype(str), "n": g.to_numpy("int64")})

    counts = (
        ds.map_batches(count_groups, batch_format="pandas")
        .to_pandas().groupby(group_col)["n"].sum().to_dict()
    )
    rates = mixture_rates({str(k): int(v) for k, v in counts.items()}, weights)

    cols = [id_col, group_col, *keep_cols]

    def keep_batch(b: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        # str-normalize the lookup: the rate dict is keyed by str(group)
        # (count pass), so a numeric group_col through the raw .map used
        # to miss EVERY key and silently drop the whole corpus
        rate = b[group_col].astype(str).map(rates).fillna(0).astype("int64")
        # mod-first in uint64: (id % 2^32) * MULT stays < 2^64, exact for
        # ANY int64 id — the naive int64 multiply silently wraps above
        # id ~3.47e9, diverging from the HUGEINT oracle (same fix as
        # queries._id_hash32 / api.curate)
        u = b[id_col].to_numpy(dtype=np.uint64)
        h = ((u % np.uint64(1 << 32)) * np.uint64(MIX_MULT)) % np.uint64(1 << 32)
        mask = pd.Series((h % np.uint64(PPM)).astype("int64"),
                         index=b.index) < rate
        out = b.loc[mask, cols].copy()
        out["rate_ppm"] = rate[mask]
        return out

    return ds.map_batches(keep_batch, batch_format="pandas")
