"""Distributed hash-partitioned aggregation for high-cardinality keys.

``Dataset.groupby(key).aggregate(...)`` degrades with the number of distinct
keys (measured: 31 s for a 150k-row sum over 15k keys at 32 CPUs, vs 2.4 s
for the same shape with ~100 keys) and even the bounded-partition
``groupby(pk).map_groups`` variant pays a ~1.5-2 s fixed sort-shuffle cost
per call.  The classic two-level plan over the raw-task hash exchange is
both exact and the cheapest shape:

1. partial-aggregate inside ``map_batches`` (combiner: one pandas groupby
   per batch — output is at most #keys-per-batch rows);
2. hash-exchange the partials on the key columns (split tasks launch AS
   upstream blocks materialize — streaming, no barrier);
3. one combine task per partition finishes with a single pandas groupby.

All rows of one key share a partition, so the combine is exact.
``n_partitions`` bounds reduce-task parallelism — size it ~2-4x the cluster
cores for skew resilience; the shuffle payload is the *partially
aggregated* table, not the input.
"""

from __future__ import annotations

from typing import Dict, List

import pandas as pd

import ray.data

_COMBINE = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}


def hash_aggregate(
    ds: "ray.data.Dataset",
    keys: List[str],
    aggs: Dict[str, str],
    n_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Aggregate ``aggs`` (col -> 'sum'|'min'|'max'|'count') per ``keys``.

    'count' counts input rows into the named output column; other ops apply
    to an existing column.  Output columns keep the input names.
    ``n_partitions=None`` auto-sizes from the input's metadata size
    estimate (join.resolve_partitions) — an over-estimate here, since the
    per-batch partial shrinks data before the exchange, which only buys
    extra (cheap) partitions.

    NULL keys group together (``dropna=False``), matching SQL's GROUP BY
    semantics — pandas' default silently DROPS NaN/None-keyed rows, which
    would understate aggregates over any nullable key.  The exchange hash
    is deterministic for NaN/None (pd.util.hash_pandas_object), so all
    null-keyed partials still meet in one partition.
    """
    from ocr_ray.stages.join import exchange_map_partitions

    for op in aggs.values():
        if op not in _COMBINE:
            raise ValueError(f"unsupported agg op: {op}")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # assign (not copy) injects count columns: existing columns stay
        # zero-copy references — this partial runs on EVERY batch of
        # every exchange aggregate, so a full-batch deep copy here taxes
        # each hot path (pagerank per-iteration scans, sketches, bloom)
        count_cols = {c for c, op in aggs.items() if op == "count"}
        if count_cols:
            b = b.assign(**{c: 1 for c in count_cols})
        spec = {col: ("sum" if op == "count" else op) for col, op in aggs.items()}
        return b.groupby(keys, as_index=False, dropna=False).agg(spec)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        need = [*keys, *aggs]
        if not len(g) and any(c not in g.columns for c in need):
            # an all-empty exchange delivers the pre-map schema (Ray Data
            # passes zero-row blocks through map_batches without running
            # the UDF — join._split_blocks): rebuild the typed-empty
            # result so the aggregate stays total on empty inputs
            return pd.DataFrame({c: pd.Series(dtype=(
                g[c].dtype if c in g.columns else "object")) for c in need})
        spec = {col: _COMBINE[op] for col, op in aggs.items()}
        return g.groupby(keys, as_index=False, dropna=False).agg(spec)

    return exchange_map_partitions(
        ds.map_batches(partial, batch_format="pandas"),
        keys, combine, n_partitions,
    )


# ------------------------------------------------- KMV distinct sketch
# Bijective scrambler for KMV: odd-constant multiply mod 2^62.  The raw
# polynomial shingle hashes cluster (low-entropy token vocab -> 80% KMV
# error observed); multiplying by an odd constant is invertible mod 2^62,
# so distinctness is preserved while magnitudes become uniform (measured
# 3.8% error at k=256 on 16.5k true distinct).  numpy computes
# (h*C) mod 2^64 via uint64 wraparound then masks to 2^62 — identical to
# mod-2^62 directly because 2^62 divides 2^64; DuckDB replicates with
# HUGEINT arithmetic.
KMV_MIX = 2685821657736338717
KMV_MOD = 1 << 62


def kmv_distinct_shingles(
    ds: "ray.data.Dataset",
    k: int = 256,
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Approximate distinct-shingle count via a k-minimum-values sketch —
    the bounded-memory path to "how much unique content is in this corpus"
    at 100 TB, where the exact value exchange (corpus_stats) would shuffle
    every distinct shingle.

    KMV: over uniformly hashed items, the k-th smallest hash value R_k
    estimates distinct count as (k-1) * M / R_k (Bar-Yossef et al. 2002).
    Every stage is bounded: each input block contributes its k smallest
    mixed 62-bit shingle hashes (a few KB), one merge task unions the
    per-block minima (<= k x n_blocks ints, never row data) and emits a
    single (k, kth_hash, est_distinct) row.  The estimate is a
    DETERMINISTIC function of the k-th smallest hash, so the DuckDB oracle
    reproduces it exactly — an oracle-checked approximate operator."""
    import numpy as np

    from ocr_ray.stages.dedup import PolySimHasher
    from ocr_ray.stages.join import exchange_map_partitions

    hasher = PolySimHasher()
    mult = np.uint64(KMV_MIX)
    mask = np.uint64(KMV_MOD - 1)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        feats = [hasher.features(t) for t in b[text_col]]
        feats = [f for f in feats if f.size]
        if not feats:
            return pd.DataFrame({"h": pd.Series([], dtype="int64"),
                                 "g": pd.Series([], dtype="int64")})
        u = np.unique(np.concatenate(feats))
        m = np.sort((u.astype(np.uint64) * mult) & mask)[:k].astype("int64")
        return pd.DataFrame({"h": m, "g": np.int64(0)})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if "h" not in g.columns:
            # all-empty corpus: Ray skips the partial UDF on zero-row
            # blocks, so the exchange delivers the pre-map (text) schema
            g = pd.DataFrame({"h": pd.Series([], dtype="int64")})
        u = np.unique(g["h"].to_numpy())
        n = min(len(u), k)
        if n == 0:
            # the constant key routes every row to ONE partition; the other
            # (empty) partitions must emit no row, not a zero row
            return pd.DataFrame({"k": pd.Series([], dtype="int64"),
                                 "kth_hash": pd.Series([], dtype="int64"),
                                 "est_distinct": pd.Series([], dtype="float64")})
        kth = int(u[n - 1])
        if n < k:
            est = float(n)  # fewer than k distinct: the sketch IS exact
        else:
            # floor(x*1e6+0.5)/1e6: identical IEEE ops to the DuckDB oracle
            est = np.floor(
                float(k - 1) * float(KMV_MOD) / (kth + 1) * 1e6 + 0.5
            ) / 1e6
        return pd.DataFrame({"k": pd.Series([k], dtype="int64"),
                             "kth_hash": pd.Series([kth], dtype="int64"),
                             "est_distinct": pd.Series([est])})

    partials = ds.map_batches(partial, batch_format="pandas")
    # n_partitions=2 (not 1): num_returns=1 split tasks return a bare
    # ObjectRef instead of a list (join.py:launch_splits); the constant
    # key lands all rows in one partition either way
    return exchange_map_partitions(partials, "g", merge, n_partitions=2)


# ------------------------------------------------- CountMin frequency sketch
# (Cormode & Muthukrishnan 2005): d hash rows x w counters; every cell is a
# SUM, so partial sketches from any partitioning merge by addition —
# order-insensitive, bit-exact, and replicable in SQL (unlike merge-order-
# dependent sketches such as Misra-Gries).  point estimate(t) =
# min_r CM[r][cell_r(t)] >= true count, overestimate bounded by
# (total occurrences)/w per row w.h.p.  The bounded-memory one-pass
# alternative to the exact term exchange when the vocabulary itself is too
# large to shuffle.  Row hashes: cell_r(t) = (h1(t)*A_r + B_r) mod (2^31-1)
# mod w over the shared polynomial token hash (h1 < 1000003, A_r < 2^20 ->
# products < 2^40, exact in int64 and in DuckDB BIGINT).
CM_D = 4
CM_W = 1 << 14
CM_A = (999983, 911383, 824393, 711427)
CM_B = (17, 89, 251, 499)
_CM_MOD31 = (1 << 31) - 1


def countmin_sketch(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    tokenizer=None,
    d: int = CM_D,
    w: int = CM_W,
    n_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """One streaming pass -> merged CountMin table as a Dataset of
    ``(r, cell, c)`` rows (<= d*w of them, independent of corpus size).

    Per batch: tokenize, count unique terms, hash each unique term into
    its d cells, scatter-add into a dense (d, w) partial (d*w int64 =
    512 KB at defaults), emit the nonzero cells sparse; partials reduce
    through the bounded hash exchange keyed on the flattened cell id."""
    import numpy as np

    from ocr_ray.stages.lm import _TokenHasher

    if tokenizer is None:
        import re

        tokenizer = re.compile(r"[a-z0-9]+").findall
    if not 1 <= d <= len(CM_A):
        # CM_A[:d] would silently truncate while range(d) scatters past
        # the row count — an IndexError deep in a worker task otherwise
        raise ValueError(f"countmin depth d={d} out of range 1..{len(CM_A)} "
                         f"(one frozen hash-coefficient pair per row)")
    a = np.asarray(CM_A[:d], dtype=np.int64)[:, None]
    b_ = np.asarray(CM_B[:d], dtype=np.int64)[:, None]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        hasher = _TokenHasher()
        cnt: "Counter[str]" = Counter()
        for t in batch[text_col]:
            cnt.update(tokenizer(t.lower()))
        if not cnt:
            return pd.DataFrame({"r": pd.Series([], dtype="int64"),
                                 "cell": pd.Series([], dtype="int64"),
                                 "c": pd.Series([], dtype="int64")})
        terms = list(cnt.keys())
        n = np.fromiter(cnt.values(), dtype=np.int64, count=len(terms))
        h1 = hasher.h1(terms)
        cells = ((h1[None, :] * a + b_) % _CM_MOD31) % w  # (d, n_terms)
        dense = np.zeros((d, w), dtype=np.int64)
        for r in range(d):
            np.add.at(dense[r], cells[r], n)
        rr, cc = np.nonzero(dense)
        return pd.DataFrame({"r": rr.astype("int64"),
                             "cell": cc.astype("int64"),
                             "c": dense[rr, cc]})

    return hash_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["r", "cell"], aggs={"c": "sum"}, n_partitions=n_partitions,
    )


def countmin_estimate(sketch: pd.DataFrame, terms, d: int = CM_D,
                      w: int = CM_W) -> "pd.Series":
    """Point estimates for ``terms`` from a collected sketch table —
    min over the d row counters.  The sketch is <= d*w rows (a fixed few
    MB), so collecting it to the driver/actor is the design, not a leak."""
    import numpy as np

    from ocr_ray.stages.lm import _TokenHasher

    if not 1 <= d <= len(CM_A):
        raise ValueError(f"countmin depth d={d} out of range 1..{len(CM_A)} "
                         f"(one frozen hash-coefficient pair per row)")
    dense = np.zeros((d, w), dtype=np.int64)
    dense[sketch["r"].to_numpy(dtype="int64"),
          sketch["cell"].to_numpy(dtype="int64")] = \
        sketch["c"].to_numpy(dtype="int64")
    terms = list(terms)
    h1 = _TokenHasher().h1(terms)
    a = np.asarray(CM_A[:d], dtype=np.int64)[:, None]
    b_ = np.asarray(CM_B[:d], dtype=np.int64)[:, None]
    cells = ((h1[None, :] * a + b_) % _CM_MOD31) % w
    est = dense[np.arange(d)[:, None], cells].min(axis=0)
    return pd.Series(est, index=terms, dtype="int64")


# ------------------------------------------------------------------ HLL
# HyperLogLog register sketch (Flajolet et al. 2007) over distinct
# whitespace terms.  Item key = the SQL-replicable 62-bit per-token
# polynomial hash (dedup.py:_poly_hash_token pair, f1 + f2<<31), mixed by
# the full splitmix64 finalizer mod 2^64; bucket = top 8 bits,
# rho = leading-zero rank of the remaining 56 bits.  Registers are
# order-free maxima, so the merged sketch is bit-exact under any
# partitioning, and the estimate is a deterministic function of the
# registers — the DuckDB oracle value-checks an approximate operator.
# Constants frozen (shared family with stages/bloom.py): changing any
# silently breaks the oracle.
HLL_P = 8
HLL_M = 1 << HLL_P                      # 256 registers
# splitmix64 finalizer constants (Steele et al. 2014, public domain) —
# a single multiplicative mix measured -37% bias on the structured
# polynomial keys; the full finalizer measures -4.8% on 50k terms
HLL_SM64_C0 = 0x9E3779B97F4A7C15
HLL_SM64_C1 = 0xBF58476D1CE4E5B9
HLL_SM64_C2 = 0x94D049BB133111EB
_HLL_WBITS = 64 - HLL_P                 # 56 payload bits
_HLL_WMASK = (1 << _HLL_WBITS) - 1
_HLL_U64 = (1 << 64) - 1
# alpha_256 * m^2 * 2^63 (the scaled-integer S makes the division exact-input)
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 256.0)


def _hll_rho(w: int) -> int:
    return _HLL_WBITS + 1 if w == 0 else _HLL_WBITS - w.bit_length() + 1


def hll_mix(key: int) -> int:
    """splitmix64 finalizer (exactly replicated in the DuckDB oracle)."""
    z = (key + HLL_SM64_C0) & _HLL_U64
    z = ((z ^ (z >> 30)) * HLL_SM64_C1) & _HLL_U64
    z = ((z ^ (z >> 27)) * HLL_SM64_C2) & _HLL_U64
    return z ^ (z >> 31)


def _hll_estimate(rhos) -> "tuple[int, int, float, float]":
    """Shared HLL finish for a set of present registers (`rhos` = the
    max-rank value per non-zero register): returns ``(n_zero, sum_rho,
    est_raw, est_distinct)``.  The scaled-integer S accumulation, the
    alpha*m^2*2^63/S raw estimate, its 1e-6 floor-rounding and the
    linear-counting small-range correction are ORACLE-FROZEN (the DuckDB
    SQL replicates this exact IEEE operation order) — which is why both
    the global and the per-group estimator must share this one body."""
    import math

    import numpy as np

    n_present = len(rhos)
    n_zero = HLL_M - n_present
    sum_rho = int(rhos.sum()) if n_present else 0
    s = n_zero * (1 << 63)
    for m_j in rhos:
        s += 1 << (63 - int(m_j))
    est_raw = float(
        np.floor(_HLL_ALPHA * 65536.0 * 9223372036854775808.0 / float(s)
                 * 1e6 + 0.5) / 1e6
    )
    if est_raw <= 2.5 * HLL_M and n_zero > 0:
        est = float(np.floor(256.0 * math.log(256.0 / n_zero) * 1e6 + 0.5)
                    / 1e6)
    else:
        est = est_raw
    return n_zero, sum_rho, est_raw, est


def hll_distinct_terms(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    n_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Approximate distinct-term count via HyperLogLog — fixed 256-register
    state regardless of corpus size (the register-based sibling of the KMV
    sketch).  Each block contributes <=256 (bucket, max rho) rows; the
    bounded hash aggregate merges maxima; the single-row estimate applies
    the HLL raw formula with linear-counting small-range correction.
    Output: (m, n_zero_registers, sum_rho, est_raw, est_distinct)."""
    import numpy as np

    from ocr_ray.stages.dedup import _poly_hash_token

    cache: dict = {}

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        best: dict = {}
        toks = set()
        for t in b[text_col]:
            toks.update(t.split())
        for tok in toks:
            f = cache.get(tok)
            if f is None:
                if len(cache) > 2_000_000:
                    cache.clear()
                f = cache.setdefault(tok, _poly_hash_token(tok))
            x = hll_mix(f[0] + (f[1] << 31))
            bucket = x >> _HLL_WBITS
            rho = _hll_rho(x & _HLL_WMASK)
            if rho > best.get(bucket, 0):
                best[bucket] = rho
        return pd.DataFrame(
            {"bucket": pd.Series(sorted(best), dtype="int64"),
             "rho": pd.Series([best[k] for k in sorted(best)], dtype="int64")}
        )

    regs = hash_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["bucket"], aggs={"rho": "max"}, n_partitions=n_partitions,
    ).to_pandas()
    if "rho" not in regs.columns:
        # token-less corpus: to_pandas() on an all-empty Dataset drops
        # columns — rebuild so the n_zero=256 linear-counting row emits
        regs = pd.DataFrame({"bucket": pd.Series(dtype="int64"),
                             "rho": pd.Series(dtype="int64")})

    n_zero, sum_rho, est_raw, est = _hll_estimate(regs["rho"])
    import ray.data as _rd

    return _rd.from_pandas(pd.DataFrame(
        {"m": pd.Series([HLL_M], dtype="int64"),
         "n_zero_registers": pd.Series([n_zero], dtype="int64"),
         "sum_rho": pd.Series([sum_rho], dtype="int64"),
         "est_raw": pd.Series([est_raw], dtype="float64"),
         "est_distinct": pd.Series([est], dtype="float64")}
    ))


def heavy_hitters(
    ds: "ray.data.Dataset",
    k: int = 64,
    text_col: str = "text",
    tokenizer=None,
    n_partitions: "int | None" = None,
) -> pd.DataFrame:
    """EXACT frequency-threshold heavy hitters (terms with count*k > N)
    via the classic two-pass candidate-then-verify plan — the pattern
    that makes "top terms of a 100 TB corpus" tractable without ever
    shuffling the full term-frequency table:

    1. Per-batch Misra-Gries summaries: an exact batch Counter compressed
       to <= k entries by subtracting the (k+1)-th largest count and
       dropping non-positives (the COMPRESS op of Agarwal et al.,
       "Mergeable Summaries", TODS 2013).  Each batch's entry count
       underestimates its true batch count by at most n_b/(k+1).
    2. Union-sum the summaries through the bounded hash exchange: the
       summed lower bound lb(t) >= true(t) - N/(k+1), so every true
       heavy hitter (true(t) > N/k) satisfies lb(t) > N/(k(k+1)) — the
       integer-exact candidate filter lb*k*(k+1) > N is a PROVABLE
       superset, typically a few hundred terms.
    3. Exact verify: one more corpus pass counting ONLY the broadcast
       candidate set, a tiny exchange, and the exact threshold test
       count*k > N.

    Output is a driver-side DataFrame (term, n), n desc / term asc —
    deterministic and equal to the exact SQL answer, which is what makes
    an approximate-sketch pipeline oracle-checkable."""
    import re

    import numpy as np
    import ray

    tok = tokenizer or re.compile(r"[a-z0-9]+").findall

    def mg_partial(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: "Counter[str]" = Counter()
        n = 0
        for t in b[text_col]:
            toks = tok(t.lower())
            n += len(toks)
            c.update(toks)
        if len(c) > k:
            cut = sorted(c.values(), reverse=True)[k]  # (k+1)-th largest
            c = {t: v - cut for t, v in c.items() if v > cut}
        return pd.DataFrame(
            {"term": ["\x00n"] + list(c.keys()),
             "lb": pd.Series([n] + list(c.values()), dtype="int64")}
        )

    summed = hash_aggregate(
        ds.map_batches(mg_partial, batch_format="pandas"),
        keys=["term"], aggs={"lb": "sum"}, n_partitions=n_partitions,
    ).to_pandas()
    if not len(summed) or "term" not in summed.columns:
        # all-empty input: no block ever ran mg_partial (Ray skips the
        # UDF on zero-row blocks) so even the sentinel row is absent and
        # to_pandas() dropped the columns — nothing can be frequent
        return pd.DataFrame({"term": pd.Series(dtype="object"),
                             "n": pd.Series(dtype="int64")})
    total = int(summed.loc[summed["term"] == "\x00n", "lb"].sum())
    cand = summed[(summed["term"] != "\x00n")
                  & (summed["lb"].astype("int64") * k * (k + 1) > total)]
    if not len(cand):
        # nothing is frequent enough (uniform distribution): the result
        # is provably empty — skip the exact-verify pass, which would
        # otherwise re-tokenize the whole corpus against an empty set
        return pd.DataFrame({"term": pd.Series(dtype="object"),
                             "n": pd.Series(dtype="int64")})
    cand_ref = ray.put(frozenset(cand["term"]))

    def exact_partial(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        want = ray.get(cand_ref)
        c: "Counter[str]" = Counter()
        for t in b[text_col]:
            c.update(x for x in tok(t.lower()) if x in want)
        return pd.DataFrame(
            {"term": list(c.keys()),
             "n": pd.Series(list(c.values()), dtype="int64")}
        )

    exact = hash_aggregate(
        ds.map_batches(exact_partial, batch_format="pandas"),
        keys=["term"], aggs={"n": "sum"}, n_partitions=n_partitions,
    ).to_pandas()
    if not len(exact) or "n" not in exact.columns:
        # no candidate survived the superset filter (uniform distribution:
        # nothing is frequent enough) — and Ray's to_pandas() on an
        # all-empty Dataset drops columns, so rebuild the typed empty
        return pd.DataFrame({"term": pd.Series(dtype="object"),
                             "n": pd.Series(dtype="int64")})
    out = exact[exact["n"].astype("int64") * k > total].copy()
    out["n"] = out["n"].astype("int64")
    return (out.sort_values(["n", "term"], ascending=[False, True],
                            kind="mergesort").reset_index(drop=True))


def global_topk(
    ds: "ray.data.Dataset",
    by: "List[str]",
    k: int,
    descending: "bool | List[bool]" = True,
) -> pd.DataFrame:
    """Global top-k WITHOUT a full distributed sort: each block reduces to
    its own top-k inside ``map_batches`` (bounded k rows out per block),
    and one driver-side sort finishes over <= k x n_blocks candidate rows.
    ``Dataset.sort(...).limit(k)`` is an all-to-all range shuffle of the
    ENTIRE input before the limit applies; for top-k over a 100 TB
    aggregate this plan moves k rows per block instead.  Ties must be
    broken by the trailing ``by`` columns (pass a unique key last) for a
    deterministic result."""
    if isinstance(descending, bool):
        descending = [descending] * len(by)
    ascending = [not d for d in descending]

    def block_topk(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(by, ascending=ascending, kind="mergesort").head(k)

    cand = ds.map_batches(block_topk, batch_format="pandas").to_pandas()
    if not len(cand) or any(c not in cand.columns for c in by):
        return cand  # all-empty input (Ray drops columns on empty)
    return (cand.sort_values(by, ascending=ascending, kind="mergesort")
            .head(k).reset_index(drop=True))


def hll_distinct_terms_by(
    ds: "ray.data.Dataset",
    group_col: str,
    text_col: str = "text",
    n_partitions: "int | None" = None,
) -> pd.DataFrame:
    """Per-group HyperLogLog distinct-term estimate — the grouped-sketch
    pattern: sketch registers ARE the aggregation state, keyed by
    (group, bucket), so per-group distinct counts over a 100 TB corpus
    cost one bounded exchange of <= |groups| x 256 register rows instead
    of a (group, term) shuffle.  Same mix/registers/estimator as the
    oracle-checked global sketch (hll_distinct_terms); the finish step
    runs driver-side over the tiny register table.  Output one row per
    group: (group, m, n_zero_registers, sum_rho, est_raw, est_distinct),
    deterministic."""
    import numpy as np

    from ocr_ray.stages.dedup import _poly_hash_token

    cache: dict = {}

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        per_group: dict = {}
        for g, t in zip(b[group_col], b[text_col]):
            per_group.setdefault(g, set()).update(t.split())
        rows_g, rows_b, rows_r = [], [], []
        for g, toks in per_group.items():
            best: dict = {}
            for tok in toks:
                f = cache.get(tok)
                if f is None:
                    if len(cache) > 2_000_000:
                        cache.clear()
                    f = cache.setdefault(tok, _poly_hash_token(tok))
                x = hll_mix(f[0] + (f[1] << 31))
                bucket = x >> _HLL_WBITS
                rho = _hll_rho(x & _HLL_WMASK)
                if rho > best.get(bucket, 0):
                    best[bucket] = rho
            for k in sorted(best):
                rows_g.append(g)
                rows_b.append(k)
                rows_r.append(best[k])
        return pd.DataFrame(
            {group_col: rows_g,
             "bucket": pd.Series(rows_b, dtype="int64"),
             "rho": pd.Series(rows_r, dtype="int64")}
        )

    regs = hash_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        keys=[group_col, "bucket"], aggs={"rho": "max"},
        n_partitions=n_partitions,
    ).to_pandas()
    if group_col not in regs.columns:
        # token-less corpus: to_pandas() on all-empty drops columns
        regs = pd.DataFrame({group_col: pd.Series(dtype="object"),
                             "bucket": pd.Series(dtype="int64"),
                             "rho": pd.Series(dtype="int64")})

    out_rows = []
    # dropna=False: the exchange preserved null-keyed registers (one SQL
    # NULL group); pandas' default would silently drop that group's row
    for g, sub in regs.groupby(group_col, sort=True, dropna=False):
        n_zero, sum_rho, est_raw, est = _hll_estimate(sub["rho"])
        out_rows.append((g, HLL_M, n_zero, sum_rho, est_raw, est))
    out = pd.DataFrame(out_rows, columns=[
        group_col, "m", "n_zero_registers", "sum_rho", "est_raw",
        "est_distinct"])
    for c in ("m", "n_zero_registers", "sum_rho"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def hll_distinct_values(
    ds: "ray.data.Dataset",
    columns: "list[str]",
    n_partitions: "int | None" = None,
) -> pd.DataFrame:
    """Per-COLUMN HyperLogLog distinct-value estimate — the approximate
    cutover documented on stages/validate.py:profile_table for key-like
    columns, where the exact two-level distinct plan would exchange the
    full key set: register state is (col, bucket) — <= |columns| x 256
    rows move through ONE bounded exchange regardless of table size.

    Values canonicalize to their shortest-roundtrip string (repr for
    floats, str otherwise — the same injective form the exact profiler
    exchanges) and hash through the oracle-frozen poly-hash + splitmix64
    mix shared with hll_distinct_terms, so the DuckDB oracle replicates
    the estimate register-for-register from CAST(col AS VARCHAR).  NULLs
    never enter the sketch (SQL COUNT DISTINCT semantics); an all-null
    column estimates 0 via the n_zero=256 linear-counting branch.
    Output one row per requested column (always, even register-less):
    (col, m, n_zero_registers, sum_rho, est_raw, est_distinct)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ocr_ray.stages.dedup import _poly_hash_token

    def _canon(x) -> str:
        if isinstance(x, bool):
            # DuckDB CAST(BOOLEAN AS VARCHAR) prints 'true'/'false';
            # Python str() would register-drift as 'True'/'False'
            return "true" if x else "false"
        if isinstance(x, float):
            return repr(x)
        return str(x)

    def partial(t: pa.Table) -> pd.DataFrame:
        rows_g, rows_b, rows_r = [], [], []
        for c in columns:
            best: dict = {}
            for x in pc.unique(t[c]).drop_null().to_pylist():
                f = _poly_hash_token(_canon(x))
                z = hll_mix(f[0] + (f[1] << 31))
                bucket = z >> _HLL_WBITS
                rho = _hll_rho(z & _HLL_WMASK)
                if rho > best.get(bucket, 0):
                    best[bucket] = rho
            for k in sorted(best):
                rows_g.append(c)
                rows_b.append(k)
                rows_r.append(best[k])
        return pd.DataFrame(
            {"col": pd.Series(rows_g, dtype="object"),
             "bucket": pd.Series(rows_b, dtype="int64"),
             "rho": pd.Series(rows_r, dtype="int64")})

    regs = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["col", "bucket"], aggs={"rho": "max"},
        n_partitions=n_partitions,
    ).to_pandas()
    if "col" not in regs.columns:  # value-less table: columns dropped
        regs = pd.DataFrame({"col": pd.Series(dtype="object"),
                             "bucket": pd.Series(dtype="int64"),
                             "rho": pd.Series(dtype="int64")})

    out_rows = []
    for c in sorted(columns):
        sub = regs[regs["col"] == c]
        n_zero, sum_rho, est_raw, est = _hll_estimate(sub["rho"])
        out_rows.append((c, HLL_M, n_zero, sum_rho, est_raw, est))
    out = pd.DataFrame(out_rows, columns=[
        "col", "m", "n_zero_registers", "sum_rho", "est_raw",
        "est_distinct"])
    for c in ("m", "n_zero_registers", "sum_rho"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)
