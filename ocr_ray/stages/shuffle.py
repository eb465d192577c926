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



def _empty_premap(g: pd.DataFrame, add: "dict[str, str]") -> pd.DataFrame:
    """Typed-empty result for a zero-row exchange group that carries the
    PRE-MAP schema (Ray Data passes zero-row blocks through map_batches
    without running the UDF, so ``_bucket``/``shuffle_hash`` are absent).
    Drops ``_bucket`` if present and appends the kernel's computed columns."""
    g = g.drop(columns=["_bucket"], errors="ignore").copy()
    for c, dt in add.items():
        if c not in g.columns:
            g[c] = pd.Series(dtype=dt)
    return g


def _empty_premap_pa(t, add):
    """Arrow sibling of :func:`_empty_premap` for pyarrow partition
    kernels: zero-row table, pre-map schema tolerated."""
    import pyarrow as pa

    if "_bucket" in t.schema.names:
        t = t.drop_columns(["_bucket"])
    for c, ty in add.items():
        if c not in t.schema.names:
            t = t.append_column(c, pa.array([], ty))
    return t


def _col_i64(t, c: str) -> np.ndarray:
    """Zero-copy-where-possible int64 view of an Arrow column.  Null
    values fail LOUD: the null -> float NaN -> astype(int64) cast would
    silently mint INT64_MIN (a numpy RuntimeWarning at best), poisoning
    shuffle hashes / positions / token sums downstream — same contract
    as the null-text guard in :func:`deterministic_pack`."""
    col = t.column(c)
    if col.null_count:
        raise ValueError(
            f"{col.null_count} null value(s) in column {c!r} — shuffle "
            f"keys and counters are undefined for null; filter or fill "
            f"nulls first")
    return (col.combine_chunks()
            .to_numpy(zero_copy_only=False).astype(np.int64, copy=False))

def deterministic_shuffle(
    ds: "object",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    n_partitions: "int | None" = None,
) -> "object":
    """Add ``shuffle_hash`` and ``pos`` (exact global rank under
    ``ORDER BY (shuffle_hash, id)``) to every row.  Carries all input
    columns through, so downstream stages keep streaming.  Every kernel
    is pyarrow-native (``batch_format="pyarrow"`` + the Arrow exchange
    partition path): text payloads riding through never widen to
    object-dtype pandas strings — the exchange moves Arrow-packed
    buffers end-to-end."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ocr_ray.stages.join import exchange_map_partitions

    shift = np.uint64(SHUFFLE_BITS - int(n_buckets - 1).bit_length())
    n_buckets = 1 << int(int(n_buckets - 1).bit_length())

    def with_key(t: "pa.Table") -> "pa.Table":
        h = shuffle_hash(_col_i64(t, id_col))
        t = t.append_column("shuffle_hash", pa.array(h, pa.int64()))
        return t.append_column(
            "_bucket",
            pa.array((h.astype(np.uint64) >> shift).astype(np.int64),
                     pa.int64()))

    # materialize ONCE: the keyed table feeds BOTH the count pass and the
    # exchange pass — a lazy input would re-execute the whole upstream
    # per pass (and a nondeterministic one would desynchronize offsets
    # from ranks, producing duplicate/skipped pos values)
    keyed = ds.map_batches(with_key, batch_format="pyarrow").materialize()

    # pass 1: per-bucket counts -> prefix offsets (n_buckets rows, driver)
    def count_buckets(t: "pa.Table") -> "pa.Table":
        vals, cnts = np.unique(_col_i64(t, "_bucket"), return_counts=True)
        return pa.table({"_bucket": pa.array(vals, pa.int64()),
                         "n": pa.array(cnts.astype(np.int64), pa.int64())})

    counts_df = keyed.map_batches(count_buckets,
                                  batch_format="pyarrow").to_pandas()
    if "_bucket" not in counts_df.columns:   # all-empty input (pre-map schema)
        counts_df = pd.DataFrame({"_bucket": pd.Series(dtype="int64"),
                                  "n": pd.Series(dtype="int64")})
    counts = counts_df.groupby("_bucket")["n"].sum()
    offsets = np.zeros(n_buckets + 1, dtype=np.int64)
    offsets[counts.index.to_numpy(dtype="int64") + 1] = counts.to_numpy()
    offsets = np.cumsum(offsets)

    # pass 2: exchange by bucket, rank locally, add the bucket offset
    def rank_partition(t: "pa.Table") -> "pa.Table":
        if not t.num_rows:
            return _empty_premap_pa(t, {"shuffle_hash": pa.int64(),
                                        "pos": pa.int64()})
        t = t.take(pc.sort_indices(
            t, sort_keys=[("_bucket", "ascending"),
                          ("shuffle_hash", "ascending"),
                          (id_col, "ascending")]))
        b = _col_i64(t, "_bucket")
        # rank within each bucket run = index - run start
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        run_start = np.repeat(starts, np.diff(np.r_[starts, len(b)]))
        pos = offsets[b] + (np.arange(len(b)) - run_start)
        return (t.drop_columns(["_bucket"])
                .append_column("pos", pa.array(pos, pa.int64())))

    return exchange_map_partitions(keyed, "_bucket", rank_partition,
                                   n_partitions=n_partitions,
                                   batch_format="pyarrow")


def deterministic_pack(
    ds: "object",
    budget: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    n_partitions: "int | None" = None,
) -> "object":
    """Sequence packing for training: concat-and-chunk bin assignment.

    Trainers concatenate documents in (shuffled) corpus order and slice
    the stream into fixed ``budget``-token bins; each doc's bin is
    ``start_offset // budget`` where ``start_offset`` is the global
    prefix sum of token counts under the deterministic shuffle order.
    ``budget`` must be positive (``start_offset // budget`` on numpy
    int64 arrays would SILENTLY map every doc to bin 0 for budget=0 —
    no ZeroDivisionError, just a RuntimeWarning).

    The global scan uses the same two-pass bucket design as
    :func:`deterministic_shuffle` — pass 1 reduces per-bucket token sums
    (``n_buckets`` ints to the driver), pass 2 exchanges by bucket and
    adds local cumsums to the driver-computed bucket offsets.  An exact
    distributed prefix-sum, no sort; only the REDUCED (id, n_tokens,
    hash, bucket) table materializes between the two passes — never the
    text payloads.

    Emits ``(id, n_tokens, start_offset, bin)``; 0-token docs get the
    running offset and pack into whichever bin is open there.
    """
    from ocr_ray.stages.join import exchange_map_partitions

    if budget <= 0:
        raise ValueError(f"pack budget must be positive, got {budget}")
    import pyarrow as pa
    import pyarrow.compute as pc

    shift = np.uint64(SHUFFLE_BITS - int(n_buckets - 1).bit_length())
    n_buckets = 1 << int(int(n_buckets - 1).bit_length())

    def with_tokens(t: "pa.Table") -> "pa.Table":
        ids = _col_i64(t, id_col)
        h = shuffle_hash(ids)
        # token count = RE2 \S+ run count (== len(text.split()) on ASCII
        # whitespace, and the SAME regex engine/class the DuckDB oracle's
        # string_split_regex uses) — one C kernel, no per-row Python.
        # Null text fails LOUD: count_substring_regex(null) -> null ->
        # float NaN -> astype(int64) would silently mint INT64_MIN token
        # counts and corrupt every downstream start_offset/bin (the old
        # len(t.split()) path raised on None; keep that contract).
        nulls = t.column(text_col).null_count
        if nulls:
            raise ValueError(
                f"deterministic_pack: {nulls} null value(s) in text column "
                f"{text_col!r} — token counts are undefined for null "
                f"text; filter or fill nulls before packing")
        n_tok = (pc.count_substring_regex(t.column(text_col), r"\S+")
                 .combine_chunks().to_numpy(zero_copy_only=False)
                 .astype(np.int64, copy=False))
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "shuffle_hash": pa.array(h, pa.int64()),
            "_bucket": pa.array(
                (h.astype(np.uint64) >> shift).astype(np.int64), pa.int64()),
        })

    keyed = ds.map_batches(with_tokens,
                           batch_format="pyarrow").materialize()  # two-pass consumer

    # pass 1: per-bucket token sums -> global token offsets (driver, tiny)
    def sum_buckets(t: "pa.Table") -> "pa.Table":
        b = _col_i64(t, "_bucket")
        vals, inv = np.unique(b, return_inverse=True)
        s = np.bincount(inv, weights=_col_i64(t, "n_tokens")).astype(np.int64)
        return pa.table({"_bucket": pa.array(vals, pa.int64()),
                         "s": pa.array(s, pa.int64())})

    sums_df = keyed.map_batches(sum_buckets,
                                batch_format="pyarrow").to_pandas()
    if "_bucket" not in sums_df.columns:     # all-empty input (pre-map schema)
        sums_df = pd.DataFrame({"_bucket": pd.Series(dtype="int64"),
                                "s": pd.Series(dtype="int64")})
    sums = sums_df.groupby("_bucket")["s"].sum()
    tok_offsets = np.zeros(n_buckets + 1, dtype=np.int64)
    tok_offsets[sums.index.to_numpy(dtype="int64") + 1] = sums.to_numpy()
    tok_offsets = np.cumsum(tok_offsets)

    def pack_partition(t: "pa.Table") -> "pa.Table":
        if not t.num_rows:
            # pre-map empty blocks may carry the raw input schema or no
            # columns at all — build the documented output schema outright
            return pa.table({c: pa.array([], pa.int64()) for c in
                             (id_col, "n_tokens", "shuffle_hash",
                              "start_offset", "bin")})
        t = t.take(pc.sort_indices(
            t, sort_keys=[("_bucket", "ascending"),
                          ("shuffle_hash", "ascending"),
                          (id_col, "ascending")]))
        b = _col_i64(t, "_bucket")
        n = _col_i64(t, "n_tokens")
        cum = np.cumsum(n)
        # per-bucket running offset: subtract the cumsum at each run start
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        base = np.repeat(cum[starts] - n[starts],
                         np.diff(np.r_[starts, len(b)]))
        start_offset = tok_offsets[b] + (cum - n) - base
        t = t.drop_columns(["_bucket"])
        t = t.append_column("start_offset",
                            pa.array(start_offset, pa.int64()))
        return t.append_column("bin",
                               pa.array(start_offset // budget, pa.int64()))

    return exchange_map_partitions(keyed, "_bucket", pack_partition,
                                   n_partitions=n_partitions,
                                   batch_format="pyarrow")


def grouped_rank(
    ds: "object",
    group_col: str,
    id_col: str = "doc_id",
    quota: int | None = None,
    n_buckets: int = 64,
    n_partitions: "int | None" = None,
) -> "object":
    """Exact per-group rank under the deterministic shuffle order — the
    per-domain quota-sampling primitive (take a reproducible "random"
    head-k of every source/domain/language without a global sort).

    Same two-pass design as :func:`deterministic_shuffle`, refined per
    group: pass 1 reduces (group, bucket) counts to the driver (bounded
    by n_groups x n_buckets — sources/domains, not rows; ship the offset
    table via ``ray.put`` if groups run to millions), pass 2 exchanges
    by hash bucket (uniform by construction — a hot group spreads over
    ALL buckets, so no skewed partition, unlike exchanging on the group
    itself) and adds local per-(group, bucket) ranks to the offsets.

    Adds ``src_rank`` (0-based rank of the row within its group under
    ``ORDER BY (shuffle_hash, id)``); with ``quota`` also adds ``kept =
    src_rank < quota``."""
    from ocr_ray.stages.join import exchange_map_partitions

    shift = np.uint64(SHUFFLE_BITS - int(n_buckets - 1).bit_length())
    n_buckets = 1 << int(int(n_buckets - 1).bit_length())

    def with_key(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        h = shuffle_hash(b[id_col].to_numpy(dtype="int64"))
        b["shuffle_hash"] = h
        b["_bucket"] = (h.astype(np.uint64) >> shift).astype(np.int64)
        return b

    # materialize ONCE: the keyed table feeds BOTH the count pass and the
    # exchange pass — a lazy input would re-execute the whole upstream
    # per pass (and a nondeterministic one would desynchronize offsets
    # from ranks, producing duplicate/skipped pos values)
    keyed = ds.map_batches(with_key, batch_format="pandas").materialize()

    def count_gb(b: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: NULL-group rows still get ranks (pandas' default
        # would drop their counts, then rank_partition's offsets lookup
        # KeyErrors on the very rows the count pass ignored)
        g = b.groupby([group_col, "_bucket"], dropna=False).size()
        out = g.reset_index()
        out.columns = [group_col, "_bucket", "n"]
        return out

    counts_df = keyed.map_batches(count_gb, batch_format="pandas").to_pandas()
    if "_bucket" not in counts_df.columns:   # all-empty input (pre-map schema)
        counts_df = pd.DataFrame({group_col: pd.Series(dtype="object"),
                                  "_bucket": pd.Series(dtype="int64"),
                                  "n": pd.Series(dtype="int64")})
    counts = (counts_df.groupby([group_col, "_bucket"], as_index=False,
                                dropna=False)["n"]
              .sum().sort_values([group_col, "_bucket"]))
    # offset of (group, bucket) = rows of the group in earlier buckets
    counts["off"] = (counts.groupby(group_col, dropna=False)["n"].cumsum()
                     - counts["n"])
    # dict keys null-normalized: NaN hashes but never compares equal, so
    # a raw-NaN key would be unreachable from the lookup side
    offsets = {(None if pd.isna(g) else g, int(b)): int(o) for g, b, o in
               zip(counts[group_col], counts["_bucket"], counts["off"])}

    def rank_partition(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            add = {"shuffle_hash": "int64", "src_rank": "int64"}
            if quota is not None:
                add["kept"] = "int64"
            return _empty_premap(g, add)
        g = g.sort_values(["_bucket", group_col, "shuffle_hash", id_col],
                          kind="mergesort").reset_index(drop=True)
        # run detection on factorize codes, not astype(str): string-cast
        # would merge a NaN group with one literally named "nan", and
        # NaN itself needs a code (use_na_sentinel gives it -1)
        gcodes = pd.factorize(g[group_col], use_na_sentinel=True)[0]
        bk = g["_bucket"].to_numpy(dtype="int64")
        starts = np.flatnonzero(np.r_[
            True, (bk[1:] != bk[:-1]) | (gcodes[1:] != gcodes[:-1])])
        run_start = np.repeat(starts, np.diff(np.r_[starts, len(g)]))
        local = np.arange(len(g)) - run_start
        base = np.fromiter(
            (offsets[(None if pd.isna(grp) else grp, int(b))] for grp, b in
             zip(g[group_col][starts], g["_bucket"][starts])),
            dtype=np.int64, count=starts.size)
        g["src_rank"] = np.repeat(base, np.diff(np.r_[starts, len(g)])) + local
        if quota is not None:
            g["kept"] = (g["src_rank"] < quota).astype(np.int64)
        return g.drop(columns=["_bucket"])

    return exchange_map_partitions(keyed, "_bucket", rank_partition,
                                   n_partitions=n_partitions)


def value_rank(
    ds: "object",
    value_col: str,
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    n_partitions: "int | None" = None,
) -> "object":
    """Exact global rank by an integer VALUE column — order statistics
    (percentiles, top-X% selection, curriculum ordering) without a
    ``Dataset.sort``'s sample-and-range shuffle.

    Three streaming passes: (0) min/max of the column (two ints to the
    driver); (1) counts per value-range bucket ``(v - vmin) * B //
    (vmax - vmin + 1)`` — monotone in v, so bucket order IS value order —
    reduced to B ints on the driver and prefix-summed; (2) exchange by
    bucket, sort each bucket locally by ``(v, id)``, add the offset.
    Adds ``rank`` (0-based, dense over rows) and ``pctile`` = floor(rank
    * 1e6 / (N-1)) / 1e6.

    Skew caveat (inherent to value ranking, unlike the hash shuffle's
    uniform buckets): a single value carrying a large fraction of rows
    lands in one bucket/partition.  Raise ``n_buckets`` for heavy-tailed
    distributions; for a pathological near-constant column, sub-exchange
    the hot bucket on the id."""
    from ocr_ray.stages.join import exchange_map_partitions

    def minmax(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value_col].to_numpy(dtype="int64")
        if not v.size:
            return pd.DataFrame({"lo": pd.Series([], dtype="int64"),
                                 "hi": pd.Series([], dtype="int64")})
        return pd.DataFrame({"lo": [int(v.min())], "hi": [int(v.max())]})

    # materialize ONCE: ds feeds the minmax pass AND the bucket passes —
    # a lazy input would re-execute upstream three times and a
    # nondeterministic one would desynchronize the range from the rows
    ds = ds.materialize()
    mm = ds.map_batches(minmax, batch_format="pandas").to_pandas()
    if not len(mm) or "lo" not in mm.columns or mm["lo"].isna().all():
        # all-empty input: any range works — zero rows flow through the
        # exchange and come back as a typed-empty result (int(nan) raises)
        vmin, vmax = 0, 0
    else:
        vmin, vmax = int(mm["lo"].min()), int(mm["hi"].max())
    span = vmax - vmin + 1

    def with_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        v = b[value_col].to_numpy(dtype="int64")
        # float64 mapping: all bucketing needs is WEAK monotonicity
        # (bucket order = value order; exact order inside a bucket comes
        # from the per-bucket sort).  The previous integer form
        # (v - vmin) * n_buckets // span silently wrapped int64 for
        # wide-range columns (62-bit fingerprints) and for vmin < 0 <
        # vmax the subtraction itself overflowed.
        f = (v.astype(np.float64) - float(vmin)) * (n_buckets / float(span))
        b["_bucket"] = np.clip(f.astype(np.int64), 0, n_buckets - 1)
        return b

    keyed = ds.map_batches(with_bucket, batch_format="pandas")

    def count_buckets(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("_bucket").size()
        return pd.DataFrame({"_bucket": g.index.to_numpy(dtype="int64"),
                             "n": g.to_numpy(dtype="int64")})

    counts_df = keyed.map_batches(count_buckets,
                                  batch_format="pandas").to_pandas()
    if "_bucket" not in counts_df.columns:
        # zero-row blocks skip the UDF and keep the pre-map schema
        counts_df = pd.DataFrame({"_bucket": pd.Series(dtype="int64"),
                                  "n": pd.Series(dtype="int64")})
    counts = counts_df.groupby("_bucket")["n"].sum()
    offsets = np.zeros(n_buckets + 1, dtype=np.int64)
    offsets[counts.index.to_numpy(dtype="int64") + 1] = counts.to_numpy()
    total = int(offsets.sum())
    offsets = np.cumsum(offsets)
    denom = max(total - 1, 1)

    def rank_partition(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return _empty_premap(g, {"rank": "int64", "pctile": "float64"})
        g = g.sort_values(["_bucket", value_col, id_col],
                          kind="mergesort").reset_index(drop=True)
        b = g["_bucket"].to_numpy(dtype="int64")
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        run_start = np.repeat(starts, np.diff(np.r_[starts, len(b)]))
        rank = offsets[b] + (np.arange(len(b)) - run_start)
        g["rank"] = rank
        # floor(x*1e6+0.5)/1e6-free: rank*1e6 is exact, // is exact
        g["pctile"] = (rank * 1_000_000 // denom) / 1e6
        return g.drop(columns=["_bucket"])

    return exchange_map_partitions(keyed, "_bucket", rank_partition,
                                   n_partitions=n_partitions)
