"""Per-key sequence validation — the transcript turn-index integrity check.

The north rule's reassembly contract ("stable turn ordering") assumes every
conversation's ``turn_idx`` sequence is sane.  At ingest that assumption is
exactly what breaks first: upstream collectors drop turns (gaps), replay
turns (duplicates), emit null indices, or emit 1-based vs 0-based indices.
This stage scores each key's index sequence without shuffling raw rows:
per-batch partial dedup of (key, idx) pairs with counts, one hash exchange
on the key, then a per-partition vectorized groupby — the same bounded
two-phase shape as the distinct-count aggregate
(join.exchange_map_partitions).

Reference analog: the page-ordering invariant of the PDF path
(``src/ocr_module.py:195-210`` assembles pages in index order and the result
silently corrupts when pages are missing); here the check is explicit and
emitted as a table a curation run can filter on.

Output: one row per key —
    key, n_rows, n_distinct, n_null_idx, min_idx, max_idx,
    has_dups      (n_rows > n_distinct — true for real duplicates AND for
                   null indices, both corruptions; SQL count(*) vs
                   count(DISTINCT idx) semantics),
    is_contiguous (min==base and max-min+1==n_distinct and
                   n_rows==n_distinct)
with ``base`` the expected first index (1 for lineitem line numbers,
0 for transcript turn_idx).  Null-index rows count in ``n_rows`` and
``n_null_idx`` but are excluded from ``n_distinct``/``min_idx``/``max_idx``
(SQL aggregate-over-null semantics); a key whose indices are ALL null gets
null ``min_idx``/``max_idx``.  Null keys group together, as in SQL.
"""

from __future__ import annotations

import pandas as pd

import ray.data as rd


def sequence_validation(
    ds: "rd.Dataset",
    key_col: str,
    idx_col: str,
    base: int = 0,
    n_partitions: "int | None" = None,
) -> "rd.Dataset":
    from ocr_ray.stages.join import exchange_map_partitions

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[key_col, idx_col]].assign(n=1)
        return b.groupby([key_col, idx_col], as_index=False, dropna=False)["n"].sum()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or any(c not in g.columns
                             for c in (key_col, idx_col, "n")):
            # all-empty exchange delivers the pre-map schema — return the
            # typed empty matching the real output schema below
            return pd.DataFrame({
                key_col: pd.Series(dtype="object"),
                "n_rows": pd.Series(dtype="int64"),
                "n_null_idx": pd.Series(dtype="int64"),
                "n_distinct": pd.Series(dtype="int64"),
                "min_idx": pd.Series(dtype="Int64"),
                "max_idx": pd.Series(dtype="Int64"),
                "has_dups": pd.Series(dtype="bool"),
                "is_contiguous": pd.Series(dtype="bool"),
            })
        # same (key, idx) pair arrives once per source batch — collapse to
        # one row per pair before the per-key stats so n_distinct is exact
        g = g.groupby([key_col, idx_col], as_index=False, dropna=False)["n"].sum()
        null_idx = g[idx_col].isna()
        totals = g.assign(_null_n=g["n"].where(null_idx, 0)).groupby(
            key_col, dropna=False
        ).agg(n_rows=("n", "sum"), n_null_idx=("_null_n", "sum")).reset_index()
        stats = g[~null_idx].groupby(key_col, dropna=False).agg(
            n_distinct=(idx_col, "size"),
            min_idx=(idx_col, "min"),
            max_idx=(idx_col, "max"),
        ).reset_index()
        out = totals.merge(stats, on=key_col, how="left")
        out["n_distinct"] = out["n_distinct"].fillna(0)
        for c in ("n_rows", "n_null_idx", "n_distinct"):
            out[c] = out[c].astype("int64")
        for c in ("min_idx", "max_idx"):  # null when every idx was null
            out[c] = out[c].astype("Int64")
        out["has_dups"] = out["n_rows"] > out["n_distinct"]
        out["is_contiguous"] = (
            (out["min_idx"] == base).fillna(False).astype(bool)
            & (out["max_idx"] - out["min_idx"] + 1 == out["n_distinct"])
            .fillna(False).astype(bool)
            & (out["n_rows"] == out["n_distinct"])
        )
        return out

    return exchange_map_partitions(
        ds.map_batches(partial, batch_format="pandas"),
        [key_col], combine, n_partitions=n_partitions,
    )


def contract_check(
    ds: "rd.Dataset",
    string_cols=("conv_id", "role", "text", "tool"),
    enum_col: str = "role",
    enum_values=("system", "user", "assistant", "tool"),
    idx_col: str = "turn_idx",
    ts_col: str = "ts",
    text_col: str = "text",
    max_text_len: int = 1 << 20,
) -> pd.DataFrame:
    """Data-contract gate (the great-expectations pattern as a streaming
    aggregate): per-batch partial violation counts — nulls per checked
    column, negative indices, out-of-enum roles, oversized payloads,
    null timestamps — reduced to ONE summary row, returned as a
    driver-side single-row DataFrame (the scan streams; only one small
    row per batch reaches the driver).  Run it before trusting an ingest
    shard; a nonzero cell routes the shard to quarantine instead of the
    pipeline."""
    import numpy as np

    enum_set = set(enum_values)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = {"n_rows": np.int64(len(b))}
        for c in string_cols:
            out[f"null_{c}"] = np.int64(b[c].isna().sum())
        # categories are DISJOINT: a null index counts as null_idx only
        # (not also neg_idx), a null role as null_role only (not bad_enum)
        # — a quarantine report must not double-diagnose one defect
        out["neg_idx"] = np.int64((b[idx_col].fillna(0) < 0).sum())
        out["null_idx"] = np.int64(b[idx_col].isna().sum())
        out["bad_enum"] = np.int64(
            (~b[enum_col].isin(enum_set) & b[enum_col].notna()).sum())
        out["null_ts"] = np.int64(b[ts_col].isna().sum())
        out["oversize_text"] = np.int64(
            (b[text_col].str.len().fillna(0) > max_text_len).sum())
        return pd.DataFrame([out])

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.sum().to_frame().T.astype("int64")

    parts = ds.map_batches(partial, batch_format="pandas")
    out = parts.to_pandas()
    if "n_rows" not in out.columns:
        # all-empty shard: zero-row blocks skip the partial UDF and
        # to_pandas drops columns — the summary is all-zero counts, not
        # a column-less frame a quarantine caller would KeyError on
        cols = ["n_rows", *(f"null_{c}" for c in string_cols), "neg_idx",
                "null_idx", "bad_enum", "null_ts", "oversize_text"]
        return pd.DataFrame([{c: np.int64(0) for c in cols}])
    return combine(out)


def snapshot_diff(
    left: "rd.Dataset",
    right: "rd.Dataset",
    key_col: str,
    compare_cols: "list[str]",
    n_partitions: "int | None" = None,
) -> "rd.Dataset":
    """Keyed diff between two table snapshots — the pipeline-regression
    primitive (did the new extractor version change anything, and what):
    one row per key with status ``added`` (right only), ``removed`` (left
    only), ``changed`` (both sides, any compare column differs) or
    ``unchanged``.

    Scale shape: each side reduces per batch to ``(key, row_hash)`` —
    ``pd.util.hash_pandas_object`` over the compare columns, so payloads
    never ship — then ONE hash exchange on the key merges the two
    fingerprint tables per partition.  Duplicate keys within a side are
    rejected loudly (a diff over a non-key is meaningless; dedup first).

    NULL semantics: hash_pandas_object folds nulls deterministically, so
    null-vs-value compares as changed and null-vs-null as unchanged —
    matching ``IS NOT DISTINCT FROM`` column-wise.
    """
    import numpy as np

    from ocr_ray.stages.join import exchange_map_partitions

    def fp(side: int):
        def inner(b: pd.DataFrame) -> pd.DataFrame:
            if b[key_col].isna().any():
                # the per-partition pivot would silently drop null-keyed
                # rows (pandas groups the pivot index with dropna=True and
                # exposes no switch) — refuse instead of under-reporting
                raise ValueError(
                    f"snapshot_diff: null {key_col} in side {side}; "
                    "diff keys must be non-null")
            h = pd.util.hash_pandas_object(
                b[compare_cols], index=False).to_numpy(dtype="uint64")
            return pd.DataFrame({
                key_col: b[key_col].to_numpy(),
                "_h": h.astype("int64"),  # int64 for Arrow friendliness
                "_side": np.int64(side),
            })
        return inner

    tagged = left.map_batches(fp(0), batch_format="pandas").union(
        right.map_batches(fp(1), batch_format="pandas"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({key_col: pd.Series(dtype="object"),
                              "status": pd.Series(dtype="object")})
        if not len(g) or "_side" not in g.columns:
            return empty  # all-empty exchange carries the pre-map schema
        piv = g.pivot_table(index=key_col, columns="_side", values="_h",
                            aggfunc="count", dropna=False)
        l_cnt = piv[0] if 0 in piv.columns else pd.Series(0, index=piv.index)
        r_cnt = piv[1] if 1 in piv.columns else pd.Series(0, index=piv.index)
        dup = (l_cnt.fillna(0) > 1) | (r_cnt.fillna(0) > 1)
        if dup.any():
            raise ValueError(
                f"snapshot_diff: duplicate {key_col} within a side for "
                f"{int(dup.sum())} key(s) (e.g. {dup[dup].index[0]!r}) — "
                "dedup before diffing")
        hv = g.pivot_table(index=key_col, columns="_side", values="_h",
                           aggfunc="first", dropna=False)
        l_h = hv[0] if 0 in hv.columns else pd.Series(np.nan, index=hv.index)
        r_h = hv[1] if 1 in hv.columns else pd.Series(np.nan, index=hv.index)
        status = np.where(
            l_h.isna(), "added",
            np.where(r_h.isna(), "removed",
                     np.where(l_h == r_h, "unchanged", "changed")))
        return pd.DataFrame({key_col: hv.index.to_numpy(),
                             "status": status})

    return exchange_map_partitions(tagged, key_col, merge,
                                   n_partitions=n_partitions)


def profile_table(
    ds: "rd.Dataset",
    columns: "list[str]",
    n_partitions: "int | None" = None,
) -> pd.DataFrame:
    """Per-column data profile — the Deequ/profiler primitive that fronts
    every ingest: one row per column with ``(col, n, n_null, n_distinct,
    min_str, max_str)``.  At 100 TB this is the first job run on a new
    drop, so its shape matters:

    * **stats leg** — one column-pruned Arrow scan; per batch each column
      reduces to ``(n, null_count, min, max)`` via ``pyarrow.compute``
      kernels (``pc.min_max`` is null-skipping and keeps integer columns
      integer — a pandas batch would widen nullable int64 to float64 and
      corrupt the formatted bounds).  Typed minima ride dtype-family slot
      columns (Int64 / float64 / timestamp / string) so the tiny partial
      frame stays Arrow-friendly; the driver folds batches per column.
    * **distinct leg** — the exact two-level distinct plan (the q16
      COUNT DISTINCT shape): per-batch ``pc.unique`` per column shrinks
      the stream to each batch's distinct values, ONE hash exchange on
      ``(col, v)`` makes them globally unique, and a second bounded
      aggregate counts per column.  Exchange payloads are canonical
      value strings (injective per column), never raw rows.  For columns
      where exact distinct is itself corpus-sized (primary keys), the
      HLL register sketch (aggregate.hll_distinct_terms) is the
      documented approximate cutover.

    The input is consumed twice (two pruned scans when lazy); pass a
    materialized Dataset to trade object-store memory for the second
    scan.  NULL semantics are SQL's: nulls count in ``n``/``n_null``,
    never in ``n_distinct``/min/max; an all-null column profiles with
    null bounds.  min/max format via the shortest-roundtrip repr
    (matching DuckDB's VARCHAR cast for int/string/double/date and
    second-resolution timestamps; sub-second timestamps print
    millisecond-trimmed in DuckDB — canonicalize upstream if you profile
    those).  DATE columns profile via their ISO string form (order- and
    repr-identical to DuckDB); decimal/binary/nested columns are rejected
    at plan time with the offending column and dtype family named."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ocr_ray.stages.aggregate import hash_aggregate

    def _canon(x) -> str:
        if isinstance(x, float):
            return repr(x)
        return str(x)

    # nested/binary columns have no min_max kernel and no hashable unique
    # path — fail LOUD at plan time (naming the column) instead of a
    # cryptic ArrowNotImplementedError inside a worker mid-stream
    schema = ds.schema()
    if schema is not None:
        types = dict(zip(schema.names, schema.types))
        for c in columns:
            ty = types.get(c)
            if ty is not None and not (
                pa.types.is_integer(ty) or pa.types.is_floating(ty)
                or pa.types.is_timestamp(ty) or pa.types.is_string(ty)
                or pa.types.is_large_string(ty) or pa.types.is_boolean(ty)
                or pa.types.is_date(ty)  # ISO-formats into the str slot
                or pa.types.is_null(ty)  # all-empty/all-null columns
            ):
                family = ("nested" if pa.types.is_nested(ty) else
                          "binary" if (pa.types.is_binary(ty)
                                       or pa.types.is_large_binary(ty)
                                       or pa.types.is_fixed_size_binary(ty))
                          else "decimal" if pa.types.is_decimal(ty)
                          else "unsupported-scalar")
                raise ValueError(
                    f"profile_table: column {c!r} has unsupported dtype "
                    f"{ty} ({family}) — supported: int / float / timestamp "
                    f"/ date / string / bool")

    def stats_partial(t: pa.Table) -> pd.DataFrame:
        rows = {"col": [], "n": [], "n_null": [],
                "min_int": [], "max_int": [], "min_dbl": [], "max_dbl": [],
                "min_ts": [], "max_ts": [], "min_str": [], "max_str": []}
        for c in columns:
            col = t[c]
            rows["col"].append(c)
            rows["n"].append(len(col))
            rows["n_null"].append(col.null_count)
            mn = mx = None
            if len(col) > col.null_count:
                mm = pc.min_max(col)
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
            ty = col.type
            if pa.types.is_date(ty) and mn is not None:
                # ISO 'YYYY-MM-DD' sorts lexicographically == chronologically
                # and matches DuckDB CAST(DATE AS VARCHAR), so dates fold
                # exactly through the string min/max slot
                mn, mx = mn.isoformat(), mx.isoformat()
            slot = ("int" if pa.types.is_integer(ty) else
                    "dbl" if pa.types.is_floating(ty) else
                    "ts" if pa.types.is_timestamp(ty) else "str")
            for s in ("int", "dbl", "ts", "str"):
                rows[f"min_{s}"].append(mn if s == slot else None)
                rows[f"max_{s}"].append(mx if s == slot else None)
        return pd.DataFrame({
            "col": rows["col"],
            "n": pd.array(rows["n"], dtype="int64"),
            "n_null": pd.array(rows["n_null"], dtype="int64"),
            "min_int": pd.array(rows["min_int"], dtype="Int64"),
            "max_int": pd.array(rows["max_int"], dtype="Int64"),
            "min_dbl": pd.array(rows["min_dbl"], dtype="float64"),
            "max_dbl": pd.array(rows["max_dbl"], dtype="float64"),
            "min_ts": pd.Series(rows["min_ts"], dtype="datetime64[us]"),
            "max_ts": pd.Series(rows["max_ts"], dtype="datetime64[us]"),
            "min_str": pd.Series(rows["min_str"], dtype="object"),
            "max_str": pd.Series(rows["max_str"], dtype="object"),
        })

    st = ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    if "col" not in st.columns:  # all-empty scan drops columns
        st = stats_partial(pa.table({c: pa.array([], type=pa.string())
                                     for c in columns}))

    def distinct_partial(t: pa.Table) -> pd.DataFrame:
        cs, vs = [], []
        for c in columns:
            u = pc.unique(t[c]).drop_null().to_pylist()
            vs.extend(_canon(x) for x in u)
            cs.extend([c] * len(u))
        return pd.DataFrame({"col": pd.Series(cs, dtype="object"),
                             "v": pd.Series(vs, dtype="object"),
                             "one": np.ones(len(cs), dtype="int64")})

    uniq = hash_aggregate(
        ds.map_batches(distinct_partial, batch_format="pyarrow"),
        keys=["col", "v"], aggs={"one": "max"}, n_partitions=n_partitions)

    def cnt_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b) or "col" not in b.columns:
            return pd.DataFrame({"col": pd.Series(dtype="object"),
                                 "n_distinct": pd.Series(dtype="int64")})
        b = b.assign(n_distinct=np.int64(1))
        return b.groupby("col", as_index=False)[["n_distinct"]].sum()

    dist_df = hash_aggregate(
        uniq.map_batches(cnt_partial, batch_format="pandas"),
        keys=["col"], aggs={"n_distinct": "sum"}, n_partitions=2).to_pandas()
    dist = (dict(zip(dist_df["col"], dist_df["n_distinct"]))
            if "col" in dist_df.columns else {})

    def _fmt(v):
        if v is None or v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
            return None
        if isinstance(v, (bool, np.bool_)):
            # DuckDB CAST(BOOLEAN AS VARCHAR) prints lowercase
            return "true" if v else "false"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, pd.Timestamp):
            return str(v)
        return str(int(v)) if not isinstance(v, str) else v

    out = []
    for c in columns:
        sub = st[st["col"] == c]
        mn = mx = None
        for lo, hi in (("min_int", "max_int"), ("min_dbl", "max_dbl"),
                       ("min_ts", "max_ts"), ("min_str", "max_str")):
            lv = sub[lo].dropna()
            if len(lv):
                mn, mx = lv.min(), sub[hi].dropna().max()
                break
        out.append({"col": c, "n": int(sub["n"].sum()),
                    "n_null": int(sub["n_null"].sum()),
                    "n_distinct": int(dist.get(c, 0)),
                    "min_str": _fmt(mn), "max_str": _fmt(mx)})
    res = pd.DataFrame(out, columns=["col", "n", "n_null", "n_distinct",
                                     "min_str", "max_str"])
    res = res.astype({"n": "int64", "n_null": "int64", "n_distinct": "int64"})
    return res.sort_values("col").reset_index(drop=True)
