"""Driver-facing query surface: one callable per operator (SURVEY §2) plus
the matching DuckDB oracle SQL (same column names, same value semantics).

Conventions for oracle parity:
* integer result columns are int64 on both sides (DuckDB sums cast to BIGINT);
* float aggregates avoided — money/value sums use integer cents via
  ``floor(x*100 + 0.5)`` (identical double op both sides);
* per-row floats rounded to 6 dp on both sides after any ordering;
* computed columns named identically in Ray code and SQL.
"""

from __future__ import annotations

import os
import re
from typing import Callable, Dict

import numpy as np
import pandas as pd

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ocr_ray.functions.entities import extract_entities
from ocr_ray.stages.aggregate import global_topk
from ocr_ray.stages.analysis import (
    BPE_PATTERN,
    LANG_MARKERS,
    STOP_WORDS,
    langid_docs_batch,
    chunk_docs_batch,
    clean_docs_batch,
    fingerprint_docs_batch,
    format_docs_batch,
    quality_docs_batch,
    score_docs_batch,
    table_detect_batch,
    token_count_batch,
)
from ocr_ray.stages.dedup import add_content_hash, build_token_matrix
from ocr_ray.stages.similarity import (
    CosineTopK,
    IVFAssign,
    RandomProjectionLSH,
    kmeans_fit,
)

JACCARD_THRESHOLD = 0.95

# hard cap for the two driver-side all-pairs VERIFICATION kernels
# (dedup_jaccard / dedup_embed): they are O(N^2) small-side tools by
# design; beyond this the LSH/ANN pipelines are the only sanctioned path
ALLPAIRS_ROW_CAP = 100_000


def _guard_allpairs(n_rows: int, name: str, scale_alt: str) -> None:
    if n_rows > ALLPAIRS_ROW_CAP:
        raise ValueError(
            f"{name} is the all-pairs verification kernel (O(N^2), "
            f"driver-side matrix): input has {n_rows} rows > cap "
            f"{ALLPAIRS_ROW_CAP}; use {scale_alt} at scale"
        )


def _doc(sf_dir: str) -> "rd.Dataset":
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))


# ================================================================ documents
def q_doc_clean(sf_dir: str):
    return _doc(sf_dir).map_batches(clean_docs_batch, batch_format="pyarrow")


def q_doc_score(sf_dir: str):
    return _doc(sf_dir).map_batches(score_docs_batch, batch_format="pandas")


def q_doc_quality(sf_dir: str):
    return _doc(sf_dir).map_batches(quality_docs_batch, batch_format="pandas")


def q_doc_quality_score(sf_dir: str):
    """M15 parity: weighted quality_score (0.3/0.2/0.3/0.1/0.1) + issue
    tags grafted onto text-payload signals (stages/analysis.py)."""
    from ocr_ray.stages.analysis import quality_score_batch

    return _doc(sf_dir).map_batches(quality_score_batch, batch_format="pandas")


def q_doc_chunks_window(sf_dir: str):
    return _doc(sf_dir).map_batches(chunk_docs_batch, batch_format="pandas")


def q_doc_fingerprint(sf_dir: str):
    return _doc(sf_dir).map_batches(fingerprint_docs_batch, batch_format="pandas")


def q_doc_tokens(sf_dir: str):
    return _doc(sf_dir).map_batches(token_count_batch, batch_format="pyarrow")


def q_doc_format(sf_dir: str):
    return _doc(sf_dir).map_batches(format_docs_batch, batch_format="pandas")


def q_doc_tables(sf_dir: str):
    return _doc(sf_dir).map_batches(table_detect_batch, batch_format="pandas")


def q_doc_langid(sf_dir: str):
    return _doc(sf_dir).map_batches(langid_docs_batch, batch_format="pandas")


# ====================================================== dataset splitting
SPLIT_MULT = 2654435761  # Knuth multiplicative constant


def _id_hash32(ids):
    """(id * SPLIT_MULT) mod 2^32, exact for ANY non-negative int64 id.

    Mod-first keeps the product inside uint64 ((2^32-1) * SPLIT_MULT <
    2^64); the naive int64 multiply silently wraps above id ~3.47e9,
    diverging from the BIGINT oracle (which overflows loudly instead).
    Returns a Series when given one (index preserved for mask alignment).
    The oracles compute the same mod-first form in HUGEINT."""
    if isinstance(ids, pd.Series):
        u = ids.to_numpy(dtype=np.uint64)
        h = (((u % np.uint64(1 << 32)) * np.uint64(SPLIT_MULT))
             % np.uint64(1 << 32))
        return pd.Series(h.astype("int64"), index=ids.index)
    u = np.asarray(ids, dtype=np.uint64)
    return (((u % np.uint64(1 << 32)) * np.uint64(SPLIT_MULT))
            % np.uint64(1 << 32)).astype("int64")

# target language mixture for doc_mix (parts, not normalized)
MIX_WEIGHTS = {"en": 40, "de": 15, "fr": 15, "es": 15, "zh": 15}


def q_doc_split(sf_dir: str):
    """Deterministic train/val/test assignment (the standard training-data
    split op): hash-bucket each doc_id, 80/10/10.  Partition-local, zero
    shuffle, reproducible across runs and engines — doc_id * K mod 2^32
    stays exact in int64/BIGINT at any realistic id range."""

    def split_batch(b: pd.DataFrame) -> pd.DataFrame:
        h = _id_hash32(b["doc_id"])
        bucket = (h % 100).astype("int64")
        split = np.where(bucket < 80, "train", np.where(bucket < 90, "val", "test"))
        return pd.DataFrame(
            {"doc_id": b["doc_id"].astype("int64"), "bucket": bucket, "split": split}
        )

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
    return ds.map_batches(split_batch, batch_format="pandas")


def q_split_contamination(sf_dir: str):
    """Train/eval contamination guard: val/test docs (doc_split's 80/10/10
    hash assignment) sharing ANY 3-word shingle with any train doc.
    Distributed by shingle hash (stages/dedup.py:
    cross_split_contamination); the oracle joins the identical 62-bit
    polynomial shingle hashes in SQL."""
    from ocr_ray.stages.dedup import cross_split_contamination

    def split_of(ids):
        h = _id_hash32(np.asarray(ids, dtype="int64"))
        bucket = h % 100
        label = np.where(bucket < 80, "train",
                         np.where(bucket < 90, "val", "test"))
        return bucket < 80, label

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return cross_split_contamination(ds, split_of, n_partitions=None)


def q_doc_tfidf(sf_dir: str):
    """Per-doc top-3 TF-IDF terms — the two-pass broadcast featurization
    pattern: pass 1 aggregates global document frequencies (two-level hash
    aggregate over per-doc distinct terms; vocabulary-sized output), the DF
    table is broadcast once via ray.put, pass 2 re-streams the docs scoring
    tf*ln(N/df) per term and ranking top-3 locally (a doc never crosses a
    batch, so no shuffle).  Ranking uses the ROUNDED score (6 dp) with term
    tie-break so the DuckDB oracle ranks identically."""
    from ocr_ray.stages.aggregate import hash_aggregate

    path = os.path.join(sf_dir, "documents.parquet")
    n_docs = rd.read_parquet(path, columns=["doc_id"]).count()

    def distinct_terms(b: pd.DataFrame) -> pd.DataFrame:
        terms = []
        for t in b["text"]:
            terms.extend(set(_TERM.findall(t.lower())))
        return pd.DataFrame({"term": pd.Series(terms, dtype="object")})

    docs = rd.read_parquet(path, columns=["doc_id", "text"])
    df_tbl = hash_aggregate(
        docs.map_batches(distinct_terms, batch_format="pandas"),
        keys=["term"], aggs={"df": "count"}, n_partitions=None,
    ).to_pandas()
    df_ref = ray.put(dict(zip(df_tbl["term"], df_tbl["df"].astype("int64"))))

    def score_batch(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        df = ray.get(df_ref)
        out = {"doc_id": [], "term": [], "tfidf": [], "rank": []}
        for d, t in zip(b["doc_id"], b["text"]):
            tf = Counter(_TERM.findall(t.lower()))
            scored = sorted(
                ((-np.round(c * np.log(n_docs / df[w]), 6), w) for w, c in tf.items())
            )[:3]
            for r, (neg, w) in enumerate(scored, 1):
                out["doc_id"].append(int(d))
                out["term"].append(w)
                out["tfidf"].append(-neg)
                out["rank"].append(r)
        return pd.DataFrame(out).astype(
            {"doc_id": "int64", "tfidf": "float64", "rank": "int64"}
        )

    return docs.map_batches(score_batch, batch_format="pandas")


def q_doc_lang_top_terms(sf_dir: str):
    """Group-wise top-k at scale: top-5 terms per language by count.
    Exchange by (lang, term) for the count aggregate, then a second
    exchange BY LANG so each partition ranks its languages locally — no
    global sort, no driver-side ranking.  Ties broken by term asc."""
    import pyarrow as pa

    from ocr_ray.stages.dedup import _concat_pd, _exchange
    from ocr_ray.stages.aggregate import hash_aggregate

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: "Counter[tuple]" = Counter()
        for lang, t in zip(b["lang"], b["text"]):
            for w in _TERM.findall(t.lower()):
                c[(lang, w)] += 1
        ks = list(c.keys())
        return pd.DataFrame(
            {"lang": [k[0] for k in ks], "term": [k[1] for k in ks],
             "n": pd.Series(list(c.values()), dtype="int64")}
        )

    counts = hash_aggregate(
        docs.map_batches(partial, batch_format="pandas"),
        keys=["lang", "term"], aggs={"n": "sum"}, n_partitions=8,
    )

    @ray.remote(num_cpus=0)
    def topk(*pieces):
        import pyarrow as pa

        g = _concat_pd(pieces)
        if not len(g):
            out = pd.DataFrame({"lang": pd.Series([], dtype="object"),
                                "term": pd.Series([], dtype="object"),
                                "n": pd.Series([], dtype="int64"),
                                "rank": pd.Series([], dtype="int64")})
            return pa.Table.from_pandas(out, preserve_index=False)
        g = g.sort_values(["lang", "n", "term"],
                          ascending=[True, False, True])
        g["rank"] = g.groupby("lang").cumcount() + 1
        g = g[g["rank"] <= 5].reset_index(drop=True)
        g["n"] = g["n"].astype("int64")
        g["rank"] = g["rank"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    lsplit = _exchange(counts, "lang", 4)
    return rd.from_arrow_refs(
        [topk.remote(*[s[j] for s in lsplit]) for j in range(4)]
    )


def q_doc_sample_stratified(sf_dir: str):
    """Deterministic stratified downsampling — per-language keep rates
    (en 10%, others 50%) via the same multiplicative id hash as doc_split:
    reproducible across engines/runs, zero shuffle, no RNG state."""
    RATES = {"en": 10, "de": 50, "fr": 50, "es": 50, "zh": 50}

    def sample_batch(b: pd.DataFrame) -> pd.DataFrame:
        h = _id_hash32(b["doc_id"])
        bucket = (h % 100).astype("int64")
        rate = b["lang"].map(RATES).fillna(50).astype("int64")
        keep = bucket < rate
        out = pd.DataFrame(
            {"doc_id": b["doc_id"].astype("int64")[keep],
             "lang": b["lang"][keep], "bucket": bucket[keep]}
        )
        return out

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )
    return ds.map_batches(sample_batch, batch_format="pandas")


def q_corpus_stats(sf_dir: str):
    """Whole-corpus exact statistics in one pass + one exchange: doc count,
    token occurrences, EXACT distinct terms and distinct bigrams (per-batch
    partial sets -> hash exchange by value -> per-partition distinct counts
    -> tiny driver sum).  The exact-distinct path is the honest baseline a
    sketch (HLL) would be validated against; partial dedup inside each
    batch bounds what the exchange moves."""
    import pyarrow as pa

    from ocr_ray.stages.dedup import _concat_pd, _exchange

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        terms, bigrams = set(), set()
        n_docs, n_tokens = 0, 0
        for t in b["text"]:
            toks = _TERM.findall(t.lower())
            n_docs += 1
            n_tokens += len(toks)
            terms.update(toks)
            bigrams.update(a + " " + bb for a, bb in zip(toks, toks[1:]))
        vals = (["__doc__"] * 1 + ["__tok__"] * 1
                + ["t:" + x for x in terms] + ["b:" + x for x in bigrams])
        counts = [n_docs, n_tokens] + [0] * (len(terms) + len(bigrams))
        return pd.DataFrame({"val": vals, "c": pd.Series(counts, dtype="int64")})

    @ray.remote(num_cpus=0)
    def count_distinct(*pieces):
        g = _concat_pd(pieces)
        if not len(g):
            return pa.Table.from_pandas(
                pd.DataFrame({"kind": pd.Series([], dtype="object"),
                              "n": pd.Series([], dtype="int64")}),
                preserve_index=False)
        rows = []
        sums = g[g["val"].isin(["__doc__", "__tok__"])].groupby("val")["c"].sum()
        for k, v in sums.items():
            rows.append((k, int(v)))
        uniq = g.loc[~g["val"].isin(["__doc__", "__tok__"]), "val"].drop_duplicates()
        rows.append(("__terms__", int((uniq.str[:2] == "t:").sum())))
        rows.append(("__bigrams__", int((uniq.str[:2] == "b:").sum())))
        return pa.Table.from_pandas(
            pd.DataFrame(rows, columns=["kind", "n"]).astype({"n": "int64"}),
            preserve_index=False)

    rows = ds.map_batches(partial, batch_format="pandas")
    P = 8
    vsplit = _exchange(rows, "val", P)
    parts = rd.from_arrow_refs(
        [count_distinct.remote(*[s[j] for s in vsplit]) for j in range(P)]
    ).to_pandas()
    agg = parts.groupby("kind")["n"].sum()
    return pd.DataFrame(
        [{"n_docs": int(agg.get("__doc__", 0)),
          "n_token_occurrences": int(agg.get("__tok__", 0)),
          "n_distinct_terms": int(agg.get("__terms__", 0)),
          "n_distinct_bigrams": int(agg.get("__bigrams__", 0))}]
    ).astype("int64")


def q_corpus_drift(sf_dir: str):
    """Per-source term-distribution drift monitor — total-variation
    distance (in exact ppm integers) between each source's unigram
    distribution and the corpus-wide distribution: the data-quality
    alarm a production pipeline runs per ingest batch ("did src7's
    content shift?").  TV = 1/2 sum_t |p_s(t) - p_c(t)|; with ppm
    integer division both sides every cell is exact int64, so even this
    statistical monitor is value-checked (reported as ``tv2_ppm`` =
    sum |ppm_s - ppm_c|, i.e. 2e6 x TV).

    Plan: (source, term) combiner counts -> one hash aggregate; tiny
    per-source totals to the driver (bounded by |sources|, broadcast in
    the closure); one exchange BY TERM — a partition owns every source's
    count for its terms, so present-cell |ppm_s - ppm_c| and the
    absent-cell complement (sum of its terms' corpus ppm minus the
    present ones per source) are both local integer sums; final
    per-source partial-sum aggregate.  Exchange volume: the (source,
    term) count table, never token streams."""
    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_map_partitions

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        counts: Dict[str, "Counter[str]"] = {}
        for s, t in zip(b["source"], b["text"]):
            counts.setdefault(s, Counter()).update(_TERM.findall(t.lower()))
        rows = [(s, term, n) for s, c in counts.items() for term, n in c.items()]
        return pd.DataFrame({
            "source": [r[0] for r in rows],
            "term": [r[1] for r in rows],
            "n": pd.Series([r[2] for r in rows], dtype="int64"),
        })

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["source", "text"])
    st = hash_aggregate(ds.map_batches(partial, batch_format="pandas"),
                        keys=["source", "term"], aggs={"n": "sum"},
                        n_partitions=None)

    totals = st.map_batches(
        lambda b: b.groupby("source", as_index=False)["n"].sum(),
        batch_format="pandas",
    ).to_pandas().groupby("source")["n"].sum()  # bounded: one row per source
    tot_by_source = totals.to_dict()
    tot_c = int(totals.sum())
    sources = sorted(tot_by_source)

    def tv_partial(g: pd.DataFrame) -> pd.DataFrame:
        out_src = np.asarray(sources, dtype=object)
        if not len(g):
            return pd.DataFrame({"source": out_src,
                                 "sum_abs": np.zeros(len(sources), dtype="int64")})
        nt = g.groupby("term")["n"].transform("sum").to_numpy(dtype="int64")
        n = g["n"].to_numpy(dtype="int64")
        tot_s = g["source"].map(tot_by_source).to_numpy(dtype="int64")
        ppm_s = (n * 1_000_000) // tot_s
        ppm_c = (nt * 1_000_000) // tot_c
        present = pd.DataFrame({
            "source": g["source"].to_numpy(),
            "d": np.abs(ppm_s - ppm_c),
            "pc": ppm_c,
        }).groupby("source").agg(d=("d", "sum"), pc=("pc", "sum"))
        term_tot = g.groupby("term")["n"].sum().to_numpy(dtype="int64")
        sum_all_pc = int(((term_tot * 1_000_000) // tot_c).sum())
        d = present["d"].reindex(sources).fillna(0).to_numpy(dtype="int64")
        pc = present["pc"].reindex(sources).fillna(0).to_numpy(dtype="int64")
        return pd.DataFrame({"source": out_src,
                             "sum_abs": d + (sum_all_pc - pc)})

    parts = exchange_map_partitions(st, "term", tv_partial, n_partitions=None)
    out = hash_aggregate(parts, keys=["source"], aggs={"sum_abs": "sum"},
                         n_partitions=4)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["total_tokens"] = b["source"].map(tot_by_source).astype("int64")
        b["tv2_ppm"] = b["sum_abs"].astype("int64")
        return b[["source", "total_tokens", "tv2_ppm"]]

    return out.map_batches(finish, batch_format="pandas")


def q_doc_winnow(sf_dir: str):
    """Winnowing fingerprint selection (Schleimer et al. SIGMOD 2003 — the
    MOSS local fingerprinting scheme): per document, the distinct
    rightmost-min k-gram hashes selected by every length-w window, as
    (doc_id, pos, fp) rows.  Any shared run of >= w+k-1 tokens between two
    docs is guaranteed a shared fingerprint, so an equi-join on fp is the
    plagiarism/overlap candidate generator whose density (~2/(w+1) of
    k-grams) is tunable.  Pure per-row map over a column-pruned scan —
    embarrassingly parallel, no shuffle; the tiebreak folds into one
    integer key (h*C - pos) so selection is a vectorized sliding-window
    min on both sides of the oracle."""
    from ocr_ray.stages.analysis import winnow_docs_batch

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(winnow_docs_batch, batch_format="pandas")


def q_doc_overlap(sf_dir: str):
    """Document-overlap candidates THROUGH the winnowing fingerprints —
    the end-to-end MOSS detector: distinct (doc, fp) rows exchange BY
    FINGERPRINT (all holders of an fp co-locate, so the document-frequency
    gate and pair enumeration are partition-local), boilerplate
    fingerprints held by > 32 docs are dropped (the skew guard: a chrome
    fp shared by millions of docs would otherwise explode one partition
    quadratically — standard practice, cf. the max_df gate in
    split_contamination), surviving pairs aggregate to per-pair shared-fp
    counts, and pairs sharing >= 2 fingerprints are reported.  Shuffle
    volume: one row per (doc, distinct fp) plus the candidate pairs —
    never payload text."""
    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_map_partitions

    fp_rows = q_doc_winnow(sf_dir)

    def distinct_fp(b: pd.DataFrame) -> pd.DataFrame:
        return b[["doc_id", "fp"]].drop_duplicates()

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_l: list = []
        out_r: list = []
        for _, grp in g.drop_duplicates(["doc_id", "fp"]).groupby("fp", sort=False):
            ids = np.sort(grp["doc_id"].unique())
            if len(ids) < 2 or len(ids) > 32:
                continue
            iu = np.triu_indices(len(ids), k=1)
            out_l.append(ids[iu[0]])
            out_r.append(ids[iu[1]])
        if not out_l:
            return pd.DataFrame({"left_id": pd.Series([], dtype="int64"),
                                 "right_id": pd.Series([], dtype="int64"),
                                 "n_shared": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "left_id": np.concatenate(out_l).astype("int64"),
            "right_id": np.concatenate(out_r).astype("int64"),
            "n_shared": np.int64(1),
        })

    cand = exchange_map_partitions(
        fp_rows.map_batches(distinct_fp, batch_format="pandas"),
        "fp", pairs, n_partitions=None,
    )
    agg = hash_aggregate(cand, keys=["left_id", "right_id"],
                         aggs={"n_shared": "sum"}, n_partitions=None)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["n_shared"] >= 2].copy()
        b["n_shared"] = b["n_shared"].astype("int64")
        return b

    return agg.map_batches(finish, batch_format="pandas")


def q_dedup_spans(sf_dir: str):
    """Exact duplicated-span detection (stages/dedup.py:duplicated_spans —
    the Lee et al. 2022 ExactSubstr primitive via overlapping-window
    hashing): maximal token spans whose every L=8-token window occurs
    elsewhere in the corpus, per document.  The remove step is then a
    per-row splice of [span_start, span_end] — this query emits the spans
    themselves so the oracle value-checks the detection geometry."""
    from ocr_ray.stages.dedup import duplicated_spans

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return duplicated_spans(docs, L=8, n_partitions=None)


def q_dedup_spans_remove(sf_dir: str):
    """The ExactSubstr removal step (stages/dedup.py:
    remove_duplicated_spans): every duplicated >=8-token span spliced out
    of its document, with per-doc token accounting and the rebuilt text —
    value-checked to the character."""
    from ocr_ray.stages.dedup import remove_duplicated_spans

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    # deterministic parquet read: a second scan beats pinning the table
    return remove_duplicated_spans(docs, L=8, n_partitions=None,
                                   materialize_input=False)


def q_doc_repetition(sf_dir: str):
    """Intra-document repetition signals (the Gopher/MassiveText-style
    repetition filter): per doc, total vs distinct adjacent bigrams and the
    duplicate fraction.  Integer counts keep the oracle value-exact; pure
    per-row map, no shuffle."""

    def rep_batch(b: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_id": [], "n_pairs": [], "n_distinct_pairs": [],
               "dup_ratio": []}
        for d, t in zip(b["doc_id"], b["text"]):
            toks = _TERM.findall(t.lower())
            pairs = list(zip(toks, toks[1:]))
            n, nd = len(pairs), len(set(pairs))
            out["doc_id"].append(int(d))
            out["n_pairs"].append(n)
            out["n_distinct_pairs"].append(nd)
            # floor(x*1e6+0.5): ties away from zero, matching DuckDB's
            # round() — Python round() is ties-to-even and diverges on
            # exact dyadic ties like 1/128 (file-header convention)
            out["dup_ratio"].append(
                np.floor((n - nd) / n * 1e6 + 0.5) / 1e6 if n else 0.0)
        return pd.DataFrame(out).astype(
            {"doc_id": "int64", "n_pairs": "int64",
             "n_distinct_pairs": "int64", "dup_ratio": "float64"}
        )

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(rep_batch, batch_format="pandas")


def q_doc_gopher(sf_dir: str):
    """Gopher quality-rule bundle (Rae et al. 2021 Table A1 analog,
    stages/analysis.py:gopher_rules_batch): every rule signal per doc plus
    the composite keep flag, all keep-conditions as scaled-integer
    comparisons so the oracle is value-exact.  min_stop_hits=1 here (the
    sf corpus vocabulary is synthetic and carries at most one canonical
    stop word; the published default is 2).  Pure per-row map — at 100 TB
    this runs inline with the read, no shuffle."""
    import functools

    from ocr_ray.stages.analysis import gopher_rules_batch

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(
        functools.partial(gopher_rules_batch, min_stop_hits=1),
        batch_format="pandas",
    )


def q_corpus_pmi(sf_dir: str):
    """Document-level term co-occurrence with PMI scoring: distinct-term
    pairs per doc (a < b lexicographically), pair and term doc-frequencies
    via the bounded hash exchanges, pmi = ln(N*c_ab/(c_a*c_b)) on exact
    integer counts (single libm call per pair, identical in DuckDB).
    Top-20 pairs by (count, pair) — per-doc pair fan-out is O(T^2) in the
    doc's DISTINCT terms; cap terms-per-doc upstream for open-vocab
    corpora (this corpus holds 31)."""
    import math

    from ocr_ray.stages.aggregate import hash_aggregate

    path = os.path.join(sf_dir, "documents.parquet")
    ds = rd.read_parquet(path, columns=["doc_id", "text"])

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = {"a": [], "b": [], "c_ab": []}
        for t in b["text"]:
            terms = sorted(set(t.split()))
            for i, x in enumerate(terms):
                for y in terms[i + 1:]:
                    rows["a"].append(x)
                    rows["b"].append(y)
                    rows["c_ab"].append(1)
        return pd.DataFrame(rows).groupby(["a", "b"], as_index=False)["c_ab"].sum()

    def term_partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = {"term": [], "df": []}
        for t in b["text"]:
            for x in set(t.split()):
                rows["term"].append(x)
                rows["df"].append(1)
        return pd.DataFrame(rows).groupby("term", as_index=False)["df"].sum()

    n_docs = ds.count()
    pairs = hash_aggregate(
        ds.map_batches(pair_partial, batch_format="pandas"),
        keys=["a", "b"], aggs={"c_ab": "sum"}, n_partitions=8,
    ).to_pandas()
    dfs = hash_aggregate(
        ds.map_batches(term_partial, batch_format="pandas"),
        keys=["term"], aggs={"df": "sum"}, n_partitions=8,
    ).to_pandas().set_index("term")["df"]

    pairs = pairs.sort_values(["c_ab", "a", "b"],
                              ascending=[False, True, True]).head(20)
    pmi = [
        np.floor(math.log(n_docs * c / (int(dfs[a]) * int(dfs[b])))
                 * 1e6 + 0.5) / 1e6
        for a, b, c in zip(pairs["a"], pairs["b"], pairs["c_ab"])
    ]
    out = pd.DataFrame({"a": pairs["a"].to_numpy(),
                        "b": pairs["b"].to_numpy(),
                        "c_ab": pairs["c_ab"].astype("int64").to_numpy(),
                        "pmi": pmi})
    return out


def _build_vocab(ds: "rd.Dataset", max_vocab: int = 65536) -> dict:
    """Frequency-ranked vocabulary: global term counts via the bounded
    exchange, id = rank by (count desc, term asc), capped at max_vocab."""
    from ocr_ray.stages.aggregate import hash_aggregate

    def term_counts(b: pd.DataFrame) -> pd.DataFrame:
        rows = {"term": [], "n": []}
        for t in b["text"]:
            for tok in t.split():
                rows["term"].append(tok)
                rows["n"].append(1)
        return pd.DataFrame(rows).groupby("term", as_index=False)["n"].sum()

    counts = hash_aggregate(
        ds.map_batches(term_counts, batch_format="pandas"),
        keys=["term"], aggs={"n": "sum"}, n_partitions=8,
    ).to_pandas().sort_values(["n", "term"], ascending=[False, True])
    return {t: i for i, t in enumerate(counts["term"].head(max_vocab))}


def q_doc_encode(sf_dir: str):
    """Frequency-ranked vocabulary build + token-id encoding (the
    tokenize-to-ids trainer-prep step): global term counts via the bounded
    exchange, vocab id = rank by (count desc, term asc) capped at
    max_vocab (OOV -> -1), vocab broadcast once via ray.put, then a
    stateless encode map emits (doc_id, pos, token_id).  Two passes over
    the text, one tiny broadcast, no shuffle of the token stream."""
    path = os.path.join(sf_dir, "documents.parquet")
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    vocab_ref = ray.put(_build_vocab(ds))

    def encode(b: pd.DataFrame, *, vocab_ref=vocab_ref) -> pd.DataFrame:
        v = ray.get(vocab_ref)
        out = {"doc_id": [], "pos": [], "token_id": []}
        for d, t in zip(b["doc_id"], b["text"]):
            for pos, tok in enumerate(t.split()):
                out["doc_id"].append(int(d))
                out["pos"].append(pos)
                out["token_id"].append(v.get(tok, -1))
        df = pd.DataFrame(out)
        return df.astype({"doc_id": "int64", "pos": "int64",
                          "token_id": "int64"})

    return ds.map_batches(encode, batch_format="pandas")


def q_pipeline_tokenize(sf_dir: str):
    """Tokenize-and-pack composite — the final pre-training artifact: every
    token placed at its exact global position under the deterministic
    shuffle order, sliced into fixed 1024-token bins (concat-and-chunk;
    docs legitimately span bins).  Stages: vocab exchange (broadcast once)
    -> distributed prefix-sum of token counts (stages/shuffle.py:
    deterministic_pack) -> offsets exchange-joined back to the text ->
    stateless emit of (doc_id, bin, pos_in_bin, token_id).  No sort, no
    materialization; shuffle volume is the per-doc offset table."""
    from ocr_ray.stages.join import exchange_join
    from ocr_ray.stages.shuffle import deterministic_pack

    BUDGET = 1024
    path = os.path.join(sf_dir, "documents.parquet")
    docs = rd.read_parquet(path, columns=["doc_id", "text"])
    vocab_ref = ray.put(_build_vocab(docs))

    packed = deterministic_pack(docs, budget=BUDGET, n_buckets=64,
                                n_partitions=8)

    def offsets_only(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": b["doc_id"].astype("int64"),
                             "start_offset": b["start_offset"].astype("int64")})

    def docs_cast(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": b["doc_id"].astype("int64"),
                             "text": b["text"]})

    joined = exchange_join(
        docs.map_batches(docs_cast, batch_format="pandas"),
        packed.map_batches(offsets_only, batch_format="pandas"),
        on="doc_id", n_partitions=8,
    )

    def emit(b: pd.DataFrame, *, vocab_ref=vocab_ref) -> pd.DataFrame:
        v = ray.get(vocab_ref)
        out = {"doc_id": [], "bin": [], "pos_in_bin": [], "token_id": []}
        for d, t, off in zip(b["doc_id"], b["text"], b["start_offset"]):
            for pos, tok in enumerate(t.split()):
                g = int(off) + pos
                out["doc_id"].append(int(d))
                out["bin"].append(g // BUDGET)
                out["pos_in_bin"].append(g % BUDGET)
                out["token_id"].append(v.get(tok, -1))
        return pd.DataFrame(out).astype(
            {"doc_id": "int64", "bin": "int64", "pos_in_bin": "int64",
             "token_id": "int64"})

    return joined.map_batches(emit, batch_format="pandas")


def q_pipeline_curation(sf_dir: str):
    """End-to-end curation composite — the pipeline a training-data user
    actually runs, as ONE streaming job: quality gate (exact integer
    predicates: >=20 tokens, distinct ratio >= 0.5) -> exact dedup
    (keep-first by content) -> deterministic 80/10/10 split.  Stage
    boundaries stay lazy; the only exchange is the dedup hash aggregate
    (16-partition two-level).  Oracle composes the same three stages as
    CTEs."""
    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.analysis import _WORD

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def quality_gate(b: pd.DataFrame) -> pd.DataFrame:
        keep_ids, keep_txt = [], []
        for d, t in zip(b["doc_id"], b["text"]):
            toks = _WORD.findall(t.lower())
            if len(toks) >= 20 and 2 * len(set(toks)) >= len(toks):
                keep_ids.append(int(d))
                keep_txt.append(t)
        return pd.DataFrame({"doc_id": pd.Series(keep_ids, dtype="int64"),
                             "text": keep_txt})

    def hash_text(b: pd.DataFrame) -> pd.DataFrame:
        from ocr_ray.stages.dedup import add_content_hash

        return add_content_hash(b)[["doc_id", "content_hash"]]

    survivors = ds.map_batches(quality_gate, batch_format="pandas")
    kept = hash_aggregate(
        survivors.map_batches(hash_text, batch_format="pandas"),
        keys=["content_hash"], aggs={"doc_id": "min"}, n_partitions=None,
    )

    def assign_split(b: pd.DataFrame) -> pd.DataFrame:
        h = _id_hash32(b["doc_id"])
        bucket = (h % 100).astype("int64")
        return pd.DataFrame(
            {"doc_id": b["doc_id"].astype("int64"),
             "split": np.where(bucket < 80, "train",
                               np.where(bucket < 90, "val", "test"))}
        )

    return kept.map_batches(assign_split, batch_format="pandas")


def q_doc_bigram_fluency(sf_dir: str):
    """Corpus-LM fluency proxy with EXACT integer semantics: score each doc
    by how common its adjacent token bigrams are in the whole corpus
    (``fluency_sum`` = sum over the doc's bigram occurrences of that
    bigram's global count; ``n_pairs`` = the doc's bigram count).  The
    rare-bigram tail is what quality filters cut — and integers make the
    oracle value-exact (no float log-prob accumulation-order drift).

    Scale shape: one exchange BY BIGRAM (each partition owns its bigrams:
    global counts and the doc joins happen partition-locally — no broadcast
    of a vocab^2 table), then one exchange by doc_id to merge partial sums.
    """
    import pyarrow as pa

    from ocr_ray.stages.dedup import _concat_pd, _exchange

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        out = {"doc_id": [], "pair": [], "c": []}
        for d, t in zip(b["doc_id"], b["text"]):
            toks = _TERM.findall(t.lower())
            cnt = Counter(zip(toks, toks[1:]))
            for (a, bb), c in cnt.items():
                out["doc_id"].append(int(d))
                out["pair"].append(a + " " + bb)
                out["c"].append(c)
        return pd.DataFrame(out).astype({"doc_id": "int64", "c": "int64"})

    @ray.remote(num_cpus=0)
    def per_bigram(*pieces):
        g = _concat_pd(pieces)
        if not len(g):
            out = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                "fluency_sum": pd.Series([], dtype="int64"),
                                "n_pairs": pd.Series([], dtype="int64")})
            return pa.Table.from_pandas(out, preserve_index=False)
        tot = g.groupby("pair")["c"].transform("sum")
        g = g.assign(contrib=g["c"] * tot)
        part = g.groupby("doc_id", as_index=False).agg(
            fluency_sum=("contrib", "sum"), n_pairs=("c", "sum")
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    @ray.remote(num_cpus=0)
    def per_doc(*pieces):
        g = _concat_pd(pieces)
        out = g.groupby("doc_id", as_index=False).agg(
            fluency_sum=("fluency_sum", "sum"), n_pairs=("n_pairs", "sum")
        ) if len(g) else g
        return pa.Table.from_pandas(out.reset_index(drop=True),
                                    preserve_index=False)

    rows = docs.map_batches(explode, batch_format="pandas")
    P = 16
    psplit = _exchange(rows, "pair", P)
    part_refs = [per_bigram.remote(*[s[j] for s in psplit]) for j in range(P)]
    dsplit = _exchange(part_refs, "doc_id", P)
    out_refs = [per_doc.remote(*[s[j] for s in dsplit]) for j in range(P)]
    return rd.from_arrow_refs(out_refs)


QUANTILES = (0.25, 0.5, 0.75, 0.9, 0.99)


def q_doc_length_quantiles(sf_dir: str):
    """EXACT token-length quantiles without a global sort: per-batch partial
    histograms (length -> count) merged by the two-level hash aggregate
    (bounded cardinality — document lengths, not documents), then the order
    statistic read off the cumulative histogram on the driver (a table of
    distinct lengths, not rows).  value(q) = element at rank ceil(q*n),
    1-based — PERCENTILE_DISC semantics, no interpolation ambiguity."""
    import math

    from ocr_ray.stages.aggregate import hash_aggregate

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def lengths(b: pd.DataFrame) -> pd.DataFrame:
        n = b["text"].str.split().str.len().astype("int64")
        return pd.DataFrame({"token_len": n[n > 0]})

    hist = hash_aggregate(
        ds.map_batches(lengths, batch_format="pandas"),
        keys=["token_len"], aggs={"cnt": "count"}, n_partitions=8,
    ).to_pandas().sort_values("token_len").reset_index(drop=True)
    cum = hist["cnt"].cumsum().to_numpy()
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        # every text empty: the oracle returns no rows — match it instead
        # of IndexError'ing on the empty histogram
        return pd.DataFrame({"q": pd.Series(dtype="float64"),
                             "token_len": pd.Series(dtype="int64")})
    out = []
    for q in QUANTILES:
        rank = math.ceil(q * n)
        idx = int(np.searchsorted(cum, rank, side="left"))
        out.append((q, int(hist["token_len"].iloc[idx])))
    return pd.DataFrame(out, columns=["q", "token_len"]).astype(
        {"q": "float64", "token_len": "int64"}
    )


def q_doc_top_terms(sf_dir: str):
    """Global vocabulary top-50 (corpus term frequencies): per-batch partial
    Counter -> streaming hash-exchange aggregation on the term -> global
    sort + limit (count desc, term asc tie-break — deterministic at the
    cut)."""
    from ocr_ray.stages.aggregate import hash_aggregate

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: "Counter[str]" = Counter()
        for t in b["text"]:
            c.update(_TERM.findall(t.lower()))
        return pd.DataFrame(
            {"term": list(c.keys()), "n": pd.Series(list(c.values()), dtype="int64")}
        )

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
    counts = hash_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["term"], aggs={"n": "sum"}, n_partitions=None,
    )
    top = global_topk(counts, ["n", "term"], 50, descending=[True, False])
    top["n"] = top["n"].astype("int64")
    return top


_TERM = re.compile(r"[a-z0-9]+")


# ====================================================== inverted index
# AND-query probe terms: moderately selective on the synthetic vocabulary
# (13-15 matching docs at test scales, verified non-degenerate).
INDEX_LOOKUP_TERMS = ["spark", "vector", "dup"]


def q_doc_postings(sf_dir: str):
    """Inverted-index build (G4/R3 scale path): term-partitioned postings
    lists via the streaming hash exchange — the retrieval-tier analog of
    scanning every chunk per keyword query (src/rag_module.py's keyword
    scorer) rebuilt as a build-once index.  The max-df stop-term gate is
    disabled here (the synthetic vocabulary is ~31 terms with df up to
    ~83%, so any useful gate would empty the table); the gate itself is
    exercised in tests/test_index.py."""
    from ocr_ray.stages.index import build_postings

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    # warn_unbounded=False: the gate is disabled DELIBERATELY here (see
    # docstring) — acknowledge instead of emitting the misuse warning on
    # every oracle/bench run
    out = build_postings(ds, n_partitions=8,
                         warn_unbounded=False).to_pandas()
    return out.sort_values("term").reset_index(drop=True)


def q_index_lookup(sf_dir: str):
    """Conjunctive (AND) retrieval through the inverted index: probe only
    the query terms' postings rows (expression filter), intersect k sorted
    id lists driver-side — cost bounded by the smallest postings list, not
    the corpus."""
    from ocr_ray.stages.index import build_postings, conjunctive_lookup

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    post = build_postings(ds, n_partitions=8, warn_unbounded=False)
    ids = conjunctive_lookup(post, INDEX_LOOKUP_TERMS)
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64")})


# ================================================================ entities
_SYNTH_TAIL = "@example.com or call (555) 123-4567 on 12/31/2024 visit https://example.com/"
_NON_ALNUM = re.compile(r"[^A-Za-z0-9]")


def q_entities_customer(sf_dir: str):
    """Entity extraction (M11) exercised on synthesized contact lines derived
    from customer names (the base tables contain no entities)."""

    def batch_fn(b: pd.DataFrame) -> pd.DataFrame:
        out = {"c_custkey": [], "email": [], "phone": [], "date_found": [],
               "url": [], "n_emails": []}
        for ck, name in zip(b["c_custkey"], b["c_name"]):
            clean = _NON_ALNUM.sub("", name).lower()
            synth = f"Contact {clean}{_SYNTH_TAIL}{clean}"
            ents = extract_entities(synth)
            out["c_custkey"].append(int(ck))
            out["email"].append(ents["emails"][0] if ents["emails"] else "")
            out["phone"].append(ents["phones"][0] if ents["phones"] else "")
            out["date_found"].append(ents["dates"][0] if ents["dates"] else "")
            out["url"].append(ents["urls"][0] if ents["urls"] else "")
            out["n_emails"].append(len(ents["emails"]))
        return pd.DataFrame(out)

    ds = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
    )
    return ds.map_batches(batch_fn, batch_format="pandas")


_PII_TAIL = (" Contact user{d}@example.com or +1 (555) 123-4567 on 12/31/2024"
             " via https://example.com/u{d}")


def q_doc_pii_redact(sf_dir: str):
    """PII redaction — a first-class training-data scrubbing pass: the M11
    entity patterns applied as sequential replaces (url -> email -> phone ->
    dates) with per-category counts from the original text.  Inputs carry a
    deterministic synthesized PII tail (the base corpus has none).  Pure
    per-row map, no shuffle; patterns compiled once at module import."""
    from ocr_ray.functions.entities import redact_pii

    def batch_fn(b: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_id": [], "redacted": [], "n_urls": [], "n_emails": [],
               "n_phones": [], "n_dates": []}
        for d, t in zip(b["doc_id"], b["text"]):
            r = redact_pii(t + _PII_TAIL.format(d=int(d)))
            out["doc_id"].append(int(d))
            for k in ("redacted", "n_urls", "n_emails", "n_phones", "n_dates"):
                out[k].append(r[k])
        return pd.DataFrame(out)

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(batch_fn, batch_format="pandas")


# ================================================================ dedup
def q_dedup_exact(sf_dir: str):
    """Exact dedup: content-hash each row (vectorized), two-level hash
    aggregation (stages/aggregate.py), keep the lowest doc_id per distinct
    text.  Only the two needed columns leave storage; the hash leg drops
    the text before the exchange (16-byte keys move, not payloads)."""
    from ocr_ray.stages.aggregate import hash_aggregate

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def hash_only(b: pd.DataFrame) -> pd.DataFrame:
        return add_content_hash(b)[["doc_id", "content_hash"]]

    hashed = ds.map_batches(hash_only, batch_format="pandas")
    out = hash_aggregate(hashed, keys=["content_hash"],
                         aggs={"doc_id": "min"}, n_partitions=None)
    return out.select_columns(["doc_id"])


def q_dedup_jaccard(sf_dir: str):
    """All-pairs word-set Jaccard >= threshold.  The token-set matrix of the
    (small) right side is broadcast once via ray.put; the left side streams
    through map_batches doing one matmul per batch.  At scale the candidate
    set must come from MinHash-LSH (q_dedup_minhash) instead of all-pairs."""
    ds = _doc(sf_dir)
    # guard BEFORE materializing: count() is parquet-metadata-only, so the
    # cap actually prevents the driver blow-up it exists for
    _guard_allpairs(ds.count(), "dedup_jaccard", "dedup_minhash (LSH)")
    docs = ds.to_pandas()  # small side by design (dimension table)
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    m, sizes = build_token_matrix(list(docs["text"]))
    ids = docs["doc_id"].to_numpy()
    ref = ray.put((ids, m, sizes))

    def pairs_batch(b: pd.DataFrame) -> pd.DataFrame:
        all_ids, all_m, all_sizes = ray.get(ref)
        pos = np.searchsorted(all_ids, b["doc_id"].to_numpy())
        inter = all_m[pos] @ all_m.T
        union = all_sizes[pos][:, None] + all_sizes[None, :] - inter
        jac = inter / np.maximum(union, 1.0)
        li, ri = np.nonzero(
            (jac >= JACCARD_THRESHOLD) & (b["doc_id"].to_numpy()[:, None] < all_ids[None, :])
        )
        return pd.DataFrame(
            {
                "left_id": b["doc_id"].to_numpy()[li],
                "right_id": all_ids[ri],
                # floor(x*1e6+0.5) == DuckDB round() on these positive
                # ratios (np.round is ties-to-even: 125/128 would diverge)
                "jaccard": np.floor(
                    inter[li, ri].astype(np.float64)
                    / union[li, ri].astype(np.float64) * 1e6 + 0.5) / 1e6,
            }
        )

    return _doc(sf_dir).map_batches(pairs_batch, batch_format="pandas")


MINHASH_SHINGLE_K = 3


def q_dedup_minhash(sf_dir: str):
    """MinHash+LSH near-dup pairs over k-word shingles, verified by true
    shingle Jaccard — END-TO-END DISTRIBUTED (stages/dedup.py:
    minhash_dedup_pairs): shingle -> signature -> band explode -> bounded
    band groupby -> candidate pairs -> distributed pair dedupe -> hash-join
    texts on left_id/right_id -> per-partition verify.  No driver-side
    materialization of any full table.

    Shingles, not unigrams: unigram minhash saturates on a small shared
    vocabulary — every doc pair looks ~0.8-similar, band buckets degenerate
    to the whole table and candidate generation explodes quadratically
    (observed 48M pairs on the 5k-doc table).  Shingle sets of unrelated
    docs are near-disjoint, so buckets hold only true near-dups (the
    standard design in training-data dedup, cf. Lee et al. 2022)."""
    from ocr_ray.stages.dedup import minhash_dedup_pairs

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return minhash_dedup_pairs(
        docs, n_perm=64, n_bands=16, shingle_k=MINHASH_SHINGLE_K,
        threshold=JACCARD_THRESHOLD, n_partitions=None,
    )


def q_dedup_minhash_est(sf_dir: str):
    """Signature-verified MinHash near-dup pairs — the SCALE variant of
    dedup_minhash (rows-only by design: ``jaccard_est`` is the
    matching-permutation fraction, a genuinely approximate statistic the
    SQL oracle cannot replicate cheaply).  The attach exchanges ship
    8*n_perm-byte signatures instead of document texts, bounding verify
    traffic at O(pairs x 512 B) — measured 33 s for 5.15M candidates
    over 100k templated conversations where exact verify's
    O(pairs x text) was disk/OOM-fatal.  Pair-set agreement with the
    exact path and estimator error bounds are pinned by
    tests/test_round4_fixes.py::test_minhash_estimate_verify."""
    from ocr_ray.stages.dedup import minhash_dedup_pairs

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    # threshold relaxed one estimator-sigma below the exact gate so a
    # true near-dup at the boundary isn't dropped by +/-1-perm noise
    return minhash_dedup_pairs(
        docs, n_perm=64, n_bands=16, shingle_k=MINHASH_SHINGLE_K,
        threshold=JACCARD_THRESHOLD - 0.05, n_partitions=None,
        verify="estimate",
    )


def q_dedup_simhash(sf_dir: str):
    """SimHash near-dup: docs unioned with mutated copies (doc_id+1_000_000,
    last word dropped — deterministic positives), 62-bit SQL-replicable
    polynomial-hash signatures (stages/dedup.py:PolySimHasher), 10-band
    bucketing, then the fully distributed verify (simhash_dedup_pairs) —
    candidates hash-join the (id, simhash) side table on left_id/right_id
    and each partition verifies Hamming <= 9 vectorized.  Because
    max_hamming = n_bands - 1, pigeonhole guarantees every qualifying pair
    shares a band: the output provably EQUALS the all-pairs Hamming filter,
    which is exactly what the DuckDB oracle recomputes (value-checked, not
    rows-only).  No driver-side signature lookup."""
    from ocr_ray.stages.dedup import simhash_dedup_pairs

    def mutate(b: pd.DataFrame) -> pd.DataFrame:
        keep = (b["doc_id"] % 10 == 0) & (
            b["text"].str.split().str.len() >= 2
        )
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"][keep] + 1_000_000,
                "text": [" ".join(t.split()[:-1]) for t in b["text"][keep]],
            }
        )

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    both = docs.union(docs.map_batches(mutate, batch_format="pandas"))
    return simhash_dedup_pairs(both, n_partitions=None)


def q_dedup_clusters(sf_dir: str):
    """Duplicate clusters: MinHash+LSH near-dup pairs (the oracle-checked
    distributed path) fed into iterative min-label connected components
    (stages/dedup.py:connected_components — per-round raw-task label
    exchange, driver sees only changed-counts).  Output: every doc in a
    near-dup pair labeled with the minimum doc_id of its component — the
    canonical "keep one representative per cluster" step of training-data
    dedup."""
    from ocr_ray.stages.dedup import connected_components, minhash_dedup_pairs

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    pairs = minhash_dedup_pairs(
        docs, n_perm=64, n_bands=16, shingle_k=MINHASH_SHINGLE_K,
        threshold=JACCARD_THRESHOLD, n_partitions=None,
    )
    return connected_components(pairs, n_partitions=8)


def q_dedup_keep(sf_dir: str):
    """Near-dup dedup SURVIVORS — the doc_ids a curation run actually keeps
    after collapsing every MinHash near-dup cluster to its minimum-id
    representative (the "remove duplicates" step of training-data curation,
    cf. Lee et al. 2022 §4; reference analog: the result-cache keep-first
    semantics, ocr_app/utils/result_cache.py).

    Fully distributed: pairs (minhash_dedup_pairs) -> connected components
    (per-round raw-task label exchange) -> hash-exchange ANTI-join of the
    non-representative ids against the doc-id column
    (stages/dedup.py:keep_representatives).  The removed set never lands
    on the driver."""
    from ocr_ray.stages.dedup import (
        connected_components,
        keep_representatives,
        minhash_dedup_pairs,
    )

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    pairs = minhash_dedup_pairs(
        docs, n_perm=64, n_bands=16, shingle_k=MINHASH_SHINGLE_K,
        threshold=JACCARD_THRESHOLD, n_partitions=None,
    )
    clusters = connected_components(pairs, n_partitions=8)
    return keep_representatives(docs, clusters, n_partitions=None)


def q_doc_source_stats(sf_dir: str):
    """Per-source corpus health report (the RefinedWeb/CCNet-style
    "which domains are worth keeping" table): document count, total
    characters, distinct languages, and corpus-wide duplicate count per
    ``source``.

    Two bounded exchanges, no driver state: (1) vectorized content hash,
    exchange by hash — each partition sees every copy of a text, so the
    global duplicate flag is a local groupby-size; rows are then
    pre-aggregated to (source, lang) combiners BEFORE the second exchange,
    so (2) the source exchange moves only source×lang rows (bounded by
    #sources × #languages, not by corpus size)."""
    from ocr_ray.stages.join import exchange_map_partitions

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["text", "source", "lang", "n_chars"],
    )

    def hash_keep(b: pd.DataFrame) -> pd.DataFrame:
        b = add_content_hash(b)
        return b[["content_hash", "source", "lang", "n_chars"]]

    hashed = ds.map_batches(hash_keep, batch_format="pandas")

    def mark_and_combine(g: pd.DataFrame) -> pd.DataFrame:
        dup = g.groupby("content_hash")["content_hash"].transform("size") > 1
        g = pd.DataFrame(
            {
                "source": g["source"],
                "lang": g["lang"],
                "n_chars": g["n_chars"].astype("int64"),
                "is_dup": dup.astype("int64"),
            }
        )
        return g.groupby(["source", "lang"], as_index=False).agg(
            n_docs=("is_dup", "size"),
            sum_chars=("n_chars", "sum"),
            n_dup_docs=("is_dup", "sum"),
        )

    combined = exchange_map_partitions(
        hashed, "content_hash", mark_and_combine, n_partitions=None
    )

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("source", as_index=False).agg(
            n_docs=("n_docs", "sum"),
            sum_chars=("sum_chars", "sum"),
            n_langs=("lang", "nunique"),
            n_dup_docs=("n_dup_docs", "sum"),
        )
        for c in ("n_docs", "sum_chars", "n_langs", "n_dup_docs"):
            out[c] = out[c].astype("int64")
        return out

    return exchange_map_partitions(combined, "source", per_source, n_partitions=8)


def q_doc_novelty(sf_dir: str):
    """Per-doc shingle novelty (stages/dedup.py:shingle_novelty): fraction
    of the doc's distinct 3-word shingles first seen (min doc_id) in this
    doc.  Shingle-hash exchange + per-doc partial sums; the oracle
    recomputes the identical 62-bit polynomial hashes in SQL."""
    from ocr_ray.stages.dedup import shingle_novelty

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return shingle_novelty(docs, shingle_k=3, n_partitions=None)


def q_corpus_distinct_sketch(sf_dir: str):
    """KMV distinct-shingle sketch (stages/aggregate.py:
    kmv_distinct_shingles): bounded-memory approximate distinct count whose
    estimate is a deterministic function of the k-th smallest mixed hash —
    value-checked by DuckDB recomputing the identical sketch."""
    from ocr_ray.stages.aggregate import kmv_distinct_shingles

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    return kmv_distinct_shingles(docs, k=256)


def q_doc_shuffle(sf_dir: str):
    """Deterministic global shuffle (stages/shuffle.py): exact global rank
    under ORDER BY (mixed 62-bit hash, id) via bucket-count pass + hash
    exchange — reproducible training order with no random_shuffle
    materialization and no sort's range-sampling shuffle."""
    from ocr_ray.stages.shuffle import deterministic_shuffle

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    return deterministic_shuffle(docs, n_buckets=64, n_partitions=8)


def q_doc_pack(sf_dir: str):
    """Sequence packing (stages/shuffle.py:deterministic_pack): exact
    distributed prefix-sum of token counts in deterministic-shuffle order
    assigns each doc its concat-and-chunk training bin — two streaming
    passes, no sort, no materialization."""
    from ocr_ray.stages.shuffle import deterministic_pack

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return deterministic_pack(docs, budget=1024, n_buckets=64, n_partitions=8)


def q_dedup_incremental(sf_dir: str):
    """Incremental shard-vs-corpus dedup (stages/dedup.py:
    incremental_containment): shingle-containment of the src19 shard
    against the rest of the corpus — the crawl-refresh primitive (score
    new docs against existing corpus state without re-clustering it)."""
    from ocr_ray.stages.dedup import incremental_containment

    path = os.path.join(sf_dir, "documents.parquet")
    corpus = rd.read_parquet(path, columns=["text", "source"]).filter(
        expr="source != 'src19'"
    )
    shard = rd.read_parquet(path, columns=["doc_id", "text", "source"]).filter(
        expr="source == 'src19'"
    )
    return incremental_containment(corpus, shard, threshold=0.8,
                                   n_partitions=8)


def q_corpus_hll(sf_dir: str):
    """HyperLogLog distinct-term sketch (stages/aggregate.py:
    hll_distinct_terms): fixed 256-register state, order-free maxima, the
    estimate a deterministic function of the registers — value-checked
    against DuckDB recomputing the full sketch."""
    from ocr_ray.stages.aggregate import hll_distinct_terms

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["text"])
    return hll_distinct_terms(ds)


def q_dedup_bloom(sf_dir: str):
    """Bloom-filter corpus membership (stages/bloom.py): the src19 shard
    screened against an m-bit filter of the rest of the corpus's
    whole-doc 62-bit content keys.  Filter state is fixed-size (m bits)
    regardless of corpus size; the oracle replicates keys, probes and the
    membership test exactly — false positives included."""
    from ocr_ray.stages.bloom import bloom_screen

    path = os.path.join(sf_dir, "documents.parquet")
    corpus = rd.read_parquet(path, columns=["text", "source"]).filter(
        expr="source != 'src19'"
    )
    shard = rd.read_parquet(path, columns=["doc_id", "text", "source"]).filter(
        expr="source == 'src19'"
    )
    return bloom_screen(corpus, shard)


def q_pipeline_refresh(sf_dir: str):
    """Crawl-refresh composite, one streaming pass over the new shard:
    Bloom-screen src19 against the corpus filter (drop docs already in the
    corpus), Gopher-gate the fresh ones (min_stop_hits=1, corpus note in
    q_doc_gopher), assign the survivors a train/val/test split by the
    deterministic id hash.  The corpus ships as the fixed m-bit bitmask
    (ray.put once); the shard pass is a single stateless map — at 100 TB
    the refresh cost is one corpus summary pass + one shard pass, no
    shuffle, no join."""
    from ocr_ray.stages.analysis import gopher_rules_batch
    from ocr_ray.stages.bloom import bloom_positions, build_bloom, doc_key62

    path = os.path.join(sf_dir, "documents.parquet")
    corpus = rd.read_parquet(path, columns=["text", "source"]).filter(
        expr="source != 'src19'"
    )
    shard = rd.read_parquet(path, columns=["doc_id", "text", "source"]).filter(
        expr="source == 'src19'"
    )
    bits_ref = ray.put(build_bloom(corpus))

    def refresh(b: pd.DataFrame, *, bits_ref=bits_ref) -> pd.DataFrame:
        bits = ray.get(bits_ref)
        g = gopher_rules_batch(
            pd.DataFrame({"doc_id": b["doc_id"], "text": b["text"]}),
            min_stop_hits=1,
        )
        fresh = np.array(
            [not all(bits[p] for p in bloom_positions(doc_key62(t)))
             for t in b["text"]], dtype=bool,
        )
        mask = fresh & g["keep"].to_numpy()
        ids = b["doc_id"].to_numpy().astype("int64")[mask]
        bucket = _id_hash32(ids) % 100
        split = np.where(bucket < 80, "train",
                         np.where(bucket < 90, "val", "test")).tolist()
        # emit Arrow: pandas string columns of possibly-zero length trip
        # Ray's block-size estimator (harmless but noisy log per batch)
        import pyarrow as pa

        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "split": pa.array(split, pa.string())})

    return shard.map_batches(refresh, batch_format="pandas")


def q_embed_kmeans(sf_dir: str):
    """Exact-integer distributed k-means (stages/cluster.py): quantized
    Lloyd iterations whose full trajectory is bit-identical across
    partitionings — the SemDeDup cluster-then-curate primitive.  k=8,
    2 update iterations, assignment to the final centroids."""
    from ocr_ray.stages.cluster import kmeans_embeddings

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    return kmeans_embeddings(ds, k=8, iters=2, n_partitions=4)


def q_embed_topics(sf_dir: str):
    """Cluster labeling — the report a curation run reads after
    clustering: top-3 terms per k-means cluster (embeddings cluster via
    the exact-integer Lloyd path of q_embed_kmeans; the 1:1 vec_id ->
    doc_id mapping joins assignments to document text through one key
    exchange; term counts reduce per (cluster, term); the final grouped
    top-k is a bounded per-cluster sort with deterministic (n desc,
    term asc) ties).  Because the k-means trajectory is bit-exact, even
    this two-model composite is value-checked end to end."""
    from collections import Counter

    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.cluster import kmeans_embeddings
    from ocr_ray.stages.join import exchange_join, exchange_map_partitions

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    assigns = kmeans_embeddings(emb, k=8, iters=2, n_partitions=4)

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    j = exchange_join(
        docs,
        assigns.map_batches(
            lambda b: b[["vec_id", "cluster"]], batch_format="pandas"),
        on="doc_id", right_on="vec_id", n_partitions=8,
    )

    def term_partial(b: pd.DataFrame) -> pd.DataFrame:
        counts: Dict[int, "Counter[str]"] = {}
        for c, t in zip(b["cluster"], b["text"]):
            counts.setdefault(int(c), Counter()).update(_TERM.findall(t.lower()))
        rows = [(c, term, n) for c, ctr in counts.items()
                for term, n in ctr.items()]
        return pd.DataFrame({
            "cluster": pd.Series([r[0] for r in rows], dtype="int64"),
            "term": [r[1] for r in rows],
            "n": pd.Series([r[2] for r in rows], dtype="int64"),
        })

    counts = hash_aggregate(j.map_batches(term_partial, batch_format="pandas"),
                            keys=["cluster", "term"], aggs={"n": "sum"},
                            n_partitions=8)

    def top3(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            # typed empty: a raw empty frame round-trips 'term' to Arrow
            # null type and destabilizes the Dataset's unified schema
            return pd.DataFrame({"cluster": pd.Series([], dtype="int64"),
                                 "term": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        g = g.sort_values(["cluster", "n", "term"],
                          ascending=[True, False, True], kind="mergesort")
        out = g.groupby("cluster").head(3).copy()
        out["cluster"] = out["cluster"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    return exchange_map_partitions(counts, "cluster", top3, n_partitions=4)


def q_doc_rank_len(sf_dir: str):
    """Exact global order statistics without a sort (stages/shuffle.py:
    value_rank): rank + percentile of every doc by n_chars via monotone
    value-range buckets — top-X% selection / curriculum ordering at
    corpus scale."""
    from ocr_ray.stages.shuffle import value_rank

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )
    return value_rank(docs, "n_chars", n_buckets=256, n_partitions=8)


def q_doc_mix(sf_dir: str):
    """Deterministic mixture resampling (stages/sample.py): fit the corpus
    to a target language mixture (en 40 / de 15 / fr 15 / es 15 / zh 15
    parts) with integer-exact per-group keep rates and the multiplicative
    id hash — no RNG, no shuffle, no upsampling."""
    from ocr_ray.stages.sample import mixture_resample

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )
    return mixture_resample(docs, MIX_WEIGHTS, group_col="lang")


def q_doc_dsir(sf_dir: str):
    """DSIR-style importance scoring (stages/dsir.py, arXiv:2302.03169):
    fit hashed unigram tables on a TARGET slice (lang='en' — the
    Wikipedia-analog) and the full RAW pool, score every doc by its
    integer target/raw frequency ratio.  keep gates at 370000 ppm (the
    sf0.001 corpus median; absolute ratio scores shift with the target
    fraction, so real selection uses dsir_select's exact rank cut)."""
    import pyarrow.dataset as pads

    from ocr_ray.stages.dsir import dsir_score

    path = os.path.join(sf_dir, "documents.parquet")
    raw = rd.read_parquet(path, columns=["doc_id", "text"])
    target = rd.read_parquet(path, columns=["doc_id", "text"],
                             filter=pads.field("lang") == "en")
    return dsir_score(raw, target, threshold_ppm=370_000, n_partitions=8)


def q_dsir_select(sf_dir: str):
    """Importance RESAMPLING end-to-end: DSIR ratio scores chained into
    the exact value-rank order statistics (stages/shuffle.py:value_rank)
    and cut at the top quartile — 'take the 25% of the pool most like
    the target corpus', the DSIR selection step with a deterministic
    exact-rank cut instead of Gumbel sampling."""
    import pyarrow.dataset as pads

    from ocr_ray.stages.dsir import dsir_score
    from ocr_ray.stages.shuffle import value_rank

    path = os.path.join(sf_dir, "documents.parquet")
    raw = rd.read_parquet(path, columns=["doc_id", "text"])
    target = rd.read_parquet(path, columns=["doc_id", "text"],
                             filter=pads.field("lang") == "en")
    scored = dsir_score(raw, target, n_partitions=8).map_batches(
        lambda b: b[["doc_id", "dsir_ppm"]], batch_format="pandas")
    ranked = value_rank(scored, "dsir_ppm", n_buckets=256, n_partitions=8)
    return ranked.filter(expr="pctile >= 0.75")


def q_corpus_countmin(sf_dir: str):
    """CountMin frequency sketch (stages/aggregate.py:countmin_sketch,
    Cormode & Muthukrishnan 2005): one bounded-memory streaming pass
    builds the d x w counter table (cells are sums -> partition-order
    independent, bit-exact); point-estimate the exact top-20 terms
    through it.  Output (term, n exact, n_est sketch) — n_est >= n with
    the classic eps*N overestimate bound; both columns value-checked."""
    from ocr_ray.stages.aggregate import (countmin_estimate, countmin_sketch,
                                          hash_aggregate)

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["text"])
    sketch = countmin_sketch(ds, n_partitions=8).to_pandas()

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: "Counter[str]" = Counter()
        for t in b["text"]:
            c.update(_TERM.findall(t.lower()))
        return pd.DataFrame(
            {"term": list(c.keys()),
             "n": pd.Series(list(c.values()), dtype="int64")}
        )

    counts = hash_aggregate(ds.map_batches(partial, batch_format="pandas"),
                            keys=["term"], aggs={"n": "sum"}, n_partitions=8)
    top = global_topk(counts, ["n", "term"], 20, descending=[True, False])
    top["n"] = top["n"].astype("int64")
    top["n_est"] = countmin_estimate(sketch, top["term"]).to_numpy()
    return top


def q_corpus_heavy_hitters(sf_dir: str):
    """Exact frequency-threshold heavy hitters (count*k > N, k=64) via
    Misra-Gries candidate summaries + an exact verify pass
    (stages/aggregate.py:heavy_hitters — the provable-superset two-pass
    plan).  Approximate machinery, EXACT deterministic output: the
    oracle is the plain SQL threshold query."""
    from ocr_ray.stages.aggregate import heavy_hitters

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["text"])
    return heavy_hitters(ds, k=64, n_partitions=8)


def q_doc_sample_weighted(sf_dir: str):
    """Deterministic weighted (probability-proportional-to-size) sample —
    priority sampling (Duffield, Lund & Thorup 2007) with a hash-derived
    priority: u = multiplicative hash of doc_id (uniform in [0, 2^32)),
    priority = (u * 2^20) // max(n_chars, 1), take the 100 smallest.
    P(priority < t) grows with n_chars, so inclusion probability is
    ~proportional to document length; all arithmetic is int64-exact
    (u*2^20 <= 2^52), so the sample is reproducible across engines, runs
    and partitionings — no RNG state, no shuffle.  Per-batch top-100
    bounds what leaves each block; the global merge sorts <= 100 x
    n_blocks candidate rows."""
    K = 100

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].astype("int64")
        u = _id_hash32(ids)
        w = np.maximum(b["n_chars"].astype("int64"), 1)
        pri = (u * (1 << 20)) // w
        out = pd.DataFrame({"doc_id": ids, "priority": pri.astype("int64")})
        return out.nsmallest(K, ["priority", "doc_id"])

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "n_chars"])
    out = global_topk(ds.map_batches(partial, batch_format="pandas"),
                      ["priority", "doc_id"], K, descending=False)
    out["doc_id"] = out["doc_id"].astype("int64")
    out["priority"] = out["priority"].astype("int64")
    return out[["doc_id", "priority"]]


def q_dedup_exact_normalized(sf_dir: str):
    """Normalization-keyed exact dedup — 'fuzzy-exact': casefold +
    collapse every non-alphanumeric run to one space before hashing, so
    byte-different but content-identical docs (case, punctuation,
    whitespace variants) collapse into one group.  Same distributed
    shape as dedup_exact: only 16-byte hashes of the NORMALIZED text
    move through the exchange; output is the per-group keeper (min
    doc_id) + variant count."""
    import hashlib

    from ocr_ray.stages.aggregate import hash_aggregate

    norm = re.compile(r"[^a-z0-9]+")

    def hash_norm(b: pd.DataFrame) -> pd.DataFrame:
        t = [norm.sub(" ", x.lower()).strip() for x in b["text"]]
        return pd.DataFrame({
            "h": [hashlib.sha256(x.encode()).hexdigest()[:16] for x in t],
            "doc_id": b["doc_id"].astype("int64"),
            "n_variants": np.int64(1),
        })

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    out = hash_aggregate(
        ds.map_batches(hash_norm, batch_format="pandas"),
        keys=["h"], aggs={"doc_id": "min", "n_variants": "sum"},
        n_partitions=None,
    ).to_pandas()
    for c in ("doc_id", "n_variants"):
        out[c] = out[c].astype("int64")
    return (out.sort_values("doc_id").reset_index(drop=True)
            [["doc_id", "n_variants"]])


def q_doc_langid_confusion(sf_dir: str):
    """Detector-evaluation confusion matrix: (true lang, detected lang)
    counts over the whole corpus — the quality-control readout every
    langid gate needs.  The detector is the oracle-checked stopword
    profiler (stages/analysis.py:langid_docs_batch semantics); the
    matrix reduces through per-batch combiners, so the exchange carries
    at most |langs|^2 rows per block."""
    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.analysis import langid_docs_batch

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = langid_docs_batch(b[["doc_id", "text"]])
        d = pd.DataFrame({"lang": b["lang"].to_numpy(),
                          "detected": g["lang_guess"].to_numpy(),
                          "n": np.int64(1)})
        return d.groupby(["lang", "detected"], as_index=False)[["n"]].sum()

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "lang", "text"])
    out = hash_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["lang", "detected"], aggs={"n": "sum"}, n_partitions=2,
    ).to_pandas()
    out["n"] = out["n"].astype("int64")
    return (out.sort_values(["lang", "detected"], kind="mergesort")
            .reset_index(drop=True))


def q_io_partitioned_roundtrip(sf_dir: str):
    """Hive-partitioned write + partition-pruned read: documents write
    under /tmp partitioned by lang (``write_parquet(partition_cols=...)``
    — one directory per key, the resumable/selective layout), then the
    'de' slice reads back by opening ONLY its directory — physical
    partition pruning, zero bytes of any other language touched.  The
    aggregate is value-checked against the unpartitioned table."""
    import hashlib
    import shutil

    tag = hashlib.blake2b(sf_dir.encode(), digest_size=6).hexdigest()
    out_dir = f"/tmp/ocr_ray_part_{tag}"
    shutil.rmtree(out_dir, ignore_errors=True)

    rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id", "lang", "n_chars"]) \
        .write_parquet(out_dir, partition_cols=["lang"])

    sel = rd.read_parquet(os.path.join(out_dir, "lang=de"))

    def agg(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_docs": [np.int64(len(b))],
            "sum_chars": [np.int64(b["n_chars"].astype("int64").sum())],
        })

    out = sel.map_batches(agg, batch_format="pandas").to_pandas()
    return pd.DataFrame({
        "n_docs": [np.int64(out["n_docs"].sum())],
        "sum_chars": [np.int64(out["sum_chars"].sum())],
    })


def q_doc_source_distinct_hll(sf_dir: str):
    """Per-source distinct-vocabulary HLL (stages/aggregate.py:
    hll_distinct_terms_by — the grouped-sketch pattern: registers keyed
    by (source, bucket) are the whole aggregation state, one bounded
    exchange, never a (source, term) shuffle).  Same mix/estimator as
    corpus_hll, so the oracle replicates it per group exactly,
    register-for-register."""
    from ocr_ray.stages.aggregate import hll_distinct_terms_by

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["source", "text"])
    return hll_distinct_terms_by(ds, "source", n_partitions=8)


def q_events_top_users_per_type(sf_dir: str):
    """Grouped top-N (top-3 users per event_type by event count, ties by
    user_id) — the per-category leaderboard shape: per-(type, user)
    counts reduce through the streaming hash aggregate, then ONE bounded
    type-keyed exchange finishes the per-group head(3); nothing but the
    (type, user) count table ever moves."""
    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_map_partitions

    def cnt(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"].notna() & b["user_id"].notna()]
        b = b.assign(n=np.int64(1))
        return b.groupby(["event_type", "user_id"], as_index=False)[["n"]].sum()

    counts = hash_aggregate(
        rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                        columns=["event_type", "user_id"])
        .map_batches(cnt, batch_format="pandas"),
        keys=["event_type", "user_id"], aggs={"n": "sum"},
        n_partitions=None,
    )

    def head3(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "event_type" not in g.columns:
            return pd.DataFrame({"event_type": pd.Series(dtype="object"),
                                 "user_id": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        return (g.sort_values(["event_type", "n", "user_id"],
                              ascending=[True, False, True],
                              kind="mergesort")
                .groupby("event_type", as_index=False, sort=False).head(3))

    out = exchange_map_partitions(counts, "event_type", head3,
                                  n_partitions=None).to_pandas()
    out["n"] = out["n"].astype("int64")
    return (out.sort_values(["event_type", "n", "user_id"],
                            ascending=[True, False, True], kind="mergesort")
            .reset_index(drop=True)[["event_type", "user_id", "n"]])


def q_orders_cumulative(sf_dir: str):
    """Per-customer running order total (cumulative SUM OVER) — one
    custkey exchange, then a vectorized groupby-cumsum per partition; the
    canonical per-entity prefix-sum feature (account balance, lifetime
    spend) without any global sort."""
    from ocr_ray.stages.join import exchange_map_partitions

    def cum(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "o_custkey" not in g.columns:
            return pd.DataFrame({"o_orderkey": pd.Series(dtype="int64"),
                                 "o_custkey": pd.Series(dtype="int64"),
                                 "run_cents": pd.Series(dtype="int64")})
        g = g.assign(cents=np.floor(
            g["o_totalprice"] * 100 + 0.5).astype("int64"))
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                          kind="mergesort")
        g["run_cents"] = g.groupby("o_custkey")["cents"].cumsum()
        out = g[["o_orderkey", "o_custkey", "run_cents"]].copy()
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    return exchange_map_partitions(ds, "o_custkey", cum, n_partitions=None)


def q_io_csv_roundtrip(sf_dir: str):
    """CSV source/sink integration (S5 writer-family analog alongside
    io_jsonl_roundtrip): a projected event slice writes to CSV under
    /tmp, reads back via ray.data.read_csv, and aggregates — proving the
    text-format round trip preserves values exactly (integer and string
    columns only: CSV float formatting is not contractual)."""
    import hashlib

    from ocr_ray.stages.aggregate import hash_aggregate

    tag = hashlib.blake2b(sf_dir.encode(), digest_size=6).hexdigest()
    out_dir = f"/tmp/ocr_ray_csv_{tag}"

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "event_type"])

    def proj(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"].notna()]
        return pd.DataFrame({"event_id": b["event_id"].astype("int64"),
                             "event_type": b["event_type"].astype(str)})

    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    ds.map_batches(proj, batch_format="pandas").write_csv(out_dir)

    back = rd.read_csv(out_dir)

    def agg(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(n=np.int64(1),
                     sum_id=b["event_id"].astype("int64"))
        return b.groupby("event_type", as_index=False)[["n", "sum_id"]].sum()

    out = hash_aggregate(
        back.map_batches(agg, batch_format="pandas"),
        keys=["event_type"], aggs={"n": "sum", "sum_id": "sum"},
        n_partitions=2,
    ).to_pandas()
    for c in ["n", "sum_id"]:
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def q_events_dedup(sf_dir: str):
    """Windowed event dedup — the streaming idempotency primitive: drop
    an event when the PREVIOUS event of the same (user_id, event_type)
    lies within 300 s (retry storms, at-least-once delivery).  One
    user-keyed exchange; inside each partition the gap test is a single
    vectorized shift-compare over the (user, type, ts, event_id)-sorted
    frame — LAG semantics, exact.  Null event_type rows are dirty input
    and excluded (the data-contract gate's job, same convention as
    events_daily_filled)."""
    from ocr_ray.stages.join import exchange_map_partitions

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_id", "user_id", "event_type"]
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "user_id": pd.Series(dtype="object"),
                                 "event_type": pd.Series(dtype="object")})
        g = g[g["event_type"].notna()]
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"],
                          kind="mergesort")
        same = (g["user_id"].eq(g["user_id"].shift())
                & g["event_type"].eq(g["event_type"].shift()))
        gap = (g["ts"] - g["ts"].shift()).dt.total_seconds()
        keep = ~same | (gap > 300)
        out = g.loc[keep, cols].copy()
        out["event_id"] = out["event_id"].astype("int64")
        return out

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "event_type", "ts"],
    )
    return exchange_map_partitions(ds, "user_id", dedup_part,
                                   n_partitions=None)


def q_lineitems_top_customers(sf_dir: str):
    """Selective big-side join through the Bloom prefilter
    (stages/join.py:bloom_pruned_join — sideways information passing):
    the top-10 customers' orderkeys (a sliver of the order stream) are
    summarized into a fixed-size broadcast Bloom mask, and lineitem rows
    failing the probes are dropped INSIDE the scan stage — the exchange
    ships only (matches + rare false positives) instead of the whole
    lineitem table.  Revenue per top customer, exact."""
    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import bloom_pruned_join

    def total_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(t=np.floor(
            b["o_totalprice"] * 100 + 0.5).astype("int64"))
        return b.groupby("o_custkey", as_index=False)[["t"]].sum()

    totals = hash_aggregate(
        rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                        columns=["o_custkey", "o_totalprice"])
        .map_batches(total_partial, batch_format="pandas"),
        keys=["o_custkey"], aggs={"t": "sum"}, n_partitions=None,
    )
    totals = global_topk(totals, ["t", "o_custkey"], 10,
                         descending=[True, False])
    top = set(totals["o_custkey"].astype("int64"))

    sel = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
    ).map_batches(lambda b, _t=top: b[b["o_custkey"].isin(_t)],
                  batch_format="pandas")

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    j = bloom_pruned_join(li, sel, on="l_orderkey", right_on="o_orderkey",
                          n_partitions=None)

    def rev_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(
            revenue_cents=np.floor(
                b["l_extendedprice"] * (1 - b["l_discount"]) * 100 + 0.5
            ).astype("int64"),
            n_items=np.int64(1),
        )
        return b.groupby("o_custkey", as_index=False)[
            ["revenue_cents", "n_items"]].sum()

    out = hash_aggregate(
        j.map_batches(rev_partial, batch_format="pandas"),
        keys=["o_custkey"], aggs={"revenue_cents": "sum", "n_items": "sum"},
        n_partitions=2,
    ).to_pandas()
    out["c_custkey"] = out["o_custkey"].astype("int64")
    for c in ["revenue_cents", "n_items"]:
        out[c] = out[c].astype("int64")
    return (out.sort_values(["revenue_cents", "c_custkey"],
                            ascending=[False, True], kind="mergesort")
            .reset_index(drop=True)[["c_custkey", "revenue_cents", "n_items"]])


def q_doc_sample_per_source(sf_dir: str):
    """Deterministic per-group sampling — k=20 docs per source by the
    multiplicative id hash: each batch keeps at most k rows per source
    it sees (bounded combiner), one tiny exchange keyed on source
    finishes with the exact per-group top-k.  The grouped analog of
    doc_sample_weighted: quota sampling for dataset curation (equal
    representation per source regardless of source size), reproducible
    across runs and partitionings."""
    from ocr_ray.stages.join import exchange_map_partitions

    K = 20

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].astype("int64")
        out = pd.DataFrame({
            "doc_id": ids,
            "source": b["source"],
            "h": _id_hash32(ids),
        })
        return (out.sort_values(["h", "doc_id"], kind="mergesort")
                .groupby("source", as_index=False, sort=False).head(K))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "source" not in g.columns:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "source": pd.Series(dtype="object"),
                                 "h": pd.Series(dtype="int64")})
        return (g.sort_values(["h", "doc_id"], kind="mergesort")
                .groupby("source", as_index=False, sort=False).head(K))

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "source"])
    out = exchange_map_partitions(
        ds.map_batches(partial, batch_format="pandas"),
        "source", finish, n_partitions=None,
    ).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["h"] = out["h"].astype("int64")
    return (out.sort_values(["source", "h", "doc_id"], kind="mergesort")
            .reset_index(drop=True)[["source", "doc_id", "h"]])


def _events_enriched_impl(sf_dir: str, join_fn, **join_kw):
    """Shared body of events_enriched / events_enriched_adaptive: the
    two queries differ ONLY in the join strategy (salt-and-replicate vs
    adaptive dispatch); one impl keeps the enrichment shape (partial
    agg, pruned key scan, dtype casts) from drifting between them."""
    from ocr_ray.stages.aggregate import hash_aggregate

    keys = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id"])

    def cnt(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(user_total=np.int64(1))
        return b.groupby("user_id", as_index=False)[["user_total"]].sum()

    totals = hash_aggregate(
        rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                        columns=["user_id"])
        .map_batches(cnt, batch_format="pandas"),
        keys=["user_id"], aggs={"user_total": "sum"}, n_partitions=None,
    )

    events = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_id", "user_id"])
    out = join_fn(events, totals, on="user_id", n_partitions=None,
                  k=16, left_key_source=keys, **join_kw).to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    out["user_total"] = out["user_total"].astype("int64")
    return out[["event_id", "user_id", "user_total"]]


def q_events_enriched(sf_dir: str):
    """Row-level enrichment with a per-key aggregate through the
    SKEW-AWARE join (stages/join.py:skew_join): per-user totals reduce
    over a user_id-only pruned scan, then the full event stream joins
    them with Misra-Gries hot-key detection + salt-and-replicate — hot
    users scatter across all merge tasks instead of serializing one.
    On web-scale event logs a single bot/service account routinely holds
    percent-level row share; this is the join that survives it."""
    from ocr_ray.stages.join import skew_join

    return _events_enriched_impl(sf_dir, skew_join)


def q_events_enriched_adaptive(sf_dir: str):
    """The same per-user enrichment through the ADAPTIVE join
    (stages/join.py:adaptive_join): one Misra-Gries probe, then plain
    exchange below the measured skew crossover (the case here — oracle
    tables are far under 50M hot rows) and salt-and-replicate above it
    or when the hot partition would not fit a worker's heap.  Join
    semantics are strategy-independent, so the oracle is the same
    window count as events_enriched; the skew arm's equality is pinned
    by tests/test_adaptive_join.py."""
    from ocr_ray.stages.join import adaptive_join

    return _events_enriched_impl(sf_dir, adaptive_join)


def _nation_trade_edges(sf_dir: str, with_weight: bool):
    """Shared edge build for the nation trade graph (pagerank/triangles):
    one big-big exchange join (lineitem x orders on orderkey) with the two
    dimension maps broadcast once; emits (src, dst[, w]) nation edges."""
    from ocr_ray.stages.join import exchange_join

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_suppkey"])
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_custkey"])
    cust = pd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey", "c_nationkey"])
    supp = pd.read_parquet(os.path.join(sf_dir, "supplier.parquet"),
                           columns=["s_suppkey", "s_nationkey"])
    maps_ref = ray.put((
        dict(zip(cust["c_custkey"].astype("int64"),
                 cust["c_nationkey"].astype("int64"))),
        dict(zip(supp["s_suppkey"].astype("int64"),
                 supp["s_nationkey"].astype("int64"))),
    ))

    joined = exchange_join(li, orders, on="l_orderkey",
                           right_on="o_orderkey", n_partitions=8)

    def to_edges(b: pd.DataFrame) -> pd.DataFrame:
        c2n, s2n = ray.get(maps_ref)
        out = pd.DataFrame(
            {"src": b["o_custkey"].map(c2n).astype("int64"),
             "dst": b["l_suppkey"].map(s2n).astype("int64")})
        if with_weight:
            out["w"] = np.int64(1)
        return out

    return joined.map_batches(to_edges, batch_format="pandas")


def q_graph_pagerank(sf_dir: str):
    """Link-graph quality prior (stages/graph.py): build the nation
    'trade graph' — an edge per (customer nation -> supplier nation)
    lineitem, via the shared exchange-join edge build
    (_nation_trade_edges) — then 2 exact-integer PageRank iterations
    with the broadcast-rank pattern (edges stream, ranks ship once per
    iteration).  The RefinedWeb-style domain-ranking shape on the TPC-H
    graph."""
    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.graph import pagerank

    edges = hash_aggregate(_nation_trade_edges(sf_dir, with_weight=True),
                           keys=["src", "dst"], aggs={"w": "sum"},
                           n_partitions=8)
    return pagerank(edges, iters=2, n_partitions=8)


def q_graph_triangles(sf_dir: str):
    """Per-node triangle counts on the nation trade graph — the
    clustering/community-structure primitive of link-graph curation —
    via the degree-oriented node iterator (stages/graph.py:
    triangle_counts; Suri & Vassilvitskii WWW'11).  Edge build shared
    with graph_pagerank (_nation_trade_edges); then distinct undirected
    edges, a degree join, (deg, id)-oriented wedge generation
    (out-degree bounded O(sqrt(m)), so wedge volume is ~m^1.5, never
    hub-quadratic) and one hash-partitioned wedge-vs-edge closing join.
    The oracle recomputes via a 3-way SQL self-join."""
    from ocr_ray.stages.graph import triangle_counts

    edges = _nation_trade_edges(sf_dir, with_weight=False)
    return triangle_counts(edges, n_partitions=8)


def q_pipeline_curation2(sf_dir: str):
    """Round-2 curation composite — the model-tier pipeline end-to-end
    as ONE streaming job: hashed-linear classifier gate -> corpus-trained
    bigram-LM perplexity gate (trained on the classifier's survivors) ->
    cross-doc duplicated-block removal -> per-source quota sample.
    Every stage is the already-oracle-checked operator; the composed
    oracle chains the same CTEs, so the whole pipeline (including the
    final kept flags) is value-checked."""
    from ocr_ray.stages.classify import HashedLinearClassifier
    from ocr_ray.stages.dedup import block_dedup
    from ocr_ray.stages.lm import lm_score
    from ocr_ray.stages.shuffle import grouped_rank
    from ocr_ray.stages.taskpool import task_pool

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    s1 = docs.map_batches(
        task_pool(HashedLinearClassifier, keep_text=True,
                  carry_cols=("source",)),
        batch_format="pandas",
    ).filter(expr="keep == 1").map_batches(
        lambda b: b[["doc_id", "text", "source"]], batch_format="pandas")
    s2 = lm_score(s1, threshold_ppm=34000, n_partitions=8,
                  carry_cols=("text", "source")).filter(
        expr="keep == 1").map_batches(
        lambda b: b[["doc_id", "text", "source"]], batch_format="pandas")
    s3 = block_dedup(s2, w=6, min_docs=2, n_partitions=8,
                     carry_cols=("source",))
    out = grouped_rank(s3, "source", id_col="doc_id", quota=10,
                       n_buckets=64, n_partitions=8)
    return out.map_batches(
        lambda b: b[["doc_id", "source", "n_blocks", "n_dup_blocks",
                     "dedup_text", "src_rank", "kept"]],
        batch_format="pandas")


def q_pipeline_training(sf_dir: str):
    """Training-serialization composite — curate THEN serialize for the
    trainer as one streaming job: deterministic mixture resample (fit the
    language mixture) -> bigram-LM perplexity gate TRAINED ON THE MIXED
    SURVIVORS -> sequence packing (exact distributed prefix-sum bins in
    deterministic-shuffle order).  Each stage is the already-oracle-checked
    operator; the composed oracle chains the same CTEs, so the final
    (doc, bin, offset) layout a trainer would consume is value-checked."""
    from ocr_ray.stages.lm import lm_score
    from ocr_ray.stages.sample import mixture_resample
    from ocr_ray.stages.shuffle import deterministic_pack

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    mixed = mixture_resample(docs, MIX_WEIGHTS, group_col="lang",
                             keep_cols=("text",)).map_batches(
        lambda b: b[["doc_id", "text"]], batch_format="pandas")
    gated = lm_score(mixed, threshold_ppm=34000, n_partitions=8,
                     carry_cols=("text",)).filter(
        expr="keep == 1").map_batches(
        lambda b: b[["doc_id", "text"]], batch_format="pandas")
    return deterministic_pack(gated, budget=1024, n_buckets=64,
                              n_partitions=8)


def q_doc_source_rank(sf_dir: str):
    """Per-source exact rank + quota flag (stages/shuffle.py:
    grouped_rank): reproducible per-domain head-k sampling — the data
    mixing quota primitive.  Bucket-count pass + uniform hash exchange;
    a hot source spreads over all buckets (no skewed partition)."""
    from ocr_ray.stages.shuffle import grouped_rank

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source"]
    )
    return grouped_rank(docs, "source", quota=15, n_buckets=64,
                        n_partitions=8)


def q_dedup_semantic(sf_dir: str):
    """SemDeDup (stages/cluster.py:semantic_dedup): k-means bounds the
    candidate set, then each vector within an L2 ball of a lower-id
    same-cluster member is flagged — cluster exchange + per-partition
    integer pairwise block, no corpus-wide pair generation."""
    from ocr_ray.stages.cluster import semantic_dedup

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    return semantic_dedup(ds, k=8, iters=2,
                          dist_threshold=1_300_000_000_000, n_partitions=4)


def q_dedup_blocks(sf_dir: str):
    """Cross-doc duplicated-block removal (stages/dedup.py:block_dedup):
    CCNet/MassiveText boilerplate filter — blocks repeated in >=2 docs
    are dropped from every doc, survivors rejoined in order.  Three
    bounded int exchanges; doc text moves exactly once."""
    from ocr_ray.stages.dedup import block_dedup

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return block_dedup(docs, w=6, min_docs=2, n_partitions=8)


def q_doc_lm(sf_dir: str):
    """Corpus-trained hashed bigram LM scorer (stages/lm.py): the
    CCNet/KenLM-style perplexity quality filter — pass 1 trains the
    hashed count tables over the corpus (bounded exchange), pass 2
    broadcasts them and scores every doc in a pure map_batches.
    Integer-exact ppm conditional probabilities, so the oracle checks
    the keep decision value-exactly."""
    from ocr_ray.stages.lm import lm_score

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return lm_score(docs, threshold_ppm=34000, concurrency=2, n_partitions=8)


def q_doc_clf(sf_dir: str):
    """Model-based quality gate (stages/classify.py): fasttext-style
    hashed linear classifier scored per doc — pure map_batches actor pool,
    no shuffle.  Integer-exact logits make even the keep/drop decision
    value-checked by the oracle."""
    from ocr_ray.stages.classify import classify_documents

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return classify_documents(docs, concurrency=2)


EMBED_DUP_THRESHOLD = 0.4


def q_dedup_embed(sf_dir: str):
    """Embedding-cosine near-dup: pairs with cosine >= threshold.  The
    normalized matrix of the (small-side) table is broadcast once via
    ray.put; the left side streams through map_batches doing one matmul per
    batch (same pattern as dedup_jaccard).  At 100 TB the candidate set comes
    from ann_ivf / ann_lsh buckets instead of all-pairs."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    # guard BEFORE reading: row count from parquet metadata only
    import pyarrow.parquet as _pq

    _guard_allpairs(_pq.ParquetFile(path).metadata.num_rows,
                    "dedup_embed", "ann_ivf / ann_lsh_topk buckets")
    pdf = pd.read_parquet(path).sort_values("vec_id").reset_index(drop=True)
    m = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    ids = pdf["vec_id"].to_numpy()
    ref = ray.put((ids, mn))

    def pairs_batch(b: pd.DataFrame) -> pd.DataFrame:
        all_ids, all_mn = ray.get(ref)
        bm = np.asarray([np.asarray(v, dtype=np.float64) for v in b["embedding"]])
        bm = bm / np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-30)
        sims = bm @ all_mn.T
        bids = b["vec_id"].to_numpy()
        li, ri = np.nonzero((sims >= EMBED_DUP_THRESHOLD) & (bids[:, None] < all_ids[None, :]))
        return pd.DataFrame(
            {
                "left_id": bids[li].astype("int64"),
                "right_id": all_ids[ri].astype("int64"),
                "sim": np.round(sims[li, ri], 6),
            }
        )

    return rd.read_parquet(path).map_batches(pairs_batch, batch_format="pandas")


def q_dedup_embed_lsh(sf_dir: str):
    """Embedding near-dup SCALE path: the table unioned with perturbed
    copies (vec_id+1_000_000, first component doubled — exact float32
    arithmetic, so the DuckDB oracle reconstructs the mutant bit-for-bit;
    cosine >= (1+t^2)/sqrt(1+3t^2) >= 0.9428 for every mutant), multi-table
    random-projection candidates, raw-task exchange verify at
    cosine >= 0.9.  Oracle = all-pairs cosine over the same union — valid
    here because the 12-table LSH recall on these positives is ~1-1e-9 and
    the run is seeded/deterministic (the recall pytest asserts set equality
    against the brute-force kernel independently)."""
    from ocr_ray.stages.similarity import lsh_embed_dedup_pairs

    def mutate(b: pd.DataFrame) -> "pa.Table":
        # returns a TYPED Arrow table matching the parquet schema exactly
        # (list<element: float>): a pandas return with an object column of
        # ndarrays breaks pandas-block schema unification when a block
        # comes out empty (observed at num_cpus=4 block boundaries)
        import pyarrow as pa

        keep = b["vec_id"] % 10 == 0
        ids, vecs = [], []
        for vid, v in zip(b["vec_id"][keep], b["embedding"][keep]):
            v = np.asarray(v, dtype=np.float32).copy()
            v[0] = v[0] * np.float32(2.0)  # exact in float32
            ids.append(int(vid) + 1_000_000)
            vecs.append(v.tolist())
        return pa.Table.from_arrays(
            [pa.array(ids, type=pa.int64()),
             pa.array(vecs, type=pa.list_(pa.field("element", pa.float32())))],
            names=["vec_id", "embedding"])

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    both = ds.union(ds.map_batches(mutate, batch_format="pandas"))
    return lsh_embed_dedup_pairs(both, threshold=0.9, n_partitions=None)


# ====================================================== text -> embedding
EMBED_DIM = 64


def q_embed_docs(sf_dir: str):
    """A7 analog: compute embeddings FROM text (deterministic feature-hash
    embedder, stages/embed.py) as an actor-pool map_batches; emits the
    SQL-checkable derived columns (pre-norm norm, nonzero count, first
    normalized component)."""
    from ocr_ray.stages.embed import HashingEmbedder

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    from ocr_ray.stages.taskpool import task_pool

    out = ds.map_batches(
        task_pool(HashingEmbedder, dim=EMBED_DIM), batch_format="pandas"
    )

    def derived(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "emb_norm": b["emb_norm"].astype("float64"),
                "nnz": b["nnz"].astype("int64"),
                "e0": b["e0"].astype("float64"),
            }
        )

    return out.map_batches(derived, batch_format="pandas")


def q_embed_text_knn(sf_dir: str):
    """Full text -> vector -> similarity loop: embed every document AND the
    query string with the same hash embedder, cosine top-10 (broadcast query
    vector, per-batch dot, global sort + limit)."""
    from ocr_ray.stages.embed import HashingEmbedder, embed_query

    qv = embed_query(RAG_QUERY, dim=EMBED_DIM)
    qref = ray.put(qv)

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    from ocr_ray.stages.taskpool import task_pool

    embedded = ds.map_batches(
        task_pool(HashingEmbedder, dim=EMBED_DIM), batch_format="pandas"
    )

    def score(b: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(qref)
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in b["embedding"]])
        sims = m @ q if len(b) else np.array([], dtype=np.float64)
        return pd.DataFrame(
            {"doc_id": b["doc_id"].astype("int64"), "sim": sims}
        )

    # per-block top-k + driver finish (aggregate.global_topk) instead of
    # sort().limit(): the latter range-shuffles EVERY scored row before
    # the limit applies — k rows per block move instead
    top = global_topk(
        embedded.map_batches(score, batch_format="pandas"),
        ["sim", "doc_id"], 10, descending=[True, False],
    )
    top["sim"] = np.round(top["sim"], 6)
    top["doc_id"] = top["doc_id"].astype("int64")
    return top


# ================================================================ similarity
def q_embed_knn(sf_dir: str):
    """Brute-force cosine top-10 vs the vec_id=0 query vector; broadcast
    query, per-batch float64 matmul, global sort + limit."""
    import pyarrow.dataset as pads

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = rd.read_parquet(path)
    # the query vector: a parquet predicate scan (row-group pruning), never a
    # per-row Python filter over the whole dataset
    qrow = rd.read_parquet(path, filter=pads.field("vec_id") == 0).take(1)
    qref = ray.put(np.asarray(qrow[0]["embedding"], dtype=np.float64))

    class RawCosine(CosineTopK):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            m = np.asarray([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
            sims = (m @ self.qn.T).ravel() / np.maximum(np.linalg.norm(m, axis=1), 1e-30)
            return pd.DataFrame({"vec_id": batch["vec_id"].to_numpy(), "sim": sims})

    from ocr_ray.stages.taskpool import task_pool

    scored = ds.map_batches(task_pool(RawCosine, query_ref=qref),
                            batch_format="pandas")
    top = global_topk(scored, ["sim", "vec_id"], 10, descending=[True, False])
    top["sim"] = np.round(top["sim"], 6)
    top["vec_id"] = top["vec_id"].astype("int64")
    return top


def q_embed_quantize(sf_dir: str):
    """Int8 scalar quantization of the embedding table (similarity.py:
    quantize_int8) — the 4x-memory compressed-ANN representation, exploded
    to (vec_id, i, q) rows so the oracle value-checks every code."""
    from ocr_ray.stages.similarity import quantize_int8

    def quant_batch(b: pd.DataFrame) -> pd.DataFrame:
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in b["embedding"]])
        codes, _ = quantize_int8(m)
        n, d = codes.shape
        return pd.DataFrame(
            {"vec_id": np.repeat(b["vec_id"].to_numpy().astype("int64"), d),
             "i": np.tile(np.arange(d, dtype="int64"), n),
             "q": codes.ravel()}
        )

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    return ds.map_batches(quant_batch, batch_format="pandas")


def q_embed_rp(sf_dir: str):
    """Random-projection dimensionality reduction 64->16
    (similarity.py:RPReducer): quantize-then-±1-project so every reduced
    component is an exact int64 — the oracle value-checks all of them."""
    from ocr_ray.stages.similarity import rp_reduce

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    return rp_reduce(ds, r_dim=16, dim=64)


def q_embed_qknn(sf_dir: str):
    """KNN over the int8-quantized corpus: broadcast the quantized vec_id=0
    query, exact int64 dot per batch (similarity.py:QuantizedDot), global
    top-10 — the compressed-search path with a value-exact oracle (integer
    scoring is immune to float drift)."""
    import pyarrow.dataset as pads

    from ocr_ray.stages.similarity import QuantizedDot, quantize_int8
    from ocr_ray.stages.taskpool import task_pool

    path = os.path.join(sf_dir, "embeddings.parquet")
    qrow = rd.read_parquet(path, filter=pads.field("vec_id") == 0).take(1)
    qm = np.asarray(qrow[0]["embedding"], dtype=np.float64)[None, :]
    qcodes = ray.put(quantize_int8(qm)[0][0])

    scored = (
        rd.read_parquet(path, columns=["vec_id", "embedding"],
                        filter=pads.field("vec_id") != 0)
        .map_batches(task_pool(QuantizedDot, query_codes_ref=qcodes),
                     batch_format="pandas")
    )
    top = global_topk(scored, ["dot", "vec_id"], 10, descending=[True, False])
    top["dot"] = top["dot"].astype("int64")
    return top


def q_embed_label_stats(sf_dir: str):
    def norms_batch(b: pd.DataFrame) -> pd.DataFrame:
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in b["embedding"]])
        return pd.DataFrame(
            {"label": b["label"].astype("int64"), "norm": np.sqrt((m * m).sum(axis=1))}
        )

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    agg = (
        ds.map_batches(norms_batch, batch_format="pandas")
        .groupby("label")
        .aggregate(
            Count(alias_name="n"),
            Min("norm", alias_name="min_norm"),
            Max("norm", alias_name="max_norm"),
        )
        .to_pandas()
    )
    agg["label"] = agg["label"].astype("int64")
    agg["n"] = agg["n"].astype("int64")
    agg["min_norm"] = np.round(agg["min_norm"], 6)
    agg["max_norm"] = np.round(agg["max_norm"], 6)
    return agg


def q_ann_lsh(sf_dir: str):
    """Sign-projection LSH buckets (the ANN scale path).  The ±1
    projection entries derive from the engine's polynomial hash of
    "<dim>:<bit>" (stages/similarity.py:SignHashLSH), so the DuckDB oracle
    recomputes identical buckets — value-checked, not rows-only.  The
    Gaussian variant (RandomProjectionLSH) remains the probe path used by
    ann_lsh_topk."""
    from ocr_ray.stages.similarity import SignHashLSH
    from ocr_ray.stages.taskpool import task_pool

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    dim = len(ds.take(1)[0]["embedding"])
    out = ds.map_batches(
        task_pool(SignHashLSH, dim=dim, n_bits=8), batch_format="pandas"
    ).to_pandas()
    out["vec_id"] = out["vec_id"].astype("int64")
    out["bucket"] = out["bucket"].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)


def q_ann_lsh_topk(sf_dir: str):
    """LSH ANN end-to-end query path (rows-only; recall vs brute force
    asserted in tests): 4-bit signed random projections, multi-probe the
    query's bucket plus Hamming<=1 neighbors (5 of 16 buckets), exact
    cosine ranking inside the probed buckets, global top-10."""
    import pyarrow.dataset as pads

    from ocr_ray.stages.similarity import LSHProbeScore, RandomProjectionLSH

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = rd.read_parquet(path)
    qvec = np.asarray(
        rd.read_parquet(path, filter=pads.field("vec_id") == 0).take(1)[0]["embedding"],
        dtype=np.float64,
    )
    n_bits = 4
    lsh = RandomProjectionLSH(len(qvec), n_bits=n_bits)
    probe = lsh.probe_set(qvec, max_hamming=1)
    qn = qvec / np.linalg.norm(qvec)
    probe_ref = ray.put(probe)
    qref = ray.put(qn)

    from ocr_ray.stages.taskpool import task_pool

    scored = ds.map_batches(
        task_pool(LSHProbeScore, dim=len(qvec), n_bits=n_bits,
                  probe_ref=probe_ref, query_ref=qref),
        batch_format="pandas",
    )
    top = global_topk(scored, ["sim", "vec_id"], 10, descending=[True, False])
    top["vec_id"] = top["vec_id"].astype("int64")
    return top


def q_ann_ivf(sf_dir: str):
    """IVF ANN (rows-only; recall vs brute force asserted in tests): seeded
    k-means centroids fit on a driver-side sample (tiny k x dim matrix,
    broadcast via ray.put), per-batch nearest-centroid assignment, query
    probes the nprobe nearest cells and ranks exact cosine only there."""
    import pyarrow.dataset as pads

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = rd.read_parquet(path)
    # seeded random sample (first-blocks take() would bias the quantizer)
    sample_rows = ds.random_sample(0.6, seed=17).take(256)
    sample = np.asarray(
        [np.asarray(r["embedding"], dtype=np.float64) for r in sample_rows]
    )
    cent = kmeans_fit(sample, n_centroids=16)
    cref = ray.put(cent)

    qvec = np.asarray(
        rd.read_parquet(path, filter=pads.field("vec_id") == 0).take(1)[0]["embedding"],
        dtype=np.float64,
    )
    assigner = IVFAssign(cent)
    qcell_d = (assigner.cent_sq - 2.0 * (cent @ qvec))
    probe = set(np.argsort(qcell_d)[:4].tolist())
    qn = qvec / np.linalg.norm(qvec)
    qref = ray.put(qn)

    class ProbeScore:
        def __init__(self, centroids_ref, query_ref, probe_cells):
            self.assign = IVFAssign(centroids_ref)
            self.qn = ray.get(query_ref)
            self.probe = probe_cells

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            m = np.asarray([np.asarray(v, dtype=np.float64) for v in b["embedding"]])
            cells = self.assign.assign(m)
            mask = np.isin(cells, list(self.probe))
            if not mask.any():
                return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                     "sim": pd.Series([], dtype="float64")})
            mm = m[mask]
            sims = (mm @ self.qn) / np.maximum(np.linalg.norm(mm, axis=1), 1e-30)
            return pd.DataFrame(
                {"vec_id": b["vec_id"].to_numpy()[mask].astype("int64"),
                 "sim": np.round(sims, 6)}
            )

    from ocr_ray.stages.taskpool import task_pool

    scored = ds.map_batches(
        task_pool(ProbeScore, centroids_ref=cref, query_ref=qref,
                  probe_cells=frozenset(probe)),
        batch_format="pandas",
    )
    top = global_topk(scored, ["sim", "vec_id"], 10, descending=[True, False])
    top["vec_id"] = top["vec_id"].astype("int64")
    return top


# ================================================================ relational
_CENTS = "CAST(sum(CAST(floor({col}*100+0.5) AS BIGINT)) AS BIGINT)"


def q_q1_pricing(sf_dir: str):
    """TPC-H Q1-style aggregate: date predicate pushed into the parquet scan
    (row-group pruning — only qualifying rows leave storage), per-batch
    partial aggregation, then the (tiny) global groupby — the combiner
    pattern for scale."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    cutoff = pd.Timestamp("1998-09-02")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_shipdate"] <= cutoff]  # exact residual filter post-scan
        if not len(b):
            return pd.DataFrame(
                {"l_returnflag": [], "l_linestatus": [], "sum_qty": [],
                 "sum_base_cents": [], "n_rows": []}
            )
        g = b.assign(
            sum_qty=b["l_quantity"].astype("int64"),
            sum_base_cents=np.floor(b["l_extendedprice"] * 100 + 0.5).astype("int64"),
            n_rows=1,
        ).groupby(["l_returnflag", "l_linestatus"], as_index=False)[
            ["sum_qty", "sum_base_cents", "n_rows"]
        ].sum()
        return g

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_shipdate"],
        filter=pads.field("l_shipdate") <= pa.scalar(cutoff),
    )
    from ocr_ray.stages.aggregate import hash_aggregate

    out = hash_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["l_returnflag", "l_linestatus"],
        aggs={"sum_qty": "sum", "sum_base_cents": "sum", "n_rows": "sum"},
    ).to_pandas()
    for c in ["sum_qty", "sum_base_cents", "n_rows"]:
        out[c] = out[c].astype("int64")
    return out


def q_q3_shipping(sf_dir: str):
    """TPC-H Q3-style shipping priority — the canonical 3-way join +
    grouped aggregate + global top-k: BUILDING-segment customers semi-
    filter orders (keys only ship), date predicates pushed into all three
    parquet scans (row-group pruning), the big-big lineitem x orders side
    goes through the exchange join, revenue reduced per batch to exact
    integer cents BEFORE the key exchange, and the top-10 comes off the
    (already per-order aggregated) table via sort+limit — deterministic
    tie-break (revenue desc, orderkey asc)."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_join

    cutoff = pd.Timestamp("1995-03-15")

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
        filter=pads.field("c_mktsegment") == "BUILDING",
    ).select_columns(["c_custkey"])

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=pads.field("o_orderdate") < pa.scalar(cutoff),
    )
    osel = exchange_join(orders, cust, on="o_custkey", right_on="c_custkey",
                         how="semi", n_partitions=8)

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=pads.field("l_shipdate") > pa.scalar(cutoff),
    )

    def li_partial(b: pd.DataFrame) -> pd.DataFrame:
        # exact residual filter + per-batch combiner: integer cents with
        # the same IEEE association the oracle uses
        b = b[b["l_shipdate"] > cutoff]
        b = b.assign(rev_cents=np.floor(
            b["l_extendedprice"] * (1 - b["l_discount"]) * 100 + 0.5
        ).astype("int64"))
        return b.groupby("l_orderkey", as_index=False)[["rev_cents"]].sum()

    li_red = hash_aggregate(
        li.map_batches(li_partial, batch_format="pandas"),
        keys=["l_orderkey"], aggs={"rev_cents": "sum"}, n_partitions=None,
    )

    j = exchange_join(li_red, osel, on="l_orderkey", right_on="o_orderkey",
                      how="inner", n_partitions=None)

    top = global_topk(
        j.select_columns(["l_orderkey", "o_orderdate", "rev_cents"]),
        ["rev_cents", "l_orderkey"], 10, descending=[True, False])
    top["l_orderkey"] = top["l_orderkey"].astype("int64")
    top["rev_cents"] = top["rev_cents"].astype("int64")
    return top[["l_orderkey", "o_orderdate", "rev_cents"]]


def q_q17_small_qty(sf_dir: str):
    """TPC-H Q17-style correlated-aggregate join — revenue from
    small-quantity orders: lineitems whose quantity is below 0.2x their
    part's average quantity.  The float comparison ``qty < 0.2 * avg`` is
    rewritten as the integer inequality ``5 * count * qty < sum_qty``
    (quantities are integral), so the boundary is EXACT on both sides —
    no IEEE summation-order hazard.  Per-part (count, sum) partials
    reduce through the streaming hash aggregate (bounded by |parts|),
    then one partkey exchange joins the stats back to the rows; output
    is the single-row total in cents + qualifying row count."""
    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_join

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def stat_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(c=np.int64(1), sq=b["l_quantity"].astype("int64"))
        return b.groupby("l_partkey", as_index=False)[["c", "sq"]].sum()

    stats = hash_aggregate(
        li.map_batches(stat_partial, batch_format="pandas"),
        keys=["l_partkey"], aggs={"c": "sum", "sq": "sum"}, n_partitions=None,
    )

    j = exchange_join(li, stats, on="l_partkey", n_partitions=None)

    def qualify(b: pd.DataFrame) -> pd.DataFrame:
        qty = b["l_quantity"].astype("int64")
        keep = 5 * b["c"].astype("int64") * qty < b["sq"].astype("int64")
        kept = b[keep]
        return pd.DataFrame({
            "total_cents": [int(np.floor(
                kept["l_extendedprice"] * 100 + 0.5).astype("int64").sum())],
            "n_rows": [np.int64(keep.sum())],
        })

    out = j.map_batches(qualify, batch_format="pandas").to_pandas()
    return pd.DataFrame({
        "total_cents": [np.int64(out["total_cents"].sum())],
        "n_rows": [np.int64(out["n_rows"].sum())],
    })


def q_q13_custdist(sf_dir: str):
    """TPC-H Q13-style customer order-count distribution — the
    count-of-counts histogram over a LEFT join (zero-order customers kept
    with c_count = 0): non-urgent orders reduce to per-customer counts
    through the streaming hash aggregate, the customer key column LEFT
    exchange-joins those counts (missing side = exact zero), and the
    final histogram is a second bounded aggregate over the count values.
    Shuffle volume: per-customer count rows, never the order stream."""
    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_join

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority"],
    ).filter(expr="o_orderpriority != '1-URGENT'")

    def cnt_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(c_count=np.int64(1))
        return b.groupby("o_custkey", as_index=False)[["c_count"]].sum()

    counts = hash_aggregate(
        orders.map_batches(cnt_partial, batch_format="pandas"),
        keys=["o_custkey"], aggs={"c_count": "sum"}, n_partitions=None,
    )

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    )
    j = exchange_join(cust, counts, on="c_custkey", right_on="o_custkey",
                      how="left", n_partitions=None)

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(c_count=b["c_count"].fillna(0).astype("int64"),
                     custdist=np.int64(1))
        return b.groupby("c_count", as_index=False)[["custdist"]].sum()

    out = hash_aggregate(
        j.map_batches(hist_partial, batch_format="pandas"),
        keys=["c_count"], aggs={"custdist": "sum"}, n_partitions=4,
    ).to_pandas()
    out["c_count"] = out["c_count"].astype("int64")
    out["custdist"] = out["custdist"].astype("int64")
    return out


def q_q4_priority(sf_dir: str):
    """TPC-H Q4-style order-priority check — EXISTS with a correlated
    predicate: count orders per priority having at least one lineitem
    shipped more than 90 days after the order date.  EXISTS over a date
    comparison only needs each order's MAXIMUM ship date, so lineitem is
    reduced to one (l_orderkey, max_shipdate) row through the streaming
    hash aggregate BEFORE the exchange join — shuffle volume is the
    per-order table (~|lineitem|/4 here, unboundedly better at TPC-H
    fan-outs), and the per-order EXISTS is a single vectorized
    comparison; the final priority rollup is a bounded aggregate."""
    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_join

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_shipdate"])

    def max_ship(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("l_orderkey", as_index=False)["l_shipdate"].max()

    li_red = hash_aggregate(
        li.map_batches(max_ship, batch_format="pandas"),
        keys=["l_orderkey"], aggs={"l_shipdate": "max"}, n_partitions=None,
    )

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    j = exchange_join(li_red, orders, on="l_orderkey", right_on="o_orderkey",
                      n_partitions=None)

    def exists_partial(b: pd.DataFrame) -> pd.DataFrame:
        late = b["l_shipdate"] > b["o_orderdate"] + pd.Timedelta(days=90)
        d = b[late][["o_orderpriority"]].copy()
        d["order_count"] = np.int64(1)
        return d.groupby("o_orderpriority", as_index=False)["order_count"].sum()

    out = hash_aggregate(
        j.map_batches(exists_partial, batch_format="pandas"),
        keys=["o_orderpriority"], aggs={"order_count": "sum"}, n_partitions=2,
    ).to_pandas()
    out["order_count"] = out["order_count"].astype("int64")
    return out


def q_q5_local_volume(sf_dir: str):
    """TPC-H Q5-style local-supplier volume — the canonical 6-way join
    (region x nation x customer x orders x lineitem x supplier) with the
    customer-nation == supplier-nation equality.  Plan: the two dimension
    tables collapse driver-side into a nationkey set + name map (25/5
    rows; at any scale nation/region stay broadcastable); supplier
    restricted to the region rides into the lineitem scan as a broadcast
    (suppkey -> s_nationkey) inner merge, so only region-local lineitems
    survive; lineitem revenue is pre-reduced per (orderkey, s_nationkey)
    BEFORE the one big-big exchange join against the (orders semi-joined
    customer) side, and the nation-equality filter + final rollup run on
    the already-reduced rows.  Shuffle volume: per-order partials, never
    the lineitem stream."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import broadcast_join, exchange_join

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01")

    nation = rd.read_parquet(
        os.path.join(sf_dir, "nation.parquet")).to_pandas()
    region = rd.read_parquet(
        os.path.join(sf_dir, "region.parquet")).to_pandas()
    asia = int(region.loc[region["r_name"] == "ASIA", "r_regionkey"].iloc[0])
    local = nation[nation["n_regionkey"] == asia]
    names = dict(zip(local["n_nationkey"].astype(int),
                     local["n_name"].astype(str)))
    keys = set(names)

    supp = rd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    ).to_pandas()
    supp = supp[supp["s_nationkey"].isin(keys)].rename(
        columns={"s_suppkey": "l_suppkey"})

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(rev_cents=np.floor(
            b["l_extendedprice"] * (1 - b["l_discount"]) * 100 + 0.5
        ).astype("int64"))
        return b.groupby(["l_orderkey", "s_nationkey"], as_index=False)[
            ["rev_cents"]].sum()

    li_red = hash_aggregate(
        broadcast_join(li, supp, on="l_suppkey")  # inner: drops non-ASIA
        .map_batches(li_partial, batch_format="pandas"),
        keys=["l_orderkey", "s_nationkey"], aggs={"rev_cents": "sum"},
        n_partitions=None,
    )

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(lambda b: b[b["c_nationkey"].isin(keys)],
                  batch_format="pandas")
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= pa.scalar(lo))
        & (pads.field("o_orderdate") < pa.scalar(hi)),
    )

    def date_residual(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["o_orderdate"] >= lo) & (b["o_orderdate"] < hi)]
        return b[["o_orderkey", "o_custkey"]]

    osel = exchange_join(
        orders.map_batches(date_residual, batch_format="pandas"),
        cust, on="o_custkey", right_on="c_custkey", n_partitions=None,
    )

    j = exchange_join(li_red, osel, on="l_orderkey", right_on="o_orderkey",
                      n_partitions=None)

    def local_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["s_nationkey"] == b["c_nationkey"]]
        return b.groupby("s_nationkey", as_index=False)[["rev_cents"]].sum()

    out = hash_aggregate(
        j.map_batches(local_partial, batch_format="pandas"),
        keys=["s_nationkey"], aggs={"rev_cents": "sum"}, n_partitions=2,
    ).to_pandas()
    out["n_name"] = out["s_nationkey"].astype(int).map(names)
    out["revenue_cents"] = out["rev_cents"].astype("int64")
    out = out.sort_values(["revenue_cents", "n_name"],
                          ascending=[False, True], kind="mergesort")
    return out[["n_name", "revenue_cents"]].reset_index(drop=True)


def q_q10_returned(sf_dir: str):
    """TPC-H Q10-style returned-item report — top-20 customers by revenue
    lost to returns in a quarter: per-order 'R'-flag revenue reduces
    through the streaming hash aggregate before the orderkey exchange
    join, re-keys to custkey for a second bounded aggregate, and only the
    per-customer totals (|customers| rows, not |lineitem|) join the
    customer dimension; nation names attach from a driver-side map (25
    rows).  Deterministic top-k tie-break (revenue desc, custkey asc)."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_join

    lo, hi = pd.Timestamp("1996-07-01"), pd.Timestamp("1996-10-01")

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= pa.scalar(lo))
        & (pads.field("o_orderdate") < pa.scalar(hi)),
    )

    def date_residual(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["o_orderdate"] >= lo) & (b["o_orderdate"] < hi)]
        return b[["o_orderkey", "o_custkey"]]

    osel = orders.map_batches(date_residual, batch_format="pandas")

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
        filter=pads.field("l_returnflag") == "R",
    )

    def li_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_returnflag"] == "R"]
        b = b.assign(rev_cents=np.floor(
            b["l_extendedprice"] * (1 - b["l_discount"]) * 100 + 0.5
        ).astype("int64"))
        return b.groupby("l_orderkey", as_index=False)[["rev_cents"]].sum()

    li_red = hash_aggregate(
        li.map_batches(li_partial, batch_format="pandas"),
        keys=["l_orderkey"], aggs={"rev_cents": "sum"}, n_partitions=None,
    )

    j = exchange_join(li_red, osel, on="l_orderkey", right_on="o_orderkey",
                      n_partitions=None)

    def cust_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("o_custkey", as_index=False)[["rev_cents"]].sum()

    per_cust = hash_aggregate(
        j.map_batches(cust_partial, batch_format="pandas"),
        keys=["o_custkey"], aggs={"rev_cents": "sum"}, n_partitions=None,
    )

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    )
    nation = rd.read_parquet(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    names = dict(zip(nation["n_nationkey"].astype(int),
                     nation["n_name"].astype(str)))

    out = global_topk(
        exchange_join(per_cust, cust, on="o_custkey", right_on="c_custkey",
                      n_partitions=None),
        ["rev_cents", "o_custkey"], 20, descending=[True, False])
    out["c_custkey"] = out["o_custkey"].astype("int64")
    out["revenue_cents"] = out["rev_cents"].astype("int64")
    out["acctbal_cents"] = np.floor(
        out["c_acctbal"] * 100 + 0.5).astype("int64")
    out["n_name"] = out["c_nationkey"].astype(int).map(names)
    return out[["c_custkey", "c_name", "revenue_cents", "acctbal_cents",
                "n_name"]].reset_index(drop=True)


def q_q18_top_spenders(sf_dir: str):
    """TPC-H Q18-style large-volume-customer scan — HAVING over a
    billion-group aggregate: per-order quantity sums reduce through the
    streaming hash aggregate (integral quantities -> exact int64), the
    HAVING > 200 filter drops to the few qualifying orders BEFORE any
    join, and those few rows exchange-join orders then customer.  The
    top-100 sort runs over the already-filtered qualifier set.  Shuffle
    volume after the first aggregate is O(qualifying orders)."""
    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_join

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_quantity"])

    def qty_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(sum_qty=b["l_quantity"].astype("int64"))
        return b.groupby("l_orderkey", as_index=False)[["sum_qty"]].sum()

    big = hash_aggregate(
        li.map_batches(qty_partial, batch_format="pandas"),
        keys=["l_orderkey"], aggs={"sum_qty": "sum"}, n_partitions=None,
    ).map_batches(lambda b: b[b["sum_qty"] > 200],
                  batch_format="pandas")

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    j = exchange_join(big, orders, on="l_orderkey", right_on="o_orderkey",
                      n_partitions=None)

    cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey", "c_name"])
    j2 = exchange_join(j, cust, on="o_custkey", right_on="c_custkey",
                       n_partitions=None)

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        # exchange_join keeps the left key column (o_custkey), not c_custkey
        b = b.assign(totalprice_cents=np.floor(
            b["o_totalprice"] * 100 + 0.5).astype("int64"))
        return b[["o_custkey", "c_name", "l_orderkey", "o_orderdate",
                  "totalprice_cents", "sum_qty"]]

    out = global_topk(
        j2.map_batches(finalize, batch_format="pandas"),
        ["totalprice_cents", "l_orderkey"], 100, descending=[True, False])
    out = out.rename(columns={"l_orderkey": "o_orderkey",
                              "o_custkey": "c_custkey"})
    for c in ["c_custkey", "o_orderkey", "totalprice_cents", "sum_qty"]:
        out[c] = out[c].astype("int64")
    return out[["c_custkey", "c_name", "o_orderkey", "o_orderdate",
                "totalprice_cents", "sum_qty"]]


def q_q7_nation_flows(sf_dir: str):
    """TPC-H Q7-style bilateral trade volume — revenue between a nation
    pair by ship year, both directions: suppliers of the two nations ride
    into the lineitem scan as a broadcast inner merge (only pair-local
    shipments survive), revenue pre-reduces per (orderkey, supp_nation,
    year); the customer side pre-filters to the pair and exchange-joins
    orders; one orderkey exchange join + the cross-pair filter + a
    bounded (2 x 2 x years) rollup finish it.  Both 'big' tables are
    reduced before any all-to-all."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import broadcast_join, exchange_join

    lo, hi = pd.Timestamp("1995-01-01"), pd.Timestamp("1997-01-01")
    nation = rd.read_parquet(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    names = dict(zip(nation["n_nationkey"].astype(int),
                     nation["n_name"].astype(str)))
    pair = {1, 2}

    supp = rd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    ).to_pandas()
    supp = supp[supp["s_nationkey"].isin(pair)].rename(
        columns={"s_suppkey": "l_suppkey"})

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=(pads.field("l_shipdate") >= pa.scalar(lo))
        & (pads.field("l_shipdate") < pa.scalar(hi)),
    )

    def li_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)]
        b = b.assign(
            l_year=b["l_shipdate"].dt.year.astype("int64"),
            rev_cents=np.floor(
                b["l_extendedprice"] * (1 - b["l_discount"]) * 100 + 0.5
            ).astype("int64"),
        )
        return b.groupby(["l_orderkey", "s_nationkey", "l_year"],
                         as_index=False)[["rev_cents"]].sum()

    li_red = hash_aggregate(
        broadcast_join(li, supp, on="l_suppkey")
        .map_batches(li_partial, batch_format="pandas"),
        keys=["l_orderkey", "s_nationkey", "l_year"],
        aggs={"rev_cents": "sum"}, n_partitions=None,
    )

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(lambda b: b[b["c_nationkey"].isin(pair)],
                  batch_format="pandas")
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_custkey"])
    osel = exchange_join(orders, cust, on="o_custkey", right_on="c_custkey",
                         n_partitions=None)

    j = exchange_join(li_red, osel, on="l_orderkey", right_on="o_orderkey",
                      n_partitions=None)

    def flow_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["s_nationkey"] != b["c_nationkey"]]
        return b.groupby(["s_nationkey", "c_nationkey", "l_year"],
                         as_index=False)[["rev_cents"]].sum()

    out = hash_aggregate(
        j.map_batches(flow_partial, batch_format="pandas"),
        keys=["s_nationkey", "c_nationkey", "l_year"],
        aggs={"rev_cents": "sum"}, n_partitions=2,
    ).to_pandas()
    if not len(out):
        # Ray quirk: to_pandas() on an all-empty-block Dataset drops
        # columns — rebuild the typed empty (no pair-local trade at all)
        return pd.DataFrame({
            "supp_nation": pd.Series(dtype=object),
            "cust_nation": pd.Series(dtype=object),
            "l_year": pd.Series(dtype="int64"),
            "revenue_cents": pd.Series(dtype="int64"),
        })
    out["supp_nation"] = out["s_nationkey"].astype(int).map(names)
    out["cust_nation"] = out["c_nationkey"].astype(int).map(names)
    out["l_year"] = out["l_year"].astype("int64")
    out["revenue_cents"] = out["rev_cents"].astype("int64")
    out = out.sort_values(["supp_nation", "cust_nation", "l_year"],
                          kind="mergesort")
    return out[["supp_nation", "cust_nation", "l_year",
                "revenue_cents"]].reset_index(drop=True)


def q_top_customers(sf_dir: str):
    """Revenue top-10: pre-aggregate orders per custkey, broadcast-join the
    (small) customer dimension via ray.put, global sort + limit."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(total_cents=np.floor(b["o_totalprice"] * 100 + 0.5).astype("int64"))
        return b.groupby("o_custkey", as_index=False)[["total_cents"]].sum()

    from ocr_ray.stages.aggregate import hash_aggregate

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )
    totals = hash_aggregate(
        orders.map_batches(partial, batch_format="pandas"),
        keys=["o_custkey"],
        aggs={"total_cents": "sum"},
    )

    cust = pd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
    )
    name_ref = ray.put(dict(zip(cust["c_custkey"].astype("int64"), cust["c_name"])))

    def attach(b: pd.DataFrame) -> pd.DataFrame:
        names = ray.get(name_ref)
        return pd.DataFrame(
            {
                "c_custkey": b["o_custkey"].astype("int64"),
                "c_name": [names[k] for k in b["o_custkey"]],
                "total_cents": b["total_cents"].astype("int64"),
            }
        )

    # per-block top-k instead of a full range shuffle of the per-customer
    # totals (bounded k x n_blocks candidates to the driver)
    return global_topk(
        totals.map_batches(attach, batch_format="pandas"),
        ["total_cents", "c_custkey"], 10, descending=[True, False],
    )


def q_events_hourly(sf_dir: str):
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(
            hour=b["ts"].dt.floor("h"),
            sum_value_cents=np.floor(b["value"] * 100 + 0.5).astype("int64"),
            n=1,
        )
        return b.groupby(["event_type", "hour"], as_index=False)[
            ["n", "sum_value_cents"]
        ].sum()

    from ocr_ray.stages.aggregate import hash_aggregate

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts", "value"]
    )
    out = hash_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["event_type", "hour"],
        aggs={"n": "sum", "sum_value_cents": "sum"},
    ).to_pandas()
    out["n"] = out["n"].astype("int64")
    out["sum_value_cents"] = out["sum_value_cents"].astype("int64")
    return out


def q_events_hourly_users(sf_dir: str):
    """Exact per-group DISTINCT-count aggregate without shuffling raw rows
    (the COUNT(DISTINCT) workhorse): per-batch dedup of (hour, user) pairs
    — the partial — then one hash exchange on hour and a per-partition
    nunique.  Exchange volume is the distinct-pair table, not the event
    stream; all rows of an hour co-locate, so the count is exact."""
    from ocr_ray.stages.join import exchange_map_partitions

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(hour=b["ts"].dt.floor("h"), n=1)
        return b.groupby(["hour", "user_id"], as_index=False)["n"].sum()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("hour").agg(
            n_events=("n", "sum"), n_users=("user_id", "nunique")
        ).reset_index()
        out["n_events"] = out["n_events"].astype("int64")
        out["n_users"] = out["n_users"].astype("int64")
        return out

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "user_id"]
    )
    return exchange_map_partitions(
        ds.map_batches(partial, batch_format="pandas"),
        ["hour"], combine, n_partitions=None,
    )


FUNNEL_STAGES = ("signup", "view", "purchase")


def q_events_funnel(sf_dir: str):
    """Ordered conversion funnel (signup -> view -> purchase): users
    reaching each stage with strictly later timestamps at every step.
    Predicate pushdown keeps only the 3 stage types at the read; rows are
    hash-exchanged by user (bounded partitions); each partition resolves
    its users' stage chain vectorized (sorted per-user walk) and emits
    per-partition stage counts — the exchange ships stage events only,
    the driver sees 3·n_partitions partial rows."""
    from ocr_ray.stages.join import exchange_map_partitions

    def chain(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        counts = dict.fromkeys(FUNNEL_STAGES, 0)
        for _, u in g.groupby("user_id", sort=False):
            types = u["event_type"].to_numpy()
            ts = u["ts"].to_numpy()
            last = None
            for stage in FUNNEL_STAGES:
                m = (types == stage) if last is None else (
                    (types == stage) & (ts > last))
                hit = np.flatnonzero(m)
                if not len(hit):
                    break
                last = ts[hit[0]]
                counts[stage] += 1
        return pd.DataFrame(
            {"stage": list(FUNNEL_STAGES),
             "n_users": pd.Series([counts[s] for s in FUNNEL_STAGES],
                                  dtype="int64")}
        )

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type", "ts"],
    ).filter(expr="event_type in ['signup', 'view', 'purchase']")
    parts = exchange_map_partitions(ds, ["user_id"], chain, n_partitions=None)
    out = parts.to_pandas().groupby("stage", as_index=False)["n_users"].sum()
    out["n_users"] = out["n_users"].astype("int64")
    return out


def q_events_value_quantiles(sf_dir: str):
    """Exact per-group quantiles (p50/p95/p99 of value per event_type)
    without any sort-shuffle: two-level histogram plan — per-batch
    (type, cents) counts, bounded hash aggregate, then one exchange on
    event_type where each partition resolves its groups' order statistics
    from the cumulative histogram (quantile = smallest value whose
    cumulative count >= ceil(q*n); integer cents keep it value-exact)."""
    import math

    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_map_partitions

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(
            cents=np.floor(b["value"] * 100 + 0.5).astype("int64"), k=1
        )
        return b.groupby(["event_type", "cents"], as_index=False)["k"].sum()

    def quant(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, gg in g.groupby("event_type"):
            gg = gg.sort_values("cents")
            cum = gg["k"].cumsum().to_numpy()
            cents = gg["cents"].to_numpy()
            n = int(cum[-1])

            def qv(q: float) -> int:
                return int(cents[np.searchsorted(cum, math.ceil(q * n))])

            rows.append((t, qv(0.5), qv(0.95), qv(0.99), n))
        return pd.DataFrame(
            rows, columns=["event_type", "p50_cents", "p95_cents",
                           "p99_cents", "n"],
        ).astype({"p50_cents": "int64", "p95_cents": "int64",
                  "p99_cents": "int64", "n": "int64"})

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )
    hist = hash_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["event_type", "cents"], aggs={"k": "sum"}, n_partitions=None,
    )
    return exchange_map_partitions(hist, ["event_type"], quant, 8)


def q_events_active_7d(sf_dir: str):
    """Rolling 7-day active users, EXACT sliding-window distinct count:
    each user's active days expand to the 7-day windows they cover
    ([day, day+6], deduped per user — coverage union, so a user counts
    once per window); one exchange by user bounds the expansion locally,
    then the day-keyed aggregate sums per-partition partials.  Shuffle
    volume is distinct (user, covered-day) pairs (<= 7x active days), not
    the event stream."""
    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_map_partitions

    def cover(g: pd.DataFrame) -> pd.DataFrame:
        day = g["ts"].dt.normalize()
        pairs = pd.DataFrame({"user_id": g["user_id"], "day": day}
                             ).drop_duplicates()
        cov = pd.concat(
            [pairs.assign(day=pairs["day"] + pd.to_timedelta(i, unit="D"))
             for i in range(7)]
        ).drop_duplicates()
        out = cov.groupby("day", as_index=False).agg(n_users=("user_id", "nunique"))
        out["n_users"] = out["n_users"].astype("int64")
        return out

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )
    parts = exchange_map_partitions(ds, ["user_id"], cover, n_partitions=None)
    out = hash_aggregate(parts, keys=["day"], aggs={"n_users": "sum"},
                         n_partitions=4).to_pandas()
    out["n_users"] = out["n_users"].astype("int64")
    return out


def q_events_anomaly(sf_dir: str):
    """Volume-anomaly detection per event type — the pipeline-health
    monitor: a day is anomalous for a type when its event count deviates
    from the type's median daily count by more than 3x the median
    absolute deviation (robust z-score, Hampel rule).  Both the median
    and the MAD use the LOWER-median convention (the ceil(m/2)-th
    smallest value), so every statistic is an exact int64 and even this
    statistical monitor is value-checked.  Plan: per-(type, day) counts
    through the streaming hash aggregate (bounded: |types| x |days|),
    one exchange BY TYPE (all of a type's days co-locate), vectorized
    per-type median/MAD inside the partition."""
    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_map_partitions

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": b["event_type"],
            "day": b["ts"].dt.floor("D"),
            "n": np.int64(1),
        })

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["ts", "event_type"])
    counts = hash_aggregate(ds.map_batches(partial, batch_format="pandas"),
                            keys=["event_type", "day"], aggs={"n": "sum"},
                            n_partitions=8)

    def lower_median(a: np.ndarray) -> int:
        a = np.sort(a)
        return int(a[(a.size + 1) // 2 - 1])

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "event_type": pd.Series([], dtype="object"),
                "day": pd.Series([], dtype="datetime64[us]"),
                "n": pd.Series([], dtype="int64"),
                "med": pd.Series([], dtype="int64"),
                "mad": pd.Series([], dtype="int64"),
                "is_anomaly": pd.Series([], dtype="int64"),
            })
        out = []
        for et, grp in g.groupby("event_type", sort=False):
            n = grp["n"].to_numpy(dtype="int64")
            med = lower_median(n)
            dev = np.abs(n - med)
            mad = lower_median(dev)
            out.append(pd.DataFrame({
                "event_type": et,
                "day": grp["day"],
                "n": n,
                "med": np.int64(med),
                "mad": np.int64(mad),
                "is_anomaly": (dev > 3 * mad).astype("int64"),
            }))
        return pd.concat(out, ignore_index=True)

    return exchange_map_partitions(counts, "event_type", flag, n_partitions=8)


def q_events_props_stats(sf_dir: str):
    """Semi-structured payload extraction — the JSON-properties pattern:
    pull the ``k`` field out of each event's JSON ``props`` string with a
    VECTORIZED regex (one ``str.extract`` per batch, no per-row
    json.loads), then the standard combiner + bounded hash aggregate per
    event type.  All statistics integer-exact.  At scale the extraction
    cost dominates, so keeping it a C-level column kernel (not a Python
    JSON parse loop) is the difference between CPU-bound and done."""
    from ocr_ray.stages.aggregate import hash_aggregate

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "props"])

    # sentinels must survive a float64 round-trip exactly (the partial's k
    # column is float64 because of the NaNs) — INT64_MAX does not, so use
    # +/-2^62, far outside any BIGINT the oracle's TRY_CAST accepts in data
    _SENT_MIN = np.int64(1) << 62   # "no value seen" for the min partial
    _SENT_MAX = -(np.int64(1) << 62)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # malformed/absent keys extract as NaN and are EXCLUDED from the
        # stats rather than crashing the astype — exactly the oracle's
        # TRY_CAST -> NULL.  A batch slice whose every k is NaN must not
        # poison the global min/max, so min/max partials use +/-INT64
        # sentinels (never selected once any real value exists) and nk
        # carries the non-null count so the final pass can apply the
        # oracle's COALESCE(..., 0) for all-NULL groups.
        k = pd.to_numeric(
            b["props"].str.extract(r'"k": (\d+)', expand=False),
            errors="coerce")
        d = pd.DataFrame({"event_type": b["event_type"], "n": np.int64(1),
                          "nk": k.notna().astype("int64"),
                          "sum_k": k, "min_k": k, "max_k": k})
        out = d.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), nk=("nk", "sum"), sum_k=("sum_k", "sum"),
            min_k=("min_k", "min"), max_k=("max_k", "max"))
        out["sum_k"] = out["sum_k"].fillna(0).astype("int64")
        out["min_k"] = out["min_k"].fillna(_SENT_MIN).astype("int64")
        out["max_k"] = out["max_k"].fillna(_SENT_MAX).astype("int64")
        return out

    out = hash_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["event_type"],
        aggs={"n": "sum", "nk": "sum", "sum_k": "sum",
              "min_k": "min", "max_k": "max"},
        n_partitions=4,
    )

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        for c in ("n", "nk", "sum_k", "min_k", "max_k"):
            b[c] = b[c].astype("int64")
        empty = b["nk"] == 0  # COALESCE(min/max, 0) for all-NULL groups
        b.loc[empty, "min_k"] = 0
        b.loc[empty, "max_k"] = 0
        return b.drop(columns=["nk"])

    return out.map_batches(cast, batch_format="pandas")


def q_events_rate(sf_dir: str):
    """Per-event sliding lookback count — the rate-limit / fraud-scoring
    primitive: for every event, how many events the same user produced in
    the hour ENDING at it (peers at the exact same timestamp included,
    self excluded — SQL RANGE-frame semantics).  One user_id exchange;
    inside the partition each user's sorted timestamp array answers all
    its events with two vectorized searchsorted calls — no per-row loop,
    no self-join materialization."""
    from ocr_ray.stages.join import exchange_map_partitions

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "user_id", "ts"])

    def rate(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "n_prior_1h": pd.Series([], dtype="int64")})
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        out_id, out_n = [], []
        for _, grp in g.groupby("user_id", sort=False):
            ts = grp["ts"].values.astype("datetime64[us]").astype("int64")
            lo = np.searchsorted(ts, ts - 3_600_000_000, side="left")
            hi = np.searchsorted(ts, ts, side="right")
            out_id.append(grp["event_id"].to_numpy(dtype="int64"))
            out_n.append(hi - lo - 1)
        return pd.DataFrame({"event_id": np.concatenate(out_id),
                             "n_prior_1h": np.concatenate(out_n).astype("int64")})

    return exchange_map_partitions(ds, "user_id", rate, n_partitions=None)


def q_events_copresence(sf_dir: str):
    """Temporal co-presence pairs THROUGH the overlapping-intervals range
    join (join.py:range_join_multi — the flat-map variant range_join's
    contract excludes): every ordered pair of same-user events at most
    one hour apart, emitted once under the deterministic (ts, event_id)
    order.  Intervals are each event's [ts, ts+1h] lookahead window, so
    the join IS the pair generator; the containment filter plus the
    strict ordering dedupe ties.  Same-ts pairs order by event_id."""
    from ocr_ray.stages.join import range_join_multi

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "user_id", "ts"])

    def windows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"].astype("int64"),
            "l_event": b["event_id"].astype("int64"),
            "l_ts": b["ts"],
            "start_ts": b["ts"],
            "end_ts": b["ts"] + pd.Timedelta(hours=1),
        })

    pairs = range_join_multi(
        ev, ev.map_batches(windows, batch_format="pandas"),
        by="user_id", point_col="ts", start_col="start_ts",
        end_col="end_ts", n_partitions=None,
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        keep = (b["l_ts"] < b["ts"]) | (
            (b["l_ts"] == b["ts"]) & (b["l_event"] < b["event_id"]))
        d = b[keep]
        return pd.DataFrame({
            "user_id": d["user_id"].astype("int64"),
            "left_event": d["l_event"].astype("int64"),
            "right_event": d["event_id"].astype("int64"),
        })

    return pairs.map_batches(finish, batch_format="pandas")


def q_events_daily_filled(sf_dir: str):
    """Calendar gap-filling — the time-series resample primitive: per
    (event_type, day) counts with EVERY day of the observed span present
    for every type, absent days as exact zeros (dashboards and anomaly
    scans break on missing rows, not wrong ones).  The observed span
    comes from a bounded two-value aggregate; the dense grid (|types| x
    |days|, bounded) is generated driver-side and LEFT-joined to the
    count table through one exchange — event rows shuffle only as
    per-(type, day) partials."""
    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_join

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["ts", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_type": b["event_type"],
                             "day": b["ts"].dt.floor("D"),
                             "n": np.int64(1)})

    counts = hash_aggregate(ds.map_batches(partial, batch_format="pandas"),
                            keys=["event_type", "day"], aggs={"n": "sum"},
                            n_partitions=8).materialize()  # consumed twice

    # bounded: one (type, min, max) row PER BATCH reaches the driver
    meta = counts.map_batches(
        lambda b: b.groupby("event_type", as_index=False).agg(
            lo=("day", "min"), hi=("day", "max")),
        batch_format="pandas",
    ).to_pandas()
    if not len(meta):  # empty table: empty grid, matching the oracle
        return pd.DataFrame({
            "event_type": pd.Series([], dtype="object"),
            "day": pd.Series([], dtype="datetime64[us]"),
            "n": pd.Series([], dtype="int64"),
        })
    lo, hi = meta["lo"].min(), meta["hi"].max()
    types = sorted(meta["event_type"].unique())
    days = pd.date_range(lo, hi, freq="D")
    grid = pd.DataFrame({
        "event_type": np.repeat(types, len(days)),
        "day": np.tile(days, len(types)),
    })
    grid["gk"] = grid["event_type"] + "|" + grid["day"].astype(str)

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "gk": b["event_type"] + "|" + b["day"].astype(str),
            "n": b["n"].astype("int64"),
        })

    j = exchange_join(
        rd.from_pandas(grid),
        counts.map_batches(keyed, batch_format="pandas"),
        on="gk", how="left", n_partitions=8,
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": b["event_type"],
            "day": b["day"],
            "n": b["n"].fillna(0).astype("int64"),
        })

    return j.map_batches(finish, batch_format="pandas")


def q_events_retention(sf_dir: str):
    """Cohort retention matrix: users grouped by first-activity week
    (Monday-truncated, DuckDB date_trunc('week') parity), counted as
    retained in each later week they act in.  One exchange by user —
    every user's rows co-locate, so each partition derives (cohort_week,
    week_offset) per user locally and emits partial counts; a bounded
    second aggregate sums the matrix (weeks x weeks cells, tiny)."""
    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_map_partitions

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        week = (g["ts"] - pd.to_timedelta(g["ts"].dt.dayofweek, unit="D")
                ).dt.normalize()
        g = pd.DataFrame({"user_id": g["user_id"], "week": week})
        g = g.drop_duplicates()
        cw = g.groupby("user_id")["week"].transform("min")
        off = ((g["week"] - cw).dt.days // 7).astype("int64")
        out = pd.DataFrame({"cohort_week": cw, "week_offset": off, "n_users": 1})
        return out.groupby(["cohort_week", "week_offset"], as_index=False)[
            "n_users"].sum()

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )
    parts = exchange_map_partitions(ds, ["user_id"], per_user, n_partitions=None)
    out = hash_aggregate(
        parts, keys=["cohort_week", "week_offset"],
        aggs={"n_users": "sum"}, n_partitions=4,
    ).to_pandas()
    out["n_users"] = out["n_users"].astype("int64")
    return out


def q_events_sessions(sf_dir: str):
    """30-minute-gap sessionization (streaming-window pattern).  Users are
    hash-exchanged into a bounded number of partitions (raw-task exchange —
    per-user map_groups would pay the distinct-key groupby cost); each
    partition sessionizes all its users vectorized (sort by user+ts, one
    diff, one groupby-sum).  Partitioning assumption: all events of one
    user share a partition (guaranteed by the key hash)."""
    from ocr_ray.stages.join import exchange_map_partitions

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                 "n_sessions": pd.Series([], dtype="int64")})
        g = g.sort_values(["user_id", "ts"])
        new_user = g["user_id"].ne(g["user_id"].shift())
        gap = g["ts"].diff() > pd.Timedelta(minutes=30)
        starts = (new_user | gap).astype("int64")
        out = starts.groupby(g["user_id"].to_numpy()).sum()
        return pd.DataFrame(
            {"user_id": out.index.astype("int64"),
             "n_sessions": out.to_numpy().astype("int64")}
        )

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"])
    out = exchange_map_partitions(ds, "user_id", sessions, n_partitions=32).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["n_sessions"] = out["n_sessions"].astype("int64")
    return out


def q_fk_violations(sf_dir: str):
    """Referential-integrity gate (the FK sibling of validate.py's
    contract_check): count orphan foreign keys across the star schema's
    four edges via ANTI exchange joins that ship KEY COLUMNS ONLY — each
    check is one bounded exchange and a count, never a row
    materialization.  A nonzero cell quarantines the ingest shard before
    any downstream join silently drops (inner) or null-pads (left) the
    orphans.

    NULL child keys ARE violations (they reference nothing): they are
    counted via a per-batch null-count partial on the same pruned scan —
    the int64 cast would crash on them and the hash exchange would never
    match them, and the naive SQL ``NOT IN`` silently drops them, which
    is exactly the under-report an integrity gate must not make."""
    from ocr_ray.stages.join import exchange_join

    def footer_null_count(path, col) -> "int | None":
        # parquet footers carry per-row-group null counts — the null leg
        # of the gate costs a metadata read, not a data scan (at 100 TB
        # that's one footer per file, embarrassingly parallel); any row
        # group without statistics falls back to the counting scan
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        total = 0
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_null_count:
                return None
            total += st.null_count
        return total

    def orphans(child_file, child_key, parent_file, parent_key):
        child_path = os.path.join(sf_dir, child_file)
        child = rd.read_parquet(child_path, columns=[child_key])

        n_null = footer_null_count(child_path, child_key)
        if n_null is None:  # stats absent: count with one pruned scan
            def null_partial(b: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame({"n": [int(b[child_key].isna().sum())]})

            nulls_df = child.map_batches(
                null_partial, batch_format="pandas").to_pandas()
            n_null = int(nulls_df["n"].sum()) if "n" in nulls_df.columns else 0

        nonnull = child.map_batches(
            lambda b, k=child_key: b[b[k].notna()].astype({k: "int64"}),
            batch_format="pandas")
        parent = rd.read_parquet(os.path.join(sf_dir, parent_file),
                                 columns=[parent_key])
        return n_null + int(exchange_join(nonnull, parent, on=child_key,
                                          right_on=parent_key, how="anti",
                                          n_partitions=None).count())

    rows = [
        ("lineitem.l_orderkey->orders",
         orphans("lineitem.parquet", "l_orderkey",
                 "orders.parquet", "o_orderkey")),
        ("lineitem.l_partkey->part",
         orphans("lineitem.parquet", "l_partkey",
                 "part.parquet", "p_partkey")),
        ("lineitem.l_suppkey->supplier",
         orphans("lineitem.parquet", "l_suppkey",
                 "supplier.parquet", "s_suppkey")),
        ("orders.o_custkey->customer",
         orphans("orders.parquet", "o_custkey",
                 "customer.parquet", "c_custkey")),
    ]
    out = pd.DataFrame(rows, columns=["fk", "n_orphans"])
    out["n_orphans"] = out["n_orphans"].astype("int64")
    return out.sort_values("fk").reset_index(drop=True)


def q_snapshot_diff(sf_dir: str):
    """Keyed snapshot diff (stages/validate.py:snapshot_diff — the
    did-the-new-pipeline-version-change-anything regression primitive):
    diff the orders table against a deterministically mutated second
    snapshot (urgent orders dropped = removed, odd keys repriced =
    changed, every 97th key re-added under a shifted id = added) and
    report per-status counts.  Each side ships (key, row-fingerprint)
    only — payload columns never move; ONE key exchange merges the
    fingerprints; the rollup is a 4-row aggregate."""
    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.validate import snapshot_diff

    def side_a(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": b["o_orderkey"].to_numpy(),
                             "p": b["o_totalprice"].to_numpy()})

    def side_b(b: pd.DataFrame) -> pd.DataFrame:
        k = b["o_orderkey"].to_numpy()
        p = b["o_totalprice"].to_numpy()
        keep = (b["o_orderpriority"] != "1-URGENT").to_numpy()
        base = pd.DataFrame({"k": k[keep],
                             "p": np.where(k[keep] % 2 == 1,
                                           p[keep] + 1.0, p[keep])})
        add = pd.DataFrame({"k": k[k % 97 == 0] + 1_000_000_000,
                            "p": p[k % 97 == 0]})
        return pd.concat([base, add], ignore_index=True)

    cols = ["o_orderkey", "o_totalprice", "o_orderpriority"]
    left = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                           columns=cols[:2]).map_batches(
        side_a, batch_format="pandas")
    right = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                            columns=cols).map_batches(
        side_b, batch_format="pandas")
    d = snapshot_diff(left, right, key_col="k", compare_cols=["p"],
                      n_partitions=None)

    def cnt(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(n=np.int64(1))
        return b.groupby("status", as_index=False)[["n"]].sum()

    out = hash_aggregate(d.map_batches(cnt, batch_format="pandas"),
                         keys=["status"], aggs={"n": "sum"},
                         n_partitions=2).to_pandas()
    if not len(out):
        return pd.DataFrame({"status": pd.Series(dtype=object),
                             "n": pd.Series(dtype="int64")})
    out["n"] = out["n"].astype("int64")
    return out.sort_values("status").reset_index(drop=True)


def q_events_markov(sf_dir: str):
    """Per-user event-type transition matrix (first-order Markov counts —
    the sequence-mining aggregate behind 'what do users do NEXT').  One
    hash exchange on user_id co-locates each user's events; each partition
    sorts (user, ts, event_id) once and reads consecutive-pair transitions
    with a vectorized shift (factorize-coded user boundaries, so a
    SQL-null user group still chains like PARTITION BY does); the final
    rollup is a bounded (|event_types|^2) aggregate.  Raw events shuffle
    once — there is no per-user loop and no driver materialization."""
    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_map_partitions

    def trans(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"src_type": pd.Series(dtype=object),
                              "dst_type": pd.Series(dtype=object),
                              "n_trans": pd.Series(dtype="int64")})
        if not len(g) or "user_id" not in g.columns:
            return empty  # all-empty exchange carries the pre-map schema
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        # factorize (NaN gets a real code): null users form ONE chain,
        # matching SQL's PARTITION BY null-grouping — a plain != on the
        # raw values would break every null-null adjacency (NaN != NaN)
        codes, _ = pd.factorize(g["user_id"], use_na_sentinel=False)
        same = codes[1:] == codes[:-1]
        if not same.any():
            return empty
        et = g["event_type"].to_numpy()
        d = pd.DataFrame({"src_type": et[:-1][same], "dst_type": et[1:][same],
                          "n_trans": np.int64(1)})
        return d.groupby(["src_type", "dst_type"], as_index=False,
                         dropna=False)[["n_trans"]].sum()

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    pairs = exchange_map_partitions(ds, "user_id", trans, n_partitions=None)
    out = hash_aggregate(pairs, keys=["src_type", "dst_type"],
                         aggs={"n_trans": "sum"}, n_partitions=2).to_pandas()
    if not len(out):
        return pd.DataFrame({"src_type": pd.Series(dtype=object),
                             "dst_type": pd.Series(dtype=object),
                             "n_trans": pd.Series(dtype="int64")})
    out["n_trans"] = out["n_trans"].astype("int64")
    return (out[["src_type", "dst_type", "n_trans"]]
            .sort_values(["src_type", "dst_type"]).reset_index(drop=True))


# ================================================================ joins
def q_segment_revenue(sf_dir: str):
    """Both-sides hash join (orders x customer via Dataset.join) then a tiny
    groupby over market segments."""
    from ocr_ray.stages.join import hash_join

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    joined = hash_join(orders, cust, on="o_custkey", right_on="c_custkey", n_partitions=8)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(
            total_cents=np.floor(b["o_totalprice"] * 100 + 0.5).astype("int64"), n_orders=1
        )
        return b.groupby("c_mktsegment", as_index=False)[["n_orders", "total_cents"]].sum()

    out = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("c_mktsegment")
        .aggregate(Sum("n_orders", alias_name="n_orders"), Sum("total_cents", alias_name="total_cents"))
        .to_pandas()
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    out["total_cents"] = out["total_cents"].astype("int64")
    return out


def q_events_window(sf_dir: str):
    """Sliding-window aggregate: per event type, events in the trailing
    3-hour window at each active hour.  Plan: hourly pre-aggregate (tiny)
    -> per-type time-based rolling sum (pandas rolling('3h') on the sparse
    hourly series == SQL RANGE frame over discrete hours)."""
    from ocr_ray.stages.aggregate import hash_aggregate

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(hour=b["ts"].dt.floor("h"), n=1)
        return b.groupby(["event_type", "hour"], as_index=False)[["n"]].sum()

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"])
    hourly = hash_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["event_type", "hour"],
        aggs={"n": "sum"},
    )

    def window(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"event_type": pd.Series([], dtype="object"),
                                 "hour": pd.Series([], dtype="datetime64[us]"),
                                 "n_3h": pd.Series([], dtype="int64")})
        parts = []
        for _, sub in g.groupby("event_type", sort=False):
            sub = sub.sort_values("hour")
            roll = sub.set_index("hour")["n"].rolling("3h").sum().astype("int64").to_numpy()
            parts.append(pd.DataFrame(
                {"event_type": sub["event_type"].to_numpy(),
                 "hour": sub["hour"].to_numpy(), "n_3h": roll}))
        return pd.concat(parts, ignore_index=True)

    from ocr_ray.stages.join import exchange_map_partitions

    out = exchange_map_partitions(hourly, "event_type", window, n_partitions=8).to_pandas()
    out["n_3h"] = out["n_3h"].astype("int64")
    return out


def q_events_asof(sf_dir: str):
    """As-of join: each purchase event attributed to the user's most recent
    signup at-or-before it (backward merge_asof over a two-sided hash
    exchange, ocr_ray/stages/join.py:asof_join)."""
    from ocr_ray.stages.join import asof_join

    ev = os.path.join(sf_dir, "events.parquet")
    purchases = rd.read_parquet(ev, columns=["user_id", "ts", "event_type", "value"]).filter(
        expr="event_type == 'purchase'"
    )
    signups = rd.read_parquet(ev, columns=["user_id", "ts", "event_type"]).filter(
        expr="event_type == 'signup'"
    )

    def strip_l(b: pd.DataFrame) -> pd.DataFrame:
        return b[["user_id", "ts", "value"]]

    def strip_r(b: pd.DataFrame) -> pd.DataFrame:
        # merge_asof drops the right's `on` column: carry it as a value col
        return pd.DataFrame(
            {"user_id": b["user_id"], "ts": b["ts"], "signup_ts": b["ts"]}
        )

    joined = asof_join(
        purchases.map_batches(strip_l, batch_format="pandas"),
        signups.map_batches(strip_r, batch_format="pandas"),
        by="user_id",
        on="ts",
        n_partitions=None,
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        gap = (b["ts"] - b["signup_ts"]).dt.total_seconds() // 60
        return pd.DataFrame(
            {
                "user_id": b["user_id"].astype("int64"),
                "ts": b["ts"],
                "value_cents": np.floor(b["value"] * 100 + 0.5).astype("int64"),
                "gap_min": gap.fillna(-1).astype("int64"),
            }
        )

    return joined.map_batches(finish, batch_format="pandas")


def q_events_range_join(sf_dir: str):
    """Range join: assign every event to the session interval containing it.
    Session intervals (30-min gap, per user) are built as a separate
    Dataset, then ``range_join`` (two-sided hash exchange + per-key binary
    search, ocr_ray/stages/join.py) attaches session_idx to each event."""
    from ocr_ray.stages.join import range_join

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"])

    def session_intervals(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                 "session_idx": pd.Series([], dtype="int64"),
                                 "start_ts": pd.Series([], dtype="datetime64[us]"),
                                 "end_ts": pd.Series([], dtype="datetime64[us]")})
        g = g.sort_values(["user_id", "ts"])
        new_u = g["user_id"].ne(g["user_id"].shift())
        gap = g["ts"].diff() > pd.Timedelta(minutes=30)
        new_s = new_u | gap
        sidx = (new_s.groupby(g["user_id"].to_numpy()).cumsum() - 1).astype("int64")
        df = pd.DataFrame({"user_id": g["user_id"], "ts": g["ts"], "session_idx": sidx})
        return df.groupby(["user_id", "session_idx"], as_index=False).agg(
            start_ts=("ts", "min"), end_ts=("ts", "max")
        )

    from ocr_ray.stages.join import exchange_map_partitions

    intervals = exchange_map_partitions(ev, "user_id", session_intervals,
                                        n_partitions=None)
    out = range_join(
        ev, intervals, by="user_id", point_col="ts",
        start_col="start_ts", end_col="end_ts", idx_col="session_idx",
        n_partitions=None,
    ).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["session_idx"] = out["session_idx"].astype("int64")
    return out


def q_customers_no_orders(sf_dir: str):
    """Distributed ANTI join (join.py:exchange_join how='anti'): customers
    with no order since 2001-01-01 (the churn query).  The date predicate
    is pushed into the orders scan; both sides hash-exchange on custkey;
    each partition probes its right key set in Arrow — the right side
    ships keys only, the left schema survives even in empty partitions,
    no driver materialization."""
    from ocr_ray.stages.join import exchange_join

    cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: b.astype({"c_custkey": "int64"}), batch_format="pandas")
    import pyarrow as pa
    import pyarrow.dataset as pads

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey"],
        filter=pads.field("o_orderdate")
        >= pa.scalar(pd.Timestamp("2001-01-01")),
    )
    return exchange_join(cust, orders, on="c_custkey", right_on="o_custkey",
                         n_partitions=None, how="anti")


def q_parts_ordered(sf_dir: str):
    """Distributed SEMI join (join.py:exchange_join how='semi'): parts that
    appear in at least one lineitem — same exchange shape as the anti."""
    from ocr_ray.stages.join import exchange_join

    part = rd.read_parquet(os.path.join(sf_dir, "part.parquet"),
                           columns=["p_partkey", "p_brand"]).map_batches(
        lambda b: b.astype({"p_partkey": "int64"}), batch_format="pandas")
    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_partkey"])
    return exchange_join(part, li, on="p_partkey", right_on="l_partkey",
                         n_partitions=None, how="semi")


def q_orders_line_gaps(sf_dir: str):
    """Per-key sequence-integrity validation (stages/validate.py:
    sequence_validation) — the transcript turn_idx gap/duplicate detector
    grafted onto lineitem line numbers (conv_id -> l_orderkey, turn_idx ->
    l_linenumber, 1-based).  Per-batch pair-dedup partial, one bounded hash
    exchange of the distinct-pair table, per-partition vectorized stats —
    raw rows never shuffle."""
    from ocr_ray.stages.validate import sequence_validation

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber"],
    ).map_batches(
        lambda b: b.astype({"l_orderkey": "int64", "l_linenumber": "int64"}),
        batch_format="pandas",
    )
    return sequence_validation(
        li, key_col="l_orderkey", idx_col="l_linenumber", base=1, n_partitions=None
    )


def q_supplier_regions(sf_dir: str):
    """Multi-way broadcast join: supplier -> nation -> region (both
    dimensions tiny, shipped once via ray.put) + account-balance aggregate
    per region."""
    from ocr_ray.stages.aggregate import hash_aggregate

    nation = pd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_regionkey"]
    )
    region = pd.read_parquet(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    n2r = dict(zip(nation["n_nationkey"].astype("int64"),
                   nation["n_regionkey"].astype("int64")))
    r2name = dict(zip(region["r_regionkey"].astype("int64"), region["r_name"]))
    ref = ray.put((n2r, r2name))

    def attach(b: pd.DataFrame) -> pd.DataFrame:
        n2r_, r2name_ = ray.get(ref)
        rkey = b["s_nationkey"].map(n2r_)
        return pd.DataFrame(
            {
                "r_name": rkey.map(r2name_),
                "n_suppliers": 1,
                "acct_cents": np.floor(b["s_acctbal"] * 100 + 0.5).astype("int64"),
            }
        )

    ds = rd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_nationkey", "s_acctbal"]
    )
    out = hash_aggregate(
        ds.map_batches(attach, batch_format="pandas"),
        keys=["r_name"],
        aggs={"n_suppliers": "sum", "acct_cents": "sum"},
    ).to_pandas()
    out["n_suppliers"] = out["n_suppliers"].astype("int64")
    out["acct_cents"] = out["acct_cents"].astype("int64")
    return out


def q_orders_cust_totals(sf_dir: str):
    """LEFT OUTER join after a partial aggregate: per-customer order count
    and integer-cents revenue, customers with no orders kept with zeros.
    Scale shape: orders are combined per batch then hash-aggregated on
    o_custkey (bounded partitions), and only that REDUCED table meets the
    customer table in the left exchange join (join.py:exchange_join
    how='left') — the fact table itself never joins row-for-row."""
    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_join

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    ).map_batches(lambda b: b.astype({"c_custkey": "int64"}),
                  batch_format="pandas")

    def to_cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_custkey": b["o_custkey"].astype("int64"),
                "n_orders": 1,
                "total_cents": np.floor(
                    b["o_totalprice"] * 100 + 0.5
                ).astype("int64"),
            }
        )

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"],
    ).map_batches(to_cents, batch_format="pandas")
    agg = hash_aggregate(
        orders, keys=["o_custkey"],
        aggs={"n_orders": "sum", "total_cents": "sum"},
    )

    def fill(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": b["c_custkey"].astype("int64"),
                "c_mktsegment": b["c_mktsegment"],
                "n_orders": b["n_orders"].fillna(0).astype("int64"),
                "total_cents": b["total_cents"].fillna(0).astype("int64"),
            }
        )

    return exchange_join(
        cust, agg, on="c_custkey", right_on="o_custkey",
        n_partitions=None, how="left",
    ).map_batches(fill, batch_format="pandas")


def q_events_gaps(sf_dir: str):
    """Per-key LAG/LEAD analog without a window shuffle: per-user
    inter-event gap statistics (n_events, time span, max gap — all exact
    int64 microseconds).  One hash exchange on user_id, then a single
    vectorized sort-diff per partition covering every key in it
    (join.py:exchange_map_partitions); sum/max of sorted-timestamp diffs
    are order-invariant under ties, so no tiebreak column is needed."""
    from ocr_ray.stages.join import exchange_map_partitions

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype="int64"),
                 "n_events": pd.Series([], dtype="int64"),
                 "span_us": pd.Series([], dtype="int64"),
                 "max_gap_us": pd.Series([], dtype="int64")}
            )
        g = g.sort_values(["user_id", "ts"])
        # normalize to microseconds explicitly: a ns-unit input would make
        # bare astype('int64') silently emit nanoseconds (1000x the oracle)
        us = g["ts"].values.astype("datetime64[us]").astype("int64")
        uid = g["user_id"].to_numpy(dtype="int64")
        d = np.diff(us)
        same = uid[1:] == uid[:-1]  # mask cross-user diffs
        dd = np.where(same, d, 0)
        first = np.r_[True, ~same]
        gid = np.cumsum(first) - 1
        n_users = int(first.sum())
        n_events = np.bincount(gid, minlength=n_users)
        span = np.zeros(n_users, dtype="int64")
        mx = np.zeros(n_users, dtype="int64")
        np.add.at(span, gid[1:][same], dd[same])
        np.maximum.at(mx, gid[1:][same], dd[same])
        return pd.DataFrame(
            {
                "user_id": uid[first],
                "n_events": n_events.astype("int64"),
                "span_us": span,
                "max_gap_us": mx,
            }
        )

    return exchange_map_partitions(ds, "user_id", gaps, n_partitions=32)


def q_events_rollup(sf_dir: str):
    """GROUPING SETS / ROLLUP over (event_type, day): one streaming
    combiner pass computes the FINEST granularity (hash_aggregate — the
    only pass that touches raw rows); the coarser levels re-aggregate that
    bounded |types|x|days| table, so the rollup costs one scan regardless
    of how many levels it emits.  Rolled-up dimensions carry the 'ALL'
    sentinel (strings both sides — no null-vs-sentinel ambiguity)."""
    from ocr_ray.stages.aggregate import hash_aggregate

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts", "value"]
    )

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": b["event_type"],
                "day": b["ts"].dt.floor("D").dt.strftime("%Y-%m-%d"),
                "n_events": 1,
                "value_cents": np.floor(b["value"] * 100 + 0.5).astype("int64"),
            }
        )

    fine = hash_aggregate(
        ds.map_batches(prep, batch_format="pandas"),
        keys=["event_type", "day"],
        aggs={"n_events": "sum", "value_cents": "sum"},
    ).to_pandas()  # bounded: |event types| x |days|
    by_type = fine.groupby("event_type", as_index=False)[
        ["n_events", "value_cents"]
    ].sum()
    by_type["day"] = "ALL"
    total = pd.DataFrame(
        {
            "event_type": ["ALL"],
            "day": ["ALL"],
            "n_events": [fine["n_events"].sum()],
            "value_cents": [fine["value_cents"].sum()],
        }
    )
    out = pd.concat([fine, by_type, total], ignore_index=True)[
        ["event_type", "day", "n_events", "value_cents"]
    ]
    out["n_events"] = out["n_events"].astype("int64")
    out["value_cents"] = out["value_cents"].astype("int64")
    return out


def q_events_pivot(sf_dir: str):
    """PIVOT: daily event counts spread into one column per event type
    (the wide activity report).  The one-hot indicators are emitted inside
    the combiner map, so the pivot rides the same single-pass partial ->
    hash-exchange aggregate as any narrow groupby — no crosstab shuffle,
    and the output width is fixed by the (bounded, known) type vocabulary."""
    from ocr_ray.stages.aggregate import hash_aggregate

    types = ["click", "error", "purchase", "signup", "view"]
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )

    def onehot(b: pd.DataFrame) -> pd.DataFrame:
        out = {"day": b["ts"].dt.floor("D").dt.strftime("%Y-%m-%d")}
        for t in types:
            out[f"n_{t}"] = (b["event_type"] == t).astype("int64")
        out["n_total"] = np.ones(len(b), dtype="int64")
        return pd.DataFrame(out)

    aggs = {f"n_{t}": "sum" for t in types}
    aggs["n_total"] = "sum"
    out = hash_aggregate(
        ds.map_batches(onehot, batch_format="pandas"), keys=["day"], aggs=aggs
    ).to_pandas()
    for c in out.columns:
        if c != "day":
            out[c] = out[c].astype("int64")
    return out


def q_embed_gram(sf_dir: str):
    """Distributed Gram matrix X^T X over the int8-quantized embedding
    table — the covariance/whitening building block computed as a
    per-batch partial outer-product accumulation (D x D int64 per batch,
    D=64) summed through the bounded hash exchange; upper triangle only.
    Raw vectors never shuffle — each batch contributes one 4k-cell
    partial, so the exchange traffic is O(batches x D^2), independent of
    N.  Integer codes (similarity.py:quantize_int8) make every cell exact,
    so the oracle value-checks all 2080 sums."""
    from ocr_ray.api import gram_matrix

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )
    return gram_matrix(ds, dim=64)


def q_io_jsonl_roundtrip(sf_dir: str):
    """JSONL source/sink round-trip (S5 writer + trainer-ingest reader):
    export the documents table as sharded JSONL (api.export_jsonl — one
    shard per block, resumable per partition), read it back with
    ray.data.read_json, and aggregate per-language doc count + char sum
    through the streaming hash aggregate.  The oracle aggregates the
    original parquet directly, so the check proves the round-trip is
    lossless for every row that feeds the aggregate."""
    import shutil
    import tempfile

    from ocr_ray.api import export_jsonl
    from ocr_ray.stages.aggregate import hash_aggregate

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    )
    tmp = tempfile.mkdtemp(prefix="ocr_ray_jsonl_")
    try:
        export_jsonl(ds, tmp)
        back = rd.read_json(tmp)

        def prep(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "lang": b["lang"],
                    "n_docs": 1,
                    "sum_chars": b["n_chars"].astype("int64"),
                }
            )

        out = hash_aggregate(
            back.map_batches(prep, batch_format="pandas"),
            keys=["lang"], aggs={"n_docs": "sum", "sum_chars": "sum"},
            n_partitions=4,
        ).to_pandas()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out["n_docs"] = out["n_docs"].astype("int64")
    out["sum_chars"] = out["sum_chars"].astype("int64")
    return out


def q_doc_fim(sf_dir: str):
    """Fill-in-the-middle training transform (Bavarian et al. 2022,
    arXiv:2207.14255): deterministically selected docs (doc_id % 2 == 0)
    are rearranged prefix/suffix/middle with sentinel tokens (PSM
    layout); split points are exact character thirds, so the transform
    is a pure per-row map — embarrassingly parallel, zero shuffle — and
    the oracle replays it with substr arithmetic."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def fim(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(dtype="int64")
        out, kinds = [], []
        for i, t in zip(ids, b["text"]):
            n = len(t)
            if i % 2 == 0 and n >= 3:
                p1, p2 = n // 3, 2 * n // 3
                out.append(
                    "<PRE>" + t[:p1] + "<SUF>" + t[p2:] + "<MID>" + t[p1:p2]
                )
                kinds.append("psm")
            else:
                out.append(t)
                kinds.append("plain")
        return pd.DataFrame(
            {"doc_id": ids, "fim_text": out, "layout": kinds}
        )

    return ds.map_batches(fim, batch_format="pandas")


def q_doc_echo(sf_dir: str):
    """Quality-weighted data echoing (the 'repeat good data' sampling of
    curated-corpus training, cf. Muennighoff et al. 2023 data-constrained
    scaling): each doc is replicated ``1 + (n_chars >= 300)`` times with
    an epoch index — a deterministic per-row explode (flat map), zero
    shuffle, and the oracle replays it with generate_series."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )

    def echo(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(dtype="int64")
        reps = 1 + (b["n_chars"].to_numpy(dtype="int64") >= 300).astype("int64")
        return pd.DataFrame(
            {
                "doc_id": np.repeat(ids, reps),
                "epoch": np.concatenate(
                    [np.arange(r, dtype="int64") for r in reps]
                ) if len(b) else np.array([], dtype="int64"),
                "n_epochs": np.repeat(reps, reps),
            }
        )

    return ds.map_batches(echo, batch_format="pandas")


def q_events_daily_overlap(sf_dir: str):
    """FULL OUTER join of two per-day aggregates (signup days vs
    purchase days — the activity-overlap report): both sides pre-reduced
    through the hash aggregate before a full-outer exchange join, missing
    sides surfaced as exact zeros."""
    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_join

    def per_day(event_type: str, out_col: str):
        ds = rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "ts"],
        ).map_batches(
            lambda b, et=event_type, oc=out_col: pd.DataFrame(
                {
                    "day": b["ts"][b["event_type"] == et]
                    .dt.floor("D").dt.strftime("%Y-%m-%d"),
                    oc: np.int64(1),
                }
            ),
            batch_format="pandas",
        )
        return hash_aggregate(ds, keys=["day"], aggs={out_col: "sum"},
                              n_partitions=8)

    signups = per_day("signup", "n_signups")
    purchases = per_day("purchase", "n_purchases")

    def fill(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "day": b["day"].astype(object),
                "n_signups": b["n_signups"].fillna(0).astype("int64"),
                "n_purchases": b["n_purchases"].fillna(0).astype("int64"),
            }
        )

    return exchange_join(
        signups, purchases, on="day", n_partitions=8, how="outer",
    ).map_batches(fill, batch_format="pandas")


def q_events_latest(sf_dir: str):
    """CDC / upsert compaction: the LATEST event row per user
    (last-write-wins by (ts, event_id) — the lakehouse MERGE/compact
    primitive).  Per-batch argmax partial first, so only one candidate
    row per (batch, user) enters the exchange; a second argmax per
    partition finishes — raw rows never shuffle twice and the reduce is
    bounded by |users|."""
    from ocr_ray.stages.join import exchange_map_partitions

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def latest(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return b
        b = b.sort_values(["user_id", "ts", "event_id"])
        out = b.groupby("user_id", as_index=False).tail(1)
        return pd.DataFrame(
            {
                "user_id": out["user_id"].to_numpy(dtype="int64"),
                "event_id": out["event_id"].to_numpy(dtype="int64"),
                "ts": out["ts"],
                "event_type": out["event_type"],
                "value": out["value"].to_numpy(dtype="float64"),
            }
        )

    partial = ds.map_batches(latest, batch_format="pandas")
    return exchange_map_partitions(partial, "user_id", latest, n_partitions=None)


def q_embed_dim_stats(sf_dir: str):
    """Per-dimension distribution statistics over the int8-quantized
    embedding table (the 'fit' half of feature standardization /
    whitening): n, sum, sum-of-squares, min, max per dimension — every
    value an exact int64, computed as per-batch partials reduced through
    the bounded hash exchange.  Exchange traffic is O(batches x D),
    independent of N."""
    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.similarity import quantize_int8

    dim = 64

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in b["embedding"]])
        codes, _ = quantize_int8(m)
        return pd.DataFrame(
            {
                "i": np.arange(dim, dtype="int64"),
                "n": np.full(dim, len(b), dtype="int64"),
                "sum_q": codes.sum(axis=0),
                "sumsq_q": (codes * codes).sum(axis=0),
                "min_q": codes.min(axis=0),
                "max_q": codes.max(axis=0),
            }
        )

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )
    out = hash_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["i"],
        aggs={"n": "sum", "sum_q": "sum", "sumsq_q": "sum",
              "min_q": "min", "max_q": "max"},
        n_partitions=8,
    ).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def q_fuzzy_join_customers(sf_dir: str):
    """Blocked fuzzy join (record linkage) at edit distance <= 1:
    customer names vs a deterministically corrupted copy (every 7th
    customer's name with one character dropped at position custkey %
    len).  Deletion-signature blocking (stages/join.py:fuzzy_join_ed1 —
    the SymSpell scheme) gives PROVABLY exact recall for the <=1 band
    with O(rows x strlen) signature volume, so the oracle's brute-force
    cross-join levenshtein filter must match exactly."""
    from ocr_ray.stages.join import fuzzy_join_ed1

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
    )
    left = cust.map_batches(
        lambda b: pd.DataFrame(
            {"left_id": b["c_custkey"].astype("int64"),
             "left_name": b["c_name"].astype("string")}),
        batch_format="pandas")

    def mutate(b: pd.DataFrame) -> pd.DataFrame:
        keep = (b["c_custkey"] % 7 == 0).to_numpy()
        k = b["c_custkey"].to_numpy(dtype="int64")[keep]
        orig = b["c_name"].to_numpy()[keep]
        names = [n[:p] + n[p + 1:] for n, p in zip(orig, k % np.char.str_len(orig.astype(str)))]
        return pd.DataFrame(
            {"right_id": k + 10_000_000,
             "right_name": pd.Series(names, dtype="string")}
        )

    right = cust.map_batches(mutate, batch_format="pandas")
    return fuzzy_join_ed1(left, right, n_partitions=None)


# Tokens feeding BPE training: ASCII-only so Python re and DuckDB RE2
# agree on \b word boundaries in the merge-application regex.
_BPE_TOKEN = re.compile(r"[a-z0-9]+")
BPE_MERGES = 3


def q_bpe_train(sf_dir: str):
    """Distributed BPE tokenizer training (the merge-table learner of a
    GPT-style tokenizer) — 3 merge rounds over the corpus word vocabulary.

    Scale shape: the corpus is scanned ONCE to build the weighted word
    vocabulary (token explode -> hash_aggregate; bounded by |vocab|, not
    corpus size).  Each round then (a) explodes adjacent symbol pairs per
    distinct word weighted by word count (map_batches partial sums), (b)
    hash-aggregates pair counts (bounded: <= |symbol alphabet|^2 rows),
    (c) takes the global argmax (count desc, pair asc — deterministic
    ties) from that tiny aggregated table, and (d) applies the merge to
    the distributed vocab via a compiled \\b-anchored regex (left-to-right
    non-overlapping — exactly re.sub/RE2 semantics, which is what makes
    the chained-CTE DuckDB oracle value-exact).  Returns the merge table
    (step, left_s, right_s, cnt)."""
    from ocr_ray.stages.aggregate import hash_aggregate

    def tokenize(b: pd.DataFrame) -> pd.DataFrame:
        words = [w for t in b["text"] for w in _BPE_TOKEN.findall(t.lower())]
        return pd.DataFrame(
            {"word": pd.Series(words, dtype="string"),
             "cnt": np.ones(len(words), dtype="int64")}
        )

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    vocab = hash_aggregate(
        docs.map_batches(tokenize, batch_format="pandas"),
        keys=["word"], aggs={"cnt": "sum"}, n_partitions=None,
    ).map_batches(
        lambda b: pd.DataFrame(
            {"sym": [" ".join(w) for w in b["word"]], "cnt": b["cnt"].astype("int64")}
        ),
        batch_format="pandas",
    )

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        ls, rs, cs = [], [], []
        for sym, cnt in zip(b["sym"], b["cnt"]):
            parts = sym.split(" ")
            for a, z in zip(parts[:-1], parts[1:]):
                ls.append(a)
                rs.append(z)
                cs.append(cnt)
        return pd.DataFrame(
            {"left_s": pd.Series(ls, dtype="string"),
             "right_s": pd.Series(rs, dtype="string"),
             "cnt": np.asarray(cs, dtype="int64")}
        )

    merges = []
    for step in range(1, BPE_MERGES + 1):
        pairs = hash_aggregate(
            vocab.map_batches(pair_partial, batch_format="pandas"),
            keys=["left_s", "right_s"], aggs={"cnt": "sum"}, n_partitions=8,
        ).to_pandas()  # bounded: symbol-alphabet^2, a few hundred rows
        if not len(pairs):
            break
        pairs = pairs.sort_values(
            ["cnt", "left_s", "right_s"], ascending=[False, True, True]
        )
        top = pairs.iloc[0]
        l, r, cnt = str(top["left_s"]), str(top["right_s"]), int(top["cnt"])
        merges.append((step, l, r, cnt))
        pat = re.compile(rf"\b{re.escape(l)} {re.escape(r)}\b")
        rep = l + r

        def apply_merge(b: pd.DataFrame, pat=pat, rep=rep) -> pd.DataFrame:
            return pd.DataFrame(
                {"sym": [pat.sub(rep, s) for s in b["sym"]], "cnt": b["cnt"]}
            )

        vocab = vocab.map_batches(apply_merge, batch_format="pandas")

    return pd.DataFrame(
        merges, columns=["step", "left_s", "right_s", "cnt"]
    ).astype({"step": "int64", "cnt": "int64"})


# ================================================================ rag
RAG_QUERY = "data pipeline value"


def q_rag_keyword_topk(sf_dir: str):
    from ocr_ray.stages.rag import KeywordTopK

    ds = _doc(sf_dir)
    from ocr_ray.stages.taskpool import task_pool

    out = ds.map_batches(
        task_pool(KeywordTopK, query=RAG_QUERY, k=3), batch_format="pandas"
    ).to_pandas()
    out["rank"] = out["rank"].astype("int64")
    return out


def q_rag_bm25_topk(sf_dir: str):
    """Corpus-level BM25 retrieval (stages/rag.py:bm25_topk) for the RAG
    query terms: one text pass emits per-doc integer metadata, corpus
    stats reduce to scalars, scoring + per-block top-k run over metadata
    only — the text never re-scans or shuffles.  Scores rounded to 6 dp
    BEFORE the cut; ties break on doc_id."""
    from ocr_ray.stages.rag import bm25_topk

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return bm25_topk(docs, RAG_QUERY.split(), k=10)


def q_rag_bm25_rerank(sf_dir: str):
    """Retrieve-then-rerank composite (the classic two-stage retrieval
    stack): BM25 shortlists the top-50 documents (stages/rag.py:bm25_topk
    — metadata-only scoring, per-block top-k), then the model-backed A4
    scorer (stages/model_engine.py:ModelScorer, artifact loaded once per
    actor) reranks ONLY the shortlist — the expensive model never sees
    the corpus, which is the entire point of the cascade at 100 TB.  The
    shortlist text refetch is a pruned scan filtered by the 50-id set
    (shipped in-task; at scale push the id set into the reader
    predicate); the rerank itself is 50 driver rows.  Output
    (doc_id, score, model_score, rk) with rk the 1-based rerank by
    (model_score DESC, doc_id) — integer-exact model scores make the
    rerank order oracle-reproducible."""
    from ocr_ray.stages.model_engine import ModelScorer
    from ocr_ray.stages.rag import bm25_topk

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    short = bm25_topk(docs, RAG_QUERY.split(), k=50)
    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "score": pd.Series(dtype="float64"),
                          "model_score": pd.Series(dtype="int64"),
                          "rk": pd.Series(dtype="int64")})
    if not len(short):
        return empty
    ids = np.sort(short["doc_id"].to_numpy(dtype="int64"))
    path = _ensure_model_artifact()

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        return b[np.isin(b["doc_id"].to_numpy(), ids)]

    scored = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(pick, batch_format="pandas").map_batches(
        ModelScorer,
        fn_constructor_kwargs={"artifact_path": path},
        concurrency=2,
        batch_format="pandas",
    ).to_pandas()  # <= 50 rows
    out = short.merge(scored[["doc_id", "model_score"]], on="doc_id")
    out = out.sort_values(["model_score", "doc_id"],
                          ascending=[False, True], kind="mergesort")
    out["rk"] = np.arange(1, len(out) + 1, dtype="int64")
    out = out.astype({"doc_id": "int64", "score": "float64",
                      "model_score": "int64", "rk": "int64"})
    return out[["doc_id", "score", "model_score", "rk"]].reset_index(drop=True)


def q_rag_answer(sf_dir: str):
    from ocr_ray.stages.rag import AnswerExtractor

    from ocr_ray.stages.taskpool import task_pool

    return _doc(sf_dir).map_batches(
        task_pool(AnswerExtractor, query="what is the value"),
        batch_format="pandas",
    )


def q_rag_embed_answer(sf_dir: str):
    """R6 full RAG orchestration (rows-only; replica-checked in pytest):
    chunk -> hash-embed -> cosine top-3 -> heuristic answer, all inside one
    actor-pool stage (per-doc work, no shuffle)."""
    from ocr_ray.stages.rag import EmbedRAG

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    from ocr_ray.stages.taskpool import task_pool

    out = ds.map_batches(
        task_pool(EmbedRAG, query="what is the value", k=3, dim=EMBED_DIM),
        batch_format="pandas",
    )

    def typed(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["doc_id"] = b["doc_id"].astype("int64")
        b["n_chunks"] = b["n_chunks"].astype("int64")
        return b

    return out.map_batches(typed, batch_format="pandas")


def q_doc_chunks_para(sf_dir: str):
    from ocr_ray.stages.rag import para_chunk_batch

    return _doc(sf_dir).map_batches(para_chunk_batch, batch_format="pandas")


def q_doc_langs_distinct(sf_dir: str):
    vals = sorted(_doc(sf_dir).unique("lang"))
    return pd.DataFrame({"lang": vals})


# ================================================================ multimodal
def q_multimodal_meta(sf_dir: str):
    """Binary-column plumbing demo (rows-only): text payloads as opaque
    bytes through the stubbed image-decode actor stage."""
    import pyarrow as pa

    from ocr_ray.stages.multimodal import DecodeImageStub

    def to_binary(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {"doc_id": b["doc_id"], "payload": pc.cast(b["text"], pa.binary())}
        )

    ds = _doc(sf_dir).map_batches(to_binary, batch_format="pyarrow")
    from ocr_ray.stages.taskpool import task_pool

    decoded = ds.map_batches(
        task_pool(DecodeImageStub, real_decode=False),
        batch_format="pyarrow", batch_size=64,
    )

    def flatten(b: pa.Table) -> pd.DataFrame:
        meta = b["image_meta"].to_pylist()
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_pylist(),
                "content_hash": b["content_hash"].to_pylist(),
                "width": [m["width"] for m in meta],
                "height": [m["height"] for m in meta],
                "mode": [m["mode"] for m in meta],
            }
        )

    return decoded.map_batches(flatten, batch_format="pyarrow")


def q_multimodal_audio(sf_dir: str):
    """Audio feature-extraction plumbing: binary payloads through the
    MFCC-shaped stub actor stage; duration is SQL-checkable (sha512-derived
    mfcc values are pytest-checked — DuckDB lacks sha512)."""
    import pyarrow as pa

    from ocr_ray.stages.multimodal import AudioFeatureStub
    from ocr_ray.stages.taskpool import task_pool

    def to_binary(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"doc_id": b["doc_id"], "payload": pc.cast(b["text"], pa.binary())})

    feats = (
        _doc(sf_dir)
        .map_batches(to_binary, batch_format="pyarrow")
        .map_batches(task_pool(AudioFeatureStub, n_mfcc=13),
                     batch_format="pyarrow", batch_size=64)
    )

    def flatten(b: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_pylist(),
                "duration_sec": b["duration_sec"].to_pylist(),
                "n_mfcc": [len(v) for v in b["mfcc"].to_pylist()],
            }
        )

    return feats.map_batches(flatten, batch_format="pyarrow")


def q_multimodal_resize(sf_dir: str):
    """Image-resize plumbing: binary payloads through the resize stub;
    fully SQL-checkable (dims and scale factor are sha256-derived)."""
    import pyarrow as pa

    from ocr_ray.stages.multimodal import ResizeImageStub
    from ocr_ray.stages.taskpool import task_pool

    def to_binary(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"doc_id": b["doc_id"], "payload": pc.cast(b["text"], pa.binary())})

    resized = (
        _doc(sf_dir)
        .map_batches(to_binary, batch_format="pyarrow")
        .map_batches(task_pool(ResizeImageStub, max_dim=2048),
                     batch_format="pyarrow", batch_size=64)
    )

    def flatten(b: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_pylist(),
                "width": b["width"].to_pylist(),
                "height": b["height"].to_pylist(),
                "scaled": b["scaled"].to_pylist(),
                "out_len": pc.binary_length(b["payload"]).to_pylist(),
            }
        )

    return resized.map_batches(flatten, batch_format="pyarrow")


def q_multimodal_frames(sf_dir: str):
    """Video frame-sampling plumbing (rows-only): one row per sampled
    frame through the actor-pool flat-map stub, then a per-doc frame count
    (binary payloads, small batches)."""
    import pyarrow as pa

    from ocr_ray.stages.multimodal import FrameSampleStub
    from ocr_ray.stages.taskpool import task_pool

    def to_binary(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"doc_id": b["doc_id"], "payload": pc.cast(b["text"], pa.binary())})

    frames = (
        _doc(sf_dir)
        .map_batches(to_binary, batch_format="pyarrow")
        .map_batches(
            task_pool(FrameSampleStub, every_n=4),
            batch_format="pyarrow", batch_size=64,
        )
    )

    def count_frames(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("doc_id", as_index=False).agg(
            n_frames=("frame_idx", "size"), max_frame=("frame_idx", "max")
        )
        return g

    from ocr_ray.stages.aggregate import hash_aggregate

    out = hash_aggregate(
        frames.map_batches(count_frames, batch_format="pandas"),
        keys=["doc_id"],
        aggs={"n_frames": "sum", "max_frame": "max"},
    ).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_frames"] = out["n_frames"].astype("int64")
    out["max_frame"] = out["max_frame"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


MODEL_ARTIFACT_PATH = "/tmp/ocr_ray_quality_ridge.pkl"


def _ensure_model_artifact() -> str:
    """(Re)build the deterministic seed-0 A4 scorer artifact — the
    stand-in for a pretrained-weights download into the model cache.
    ALWAYS rewritten (the closed-form fit costs milliseconds): a stale
    pickle from an older code revision would otherwise pin a wrong or
    version-mismatched artifact forever, and never loading a
    pre-existing /tmp pickle also means a foreign file planted at the
    predictable path is overwritten, not executed."""
    from ocr_ray.stages.model_engine import build_model_artifact

    build_model_artifact(MODEL_ARTIFACT_PATH)
    return MODEL_ARTIFACT_PATH


def q_model_score_docs(sf_dir: str):
    """A4 model-backed engine, end-to-end: the ridge-scorer artifact loads
    ONCE PER ACTOR (stages/model_engine.py:ModelScorer.__init__ — the
    reference's lru_cache'd AutoModel load, src/ocr/nanonets_ocr.py:34-44)
    and each batch scores with a single int64 matmul.  Integer-exact, so
    the DuckDB oracle replicates the score from character-class counts and
    the driver value-checks the whole model path."""
    from ocr_ray.stages.model_engine import ModelScorer

    path = _ensure_model_artifact()
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = ds.map_batches(
        ModelScorer,
        fn_constructor_kwargs={"artifact_path": path},
        concurrency=2,           # actor pool: artifact deserialized twice total
        batch_format="pandas",   # (once per actor), never per batch
    )
    return out.select_columns(["doc_id", "model_score"])


TRANSCRIBER_ARTIFACT_PATH = "/tmp/graft_model/transcriber-seq2seq.pkl"


def q_multimodal_transcribe(sf_dir: str):
    """A5 worked example end-to-end (rows-only; replica-checked in pytest —
    autoregressive generation is not SQL-expressible): binary payloads
    through the generative ModelTranscriber actor pool
    (stages/model_engine.py — encoder/decoder tables loaded once per
    actor, greedy integer decode, the reference's ``min(1, len/100)``
    confidence, ``ocr_core/dolphin_reader.py:12-40``).  Small batches as
    the binary-column contract requires."""
    import pyarrow as pa

    from ocr_ray.stages.model_engine import (ModelTranscriber,
                                             build_transcriber_artifact)

    os.makedirs(os.path.dirname(TRANSCRIBER_ARTIFACT_PATH), exist_ok=True)
    build_transcriber_artifact(TRANSCRIBER_ARTIFACT_PATH)

    def to_binary(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {"doc_id": b["doc_id"], "payload": pc.cast(b["text"], pa.binary())}
        )

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(to_binary, batch_format="pyarrow")
    return ds.map_batches(
        ModelTranscriber,
        fn_constructor_kwargs={"artifact_path": TRANSCRIBER_ARTIFACT_PATH},
        concurrency=2,            # actor pool: tables deserialized once per actor
        batch_size=64,            # binary columns: small batches
        batch_format="pandas",
    )


def q_rag_model_answer(sf_dir: str):
    """A6 pluggable QA model through the full RAG orchestration: EmbedRAG
    with the deterministic HF-pipeline stand-in injected as ``answer_fn``
    (stages/rag.py:SentenceOverlapQA; the reference slot is
    ocr_app/models/model_manager.py:114-157's distilbert-squad pipeline).
    Non-SQL-expressible (model answers); rows-only driver check + the
    replica pytest in tests/test_model_engine.py value-checks semantics."""
    from ocr_ray.stages.rag import EmbedRAG, SentenceOverlapQA

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(
        EmbedRAG,
        fn_constructor_kwargs={"query": "what is the quality metric",
                               "answer_fn": SentenceOverlapQA},
        concurrency=2,
        batch_format="pandas",
    )


def q_doc_lang_gate(sf_dir: str):
    """Per-language adaptive quality gate
    (stages/analysis.py:grouped_quantile_gate): each language keeps only
    docs at/above its OWN median token count — exact PERCENTILE_DISC
    thresholds from a bounded (lang, token_len) count-histogram exchange,
    broadcast back for a streaming filter pass.  No row shuffle, no
    sort; the per-group generalization of doc_length_quantiles."""
    from ocr_ray.stages.analysis import grouped_quantile_gate

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "text"],
    )
    return grouped_quantile_gate(docs, group_col="lang", q=0.5)


def q_embed_cluster_cap(sf_dir: str):
    """Cluster-balanced resample (stages/cluster.py:cluster_cap_sample):
    exact-integer k-means assignment, then keep the 32 centroid-nearest
    vectors per cluster (dist asc, id asc) through one cluster-id
    exchange — the quota/prune step of cluster-based data balancing.
    Value-checked end to end because the k-means trajectory is
    bit-exact and the quota is a deterministic window."""
    from ocr_ray.stages.cluster import cluster_cap_sample

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    return cluster_cap_sample(ds, k=8, iters=2, cap=32, n_partitions=4)


def q_corpus_source_similarity(sf_dir: str):
    """Source-level MinHash signature similarity matrix
    (stages/dedup.py:source_minhash_similarity): one streaming corpus
    pass builds per-source 16-permutation signatures (per-perm MIN over
    3-gram shingle hashes — order/partition-insensitive), one bounded
    (source, perm) exchange merges them, and the pairwise Jaccard
    estimate runs over the tiny |sources| x 16 table.  The "which feeds
    duplicate each other" curation report at 100 TB without any
    doc-level pairing."""
    from ocr_ray.stages.dedup import source_minhash_similarity

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "text"]
    )
    return source_minhash_similarity(docs)


def q_dedup_keep_best(sf_dir: str):
    """Quality-aware near-dup collapse
    (stages/dedup.py:keep_best_representatives): same MinHash pairs →
    connected components as dedup_keep, but each cluster keeps its
    HIGHEST-n_chars member (tie: lowest id) — the "keep the longest
    copy" curation rule.  Three bounded metadata exchanges; document
    text never re-shuffles after the pair stage."""
    from ocr_ray.stages.dedup import (
        connected_components,
        keep_best_representatives,
        minhash_dedup_pairs,
    )

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    meta = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars"],
    )
    pairs = minhash_dedup_pairs(
        docs, n_perm=64, n_bands=16, shingle_k=MINHASH_SHINGLE_K,
        threshold=JACCARD_THRESHOLD, n_partitions=None,
    )
    clusters = connected_components(pairs, n_partitions=8)
    return keep_best_representatives(meta, clusters)


DOC_MIX_BUDGET = 600  # frozen into the oracle SQL


def q_doc_budget_mix(sf_dir: str):
    """Per-source token-budget mixture selection
    (stages/analysis.py:budget_select_per_group): keep each source's
    docs in id order while its cumulative whitespace-token count stays
    within the budget — the "N tokens per feed" quota of a training
    mixture.  One metadata-only source exchange; exact window-sum
    parity with the SQL oracle."""
    from ocr_ray.stages.analysis import budget_select_per_group

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "text"],
    )
    return budget_select_per_group(docs, budget=DOC_MIX_BUDGET)


MIX_TEMP_SCALE = 10  # frozen into the oracle SQL (budget = 10 * sqrt(tot))


def q_doc_mix_temperature(sf_dir: str):
    """Temperature-weighted mixture selection
    (stages/analysis.py:temperature_mix_select): per-source quota
    ``floor(10 * tokens_src^0.5)`` — the alpha<1 sampling rule that
    upweights small feeds — then the deterministic id-order prefix
    selection.  One histogram-bounded totals pass + one metadata-only
    selection exchange."""
    from ocr_ray.stages.analysis import temperature_mix_select

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "text"],
    )
    return temperature_mix_select(docs, scale=MIX_TEMP_SCALE, alpha_pm=500)


def q_pipeline_mixture(sf_dir: str):
    """Mixture-curation composite — length gate (>= 25 tokens) → exact dedup
    (keep-first by content) → temperature-quota selection, as ONE job
    that scans the corpus TEXT exactly once: the gate pass reduces every
    surviving row to (doc_id, source, content_hash, n_tok) metadata, the
    keep-first dedup is a content-hash exchange of those rows, and the
    mixing quota (floor(10 * tokens_src^0.5)) runs entirely on the
    deduped metadata via temperature_mix_select's token_col fast path.
    After the first scan no document text moves anywhere."""
    from ocr_ray.stages.analysis import temperature_mix_select
    from ocr_ray.stages.dedup import add_content_hash
    from ocr_ray.stages.join import exchange_map_partitions

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "text"],
    )

    def gate(b: pd.DataFrame) -> pd.DataFrame:
        n = b["text"].str.split().str.len().astype("int64")
        keep = n >= 25
        out = add_content_hash(b[keep])
        return pd.DataFrame({
            "doc_id": out["doc_id"].astype("int64"),
            "source": out["source"],
            "content_hash": out["content_hash"],
            "n_tok": n[keep],
        })

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        if "content_hash" not in g.columns or not len(g):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "source": pd.Series(dtype="object"),
                                 "n_tok": pd.Series(dtype="int64")})
        g = g.sort_values(["content_hash", "doc_id"], kind="mergesort")
        return g.drop_duplicates("content_hash", keep="first")[
            ["doc_id", "source", "n_tok"]]

    deduped = exchange_map_partitions(
        docs.map_batches(gate, batch_format="pandas"),
        "content_hash", keep_first, None)
    return temperature_mix_select(
        deduped, scale=MIX_TEMP_SCALE, alpha_pm=500, token_col="n_tok")


def q_doc_winsorize(sf_dir: str):
    """Per-source winsorized token stats
    (stages/analysis.py:winsorized_group_stats): clamp each doc's token
    count into its source's own [p05, p95] band (integer-exact
    PERCENTILE_DISC ranks) and report raw vs clamped sums — the
    outlier-robust corpus size report.  Two histogram-bounded passes,
    zero row shuffles, all-integer output."""
    from ocr_ray.stages.analysis import winsorized_group_stats

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "text"],
    )
    return winsorized_group_stats(docs, group_col="source", lo=0.05, hi=0.95)


def q_q6_forecast(sf_dir: str):
    """TPC-H Q6-style forecast-revenue: one predicate-pushed scan (date
    window + discount band + quantity cap all prune row groups), per-batch
    integer partials, driver sums a handful of ints.  Revenue is exact:
    cents x discount-permille integers (sum(l_extendedprice * l_discount)
    as rev_cpm), no IEEE summation-order hazard."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        dpm = np.floor(b["l_discount"].to_numpy() * 1000 + 0.5).astype("int64")
        keep = (
            (b["l_shipdate"] >= lo).to_numpy()
            & (b["l_shipdate"] < hi).to_numpy()
            & (dpm >= 50) & (dpm <= 70)
            & (b["l_quantity"].to_numpy() < 24)
        )
        cents = np.floor(
            b.loc[keep, "l_extendedprice"].to_numpy() * 100 + 0.5
        ).astype("int64")
        return pd.DataFrame({
            "rev_cpm": [int((cents * dpm[keep]).sum())],
            "n_rows": [int(keep.sum())],
        })

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        filter=(
            (pads.field("l_shipdate") >= pa.scalar(lo))
            & (pads.field("l_shipdate") < pa.scalar(hi))
            & (pads.field("l_quantity") < 24)
        ),
    )
    out = ds.map_batches(partial, batch_format="pandas").to_pandas()
    # all-empty scan: Ray drops columns on an all-empty Dataset output
    rev = out["rev_cpm"].sum() if "rev_cpm" in out.columns else 0
    n = out["n_rows"].sum() if "n_rows" in out.columns else 0
    return pd.DataFrame({"rev_cpm": [np.int64(rev)], "n_rows": [np.int64(n)]})


def _probe_sorted(keys: np.ndarray, probe: np.ndarray):
    """Vectorized probe of a sorted build-side key array: returns
    (positions clipped in-range, matched mask).  Unmatched probes must be
    DROPPED by the caller (INNER-join semantics) — a raw searchsorted
    position silently points at a neighboring key."""
    pos = np.searchsorted(keys, probe)
    pos = np.minimum(pos, len(keys) - 1) if len(keys) else np.zeros(
        len(probe), dtype=np.int64)
    matched = (keys[pos] == probe) if len(keys) else np.zeros(
        len(probe), dtype=bool)
    return pos, matched


def _broadcast_part_lookup(sf_dir: str, cols):
    """Build-side of a broadcast hash join on the ``part`` dimension:
    ``ray.put`` ONCE (sorted p_partkey + requested attribute arrays); probe
    tasks ``ray.get`` the shared ref and ``searchsorted`` per batch — the
    dimension ships to each worker once, never per batch.  Cutover note:
    when the dimension outgrows worker heap (TPC-H part scales with SF),
    switch the caller to stages/join.py:exchange_join on l_partkey — same
    results, one extra all-to-all."""
    import ray as _ray

    # driver-local dimension read: pd.read_parquet preserves the schema
    # even for an all-empty table (rd...to_pandas() drops columns there,
    # turning the column access below into a KeyError)
    part = pd.read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey"] + cols
    ).sort_values("p_partkey")
    return _ray.put(tuple([part["p_partkey"].to_numpy()]
                          + [part[c].to_numpy() for c in cols]))


def q_q14_promo(sf_dir: str):
    """TPC-H Q14-style promo-revenue share for one ship month: broadcast
    hash join (part build side via ray.put, searchsorted probe — the
    dimension moves once per worker, the fact table never shuffles) and
    integer cents x (1000 - discount-permille) revenue, reported as the
    exact (promo_cpm, total_cpm, n_rows) triple rather than a float
    ratio."""
    import pyarrow as pa
    import pyarrow.dataset as pads
    import ray as _ray

    lo, hi = pd.Timestamp("1996-03-01"), pd.Timestamp("1996-04-01")
    ref = _broadcast_part_lookup(sf_dir, ["p_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        keys, ptype = _ray.get(ref)
        keep = (b["l_shipdate"] >= lo).to_numpy() & (b["l_shipdate"] < hi).to_numpy()
        b = b[keep]
        pos, matched = _probe_sorted(keys, b["l_partkey"].to_numpy())
        b = b[matched]  # INNER-join semantics: orphan partkeys drop
        pos = pos[matched]
        cents = np.floor(b["l_extendedprice"].to_numpy() * 100 + 0.5).astype("int64")
        dpm = np.floor(b["l_discount"].to_numpy() * 1000 + 0.5).astype("int64")
        cpm = cents * (1000 - dpm)
        promo = ptype[pos] == "PROMO"
        return pd.DataFrame({
            "promo_cpm": [int(cpm[promo].sum())],
            "total_cpm": [int(cpm.sum())],
            "n_rows": [int(len(b))],
        })

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_shipdate", "l_discount", "l_extendedprice"],
        filter=(
            (pads.field("l_shipdate") >= pa.scalar(lo))
            & (pads.field("l_shipdate") < pa.scalar(hi))
        ),
    )
    out = ds.map_batches(partial, batch_format="pandas").to_pandas()
    # all-empty scan: Ray drops columns on an all-empty Dataset output
    get = lambda c: out[c].sum() if c in out.columns else 0  # noqa: E731
    return pd.DataFrame({
        "promo_cpm": [np.int64(get("promo_cpm"))],
        "total_cpm": [np.int64(get("total_cpm"))],
        "n_rows": [np.int64(get("n_rows"))],
    })


def q_q19_brand_qty(sf_dir: str):
    """TPC-H Q19-style disjunctive multi-predicate join revenue — three
    (brand, size band, quantity band) OR-arms evaluated in one vectorized
    pass over the broadcast part attributes; same integer-exact cpm
    revenue as q14.  No shuffle at all: dimension broadcast + per-batch
    partials."""
    import ray as _ray

    ref = _broadcast_part_lookup(sf_dir, ["p_brand", "p_size"])
    ARMS = (("Brand#12", 1, 5, 1, 11),
            ("Brand#23", 1, 10, 10, 20),
            ("Brand#34", 1, 15, 20, 30))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        keys, brand, size = _ray.get(ref)
        pos, matched = _probe_sorted(keys, b["l_partkey"].to_numpy())
        qty = b["l_quantity"].to_numpy()
        keep = np.zeros(len(b), dtype=bool)
        for br, s_lo, s_hi, q_lo, q_hi in ARMS:
            keep |= (matched & (brand[pos] == br)
                     & (size[pos] >= s_lo) & (size[pos] <= s_hi)
                     & (qty >= q_lo) & (qty <= q_hi))
        cents = np.floor(
            b.loc[keep, "l_extendedprice"].to_numpy() * 100 + 0.5
        ).astype("int64")
        dpm = np.floor(
            b.loc[keep, "l_discount"].to_numpy() * 1000 + 0.5
        ).astype("int64")
        return pd.DataFrame({
            "rev_cpm": [int((cents * (1000 - dpm)).sum())],
            "n_rows": [int(keep.sum())],
        })

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_discount", "l_extendedprice"],
    )
    out = ds.map_batches(partial, batch_format="pandas").to_pandas()
    # all-empty scan: Ray drops columns on an all-empty Dataset output
    rev = out["rev_cpm"].sum() if "rev_cpm" in out.columns else 0
    n = out["n_rows"].sum() if "n_rows" in out.columns else 0
    return pd.DataFrame({"rev_cpm": [np.int64(rev)], "n_rows": [np.int64(n)]})


def q_q15_top_supplier(sf_dir: str):
    """TPC-H Q15-style top supplier(s): one-quarter revenue view, then the
    supplier(s) achieving the max.  Per-batch combiner groups by
    ``l_suppkey`` BEFORE the exchange, so the only all-to-all moves the
    per-supplier partials (output cardinality = #suppliers, 10k x SF —
    never the lineitems); the max + equality filter runs on that tiny
    aggregate on the driver and the name attaches from the small supplier
    dim.  Revenue is the exact integer cents x (1000 - discount-permille),
    so the WHERE total = MAX(total) tie semantics are reproducible (float
    revenue would make the equality filter flaky)."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    from ocr_ray.stages.aggregate import hash_aggregate

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1996-04-01")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)]
        cents = np.floor(b["l_extendedprice"].to_numpy() * 100 + 0.5).astype("int64")
        dpm = np.floor(b["l_discount"].to_numpy() * 1000 + 0.5).astype("int64")
        return (b.assign(total_rev_cpm=cents * (1000 - dpm))
                .groupby("l_suppkey", as_index=False)[["total_rev_cpm"]].sum())

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pads.field("l_shipdate") >= pa.scalar(lo))
        & (pads.field("l_shipdate") < pa.scalar(hi)),
    )
    agg = hash_aggregate(
        li.map_batches(partial, batch_format="pandas"),
        keys=["l_suppkey"], aggs={"total_rev_cpm": "sum"}, n_partitions=None,
    ).to_pandas()
    empty = pd.DataFrame({"s_suppkey": pd.Series(dtype="int64"),
                          "s_name": pd.Series(dtype=object),
                          "total_rev_cpm": pd.Series(dtype="int64")})
    if not len(agg):
        return empty
    top = agg[agg["total_rev_cpm"] == agg["total_rev_cpm"].max()]
    supp = pd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"],
    )  # driver-local dim read; schema survives an all-empty table
    out = top.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    if not len(out):
        return empty  # orphan suppkeys only: INNER join leaves nothing
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    out["total_rev_cpm"] = out["total_rev_cpm"].astype("int64")
    return (out[["s_suppkey", "s_name", "total_rev_cpm"]]
            .sort_values("s_suppkey").reset_index(drop=True))


def _broadcast_sorted_lookup(df: pd.DataFrame, key: str, cols):
    """Generic build side of a broadcast hash join: sort by ``key``,
    ``ray.put`` (key array, *attribute arrays) once; probe tasks
    searchsorted per batch via :func:`_probe_sorted`.  Same cutover note
    as :func:`_broadcast_part_lookup`: when the dimension outgrows worker
    heap, switch to stages/join.py:exchange_join."""
    import ray as _ray

    df = df.sort_values(key)
    return _ray.put(tuple([df[key].to_numpy()]
                          + [df[c].to_numpy() for c in cols]))


def q_q8_market_share(sf_dir: str):
    """TPC-H Q8-style national market share: of all ECONOMY-part order
    volume delivered into the ASIA region over two order years, what share
    was supplied by NATION_7, per year — reported as the exact
    (o_year, target_cpm, total_cpm) integer triple instead of a float
    share.  Shape: the two dimension probes (part-type membership,
    supplier -> nation) ride the lineitem scan as ONE broadcast each
    (ray.put once, searchsorted per batch — the fact table never shuffles
    for them), volume pre-reduces per orderkey before the single
    orderkey exchange join against the date-windowed orders x region
    customers (customer side exchange-joined as in q7 — it scales with
    SF, so it is not broadcast)."""
    import pyarrow as pa
    import pyarrow.dataset as pads
    import ray as _ray

    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_join

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1998-01-01")
    TARGET_NATION, PTYPE, REGION = "NATION_7", "ECONOMY", "ASIA"

    # driver-local dim reads; schema survives an all-empty table
    nation = pd.read_parquet(os.path.join(sf_dir, "nation.parquet"))
    region = pd.read_parquet(os.path.join(sf_dir, "region.parquet"))
    rkey = region.loc[region["r_name"] == REGION, "r_regionkey"].astype(int)
    region_nations = set(
        nation.loc[nation["n_regionkey"].isin(rkey), "n_nationkey"].astype(int))
    target_keys = set(
        nation.loc[nation["n_name"] == TARGET_NATION, "n_nationkey"].astype(int))

    part = pd.read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    pref = _broadcast_sorted_lookup(
        part[part["p_type"] == PTYPE], "p_partkey", [])
    supp = pd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    )
    sref = _broadcast_sorted_lookup(supp, "s_suppkey", ["s_nationkey"])

    def li_partial(b: pd.DataFrame) -> pd.DataFrame:
        pkeys, = _ray.get(pref)
        skeys, snat = _ray.get(sref)
        _, m_p = _probe_sorted(pkeys, b["l_partkey"].to_numpy())
        b = b[m_p]
        pos_s, m_s = _probe_sorted(skeys, b["l_suppkey"].to_numpy())
        b = b[m_s]  # INNER semantics: orphan supp/part keys drop
        nat = snat[pos_s[m_s]]
        cents = np.floor(b["l_extendedprice"].to_numpy() * 100 + 0.5).astype("int64")
        dpm = np.floor(b["l_discount"].to_numpy() * 1000 + 0.5).astype("int64")
        vol = cents * (1000 - dpm)
        is_target = np.isin(nat, list(target_keys))
        return (pd.DataFrame({"l_orderkey": b["l_orderkey"].to_numpy(),
                              "target_cpm": vol * is_target,
                              "total_cpm": vol})
                .groupby("l_orderkey", as_index=False).sum())

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    )
    li_red = hash_aggregate(
        li.map_batches(li_partial, batch_format="pandas"),
        keys=["l_orderkey"],
        aggs={"target_cpm": "sum", "total_cpm": "sum"}, n_partitions=None,
    )

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(lambda b: b[b["c_nationkey"].isin(region_nations)],
                  batch_format="pandas")
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= pa.scalar(lo))
        & (pads.field("o_orderdate") < pa.scalar(hi)),
    ).map_batches(
        lambda b: b[(b["o_orderdate"] >= lo) & (b["o_orderdate"] < hi)],
        batch_format="pandas",
    )
    osel = exchange_join(orders, cust, on="o_custkey", right_on="c_custkey",
                         n_partitions=None)
    j = exchange_join(li_red, osel, on="l_orderkey", right_on="o_orderkey",
                      n_partitions=None)

    def year_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b) or "o_orderdate" not in b.columns:
            # pre-map schema guard: empty exchange partitions are column-less
            return pd.DataFrame({"o_year": pd.Series(dtype="int64"),
                                 "target_cpm": pd.Series(dtype="int64"),
                                 "total_cpm": pd.Series(dtype="int64")})
        return (b.assign(o_year=b["o_orderdate"].dt.year.astype("int64"))
                .groupby("o_year", as_index=False)[["target_cpm", "total_cpm"]]
                .sum())

    out = hash_aggregate(
        j.map_batches(year_partial, batch_format="pandas"),
        keys=["o_year"], aggs={"target_cpm": "sum", "total_cpm": "sum"},
        n_partitions=2,
    ).to_pandas()
    if not len(out):
        return pd.DataFrame({"o_year": pd.Series(dtype="int64"),
                             "target_cpm": pd.Series(dtype="int64"),
                             "total_cpm": pd.Series(dtype="int64")})
    out = out.astype({"o_year": "int64", "target_cpm": "int64",
                      "total_cpm": "int64"})
    return (out[["o_year", "target_cpm", "total_cpm"]]
            .sort_values("o_year").reset_index(drop=True))


def q_q9_profit(sf_dir: str):
    """TPC-H Q9-style product-line profit by supplier nation and order
    year (testdata has no partsupp table, so the supplycost term is
    dropped: profit = extendedprice x (1 - discount), exact cpm integers —
    the join/aggregation topology is the point).  Part-name filter and
    supplier -> nation attach as broadcast probes on the lineitem scan;
    per-(orderkey, nation) pre-reduce bounds the one exchange join against
    orders (which only contributes the year); final rollup is a tiny
    (nations x years) aggregate."""
    import ray as _ray

    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_join

    NEEDLE = "gear"

    # driver-local dim reads; schema survives an all-empty table
    nation = pd.read_parquet(os.path.join(sf_dir, "nation.parquet"))
    names = dict(zip(nation["n_nationkey"].astype(int),
                     nation["n_name"].astype(str)))
    part = pd.read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_name"]
    )
    pref = _broadcast_sorted_lookup(
        part[part["p_name"].astype(str).str.contains(NEEDLE, regex=False)],
        "p_partkey", [])
    supp = pd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    )
    sref = _broadcast_sorted_lookup(supp, "s_suppkey", ["s_nationkey"])

    def li_partial(b: pd.DataFrame) -> pd.DataFrame:
        pkeys, = _ray.get(pref)
        skeys, snat = _ray.get(sref)
        _, m_p = _probe_sorted(pkeys, b["l_partkey"].to_numpy())
        b = b[m_p]
        pos_s, m_s = _probe_sorted(skeys, b["l_suppkey"].to_numpy())
        b = b[m_s]
        cents = np.floor(b["l_extendedprice"].to_numpy() * 100 + 0.5).astype("int64")
        dpm = np.floor(b["l_discount"].to_numpy() * 1000 + 0.5).astype("int64")
        return (pd.DataFrame({"l_orderkey": b["l_orderkey"].to_numpy(),
                              "s_nationkey": snat[pos_s[m_s]],
                              "profit_cpm": cents * (1000 - dpm)})
                .groupby(["l_orderkey", "s_nationkey"], as_index=False).sum())

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    )
    li_red = hash_aggregate(
        li.map_batches(li_partial, batch_format="pandas"),
        keys=["l_orderkey", "s_nationkey"], aggs={"profit_cpm": "sum"},
        n_partitions=None,
    )
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_orderdate"])
    j = exchange_join(li_red, orders, on="l_orderkey", right_on="o_orderkey",
                      n_partitions=None)

    def year_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b) or "o_orderdate" not in b.columns:
            # pre-map schema guard: empty exchange partitions are column-less
            return pd.DataFrame({"s_nationkey": pd.Series(dtype="int64"),
                                 "o_year": pd.Series(dtype="int64"),
                                 "profit_cpm": pd.Series(dtype="int64")})
        return (b.assign(o_year=b["o_orderdate"].dt.year.astype("int64"))
                .groupby(["s_nationkey", "o_year"], as_index=False)
                [["profit_cpm"]].sum())

    out = hash_aggregate(
        j.map_batches(year_partial, batch_format="pandas"),
        keys=["s_nationkey", "o_year"], aggs={"profit_cpm": "sum"},
        n_partitions=2,
    ).to_pandas()
    if not len(out):
        return pd.DataFrame({"nation": pd.Series(dtype=object),
                             "o_year": pd.Series(dtype="int64"),
                             "profit_cpm": pd.Series(dtype="int64")})
    out["nation"] = out["s_nationkey"].astype(int).map(names)
    out = out.astype({"o_year": "int64", "profit_cpm": "int64"})
    return (out[["nation", "o_year", "profit_cpm"]]
            .sort_values(["nation", "o_year"], kind="mergesort")
            .reset_index(drop=True))


def q_q2_min_shipper(sf_dir: str):
    """TPC-H Q2-style minimum-cost supplier, adapted (no partsupp table:
    'cost' becomes total shipped quantity): for every size-15 part, the
    EUROPE-region supplier that shipped the LEAST of it — the per-group
    argmin-with-correlated-subquery shape, flattened distributed: a
    per-batch (partkey, suppkey) quantity combiner, ONE exchange keyed on
    (partkey, suppkey) partials, then a partkey exchange where each
    partition takes its groups' argmin vectorized (sort + groupby-head,
    ties to the lowest suppkey).  Part-size membership and the
    region-supplier set ride the fact scan as broadcasts; exact integer
    centiunits make the min equality reproducible."""
    import ray as _ray

    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_map_partitions

    SIZE, REGION = 15, "EUROPE"
    nation = pd.read_parquet(os.path.join(sf_dir, "nation.parquet"))
    region = pd.read_parquet(os.path.join(sf_dir, "region.parquet"))
    rkey = region.loc[region["r_name"] == REGION, "r_regionkey"].astype(int)
    rnations = set(nation.loc[nation["n_regionkey"].isin(rkey),
                              "n_nationkey"].astype(int))
    supp = pd.read_parquet(os.path.join(sf_dir, "supplier.parquet"),
                           columns=["s_suppkey", "s_name", "s_nationkey"])
    supp = supp[supp["s_nationkey"].astype(int).isin(rnations)]
    sref = _broadcast_sorted_lookup(supp, "s_suppkey", [])
    part = pd.read_parquet(os.path.join(sf_dir, "part.parquet"),
                           columns=["p_partkey", "p_size"])
    pref = _broadcast_sorted_lookup(part[part["p_size"] == SIZE],
                                    "p_partkey", [])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        pkeys, = _ray.get(pref)
        skeys, = _ray.get(sref)
        _, m_p = _probe_sorted(pkeys, b["l_partkey"].to_numpy())
        b = b[m_p]
        _, m_s = _probe_sorted(skeys, b["l_suppkey"].to_numpy())
        b = b[m_s]  # INNER semantics: non-region suppliers drop
        qty_c = np.floor(b["l_quantity"].to_numpy() * 100 + 0.5).astype("int64")
        return (pd.DataFrame({"p_partkey": b["l_partkey"].to_numpy(),
                              "s_suppkey": b["l_suppkey"].to_numpy(),
                              "qty_c": qty_c})
                .groupby(["p_partkey", "s_suppkey"], as_index=False).sum())

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_partkey", "l_suppkey", "l_quantity"])
    totals = hash_aggregate(
        li.map_batches(partial, batch_format="pandas"),
        keys=["p_partkey", "s_suppkey"], aggs={"qty_c": "sum"},
        n_partitions=None,
    )

    def argmin(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "p_partkey" not in g.columns:
            return pd.DataFrame({"p_partkey": pd.Series(dtype="int64"),
                                 "s_suppkey": pd.Series(dtype="int64"),
                                 "qty_c": pd.Series(dtype="int64")})
        g = g.sort_values(["p_partkey", "qty_c", "s_suppkey"],
                          kind="mergesort")
        return g.groupby("p_partkey", as_index=False).head(1)

    out = exchange_map_partitions(totals, "p_partkey", argmin,
                                  n_partitions=None).to_pandas()
    empty = pd.DataFrame({"p_partkey": pd.Series(dtype="int64"),
                          "s_suppkey": pd.Series(dtype="int64"),
                          "s_name": pd.Series(dtype=object),
                          "qty_c": pd.Series(dtype="int64")})
    if not len(out) or "p_partkey" not in out.columns:
        return empty
    out = out.merge(supp[["s_suppkey", "s_name"]], on="s_suppkey")
    if not len(out):
        return empty
    out = out.astype({"p_partkey": "int64", "s_suppkey": "int64",
                      "qty_c": "int64"})
    return (out[["p_partkey", "s_suppkey", "s_name", "qty_c"]]
            .sort_values("p_partkey").reset_index(drop=True))


def q_q11_value_concentration(sf_dir: str):
    """TPC-H Q11-style value concentration (no partsupp: 'stock value'
    becomes shipped extendedprice): suppliers whose total shipped value
    exceeds 1/1000 of the corpus total — the HAVING-over-a-global-scalar
    shape.  One combiner + supplier-cardinality exchange builds the
    per-supplier totals; the global total is the exact integer sum of
    that tiny aggregate; the threshold compare is the cross-multiplied
    integer ``val_c * 1000 > total_c`` so the fraction never floats
    (val_c <= ~2^47 at any SF keeps the x1000 inside int64)."""
    from ocr_ray.stages.aggregate import hash_aggregate

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["l_extendedprice"].to_numpy() * 100 + 0.5
                         ).astype("int64")
        return (pd.DataFrame({"s_suppkey": b["l_suppkey"].to_numpy(),
                              "val_c": cents})
                .groupby("s_suppkey", as_index=False).sum())

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_suppkey", "l_extendedprice"])
    agg = hash_aggregate(
        li.map_batches(partial, batch_format="pandas"),
        keys=["s_suppkey"], aggs={"val_c": "sum"}, n_partitions=None,
    ).to_pandas()
    empty = pd.DataFrame({"s_suppkey": pd.Series(dtype="int64"),
                          "val_c": pd.Series(dtype="int64")})
    if not len(agg) or "s_suppkey" not in agg.columns:
        return empty
    total_c = int(agg["val_c"].sum())
    out = agg[agg["val_c"].to_numpy() * 1000 > total_c]
    out = out.astype({"s_suppkey": "int64", "val_c": "int64"})
    return (out[["s_suppkey", "val_c"]]
            .sort_values("s_suppkey").reset_index(drop=True))


def q_q12_ship_lag(sf_dir: str):
    """TPC-H Q12-style shipping-lag priority check (no l_shipmode column
    here, so the Q12 mode split becomes the high/low priority split): for
    lineitems shipped in 1996, count late (> 60 days after order date) vs
    on-time lines per priority class.  Shape: the ship-window predicate
    pushes into the scan, a per-batch (orderkey, shipdate) count combiner
    collapses duplicate ship dates per order BEFORE the one orderkey
    exchange join against orders, the lag bucket is a single vectorized
    comparison, and the final rollup is a 2-row bounded aggregate."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_join

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01")
    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"],
        filter=(pads.field("l_shipdate") >= pa.scalar(lo))
        & (pads.field("l_shipdate") < pa.scalar(hi)),
    )

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(n=np.int64(1))
        return b.groupby(["l_orderkey", "l_shipdate"], as_index=False)[["n"]].sum()

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    j = exchange_join(li.map_batches(combine, batch_format="pandas"), orders,
                      on="l_orderkey", right_on="o_orderkey", n_partitions=None)

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        late = (b["l_shipdate"] > b["o_orderdate"]
                + pd.Timedelta(days=60)).to_numpy()
        hi_p = b["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).to_numpy()
        n = b["n"].to_numpy()
        d = pd.DataFrame({
            "priority_class": np.where(hi_p, "high", "low"),
            "late_count": n * late,
            "ontime_count": n * ~late,
        })
        return d.groupby("priority_class", as_index=False)[
            ["late_count", "ontime_count"]].sum()

    out = hash_aggregate(
        j.map_batches(bucket, batch_format="pandas"),
        keys=["priority_class"],
        aggs={"late_count": "sum", "ontime_count": "sum"}, n_partitions=2,
    ).to_pandas()
    if not len(out):  # empty window: Ray drops columns on empty output
        return pd.DataFrame({"priority_class": pd.Series(dtype=object),
                             "late_count": pd.Series(dtype="int64"),
                             "ontime_count": pd.Series(dtype="int64")})
    out = out.astype({"late_count": "int64", "ontime_count": "int64"})
    return out.sort_values("priority_class").reset_index(drop=True)


def q_q16_supplier_cnt(sf_dir: str):
    """TPC-H Q16-style supplier counts per (brand, type, size) — COUNT
    DISTINCT suppliers over the part/supplier relationship, which here
    lives in lineitem (no partsupp table).  Shape: the filtered part
    dimension broadcasts once (``ray.put`` sorted keys + attributes), a
    per-batch (brand, type, size, suppkey) dedup combiner shrinks the fact
    stream before ONE exchange on that 4-tuple (global distinct), and the
    distinct-count is a second tiny aggregate over the already-unique
    rows — the two-level distinct-count plan that never ships raw
    lineitems."""
    import ray as _ray

    from ocr_ray.stages.aggregate import hash_aggregate

    SIZES = (1, 4, 7, 10, 15, 19, 23, 36)
    # driver-local dimension read: pd.read_parquet preserves the schema
    # even for an all-empty table (rd...to_pandas() drops columns there)
    part = pd.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
    )
    part = part[(part["p_brand"] != "Brand#45")
                & ~part["p_type"].str.startswith("PROMO")
                & part["p_size"].isin(SIZES)]
    ref = _broadcast_sorted_lookup(part, "p_partkey",
                                   ["p_brand", "p_type", "p_size"])

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        keys, brand, ptype, size = _ray.get(ref)
        pos, m = _probe_sorted(keys, b["l_partkey"].to_numpy())
        b = b[m]
        pos = pos[m]
        d = pd.DataFrame({
            "p_brand": brand[pos], "p_type": ptype[pos],
            "p_size": size[pos].astype("int64"),
            "l_suppkey": b["l_suppkey"].to_numpy(), "n": np.int64(1),
        })
        return d.groupby(["p_brand", "p_type", "p_size", "l_suppkey"],
                         as_index=False)[["n"]].sum()

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_partkey", "l_suppkey"])
    distinct = hash_aggregate(
        li.map_batches(pair_partial, batch_format="pandas"),
        keys=["p_brand", "p_type", "p_size", "l_suppkey"],
        aggs={"n": "sum"}, n_partitions=None,
    )

    def cnt_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):  # pre-map schema guard: empty exchange partitions
            return pd.DataFrame({"p_brand": pd.Series(dtype=object),
                                 "p_type": pd.Series(dtype=object),
                                 "p_size": pd.Series(dtype="int64"),
                                 "supplier_cnt": pd.Series(dtype="int64")})
        b = b.assign(supplier_cnt=np.int64(1))
        return b.groupby(["p_brand", "p_type", "p_size"],
                         as_index=False)[["supplier_cnt"]].sum()

    out = hash_aggregate(
        distinct.map_batches(cnt_partial, batch_format="pandas"),
        keys=["p_brand", "p_type", "p_size"],
        aggs={"supplier_cnt": "sum"}, n_partitions=4,
    ).to_pandas()
    if not len(out):  # no qualifying parts: Ray drops columns on empty
        return pd.DataFrame({"p_brand": pd.Series(dtype=object),
                             "p_type": pd.Series(dtype=object),
                             "p_size": pd.Series(dtype="int64"),
                             "supplier_cnt": pd.Series(dtype="int64")})
    out = out.astype({"p_size": "int64", "supplier_cnt": "int64"})
    return (out[["p_brand", "p_type", "p_size", "supplier_cnt"]]
            .sort_values(["p_brand", "p_type", "p_size"], kind="mergesort")
            .reset_index(drop=True))


def q_q20_qualified_shippers(sf_dir: str):
    """TPC-H Q20-style qualified shippers: suppliers whose 1996 shipped
    quantity of 'small'-named parts exceeds a threshold (the
    who-holds-excess-inventory probe; no partsupp table, so availability
    is measured from shipped lineitems).  Shape: the name-filtered part
    key set broadcasts once, quantity pre-reduces per supplier inside each
    batch, the ONE exchange moves per-supplier partials (cardinality =
    #suppliers), and the HAVING filter + name attach run on that tiny
    aggregate.  Quantity is exact integer centiunits
    (``floor(q*100+0.5)``), so the threshold comparison is
    reproducible."""
    import pyarrow as pa
    import pyarrow.dataset as pads
    import ray as _ray

    from ocr_ray.stages.aggregate import hash_aggregate

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01")
    MIN_QTY_C = 10000  # 100 shipped units, in centiunits

    part = pd.read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_name"]
    )  # driver-local dim read; schema survives an all-empty table
    pref = _broadcast_sorted_lookup(
        part[part["p_name"].str.startswith("small")], "p_partkey", [])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        pkeys, = _ray.get(pref)
        _, m = _probe_sorted(pkeys, b["l_partkey"].to_numpy())
        b = b[m]
        qty_c = np.floor(b["l_quantity"].to_numpy() * 100 + 0.5).astype("int64")
        return (pd.DataFrame({"l_suppkey": b["l_suppkey"].to_numpy(),
                              "qty_c": qty_c})
                .groupby("l_suppkey", as_index=False).sum())

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_quantity"],
        filter=(pads.field("l_shipdate") >= pa.scalar(lo))
        & (pads.field("l_shipdate") < pa.scalar(hi)),
    )
    agg = hash_aggregate(
        li.map_batches(partial, batch_format="pandas"),
        keys=["l_suppkey"], aggs={"qty_c": "sum"}, n_partitions=None,
    ).to_pandas()
    empty = pd.DataFrame({"s_suppkey": pd.Series(dtype="int64"),
                          "s_name": pd.Series(dtype=object),
                          "qty_c": pd.Series(dtype="int64")})
    if not len(agg):
        return empty
    agg = agg[agg["qty_c"] > MIN_QTY_C]
    supp = pd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"],
    )  # driver-local dim read; schema survives an all-empty table
    out = agg.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    if not len(out):
        return empty
    out = out.astype({"s_suppkey": "int64", "qty_c": "int64"})
    return (out[["s_suppkey", "s_name", "qty_c"]]
            .sort_values("s_suppkey").reset_index(drop=True))


def q_q21_late_supplier(sf_dir: str):
    """TPC-H Q21-style waiting-suppliers: on finished multi-supplier
    orders, which supplier was the ONLY late one (late := last ship > 60
    days after order date — no receipt/commit dates in this schema).  The
    correlated EXISTS/NOT EXISTS pair collapses into integer per-order
    sums: after a (orderkey, suppkey) max-shipdate reduction and ONE
    orderkey exchange join against F-status orders, each order reduces to
    (n_supp, n_late, sum(late x suppkey)) — when exactly one supplier is
    late, that sum IS the culprit's key, so no second join or per-order
    loop is needed.  All exchanges carry per-order/per-supplier partials,
    never raw lineitems."""
    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_join

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_suppkey", "l_shipdate"])

    def red(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["l_orderkey", "l_suppkey"],
                         as_index=False)["l_shipdate"].max()

    lired = hash_aggregate(
        li.map_batches(red, batch_format="pandas"),
        keys=["l_orderkey", "l_suppkey"], aggs={"l_shipdate": "max"},
        n_partitions=None,
    )
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderstatus"],
    ).filter(expr="o_orderstatus == 'F'")
    j = exchange_join(lired, orders, on="l_orderkey", right_on="o_orderkey",
                      n_partitions=None)

    def order_partial(b: pd.DataFrame) -> pd.DataFrame:
        late = (b["l_shipdate"] > b["o_orderdate"]
                + pd.Timedelta(days=60)).to_numpy().astype("int64")
        return (pd.DataFrame({
            "l_orderkey": b["l_orderkey"].to_numpy(),
            "n_supp": np.int64(1), "n_late": late,
            "late_sk": late * b["l_suppkey"].to_numpy(),
        }).groupby("l_orderkey", as_index=False).sum())

    per_order = hash_aggregate(
        j.map_batches(order_partial, batch_format="pandas"),
        keys=["l_orderkey"],
        aggs={"n_supp": "sum", "n_late": "sum", "late_sk": "sum"},
        n_partitions=None,
    )

    def blame(b: pd.DataFrame) -> pd.DataFrame:
        b = b[(b["n_supp"] > 1) & (b["n_late"] == 1)]
        return (pd.DataFrame({"s_suppkey": b["late_sk"].astype("int64"),
                              "numwait": np.int64(1)})
                .groupby("s_suppkey", as_index=False).sum())

    agg = hash_aggregate(
        per_order.map_batches(blame, batch_format="pandas"),
        keys=["s_suppkey"], aggs={"numwait": "sum"}, n_partitions=2,
    ).to_pandas()
    empty = pd.DataFrame({"s_suppkey": pd.Series(dtype="int64"),
                          "s_name": pd.Series(dtype=object),
                          "numwait": pd.Series(dtype="int64")})
    if not len(agg):
        return empty
    supp = pd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"],
    )  # driver-local dim read; schema survives an all-empty table
    out = agg.merge(supp, on="s_suppkey")
    if not len(out):
        return empty
    out = out.astype({"s_suppkey": "int64", "numwait": "int64"})
    return (out[["s_suppkey", "s_name", "numwait"]]
            .sort_values("s_suppkey").reset_index(drop=True))


def q_q22_lost_customers(sf_dir: str):
    """TPC-H Q22-style lost-customer report: per nation, count + balance
    of above-average-balance customers with NO order since 1999 (the
    churn-with-money query).  Two passes over customer: a bounded
    (sum_cents, n_pos) aggregate for the positive-balance average, then a
    streaming gate using the exact cross-multiplied integer comparison
    ``bal_c * n_pos > sum_c`` (the average itself never becomes a float;
    bal <= 10^6 c and n_pos <= ~10^9 keep the product inside int64), an
    ANTI exchange join against the date-windowed orders scan, and a
    per-nation bounded rollup with the 25-row nation dim mapped
    driver-side."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_join

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )

    def stat_partial(b: pd.DataFrame) -> pd.DataFrame:
        c = np.floor(b["c_acctbal"].to_numpy() * 100 + 0.5).astype("int64")
        pos = c > 0
        return pd.DataFrame({"sum_c": [int(c[pos].sum())],
                             "n_pos": [int(pos.sum())]})

    st = cust.map_batches(stat_partial, batch_format="pandas").to_pandas()
    # empty customer table: Ray drops columns on all-empty output
    sum_c = int(st["sum_c"].sum()) if "sum_c" in st.columns else 0
    n_pos = int(st["n_pos"].sum()) if "n_pos" in st.columns else 0

    def gate(b: pd.DataFrame) -> pd.DataFrame:
        c = np.floor(b["c_acctbal"].to_numpy() * 100 + 0.5).astype("int64")
        b = b.assign(bal_c=c)
        return b.loc[c * n_pos > sum_c,
                     ["c_custkey", "c_nationkey", "bal_c"]]

    rich = cust.map_batches(gate, batch_format="pandas")
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey"],
        filter=pads.field("o_orderdate")
        >= pa.scalar(pd.Timestamp("1999-01-01")),
    )
    lost = exchange_join(rich, orders, on="c_custkey", right_on="o_custkey",
                         n_partitions=None, how="anti")

    def nat_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(n_cust=np.int64(1))
        return b.groupby("c_nationkey", as_index=False)[
            ["n_cust", "bal_c"]].sum()

    out = hash_aggregate(
        lost.map_batches(nat_partial, batch_format="pandas"),
        keys=["c_nationkey"], aggs={"n_cust": "sum", "bal_c": "sum"},
        n_partitions=2,
    ).to_pandas()
    empty = pd.DataFrame({"nation": pd.Series(dtype=object),
                          "n_cust": pd.Series(dtype="int64"),
                          "bal_c": pd.Series(dtype="int64")})
    if not len(out):
        return empty
    nation = pd.read_parquet(os.path.join(sf_dir, "nation.parquet"))
    names = dict(zip(nation["n_nationkey"].astype(int),
                     nation["n_name"].astype(str)))
    out["nation"] = out["c_nationkey"].astype(int).map(names)
    out = out.astype({"n_cust": "int64", "bal_c": "int64"})
    return (out[["nation", "n_cust", "bal_c"]]
            .sort_values("nation").reset_index(drop=True))


def q_table_profile(sf_dir: str):
    """Per-column profile of the orders table (stages/validate.py:
    profile_table — the Deequ-style ingest-gate primitive): count / null
    count / exact distinct / min / max per column, across int, float,
    string and timestamp dtypes in one operator.  Stats leg is a single
    Arrow scan with ``pc.min_max`` partials; distinct is the exact
    two-level plan (per-batch ``pc.unique`` combiner, one (col, value)
    exchange, bounded per-col rollup)."""
    from ocr_ray.stages.validate import profile_table

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"]
    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                         columns=cols)
    return profile_table(ds, cols, n_partitions=None)


def q_table_profile_hll(sf_dir: str):
    """Approximate per-column distinct counts for the orders table
    (stages/aggregate.py:hll_distinct_values) — the profiler's documented
    scale path for key-like columns, where exact distinct would exchange
    the full key set: (col, bucket) registers are the whole aggregation
    state, <= |columns| x 256 rows through one bounded exchange.  Same
    oracle-frozen poly-hash/splitmix/estimator as corpus_hll, applied to
    CAST(col AS VARCHAR) canonical values."""
    from ocr_ray.stages.aggregate import hll_distinct_values

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"]
    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                         columns=cols)
    return hll_distinct_values(ds, cols, n_partitions=4)


def q_doc_readability(sf_dir: str):
    """Flesch reading-ease per document — the classic readability gate of
    quality curation, next to the Gopher/bigram/LM signals: three EXACT
    integer counts per doc (sentences = 1 + boundary matches, words =
    ``[a-z0-9]+`` tokens, syllables = vowel groups ``[aeiouy]+``) from
    three vectorized ``str.count`` kernels — no per-row Python — plus the
    score as the identical float64 expression on both sides (206.835 −
    1.015·w/s − 84.6·sy/w, 6 dp), NULL for word-less docs.  The integer
    triple makes the comparison exact; the float is derived, never
    accumulated."""
    def batch(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["text"].notna()]
        # strip SPACES only: DuckDB trim() removes ' ' alone, so a doc
        # ending ".\n" must keep its trailing boundary on both sides
        t = b["text"].str.strip(" ")
        low = b["text"].str.lower()
        ns = (1 + t.str.count(r"[.!?]\s+")).astype("int64")
        nw = low.str.count(r"[a-z0-9]+").astype("int64")
        sy = low.str.count(r"[aeiouy]+").astype("int64")
        score = np.round(
            206.835
            - 1.015 * (nw.to_numpy(dtype="float64")
                       / ns.to_numpy(dtype="float64"))
            - 84.6 * (sy.to_numpy(dtype="float64")
                      / np.where(nw.to_numpy() > 0,
                                 nw.to_numpy(dtype="float64"), 1.0)), 6)
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64").to_numpy(),
            "n_sent": ns.to_numpy(), "n_words": nw.to_numpy(),
            "n_syll": sy.to_numpy(),
            "flesch": np.where(nw.to_numpy() > 0, score, np.nan),
        })

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(batch, batch_format="pandas")


def q_doc_summary(sf_dir: str):
    """Extractive summarization over the document table
    (functions/answers.py:summarize_extractive — the R5 answer-extraction
    sibling: Luhn significant-word scoring, top-2 sentences in position
    order).  Embarrassingly parallel map over pruned (doc_id, text);
    null-text docs are absent on both sides (SQL unnest-of-NULL
    semantics)."""
    from ocr_ray.functions.answers import summarize_extractive

    def batch(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["text"].notna()]
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64").to_numpy(),
            "summary": [summarize_extractive(t) for t in b["text"]],
        })

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(batch, batch_format="pandas")


def q_events_moving(sf_dir: str):
    """Rows-based sliding window per user — SUM/COUNT of value over each
    event's last-4-rows frame (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
    ordered by ts, event_id) — the rows-frame sibling of the time-based
    events_window/events_rate: one user_id exchange, one mergesort per
    partition, then the whole frame resolves from a single prefix-sum
    (``win = prefix[i+1] - prefix[max(i-3, run_start)]``) — no per-row
    window loop, no self-join.  The sum reports as exact integer cents
    (a windowed float mean would drift with partition order); null users
    chain as ONE partition like SQL PARTITION BY."""
    from ocr_ray.stages.join import exchange_map_partitions

    def window(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                              "win_sum_c": pd.Series(dtype="int64"),
                              "win_n": pd.Series(dtype="int64")})
        if not len(g) or "event_id" not in g.columns:
            return empty
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort",
                          na_position="last")
        codes, _ = pd.factorize(g["user_id"], use_na_sentinel=False)
        n = len(g)
        idx = np.arange(n, dtype=np.int64)
        starts = np.r_[0, np.flatnonzero(codes[1:] != codes[:-1]) + 1]
        seg_start = np.repeat(starts, np.diff(np.r_[starts, n]))
        cents = np.floor(g["value"].to_numpy(dtype="float64") * 100 + 0.5
                         ).astype("int64")
        prefix = np.r_[0, np.cumsum(cents)]
        lo = np.maximum(idx - 3, seg_start)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(dtype="int64"),
            "win_sum_c": prefix[idx + 1] - prefix[lo],
            "win_n": idx + 1 - lo,
        })

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "value"]
    ).map_batches(lambda b: b[b["value"].notna()], batch_format="pandas")
    out = exchange_map_partitions(ds, "user_id", window,
                                  n_partitions=None).to_pandas()
    if "event_id" not in out.columns:
        return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                             "win_sum_c": pd.Series(dtype="int64"),
                             "win_n": pd.Series(dtype="int64")})
    out = out.astype({"event_id": "int64", "win_sum_c": "int64",
                      "win_n": "int64"})
    return out.sort_values("event_id").reset_index(drop=True)


def q_events_corr(sf_dir: str):
    """Per-type Pearson correlation between event value and the day
    index — "is this metric drifting with time" (the bivariate sibling
    of events_trend): five exact-int64 sufficient statistics per group
    move through one bounded exchange (Σx, Σy, Σxy, Σx², Σy², n over
    day-index x value-cents), the correlation components report as
    exact integers (cov_num = nΣxy−ΣxΣy, varx_num, vary_num), and r
    itself is the identical float64 expression on both sides
    (num / sqrt(double(vx)·double(vy)), 6 dp; the int product vx·vy
    would overflow int64, so BOTH sides promote before multiplying).
    Degenerate groups (zero variance) report r as SQL NULL / NaN.
    Null ts or value rows are excluded on both sides.  int64 bound:
    n·Σy² with cents ≤ ~5e4 stays exact to ~2e5 rows per group (1e18 <
    2^63); past that re-scale the value units upstream — the oracle's
    BIGINT arithmetic fails LOUD on overflow where numpy would wrap."""
    from ocr_ray.stages.aggregate import hash_aggregate

    DAY_US = 86_400_000_000

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["ts"].notna() & b["value"].notna()]
        x = (b["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
             // DAY_US)
        y = np.floor(b["value"].to_numpy(dtype="float64") * 100 + 0.5
                     ).astype("int64")
        return (pd.DataFrame({"event_type": b["event_type"].to_numpy(),
                              "n": np.int64(1), "sx": x, "sy": y,
                              "sxy": x * y, "sxx": x * x, "syy": y * y})
                .groupby("event_type", as_index=False, dropna=False)
                .sum())

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "ts", "value"])
    agg = hash_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["event_type"],
        aggs={c: "sum" for c in ("n", "sx", "sy", "sxy", "sxx", "syy")},
        n_partitions=2).to_pandas()
    cols = ["event_type", "n", "cov_num", "varx_num", "vary_num", "r"]
    if not len(agg) or "n" not in agg.columns:
        return pd.DataFrame({
            "event_type": pd.Series(dtype="object"),
            "n": pd.Series(dtype="int64"),
            "cov_num": pd.Series(dtype="int64"),
            "varx_num": pd.Series(dtype="int64"),
            "vary_num": pd.Series(dtype="int64"),
            "r": pd.Series(dtype="float64")})
    for c in ("n", "sx", "sy", "sxy", "sxx", "syy"):
        agg[c] = agg[c].astype("int64")
    agg["cov_num"] = agg["n"] * agg["sxy"] - agg["sx"] * agg["sy"]
    agg["varx_num"] = agg["n"] * agg["sxx"] - agg["sx"] * agg["sx"]
    agg["vary_num"] = agg["n"] * agg["syy"] - agg["sy"] * agg["sy"]
    den = np.sqrt(agg["varx_num"].to_numpy(dtype="float64")
                  * agg["vary_num"].to_numpy(dtype="float64"))
    with np.errstate(divide="ignore", invalid="ignore"):
        r = np.round(agg["cov_num"].to_numpy(dtype="float64") / den, 6)
    agg["r"] = np.where(den > 0, r, np.nan)
    return agg[cols].sort_values("event_type").reset_index(drop=True)


def q_events_histogram(sf_dir: str):
    """Equi-width value histogram per event type (bin width 10) — the
    distribution-shape op the quantile family doesn't cover: one
    per-batch (type, bin) count combiner, one bounded exchange, output
    cardinality |types| x |occupied bins| regardless of row count.  The
    bin is ``floor(value / 10)`` computed in float64 on both sides
    (identical IEEE op -> identical bin at every boundary); null values
    are excluded on both sides (SQL aggregate semantics)."""
    from ocr_ray.stages.aggregate import hash_aggregate

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["value"].notna()]
        bins = np.floor(b["value"].to_numpy(dtype="float64") / 10.0
                        ).astype("int64")
        return (pd.DataFrame({"event_type": b["event_type"].to_numpy(),
                              "bin": bins, "n": np.int64(1)})
                .groupby(["event_type", "bin"], as_index=False,
                         dropna=False)[["n"]].sum())

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "value"])
    out = hash_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["event_type", "bin"], aggs={"n": "sum"},
        n_partitions=None).to_pandas()
    if not len(out) or "bin" not in out.columns:
        return pd.DataFrame({"event_type": pd.Series(dtype="object"),
                             "bin": pd.Series(dtype="int64"),
                             "n": pd.Series(dtype="int64")})
    out = out.astype({"bin": "int64", "n": "int64"})
    return (out[["event_type", "bin", "n"]]
            .sort_values(["event_type", "bin"]).reset_index(drop=True))


def q_events_trend(sf_dir: str):
    """Per-type activity trend — OLS slope of daily event count on the
    day index, via EXACT integer sufficient statistics (the grouped
    regression-lite primitive: at 100 TB you never move rows to fit a
    line, you move five integers per group).  Two bounded levels: a
    (type, day) count aggregate (combiner first), then per-type partials
    (n, Σx, Σy, Σxy, Σx²) through a tiny type exchange; the slope is
    reported as the exact cross-multiplied rational
    ``(n·Σxy − Σx·Σy, n·Σx² − (Σx)²)`` — a float division would make
    the oracle compare flaky and hides the degenerate single-day case
    (den=0) that the rational form surfaces honestly.  Observed days
    only (zero-fill is events_daily_filled's contract); null ts rows are
    excluded on both sides."""
    from ocr_ray.stages.aggregate import hash_aggregate

    DAY_US = 86_400_000_000

    def day_counts(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["ts"].notna()]
        day = (b["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
               // DAY_US)
        return (pd.DataFrame({"event_type": b["event_type"].to_numpy(),
                              "day": day, "y": np.int64(1)})
                .groupby(["event_type", "day"], as_index=False,
                         dropna=False)[["y"]].sum())

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "ts"])
    daily = hash_aggregate(
        ds.map_batches(day_counts, batch_format="pandas"),
        keys=["event_type", "day"], aggs={"y": "sum"}, n_partitions=None)

    def stat_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b) or "day" not in b.columns:
            return pd.DataFrame({
                "event_type": pd.Series(dtype="object"),
                **{c: pd.Series(dtype="int64")
                   for c in ("n", "sx", "sy", "sxy", "sxx")}})
        x = b["day"].to_numpy(dtype="int64")
        y = b["y"].to_numpy(dtype="int64")
        return (pd.DataFrame({"event_type": b["event_type"].to_numpy(),
                              "n": np.int64(1), "sx": x, "sy": y,
                              "sxy": x * y, "sxx": x * x})
                .groupby("event_type", as_index=False, dropna=False)
                .sum())

    agg = hash_aggregate(
        daily.map_batches(stat_partial, batch_format="pandas"),
        keys=["event_type"],
        aggs={c: "sum" for c in ("n", "sx", "sy", "sxy", "sxx")},
        n_partitions=2).to_pandas()
    if not len(agg) or "n" not in agg.columns:
        return pd.DataFrame({"event_type": pd.Series(dtype="object"),
                             "slope_num": pd.Series(dtype="int64"),
                             "slope_den": pd.Series(dtype="int64")})
    for c in ("n", "sx", "sy", "sxy", "sxx"):
        agg[c] = agg[c].astype("int64")
    agg["slope_num"] = agg["n"] * agg["sxy"] - agg["sx"] * agg["sy"]
    agg["slope_den"] = agg["n"] * agg["sxx"] - agg["sx"] * agg["sx"]
    return (agg[["event_type", "slope_num", "slope_den"]]
            .sort_values("event_type").reset_index(drop=True))


def q_embed_pca(sf_dir: str):
    """PCA projection of the embedding table to 8 components
    (stages/cluster.py:pca_project — rows-only: eigendecomposition is
    not SQL-expressible; the replica pytest pins orthonormality,
    variance ordering, the sign convention, subspace recovery and
    partitioning-invariance).  Fit statistics are exact int64 (per-dim
    sums + the int8-code Gram matrix through one bounded exchange), so
    every partitioning sees the identical basis."""
    from ocr_ray.stages.cluster import pca_project

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    return pca_project(ds, k=8, dim=64, vec_col="embedding",
                       id_col="vec_id", n_partitions=4)


def q_io_compact_roundtrip(sf_dir: str):
    """Small-file compaction round-trip (api.compact_parquet_dir): write
    the documents table deliberately fragmented (64 tiny files — the
    shape a long-running per-partition writer leaves behind), compact to
    right-sized files (coalescing repartition, no all-to-all), and
    value-check the compacted copy against the source table.  The
    file-count contract (fragmented >> compacted) is pinned by pytest;
    the oracle checks the data survived byte-exactly."""
    import shutil
    import tempfile

    from ocr_ray.api import compact_parquet_dir

    # mkdtemp (not a name derived from sf_dir alone): two concurrent runs
    # against the same sf_dir must not rmtree each other's scratch
    scratch = tempfile.mkdtemp(prefix="ocr_ray_compact_")
    frag_dir = os.path.join(scratch, "frag")
    comp_dir = os.path.join(scratch, "comp")

    try:
        src = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "n_chars"])
        src.repartition(64).write_parquet(frag_dir)
        compact_parquet_dir(frag_dir, comp_dir, target_rows=200_000)

        def agg(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "n_docs": [np.int64(len(b))],
                "sum_chars": [np.int64(b["n_chars"].astype("int64").sum())],
            })

        ds = rd.read_parquet(comp_dir)
        out = ds.map_batches(agg, batch_format="pandas").to_pandas()
        # distinct doc_id via the bounded two-level plan (compaction must
        # not duplicate or drop rows — count alone can't catch an even swap)
        from ocr_ray.stages.aggregate import hash_aggregate

        def ids(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"doc_id": b["doc_id"].unique(),
                                 "one": np.int64(1)})

        uniq = hash_aggregate(
            rd.read_parquet(comp_dir).map_batches(ids, batch_format="pandas"),
            keys=["doc_id"], aggs={"one": "max"}, n_partitions=4)
        n_ids = int(uniq.count())
        return pd.DataFrame({
            "n_docs": [np.int64(out["n_docs"].sum())
                       if "n_docs" in out.columns else np.int64(0)],
            "sum_chars": [np.int64(out["sum_chars"].sum())
                          if "sum_chars" in out.columns else np.int64(0)],
            "n_ids": [np.int64(n_ids)],
        })
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def q_events_attribution(sf_dir: str):
    """Last-touch attribution (the most-recent-preceding-event pattern —
    marketing attribution, causal-precursor tagging): for every
    ``purchase``, the same user's latest strictly-preceding ``click``
    within a 7-day lookback, with the lag in whole seconds.  One user_id
    hash exchange co-locates each user's events; each partition sorts
    once by (user, ts, event_id) and resolves every purchase with a
    single vectorized ``np.maximum.accumulate`` forward-carry of click
    positions, validated against the user-run start so a previous user's
    click can never leak across the boundary (no per-user loop, no
    self-join).  SQL-null users form ONE chain, like PARTITION BY.

    Null-ts events are EXCLUDED from the chain on both sides (replica
    drops NaT rows; oracle scans ``WHERE ts IS NOT NULL``) — without the
    shared rule, NaT converts to INT64_MIN in the replica's integer
    arithmetic (a NaT purchase after a NaT click would get lag 0) while
    DuckDB's IGNORE-NULLS window skips the click's ts but not its id."""
    from ocr_ray.stages.join import exchange_map_partitions

    WINDOW_US = 7 * 24 * 3600 * 1_000_000

    def attribute(g: pd.DataFrame) -> pd.DataFrame:
        # nullable outputs ride float64/NaN — the same convention DuckDB's
        # .df() uses for nullable BIGINT, so the driver compare aligns
        empty = pd.DataFrame({
            "event_id": pd.Series(dtype="int64"),
            "attributed_event_id": pd.Series(dtype="float64"),
            "lag_s": pd.Series(dtype="float64")})
        if not len(g) or "event_type" not in g.columns:
            return empty
        g = g[g["ts"].notna()]  # shared null-ts rule with the oracle
        if not len(g):
            return empty
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort",
                          na_position="last")
        codes, _ = pd.factorize(g["user_id"], use_na_sentinel=False)
        n = len(g)
        idx = np.arange(n, dtype=np.int64)
        starts = np.r_[0, np.flatnonzero(codes[1:] != codes[:-1]) + 1]
        runs = np.diff(np.r_[starts, n])
        seg_start = np.repeat(starts, runs)
        is_click = (g["event_type"] == "click").to_numpy()
        # latest click position at-or-before each row; purchases are never
        # clicks, so for them this is strictly-preceding
        last_click = np.maximum.accumulate(np.where(is_click, idx, -1))
        is_p = (g["event_type"] == "purchase").to_numpy()
        if not is_p.any():
            return empty
        p_idx = idx[is_p]
        lc = last_click[p_idx]
        valid = lc >= seg_start[p_idx]  # same user's run only
        ts_us = g["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        eid = g["event_id"].to_numpy(dtype="int64")
        lag_us = np.where(valid, ts_us[p_idx] - ts_us[np.maximum(lc, 0)], -1)
        good = valid & (lag_us <= WINDOW_US)
        att = np.where(good, eid[np.maximum(lc, 0)].astype("float64"),
                       np.nan)
        lag = np.where(good, (lag_us // 1_000_000).astype("float64"),
                       np.nan)
        return pd.DataFrame({"event_id": eid[p_idx],
                             "attributed_event_id": att,
                             "lag_s": lag})

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"])
    out = exchange_map_partitions(ds, "user_id", attribute,
                                  n_partitions=None).to_pandas()
    if "event_id" not in out.columns:
        return pd.DataFrame({
            "event_id": pd.Series(dtype="int64"),
            "attributed_event_id": pd.Series(dtype="float64"),
            "lag_s": pd.Series(dtype="float64")})
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def q_orders_reconcile(sf_dir: str):
    """Cross-table aggregate reconciliation (the warehouse consistency
    gate next to fk_violations): does each order header's total equal the
    sum over its lines?  Per-batch combiner reduces lineitems to
    per-order integer line values BEFORE the one orderkey exchange (the
    exchange moves order-cardinality partials, never raw lines); the
    order header LEFT-joins so headers with no lines are reported, and
    the rollup is a single summary row.

    Exactness: the per-line value is the UNDIVIDED integer product
    ``cents x (1000 - discount_pm) x (1000 + tax_pm)`` (cpm2 units) and
    the header total scales to the same units (``cents x 1e6``), so
    match/mismatch is pure int64 equality with no division-rounding
    ambiguity — a float comparison would misclassify at the epsilon
    boundary and a divided integer would need a rounding convention the
    oracle could drift from."""
    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_join

    def line_partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["l_extendedprice"].to_numpy() * 100 + 0.5
                         ).astype("int64")
        dpm = np.floor(b["l_discount"].to_numpy() * 1000 + 0.5
                       ).astype("int64")
        tpm = np.floor(b["l_tax"].to_numpy() * 1000 + 0.5).astype("int64")
        return (pd.DataFrame({"l_orderkey": b["l_orderkey"].to_numpy(),
                              "line_v": cents * (1000 - dpm) * (1000 + tpm)})
                .groupby("l_orderkey", as_index=False).sum())

    ls = hash_aggregate(
        rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"],
        ).map_batches(line_partial, batch_format="pandas"),
        keys=["l_orderkey"], aggs={"line_v": "sum"}, n_partitions=None,
    )

    def tot_partial(b: pd.DataFrame) -> pd.DataFrame:
        tot = np.floor(b["o_totalprice"].to_numpy() * 100 + 0.5
                       ).astype("int64") * 1_000_000
        return pd.DataFrame({"o_orderkey": b["o_orderkey"].to_numpy(),
                             "tot_v": tot})

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_totalprice"],
    ).map_batches(tot_partial, batch_format="pandas")
    j = exchange_join(orders, ls, on="o_orderkey", right_on="l_orderkey",
                      n_partitions=None, how="left")

    def stat(b: pd.DataFrame) -> pd.DataFrame:
        cols = ["n_orders", "n_no_lines", "n_match", "n_mismatch",
                "max_abs_diff"]
        if not len(b) or "tot_v" not in b.columns:
            return pd.DataFrame([{c: np.int64(0) for c in cols}])
        has = b["line_v"].notna().to_numpy()
        # int64 values to ~1e14 survive the NaN-padded float64 exactly
        # (< 2^53); cast back before comparing so equality stays integer
        lv = b["line_v"].fillna(0).to_numpy(dtype="int64")
        tv = b["tot_v"].to_numpy(dtype="int64")
        diff = np.abs(lv - tv)
        match = has & (diff == 0)
        mism = has & (diff != 0)
        return pd.DataFrame([{
            "n_orders": np.int64(len(b)),
            "n_no_lines": np.int64((~has).sum()),
            "n_match": np.int64(match.sum()),
            "n_mismatch": np.int64(mism.sum()),
            "max_abs_diff": np.int64(diff[has].max()) if has.any()
            else np.int64(0),
        }])

    out = j.map_batches(stat, batch_format="pandas").to_pandas()
    cols = ["n_orders", "n_no_lines", "n_match", "n_mismatch"]
    res = {c: (np.int64(out[c].sum()) if c in out.columns else np.int64(0))
           for c in cols}
    res["max_abs_diff"] = (np.int64(out["max_abs_diff"].max())
                           if "max_abs_diff" in out.columns and len(out)
                           else np.int64(0))
    return pd.DataFrame([res])


def q_pipeline_cascade(sf_dir: str):
    """Dedup-cascade composite — exact dedup, then MinHash near-dup over
    the exact SURVIVORS, reported as a per-document disposition table
    (doc_id, status in {'exact_dup', 'near_dup', 'kept'}): the staged
    shape of production curation (the cheap exact pass runs first so the
    expensive LSH never sees byte-identical copies; cf. Lee et al. 2022
    §4 / RefinedWeb's staged dedup).  Reference analog: the keep-first
    result-cache semantics (ocr_app/utils/result_cache.py) — the cascade
    beyond it is the scale graft.

    Distributed shape: the exact stage is ONE metadata-only content-hash
    exchange (16-byte hashes move, not text); survivor text is attached
    by ONE doc_id anti-join exchange (text moves once — the near-dup
    verify needs it anyway) and feeds the fully distributed MinHash path
    (stages/dedup.py:minhash_dedup_pairs, input materialized once inside)
    whose pairs collapse via min-label connected components; the final
    status table is ONE doc_id exchange over three metadata legs (all
    ids / exact losers / near losers).  Input contract matches
    q_dedup_exact: non-null text."""
    from ocr_ray.stages.dedup import (add_content_hash,
                                      connected_components,
                                      minhash_dedup_pairs)
    from ocr_ray.stages.join import exchange_map_partitions

    # materialized ONCE: consumed by the hash leg and the text-attach leg
    # (launch_splits contract: multi-consumer inputs materialize up front;
    # the object store spills rather than re-scanning the source twice)
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]).materialize()

    def hash_batch(b: pd.DataFrame) -> pd.DataFrame:
        return add_content_hash(b)[["doc_id", "content_hash"]]

    def exact_losers_part(g: pd.DataFrame) -> pd.DataFrame:
        if "content_hash" not in g.columns or not len(g):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
        g = g.sort_values(["content_hash", "doc_id"], kind="mergesort")
        return g.loc[g["content_hash"].duplicated(keep="first"),
                     ["doc_id"]].astype({"doc_id": "int64"})

    exact_losers = exchange_map_partitions(
        docs.map_batches(hash_batch, batch_format="pandas"),
        "content_hash", exact_losers_part, None).materialize()

    # survivor text: hash-exchange anti-join on doc_id (removed set never
    # lands on the driver; mirrors dedup.py:keep_representatives)
    def doc_leg(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": b["doc_id"].astype("int64"),
                             "text": b["text"],
                             "removed": np.int64(0)})

    def loser_leg(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": b["doc_id"].astype("int64"),
                             "text": pd.Series([None] * len(b),
                                               dtype="object"),
                             "removed": np.int64(1)})

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        if "removed" not in g.columns or not len(g):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "text": pd.Series(dtype="object")})
        bad = set(g.loc[g["removed"] == 1, "doc_id"])
        keep = g[(g["removed"] == 0) & ~g["doc_id"].isin(bad)]
        return keep[["doc_id", "text"]]

    survivors = exchange_map_partitions(
        docs.map_batches(doc_leg, batch_format="pandas").union(
            exact_losers.map_batches(loser_leg, batch_format="pandas")),
        "doc_id", anti, None)

    pairs = minhash_dedup_pairs(
        survivors, n_perm=64, n_bands=16, shingle_k=MINHASH_SHINGLE_K,
        threshold=JACCARD_THRESHOLD, n_partitions=None)
    cc = connected_components(pairs, n_partitions=8)

    # status assembly: one doc_id exchange over three metadata legs
    def kept_leg(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": b["doc_id"].astype("int64"),
                             "pri": np.int64(0)})

    def near_leg(b: pd.DataFrame) -> pd.DataFrame:
        if "cluster_id" not in b.columns or not len(b):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "pri": pd.Series(dtype="int64")})
        d = b[b["doc_id"] != b["cluster_id"]]
        return pd.DataFrame({"doc_id": d["doc_id"].astype("int64"),
                             "pri": np.int64(1)})

    def exact_leg(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": b["doc_id"].astype("int64"),
                             "pri": np.int64(2)})

    legs = (
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id"])
        .map_batches(kept_leg, batch_format="pandas")
        .union(cc.map_batches(near_leg, batch_format="pandas"))
        .union(exact_losers.map_batches(exact_leg, batch_format="pandas"))
    )

    _STATUS = np.array(["kept", "near_dup", "exact_dup"], dtype=object)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        if "pri" not in g.columns or not len(g):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "status": pd.Series(dtype="object")})
        m = g.groupby("doc_id", as_index=False)["pri"].max()
        m["status"] = _STATUS[m["pri"].to_numpy()]
        return m[["doc_id", "status"]]

    return exchange_map_partitions(legs, "doc_id", finish, None)


# ================================================================ registry
def queries() -> Dict[str, Callable]:
    return {
        "doc_clean": q_doc_clean,
        "doc_score": q_doc_score,
        "doc_quality": q_doc_quality,
        "doc_quality_score": q_doc_quality_score,
        "doc_chunks_window": q_doc_chunks_window,
        "doc_fingerprint": q_doc_fingerprint,
        "doc_tokens": q_doc_tokens,
        "doc_format": q_doc_format,
        "doc_tables": q_doc_tables,
        "doc_langid": q_doc_langid,
        "doc_split": q_doc_split,
        "doc_top_terms": q_doc_top_terms,
        "doc_postings": q_doc_postings,
        "index_lookup": q_index_lookup,
        "entities_customer": q_entities_customer,
        "doc_pii_redact": q_doc_pii_redact,
        "split_contamination": q_split_contamination,
        "doc_length_quantiles": q_doc_length_quantiles,
        "doc_tfidf": q_doc_tfidf,
        "doc_bigram_fluency": q_doc_bigram_fluency,
        "doc_lang_top_terms": q_doc_lang_top_terms,
        "doc_sample_stratified": q_doc_sample_stratified,
        "pipeline_curation": q_pipeline_curation,
        "doc_repetition": q_doc_repetition,
        "doc_winnow": q_doc_winnow,
        "doc_overlap": q_doc_overlap,
        "corpus_drift": q_corpus_drift,
        "events_anomaly": q_events_anomaly,
        "q3_shipping": q_q3_shipping,
        "q17_small_qty": q_q17_small_qty,
        "q13_custdist": q_q13_custdist,
        "events_props_stats": q_events_props_stats,
        "q4_priority": q_q4_priority,
        "q5_local_volume": q_q5_local_volume,
        "corpus_heavy_hitters": q_corpus_heavy_hitters,
        "doc_sample_weighted": q_doc_sample_weighted,
        "events_enriched": q_events_enriched,
        "events_enriched_adaptive": q_events_enriched_adaptive,
        "doc_sample_per_source": q_doc_sample_per_source,
        "lineitems_top_customers": q_lineitems_top_customers,
        "events_dedup": q_events_dedup,
        "events_top_users_per_type": q_events_top_users_per_type,
        "doc_source_distinct_hll": q_doc_source_distinct_hll,
        "io_partitioned_roundtrip": q_io_partitioned_roundtrip,
        "dedup_exact_normalized": q_dedup_exact_normalized,
        "doc_langid_confusion": q_doc_langid_confusion,
        "orders_cumulative": q_orders_cumulative,
        "io_csv_roundtrip": q_io_csv_roundtrip,
        "q7_nation_flows": q_q7_nation_flows,
        "q10_returned": q_q10_returned,
        "q18_top_spenders": q_q18_top_spenders,
        "events_rate": q_events_rate,
        "events_copresence": q_events_copresence,
        "embed_topics": q_embed_topics,
        "events_daily_filled": q_events_daily_filled,
        "dedup_spans": q_dedup_spans,
        "dedup_spans_remove": q_dedup_spans_remove,
        "doc_gopher": q_doc_gopher,
        "corpus_stats": q_corpus_stats,
        "dedup_exact": q_dedup_exact,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_minhash": q_dedup_minhash,
        "dedup_minhash_est": q_dedup_minhash_est,
        "corpus_source_similarity": q_corpus_source_similarity,
        "embed_cluster_cap": q_embed_cluster_cap,
        "doc_lang_gate": q_doc_lang_gate,
        "dedup_keep_best": q_dedup_keep_best,
        "doc_budget_mix": q_doc_budget_mix,
        "doc_winsorize": q_doc_winsorize,
        "doc_mix_temperature": q_doc_mix_temperature,
        "pipeline_mixture": q_pipeline_mixture,
        "pipeline_cascade": q_pipeline_cascade,
        "table_profile": q_table_profile,
        "table_profile_hll": q_table_profile_hll,
        "orders_reconcile": q_orders_reconcile,
        "events_attribution": q_events_attribution,
        "io_compact_roundtrip": q_io_compact_roundtrip,
        "embed_pca": q_embed_pca,
        "events_trend": q_events_trend,
        "events_histogram": q_events_histogram,
        "events_corr": q_events_corr,
        "events_moving": q_events_moving,
        "doc_summary": q_doc_summary,
        "doc_readability": q_doc_readability,
        "q6_forecast": q_q6_forecast,
        "q14_promo": q_q14_promo,
        "q19_brand_qty": q_q19_brand_qty,
        "q15_top_supplier": q_q15_top_supplier,
        "q8_market_share": q_q8_market_share,
        "q9_profit": q_q9_profit,
        "q12_ship_lag": q_q12_ship_lag,
        "rag_bm25_topk": q_rag_bm25_topk,
        "rag_bm25_rerank": q_rag_bm25_rerank,
        "multimodal_transcribe": q_multimodal_transcribe,
        "events_markov": q_events_markov,
        "fk_violations": q_fk_violations,
        "q2_min_shipper": q_q2_min_shipper,
        "q11_value_concentration": q_q11_value_concentration,
        "snapshot_diff": q_snapshot_diff,
        "q16_supplier_cnt": q_q16_supplier_cnt,
        "q20_qualified_shippers": q_q20_qualified_shippers,
        "q21_late_supplier": q_q21_late_supplier,
        "q22_lost_customers": q_q22_lost_customers,
        "dedup_clusters": q_dedup_clusters,
        "dedup_keep": q_dedup_keep,
        "doc_source_stats": q_doc_source_stats,
        "doc_novelty": q_doc_novelty,
        "doc_clf": q_doc_clf,
        "doc_shuffle": q_doc_shuffle,
        "doc_pack": q_doc_pack,
        "dedup_incremental": q_dedup_incremental,
        "dedup_bloom": q_dedup_bloom,
        "corpus_hll": q_corpus_hll,
        "embed_rp": q_embed_rp,
        "pipeline_refresh": q_pipeline_refresh,
        "events_hourly_users": q_events_hourly_users,
        "events_funnel": q_events_funnel,
        "events_value_quantiles": q_events_value_quantiles,
        "events_retention": q_events_retention,
        "customers_no_orders": q_customers_no_orders,
        "events_active_7d": q_events_active_7d,
        "corpus_pmi": q_corpus_pmi,
        "doc_encode": q_doc_encode,
        "pipeline_tokenize": q_pipeline_tokenize,
        "parts_ordered": q_parts_ordered,
        "orders_line_gaps": q_orders_line_gaps,
        "orders_cust_totals": q_orders_cust_totals,
        "events_gaps": q_events_gaps,
        "events_rollup": q_events_rollup,
        "events_pivot": q_events_pivot,
        "embed_gram": q_embed_gram,
        "io_jsonl_roundtrip": q_io_jsonl_roundtrip,
        "bpe_train": q_bpe_train,
        "events_latest": q_events_latest,
        "doc_fim": q_doc_fim,
        "doc_echo": q_doc_echo,
        "events_daily_overlap": q_events_daily_overlap,
        "embed_dim_stats": q_embed_dim_stats,
        "fuzzy_join_customers": q_fuzzy_join_customers,
        "doc_lm": q_doc_lm,
        "dedup_blocks": q_dedup_blocks,
        "embed_kmeans": q_embed_kmeans,
        "dedup_semantic": q_dedup_semantic,
        "doc_source_rank": q_doc_source_rank,
        "pipeline_curation2": q_pipeline_curation2,
        "doc_rank_len": q_doc_rank_len,
        "doc_mix": q_doc_mix,
        "pipeline_training": q_pipeline_training,
        "doc_dsir": q_doc_dsir,
        "dsir_select": q_dsir_select,
        "corpus_countmin": q_corpus_countmin,
        "graph_pagerank": q_graph_pagerank,
        "graph_triangles": q_graph_triangles,
        "corpus_distinct_sketch": q_corpus_distinct_sketch,
        "dedup_simhash": q_dedup_simhash,
        "dedup_embed": q_dedup_embed,
        "dedup_embed_lsh": q_dedup_embed_lsh,
        "embed_docs": q_embed_docs,
        "embed_text_knn": q_embed_text_knn,
        "embed_knn": q_embed_knn,
        "embed_quantize": q_embed_quantize,
        "embed_qknn": q_embed_qknn,
        "embed_label_stats": q_embed_label_stats,
        "ann_lsh": q_ann_lsh,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf": q_ann_ivf,
        "q1_pricing": q_q1_pricing,
        "top_customers": q_top_customers,
        "events_hourly": q_events_hourly,
        "events_sessions": q_events_sessions,
        "segment_revenue": q_segment_revenue,
        "supplier_regions": q_supplier_regions,
        "events_asof": q_events_asof,
        "events_window": q_events_window,
        "events_range_join": q_events_range_join,
        "rag_keyword_topk": q_rag_keyword_topk,
        "rag_answer": q_rag_answer,
        "rag_embed_answer": q_rag_embed_answer,
        "doc_chunks_para": q_doc_chunks_para,
        "doc_langs_distinct": q_doc_langs_distinct,
        "multimodal_meta": q_multimodal_meta,
        "multimodal_audio": q_multimodal_audio,
        "multimodal_resize": q_multimodal_resize,
        "multimodal_frames": q_multimodal_frames,
        "model_score_docs": q_model_score_docs,
        "rag_model_answer": q_rag_model_answer,
    }


_STOP_SQL = ", ".join(f"'{w}'" for w in STOP_WORDS)

# Shared recursive-closure CTE chain for the minhash-cluster oracles
# (dedup_clusters / dedup_keep): sparse shingle self-join pair CTE, then
# transitive closure (UNION dedup terminates cycles), cluster = min
# reachable id.  MATERIALIZED hints keep the recursive part from
# re-evaluating the pair join every iteration.
_CLUSTER_CTES = rf"""
WITH RECURSIVE
t AS MATERIALIZED (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
s AS MATERIALIZED (SELECT doc_id,
        CASE WHEN len(w) < {MINHASH_SHINGLE_K} THEN [array_to_string(w, ' ')]
             ELSE list_distinct(list_transform(generate_series(1, len(w)-{MINHASH_SHINGLE_K - 1}),
                                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) END AS sh
      FROM t),
sz AS MATERIALIZED (SELECT doc_id, len(sh) AS n FROM s),
fx AS MATERIALIZED (SELECT doc_id, x.sh AS g FROM s, unnest(s.sh) AS x(sh)),
p AS MATERIALIZED (
  SELECT CAST(l AS BIGINT) AS left_id, CAST(r AS BIGINT) AS right_id
  FROM (SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS i
        FROM fx a JOIN fx b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id) inter
  JOIN sz sa ON sa.doc_id = l JOIN sz sb ON sb.doc_id = r
  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {JACCARD_THRESHOLD}),
edges AS MATERIALIZED (SELECT left_id AS a, right_id AS b FROM p
          UNION SELECT right_id, left_id FROM p),
reach AS (
  SELECT a AS id, a AS r FROM edges
  UNION
  SELECT reach.id, edges.b FROM reach JOIN edges ON reach.r = edges.a
)
"""

def _hll_mulmod64(zexpr: str, c: int) -> str:
    """(z * c) mod 2^64 in HUGEINT without INT128 overflow: split c into
    32-bit halves — z*c = z*c_lo + ((z*c_hi mod 2^32) << 32)  (mod 2^64)."""
    c_hi, c_lo = c >> 32, c & 0xFFFFFFFF
    return (f"((({zexpr}) * {c_lo} + ((({zexpr}) * {c_hi}) % 4294967296)"
            f" * 4294967296) % 18446744073709551616)")


# Bloom-filter probe expressions (stages/bloom.py constants, frozen):
# top-16-bits multiplicative hash in exact HUGEINT arithmetic
def _bloom_probe_sql(a: int, b: int) -> str:
    return (f"((CAST(h AS HUGEINT) * {a} + {b}) % 18446744073709551616)"
            f" // 281474976710656")


from ocr_ray.stages.aggregate import (  # noqa: E402
    HLL_SM64_C0 as _HLL_C0,
    HLL_SM64_C1 as _HLL_C1,
    HLL_SM64_C2 as _HLL_C2,
    _HLL_ALPHA,
)
from ocr_ray.stages.bloom import BLOOM_CONSTS as _BLOOM_CONSTS  # noqa: E402

_BLOOM_CPOS = "\nUNION ".join(
    f"SELECT DISTINCT {_bloom_probe_sql(a, b)} AS pos FROM keys WHERE source <> 'src19'"
    for a, b in _BLOOM_CONSTS
)
_BLOOM_TEST = "\n   AND ".join(
    f"{_bloom_probe_sql(a, b)} IN (SELECT pos FROM cpos)" for a, b in _BLOOM_CONSTS
)

# winnowing fingerprint selection, shared by doc_winnow (directly) and
# doc_overlap (as the candidate-generation CTE)
_WINNOW_SQL = r"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w_ FROM documents),
h AS (SELECT doc_id, list_transform(w_, tok ->
        list_reduce(list_prepend(7, list_transform(string_split(tok, ''), c -> unicode(c))),
                    (a, b) -> (a * 31 + b) % 1000003)) AS th
      FROM t WHERE len(w_) >= 4),
kg AS (SELECT doc_id, unnest(generate_series(1, len(th) - 3)) AS s, th FROM h),
keyed AS (SELECT doc_id, s - 1 AS pos,
        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), th[s : s + 3]),
             (a, b) -> (a * 1000003 + b) % 2147483647) AS BIGINT) * 1048576
          - (s - 1) AS key
       FROM kg),
wins AS (SELECT doc_id, pos,
           min(key) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS mk,
           count(*) OVER (PARTITION BY doc_id) AS m
         FROM keyed),
sel AS (SELECT DISTINCT doc_id, mk FROM wins WHERE pos <= greatest(m - 5, 0))
SELECT doc_id,
  CAST(((-mk) % 1048576 + 1048576) % 1048576 AS BIGINT) AS pos,
  CAST((mk + ((-mk) % 1048576 + 1048576) % 1048576) // 1048576 AS BIGINT) AS fp
FROM sel
"""

# ExactSubstr span detection, shared by dedup_spans (directly) and
# dedup_spans_remove (as the spans CTE): identical two-family 62-bit
# window hashes (PolySimHasher families), global dup test,
# gaps-and-islands merge
_SPANS_SQL = r"""
WITH t AS (SELECT CAST(doc_id AS BIGINT) AS id,
                  string_split_regex(trim(text), '\s+') AS w
           FROM documents WHERE trim(text) <> ''),
th AS (SELECT id, len(w) AS n,
   list_transform(w, tok -> list_reduce(list_prepend(CAST(7 AS BIGINT),
       list_transform(string_split(tok, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 31 + b) % 1000003)) AS t1,
   list_transform(w, tok -> list_reduce(list_prepend(CAST(11 AS BIGINT),
       list_transform(string_split(tok, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 37 + b) % 1000033)) AS t2
 FROM t),
kg AS (SELECT id, unnest(generate_series(1, n - 7)) AS s, t1, t2
       FROM th WHERE n >= 8),
wh AS (SELECT id, s - 1 AS pos,
   list_reduce(list_prepend(CAST(0 AS BIGINT), t1[s : s + 7]),
               (a, b) -> (a * 1000003 + b) % 2147483647)
   + list_reduce(list_prepend(CAST(0 AS BIGINT), t2[s : s + 7]),
                 (a, b) -> (a * 1000033 + b) % 2147483647) * 2147483648 AS h
 FROM kg),
flag AS (SELECT id, pos FROM
           (SELECT id, pos, count(*) OVER (PARTITION BY h) AS c FROM wh)
         WHERE c >= 2),
ord AS (SELECT id, pos,
   CASE WHEN pos - lag(pos) OVER (PARTITION BY id ORDER BY pos) <= 8
        THEN 0 ELSE 1 END AS brk
 FROM flag),
grp AS (SELECT id, pos,
   sum(brk) OVER (PARTITION BY id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS gid
 FROM ord)
SELECT id AS doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + 7 AS BIGINT) AS span_end
FROM grp GROUP BY id, gid
"""

ORACLE_SQL: Dict[str, str] = {
    "doc_clean": rf"""
SELECT doc_id,
  trim(regexp_replace(regexp_replace(regexp_replace(text, '\s+', ' ', 'g'),
       '\n{{3,}}', chr(10)||chr(10), 'g'), '[^[:ascii:]]+', '', 'g')) AS clean_preprocess,
  trim(regexp_replace(regexp_replace(regexp_replace(text, '\s+', ' ', 'g'),
       '[^\x20-\x7E\n\t]', '', 'g'), '(\r\n|\r|\n){{3,}}', chr(10)||chr(10), 'g')) AS clean_extracted
FROM documents
""",
    # floor(x*1e6+0.5)/1e6, not round(): identical IEEE ops on both engines
    # (Python round() and DuckDB round() split exact half-boundaries)
    "doc_score": r"""
SELECT doc_id,
  floor((
    least(length(text)/100.0, 10)
    + least(array_length(list_distinct(regexp_extract_all(lower(text), '\w+')))/10.0, 10)
    + (length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) / CAST(length(text) AS DOUBLE)) * 10
    + CASE WHEN contains(text, chr(10)) THEN 5 ELSE 0 END
    - CASE WHEN length(text) < 20 THEN 5 ELSE 0 END) * 1000000 + 0.5) / 1000000 AS score
FROM documents
""",
    "doc_quality": rf"""
WITH t AS (SELECT doc_id, text, regexp_extract_all(lower(text), '\w+') AS toks FROM documents)
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
  round(CAST(len(list_filter(toks, x -> x IN ({_STOP_SQL}))) AS DOUBLE) / greatest(1, len(toks)), 6) AS stop_ratio,
  round(CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS DOUBLE) / greatest(1, len(toks)), 6) AS mean_token_len,
  CASE WHEN length(text) < 20 THEN 'en'
       WHEN regexp_matches(text, '[\x{{4e00}}-\x{{9fff}}]') THEN 'zh'
       WHEN regexp_matches(text, '[\x{{3040}}-\x{{30ff}}]') THEN 'ja'
       WHEN regexp_matches(text, '[\x{{ac00}}-\x{{d7af}}]') THEN 'ko'
       WHEN regexp_matches(text, '[\x{{0600}}-\x{{06ff}}]') THEN 'ar'
       WHEN regexp_matches(text, '[\x{{0400}}-\x{{04ff}}]') THEN 'ru'
       ELSE 'en' END AS lang_fallback
FROM t
""",
    # M15 weighted quality score + issue tags: intermediates are exact
    # integer sums, so both sides produce bit-identical doubles; floats are
    # deliberately UNROUNDED (the driver's canonical 9-dp round compares)
    "doc_quality_score": r"""
WITH c AS (
  SELECT doc_id, text,
    list_transform(string_split(text, ''), ch -> unicode(ch)) AS codes
  FROM documents),
m AS (
  SELECT doc_id, text, len(codes) AS n,
    CAST(len(list_distinct(codes)) AS DOUBLE) AS contrast,
    CAST(list_sum(codes) AS DOUBLE) / len(codes) AS brightness,
    CAST(list_sum(list_transform(codes, x -> CAST(x AS BIGINT) * x)) AS DOUBLE) / len(codes)
      - (CAST(list_sum(codes) AS DOUBLE) / len(codes))
        * (CAST(list_sum(codes) AS DOUBLE) / len(codes)) AS sharpness,
    100.0 * len(regexp_extract_all(text, '[!-/:-@\[-`{-~]')) / len(codes) AS noise_level,
    CAST(list_max(codes) - list_min(codes) AS DOUBLE) AS spread,
    least(1.0, len(codes) / 1000.0) AS res
  FROM c),
s AS (
  SELECT *,
    (CASE WHEN contrast < 40 THEN contrast/40 WHEN contrast > 80 THEN 1.0 ELSE (contrast-40)/(80-40) END) * 0.3
    + (CASE WHEN brightness < 100 THEN brightness/100 WHEN brightness > 200 THEN 1.0 ELSE (brightness-100)/(200-100) END) * 0.2
    + (CASE WHEN sharpness < 50 THEN sharpness/50 WHEN sharpness > 200 THEN 1.0 ELSE (sharpness-50)/(200-50) END) * 0.3
    + (1.0 - (CASE WHEN noise_level > 10 THEN 1.0 ELSE (noise_level-0)/(10-0) END)) * 0.1
    + res * 0.1 AS quality_score
  FROM m)
SELECT doc_id, contrast, brightness, sharpness, noise_level, quality_score,
  array_to_string(list_filter([
    CASE WHEN n < 1000 THEN 'low_resolution' ELSE '' END,
    CASE WHEN sharpness < 100 THEN 'blurry' ELSE '' END,
    CASE WHEN spread < 50 THEN 'low_contrast' ELSE '' END,
    CASE WHEN noise_level > 20 THEN 'noise' ELSE '' END], x -> x <> ''), ',') AS issues
FROM s
""",
    "doc_chunks_window": r"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
           FROM documents WHERE trim(text) <> ''),
     e AS (SELECT doc_id, w,
                  unnest(generate_series(0, CAST(ceil(len(w)/80.0) AS INT) - 1)) AS ci
           FROM t)
SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
       array_to_string(w[ci*80+1 : ci*80+100], ' ') AS chunk
FROM e
""",
    "entities_customer": r"""
WITH v AS (
  SELECT c_custkey,
         'Contact ' || lower(regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g'))
           || '@example.com or call (555) 123-4567 on 12/31/2024 visit https://example.com/'
           || lower(regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g')) AS synth
  FROM customer)
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
  regexp_extract(synth, '\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b') AS email,
  regexp_extract(synth, '\b(?:\+\d{1,3}[- ]?)?\(?\d{3}\)?[- ]?\d{3}[- ]?\d{4}\b') AS phone,
  regexp_extract(synth, '(?i)\b\d{1,2}[/-]\d{1,2}[/-]\d{2,4}\b') AS date_found,
  regexp_extract(synth, 'https?://(?:[-\w.]|(?:%[\da-fA-F]{2}))+') AS url,
  CAST(len(regexp_extract_all(synth, '\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b')) AS BIGINT) AS n_emails
FROM v
""",
    # same sequential replace order as functions/entities.py:redact_pii
    # (url -> email -> phone -> three date patterns); counts on the raw
    # synthesized text.  DuckDB's regexp engine is RE2 — pattern-equivalent
    # to the compiled Python patterns on this corpus (validated end to end).
    "doc_pii_redact": r"""
WITH s AS (
  SELECT doc_id,
    text || ' Contact user' || CAST(doc_id AS VARCHAR)
         || '@example.com or +1 (555) 123-4567 on 12/31/2024 via https://example.com/u'
         || CAST(doc_id AS VARCHAR) AS synth
  FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
    synth,
    'https?://(?:[-\w.]|(?:%[\da-fA-F]{2}))+', '[URL]', 'g'),
    '\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b', '[EMAIL]', 'g'),
    '\b(?:\+\d{1,3}[- ]?)?\(?\d{3}\)?[- ]?\d{3}[- ]?\d{4}\b', '[PHONE]', 'g'),
    '(?i)\b\d{1,2}[/-]\d{1,2}[/-]\d{2,4}\b', '[DATE]', 'g'),
    '(?i)\b\d{4}[/-]\d{1,2}[/-]\d{1,2}\b', '[DATE]', 'g'),
    '(?i)\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]* \d{1,2},? \d{4}\b', '[DATE]', 'g')
    AS redacted,
  CAST(len(regexp_extract_all(synth, 'https?://(?:[-\w.]|(?:%[\da-fA-F]{2}))+')) AS BIGINT) AS n_urls,
  CAST(len(regexp_extract_all(synth, '\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(synth, '\b(?:\+\d{1,3}[- ]?)?\(?\d{3}\)?[- ]?\d{3}[- ]?\d{4}\b')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(synth, '(?i)\b\d{1,2}[/-]\d{1,2}[/-]\d{2,4}\b')) AS BIGINT)
    + CAST(len(regexp_extract_all(synth, '(?i)\b\d{4}[/-]\d{1,2}[/-]\d{1,2}\b')) AS BIGINT)
    + CAST(len(regexp_extract_all(synth, '(?i)\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]* \d{1,2},? \d{4}\b')) AS BIGINT) AS n_dates
FROM s
""",
    "doc_tokens": rf"""
SELECT doc_id,
  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT) AS n_bpe_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_alpha,
  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_num
FROM documents
""",
    "doc_format": r"""
WITH s AS (
  SELECT doc_id,
    upper(array_to_string((string_split_regex(trim(text), '\s+'))[1:4], ' '))
      || chr(10) || text AS synth
  FROM documents),
l AS (SELECT doc_id, string_split(synth, chr(10)) AS lines FROM s)
SELECT doc_id,
  array_to_string(list_transform(lines, x ->
    CASE WHEN trim(x) = upper(trim(x)) AND trim(x) <> lower(trim(x))
              AND length(trim(x)) > 3 AND length(trim(x)) < 50
         THEN '## ' || x ELSE x END), chr(10)) AS md,
  '<div class="ocr-text">' || chr(10)
    || array_to_string(list_transform(lines, x ->
         CASE WHEN trim(x) = '' THEN '<br>' ELSE '<p>' || x || '</p>' END), chr(10))
    || chr(10) || '</div>' AS html
FROM l
""",
    "doc_tables": r"""
WITH s AS (SELECT doc_id,
    text || CASE WHEN doc_id % 5 = 0
                 THEN chr(10) || '| a | b |' || chr(10) || '| 1 | 2 |' || chr(10) || '| 3 | 4 |'
                 ELSE '' END AS synth
  FROM documents)
SELECT doc_id,
  CAST(len(list_filter(string_split(synth, chr(10)),
           x -> len(regexp_extract_all(x, '\|')) >= 2)) AS BIGINT) AS n_pipe_lines,
  len(list_filter(string_split(synth, chr(10)),
      x -> len(regexp_extract_all(x, '\|')) >= 2)) >= 3 AS has_table
FROM s
""",
    "doc_langid": rf"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS toks FROM documents),
c AS (SELECT doc_id,
  CAST(len(list_filter(toks, x -> x IN ({", ".join(f"'{w}'" for w in LANG_MARKERS['en'])}))) AS BIGINT) AS n_en,
  CAST(len(list_filter(toks, x -> x IN ({", ".join(f"'{w}'" for w in LANG_MARKERS['de'])}))) AS BIGINT) AS n_de,
  CAST(len(list_filter(toks, x -> x IN ({", ".join(f"'{w}'" for w in LANG_MARKERS['fr'])}))) AS BIGINT) AS n_fr,
  CAST(len(list_filter(toks, x -> x IN ({", ".join(f"'{w}'" for w in LANG_MARKERS['es'])}))) AS BIGINT) AS n_es
 FROM t)
SELECT doc_id, n_en, n_de, n_fr, n_es,
  CASE WHEN n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
       WHEN n_de >= n_fr AND n_de >= n_es THEN 'de'
       WHEN n_fr >= n_es THEN 'fr'
       ELSE 'es' END AS lang_guess
FROM c
""",
    # the doc_langid detector chain with the true-lang column carried
    # through, rolled up to the (lang, detected) matrix
    "doc_langid_confusion": rf"""
WITH t AS (SELECT lang, regexp_extract_all(lower(text), '\w+') AS toks FROM documents),
c AS (SELECT lang,
  CAST(len(list_filter(toks, x -> x IN ({", ".join(f"'{w}'" for w in LANG_MARKERS['en'])}))) AS BIGINT) AS n_en,
  CAST(len(list_filter(toks, x -> x IN ({", ".join(f"'{w}'" for w in LANG_MARKERS['de'])}))) AS BIGINT) AS n_de,
  CAST(len(list_filter(toks, x -> x IN ({", ".join(f"'{w}'" for w in LANG_MARKERS['fr'])}))) AS BIGINT) AS n_fr,
  CAST(len(list_filter(toks, x -> x IN ({", ".join(f"'{w}'" for w in LANG_MARKERS['es'])}))) AS BIGINT) AS n_es
 FROM t),
g AS (SELECT lang,
  CASE WHEN n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
       WHEN n_de >= n_fr AND n_de >= n_es THEN 'de'
       WHEN n_fr >= n_es THEN 'fr'
       ELSE 'es' END AS detected
 FROM c)
SELECT lang, detected, CAST(count(*) AS BIGINT) AS n
FROM g GROUP BY 1, 2 ORDER BY 1, 2
""",
    "doc_split": f"""
WITH h AS (SELECT doc_id,
    (CAST(doc_id % 4294967296 AS HUGEINT) * {SPLIT_MULT}) % 4294967296 AS hv
  FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(hv % 100 AS BIGINT) AS bucket,
  CASE WHEN hv % 100 < 80 THEN 'train'
       WHEN hv % 100 < 90 THEN 'val'
       ELSE 'test' END AS split
FROM h
""",
    # the ±1 sign table is the polynomial hash of "<dim>:<bit>" — identical
    # on both engines; bucket bit b = (sum_j v[j]*s[j,b] > 0)
    "ann_lsh": """
WITH e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
s AS (SELECT j.j, b.b,
        CASE WHEN list_reduce(list_prepend(CAST(7 AS BIGINT),
               list_transform(string_split(CAST(j.j AS VARCHAR) || ':' || CAST(b.b AS VARCHAR), ''),
                              c -> CAST(unicode(c) AS BIGINT))),
               (a, x) -> (a * 31 + x) % 1000003) % 2 = 0
             THEN 1.0 ELSE -1.0 END AS sv
      FROM (SELECT unnest(generate_series(0, (SELECT max(len(v)) - 1 FROM e))) AS j) AS j,
           (SELECT unnest(generate_series(0, 7)) AS b) AS b),
proj AS (SELECT e.vec_id, s.b, sum(e.v[s.j + 1] * s.sv) AS acc
         FROM e, s GROUP BY e.vec_id, s.b),
bk AS (SELECT vec_id,
              CAST(sum(CASE WHEN acc > 0 THEN 1 << b ELSE 0 END) AS BIGINT) AS bucket
       FROM proj GROUP BY vec_id)
SELECT vec_id, bucket FROM bk
""",
    "doc_lang_top_terms": """
WITH t AS (SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
           FROM documents),
c AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY lang, term),
r AS (SELECT c.*, row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rank FROM c)
SELECT lang, term, n, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 5
""",
    "doc_sample_stratified": f"""
WITH h AS (SELECT doc_id, lang,
    ((CAST(doc_id % 4294967296 AS HUGEINT) * {SPLIT_MULT}) % 4294967296) % 100 AS bucket
  FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, CAST(bucket AS BIGINT) AS bucket
FROM h
WHERE bucket < CASE WHEN lang = 'en' THEN 10 ELSE 50 END
""",
    "corpus_stats": """
WITH t AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(len(w)) AS BIGINT) AS n_token_occurrences,
  CAST((SELECT count(DISTINCT x.t) FROM t, unnest(t.w) AS x(t)) AS BIGINT) AS n_distinct_terms,
  CAST((SELECT count(DISTINCT p) FROM
        (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i+1])) AS p
         FROM t WHERE len(w) >= 2)) AS BIGINT) AS n_distinct_bigrams
FROM t
""",
    # winnowing: same token-hash polynomial as doc_fingerprint, k-gram
    # fold, and the identical h*2^20 - pos tiebreak key — the window MIN
    # is the exact same int64 arithmetic as the numpy sliding-window min
    "doc_winnow": _WINNOW_SQL,
    # drift monitor: exact integer ppm grid (sources x vocab), absent
    # cells materialized by the cross join; same // floor division
    "corpus_drift": """
WITH tok AS (SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
             FROM documents),
st AS (SELECT source, term, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1, 2),
ts AS (SELECT source, sum(n) AS tot FROM st GROUP BY 1),
tt AS (SELECT term, sum(n) AS nt FROM st GROUP BY 1),
tc AS (SELECT sum(n) AS t FROM st),
grid AS (SELECT s.source, t.term, COALESCE(st.n, 0) AS n, t.nt
         FROM (SELECT DISTINCT source FROM st) s
         CROSS JOIN tt t
         LEFT JOIN st ON st.source = s.source AND st.term = t.term)
SELECT g.source, CAST(ts.tot AS BIGINT) AS total_tokens,
  CAST(sum(abs((g.n * 1000000) // ts.tot
               - (g.nt * 1000000) // (SELECT t FROM tc))) AS BIGINT) AS tv2_ppm
FROM grid g JOIN ts USING (source) GROUP BY g.source, ts.tot
""",
    # Hampel-rule anomaly flags with lower-median convention: the
    # ceil(m/2)-th smallest = max over the first ceil(m/2) rows sorted
    # ascending — exact integers end to end
    "events_anomaly": """
WITH c AS (SELECT event_type, date_trunc('day', ts) AS day,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY n) AS rn,
             count(*) OVER (PARTITION BY event_type) AS m
      FROM c),
med AS (SELECT event_type,
               max(n) FILTER (WHERE rn <= (m + 1) // 2) AS med
        FROM r GROUP BY event_type),
d AS (SELECT c.event_type, c.day, c.n, med.med, abs(c.n - med.med) AS dev
      FROM c JOIN med USING (event_type)),
r2 AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
              count(*) OVER (PARTITION BY event_type) AS m
       FROM d),
mad AS (SELECT event_type,
               max(dev) FILTER (WHERE rn <= (m + 1) // 2) AS mad
        FROM r2 GROUP BY event_type)
SELECT d.event_type, d.day, d.n, CAST(d.med AS BIGINT) AS med,
       CAST(mad.mad AS BIGINT) AS mad,
       CAST(CASE WHEN d.dev > 3 * mad.mad THEN 1 ELSE 0 END AS BIGINT)
         AS is_anomaly
FROM d JOIN mad USING (event_type)
""",
    "q3_shipping": """
SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey, o_orderdate,
  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
       AS BIGINT)) AS BIGINT) AS rev_cents
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY rev_cents DESC, l_orderkey LIMIT 10
""",
    # integer rewrite of qty < 0.2*avg: 5*count*qty < sum_qty (integral
    # quantities) — boundary-exact, no float summation-order hazard
    "q17_small_qty": """
WITH s AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c,
                  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
           FROM lineitem GROUP BY 1)
SELECT CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS total_cents,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem JOIN s USING (l_partkey)
WHERE 5 * s.c * CAST(l_quantity AS BIGINT) < s.sq
""",
    # TRY_CAST -> NULL mirrors the engine's to_numeric(errors='coerce'):
    # malformed payloads are excluded from stats, not fatal
    "events_props_stats": r"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
  CAST(COALESCE(sum(TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)), 0) AS BIGINT) AS sum_k,
  CAST(COALESCE(min(TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)), 0) AS BIGINT) AS min_k,
  CAST(COALESCE(max(TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)), 0) AS BIGINT) AS max_k
FROM events GROUP BY event_type
""",
    # RANGE frame peers-included minus self == searchsorted window count
    "events_rate": """
SELECT CAST(event_id AS BIGINT) AS event_id,
  CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) - 1
       AS BIGINT) AS n_prior_1h
FROM events
""",
    # event_type IS NOT NULL aligns with the engine side, where pandas
    # groupby drops null keys (dirty rows are the contract gate's job)
    "events_daily_filled": """
WITH c AS (SELECT event_type, date_trunc('day', ts) AS day,
                  CAST(count(*) AS BIGINT) AS n
           FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
span AS (SELECT min(day) AS lo, max(day) AS hi FROM c),
days AS (SELECT unnest(generate_series(
           (SELECT lo FROM span), (SELECT hi FROM span),
           INTERVAL 1 DAY)) AS day),
grid AS (SELECT t.event_type, d.day
         FROM (SELECT DISTINCT event_type FROM c) t CROSS JOIN days d)
SELECT g.event_type, g.day, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM grid g LEFT JOIN c USING (event_type, day)
""",
    "events_copresence": """
SELECT a.user_id, CAST(a.event_id AS BIGINT) AS left_event,
       CAST(b.event_id AS BIGINT) AS right_event
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
 AND b.ts <= a.ts + INTERVAL 1 HOUR
""",
    "q4_priority": """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
""",
    "q13_custdist": """
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
GROUP BY c_count
""",
    # exact threshold test over the full term stream: the engine's
    # MG-candidates + verify pass provably returns the same set
    "corpus_heavy_hitters": """
WITH t AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
           FROM documents),
tot AS (SELECT count(*) AS total FROM t),
c AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY term)
SELECT term, n FROM c, tot WHERE n * 64 > total
ORDER BY n DESC, term
""",
    # events_enriched_adaptive reuses this exact string below (join
    # strategy cannot change join semantics)
    "events_enriched": """
SELECT CAST(event_id AS BIGINT) AS event_id, user_id,
       CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS user_total
FROM events
""",
    # group by the NORMALIZED text itself — the engine groups by its
    # sha256, identical partitioning absent a 2^-64 collision
    "dedup_exact_normalized": r"""
WITH n AS (SELECT doc_id,
                  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
           FROM documents)
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_variants
FROM n GROUP BY t ORDER BY doc_id
""",
    "io_partitioned_roundtrip": """
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE lang = 'de'
""",
    "events_top_users_per_type": """
WITH c AS (SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n
           FROM events
           WHERE event_type IS NOT NULL AND user_id IS NOT NULL
           GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY n DESC, user_id) AS rn
      FROM c)
SELECT event_type, user_id, n FROM r WHERE rn <= 3
ORDER BY event_type, n DESC, user_id
""",
    "orders_cumulative": """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents
FROM orders
""",
    "io_csv_roundtrip": """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(event_id) AS BIGINT) AS sum_id
FROM events WHERE event_type IS NOT NULL
GROUP BY event_type ORDER BY event_type
""",
    # LAG-based idempotency window; ties at equal ts order by event_id,
    # so a same-second retry (gap 0) is always dropped
    "events_dedup": """
WITH x AS (SELECT event_id, user_id, event_type, ts,
                  lag(ts) OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS pts
           FROM events WHERE event_type IS NOT NULL)
SELECT CAST(event_id AS BIGINT) AS event_id, user_id, event_type
FROM x WHERE pts IS NULL OR ts - pts > INTERVAL 300 SECOND
""",
    "lineitems_top_customers": """
WITH top10 AS (SELECT o_custkey,
                      sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS t
               FROM orders GROUP BY 1 ORDER BY t DESC, o_custkey LIMIT 10),
sel AS (SELECT o_orderkey, o_custkey FROM orders JOIN top10 USING (o_custkey))
SELECT CAST(o_custkey AS BIGINT) AS c_custkey,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN sel ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY revenue_cents DESC, c_custkey
""",
    "doc_sample_per_source": """
WITH h AS (SELECT source, CAST(doc_id AS BIGINT) AS doc_id,
                  CAST((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT) AS h
           FROM documents),
r AS (SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY h, doc_id) AS rn
      FROM h)
SELECT source, doc_id, h FROM r WHERE rn <= 20
ORDER BY source, h, doc_id
""",
    # priority sampling: u*2^20 <= 2^52, exact in BIGINT on both sides
    "doc_sample_weighted": """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761) % 4294967296) * 1048576
            // GREATEST(n_chars, 1) AS BIGINT) AS priority
FROM documents
ORDER BY priority, doc_id
LIMIT 100
""",
    # per-row floor(x*100+0.5) cents BEFORE the sum matches the engine's
    # exact-integer revenue association on all four TPC-H-style joins below
    "q5_local_volume": """
SELECT n_name,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
ORDER BY revenue_cents DESC, n_name
""",
    "q7_nation_flows": """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1997-01-01'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""",
    "q10_returned": """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents,
       n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
  AND l_returnflag = 'R'
GROUP BY 1, 2, 4, 5
ORDER BY revenue_cents DESC, c_custkey
LIMIT 20
""",
    "q18_top_spenders": """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
       CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderdate,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_cents,
       CAST(sum_qty AS BIGINT) AS sum_qty
FROM (SELECT l_orderkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY 1 HAVING sum_qty > 200) q
JOIN orders   ON o_orderkey = q.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY totalprice_cents DESC, o_orderkey
LIMIT 100
""",
    # ExactSubstr spans: identical two-family 62-bit window hashes
    # (PolySimHasher families), global dup test, gaps-and-islands merge
    "dedup_spans": _SPANS_SQL,
    # removal: splice covered token positions out, rebuild text in order;
    # fully-duplicated docs keep a row with empty dedup_text
    "dedup_spans_remove": f"""
WITH spans AS ({_SPANS_SQL}),
t AS (SELECT CAST(doc_id AS BIGINT) AS id,
             string_split_regex(trim(text), '\\s+') AS w
      FROM documents WHERE trim(text) <> ''),
tok AS (SELECT id, unnest(w) AS tok,
               unnest(generate_series(1, len(w))) AS p
        FROM t),
cover AS (SELECT doc_id AS id,
                 unnest(generate_series(span_start + 1, span_end + 1)) AS p
          FROM spans),
kept AS (SELECT tok.id, tok.tok, tok.p
         FROM tok LEFT JOIN cover ON tok.id = cover.id AND tok.p = cover.p
         WHERE cover.p IS NULL),
k AS (SELECT id, CAST(count(*) AS BIGINT) AS cnt,
             string_agg(tok, ' ' ORDER BY p) AS txt
      FROM kept GROUP BY id)
SELECT t.id AS doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens,
       CAST(len(t.w) - COALESCE(k.cnt, 0) AS BIGINT) AS n_dup_tokens,
       COALESCE(k.txt, '') AS dedup_text
FROM t LEFT JOIN k ON t.id = k.id
""",
    # overlap candidates THROUGH the winnow fingerprints: distinct
    # (doc, fp), boilerplate fps (df > 32) dropped on both sides, pair
    # counts — the end-to-end MOSS overlap detector
    "doc_overlap": f"""
WITH base AS ({_WINNOW_SQL}),
wf AS (SELECT DISTINCT doc_id, fp FROM base),
eligible AS (SELECT fp FROM wf GROUP BY fp HAVING count(*) BETWEEN 2 AND 32),
p AS (SELECT a.doc_id AS l, b.doc_id AS r
      FROM wf a JOIN wf b USING (fp) JOIN eligible USING (fp)
      WHERE a.doc_id < b.doc_id)
SELECT l AS left_id, r AS right_id, CAST(count(*) AS BIGINT) AS n_shared
FROM p GROUP BY l, r HAVING count(*) >= 2
""",
    "doc_repetition": """
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM documents),
p AS (SELECT doc_id,
        CASE WHEN len(w) >= 2
             THEN list_transform(generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i+1])
             ELSE [] END AS pairs
      FROM t)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(len(pairs) AS BIGINT) AS n_pairs,
  CAST(len(list_distinct(pairs)) AS BIGINT) AS n_distinct_pairs,
  CASE WHEN len(pairs) > 0
       THEN round(CAST(len(pairs) - len(list_distinct(pairs)) AS DOUBLE) / len(pairs), 6)
       ELSE 0.0 END AS dup_ratio
FROM p
""",
    # exclusive prefix sum of token counts under ORDER BY (shuffle_hash,
    # doc_id) = deterministic_pack's start_offset; per-token global
    # position then slices into 1024-token bins; same vocab as doc_encode
    "pipeline_tokenize": r"""
WITH t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CASE WHEN trim(text) = '' THEN []
       ELSE string_split_regex(trim(text), '\s+') END AS w FROM documents),
m AS (SELECT doc_id, w, len(w) AS n_tok,
  CAST((CAST(doc_id AS HUGEINT) * 2685821657736338717)
       % 4611686018427387904 AS BIGINT) AS h
 FROM t),
o AS (SELECT doc_id, w,
  CAST(coalesce(sum(n_tok) OVER (ORDER BY h, doc_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
 FROM m),
occ AS (SELECT doc_id, off + s.i - 1 AS gpos, w[s.i] AS term
        FROM o, unnest(generate_series(1, len(w))) AS s(i)),
vocab AS (SELECT term,
                 row_number() OVER (ORDER BY count(*) DESC, term) - 1 AS tid
          FROM (SELECT unnest(w) AS term FROM t) GROUP BY term)
SELECT occ.doc_id, CAST(gpos // 1024 AS BIGINT) AS bin,
  CAST(gpos % 1024 AS BIGINT) AS pos_in_bin,
  CAST(CASE WHEN vocab.tid < 65536 THEN vocab.tid ELSE -1 END AS BIGINT) AS token_id
FROM occ JOIN vocab USING (term)
""",
    # vocab id = dense rank by (total count desc, term); positions via
    # generate_series over the whitespace token list (0-based)
    "doc_encode": r"""
WITH t AS (SELECT doc_id,
  CASE WHEN trim(text) = '' THEN []
       ELSE string_split_regex(trim(text), '\s+') END AS w FROM documents),
occ AS (SELECT doc_id, s.i - 1 AS pos, w[s.i] AS term
        FROM t, unnest(generate_series(1, len(w))) AS s(i)),
vocab AS (SELECT term,
                 row_number() OVER (ORDER BY count(*) DESC, term) - 1 AS tid
          FROM occ GROUP BY term)
SELECT CAST(occ.doc_id AS BIGINT) AS doc_id, CAST(occ.pos AS BIGINT) AS pos,
  CAST(CASE WHEN vocab.tid < 65536 THEN vocab.tid ELSE -1 END AS BIGINT) AS token_id
FROM occ JOIN vocab USING (term)
""",
    # per-doc distinct-term self-join (a < b), exact integer counts, single
    # ln per surviving pair with the same floor-rounding
    "corpus_pmi": r"""
WITH t AS (SELECT doc_id,
  list_sort(list_distinct(CASE WHEN trim(text) = '' THEN []
       ELSE string_split_regex(trim(text), '\s+') END)) AS terms
  FROM documents),
n AS (SELECT count(*) AS nd FROM documents),
p AS (SELECT t.doc_id, a.x AS a, b.x AS b
      FROM t, unnest(t.terms) AS a(x), unnest(t.terms) AS b(x)
      WHERE a.x < b.x),
cp AS (SELECT a, b, count(*) AS c_ab FROM p GROUP BY a, b),
d AS (SELECT x AS term, count(*) AS df
      FROM (SELECT doc_id, unnest(terms) AS x FROM t) GROUP BY x),
top AS (SELECT a, b, c_ab FROM cp ORDER BY c_ab DESC, a, b LIMIT 20)
SELECT top.a, top.b, CAST(top.c_ab AS BIGINT) AS c_ab,
  floor(ln(CAST(n.nd * top.c_ab AS DOUBLE) / (da.df * db.df)) * 1e6 + 0.5) / 1e6 AS pmi
FROM top
CROSS JOIN n
JOIN d da ON da.term = top.a
JOIN d db ON db.term = top.b
""",
    # every Gopher rule recomputed from the raw text; keep-conditions are
    # the same scaled-integer comparisons as the Python side
    "doc_gopher": r"""
WITH t AS (
  SELECT doc_id, text,
    CASE WHEN trim(text) = '' THEN [] ELSE string_split_regex(trim(text), '\s+') END AS w,
    string_split(text, chr(10)) AS lines,
    list_distinct(regexp_extract_all(lower(text), '[a-z]+')) AS toks
  FROM documents),
s AS (
  SELECT doc_id,
    len(w) AS n_words,
    CAST(coalesce(list_sum(list_transform(w, x -> len(x))), 0) AS BIGINT) AS total_chars,
    len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS n_alpha_words,
    (len(text) - len(replace(text, '#', '')))
      + (len(text) - len(replace(text, '...', ''))) // 3 AS n_symbols,
    len(lines) AS n_lines,
    len(list_filter(lines, l -> left(ltrim(l, ' ' || chr(9)), 1) IN ('-', '*', '•'))) AS n_bullet_lines,
    len(list_filter(lines, l -> rtrim(l, ' ' || chr(9)) LIKE '%...')) AS n_ellipsis_lines,
    len(list_intersect(toks, ['the','be','to','of','and','that','have','with'])) AS n_stop_hits
  FROM t)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(n_words AS BIGINT) AS n_words,
  CASE WHEN n_words > 0 THEN round(CAST(total_chars AS DOUBLE) / n_words, 6) ELSE 0.0 END AS mean_word_len,
  CAST(n_symbols AS BIGINT) AS n_symbols,
  CAST(n_lines AS BIGINT) AS n_lines,
  CAST(n_bullet_lines AS BIGINT) AS n_bullet_lines,
  CAST(n_ellipsis_lines AS BIGINT) AS n_ellipsis_lines,
  CAST(n_alpha_words AS BIGINT) AS n_alpha_words,
  CAST(n_stop_hits AS BIGINT) AS n_stop_hits,
  (n_words BETWEEN 50 AND 100000
   AND 3*n_words <= total_chars AND total_chars <= 10*n_words
   AND 10*n_symbols <= n_words
   AND 10*n_bullet_lines <= 9*n_lines
   AND 10*n_ellipsis_lines <= 3*n_lines
   AND 5*n_alpha_words >= 4*n_words
   AND n_stop_hits >= 1) AS keep
FROM s
""",
    # the three curation stages as CTEs: quality gate (exact integer
    # predicates), keep-first exact dedup, hash split
    "pipeline_curation": rf"""
WITH t AS (SELECT doc_id, text, regexp_extract_all(lower(text), '\w+') AS toks FROM documents),
q AS (SELECT doc_id, text FROM t
      WHERE len(toks) >= 20 AND 2 * len(list_distinct(toks)) >= len(toks)),
k AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY text),
h AS (SELECT doc_id,
        ((CAST(doc_id % 4294967296 AS HUGEINT) * {SPLIT_MULT}) % 4294967296) % 100 AS b
      FROM k)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
FROM h
""",
    # integer-exact corpus bigram scoring: adjacency pairs with
    # multiplicity, global counts joined back per doc
    "doc_bigram_fluency": """
WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
pairs AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
                                i -> t[i] || ' ' || t[i+1])) AS pair
          FROM toks WHERE len(t) >= 2),
bg AS (SELECT pair, count(*) AS total FROM pairs GROUP BY pair)
SELECT CAST(p.doc_id AS BIGINT) AS doc_id,
       CAST(sum(bg.total) AS BIGINT) AS fluency_sum,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs p JOIN bg USING (pair)
GROUP BY p.doc_id
""",
    # rank on the ROUNDED score (same 6-dp rounding as the Ray side) with
    # term tie-break, so both engines rank identically
    "doc_tfidf": """
WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
              FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY term),
n AS (SELECT count(*) AS nd FROM documents),
s AS (SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(CAST(n.nd AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df USING (term), n),
r AS (SELECT s.*, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank FROM s)
SELECT CAST(doc_id AS BIGINT) AS doc_id, term, tfidf, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 3
""",
    # PERCENTILE_DISC semantics spelled out (value at rank ceil(q*n)) so
    # neither engine's interpolation convention is in play
    "doc_length_quantiles": f"""
WITH t AS (SELECT CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS L
           FROM documents WHERE trim(text) <> ''),
o AS (SELECT L, row_number() OVER (ORDER BY L) AS rn, count(*) OVER () AS n FROM t),
qs AS (SELECT unnest([{", ".join(str(q) for q in QUANTILES)}]) AS q)
SELECT qs.q AS q, CAST(min(o.L) AS BIGINT) AS token_len
FROM qs, o
WHERE o.rn >= CAST(ceil(qs.q * o.n) AS BIGINT)
GROUP BY qs.q
""",
    "doc_top_terms": """
WITH t AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
           FROM documents)
SELECT term, CAST(count(*) AS BIGINT) AS n
FROM t GROUP BY term
ORDER BY n DESC, term
LIMIT 50
""",
    "doc_postings": """
WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
             FROM documents),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id)
SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS tf_total,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM tf GROUP BY term
""",
    "index_lookup": """
WITH tok AS (SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
             FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id FROM tok
WHERE """ + " AND ".join(
        f"list_contains(w, '{t}')" for t in INDEX_LOOKUP_TERMS
    ) + "\n",
    "dedup_embed": f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT CAST(a.vec_id AS BIGINT) AS left_id, CAST(b.vec_id AS BIGINT) AS right_id,
  round(list_cosine_similarity(a.v, b.v), 6) AS sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= {EMBED_DUP_THRESHOLD}
""",
    # union with first-component-doubled mutants (exact float32 arithmetic
    # — the mutant is reconstructible bit-for-bit in SQL), all-pairs cosine
    # >= 0.9.  The LSH pipeline equals this because its seeded 12-table
    # recall on the positives is ~1-1e-9 and the run is deterministic; the
    # recall pytest asserts the same equality against the brute-force
    # kernel.
    "dedup_embed_lsh": """
WITH e AS (
  SELECT CAST(vec_id AS BIGINT) AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  UNION ALL
  SELECT CAST(vec_id + 1000000 AS BIGINT),
         list_concat([embedding[1] * 2.0], CAST(embedding[2:len(embedding)] AS DOUBLE[]))
  FROM embeddings WHERE vec_id % 10 = 0
)
SELECT a.id AS left_id, b.id AS right_id,
  round(list_cosine_similarity(a.v, b.v), 6) AS sim
FROM e a JOIN e b ON a.id < b.id
WHERE list_cosine_similarity(a.v, b.v) >= 0.9
""",
    "dedup_exact": "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text",
    # Rabin-Karp rolling fingerprint over whitespace tokens; per-token hash
    # is the codepoint polynomial shared with the embedder — modulus 2^31-1
    # keeps every intermediate product < 2^53 (exact in BIGINT and double)
    "doc_fingerprint": r"""
WITH t AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS w FROM documents),
h AS (SELECT doc_id, text,
        list_transform(w, tok ->
          list_reduce(list_prepend(7, list_transform(string_split(tok, ''), c -> unicode(c))),
                      (a, b) -> (a * 31 + b) % 1000003)) AS th
      FROM t)
SELECT doc_id,
  substr(sha256(text), 1, 16) AS content_sha,
  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), th),
       (a, b) -> (a * CAST(1000003 AS BIGINT) + b) % 2147483647) AS BIGINT) AS rolling_fp
FROM h
""",
    # true shingle-Jaccard all-pairs: the LSH pipeline's output must equal it
    # exactly at this threshold (band recall ~1-4e-9 per true pair; the
    # recall pytest asserts set equality independently)
    # SPARSE formulation: explode distinct shingles, self-join on the
    # shingle (only pairs sharing >=1 shingle survive), |union| =
    # n_a + n_b - |intersection|.  Identical output to the all-pairs
    # list_intersect form but ~80x faster in DuckDB (0.14s vs 11.4s at
    # 500 docs) and tractable at sf0.1.
    "dedup_minhash": rf"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
s AS (SELECT doc_id,
        CASE WHEN len(w) < {MINHASH_SHINGLE_K} THEN [array_to_string(w, ' ')]
             ELSE list_distinct(list_transform(generate_series(1, len(w)-{MINHASH_SHINGLE_K - 1}),
                                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) END AS sh
      FROM t),
sz AS (SELECT doc_id, len(sh) AS n FROM s),
f AS (SELECT doc_id, x.sh AS g FROM s, unnest(s.sh) AS x(sh)),
inter AS (SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS i
          FROM f a JOIN f b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
SELECT CAST(l AS BIGINT) AS left_id, CAST(r AS BIGINT) AS right_id,
  round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
FROM inter JOIN sz sa ON sa.doc_id = l JOIN sz sb ON sb.doc_id = r
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {JACCARD_THRESHOLD}
""",
    # greedy char-budget packer with word overlap (R1): the sequential pack
    # loop is a recursive CTE over the per-doc cumulative word-length array —
    # state (s, jnext) = buffer start + scan position, one emitted chunk per
    # recursion step (ocr_ray/functions/chunking.py:split_text_into_chunks)
    # identical 62-bit polynomial shingle hashes as the Ray side
    # (PolySimHasher.features) — collision behavior matches by construction
    "split_contamination": rf"""
WITH d0 AS (SELECT CAST(doc_id AS BIGINT) AS id,
                   string_split_regex(trim(text), '\s+') AS w,
                   ((CAST(doc_id % 4294967296 AS HUGEINT) * {SPLIT_MULT}) % 4294967296) % 100 AS bucket
            FROM documents WHERE trim(text) <> ''),
th AS (SELECT id, bucket, len(w) AS n,
   list_transform(w, t -> list_reduce(list_prepend(CAST(7 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 31 + b) % 1000003)) AS t1,
   list_transform(w, t -> list_reduce(list_prepend(CAST(11 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 37 + b) % 1000033)) AS t2
 FROM d0),
feats AS (SELECT id, bucket,
   CASE WHEN n < 3 THEN
     [ list_reduce(list_prepend(CAST(0 AS BIGINT), t1), (a, b) -> (a * 1000003 + b) % 2147483647)
       + list_reduce(list_prepend(CAST(0 AS BIGINT), t2), (a, b) -> (a * 1000033 + b) % 2147483647) * 2147483648 ]
   ELSE
     list_distinct(list_transform(generate_series(1, n - 2), i ->
       ((t1[i] * 1000003 + t1[i+1]) % 2147483647 * 1000003 + t1[i+2]) % 2147483647
       + ((t2[i] * 1000033 + t2[i+1]) % 2147483647 * 1000033 + t2[i+2]) % 2147483647 * 2147483648))
   END AS h
 FROM th),
f AS (SELECT id, bucket, x.h FROM feats, unnest(feats.h) AS x(h)),
tr AS (SELECT DISTINCT h FROM f WHERE bucket < 80)
SELECT DISTINCT f.id AS doc_id,
       CASE WHEN f.bucket < 90 THEN 'val' ELSE 'test' END AS split
FROM f
WHERE f.bucket >= 80 AND f.h IN (SELECT h FROM tr)
""",
    # same pair semantics as dedup_minhash, then components via transitive
    # closure (recursive CTE; UNION dedup terminates cycles) and
    # cluster_id = min reachable id
    # same sparse shingle self-join as dedup_minhash for the pair CTE;
    # MATERIALIZED hints keep the recursive closure from re-evaluating it
    # every iteration
    "dedup_clusters": _CLUSTER_CTES + """
SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
FROM reach GROUP BY id
""",
    # survivors = every doc minus cluster members whose min reachable id
    # differs from their own (non-representatives)
    "dedup_keep": _CLUSTER_CTES + """
SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents
WHERE doc_id NOT IN (SELECT id FROM reach GROUP BY id HAVING min(r) <> id)
""",
    "doc_source_stats": """
WITH h AS (SELECT source, lang, n_chars,
                  count(*) OVER (PARTITION BY text) AS c
           FROM documents)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs
FROM h GROUP BY source
""",
    # identical 62-bit polynomial shingle hashes as split_contamination
    # (PolySimHasher.features); novelty = fraction of the doc's distinct
    # shingles whose corpus-wide min doc id is this doc
    # deterministic shuffle: permutation = ORDER BY bijective odd-multiply
    # mixed hash (HUGEINT % 2^62 == numpy uint64-wrap & mask, the KMV
    # precedent), rank made exact by the bucket-offset pass
    "doc_shuffle": r"""
WITH m AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST((CAST(doc_id AS HUGEINT) * 2685821657736338717)
       % 4611686018427387904 AS BIGINT) AS shuffle_hash
  FROM documents)
SELECT doc_id, shuffle_hash,
  CAST(row_number() OVER (ORDER BY shuffle_hash, doc_id) - 1 AS BIGINT) AS pos
FROM m
""",
    # incremental containment: same polynomial shingle features as
    # doc_novelty; shard = src19 LEFT JOINed against the DISTINCT corpus
    # shingle set, containment round-floored exactly like the Python side
    "dedup_incremental": r"""
WITH d0 AS (SELECT CAST(doc_id AS BIGINT) AS id, source,
                   string_split_regex(trim(text), '\s+') AS w
            FROM documents WHERE trim(text) <> ''),
th AS (SELECT id, source, len(w) AS n,
   list_transform(w, t -> list_reduce(list_prepend(CAST(7 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 31 + b) % 1000003)) AS t1,
   list_transform(w, t -> list_reduce(list_prepend(CAST(11 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 37 + b) % 1000033)) AS t2
 FROM d0),
feats AS (SELECT id, source,
   CASE WHEN n < 3 THEN
     [ list_reduce(list_prepend(CAST(0 AS BIGINT), t1), (a, b) -> (a * 1000003 + b) % 2147483647)
       + list_reduce(list_prepend(CAST(0 AS BIGINT), t2), (a, b) -> (a * 1000033 + b) % 2147483647) * 2147483648 ]
   ELSE
     list_distinct(list_transform(generate_series(1, n - 2), i ->
       ((t1[i] * 1000003 + t1[i+1]) % 2147483647 * 1000003 + t1[i+2]) % 2147483647
       + ((t2[i] * 1000033 + t2[i+1]) % 2147483647 * 1000033 + t2[i+2]) % 2147483647 * 2147483648))
   END AS h
 FROM th),
f AS (SELECT id, source, x.h FROM feats, unnest(feats.h) AS x(h)),
c AS (SELECT DISTINCT h FROM f WHERE source <> 'src19'),
s AS (SELECT id, f.h, CASE WHEN c.h IS NOT NULL THEN 1 ELSE 0 END AS seen
      FROM f LEFT JOIN c ON f.h = c.h WHERE source = 'src19'),
agg AS (SELECT id AS doc_id,
  CAST(count(*) AS BIGINT) AS n_shingles,
  CAST(sum(seen) AS BIGINT) AS n_seen,
  floor(CAST(sum(seen) AS DOUBLE) / count(*) * 1000000 + 0.5) / 1000000
    AS containment
 FROM s GROUP BY id)
SELECT doc_id, n_shingles, n_seen, containment,
  CAST(CASE WHEN containment >= 0.8 THEN 1 ELSE 0 END AS BIGINT) AS is_dup
FROM agg
""",
    # the full HLL sketch recomputed in SQL: same 62-bit term keys, same
    # multiplicative mix, register maxima via GROUP BY, exact-integer S
    # (HUGEINT), identical double formula + floor-rounding for the estimate
    "corpus_hll": rf"""
WITH d0 AS (SELECT CASE WHEN trim(text) = '' THEN []
                        ELSE string_split_regex(trim(text), '\s+') END AS w
            FROM documents),
tok AS (SELECT DISTINCT unnest(w) AS t FROM d0),
th AS (SELECT
   list_reduce(list_prepend(CAST(7 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 31 + b) % 1000003) AS f1,
   list_reduce(list_prepend(CAST(11 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 37 + b) % 1000033) AS f2
 FROM tok),
z0 AS (SELECT ((CAST(f1 + f2 * 2147483648 AS HUGEINT) + {_HLL_C0})
               % 18446744073709551616) AS z FROM th),
z1 AS (SELECT {_hll_mulmod64('xor(z, z >> 30)', _HLL_C1)} AS z FROM z0),
z2 AS (SELECT {_hll_mulmod64('xor(z, z >> 27)', _HLL_C2)} AS z FROM z1),
mix AS (SELECT xor(z, z >> 31) AS x FROM z2),
reg AS (SELECT CAST(x // 72057594037927936 AS BIGINT) AS bucket,
               CAST(x % 72057594037927936 AS BIGINT) AS wv FROM mix),
rho AS (SELECT bucket,
               max(CASE WHEN wv = 0 THEN 57 ELSE 57 - len(bin(wv)) END) AS mj
        FROM reg GROUP BY bucket),
st AS (SELECT count(*) AS n_present,
              coalesce(sum(CAST((1::BIGINT << (63 - mj)) AS HUGEINT)), 0) AS s_present,
              CAST(coalesce(sum(mj), 0) AS BIGINT) AS sum_rho
       FROM rho),
fin AS (SELECT 256 - n_present AS n_zero_registers, sum_rho,
   s_present + CAST(256 - n_present AS HUGEINT) * (CAST(1::BIGINT << 62 AS HUGEINT) * 2) AS s
 FROM st),
fin2 AS (SELECT n_zero_registers, sum_rho,
   floor(CAST({_HLL_ALPHA!r} AS DOUBLE) * 65536.0 * 9223372036854775808.0
         / CAST(s AS DOUBLE) * 1e6 + 0.5) / 1e6 AS est_raw
 FROM fin)
SELECT CAST(256 AS BIGINT) AS m,
  CAST(n_zero_registers AS BIGINT) AS n_zero_registers,
  sum_rho, est_raw,
  CASE WHEN est_raw <= 640.0 AND n_zero_registers > 0
       THEN floor(256.0 * ln(256.0 / n_zero_registers) * 1e6 + 0.5) / 1e6
       ELSE est_raw END AS est_distinct
FROM fin2
""",
    # the corpus_hll chain with `source` carried through every CTE: the
    # grouped sketch is value-checked register-for-register per source
    "doc_source_distinct_hll": rf"""
WITH d0 AS (SELECT source,
                   CASE WHEN trim(text) = '' THEN []
                        ELSE string_split_regex(trim(text), '\s+') END AS w
            FROM documents),
tok AS (SELECT DISTINCT source, unnest(w) AS t FROM d0),
th AS (SELECT source,
   list_reduce(list_prepend(CAST(7 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 31 + b) % 1000003) AS f1,
   list_reduce(list_prepend(CAST(11 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 37 + b) % 1000033) AS f2
 FROM tok),
z0 AS (SELECT source, ((CAST(f1 + f2 * 2147483648 AS HUGEINT) + {_HLL_C0})
               % 18446744073709551616) AS z FROM th),
z1 AS (SELECT source, {_hll_mulmod64('xor(z, z >> 30)', _HLL_C1)} AS z FROM z0),
z2 AS (SELECT source, {_hll_mulmod64('xor(z, z >> 27)', _HLL_C2)} AS z FROM z1),
mix AS (SELECT source, xor(z, z >> 31) AS x FROM z2),
reg AS (SELECT source, CAST(x // 72057594037927936 AS BIGINT) AS bucket,
               CAST(x % 72057594037927936 AS BIGINT) AS wv FROM mix),
rho AS (SELECT source, bucket,
               max(CASE WHEN wv = 0 THEN 57 ELSE 57 - len(bin(wv)) END) AS mj
        FROM reg GROUP BY source, bucket),
st AS (SELECT source, count(*) AS n_present,
              coalesce(sum(CAST((1::BIGINT << (63 - mj)) AS HUGEINT)), 0) AS s_present,
              CAST(coalesce(sum(mj), 0) AS BIGINT) AS sum_rho
       FROM rho GROUP BY source),
fin AS (SELECT source, 256 - n_present AS n_zero_registers, sum_rho,
   s_present + CAST(256 - n_present AS HUGEINT) * (CAST(1::BIGINT << 62 AS HUGEINT) * 2) AS s
 FROM st),
fin2 AS (SELECT source, n_zero_registers, sum_rho,
   floor(CAST({_HLL_ALPHA!r} AS DOUBLE) * 65536.0 * 9223372036854775808.0
         / CAST(s AS DOUBLE) * 1e6 + 0.5) / 1e6 AS est_raw
 FROM fin)
SELECT source, CAST(256 AS BIGINT) AS m,
  CAST(n_zero_registers AS BIGINT) AS n_zero_registers,
  sum_rho, est_raw,
  CASE WHEN est_raw <= 640.0 AND n_zero_registers > 0
       THEN floor(256.0 * ln(256.0 / n_zero_registers) * 1e6 + 0.5) / 1e6
       ELSE est_raw END AS est_distinct
FROM fin2 ORDER BY source
""",
    # whole-doc 62-bit keys (same rolling polynomials), k multiplicative
    # probes, corpus position set, membership test — the oracle replicates
    # the FILTER semantics exactly, false positives included
    "dedup_bloom": rf"""
WITH d0 AS (SELECT CAST(doc_id AS BIGINT) AS id, source,
                   CASE WHEN trim(text) = '' THEN []
                        ELSE string_split_regex(trim(text), '\s+') END AS w
            FROM documents),
th AS (SELECT id, source,
   list_transform(w, t -> list_reduce(list_prepend(CAST(7 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 31 + b) % 1000003)) AS t1,
   list_transform(w, t -> list_reduce(list_prepend(CAST(11 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 37 + b) % 1000033)) AS t2
 FROM d0),
keys AS (SELECT id, source,
   list_reduce(list_prepend(CAST(0 AS BIGINT), t1), (a, b) -> (a * 1000003 + b) % 2147483647)
   + list_reduce(list_prepend(CAST(0 AS BIGINT), t2), (a, b) -> (a * 1000033 + b) % 2147483647) * 2147483648 AS h
 FROM th),
cpos AS ({_BLOOM_CPOS})
SELECT id AS doc_id, CAST(h AS BIGINT) AS key62,
  ({_BLOOM_TEST}) AS in_corpus
FROM keys WHERE source = 'src19'
""",
    # the three refresh stages as chained CTEs: Bloom membership (same
    # keys/probes as dedup_bloom), Gopher gate (same scaled-integer
    # conditions as doc_gopher, min_stop_hits=1), deterministic id-hash split
    "pipeline_refresh": rf"""
WITH d0 AS (SELECT CAST(doc_id AS BIGINT) AS id, source, text,
                   CASE WHEN trim(text) = '' THEN []
                        ELSE string_split_regex(trim(text), '\s+') END AS w
            FROM documents),
th AS (SELECT id, source, text, w,
   list_transform(w, t -> list_reduce(list_prepend(CAST(7 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 31 + b) % 1000003)) AS t1,
   list_transform(w, t -> list_reduce(list_prepend(CAST(11 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 37 + b) % 1000033)) AS t2
 FROM d0),
keys AS (SELECT id, source, text, w,
   list_reduce(list_prepend(CAST(0 AS BIGINT), t1), (a, b) -> (a * 1000003 + b) % 2147483647)
   + list_reduce(list_prepend(CAST(0 AS BIGINT), t2), (a, b) -> (a * 1000033 + b) % 2147483647) * 2147483648 AS h
 FROM th),
cpos AS ({_BLOOM_CPOS}),
fresh AS (SELECT id, text, w FROM keys
          WHERE source = 'src19' AND NOT ({_BLOOM_TEST})),
g0 AS (SELECT id, text, w,
   string_split(text, chr(10)) AS lines,
   list_distinct(regexp_extract_all(lower(text), '[a-z]+')) AS toks
 FROM fresh),
gs AS (SELECT id,
   len(w) AS n_words,
   CAST(coalesce(list_sum(list_transform(w, x -> len(x))), 0) AS BIGINT) AS total_chars,
   len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS n_alpha_words,
   (len(text) - len(replace(text, '#', '')))
     + (len(text) - len(replace(text, '...', ''))) // 3 AS n_symbols,
   len(lines) AS n_lines,
   len(list_filter(lines, l -> left(ltrim(l, ' ' || chr(9)), 1) IN ('-', '*', '•'))) AS n_bullet_lines,
   len(list_filter(lines, l -> rtrim(l, ' ' || chr(9)) LIKE '%...')) AS n_ellipsis_lines,
   len(list_intersect(toks, ['the','be','to','of','and','that','have','with'])) AS n_stop_hits
 FROM g0),
kept AS (SELECT id FROM gs
  WHERE n_words BETWEEN 50 AND 100000
    AND 3*n_words <= total_chars AND total_chars <= 10*n_words
    AND 10*n_symbols <= n_words
    AND 10*n_bullet_lines <= 9*n_lines
    AND 10*n_ellipsis_lines <= 3*n_lines
    AND 5*n_alpha_words >= 4*n_words
    AND n_stop_hits >= 1)
SELECT CAST(id AS BIGINT) AS doc_id,
  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
FROM (SELECT id, ((CAST(id % 4294967296 AS HUGEINT) * {SPLIT_MULT}) % 4294967296) % 100 AS b
      FROM kept)
""",
    # exact-integer k-means: x = floor(v*2^20+0.5)+2^22 (shift keeps
    # values positive so DuckDB's truncating // equals numpy floor-div);
    # ties ORDER BY (dist, cid) == np.argmin first hit; empty clusters
    # keep their centroid; 2 update iterations then final assignment
    "embed_kmeans": r"""
WITH e AS (SELECT CAST(vec_id AS BIGINT) AS vid,
  list_transform(CAST(embedding AS DOUBLE[]),
    v -> CAST(floor(v * 1048576 + 0.5) AS BIGINT) + 4194304) AS x
  FROM embeddings),
dims AS (SELECT unnest(generate_series(1, 64)) AS i),
c0 AS (SELECT vid AS cid, x FROM e WHERE vid < 8),
d1 AS (SELECT e.vid, c0.cid,
  list_reduce(list_transform(generate_series(1, 64),
    i -> (e.x[i] - c0.x[i]) * (e.x[i] - c0.x[i])), (a, b) -> a + b) AS dist
  FROM e, c0),
a1 AS (SELECT vid, cid FROM (SELECT vid, cid,
    row_number() OVER (PARTITION BY vid ORDER BY dist, cid) AS rn FROM d1)
  WHERE rn = 1),
u1 AS (SELECT a1.cid, dims.i, sum(e.x[dims.i]) AS s, count(*) AS n
       FROM e JOIN a1 USING (vid) CROSS JOIN dims
       GROUP BY a1.cid, dims.i),
c1n AS (SELECT cid, list(CAST(s // n AS BIGINT) ORDER BY i) AS x FROM u1 GROUP BY cid),
c1 AS (SELECT c0.cid, COALESCE(c1n.x, c0.x) AS x
       FROM c0 LEFT JOIN c1n USING (cid)),
d2 AS (SELECT e.vid, c1.cid,
  list_reduce(list_transform(generate_series(1, 64),
    i -> (e.x[i] - c1.x[i]) * (e.x[i] - c1.x[i])), (a, b) -> a + b) AS dist
  FROM e, c1),
a2 AS (SELECT vid, cid FROM (SELECT vid, cid,
    row_number() OVER (PARTITION BY vid ORDER BY dist, cid) AS rn FROM d2)
  WHERE rn = 1),
u2 AS (SELECT a2.cid, dims.i, sum(e.x[dims.i]) AS s, count(*) AS n
       FROM e JOIN a2 USING (vid) CROSS JOIN dims
       GROUP BY a2.cid, dims.i),
c2n AS (SELECT cid, list(CAST(s // n AS BIGINT) ORDER BY i) AS x FROM u2 GROUP BY cid),
c2 AS (SELECT c1.cid, COALESCE(c2n.x, c1.x) AS x
       FROM c1 LEFT JOIN c2n USING (cid)),
d3 AS (SELECT e.vid, c2.cid,
  list_reduce(list_transform(generate_series(1, 64),
    i -> (e.x[i] - c2.x[i]) * (e.x[i] - c2.x[i])), (a, b) -> a + b) AS dist
  FROM e, c2)
SELECT vid AS vec_id, cid AS cluster, dist
FROM (SELECT vid, cid, dist,
      row_number() OVER (PARTITION BY vid ORDER BY dist, cid) AS rn FROM d3)
WHERE rn = 1
""",
    # value rank: row_number by (n_chars, doc_id); pctile = exact
    # integer rank*1e6 // (N-1) then /1e6 (identical IEEE op)
    "doc_rank_len": r"""
WITH m AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  CAST(n_chars AS BIGINT) AS n_chars FROM documents),
t AS (SELECT greatest(count(*) - 1, 1) AS denom FROM m)
SELECT doc_id, n_chars,
  CAST(row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS BIGINT) AS "rank",
  CAST((row_number() OVER (ORDER BY n_chars, doc_id) - 1) * 1000000 // t.denom
       AS DOUBLE) / 1000000 AS pctile
FROM m, t
""",
    # mixture resample: integer-exact rates (C6 = min_g n_g*1e6 // w_g,
    # rate = min(1e6, C6*w // n)), Knuth hash keep — identical // and %
    # semantics on positive BIGINTs in DuckDB and numpy
    "doc_mix": r"""
WITH w(lang, wt) AS (VALUES ('en', 40), ('de', 15), ('fr', 15),
                            ('es', 15), ('zh', 15)),
n AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
c AS (SELECT min(n.n * 1000000 // w.wt) AS c6
      FROM n JOIN w USING (lang) WHERE w.wt > 0 AND n.n > 0),
r AS (SELECT n.lang,
             least(1000000, CAST(c.c6 * w.wt // n.n AS BIGINT)) AS rate_ppm
      FROM n JOIN w USING (lang) CROSS JOIN c
      WHERE w.wt > 0 AND n.n > 0)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang, r.rate_ppm
FROM documents d JOIN r USING (lang)
WHERE ((CAST(d.doc_id % 4294967296 AS HUGEINT) * 2654435761) % 4294967296) % 1000000
      < r.rate_ppm
""",
    # training-serialization composite: mixture CTEs (doc_mix) -> bigram-LM
    # CTEs trained on the mixed survivors (doc_lm) -> prefix-sum packing
    # window (doc_pack) over the LM's keepers
    "pipeline_training": r"""
WITH wts(lang, wt) AS (VALUES ('en', 40), ('de', 15), ('fr', 15),
                              ('es', 15), ('zh', 15)),
nn AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
c AS (SELECT min(nn.n * 1000000 // wts.wt) AS c6
      FROM nn JOIN wts USING (lang) WHERE wts.wt > 0 AND nn.n > 0),
r AS (SELECT nn.lang,
             least(1000000, CAST(c.c6 * wts.wt // nn.n AS BIGINT)) AS rate_ppm
      FROM nn JOIN wts USING (lang) CROSS JOIN c
      WHERE wts.wt > 0 AND nn.n > 0),
mixed AS (SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.text
  FROM documents d JOIN r USING (lang)
  WHERE ((CAST(d.doc_id % 4294967296 AS HUGEINT) * 2654435761) % 4294967296) % 1000000
        < r.rate_ppm),
d0 AS (SELECT doc_id AS id, string_split_regex(trim(text), '\s+') AS ws
       FROM mixed WHERE trim(text) <> ''),
th AS (SELECT id, len(ws) AS n,
   list_transform(ws, t -> list_reduce(list_prepend(CAST(7 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 31 + b) % 1000003)) AS t1
 FROM d0 WHERE len(ws) >= 2),
pos AS (SELECT id, t1[i] % 65536 AS ub,
        ((t1[i] * 1000003 + t1[i+1]) % 2147483647) % 1048576 AS bb
        FROM th, unnest(generate_series(1, n - 1)) AS g(i)),
uni AS (SELECT x.h % 65536 AS ub, count(*) AS cu
        FROM th, unnest(th.t1) AS x(h) GROUP BY 1),
big AS (SELECT bb, count(*) AS cb FROM pos GROUP BY bb),
q AS (SELECT pos.id, (big.cb * 1000000) // uni.cu AS q
      FROM pos JOIN big USING (bb) JOIN uni USING (ub)),
keepers AS (SELECT id AS doc_id FROM q GROUP BY id
            HAVING CAST(sum(q) // count(*) AS BIGINT) >= 34000),
m AS (SELECT mixed.doc_id,
  CAST((CAST(mixed.doc_id AS HUGEINT) * 2685821657736338717)
       % 4611686018427387904 AS BIGINT) AS shuffle_hash,
  CAST(CASE WHEN trim(mixed.text) = '' THEN 0
       ELSE len(string_split_regex(trim(mixed.text), '\s+')) END AS BIGINT)
       AS n_tokens
  FROM mixed JOIN keepers USING (doc_id)),
s AS (SELECT doc_id, shuffle_hash, n_tokens,
  CAST(COALESCE(sum(n_tokens) OVER (ORDER BY shuffle_hash, doc_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       AS start_offset
  FROM m)
SELECT doc_id, n_tokens, shuffle_hash, start_offset,
  CAST(start_offset // 1024 AS BIGINT) AS bin
FROM s
""",
    # DSIR ratio score: target/raw hashed-unigram counts, integer ppm
    # ratio with add-one raw smoothing — all-int64, order-insensitive
    "doc_dsir": r"""
WITH d0 AS (SELECT CAST(doc_id AS BIGINT) AS id, lang,
                   string_split_regex(trim(text), '\s+') AS ws
            FROM documents WHERE trim(text) <> ''),
th AS (SELECT id, lang,
   list_transform(ws, t -> list_reduce(list_prepend(CAST(7 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 31 + b) % 1000003)) AS t1
 FROM d0),
pos AS (SELECT id, lang, x.h % 65536 AS ub FROM th, unnest(th.t1) AS x(h)),
tgt AS (SELECT ub, count(*) AS ct FROM pos WHERE lang = 'en' GROUP BY ub),
rawc AS (SELECT ub, count(*) AS cr FROM pos GROUP BY ub),
q AS (SELECT pos.id,
             (COALESCE(tgt.ct, 0) * 1000000) // (rawc.cr + 1) AS q
      FROM pos JOIN rawc USING (ub) LEFT JOIN tgt USING (ub))
SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
  CAST(sum(q) // count(*) AS BIGINT) AS dsir_ppm,
  CAST(CASE WHEN sum(q) // count(*) >= 370000 THEN 1 ELSE 0 END AS BIGINT)
    AS keep
FROM q GROUP BY id
""",
    # DSIR selection: the ratio-score CTEs -> exact (value, id) rank ->
    # top-quartile cut, identical integer pctile arithmetic
    "dsir_select": r"""
WITH d0 AS (SELECT CAST(doc_id AS BIGINT) AS id, lang,
                   string_split_regex(trim(text), '\s+') AS ws
            FROM documents WHERE trim(text) <> ''),
th AS (SELECT id, lang,
   list_transform(ws, t -> list_reduce(list_prepend(CAST(7 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 31 + b) % 1000003)) AS t1
 FROM d0),
pos AS (SELECT id, lang, x.h % 65536 AS ub FROM th, unnest(th.t1) AS x(h)),
tgt AS (SELECT ub, count(*) AS ct FROM pos WHERE lang = 'en' GROUP BY ub),
rawc AS (SELECT ub, count(*) AS cr FROM pos GROUP BY ub),
q AS (SELECT pos.id,
             (COALESCE(tgt.ct, 0) * 1000000) // (rawc.cr + 1) AS q
      FROM pos JOIN rawc USING (ub) LEFT JOIN tgt USING (ub)),
scores AS (SELECT id AS doc_id, CAST(sum(q) // count(*) AS BIGINT)
           AS dsir_ppm FROM q GROUP BY id),
t AS (SELECT greatest(count(*) - 1, 1) AS denom FROM scores),
r AS (SELECT doc_id, dsir_ppm,
      row_number() OVER (ORDER BY dsir_ppm, doc_id) - 1 AS rnk FROM scores)
SELECT doc_id, dsir_ppm, CAST(rnk AS BIGINT) AS "rank",
       CAST(rnk * 1000000 // t.denom AS DOUBLE) / 1000000 AS pctile
FROM r, t
WHERE CAST(rnk * 1000000 // t.denom AS DOUBLE) / 1000000 >= 0.75
""",
    # PageRank: edge aggregation by joins, then two unrolled exact-integer
    # iterations — ppm ranks, damping (tele + 85*s)//100, order-free sums
    "graph_pagerank": r"""
WITH e0 AS (SELECT CAST(c.c_nationkey AS BIGINT) AS src,
                   CAST(s.s_nationkey AS BIGINT) AS dst, count(*) AS w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2),
nodes AS (SELECT src AS v FROM e0 UNION SELECT dst FROM e0),
nn AS (SELECT count(*) AS n FROM nodes),
outw AS (SELECT src, sum(w) AS ow FROM e0 GROUP BY src),
pr0 AS (SELECT v, CAST(1000000 // nn.n AS BIGINT) AS pr FROM nodes, nn),
c1 AS (SELECT e0.dst AS v, sum(pr0.pr * e0.w // outw.ow) AS s
       FROM e0 JOIN pr0 ON pr0.v = e0.src JOIN outw USING (src) GROUP BY 1),
pr1 AS (SELECT nodes.v,
        CAST((15000000 // nn.n + 85 * COALESCE(c1.s, 0)) // 100 AS BIGINT)
          AS pr
        FROM nodes LEFT JOIN c1 ON c1.v = nodes.v CROSS JOIN nn),
c2 AS (SELECT e0.dst AS v, sum(pr1.pr * e0.w // outw.ow) AS s
       FROM e0 JOIN pr1 ON pr1.v = e0.src JOIN outw USING (src) GROUP BY 1),
pr2 AS (SELECT nodes.v,
        CAST((15000000 // nn.n + 85 * COALESCE(c2.s, 0)) // 100 AS BIGINT)
          AS pr
        FROM nodes LEFT JOIN c2 ON c2.v = nodes.v CROSS JOIN nn)
SELECT pr2.v AS node, CAST(COALESCE(outw.ow, 0) AS BIGINT) AS out_w,
       pr2.pr AS pr_ppm
FROM pr2 LEFT JOIN outw ON outw.src = pr2.v
""",
    # CountMin: cells are sums of exact per-term counts (occurrence
    # increments commute), estimate = min over the d row counters —
    # replicates the sketch bit-for-bit in integer SQL
    "corpus_countmin": r"""
WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
             AS term FROM documents),
cnt AS (SELECT term, count(*) AS n FROM tok GROUP BY term),
top AS (SELECT term, n FROM cnt ORDER BY n DESC, term LIMIT 20),
th AS (SELECT term, n,
   list_reduce(list_prepend(CAST(7 AS BIGINT),
       list_transform(string_split(term, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 31 + b) % 1000003) AS h1
 FROM cnt),
rows_(r, a, b) AS (VALUES (0, 999983, 17), (1, 911383, 89),
                          (2, 824393, 251), (3, 711427, 499)),
cells AS (SELECT rows_.r,
                 ((th.h1 * rows_.a + rows_.b) % 2147483647) % 16384 AS cell,
                 sum(th.n) AS c
          FROM th CROSS JOIN rows_ GROUP BY 1, 2),
est AS (SELECT top.term, top.n, min(cl.c) AS n_est
        FROM top JOIN th USING (term) CROSS JOIN rows_
        JOIN cells cl ON cl.r = rows_.r
         AND cl.cell = ((th.h1 * rows_.a + rows_.b) % 2147483647) % 16384
        GROUP BY top.term, top.n)
SELECT term, CAST(n AS BIGINT) AS n, CAST(n_est AS BIGINT) AS n_est FROM est
""",
    # int8 quantization: identical IEEE double ops (promote float32 ->
    # double, v*127.0/mx+0.5, floor) in DuckDB and numpy
    "embed_quantize": r"""
WITH e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
                  CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
m AS (SELECT vec_id, x,
             list_max(list_transform(x, v -> abs(v))) AS mx FROM e),
dims AS (SELECT unnest(generate_series(1, 64)) AS i)
SELECT m.vec_id, CAST(dims.i - 1 AS BIGINT) AS i,
  CASE WHEN m.mx = 0 THEN 0
       ELSE CAST(floor(x[dims.i] * 127.0 / m.mx + 0.5) AS BIGINT) END AS q
FROM m, dims
""",
    # quantize (same CTE as embed_quantize) then ±1-project: signs from the
    # polynomial hash of 'rp:<j>:<b>', reduced component = exact BIGINT sum
    "embed_rp": r"""
WITH e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
                  CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
m AS (SELECT vec_id, x,
             list_max(list_transform(x, v -> abs(v))) AS mx FROM e),
dims AS (SELECT unnest(generate_series(1, 64)) AS j),
qe AS (SELECT m.vec_id, dims.j,
  CASE WHEN m.mx = 0 THEN 0
       ELSE CAST(floor(x[dims.j] * 127.0 / m.mx + 0.5) AS BIGINT) END AS q
 FROM m, dims),
s AS (SELECT j.j, b.b,
        CASE WHEN list_reduce(list_prepend(CAST(7 AS BIGINT),
               list_transform(string_split('rp:' || CAST(j.j - 1 AS VARCHAR) || ':' || CAST(b.b AS VARCHAR), ''),
                              c -> CAST(unicode(c) AS BIGINT))),
               (a, x) -> (a * 31 + x) % 1000003) % 2 = 0
             THEN 1 ELSE -1 END AS sv
      FROM (SELECT unnest(generate_series(1, 64)) AS j) AS j,
           (SELECT unnest(generate_series(0, 15)) AS b) AS b)
SELECT qe.vec_id, s.b, CAST(sum(qe.q * s.sv) AS BIGINT) AS y
FROM qe JOIN s ON qe.j = s.j
GROUP BY qe.vec_id, s.b
""",
    # quantized KNN: integer dot of int8 codes (exact BIGINT), top-10
    "embed_qknn": r"""
WITH e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
                  CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
m AS (SELECT vec_id, x,
             list_max(list_transform(x, v -> abs(v))) AS mx FROM e),
dims AS (SELECT unnest(generate_series(1, 64)) AS i),
qe AS (SELECT m.vec_id, dims.i,
  CASE WHEN m.mx = 0 THEN 0
       ELSE CAST(floor(x[dims.i] * 127.0 / m.mx + 0.5) AS BIGINT) END AS q
  FROM m, dims),
qv AS (SELECT i, q AS qq FROM qe WHERE vec_id = 0)
SELECT qe.vec_id, CAST(sum(qe.q * qv.qq) AS BIGINT) AS dot
FROM qe JOIN qv USING (i) WHERE qe.vec_id <> 0
GROUP BY qe.vec_id
ORDER BY dot DESC, qe.vec_id
LIMIT 10
""",
    # curation composite: the doc_clf gate, the doc_lm gate TRAINED ON
    # THE CLASSIFIER'S SURVIVORS, the dedup_blocks removal over the LM's
    # survivors, and the doc_source_rank quota — all chained as CTEs
    "pipeline_curation2": r"""
WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text, source,
              regexp_extract_all(lower(text), '[a-z0-9]+') AS t
              FROM documents),
clf AS (SELECT doc_id, text, source FROM (
    SELECT doc_id, text, source,
      CASE WHEN len(t) = 0 THEN 0
           ELSE list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(t, tok ->
               ((list_reduce(list_prepend(CAST(7 AS BIGINT),
                   list_transform(string_split(tok, ''), c -> CAST(unicode(c) AS BIGINT))),
                   (a, b) -> (a * 31 + b) % 1000003) * 2654435761)
                % 2147483647) % 2001 - 1000)),
             (a, b) -> a + b) END AS logit
    FROM toks) WHERE logit > 0),
d0 AS (SELECT doc_id AS id, source,
              string_split_regex(trim(text), '\s+') AS w
       FROM clf WHERE trim(text) <> ''),
th AS (SELECT id, source, len(w) AS n, w,
   list_transform(w, t -> list_reduce(list_prepend(CAST(7 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 31 + b) % 1000003)) AS t1,
   list_transform(w, t -> list_reduce(list_prepend(CAST(11 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 37 + b) % 1000033)) AS t2
 FROM d0 WHERE len(w) >= 2),
pos AS (SELECT id, t1[i] % 65536 AS ub,
        ((t1[i] * 1000003 + t1[i+1]) % 2147483647) % 1048576 AS bb
        FROM th, unnest(generate_series(1, n - 1)) AS g(i)),
uni AS (SELECT x.h % 65536 AS ub, count(*) AS c
        FROM th, unnest(th.t1) AS x(h) GROUP BY 1),
big AS (SELECT bb, count(*) AS c FROM pos GROUP BY bb),
qv AS (SELECT pos.id, (big.c * 1000000) // uni.c AS q
       FROM pos JOIN big USING (bb) JOIN uni USING (ub)),
lm AS (SELECT id, CAST(sum(q) // count(*) AS BIGINT) AS lm_ppm
       FROM qv GROUP BY id),
surv AS (SELECT th.id, th.source, th.n, th.w, th.t1, th.t2
         FROM th JOIN lm ON th.id = lm.id WHERE lm.lm_ppm >= 34000),
b AS (SELECT id, i,
   list_reduce(list_prepend(CAST(0 AS BIGINT), t1[(i-1)*6+1:i*6]),
               (a, b) -> (a * 1000003 + b) % 2147483647)
   + list_reduce(list_prepend(CAST(0 AS BIGINT), t2[(i-1)*6+1:i*6]),
               (a, b) -> (a * 1000033 + b) % 2147483647) * 2147483648 AS bh,
   array_to_string(w[(i-1)*6+1:i*6], ' ') AS blk
   FROM surv, unnest(generate_series(1, CAST(ceil(n / 6.0) AS BIGINT))) AS g(i)),
banned AS (SELECT bh FROM b GROUP BY bh HAVING count(DISTINCT id) >= 2),
m AS (SELECT b.id, b.i, b.blk,
        CASE WHEN banned.bh IS NOT NULL THEN 1 ELSE 0 END AS rm
      FROM b LEFT JOIN banned USING (bh)),
bd AS (SELECT id, CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(rm) AS BIGINT) AS n_dup_blocks,
       coalesce(string_agg(CASE WHEN rm = 0 THEN blk END, ' ' ORDER BY i), '')
         AS dedup_text
       FROM m GROUP BY id),
r AS (SELECT bd.id AS doc_id, surv.source, bd.n_blocks, bd.n_dup_blocks,
      bd.dedup_text,
      CAST((CAST(bd.id AS HUGEINT) * 2685821657736338717)
           % 4611686018427387904 AS BIGINT) AS h
      FROM bd JOIN surv ON bd.id = surv.id)
SELECT doc_id, source, n_blocks, n_dup_blocks, dedup_text,
  CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) - 1
       AS BIGINT) AS src_rank,
  CAST(CASE WHEN row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
            - 1 < 10 THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM r
""",
    # grouped rank: per-source row_number under the same deterministic
    # shuffle-hash order as doc_shuffle; quota flag = rank < 15
    "doc_source_rank": r"""
WITH m AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
  CAST((CAST(doc_id AS HUGEINT) * 2685821657736338717)
       % 4611686018427387904 AS BIGINT) AS shuffle_hash
  FROM documents)
SELECT doc_id, source, shuffle_hash,
  CAST(row_number() OVER (PARTITION BY source
       ORDER BY shuffle_hash, doc_id) - 1 AS BIGINT) AS src_rank,
  CAST(CASE WHEN row_number() OVER (PARTITION BY source
       ORDER BY shuffle_hash, doc_id) - 1 < 15 THEN 1 ELSE 0 END AS BIGINT)
    AS kept
FROM m
""",
    # SemDeDup: same exact-integer kmeans chain as embed_kmeans, then a
    # vector is a dup iff some LOWER-id member of its final cluster lies
    # within the squared-L2 ball (fixed-point units)
    "dedup_semantic": r"""
WITH e AS (SELECT CAST(vec_id AS BIGINT) AS vid,
  list_transform(CAST(embedding AS DOUBLE[]),
    v -> CAST(floor(v * 1048576 + 0.5) AS BIGINT) + 4194304) AS x
  FROM embeddings),
dims AS (SELECT unnest(generate_series(1, 64)) AS i),
c0 AS (SELECT vid AS cid, x FROM e WHERE vid < 8),
d1 AS (SELECT e.vid, c0.cid,
  list_reduce(list_transform(generate_series(1, 64),
    i -> (e.x[i] - c0.x[i]) * (e.x[i] - c0.x[i])), (a, b) -> a + b) AS dist
  FROM e, c0),
a1 AS (SELECT vid, cid FROM (SELECT vid, cid,
    row_number() OVER (PARTITION BY vid ORDER BY dist, cid) AS rn FROM d1)
  WHERE rn = 1),
u1 AS (SELECT a1.cid, dims.i, sum(e.x[dims.i]) AS s, count(*) AS n
       FROM e JOIN a1 USING (vid) CROSS JOIN dims
       GROUP BY a1.cid, dims.i),
c1n AS (SELECT cid, list(CAST(s // n AS BIGINT) ORDER BY i) AS x FROM u1 GROUP BY cid),
c1 AS (SELECT c0.cid, COALESCE(c1n.x, c0.x) AS x
       FROM c0 LEFT JOIN c1n USING (cid)),
d2 AS (SELECT e.vid, c1.cid,
  list_reduce(list_transform(generate_series(1, 64),
    i -> (e.x[i] - c1.x[i]) * (e.x[i] - c1.x[i])), (a, b) -> a + b) AS dist
  FROM e, c1),
a2 AS (SELECT vid, cid FROM (SELECT vid, cid,
    row_number() OVER (PARTITION BY vid ORDER BY dist, cid) AS rn FROM d2)
  WHERE rn = 1),
u2 AS (SELECT a2.cid, dims.i, sum(e.x[dims.i]) AS s, count(*) AS n
       FROM e JOIN a2 USING (vid) CROSS JOIN dims
       GROUP BY a2.cid, dims.i),
c2n AS (SELECT cid, list(CAST(s // n AS BIGINT) ORDER BY i) AS x FROM u2 GROUP BY cid),
c2 AS (SELECT c1.cid, COALESCE(c2n.x, c1.x) AS x
       FROM c1 LEFT JOIN c2n USING (cid)),
d3 AS (SELECT e.vid, c2.cid,
  list_reduce(list_transform(generate_series(1, 64),
    i -> (e.x[i] - c2.x[i]) * (e.x[i] - c2.x[i])), (a, b) -> a + b) AS dist
  FROM e, c2),
a3 AS (SELECT vid, cid FROM (SELECT vid, cid,
    row_number() OVER (PARTITION BY vid ORDER BY dist, cid) AS rn FROM d3)
  WHERE rn = 1),
p AS (SELECT hi.vid AS vid,
  min(list_reduce(list_transform(generate_series(1, 64),
    i -> (ex.x[i] - ey.x[i]) * (ex.x[i] - ey.x[i])), (a, b) -> a + b)) AS mind
  FROM a3 hi JOIN a3 lo ON hi.cid = lo.cid AND lo.vid < hi.vid
  JOIN e ex ON ex.vid = hi.vid JOIN e ey ON ey.vid = lo.vid
  GROUP BY hi.vid)
SELECT a3.vid AS vec_id, a3.cid AS cluster,
  CAST(CASE WHEN p.mind <= 1300000000000 THEN 1 ELSE 0 END AS BIGINT) AS is_dup
FROM a3 LEFT JOIN p ON a3.vid = p.vid
""",
    # block dedup: 62-bit two-family polynomial fold per non-overlapping
    # 6-token block (PolySimHasher's short-doc case); blocks hashing
    # equal in >=2 distinct docs are removed everywhere, survivors
    # rejoined in order with single spaces
    "dedup_blocks": r"""
WITH d0 AS (SELECT CAST(doc_id AS BIGINT) AS id,
                   string_split_regex(trim(text), '\s+') AS w
            FROM documents WHERE trim(text) <> ''),
th AS (SELECT id, len(w) AS n, w,
   list_transform(w, t -> list_reduce(list_prepend(CAST(7 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 31 + b) % 1000003)) AS t1,
   list_transform(w, t -> list_reduce(list_prepend(CAST(11 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 37 + b) % 1000033)) AS t2
 FROM d0),
b AS (SELECT id, i,
   list_reduce(list_prepend(CAST(0 AS BIGINT), t1[(i-1)*6+1:i*6]),
               (a, b) -> (a * 1000003 + b) % 2147483647)
   + list_reduce(list_prepend(CAST(0 AS BIGINT), t2[(i-1)*6+1:i*6]),
               (a, b) -> (a * 1000033 + b) % 2147483647) * 2147483648 AS bh,
   array_to_string(w[(i-1)*6+1:i*6], ' ') AS blk
   FROM th, unnest(generate_series(1, CAST(ceil(n / 6.0) AS BIGINT))) AS g(i)),
banned AS (SELECT bh FROM b GROUP BY bh HAVING count(DISTINCT id) >= 2),
m AS (SELECT b.id, b.i, b.blk,
        CASE WHEN banned.bh IS NOT NULL THEN 1 ELSE 0 END AS rm
      FROM b LEFT JOIN banned USING (bh))
SELECT id AS doc_id,
  CAST(count(*) AS BIGINT) AS n_blocks,
  CAST(sum(rm) AS BIGINT) AS n_dup_blocks,
  coalesce(string_agg(CASE WHEN rm = 0 THEN blk END, ' ' ORDER BY i), '')
    AS dedup_text
FROM m GROUP BY id
""",
    # hashed bigram LM: unigram/bigram counts feature-hashed into
    # 2^16/2^20 buckets (collisions are part of the semantics, identical
    # on both sides); q = c2*1e6 // c1 in exact integers, doc score =
    # sum(q) // n_bigrams; <2-token docs carry no bigram evidence
    "doc_lm": r"""
WITH d0 AS (SELECT CAST(doc_id AS BIGINT) AS id,
                   string_split_regex(trim(text), '\s+') AS w
            FROM documents WHERE trim(text) <> ''),
th AS (SELECT id, len(w) AS n,
   list_transform(w, t -> list_reduce(list_prepend(CAST(7 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 31 + b) % 1000003)) AS t1
 FROM d0 WHERE len(w) >= 2),
pos AS (SELECT id, t1[i] % 65536 AS ub,
        ((t1[i] * 1000003 + t1[i+1]) % 2147483647) % 1048576 AS bb
        FROM th, unnest(generate_series(1, n - 1)) AS g(i)),
uni AS (SELECT x.h % 65536 AS ub, count(*) AS c
        FROM th, unnest(th.t1) AS x(h) GROUP BY 1),
big AS (SELECT bb, count(*) AS c FROM pos GROUP BY bb),
q AS (SELECT pos.id, (big.c * 1000000) // uni.c AS q
      FROM pos JOIN big USING (bb) JOIN uni USING (ub)),
agg AS (SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        CAST(sum(q) // count(*) AS BIGINT) AS lm_ppm
        FROM q GROUP BY id)
SELECT doc_id, n_bigrams, lm_ppm,
  CAST(CASE WHEN lm_ppm >= 34000 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM agg
""",
    # sequence packing: start_offset = windowed prefix sum of whitespace
    # token counts under the same deterministic-shuffle order; bin =
    # start_offset // budget (concat-and-chunk at budget=1024)
    "doc_pack": r"""
WITH m AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST((CAST(doc_id AS HUGEINT) * 2685821657736338717)
       % 4611686018427387904 AS BIGINT) AS shuffle_hash,
  CAST(CASE WHEN trim(text) = '' THEN 0
       ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
  FROM documents),
s AS (SELECT doc_id, shuffle_hash, n_tokens,
  CAST(COALESCE(sum(n_tokens) OVER (ORDER BY shuffle_hash, doc_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       AS start_offset
  FROM m)
SELECT doc_id, n_tokens, shuffle_hash, start_offset,
  CAST(start_offset // 1024 AS BIGINT) AS bin
FROM s
""",
    # hashed-linear classifier (stages/classify.py): the same polynomial
    # token hash as the embedder, weight = ((h*2654435761) % (2^31-1)) %
    # 2001 - 1000, integer logit sum — value-exact including the keep flag
    "doc_clf": r"""
WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS t
              FROM documents),
tw AS (SELECT doc_id, len(t) AS n,
   list_transform(t, tok ->
     ((list_reduce(list_prepend(CAST(7 AS BIGINT),
         list_transform(string_split(tok, ''), c -> CAST(unicode(c) AS BIGINT))),
         (a, b) -> (a * 31 + b) % 1000003) * 2654435761) % 2147483647) % 2001 - 1000) AS w
 FROM toks),
s AS (SELECT doc_id, n,
        CASE WHEN n = 0 THEN 0
             ELSE list_reduce(list_prepend(CAST(0 AS BIGINT), w), (a, b) -> a + b)
        END AS logit
      FROM tw)
SELECT doc_id,
  CAST(n AS BIGINT) AS n_tokens,
  CAST(logit AS BIGINT) AS clf_logit,
  CASE WHEN n = 0 THEN 0.0
       ELSE floor(CAST(logit AS DOUBLE) / (n * 1000) * 1000000 + 0.5) / 1000000
  END AS clf_score,
  CAST(CASE WHEN logit > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM s
""",
    "doc_novelty": r"""
WITH d0 AS (SELECT CAST(doc_id AS BIGINT) AS id,
                   string_split_regex(trim(text), '\s+') AS w
            FROM documents WHERE trim(text) <> ''),
th AS (SELECT id, len(w) AS n,
   list_transform(w, t -> list_reduce(list_prepend(CAST(7 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 31 + b) % 1000003)) AS t1,
   list_transform(w, t -> list_reduce(list_prepend(CAST(11 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 37 + b) % 1000033)) AS t2
 FROM d0),
feats AS (SELECT id,
   CASE WHEN n < 3 THEN
     [ list_reduce(list_prepend(CAST(0 AS BIGINT), t1), (a, b) -> (a * 1000003 + b) % 2147483647)
       + list_reduce(list_prepend(CAST(0 AS BIGINT), t2), (a, b) -> (a * 1000033 + b) % 2147483647) * 2147483648 ]
   ELSE
     list_distinct(list_transform(generate_series(1, n - 2), i ->
       ((t1[i] * 1000003 + t1[i+1]) % 2147483647 * 1000003 + t1[i+2]) % 2147483647
       + ((t2[i] * 1000033 + t2[i+1]) % 2147483647 * 1000033 + t2[i+2]) % 2147483647 * 2147483648))
   END AS h
 FROM th),
f AS (SELECT id, x.h FROM feats, unnest(feats.h) AS x(h)),
mn AS (SELECT h, min(id) AS mid FROM f GROUP BY h)
SELECT f.id AS doc_id,
  CAST(count(*) AS BIGINT) AS n_shingles,
  CAST(sum(CASE WHEN mn.mid = f.id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
  floor(CAST(sum(CASE WHEN mn.mid = f.id THEN 1 ELSE 0 END) AS DOUBLE)
        / count(*) * 1000000 + 0.5) / 1000000 AS novelty
FROM f JOIN mn ON f.h = mn.h
GROUP BY f.id
""",
    # KMV sketch: same 62-bit polynomial shingle features as doc_novelty,
    # scrambled by the bijective odd-multiply mod 2^62 (HUGEINT arithmetic
    # matches numpy's uint64-wrap-then-mask exactly since 2^62 | 2^64),
    # estimate = (k-1)*2^62/(kth_smallest+1) — deterministic, so an
    # APPROXIMATE operator is still value-checked
    "corpus_distinct_sketch": r"""
WITH d0 AS (SELECT string_split_regex(trim(text), '\s+') AS w
            FROM documents WHERE trim(text) <> ''),
th AS (SELECT len(w) AS n,
   list_transform(w, t -> list_reduce(list_prepend(CAST(7 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 31 + b) % 1000003)) AS t1,
   list_transform(w, t -> list_reduce(list_prepend(CAST(11 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 37 + b) % 1000033)) AS t2
 FROM d0),
feats AS (SELECT
   CASE WHEN n < 3 THEN
     [ list_reduce(list_prepend(CAST(0 AS BIGINT), t1), (a, b) -> (a * 1000003 + b) % 2147483647)
       + list_reduce(list_prepend(CAST(0 AS BIGINT), t2), (a, b) -> (a * 1000033 + b) % 2147483647) * 2147483648 ]
   ELSE
     list_distinct(list_transform(generate_series(1, n - 2), i ->
       ((t1[i] * 1000003 + t1[i+1]) % 2147483647 * 1000003 + t1[i+2]) % 2147483647
       + ((t2[i] * 1000033 + t2[i+1]) % 2147483647 * 1000033 + t2[i+2]) % 2147483647 * 2147483648))
   END AS h
 FROM th),
m AS (SELECT DISTINCT CAST((CAST(x.h AS HUGEINT) * 2685821657736338717)
                           % 4611686018427387904 AS BIGINT) AS mh
      FROM feats, unnest(feats.h) AS x(h)),
km AS (SELECT mh FROM m ORDER BY mh LIMIT 256),
st AS (SELECT count(*) AS n, max(mh) AS kth FROM km)
SELECT CAST(256 AS BIGINT) AS k,
  CAST(kth AS BIGINT) AS kth_hash,
  CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
       ELSE floor(CAST(255 AS DOUBLE) * 4611686018427387904 / (kth + 1)
                  * 1000000 + 0.5) / 1000000
  END AS est_distinct
FROM st
""",
    # full signature recomputation (PolySimHasher, stages/dedup.py): two
    # polynomial codepoint hashes per token, rolling 3-shingle folds mod
    # 2^31-1 combined into 62-bit features, distinct-feature bit-majority
    # vote, then all-pairs Hamming <= 9.  Because the pipeline's
    # max_hamming (9) < n_bands (10), pigeonhole makes band recall exact —
    # this oracle checks VALUES, with no LSH recall assumption.
    "dedup_simhash": r"""
WITH d0 AS (SELECT CAST(doc_id AS BIGINT) AS id, string_split_regex(trim(text), '\s+') AS w
            FROM documents WHERE trim(text) <> ''),
u AS (
  SELECT id, w FROM d0
  UNION ALL
  SELECT id + 1000000, w[1:len(w)-1] FROM d0 WHERE id % 10 = 0 AND len(w) >= 2
),
th AS (SELECT id, len(w) AS n,
   list_transform(w, t -> list_reduce(list_prepend(CAST(7 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 31 + b) % 1000003)) AS t1,
   list_transform(w, t -> list_reduce(list_prepend(CAST(11 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 37 + b) % 1000033)) AS t2
 FROM u),
feats AS (SELECT id,
   CASE WHEN n < 3 THEN
     [ list_reduce(list_prepend(CAST(0 AS BIGINT), t1), (a, b) -> (a * 1000003 + b) % 2147483647)
       + list_reduce(list_prepend(CAST(0 AS BIGINT), t2), (a, b) -> (a * 1000033 + b) % 2147483647) * 2147483648 ]
   ELSE
     list_distinct(list_transform(generate_series(1, n - 2), i ->
       ((t1[i] * 1000003 + t1[i+1]) % 2147483647 * 1000003 + t1[i+2]) % 2147483647
       + ((t2[i] * 1000033 + t2[i+1]) % 2147483647 * 1000033 + t2[i+2]) % 2147483647 * 2147483648))
   END AS h
 FROM th),
bits AS (
  SELECT f.id, b.j,
         CASE WHEN sum(((x.h >> b.j) & 1) * 2 - 1) > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bit
  FROM feats f, unnest(f.h) AS x(h), generate_series(0, 61) AS b(j)
  GROUP BY f.id, b.j),
sigs AS (SELECT id, CAST(sum(bit << j) AS BIGINT) AS sig FROM bits GROUP BY id)
SELECT a.id AS left_id, b.id AS right_id,
       CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
FROM sigs a JOIN sigs b ON a.id < b.id
WHERE bit_count(xor(a.sig, b.sig)) <= 9
""",
    "doc_chunks_para": r"""
WITH RECURSIVE
clean AS (
  SELECT doc_id,
    trim(regexp_replace(regexp_replace(regexp_replace(text, '\s+', ' ', 'g'),
         '\n{3,}', chr(10)||chr(10), 'g'), '[^[:ascii:]]+', '', 'g')) AS p
  FROM documents),
-- paragraphs at or under the char budget are emitted VERBATIM (possibly
-- with double spaces left by the non-ascii strip); only longer ones go
-- through the word packer, which re-joins with single spaces
short AS (
  SELECT doc_id, CAST(0 AS BIGINT) AS chunk_idx, p AS chunk
  FROM clean WHERE length(p) <= 200),
w AS (SELECT doc_id, list_filter(string_split(p, ' '), x -> x <> '') AS words
      FROM clean WHERE length(p) > 200),
e AS (SELECT doc_id, unnest(words) AS wd, generate_subscripts(words, 1) AS i FROM w),
carr AS (
  SELECT e.doc_id,
         list(length(wd) + 1 ORDER BY i) AS lens,
         list(wd ORDER BY i) AS words
  FROM e GROUP BY e.doc_id),
cums AS (
  SELECT doc_id, words,
    list_transform(generate_series(1, len(lens)), m -> list_sum(lens[1:m])) AS cum,
    len(words) AS n
  FROM carr),
rec AS (
  SELECT doc_id, words, cum, n, 0 AS chunk_idx, 1 AS s, 1 AS jnext,
         CAST(NULL AS VARCHAR) AS chunk
  FROM cums
  UNION ALL
  SELECT doc_id, words, cum, n, chunk_idx + 1,
    (js + 1 - least(50, js - s + 1)) AS s,
    js + 1 AS jnext,
    array_to_string(words[s:js], ' ') AS chunk
  FROM (
    SELECT *,
      greatest(jnext,
        len(list_filter(cum, x -> x <= (CASE WHEN s = 1 THEN 0 ELSE cum[s-1] END) + 200))
      ) AS js
    FROM rec
  )
  WHERE jnext <= n
)
SELECT doc_id, CAST(chunk_idx - 1 AS BIGINT) AS chunk_idx, chunk
FROM rec WHERE chunk IS NOT NULL
UNION ALL
SELECT doc_id, chunk_idx, chunk FROM short
""",
    # sentence-scoring answer heuristic (R5): RE2 has no lookbehind, so the
    # reference's (?<=[.!?])\s+ sentence split is emulated by marking the
    # boundary with a sentinel and splitting on it
    "rag_answer": r"""
WITH s AS (
  SELECT doc_id, text,
    string_split(regexp_replace(text, '([.!?])\s+', '\1' || chr(1), 'g'), chr(1)) AS sents
  FROM documents),
r AS (
  SELECT doc_id, text,
    list_filter(sents, x -> contains(lower(x), 'what') OR contains(lower(x), 'value')) AS rel
  FROM s),
sc AS (
  SELECT doc_id, text, rel,
    list_transform(rel, x ->
      (CASE WHEN contains(lower(x), 'what') THEN 1 ELSE 0 END)
      + (CASE WHEN contains(lower(x), 'value') THEN 1 ELSE 0 END)) AS scores
  FROM r)
SELECT doc_id,
  CASE WHEN len(rel) = 0 THEN text
       ELSE regexp_replace(rel[list_position(scores, list_max(scores))], '^\s+|\s+$', '', 'g')
  END AS answer
FROM sc
""",
    # the image-decode stub's deterministic fake is sha256-derived, which
    # DuckDB can replicate exactly (hex-pair -> byte value via strpos)
    "multimodal_meta": r"""
WITH h AS (SELECT doc_id, sha256(text) AS hx FROM documents),
b AS (
  SELECT doc_id, hx,
    (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
      + strpos('0123456789abcdef', substr(hx, 2, 1)) - 1 AS b0,
    (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16
      + strpos('0123456789abcdef', substr(hx, 4, 1)) - 1 AS b1,
    (strpos('0123456789abcdef', substr(hx, 5, 1)) - 1) * 16
      + strpos('0123456789abcdef', substr(hx, 6, 1)) - 1 AS b2
  FROM h)
SELECT doc_id, substr(hx, 1, 16) AS content_hash,
  CAST(64 + b0 % 192 AS BIGINT) AS width,
  CAST(64 + b1 % 192 AS BIGINT) AS height,
  CASE WHEN b2 % 2 = 1 THEN 'RGB' ELSE 'L' END AS mode
FROM b
""",
    # sparse word self-join (same pattern as dedup_minhash): 341s -> seconds
    # at sf0.1 vs the all-pairs list_intersect form
    "dedup_jaccard": rf"""
WITH s AS (SELECT doc_id, list_distinct(string_split_regex(trim(text), '\s+')) AS w FROM documents),
sz AS (SELECT doc_id, len(w) AS n FROM s),
f AS (SELECT doc_id, x.w AS g FROM s, unnest(s.w) AS x(w)),
inter AS (SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS i
          FROM f a JOIN f b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
SELECT l AS left_id, r AS right_id,
  round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
FROM inter JOIN sz sa ON sa.doc_id = l JOIN sz sb ON sb.doc_id = r
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {JACCARD_THRESHOLD}
""",
    # feature-hash embedding pipeline (A7 analog): bucket sums per doc from
    # the codepoint-polynomial token hash — bit-identical to
    # ocr_ray/stages/embed.py:hash_token
    "embed_docs": """
WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
             FROM documents),
h AS (SELECT doc_id,
        list_reduce(list_prepend(7, list_transform(string_split(tok, ''), c -> unicode(c))),
                    (a, b) -> (a * 31 + b) % 1000003) AS hv
      FROM tok),
f AS (SELECT doc_id, hv % 64 AS bucket,
             CASE WHEN (hv // 64) % 2 = 0 THEN 1 ELSE -1 END AS sign FROM h),
vb AS (SELECT doc_id, bucket, CAST(sum(sign) AS DOUBLE) AS v FROM f GROUP BY doc_id, bucket),
agg AS (
  SELECT doc_id,
    round(sqrt(sum(v*v)), 6) AS emb_norm,
    CAST(count(*) FILTER (WHERE v <> 0) AS BIGINT) AS nnz,
    round(coalesce(sum(v) FILTER (WHERE bucket = 0), 0) / sqrt(sum(v*v)), 6) AS e0
  FROM vb GROUP BY doc_id)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
  coalesce(a.emb_norm, 0.0) AS emb_norm,
  coalesce(a.nnz, 0) AS nnz,
  coalesce(a.e0, 0.0) AS e0
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
""",
    "embed_text_knn": """
WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
             FROM documents),
h AS (SELECT doc_id,
        list_reduce(list_prepend(7, list_transform(string_split(tok, ''), c -> unicode(c))),
                    (a, b) -> (a * 31 + b) % 1000003) AS hv
      FROM tok),
f AS (SELECT doc_id, hv % 64 AS bucket,
             CASE WHEN (hv // 64) % 2 = 0 THEN 1 ELSE -1 END AS sign FROM h),
vb AS (SELECT doc_id, bucket, CAST(sum(sign) AS DOUBLE) AS v FROM f GROUP BY doc_id, bucket),
nd AS (SELECT doc_id, sqrt(sum(v*v)) AS nrm FROM vb GROUP BY doc_id),
qtok AS (SELECT unnest(regexp_extract_all(lower('data pipeline value'), '[a-z0-9]+')) AS tok),
qh AS (SELECT list_reduce(list_prepend(7, list_transform(string_split(tok, ''), c -> unicode(c))),
                          (a, b) -> (a * 31 + b) % 1000003) AS hv FROM qtok),
qf AS (SELECT hv % 64 AS bucket,
              CASE WHEN (hv // 64) % 2 = 0 THEN 1 ELSE -1 END AS sign FROM qh),
qvb AS (SELECT bucket, CAST(sum(sign) AS DOUBLE) AS qv FROM qf GROUP BY bucket),
qn AS (SELECT sqrt(sum(qv*qv)) AS qnrm FROM qvb),
sims AS (
  SELECT vb.doc_id, sum((vb.v / nd.nrm) * (qvb.qv / qn.qnrm)) AS sim
  FROM vb JOIN nd USING (doc_id) JOIN qvb ON vb.bucket = qvb.bucket CROSS JOIN qn
  GROUP BY vb.doc_id)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
  round(coalesce(s.sim, 0.0), 6) AS sim
FROM documents d LEFT JOIN sims s ON d.doc_id = s.doc_id
ORDER BY coalesce(s.sim, 0.0) DESC, d.doc_id
LIMIT 10
""",
    "embed_knn": """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS sim
FROM embeddings e, q
ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) DESC, e.vec_id
LIMIT 10
""",
    "embed_label_stats": """
SELECT CAST(label AS BIGINT) AS label, count(*) AS n,
  round(min(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x)))), 6) AS min_norm,
  round(max(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x)))), 6) AS max_norm
FROM embeddings GROUP BY label
""",
    "q1_pricing": f"""
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  {_CENTS.format(col='l_extendedprice')} AS sum_base_cents,
  count(*) AS n_rows
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    "top_customers": f"""
SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, c.c_name,
  {_CENTS.format(col='o.o_totalprice')} AS total_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY total_cents DESC, c.c_custkey
LIMIT 10
""",
    "events_hourly": f"""
SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n,
  {_CENTS.format(col='value')} AS sum_value_cents
FROM events GROUP BY event_type, date_trunc('hour', ts)
""",
    # each stage = min ts strictly after the previous stage's chosen ts;
    # the greedy earliest-choice chain is optimal for ">" ordering, so the
    # SQL min-join reproduces the walk exactly
    "events_funnel": """
WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
       WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
SELECT 'signup' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s1
UNION ALL SELECT 'view', CAST(count(*) AS BIGINT) FROM s2
UNION ALL SELECT 'purchase', CAST(count(*) AS BIGINT) FROM s3
""",
    "events_hourly_users": """
SELECT date_trunc('hour', ts) AS hour, CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY date_trunc('hour', ts)
""",
    "customers_no_orders": """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2001-01-01')
""",
    "parts_ordered": """
SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_brand
FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
""",
    # sequence integrity per order: 1-based contiguity of line numbers;
    # null indices count in n_rows/n_null_idx only (SQL aggregate-null
    # semantics, mirrored exactly by stages/validate.py)
    "orders_line_gaps": """
SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT l_linenumber) AS BIGINT) AS n_distinct,
       CAST(count(*) - count(l_linenumber) AS BIGINT) AS n_null_idx,
       CAST(min(l_linenumber) AS BIGINT) AS min_idx,
       CAST(max(l_linenumber) AS BIGINT) AS max_idx,
       (count(*) > count(DISTINCT l_linenumber)) AS has_dups,
       (coalesce(min(l_linenumber) = 1, FALSE)
        AND coalesce(max(l_linenumber) - min(l_linenumber) + 1
                     = count(DISTINCT l_linenumber), FALSE)
        AND count(*) = count(DISTINCT l_linenumber)) AS is_contiguous
FROM lineitem GROUP BY 1
""",
    # window END day d counts users active in [d-6, d]: expand each user's
    # distinct active days to day+0..6, dedup per user, count per day
    "events_active_7d": """
WITH d AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
cov AS (SELECT DISTINCT user_id, day + i * INTERVAL 1 DAY AS day
        FROM d, (SELECT unnest(generate_series(0, 6)) AS i))
SELECT CAST(day AS TIMESTAMP) AS day, CAST(count(*) AS BIGINT) AS n_users
FROM cov GROUP BY day
""",
    # cohort = Monday-truncated first-activity week; offset counts week
    # boundaries (both sides week-truncated, so diff is exact weeks)
    "events_retention": """
WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cw
           FROM events GROUP BY user_id),
a AS (SELECT DISTINCT e.user_id, f.cw, date_trunc('week', e.ts) AS w
      FROM events e JOIN f USING (user_id))
SELECT CAST(cw AS TIMESTAMP) AS cohort_week,
  CAST(date_diff('week', cw, w) AS BIGINT) AS week_offset,
  CAST(count(*) AS BIGINT) AS n_users
FROM a GROUP BY cw, date_diff('week', cw, w)
""",
    # quantile = smallest cents with cumulative count >= ceil(q*n) — the
    # same discrete order statistic the histogram plan computes
    "events_value_quantiles": """
WITH c AS (SELECT event_type,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
g AS (SELECT event_type, cents, count(*) AS k FROM c GROUP BY event_type, cents),
w AS (SELECT event_type, cents,
             sum(k) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
             sum(k) OVER (PARTITION BY event_type) AS n FROM g)
SELECT event_type,
  CAST(min(CASE WHEN cum >= ceil(0.5 * n) THEN cents END) AS BIGINT) AS p50_cents,
  CAST(min(CASE WHEN cum >= ceil(0.95 * n) THEN cents END) AS BIGINT) AS p95_cents,
  CAST(min(CASE WHEN cum >= ceil(0.99 * n) THEN cents END) AS BIGINT) AS p99_cents,
  CAST(min(n) AS BIGINT) AS n
FROM w GROUP BY event_type
""",
    "segment_revenue": f"""
SELECT c.c_mktsegment, CAST(sum(1) AS BIGINT) AS n_orders,
  {_CENTS.format(col='o.o_totalprice')} AS total_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
    "doc_langs_distinct": "SELECT DISTINCT lang FROM documents",
    "events_window": """
WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
           FROM events GROUP BY event_type, date_trunc('hour', ts))
SELECT event_type, hour,
  CAST(sum(n) OVER (PARTITION BY event_type ORDER BY hour
       RANGE BETWEEN INTERVAL 2 HOUR PRECEDING AND CURRENT ROW) AS BIGINT) AS n_3h
FROM h
""",
    "events_range_join": """
WITH d AS (SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts))
SELECT CAST(user_id AS BIGINT) AS user_id, ts,
  CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts) - 1 AS BIGINT) AS session_idx
FROM d
""",
    "events_asof": """
WITH p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
     s AS (SELECT user_id, ts FROM events WHERE event_type = 'signup')
SELECT CAST(p.user_id AS BIGINT) AS user_id, p.ts,
  CAST(floor(p.value*100+0.5) AS BIGINT) AS value_cents,
  CAST(coalesce(floor(epoch(p.ts - s.ts) / 60), -1) AS BIGINT) AS gap_min
FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
""",
    "multimodal_audio": """
SELECT doc_id,
  octet_length(encode(text)) / 32000.0 AS duration_sec,
  CAST(13 AS BIGINT) AS n_mfcc
FROM documents
""",
    # resize stub: source dims from the first two sha256 bytes (hex-pair
    # parse as in multimodal_meta), factor = min(1, 2048/max(w,h)),
    # truncated output payload length = floor(len * factor^2)
    "multimodal_resize": r"""
WITH h AS (SELECT doc_id, text, sha256(text) AS hx FROM documents),
b AS (
  SELECT doc_id, text,
    64 + ((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
      + strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 16 AS w,
    64 + ((strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16
      + strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) * 16 AS h
  FROM h),
f AS (SELECT doc_id, text, w, h, least(1.0, 2048 / greatest(w, h)) AS factor FROM b)
SELECT doc_id,
  CAST(floor(w * factor) AS BIGINT) AS width,
  CAST(floor(h * factor) AS BIGINT) AS height,
  factor < 1.0 AS scaled,
  CAST(CASE WHEN octet_length(encode(text)) = 0 THEN 0
       ELSE greatest(1, floor(octet_length(encode(text)) * factor * factor)) END AS BIGINT)
    AS out_len
FROM f
""",
    "multimodal_frames": """
WITH t AS (SELECT doc_id,
    greatest(1, CAST(floor(octet_length(encode(text))/1024) AS BIGINT)) AS nf
  FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(ceil(nf/4.0) AS BIGINT) AS n_frames,
  CAST(4*(ceil(nf/4.0)-1) AS BIGINT) AS max_frame
FROM t
""",
    "supplier_regions": """
SELECT r.r_name, CAST(count(*) AS BIGINT) AS n_suppliers,
  CAST(sum(CAST(floor(s.s_acctbal*100+0.5) AS BIGINT)) AS BIGINT) AS acct_cents
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
    "rag_keyword_topk": r"""
WITH c AS (
  WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
             FROM documents WHERE trim(text) <> ''),
       e AS (SELECT doc_id, w,
                    unnest(generate_series(0, CAST(ceil(len(w)/80.0) AS INT) - 1)) AS ci
             FROM t)
  SELECT doc_id, ci AS chunk_idx, array_to_string(w[ci*80+1 : ci*80+100], ' ') AS chunk FROM e),
s AS (
  SELECT doc_id, chunk_idx, chunk,
    0.5 * len(list_intersect(list_distinct(regexp_extract_all(lower(chunk), '\w+')),
                             ['data','pipeline','value']))
    + (CASE WHEN contains(lower(chunk), 'data') THEN 1 ELSE 0 END
       + CASE WHEN contains(lower(chunk), 'pipeline') THEN 1 ELSE 0 END
       + CASE WHEN contains(lower(chunk), 'value') THEN 1 ELSE 0 END) AS score
  FROM c),
m AS (SELECT doc_id, max(score) AS mx FROM s GROUP BY doc_id),
r AS (SELECT s.doc_id, s.chunk_idx, s.chunk, s.score, m.mx,
             row_number() OVER (PARTITION BY s.doc_id ORDER BY s.score DESC, s.chunk_idx DESC) AS rn
      FROM s JOIN m ON s.doc_id = m.doc_id)
SELECT doc_id, CAST(rn - 1 AS BIGINT) AS rank, chunk,
       CASE WHEN mx > 0 THEN round(score / mx, 6) ELSE 0.1 END AS rel_score
FROM r
WHERE rn <= 3 AND (score > 0 OR mx = 0)
""",
    "events_sessions": """
WITH d AS (SELECT user_id, ts,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
           FROM events)
SELECT CAST(user_id AS BIGINT) AS user_id,
  CAST(1 + sum(CASE WHEN prev IS NOT NULL AND ts - prev > INTERVAL 30 MINUTE
               THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM d GROUP BY user_id
""",
    "doc_fim": """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CASE WHEN doc_id % 2 = 0 AND len(text) >= 3
       THEN '<PRE>' || substr(text, 1, len(text) // 3)
            || '<SUF>' || substr(text, 2 * len(text) // 3 + 1)
            || '<MID>' || substr(text, len(text) // 3 + 1,
                                 2 * len(text) // 3 - len(text) // 3)
       ELSE text END AS fim_text,
  CASE WHEN doc_id % 2 = 0 AND len(text) >= 3 THEN 'psm'
       ELSE 'plain' END AS layout
FROM documents
""",
    "doc_echo": """
WITH r AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  1 + CAST(n_chars >= 300 AS BIGINT) AS n_epochs
           FROM documents)
SELECT doc_id, CAST(unnest(generate_series(0, n_epochs - 1)) AS BIGINT) AS epoch,
       n_epochs
FROM r
""",
    "events_daily_overlap": """
WITH s AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                  CAST(count(*) AS BIGINT) AS n_signups
           FROM events WHERE event_type = 'signup' GROUP BY 1),
p AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(count(*) AS BIGINT) AS n_purchases
      FROM events WHERE event_type = 'purchase' GROUP BY 1)
SELECT coalesce(s.day, p.day) AS day,
       CAST(coalesce(s.n_signups, 0) AS BIGINT) AS n_signups,
       CAST(coalesce(p.n_purchases, 0) AS BIGINT) AS n_purchases
FROM s FULL OUTER JOIN p ON s.day = p.day
""",
    "events_latest": """
WITH r AS (SELECT *, row_number() OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(event_id AS BIGINT) AS event_id,
       ts, event_type, value
FROM r WHERE rn = 1
""",
    "embed_dim_stats": r"""
WITH e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
                  CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
m AS (SELECT vec_id, x,
             list_max(list_transform(x, v -> abs(v))) AS mx FROM e),
dims AS (SELECT unnest(generate_series(1, 64)) AS i),
q AS (SELECT m.vec_id, CAST(dims.i - 1 AS BIGINT) AS i,
  CASE WHEN m.mx = 0 THEN 0
       ELSE CAST(floor(x[dims.i] * 127.0 / m.mx + 0.5) AS BIGINT) END AS q
 FROM m, dims)
SELECT i, CAST(count(*) AS BIGINT) AS n, CAST(sum(q) AS BIGINT) AS sum_q,
       CAST(sum(q * q) AS BIGINT) AS sumsq_q,
       CAST(min(q) AS BIGINT) AS min_q, CAST(max(q) AS BIGINT) AS max_q
FROM q GROUP BY 1
""",
    "fuzzy_join_customers": """
WITH o AS (SELECT CAST(c_custkey AS BIGINT) AS left_id, c_name AS lname
           FROM customer),
m AS (SELECT CAST(c_custkey + 10000000 AS BIGINT) AS right_id,
             substr(c_name, 1, CAST(c_custkey % len(c_name) AS INT))
             || substr(c_name, CAST(c_custkey % len(c_name) AS INT) + 2) AS rname
      FROM customer WHERE c_custkey % 7 = 0)
SELECT o.left_id, m.right_id,
       CAST(levenshtein(o.lname, m.rname) AS BIGINT) AS dist
FROM o, m WHERE levenshtein(o.lname, m.rname) <= 1
""",
    "graph_triangles": """
WITH raw AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey),
e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM raw WHERE src <> dst),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1 JOIN e e2 ON e2.a = e1.b
                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
n AS (SELECT unnest([x, y, z]) AS node FROM tri)
SELECT CAST(node AS BIGINT) AS node, CAST(count(*) AS BIGINT) AS n_triangles
FROM n GROUP BY 1
""",
    "orders_cust_totals": """
SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, c.c_mktsegment,
       CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
       CAST(coalesce(o.total_cents, 0) AS BIGINT) AS total_cents
FROM customer c LEFT JOIN (
  SELECT o_custkey, count(*) AS n_orders,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS total_cents
  FROM orders GROUP BY 1) o ON c.c_custkey = o.o_custkey
""",
    # sum/max of consecutive sorted-ts diffs; ties in ts are harmless
    # (the diff multiset of a sorted multiset is order-invariant)
    "events_gaps": """
WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
d AS (SELECT user_id,
             us - lag(us) OVER (PARTITION BY user_id ORDER BY us) AS g
      FROM e)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(coalesce(sum(g), 0) AS BIGINT) AS span_us,
       CAST(coalesce(max(g), 0) AS BIGINT) AS max_gap_us
FROM d GROUP BY 1
""",
    "events_rollup": """
WITH b AS (SELECT event_type,
                  strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events)
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(day, 'ALL') AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS value_cents
FROM b GROUP BY ROLLUP (event_type, day)
""",
    "events_pivot": """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
  CAST(count(*) AS BIGINT) AS n_total
FROM events GROUP BY 1
""",
    # Gram matrix over the same quantization CTE as embed_quantize:
    # every upper-triangle cell is an exact BIGINT sum of code products
    "embed_gram": r"""
WITH e AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
                  CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
m AS (SELECT vec_id, x,
             list_max(list_transform(x, v -> abs(v))) AS mx FROM e),
dims AS (SELECT unnest(generate_series(1, 64)) AS i),
q AS (SELECT m.vec_id, CAST(dims.i - 1 AS BIGINT) AS i,
  CASE WHEN m.mx = 0 THEN 0
       ELSE CAST(floor(x[dims.i] * 127.0 / m.mx + 0.5) AS BIGINT) END AS q
 FROM m, dims)
SELECT a.i AS i, b.i AS j, CAST(sum(a.q * b.q) AS BIGINT) AS g
FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY 1, 2
""",
    "io_jsonl_roundtrip": """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY 1
""",
    # BPE merge table, 3 chained rounds: pair counts are weighted sums
    # over the distinct-word vocabulary; argmax ties break (cnt DESC,
    # left ASC, right ASC); merge application is RE2 regexp_replace with
    # \b anchors — identical non-overlapping left-to-right semantics to
    # the engine's re.sub
    "bpe_train": r"""
WITH w AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
           FROM documents),
v0 AS (SELECT array_to_string(string_split(word, ''), ' ') AS sym,
              CAST(count(*) AS BIGINT) AS cnt
       FROM w GROUP BY word),
p1 AS (SELECT a[i] AS left_s, a[i+1] AS right_s, CAST(sum(cnt) AS BIGINT) AS cnt
       FROM (SELECT string_split(sym, ' ') AS a, cnt FROM v0) t,
            (SELECT unnest(generate_series(1, len(a)-1)) AS i) g
       GROUP BY 1, 2),
t1 AS (SELECT * FROM p1 ORDER BY cnt DESC, left_s, right_s LIMIT 1),
v1 AS (SELECT regexp_replace(v0.sym, '\b' || t1.left_s || ' ' || t1.right_s || '\b',
                             t1.left_s || t1.right_s, 'g') AS sym, v0.cnt
       FROM v0, t1),
p2 AS (SELECT a[i] AS left_s, a[i+1] AS right_s, CAST(sum(cnt) AS BIGINT) AS cnt
       FROM (SELECT string_split(sym, ' ') AS a, cnt FROM v1) t,
            (SELECT unnest(generate_series(1, len(a)-1)) AS i) g
       GROUP BY 1, 2),
t2 AS (SELECT * FROM p2 ORDER BY cnt DESC, left_s, right_s LIMIT 1),
v2 AS (SELECT regexp_replace(v1.sym, '\b' || t2.left_s || ' ' || t2.right_s || '\b',
                             t2.left_s || t2.right_s, 'g') AS sym, v1.cnt
       FROM v1, t2),
p3 AS (SELECT a[i] AS left_s, a[i+1] AS right_s, CAST(sum(cnt) AS BIGINT) AS cnt
       FROM (SELECT string_split(sym, ' ') AS a, cnt FROM v2) t,
            (SELECT unnest(generate_series(1, len(a)-1)) AS i) g
       GROUP BY 1, 2),
t3 AS (SELECT * FROM p3 ORDER BY cnt DESC, left_s, right_s LIMIT 1)
SELECT CAST(1 AS BIGINT) AS step, left_s, right_s, cnt FROM t1
UNION ALL
SELECT CAST(2 AS BIGINT) AS step, left_s, right_s, cnt FROM t2
UNION ALL
SELECT CAST(3 AS BIGINT) AS step, left_s, right_s, cnt FROM t3
""",
}

# chained composite oracle: the exact-integer k-means assignment CTE
# (identical to embed_kmeans) feeding term counting + grouped top-3 —
# appended post-dict so it can embed the embed_kmeans SQL verbatim
# single-sourced: the adaptive dispatcher cannot change join semantics,
# so its oracle IS events_enriched's oracle
ORACLE_SQL["events_enriched_adaptive"] = ORACLE_SQL["events_enriched"]

ORACLE_SQL["embed_topics"] = f"""
WITH assign AS ({ORACLE_SQL['embed_kmeans']}),
tok AS (SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents),
ct AS (SELECT a.cluster, t.term, CAST(count(*) AS BIGINT) AS n
       FROM tok t JOIN assign a ON t.doc_id = a.vec_id
       GROUP BY a.cluster, t.term)
SELECT CAST(cluster AS BIGINT) AS cluster, term, n
FROM (SELECT *, row_number() OVER
        (PARTITION BY cluster ORDER BY n DESC, term) AS rn FROM ct)
WHERE rn <= 3
"""


def _model_score_sql() -> str:
    """Oracle for the A4 model path, generated from the same deterministic
    fit the engine loads (stages/model_engine.py:fit_artifact): the score
    is a BIGINT dot product of character-class counts, so SQL reproduces
    the model's inference exactly — the driver value-checks weights,
    featurization and the actor-pool plumbing in one hash compare."""
    from ocr_ray.stages.model_engine import fit_artifact

    a = fit_artifact()
    w, b = a["w_int"], a["b_int"]
    return f"""
WITH f AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
  CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_space,
  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
  CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT) AS n_upper,
  CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS n_punct
  FROM documents)
SELECT doc_id,
  CAST(({w[0]})*n_chars + ({w[1]})*n_alpha + ({w[2]})*n_space + ({w[3]})*n_digit
     + ({w[4]})*n_upper + ({w[5]})*n_punct + ({b})*n_chars AS BIGINT) AS model_score
FROM f
"""


ORACLE_SQL["model_score_docs"] = _model_score_sql()

# per-source MinHash signature similarity: identical 31-bit family-1
# shingles as split_contamination's oracle, permutation coefficients
# interpolated from the engine's frozen constants (stages/dedup.py:
# SRC_SIM_A/B — a*h + b < 2^51, exact BIGINT)
def _source_similarity_sql() -> str:
    from ocr_ray.stages.dedup import SRC_SIM_A, SRC_SIM_B

    perms = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(zip(SRC_SIM_A, SRC_SIM_B))
    )
    n_perm = len(SRC_SIM_A)
    return rf"""
WITH d0 AS (SELECT source, string_split_regex(trim(text), '\s+') AS w
            FROM documents WHERE trim(text) <> ''),
th AS (SELECT source, len(w) AS n,
   list_transform(w, t -> list_reduce(list_prepend(CAST(7 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 31 + b) % 1000003)) AS t1
 FROM d0 WHERE len(w) >= 3),
feats AS (SELECT source, list_distinct(list_transform(generate_series(1, n - 2), i ->
   ((t1[i] * 1000003 + t1[i+1]) % 2147483647 * 1000003 + t1[i+2]) % 2147483647)) AS hs
 FROM th),
sh AS (SELECT DISTINCT source, x.h FROM feats, unnest(feats.hs) AS x(h)),
perms(p, pa, pb) AS (VALUES {perms}),
sig AS (SELECT source, p, min((pa * h + pb) % 2147483647) AS m
        FROM sh CROSS JOIN perms GROUP BY source, p),
pair AS (SELECT sa.source AS src_a, sb.source AS src_b,
         CAST(count(*) FILTER (WHERE sa.m = sb.m) AS BIGINT) AS n_agree
         FROM sig sa JOIN sig sb ON sa.p = sb.p AND sa.source < sb.source
         GROUP BY sa.source, sb.source)
SELECT src_a, src_b, CAST({n_perm} AS BIGINT) AS n_perm, n_agree,
       CAST(n_agree * 1000000 // {n_perm} AS BIGINT) AS jaccard_est_ppm
FROM pair ORDER BY src_a, src_b
"""


ORACLE_SQL["corpus_source_similarity"] = _source_similarity_sql()

# cluster-balanced resample: the exact-integer kmeans CTE feeding a
# per-cluster quota window (centroid-nearest first, id tiebreak)
ORACLE_SQL["embed_cluster_cap"] = f"""
WITH assign AS ({ORACLE_SQL['embed_kmeans']})
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cluster AS BIGINT) AS cluster,
       CAST(dist AS BIGINT) AS dist, rk
FROM (SELECT *, row_number() OVER
        (PARTITION BY cluster ORDER BY dist, vec_id) AS rk FROM assign)
WHERE rk <= 32
"""

# quality-aware cluster collapse: winner per cluster = max n_chars then
# min id; survivors = everything except non-winning members
ORACLE_SQL["dedup_keep_best"] = _CLUSTER_CTES + """
, lab AS (SELECT id, min(r) AS c FROM reach GROUP BY id),
w AS (SELECT l.id,
        row_number() OVER (PARTITION BY l.c
                           ORDER BY d.n_chars DESC, l.id ASC) AS rn
      FROM lab l JOIN documents d ON d.doc_id = l.id)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, CAST(d.n_chars AS BIGINT) AS n_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT id FROM w WHERE rn > 1)
"""

# per-source running token sum <= budget; token count idiom matches
# pandas str.split() (trim first, empty text -> 0 tokens)
ORACLE_SQL["doc_budget_mix"] = rf"""
WITH n AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
    CAST(CASE WHEN trim(text) = '' THEN 0
         ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)
      AS n_tok
  FROM documents),
c AS (SELECT doc_id, source, n_tok,
        SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum_tok
      FROM n)
SELECT doc_id, source, n_tok, CAST(cum_tok AS BIGINT) AS cum_tok
FROM c WHERE cum_tok <= {DOC_MIX_BUDGET}
"""

# temperature mixing: per-source quota floor(scale * tot^0.5), then the
# same window-sum prefix selection as doc_budget_mix; power(x, 0.5) is
# the identical IEEE double op on both sides and the budget floors to
# BIGINT before any comparison
ORACLE_SQL["doc_mix_temperature"] = rf"""
WITH n AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
    CAST(CASE WHEN trim(text) = '' THEN 0
         ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)
      AS n_tok
  FROM documents),
b AS (SELECT source,
        CAST(FLOOR({MIX_TEMP_SCALE} * power(CAST(sum(n_tok) AS DOUBLE),
                                            0.5)) AS BIGINT) AS quota
      FROM n GROUP BY source),
c AS (SELECT doc_id, source, n_tok,
        SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum_tok
      FROM n)
SELECT c.doc_id, c.source, c.n_tok, CAST(c.cum_tok AS BIGINT) AS cum_tok
FROM c JOIN b ON c.source IS NOT DISTINCT FROM b.source
WHERE c.cum_tok <= b.quota
"""

# mixture composite: gate (>=25 tokens) -> keep-first exact dedup (SQL
# groups by text where the engine groups by md5 — the established
# dedup_exact collision convention) -> the doc_mix_temperature quota
ORACLE_SQL["pipeline_mixture"] = rf"""
WITH t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source, text,
    CAST(CASE WHEN trim(text) = '' THEN 0
         ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)
      AS n_tok
  FROM documents),
g AS (SELECT * FROM t WHERE n_tok >= 25),
dd AS (SELECT doc_id, source, n_tok FROM g
       QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1),
b AS (SELECT source,
        CAST(FLOOR({MIX_TEMP_SCALE} * power(CAST(sum(n_tok) AS DOUBLE),
                                            0.5)) AS BIGINT) AS quota
      FROM dd GROUP BY source),
c AS (SELECT doc_id, source, n_tok,
        SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum_tok
      FROM dd)
SELECT c.doc_id, c.source, c.n_tok, CAST(c.cum_tok AS BIGINT) AS cum_tok
FROM c JOIN b ON c.source IS NOT DISTINCT FROM b.source
WHERE c.cum_tok <= b.quota
"""

# integer-exact PERCENTILE_DISC ranks ((n*q_pm + 999) // 1000, min 1) —
# the engine computes the identical integer arithmetic (see
# analysis.py:winsorized_group_stats for why float ceil(q*n) is unsafe)
ORACLE_SQL["doc_winsorize"] = r"""
WITH n AS (SELECT source,
    CAST(CASE WHEN trim(text) = '' THEN 0
         ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)
      AS n_tok
  FROM documents),
o AS (SELECT source, n_tok,
        row_number() OVER (PARTITION BY source ORDER BY n_tok) AS rn,
        count(*) OVER (PARTITION BY source) AS cnt FROM n),
lo AS (SELECT source, CAST(min(n_tok) AS BIGINT) AS lo_thr FROM o
       WHERE rn >= GREATEST(1, (cnt * 50 + 999) // 1000) GROUP BY source),
hi AS (SELECT source, CAST(min(n_tok) AS BIGINT) AS hi_thr FROM o
       WHERE rn >= GREATEST(1, (cnt * 950 + 999) // 1000) GROUP BY source)
SELECT n.source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(min(lo.lo_thr) AS BIGINT) AS lo_thr,
  CAST(min(hi.hi_thr) AS BIGINT) AS hi_thr,
  CAST(sum(n.n_tok) AS BIGINT) AS sum_tok,
  CAST(sum(LEAST(GREATEST(n.n_tok, lo.lo_thr), hi.hi_thr)) AS BIGINT)
    AS sum_tok_winsor
FROM n JOIN lo USING (source) JOIN hi USING (source)
GROUP BY n.source
"""

# per-language PERCENTILE_DISC gate: the grouped generalization of the
# doc_length_quantiles order-statistic idiom
ORACLE_SQL["doc_lang_gate"] = r"""
WITH t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS token_len
       FROM documents WHERE trim(text) <> ''),
o AS (SELECT lang, token_len,
             row_number() OVER (PARTITION BY lang ORDER BY token_len) AS rn,
             count(*) OVER (PARTITION BY lang) AS n FROM t),
thr AS (SELECT lang, CAST(min(token_len) AS BIGINT) AS thr_len
        FROM o WHERE rn >= CAST(ceil(0.5 * n) AS BIGINT) GROUP BY lang)
SELECT t.doc_id, t.lang, t.token_len, thr.thr_len
FROM t JOIN thr USING (lang)
WHERE t.token_len >= thr.thr_len
"""

ORACLE_SQL["pipeline_cascade"] = rf"""
WITH RECURSIVE
d AS MATERIALIZED (SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
       row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
     FROM documents),
surv AS MATERIALIZED (SELECT doc_id, text FROM d WHERE rn = 1),
t AS MATERIALIZED (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
     FROM surv),
s AS MATERIALIZED (SELECT doc_id,
        CASE WHEN len(w) < {MINHASH_SHINGLE_K} THEN [array_to_string(w, ' ')]
             ELSE list_distinct(list_transform(
                    generate_series(1, len(w)-{MINHASH_SHINGLE_K - 1}),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) END AS sh
      FROM t),
sz AS MATERIALIZED (SELECT doc_id, len(sh) AS n FROM s),
fx AS MATERIALIZED (SELECT doc_id, x.sh AS g FROM s, unnest(s.sh) AS x(sh)),
p AS MATERIALIZED (
  SELECT CAST(l AS BIGINT) AS left_id, CAST(r AS BIGINT) AS right_id
  FROM (SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS i
        FROM fx a JOIN fx b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id) inter
  JOIN sz sa ON sa.doc_id = l JOIN sz sb ON sb.doc_id = r
  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {JACCARD_THRESHOLD}),
edges AS MATERIALIZED (SELECT left_id AS a, right_id AS b FROM p
          UNION SELECT right_id, left_id FROM p),
reach AS (
  SELECT a AS id, a AS r FROM edges
  UNION
  SELECT reach.id, edges.b FROM reach JOIN edges ON reach.r = edges.a
),
nonrep AS (SELECT id FROM reach GROUP BY id HAVING min(r) <> id)
SELECT d.doc_id,
       CASE WHEN d.rn > 1 THEN 'exact_dup'
            WHEN nr.id IS NOT NULL THEN 'near_dup'
            ELSE 'kept' END AS status
FROM d LEFT JOIN nonrep nr ON d.doc_id = nr.id
"""

ORACLE_SQL["doc_readability"] = r"""
WITH c AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(1 + len(regexp_extract_all(trim(text), '[.!?]\s+'))
              AS BIGINT) AS n_sent,
         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
              AS BIGINT) AS n_words,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
              AS BIGINT) AS n_syll
  FROM documents WHERE text IS NOT NULL)
SELECT doc_id, n_sent, n_words, n_syll,
       CASE WHEN n_words > 0 THEN round(
         206.835
         - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sent AS DOUBLE))
         - 84.6 * (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE)), 6)
       END AS flesch
FROM c
"""

ORACLE_SQL["doc_summary"] = r"""
WITH s AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(text), '([.!?])\s+',
                                     '\1' || chr(1), 'g'), chr(1)) AS sents
  FROM documents WHERE text IS NOT NULL),
e AS (
  SELECT doc_id, unnest(sents) AS sent,
         generate_subscripts(sents, 1) AS pos
  FROM s),
sc AS (
  SELECT doc_id, sent, pos,
         len(list_filter(regexp_extract_all(lower(sent), '[a-z0-9]+'),
                         w -> length(w) >= 5)) AS score
  FROM e),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, pos) AS rn
  FROM sc)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       string_agg(sent, ' ' ORDER BY pos) AS summary
FROM rk WHERE rn <= 2 GROUP BY doc_id
"""

ORACLE_SQL["events_moving"] = r"""
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS win_sum_c,
       CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS win_n
FROM events WHERE value IS NOT NULL
ORDER BY event_id
"""

ORACLE_SQL["events_corr"] = r"""
WITH b AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS x,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM b GROUP BY 1),
c AS (
  SELECT event_type, n,
         CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
         CAST(n * sxx - sx * sx AS BIGINT) AS varx_num,
         CAST(n * syy - sy * sy AS BIGINT) AS vary_num
  FROM s)
SELECT event_type, n, cov_num, varx_num, vary_num,
       CASE WHEN varx_num > 0 AND vary_num > 0
            THEN round(CAST(cov_num AS DOUBLE)
                       / sqrt(CAST(varx_num AS DOUBLE)
                              * CAST(vary_num AS DOUBLE)), 6)
       END AS r
FROM c ORDER BY event_type
"""

ORACLE_SQL["events_histogram"] = r"""
SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n
FROM events WHERE value IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLE_SQL["events_trend"] = r"""
WITH d AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1, 2),
s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(day) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(day * y) AS BIGINT) AS sxy,
         CAST(sum(day * day) AS BIGINT) AS sxx
  FROM d GROUP BY 1)
SELECT event_type,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den
FROM s ORDER BY event_type
"""

ORACLE_SQL["io_compact_roundtrip"] = r"""
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ids
FROM documents
"""

ORACLE_SQL["events_attribution"] = r"""
WITH w AS (
  SELECT event_id, ts, event_type,
         last_value(CASE WHEN event_type = 'click' THEN event_id END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS click_id,
         last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS click_ts
  FROM events WHERE ts IS NOT NULL)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(CASE WHEN click_ts IS NOT NULL
                  AND date_diff('microsecond', click_ts, ts)
                      <= CAST(7 AS BIGINT) * 24 * 3600 * 1000000
                 THEN click_id END AS BIGINT) AS attributed_event_id,
       CAST(CASE WHEN click_ts IS NOT NULL
                  AND date_diff('microsecond', click_ts, ts)
                      <= CAST(7 AS BIGINT) * 24 * 3600 * 1000000
                 THEN date_diff('microsecond', click_ts, ts) // 1000000
            END AS BIGINT) AS lag_s
FROM w
WHERE event_type = 'purchase'
ORDER BY event_id
"""

ORACLE_SQL["orders_reconcile"] = r"""
WITH ls AS (
  SELECT l_orderkey,
         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             * (1000 - CAST(floor(l_discount * 1000 + 0.5) AS BIGINT))
             * (1000 + CAST(floor(l_tax * 1000 + 0.5) AS BIGINT))) AS line_v
  FROM lineitem GROUP BY 1),
j AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 1000000 AS tot_v,
         line_v
  FROM orders LEFT JOIN ls ON o_orderkey = l_orderkey)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(coalesce(sum(CASE WHEN line_v IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_no_lines,
       CAST(coalesce(sum(CASE WHEN line_v = tot_v THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_match,
       CAST(coalesce(sum(CASE WHEN line_v IS NOT NULL AND line_v <> tot_v
                              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_mismatch,
       CAST(coalesce(max(CASE WHEN line_v IS NOT NULL
                              THEN abs(line_v - tot_v) END), 0)
            AS BIGINT) AS max_abs_diff
FROM j
"""

_PROFILE_HLL_COLS = ("o_orderkey", "o_custkey", "o_orderstatus",
                     "o_totalprice", "o_orderdate", "o_orderpriority")

ORACLE_SQL["table_profile_hll"] = rf"""
WITH tok AS ({" UNION ".join(
    f"SELECT DISTINCT '{c}' AS col, CAST({c} AS VARCHAR) AS t "
    f"FROM orders WHERE {c} IS NOT NULL" for c in _PROFILE_HLL_COLS)}),
th AS (SELECT col,
   list_reduce(list_prepend(CAST(7 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 31 + b) % 1000003) AS f1,
   list_reduce(list_prepend(CAST(11 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 37 + b) % 1000033) AS f2
 FROM tok),
z0 AS (SELECT col, ((CAST(f1 + f2 * 2147483648 AS HUGEINT) + {_HLL_C0})
               % 18446744073709551616) AS z FROM th),
z1 AS (SELECT col, {_hll_mulmod64('xor(z, z >> 30)', _HLL_C1)} AS z FROM z0),
z2 AS (SELECT col, {_hll_mulmod64('xor(z, z >> 27)', _HLL_C2)} AS z FROM z1),
mix AS (SELECT col, xor(z, z >> 31) AS x FROM z2),
reg AS (SELECT col, CAST(x // 72057594037927936 AS BIGINT) AS bucket,
               CAST(x % 72057594037927936 AS BIGINT) AS wv FROM mix),
rho AS (SELECT col, bucket,
               max(CASE WHEN wv = 0 THEN 57 ELSE 57 - len(bin(wv)) END) AS mj
        FROM reg GROUP BY col, bucket),
cols AS ({" UNION ALL ".join(
    f"SELECT '{c}' AS col" for c in _PROFILE_HLL_COLS)}),
st AS (SELECT cols.col, count(rho.bucket) AS n_present,
              coalesce(sum(CAST((1::BIGINT << (63 - mj)) AS HUGEINT)), 0) AS s_present,
              CAST(coalesce(sum(mj), 0) AS BIGINT) AS sum_rho
       FROM cols LEFT JOIN rho ON cols.col = rho.col GROUP BY cols.col),
fin AS (SELECT col, 256 - n_present AS n_zero_registers, sum_rho,
   s_present + CAST(256 - n_present AS HUGEINT) * (CAST(1::BIGINT << 62 AS HUGEINT) * 2) AS s
 FROM st),
fin2 AS (SELECT col, n_zero_registers, sum_rho,
   floor(CAST({_HLL_ALPHA!r} AS DOUBLE) * 65536.0 * 9223372036854775808.0
         / CAST(s AS DOUBLE) * 1e6 + 0.5) / 1e6 AS est_raw
 FROM fin)
SELECT col, CAST(256 AS BIGINT) AS m,
  CAST(n_zero_registers AS BIGINT) AS n_zero_registers,
  sum_rho, est_raw,
  CASE WHEN est_raw <= 640.0 AND n_zero_registers > 0
       THEN floor(256.0 * ln(256.0 / n_zero_registers) * 1e6 + 0.5) / 1e6
       ELSE est_raw END AS est_distinct
FROM fin2 ORDER BY col
"""


def _profile_arm(col: str) -> str:
    return f"""
  SELECT '{col}' AS col, count(*) AS n,
         count(*) - count({col}) AS n_null,
         count(DISTINCT {col}) AS n_distinct,
         CAST(min({col}) AS VARCHAR) AS min_str,
         CAST(max({col}) AS VARCHAR) AS max_str
  FROM orders"""


ORACLE_SQL["table_profile"] = (
    "SELECT col, CAST(n AS BIGINT) AS n, CAST(n_null AS BIGINT) AS n_null,\n"
    "       CAST(n_distinct AS BIGINT) AS n_distinct, min_str, max_str\n"
    "FROM (" + "\n  UNION ALL".join(_profile_arm(c) for c in (
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")) + ")\nORDER BY col"
)

ORACLE_SQL["q6_forecast"] = r"""
SELECT CAST(coalesce(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                         * CAST(floor(l_discount * 1000 + 0.5) AS BIGINT)), 0)
            AS BIGINT) AS rev_cpm,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND CAST(floor(l_discount * 1000 + 0.5) AS BIGINT) BETWEEN 50 AND 70
  AND l_quantity < 24
"""

ORACLE_SQL["q14_promo"] = r"""
SELECT CAST(coalesce(sum(CASE WHEN p_type = 'PROMO' THEN
              CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
              * (1000 - CAST(floor(l_discount * 1000 + 0.5) AS BIGINT))
            ELSE 0 END), 0) AS BIGINT) AS promo_cpm,
       CAST(coalesce(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
              * (1000 - CAST(floor(l_discount * 1000 + 0.5) AS BIGINT))), 0)
            AS BIGINT) AS total_cpm,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
"""

ORACLE_SQL["q15_top_supplier"] = r"""
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             * (1000 - CAST(floor(l_discount * 1000 + 0.5) AS BIGINT)))
           AS total_rev_cpm
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       CAST(total_rev_cpm AS BIGINT) AS total_rev_cpm
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_rev_cpm = (SELECT max(total_rev_cpm) FROM rev)
ORDER BY s_suppkey
"""

ORACLE_SQL["q8_market_share"] = r"""
WITH vol AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
         * (1000 - CAST(floor(l_discount * 1000 + 0.5) AS BIGINT)) AS v,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN part      ON p_partkey = l_partkey
  JOIN supplier  ON s_suppkey = l_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders    ON o_orderkey = l_orderkey
  JOIN customer  ON c_custkey = o_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region    ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01')
SELECT o_year,
       CAST(coalesce(sum(CASE WHEN supp_nation = 'NATION_7' THEN v
                              ELSE 0 END), 0) AS BIGINT) AS target_cpm,
       CAST(coalesce(sum(v), 0) AS BIGINT) AS total_cpm
FROM vol
GROUP BY o_year
ORDER BY o_year
"""

ORACLE_SQL["snapshot_diff"] = r"""
WITH a AS (SELECT o_orderkey AS k, o_totalprice AS p, o_orderpriority AS pr
           FROM orders),
b0 AS (SELECT k, CASE WHEN k % 2 = 1 THEN p + 1 ELSE p END AS p
       FROM a WHERE pr <> '1-URGENT'),
badd AS (SELECT k + 1000000000 AS k, p FROM a WHERE k % 97 = 0),
b AS (SELECT * FROM b0 UNION ALL SELECT * FROM badd),
j AS (
  SELECT CASE WHEN a2.k IS NULL THEN 'added'
              WHEN b.k IS NULL THEN 'removed'
              WHEN a2.p = b.p THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM (SELECT k, p FROM a) a2 FULL OUTER JOIN b ON a2.k = b.k)
SELECT status, CAST(count(*) AS BIGINT) AS n
FROM j GROUP BY 1 ORDER BY 1
"""

ORACLE_SQL["q11_value_concentration"] = r"""
WITH t AS (
  SELECT l_suppkey AS s_suppkey,
         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS val_c
  FROM lineitem GROUP BY 1),
g AS (SELECT sum(val_c) AS total_c FROM t)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, CAST(val_c AS BIGINT) AS val_c
FROM t, g
WHERE val_c * 1000 > total_c
ORDER BY s_suppkey
"""

ORACLE_SQL["q2_min_shipper"] = r"""
WITH t AS (
  SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
         sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS qty_c
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size = 15 AND r_name = 'EUROPE'
  GROUP BY 1, 2),
r AS (
  SELECT *, row_number() OVER (PARTITION BY p_partkey
                               ORDER BY qty_c, s_suppkey) AS rn
  FROM t)
SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
       CAST(r.s_suppkey AS BIGINT) AS s_suppkey, s_name,
       CAST(qty_c AS BIGINT) AS qty_c
FROM r JOIN supplier ON supplier.s_suppkey = r.s_suppkey
WHERE rn = 1
ORDER BY p_partkey
"""

ORACLE_SQL["fk_violations"] = r"""
SELECT fk, CAST(n_orphans AS BIGINT) AS n_orphans FROM (VALUES
  ('lineitem.l_orderkey->orders',
   (SELECT count(*) FROM lineitem
    WHERE l_orderkey IS NULL OR l_orderkey NOT IN
      (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL))),
  ('lineitem.l_partkey->part',
   (SELECT count(*) FROM lineitem
    WHERE l_partkey IS NULL OR l_partkey NOT IN
      (SELECT p_partkey FROM part WHERE p_partkey IS NOT NULL))),
  ('lineitem.l_suppkey->supplier',
   (SELECT count(*) FROM lineitem
    WHERE l_suppkey IS NULL OR l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_suppkey IS NOT NULL))),
  ('orders.o_custkey->customer',
   (SELECT count(*) FROM orders
    WHERE o_custkey IS NULL OR o_custkey NOT IN
      (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL)))
) AS t(fk, n_orphans)
ORDER BY fk
"""

ORACLE_SQL["events_markov"] = r"""
WITH s AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events)
SELECT event_type AS src_type, nxt AS dst_type,
       CAST(count(*) AS BIGINT) AS n_trans
FROM s WHERE nxt IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLE_SQL["rag_bm25_topk"] = r"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
  FROM documents),
md AS (
  SELECT doc_id, len(w) AS dl,
         len(list_filter(w, x -> x = 'data'))     AS tf0,
         len(list_filter(w, x -> x = 'pipeline')) AS tf1,
         len(list_filter(w, x -> x = 'value'))    AS tf2
  FROM tok),
st AS (
  SELECT count(*) AS n, sum(dl) / count(*) AS avgdl,
         sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
         sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
         sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
  FROM md),
sc AS (
  SELECT doc_id, round(
      ln(1 + (n - df0 + 0.5) / (df0 + 0.5))
        * tf0 * (1.2 + 1.0) / (tf0 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
    + ln(1 + (n - df1 + 0.5) / (df1 + 0.5))
        * tf1 * (1.2 + 1.0) / (tf1 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
    + ln(1 + (n - df2 + 0.5) / (df2 + 0.5))
        * tf2 * (1.2 + 1.0) / (tf2 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)),
      6) AS score
  FROM md, st)
SELECT CAST(doc_id AS BIGINT) AS doc_id, score
FROM sc ORDER BY score DESC, doc_id LIMIT 10
"""

def _bm25_rerank_sql() -> str:
    """Retrieve-then-rerank oracle: the rag_bm25_topk CTE chain widened
    to a 50-doc shortlist (same ordering contract), joined against the
    A4 model score replicated from the engine's own fitted weights (see
    _model_score_sql), reranked by (model_score DESC, doc_id)."""
    from ocr_ray.stages.model_engine import fit_artifact

    a = fit_artifact()
    w, b = a["w_int"], a["b_int"]
    shortlist = ORACLE_SQL["rag_bm25_topk"].replace("LIMIT 10", "LIMIT 50")
    return f"""
WITH top AS (SELECT * FROM ({shortlist}) _s),
f AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
  CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_space,
  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
  CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT) AS n_upper,
  CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS n_punct
  FROM documents),
ms AS (SELECT doc_id,
  CAST(({w[0]})*n_chars + ({w[1]})*n_alpha + ({w[2]})*n_space + ({w[3]})*n_digit
     + ({w[4]})*n_upper + ({w[5]})*n_punct + ({b})*n_chars AS BIGINT) AS model_score
  FROM f)
SELECT t.doc_id, t.score, ms.model_score,
       CAST(row_number() OVER (ORDER BY ms.model_score DESC, t.doc_id)
            AS BIGINT) AS rk
FROM top t JOIN ms ON t.doc_id = ms.doc_id
ORDER BY rk
"""


ORACLE_SQL["rag_bm25_rerank"] = _bm25_rerank_sql()

ORACLE_SQL["q12_ship_lag"] = r"""
SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 'high' ELSE 'low' END AS priority_class,
       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                     THEN 0 ELSE 1 END) AS BIGINT) AS ontime_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY 1 ORDER BY 1
"""

ORACLE_SQL["q16_supplier_cnt"] = r"""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 7, 10, 15, 19, 23, 36)
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""

ORACLE_SQL["q20_qualified_shippers"] = r"""
WITH a AS (
  SELECT l_suppkey,
         sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS qty_c
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY 1)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       CAST(qty_c AS BIGINT) AS qty_c
FROM a JOIN supplier ON s_suppkey = l_suppkey
WHERE qty_c > 10000
ORDER BY s_suppkey
"""

ORACLE_SQL["q21_late_supplier"] = r"""
WITH red AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS ship
  FROM lineitem GROUP BY 1, 2),
j AS (
  SELECT red.*, o_orderdate FROM red
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'),
per_order AS (
  SELECT l_orderkey, count(*) AS n_supp,
         sum(CASE WHEN ship > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS n_late,
         sum(CASE WHEN ship > o_orderdate + INTERVAL 60 DAY
                  THEN l_suppkey ELSE 0 END) AS late_sk
  FROM j GROUP BY 1)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       CAST(count(*) AS BIGINT) AS numwait
FROM per_order JOIN supplier ON s_suppkey = late_sk
WHERE n_supp > 1 AND n_late = 1
GROUP BY 1, 2 ORDER BY 1
"""

ORACLE_SQL["q22_lost_customers"] = r"""
WITH c AS (
  SELECT c_custkey, c_nationkey,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
  FROM customer),
s AS (
  SELECT sum(CASE WHEN bal_c > 0 THEN bal_c ELSE 0 END) AS sum_c,
         sum(CASE WHEN bal_c > 0 THEN 1 ELSE 0 END) AS n_pos
  FROM c),
rich AS (SELECT c.* FROM c, s WHERE bal_c * n_pos > sum_c),
lost AS (
  SELECT * FROM rich
  WHERE c_custkey NOT IN (
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-01-01'))
SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(bal_c) AS BIGINT) AS bal_c
FROM lost JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1 ORDER BY 1
"""

ORACLE_SQL["q9_profit"] = r"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (1000 - CAST(floor(l_discount * 1000 + 0.5) AS BIGINT)))
            AS BIGINT) AS profit_cpm
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_name LIKE '%gear%'
GROUP BY 1, 2
ORDER BY 1, 2
"""

ORACLE_SQL["q19_brand_qty"] = r"""
SELECT CAST(coalesce(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
              * (1000 - CAST(floor(l_discount * 1000 + 0.5) AS BIGINT))), 0)
            AS BIGINT) AS rev_cpm,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""
