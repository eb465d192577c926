"""Distributed inverted index (term -> postings list) over the document
corpus, and conjunctive (AND) retrieval through it.

The reference's retrieval tier answers keyword queries by scanning every
chunk per query (``src/rag_module.py`` keyword scoring); at corpus scale
the standard fix is a term-partitioned inverted index built once and
probed per query.  Shape (all 100-TB-safe):

1. tokenize per batch into ``(term, doc_id, tf)`` partial postings — the
   per-doc ``Counter`` dedups within a doc, so the exchange payload is
   bounded by distinct-terms-per-doc, not token occurrences;
2. hash-exchange on ``term`` (streaming raw-task exchange, no sort);
3. one combine task per partition materializes each term's postings list
   (doc ids ascending), document frequency and total term frequency.

Stop-word-like terms can be dropped with an exact integer ``max-df``
gate (pass ``max_df`` — the gate is ``2*df <= max_df``, OFF by default):
their postings lists are the skewed giants that blow up a partition at
scale, and conjunctive retrieval never needs them.  Callers typically
pass ``max_df = n_docs`` from the corpus doc count in parquet metadata
(``Dataset.count()`` on a plain read is metadata-only — no data read).

Lookup: a conjunctive query probes only its terms' postings rows (an
expression filter the scan can push down when the index is written
term-partitioned) and intersects k small sorted id lists on the driver —
O(sum postings of the query terms), independent of corpus size.
"""

from __future__ import annotations

from collections import Counter
from typing import List, Optional

import pandas as pd

import ray.data as rd

from ocr_ray.stages.join import exchange_map_partitions

import re

_TERM = re.compile(r"[a-z0-9]+")


def build_postings(
    ds: "rd.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_partitions: "int | None" = None,
    max_df: Optional[int] = None,
) -> "rd.Dataset":
    """Inverted index: one row per surviving term with ``df`` (document
    frequency), ``tf_total`` (corpus occurrences) and ``postings`` (comma
    string of doc ids ascending).  Terms with ``2*df > max_df_base`` are
    dropped when ``max_df`` is given (pass ``2*max_df_allowed`` semantics:
    the gate is ``2*df <= max_df`` so it stays integer-exact).

    ``max_df=None`` fires a plan-time RuntimeWarning: without the gate a
    stop-word's postings row is O(corpus) — one comma-joined string that
    :func:`conjunctive_lookup` later fetches WHOLE onto the driver.
    Fine at test scale, a driver OOM at 100 TB; the warning names the
    fix so the unbounded build stays available for small/oracle use."""
    if max_df is None:
        import warnings

        warnings.warn(
            "build_postings: max_df is None — postings rows are "
            "unbounded (a stop-word term carries one comma-joined id "
            "string spanning the whole corpus, and conjunctive_lookup "
            "fetches matching rows onto the driver). Pass "
            "max_df=2*max_allowed_df to bound rows before building an "
            "index a lookup will probe at scale.",
            RuntimeWarning, stacklevel=2)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        terms: List[str] = []
        ids: List[int] = []
        tfs: List[int] = []
        for did, t in zip(b[id_col], b[text_col]):
            c = Counter(_TERM.findall(t.lower()))
            terms.extend(c.keys())
            ids.extend([did] * len(c))
            tfs.extend(c.values())
        return pd.DataFrame(
            {
                "term": pd.Series(terms, dtype="object"),
                id_col: pd.Series(ids, dtype="int64"),
                "tf": pd.Series(tfs, dtype="int64"),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "term" not in g.columns:
            # all-empty exchange input carries the pre-map schema
            return pd.DataFrame({"term": pd.Series(dtype="object"),
                                 "df": pd.Series(dtype="int64"),
                                 "tf_total": pd.Series(dtype="int64"),
                                 "postings": pd.Series(dtype="object")})
        g = g.sort_values(["term", id_col])
        ids_str = g[id_col].astype(str)
        out = (
            g.groupby("term", sort=False)
            .agg(
                df=(id_col, "size"),
                tf_total=("tf", "sum"),
            )
            .reset_index()
        )
        out["postings"] = (
            ids_str.groupby(g["term"].to_numpy(), sort=False)
            .agg(",".join)
            .to_numpy()
        )
        if max_df is not None:
            out = out[2 * out["df"] <= max_df]
        return out[["term", "df", "tf_total", "postings"]].astype(
            {"df": "int64", "tf_total": "int64"}
        )

    return exchange_map_partitions(
        ds.map_batches(partial, batch_format="pandas"),
        ["term"], combine, n_partitions,
    )


def conjunctive_lookup(postings: "rd.Dataset", terms: List[str]) -> List[int]:
    """AND retrieval: doc ids containing every query term, ascending.

    Probes only the query terms' rows (expression filter — pushes to the
    scan when the index is parquet-backed) and intersects the k sorted id
    lists driver-side; the result and every intermediate are bounded by
    the smallest postings list, never the corpus.
    """
    if not terms:
        return []  # empty AND over no terms: defined as no results
    # lowercase first — build_postings indexed lowercased text, so
    # 'Paris' must find 'paris' (case is normalization, not identity).
    # Punctuated/multi-token query terms stay rejected: indexed terms
    # are [a-z0-9]+ by construction — anything else cannot exist in the
    # index, and quoting it into the (Python-expression) filter would be
    # fragile ('' doubling is SQL, not Python)
    terms = [t.lower() for t in terms]
    if any(not t.isascii() or not t.isalnum() or t != t.lower()
           for t in terms):
        return []
    quoted = ", ".join("'" + t + "'" for t in terms)
    rows = postings.filter(expr=f"term in [{quoted}]").select_columns(
        ["term", "postings"]
    ).take_all()
    fetched = sum(len(r["postings"]) for r in rows)
    if fetched > 256 << 20:
        import warnings

        warnings.warn(
            f"conjunctive_lookup: fetched {fetched >> 20} MiB of "
            f"postings onto the driver for {len(rows)} term(s) — a "
            f"query term is near-stop-word frequency. Build the index "
            f"with max_df to keep lookups driver-bounded.",
            RuntimeWarning, stacklevel=2)
    by_term = {r["term"]: r["postings"] for r in rows}
    if len(by_term) < len(set(terms)):
        return []  # some term absent (or max-df-pruned) -> empty AND
    sets = sorted(
        (set(map(int, p.split(","))) for p in by_term.values()), key=len
    )
    acc = sets[0]
    for s in sets[1:]:
        acc &= s
        if not acc:
            break
    return sorted(acc)
