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

# driver-fetch budget for conjunctive_lookup's postings rows; the guard
# raises BEFORE take_all so a near-stop-word term cannot OOM the driver
LOOKUP_FETCH_CAP_BYTES = 256 << 20


def build_postings(
    ds: "rd.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_partitions: "int | None" = None,
    max_df: Optional[int] = None,
    warn_unbounded: bool = True,
) -> "rd.Dataset":
    """Inverted index: one row per surviving term with ``df`` (document
    frequency), ``tf_total`` (corpus occurrences) and ``postings`` (comma
    string of doc ids ascending).  Terms with ``2*df > max_df_base`` are
    dropped when ``max_df`` is given (pass ``2*max_df_allowed`` semantics:
    the gate is ``2*df <= max_df`` so it stays integer-exact).

    ``max_df=None`` fires a plan-time RuntimeWarning: without the gate a
    stop-word's postings row is O(corpus) — one comma-joined string that
    :func:`conjunctive_lookup` later fetches onto the driver.  Fine at
    test scale, a driver OOM at 100 TB; the warning names the fix so
    the unbounded build stays available for small/oracle use.  Callers
    that disable the gate DELIBERATELY (e.g. the oracle query surface,
    where any useful gate would empty the small test tables)
    acknowledge with ``warn_unbounded=False`` instead of suppressing
    the category globally."""
    if max_df is None and warn_unbounded:
        import warnings

        warnings.warn(
            "build_postings: max_df is None — postings rows are "
            "unbounded (a stop-word term carries one comma-joined id "
            "string spanning the whole corpus, and conjunctive_lookup "
            "fetches matching rows onto the driver). Pass "
            "max_df=2*max_allowed_df to bound rows before building an "
            "index a lookup will probe at scale, or acknowledge with "
            "warn_unbounded=False.",
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
    probe = postings.filter(expr=f"term in [{quoted}]").select_columns(
        ["term", "postings"]
    ).materialize()  # probed twice: size pre-pass, then the row fetch
    # size the fetch BEFORE pulling strings to the driver: a near-stop-
    # word term's postings row is O(corpus), and a post-hoc check would
    # run only after take_all() already OOMed the driver.  Only the
    # per-batch byte totals (one int per block) leave the workers here.
    import pyarrow as pa
    import pyarrow.compute as pc

    def batch_bytes(t: "pa.Table") -> "pa.Table":
        if "postings" not in t.schema.names or not t.num_rows:
            return pa.table({"nb": pa.array([0], pa.int64())})
        nb = pc.sum(pc.binary_length(t.column("postings"))).as_py() or 0
        return pa.table({"nb": pa.array([int(nb)], pa.int64())})

    fetched = int(probe.map_batches(batch_bytes,
                                    batch_format="pyarrow").sum("nb") or 0)
    if fetched > LOOKUP_FETCH_CAP_BYTES:
        raise RuntimeError(
            f"conjunctive_lookup: the query terms' postings total "
            f"{fetched >> 20} MiB — a term is near-stop-word frequency "
            f"and fetching it would risk a driver OOM. Build the index "
            f"with max_df to keep lookups driver-bounded.")
    rows = probe.take_all()
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
