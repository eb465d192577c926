"""Iterative PageRank over a weighted edge table — the broadcast-rank
pattern for link analysis at corpus scale.

Web-curation pipelines rank DOMAINS by the crawl's link graph (the
harmonic-centrality / PageRank quality prior of Common Crawl derivatives
such as RefinedWeb, arXiv:2306.01116) and feed the score back into
document selection.  The graph shape at 100 TB: EDGES are huge (one row
per link, must stream), NODES are merely large (millions of domains — a
few hundred MB of ranks, fits the object store and every worker's heap).
That asymmetry picks the architecture:

  * the edge table stays a Dataset and is SCANNED once per iteration
    (``map_batches`` computing per-edge contributions, reduced by the
    bounded hash exchange on ``dst``);
  * the rank vector lives driver-side between iterations and is
    broadcast once per iteration via ``ray.put`` — never re-shipped per
    batch, never joined through a shuffle.

Integer-exact iteration (the repo's oracle discipline): ranks are ppm of
total mass, ``pr0 = 1_000_000 // N``; each edge contributes ``pr[src] *
w // out_w[src]`` (int64 — pr <= 1e6 so the product is safe to ~9e12
edge weight); the update is ``pr' = (150_000_000 // N + 85 * sum) //
100`` — damping 0.85 and teleport 0.15/N in exact integer form, sums
order-insensitive, so the result is bit-identical across partitionings
and replicable in chained SQL CTEs for a fixed iteration count.
Dangling-node mass (nodes with no out-edges) is dropped rather than
redistributed — the standard simplification; totals decay accordingly.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd

_PPM = 1_000_000


def pagerank(
    edges: "object",
    iters: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
    n_partitions: int = 16,
) -> pd.DataFrame:
    """Run ``iters`` exact-integer PageRank steps over an aggregated
    weighted edge Dataset; returns the small node table ``(node, out_w,
    pr_ppm)``.  ``edges`` is scanned ``iters + 1`` times (out-weights +
    one per iteration) — at 100 TB persist the aggregated edge table to
    parquet first so re-scans hit columnar storage, not recomputation."""
    import ray

    from ocr_ray.stages.aggregate import hash_aggregate

    # out-weights and the node universe: per-group sums exchange-reduced,
    # then collected — bounded by #nodes (the small side), not #edges
    ow = hash_aggregate(
        edges.map_batches(
            lambda b: pd.DataFrame({"node": b[src_col].to_numpy(dtype="int64"),
                                    "ow": b[w_col].to_numpy(dtype="int64")}),
            batch_format="pandas"),
        keys=["node"], aggs={"ow": "sum"}, n_partitions=n_partitions,
    ).to_pandas()
    dsts = hash_aggregate(
        edges.map_batches(
            lambda b: pd.DataFrame({"node": b[dst_col].to_numpy(dtype="int64"),
                                    "c": np.int64(1)}),
            batch_format="pandas"),
        keys=["node"], aggs={"c": "sum"}, n_partitions=n_partitions,
    ).to_pandas()

    nodes = np.union1d(ow["node"].to_numpy(dtype="int64"),
                       dsts["node"].to_numpy(dtype="int64"))
    n = len(nodes)
    out_w: Dict[int, int] = dict(zip(ow["node"].astype("int64"),
                                     ow["ow"].astype("int64")))
    pr: Dict[int, int] = {int(v): _PPM // n for v in nodes}
    tele = 150 * _PPM // n

    for _ in range(iters):
        pr_ref = ray.put(pr)
        ow_ref = ray.put(out_w)

        def contribs(b: pd.DataFrame) -> pd.DataFrame:
            pr_, ow_ = ray.get(pr_ref), ray.get(ow_ref)
            src = b[src_col].to_numpy(dtype="int64")
            p = np.fromiter((pr_[int(s)] for s in src), dtype=np.int64,
                            count=len(src))
            o = np.fromiter((ow_[int(s)] for s in src), dtype=np.int64,
                            count=len(src))
            return pd.DataFrame(
                {"node": b[dst_col].to_numpy(dtype="int64"),
                 "s": p * b[w_col].to_numpy(dtype="int64") // o})

        sums = hash_aggregate(
            edges.map_batches(contribs, batch_format="pandas"),
            keys=["node"], aggs={"s": "sum"}, n_partitions=n_partitions,
        ).to_pandas()
        s = dict(zip(sums["node"].astype("int64"), sums["s"].astype("int64")))
        pr = {int(v): (tele + 85 * s.get(int(v), 0)) // 100 for v in nodes}

    return pd.DataFrame({
        "node": nodes.astype("int64"),
        "out_w": np.asarray([out_w.get(int(v), 0) for v in nodes],
                            dtype="int64"),
        "pr_ppm": np.asarray([pr[int(v)] for v in nodes], dtype="int64"),
    })
