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
edge weight); the update is ``pr' = (15_000_000 // N + 85 * sum) //
100`` — damping 0.85 and teleport 0.15/N in exact integer form, sums
order-insensitive, so the result is bit-identical across partitionings
and replicable in chained SQL CTEs for a fixed iteration count.
Dangling-node mass (nodes with no out-edges) is dropped rather than
redistributed — the standard simplification; totals decay accordingly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_PPM = 1_000_000


def pagerank(
    edges: "object",
    iters: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
    n_partitions: "int | None" = None,
) -> pd.DataFrame:
    """Run ``iters`` exact-integer PageRank steps over an aggregated
    weighted edge Dataset; returns the small node table ``(node, out_w,
    pr_ppm)``.  ``edges`` is scanned ``iters + 1`` times (ONE setup pass
    for out-weights + node universe, then one per iteration) — at 100 TB
    persist the aggregated edge table to parquet first so re-scans hit
    columnar storage, not recomputation."""
    import ray

    from ocr_ray.stages.aggregate import hash_aggregate

    # out-weights and the node universe in ONE edge pass: each edge
    # contributes (src, w) and (dst, 0); the exchange payload stays
    # bounded by #nodes (the small side), not #edges
    def node_partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": np.concatenate([b[src_col].to_numpy(dtype="int64"),
                                    b[dst_col].to_numpy(dtype="int64")]),
            "ow": np.concatenate([b[w_col].to_numpy(dtype="int64"),
                                  np.zeros(len(b), dtype="int64")]),
        })

    stats = hash_aggregate(
        edges.map_batches(node_partial, batch_format="pandas"),
        keys=["node"], aggs={"ow": "sum"}, n_partitions=n_partitions,
    ).to_pandas()

    if not len(stats) or "node" not in stats.columns:
        # empty edge table (and Ray's to_pandas drops columns on all-empty
        # Datasets): empty rank table, not a KeyError/ZeroDivisionError
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "out_w": pd.Series(dtype="int64"),
                             "pr_ppm": pd.Series(dtype="int64")})
    nodes = np.sort(stats["node"].to_numpy(dtype="int64"))  # stable output order
    n = len(nodes)
    # rank/out-weight state as arrays ALIGNED to the sorted node vector:
    # the per-edge lookup in contribs is then one vectorized searchsorted
    # over the broadcast arrays — the edge table is the huge side at
    # scale, so a per-edge Python dict lookup there is a hot-path loop
    ow_arr = np.zeros(n, dtype=np.int64)
    sidx = np.searchsorted(nodes, stats["node"].to_numpy(dtype="int64"))
    ow_arr[sidx] = stats["ow"].to_numpy(dtype="int64")
    pr_arr = np.full(n, _PPM // n, dtype=np.int64)
    # 0.15/N teleport in ppm: 0.15 * _PPM // n, folded with the final
    # //100 as 15 * _PPM // n (a 150x constant here would inflate rank
    # mass ~2.35x per iteration — caught in review round 3)
    tele = 15 * _PPM // n

    for _ in range(iters):
        state_ref = ray.put((nodes, pr_arr, ow_arr))

        def contribs(b: pd.DataFrame, _ref=state_ref) -> pd.DataFrame:
            nodes_, pr_, ow_ = ray.get(_ref)
            src = b[src_col].to_numpy(dtype="int64")
            idx = np.searchsorted(nodes_, src)  # every src is in nodes
            p = pr_[idx]
            # a src with zero total out-weight (all its edges w=0) carries
            # no mass — skip its edges instead of dividing by zero
            o = ow_[idx]
            live = o > 0
            return pd.DataFrame(
                {"node": b[dst_col].to_numpy(dtype="int64")[live],
                 "s": (p[live] * b[w_col].to_numpy(dtype="int64")[live]
                       // o[live])})

        sums = hash_aggregate(
            edges.map_batches(contribs, batch_format="pandas"),
            keys=["node"], aggs={"s": "sum"}, n_partitions=n_partitions,
        ).to_pandas()
        s_arr = np.zeros(n, dtype=np.int64)
        if "node" in sums.columns and len(sums):
            # (all-zero-weight edge tables emit no contrib rows and
            # to_pandas drops columns — ranks are then teleport-only)
            s_arr[np.searchsorted(nodes, sums["node"].to_numpy(dtype="int64"))] = \
                sums["s"].to_numpy(dtype="int64")
        pr_arr = (tele + 85 * s_arr) // 100

    return pd.DataFrame({
        "node": nodes.astype("int64"),
        "out_w": ow_arr,
        "pr_ppm": pr_arr,
    })


def triangle_counts(
    edges: "object",
    src_col: str = "src",
    dst_col: str = "dst",
    n_partitions: "int | None" = None,
) -> "object":
    """Exact per-node triangle counts via the degree-oriented node
    iterator (the classic MapReduce algorithm, Suri & Vassilvitskii
    WWW'11): orient every undirected edge from its lower-(degree, id)
    endpoint to the higher one, generate wedges only among each node's
    OUT-neighbours (out-degree is O(sqrt(m)) under this orientation, so
    wedge volume is bounded at sum C(outdeg, 2) ~ m^1.5 instead of the
    hub-quadratic naive count), then close wedges against the oriented
    edge set with one hash-partitioned join.  Every stage is a bounded
    exchange; no node's full neighbourhood ever lands on the driver.

    Returns a Dataset ``(node, n_triangles)`` — nodes in no triangle are
    absent (inner-join semantics, matching the SQL oracle)."""
    import ray.data as rd

    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_join, exchange_map_partitions

    # 1. distinct undirected edges (a < b), self-loops dropped
    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        s = b[src_col].to_numpy(dtype="int64")
        d = b[dst_col].to_numpy(dtype="int64")
        keep = s != d
        s, d = s[keep], d[keep]
        return pd.DataFrame(
            {"a": np.minimum(s, d), "b": np.maximum(s, d), "c": np.int64(1)}
        )

    und = hash_aggregate(
        edges.map_batches(undirect, batch_format="pandas"),
        keys=["a", "b"], aggs={"c": "sum"}, n_partitions=n_partitions,
    ).drop_columns(["c"])

    # 2. degrees (bounded by |V|), joined back onto both endpoints
    def explode_nodes(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": np.concatenate(
                    [b["a"].to_numpy(dtype="int64"), b["b"].to_numpy(dtype="int64")]
                ),
                "deg": np.int64(1),
            }
        )

    deg = hash_aggregate(
        und.map_batches(explode_nodes, batch_format="pandas"),
        keys=["node"], aggs={"deg": "sum"}, n_partitions=n_partitions,
    )
    da = exchange_join(und, deg, on="a", right_on="node",
                       n_partitions=n_partitions).map_batches(
        lambda b: b.rename(columns={"deg": "deg_a"}), batch_format="pandas")
    dab = exchange_join(da, deg, on="b", right_on="node",
                        n_partitions=n_partitions).map_batches(
        lambda b: b.rename(columns={"deg": "deg_b"}), batch_format="pandas")

    # 3. orient by (degree, id): u -> v with (deg_u, u) < (deg_v, v)
    def orient(b: pd.DataFrame) -> pd.DataFrame:
        a = b["a"].to_numpy(dtype="int64")
        bb = b["b"].to_numpy(dtype="int64")
        pa = np.stack([b["deg_a"].to_numpy(dtype="int64"), a], axis=1)
        pb = np.stack([b["deg_b"].to_numpy(dtype="int64"), bb], axis=1)
        a_first = (pa[:, 0] < pb[:, 0]) | (
            (pa[:, 0] == pb[:, 0]) & (pa[:, 1] < pb[:, 1])
        )
        u = np.where(a_first, a, bb)
        v = np.where(a_first, bb, a)
        dv = np.where(a_first, pb[:, 0], pa[:, 0])
        return pd.DataFrame({"u": u, "v": v, "deg_v": dv})

    # two consumers (the wedge exchange below and tagged_e) — materialize
    # once, per launch_splits' single-consumer contract: a lazy `oriented`
    # would re-run the join/orient stages over the full edge table twice
    oriented = dab.map_batches(orient, batch_format="pandas").materialize()

    # 4. wedges among each node's out-neighbours, pair ordered by the
    # same (degree, id) total order so it aligns with edge orientation
    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {"wx": pd.Series([], dtype="int64"),
                 "wy": pd.Series([], dtype="int64"),
                 "apex": pd.Series([], dtype="int64")}
            )
        g = g.sort_values(["u", "deg_v", "v"])
        u = g["u"].to_numpy(dtype="int64")
        v = g["v"].to_numpy(dtype="int64")
        starts = np.r_[0, np.flatnonzero(u[1:] != u[:-1]) + 1, len(u)]
        xs, ys, ap = [], [], []
        for s0, s1 in zip(starts[:-1], starts[1:]):
            k = s1 - s0
            if k < 2:
                continue
            i, j = np.triu_indices(k, k=1)
            nb = v[s0:s1]  # already in (deg, id) order
            xs.append(nb[i])
            ys.append(nb[j])
            ap.append(np.full(len(i), u[s0], dtype="int64"))
        if not xs:
            return pd.DataFrame(
                {"wx": pd.Series([], dtype="int64"),
                 "wy": pd.Series([], dtype="int64"),
                 "apex": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {"wx": np.concatenate(xs), "wy": np.concatenate(ys),
             "apex": np.concatenate(ap)}
        )

    wedge_ds = exchange_map_partitions(oriented, "u", wedges, n_partitions)

    # 5. close wedges against oriented edges: hash-partitioned join on
    # the (x, y) pair; each match is one triangle (apex, x, y)
    def close(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "_side" not in g.columns:
            # all-empty exchange input carries the pre-map schema
            return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                 "n_triangles": pd.Series([], dtype="int64")})
        w = g[g["_side"] == 0]
        e = g[g["_side"] == 1]
        hit = w.merge(e[["wx", "wy"]], on=["wx", "wy"], how="inner")
        if not len(hit):
            return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                 "n_triangles": pd.Series([], dtype="int64")})
        nodes = np.concatenate(
            [hit["apex"].to_numpy(dtype="int64"),
             hit["wx"].to_numpy(dtype="int64"),
             hit["wy"].to_numpy(dtype="int64")]
        )
        return pd.DataFrame({"node": nodes, "n_triangles": np.int64(1)})

    tagged_w = wedge_ds.map_batches(
        lambda b: b.assign(_side=np.int64(0)), batch_format="pandas")
    tagged_e = oriented.map_batches(
        lambda b: pd.DataFrame(
            {"wx": b["u"].to_numpy(dtype="int64"),
             "wy": b["v"].to_numpy(dtype="int64"),
             "apex": np.int64(-1), "_side": np.int64(1)}),
        batch_format="pandas")
    both = tagged_w.union(tagged_e)
    tri_nodes = exchange_map_partitions(both, ["wx", "wy"], close, n_partitions)
    return hash_aggregate(
        tri_nodes, keys=["node"], aggs={"n_triangles": "sum"},
        n_partitions=n_partitions,
    )
