"""Distributed k-means over embedding columns — the SemDeDup /
cluster-balance curation primitive (cluster the corpus's embeddings,
then sample/dedup within clusters).

Classic float Lloyd iterations are NOT reproducible across cluster
layouts: centroid sums accumulate in block order, so two runs with
different partitioning drift by ulps and flip boundary assignments.
This stage runs Lloyd in EXACT INTEGER arithmetic instead:

  * quantize: ``x = floor(v * 2^20 + 0.5) + 2^22`` per dimension (the
    repo's floor-round idiom, then a constant shift that keeps every
    value positive — squared distances are shift-invariant, and
    positivity makes integer division identical between numpy floor-div
    and DuckDB's truncating ``//``);
  * assign: exact int64 squared L2 to each centroid, ties to the lowest
    cluster id (``np.argmin``'s first-hit == the oracle's ``ORDER BY
    dist, cid``);
  * update: per-cluster per-dim int64 sums (order-insensitive!) via one
    bounded exchange on the cluster id — k*d partial rows per block,
    k*d total to the driver — then ``centroid = sum // n``.

Every iteration is bit-identical across partitionings, actor counts and
engines, so the full T-iteration trajectory (not just one step) is
value-checked by the DuckDB oracle.  Seeds are the vectors with ids
0..k-1 — a dense-0-based id contract enforced with a loud error
(deterministic; swap for k-means|| at scale).  Empty clusters keep
their previous centroid.

Scale: assignment is a pure ``map_batches`` against ``ray.put``
centroids (k*d ints broadcast once per iteration); the update exchange
moves k*d*n_blocks integer rows.  Driver state: one (k, d) int64 array.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd

QUANT = 1 << 20
SHIFT = 1 << 22


def quantize_embeddings(embs: np.ndarray) -> np.ndarray:
    """(n, d) float -> exact int64 fixed-point, shifted positive."""
    return (np.floor(embs.astype(np.float64) * QUANT + 0.5)
            .astype(np.int64) + SHIFT)


def _assign(x: np.ndarray, cents: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Exact int64 squared-L2 assignment; ties -> lowest cluster id.

    Gram form ``|x|^2 + |c|^2 - 2 x·c`` instead of materializing the
    (batch, k, d) difference tensor (a d-fold memory blowup per map
    task — 2 GB at batch 4096, k=d=256, vs ~16 MB here).  Every term is
    exact in int64: quantized entries are < 2^23, so each dot product
    is < d * 2^46 — the same bound argument as mark_dups below — and
    the exact integer distances make argmin bit-identical to the
    difference form, ties still resolving to the lowest cluster id."""
    xx = np.einsum("bd,bd->b", x, x)
    cc = np.einsum("kd,kd->k", cents, cents)
    dist = xx[:, None] + cc[None, :] - 2 * (x @ cents.T)
    a = dist.argmin(axis=1)
    return a, dist[np.arange(len(x)), a]


class _Quantizer:
    def __init__(self, embed_col: str):
        self.embed_col = embed_col

    def batch_matrix(self, batch: pd.DataFrame) -> np.ndarray:
        return quantize_embeddings(np.stack(batch[self.embed_col].to_numpy()))


def kmeans_centroids(
    ds: "object",
    k: int = 8,
    iters: int = 2,
    embed_col: str = "embedding",
    id_col: str = "vec_id",
    n_partitions: "int | None" = None,
) -> np.ndarray:
    """The Lloyd loop alone: returns the final (k, d) int64 centroid
    array after ``iters`` exact-integer updates (see module docstring
    for the arithmetic contract)."""
    import ray

    from ocr_ray.stages.join import exchange_map_partitions

    q = _Quantizer(embed_col)

    # Seed contract: the k vectors with ids 0..k-1 (mirrored verbatim by
    # the DuckDB oracle's `WHERE vid < k`, whose cluster labels ARE the
    # seed ids).  Non-dense / non-0-based id spaces would silently seed
    # fewer than k clusters (or crash on an empty stack) — fail loudly.
    seeds = ds.filter(expr=f"{id_col} < {k}").to_pandas()
    # to_pandas() on an all-empty Dataset drops columns — check length
    # BEFORE sorting so the no-seed case hits the contract error below
    if len(seeds) >= k:
        seeds = seeds.sort_values(id_col)
    # exact contract: k rows, k DISTINCT ids (duplicate ids below k would
    # silently seed two clusters identically, or overflow the (k, dim)
    # accumulator with an IndexError deep in a worker)
    if len(seeds) != k or seeds[id_col].nunique() != k:
        raise ValueError(
            f"kmeans seeding found {len(seeds)} rows "
            f"({seeds[id_col].nunique() if len(seeds) else 0} distinct) "
            f"with {id_col} < {k}; the seed contract requires exactly the "
            f"dense 0-based ids 0..{k - 1} — remap ids (e.g. value_rank) "
            f"before clustering")
    cents = quantize_embeddings(np.stack(seeds[embed_col].to_numpy()))
    dim = cents.shape[1]

    for _ in range(iters):
        c_ref = ray.put(cents)

        def partials(batch: pd.DataFrame, _c_ref=c_ref) -> pd.DataFrame:
            c = ray.get(_c_ref)
            x = q.batch_matrix(batch)
            a, _ = _assign(x, c)
            acc = np.zeros((k, dim), dtype=np.int64)
            np.add.at(acc, a, x)
            n = np.bincount(a, minlength=k).astype(np.int64)
            present = np.flatnonzero(n)
            return pd.DataFrame({
                "cid": np.repeat(present, dim),
                "i": np.tile(np.arange(dim, dtype=np.int64), present.size),
                "s": acc[present].ravel(),
                "n": np.repeat(n[present], dim),
            })

        def reduce_sums(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby(["cid", "i"], as_index=False).agg(
                s=("s", "sum"), n=("n", "sum"))

        red = exchange_map_partitions(
            ds.map_batches(partials, batch_format="pandas"),
            "cid", reduce_sums, n_partitions=n_partitions,
        ).to_pandas()  # <= k*d rows

        new_cents = cents.copy()  # empty clusters keep their centroid
        for cid, grp in red.groupby("cid"):
            grp = grp.sort_values("i")
            new_cents[int(cid)] = (grp["s"].to_numpy(dtype="int64")
                                   // grp["n"].to_numpy(dtype="int64"))
        cents = new_cents

    return cents


def kmeans_embeddings(
    ds: "object",
    k: int = 8,
    iters: int = 2,
    embed_col: str = "embedding",
    id_col: str = "vec_id",
    n_partitions: "int | None" = None,
) -> "object":
    """T exact-integer Lloyd iterations; returns (id, cluster, dist)
    where ``dist`` is the exact int64 squared fixed-point distance to
    the final centroid.  Input is scanned iters+2 times (seed pick,
    iters updates, final assignment) — at 100 TB run the iterations on
    a uniform sample and only the final assignment over the full data."""
    import ray

    q = _Quantizer(embed_col)
    cents = kmeans_centroids(ds, k=k, iters=iters, embed_col=embed_col,
                             id_col=id_col, n_partitions=n_partitions)
    c_ref = ray.put(cents)

    def final_assign(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(c_ref)
        x = q.batch_matrix(batch)
        a, dist = _assign(x, c)
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(dtype="int64"),
            "cluster": a.astype(np.int64),
            "dist": dist.astype(np.int64),
        })

    return ds.map_batches(final_assign, batch_format="pandas")


def semantic_dedup(
    ds: "object",
    k: int = 8,
    iters: int = 2,
    dist_threshold: int = 1_300_000_000_000,
    embed_col: str = "embedding",
    id_col: str = "vec_id",
    n_partitions: "int | None" = None,
) -> "object":
    """SemDeDup: cluster the embedding space, then mark every vector
    that sits within ``dist_threshold`` (exact int64 squared fixed-point
    L2) of a LOWER-ID member of its own cluster as a semantic duplicate.
    Clustering bounds the candidate set — pairwise work is per-cluster,
    never corpus-wide (the entire point of SemDeDup at 100 TB; raise k
    so the largest cluster's pairwise block fits a worker, and salt or
    re-cluster hot cells if the embedding space collapses).

    One exchange on the cluster id co-locates each cluster's quantized
    vectors; the per-partition kernel is a vectorized (m, m) integer
    distance block with a lower-triangle any() — no driver state.
    Same arithmetic contract as :func:`kmeans_embeddings`, so the full
    pipeline (trajectory + dup flags) is value-checked in SQL."""
    import ray

    from ocr_ray.stages.join import exchange_map_partitions

    q = _Quantizer(embed_col)
    cents = kmeans_centroids(ds, k=k, iters=iters, embed_col=embed_col,
                             id_col=id_col, n_partitions=n_partitions)
    c_ref = ray.put(cents)

    def assign_with_vec(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(c_ref)
        x = q.batch_matrix(batch)
        a, _ = _assign(x, c)
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(dtype="int64"),
            "cluster": a.astype(np.int64),
            "x": list(x),
        })

    def mark_dups(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for cid, grp in g.groupby("cluster"):
            grp = grp.sort_values(id_col)
            x = np.stack(grp["x"].to_numpy())
            # gram identity |xi-xj|^2 = |xi|^2 + |xj|^2 - 2 xi.xj in O(m^2)
            # memory — the broadcast (m, m, d) difference tensor is a
            # d-times blowup (2 GB at m=2000, d=64).  Exact in int64:
            # x <= 2^23 per dim, so x@x.T <= d*2^46 ~ 2^52 at d=64.
            n2 = np.einsum("md,md->m", x, x)
            dist = n2[:, None] + n2[None, :] - 2 * (x @ x.T)
            close = dist <= dist_threshold
            is_dup = np.tril(close, k=-1).any(axis=1)
            out.append(pd.DataFrame({
                id_col: grp[id_col].to_numpy(dtype="int64"),
                "cluster": np.full(len(grp), cid, dtype=np.int64),
                "is_dup": is_dup.astype(np.int64),
            }))
        if not out:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "cluster": pd.Series([], dtype="int64"),
                                 "is_dup": pd.Series([], dtype="int64")})
        return pd.concat(out, ignore_index=True)

    assigned = ds.map_batches(assign_with_vec, batch_format="pandas")
    return exchange_map_partitions(assigned, "cluster", mark_dups,
                                   n_partitions=n_partitions)


def cluster_cap_sample(
    ds: "object",
    k: int = 8,
    iters: int = 2,
    cap: int = 32,
    embed_col: str = "embedding",
    id_col: str = "vec_id",
    n_partitions: "int | None" = None,
) -> "object":
    """Cluster-balanced curation resample — the pruning step of
    cluster-based data balancing (keep a bounded, centroid-nearest
    quota per semantic cluster so no region of embedding space dominates
    the training mix; cf. the cluster-prune stage of SemDeDup-style
    curation).  Assign every vector with the exact-integer k-means path
    (:func:`kmeans_embeddings` — bit-identical across partitionings),
    then ONE exchange on the cluster id ranks each cluster locally by
    (dist asc, id asc) and keeps the first ``cap`` rows.  Per-partition
    state is one cluster's rows; nothing corpus-sized ever lands on the
    driver.  Output ``(id, cluster, dist, rk)`` with ``rk`` the
    1-based within-cluster rank — deterministic, SQL-replicable via a
    row_number window over the kmeans oracle CTE."""
    from ocr_ray.stages.join import exchange_map_partitions

    assigned = kmeans_embeddings(ds, k=k, iters=iters, embed_col=embed_col,
                                 id_col=id_col, n_partitions=n_partitions)

    def keep(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "cluster" not in g.columns:
            # all-empty exchange input carries the pre-map schema
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "cluster": pd.Series([], dtype="int64"),
                                 "dist": pd.Series([], dtype="int64"),
                                 "rk": pd.Series([], dtype="int64")})
        g = g.sort_values(["cluster", "dist", id_col], kind="mergesort")
        g = g.assign(rk=(g.groupby("cluster").cumcount() + 1).astype("int64"))
        return g[g["rk"] <= cap].reset_index(drop=True)

    return exchange_map_partitions(assigned, "cluster", keep, n_partitions)


def pca_project(
    embeddings,
    k: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_partitions: "int | None" = None,
):
    """Distributed PCA — fit on exact integer sufficient statistics,
    project via one broadcast matmul (the dimensionality-reduction /
    whitening primitive of embedding curation; rows-only: an
    eigendecomposition is not SQL-expressible).

    Reproducibility shape (the float-PCA trap is the k-means trap): a
    naive float covariance accumulates in block order and drifts by ulps
    across partitionings, flipping near-degenerate eigenvectors.  Here
    the ONLY corpus-wide reductions are exact int64: per-dim sums and
    the Gram matrix of the int8-quantized codes
    (similarity.quantize_int8 — the same integer-outer-product partials
    as api.gram_matrix, O(batches x D^2) exchange traffic, independent
    of N).  The covariance, eigh, and component matrix are then computed
    ONCE on the driver from those exact integers, so every run and every
    partitioning sees the identical (D, k) basis; eigenvector sign is
    pinned by making each component's largest-|loading| coordinate
    positive (ties to the lowest index).  Projection is a pure
    map_batches against the ray.put basis, rounded to 6 dp.

    Returns a Dataset (id_col, pc_0..pc_{k-1})."""
    import ray
    import ray.data as rd

    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.similarity import _as_matrix, quantize_int8

    if not 1 <= k <= dim:
        # k > dim would IndexError inside the projection workers; fail
        # loud at plan time instead
        raise ValueError(f"pca_project: k={k} must be in [1, dim={dim}]")

    iu, ju = np.triu_indices(dim)

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        m = _as_matrix(b[vec_col], dim)
        codes, _ = quantize_int8(m)
        g = codes.T @ codes
        # one frame carries all three statistics: the gram triangle rows
        # plus D per-dim sum rows (j=-1) plus one count row (j=-2)
        return pd.DataFrame({
            "i": np.r_[iu, np.arange(dim), 0].astype("int64"),
            "j": np.r_[ju, np.full(dim, -1), -2].astype("int64"),
            "v": np.r_[g[iu, ju], codes.sum(axis=0), len(b)].astype("int64"),
        })

    st = hash_aggregate(
        embeddings.map_batches(partials, batch_format="pandas"),
        keys=["i", "j"], aggs={"v": "sum"}, n_partitions=n_partitions,
    ).to_pandas()
    if "v" not in st.columns or not len(st):
        raise ValueError("pca_project: empty embeddings input")
    n = int(st.loc[st["j"] == -2, "v"].sum())
    if n < 2:
        raise ValueError(f"pca_project: need >= 2 vectors, got {n}")
    s = np.zeros(dim, dtype=np.int64)
    srows = st[st["j"] == -1]
    s[srows["i"].to_numpy(dtype="int64")] = srows["v"].to_numpy(dtype="int64")
    g = np.zeros((dim, dim), dtype=np.int64)
    grows = st[st["j"] >= 0]
    g[grows["i"].to_numpy(dtype="int64"),
      grows["j"].to_numpy(dtype="int64")] = grows["v"].to_numpy(dtype="int64")
    g = g + np.triu(g, 1).T  # mirror the stored upper triangle

    # exact ints -> one driver-side float covariance; C = (G - s s^T / n)/(n-1)
    cov = (g.astype(np.float64)
           - np.outer(s, s).astype(np.float64) / n) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)       # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order]                  # (D, k)
    for c in range(comps.shape[1]):          # sign pin: largest |loading| > 0
        jmax = int(np.argmax(np.abs(comps[:, c])))
        if comps[jmax, c] < 0:
            comps[:, c] = -comps[:, c]
    mean = s.astype(np.float64) / n
    basis_ref = ray.put((mean, comps))

    pc_cols = [f"pc_{c}" for c in range(k)]

    def project(b: pd.DataFrame, _ref=basis_ref) -> pd.DataFrame:
        mean_, comps_ = ray.get(_ref)
        m = _as_matrix(b[vec_col], dim)
        codes, _ = quantize_int8(m)
        p = np.round((codes.astype(np.float64) - mean_) @ comps_, 6)
        out = {id_col: b[id_col].to_numpy()}
        for c, col in enumerate(pc_cols):
            out[col] = p[:, c]
        return pd.DataFrame(out)

    return embeddings.map_batches(project, batch_format="pandas")
