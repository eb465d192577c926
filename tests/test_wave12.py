"""Wave-12: vectorized pagerank lookups (covered by the existing
graph_pagerank oracle/unit tests) and the per-source MinHash signature
similarity matrix."""

import numpy as np
import pandas as pd


def test_source_similarity_identical_and_disjoint(ray_session):
    """An exact copy of a source under a new name must estimate Jaccard
    1.0 (all 16 per-perm minima agree); near-disjoint shingle sets must
    estimate ~0.  Also pins partition-insensitivity: min-merge across
    blocks is order-free, so a 1-block and an 8-block layout agree."""
    import ray.data as rd

    from ocr_ray.stages.dedup import source_minhash_similarity

    rng = np.random.RandomState(3)
    words = [f"w{i}" for i in range(400)]

    def doc(seed):
        r = np.random.RandomState(seed)
        return " ".join(r.choice(words, size=30))

    a_docs = [doc(s) for s in range(10)]
    b_docs = [doc(s + 1000) for s in range(10)]
    df = pd.DataFrame({
        "source": ["a"] * 10 + ["a_copy"] * 10 + ["b"] * 10,
        "text": a_docs + a_docs + b_docs,
    })
    out1 = source_minhash_similarity(rd.from_pandas(df))
    out8 = source_minhash_similarity(rd.from_pandas(df).repartition(8))
    pd.testing.assert_frame_equal(out1, out8)

    pairs = {(r.src_a, r.src_b): r for r in out1.itertuples()}
    assert pairs[("a", "a_copy")].n_agree == 16
    assert pairs[("a", "a_copy")].jaccard_est_ppm == 1_000_000
    # unrelated 3-gram shingle sets over a 400-word vocab: true Jaccard
    # ~0, so a 16-sample estimate should agree on at most a few perms
    assert pairs[("a", "b")].n_agree <= 3
    assert pairs[("a_copy", "b")].n_agree == pairs[("a", "b")].n_agree


def test_source_similarity_short_doc_and_empty(ray_session):
    """Docs under 3 tokens carry no shingles; a source with only such
    docs is absent; an all-short corpus returns the typed empty frame."""
    import ray.data as rd

    from ocr_ray.stages.dedup import source_minhash_similarity

    df = pd.DataFrame({
        "source": ["x", "x", "y", "z"],
        "text": ["one two", "", "alpha beta gamma delta", "p q r s t"],
    })
    out = source_minhash_similarity(rd.from_pandas(df))
    assert set(zip(out["src_a"], out["src_b"])) == {("y", "z")}

    empty = source_minhash_similarity(
        rd.from_pandas(pd.DataFrame({"source": ["x"], "text": ["hi"]})))
    assert len(empty) == 0
    assert list(empty.columns) == [
        "src_a", "src_b", "n_perm", "n_agree", "jaccard_est_ppm"]


def test_cluster_cap_sample_quota_and_determinism(ray_session):
    """Per-cluster quota holds, ranks are 1..n_kept with centroid-nearest
    first, and the result is partition-insensitive (exact-integer kmeans
    + deterministic window)."""
    import ray.data as rd

    from ocr_ray.stages.cluster import cluster_cap_sample

    rng = np.random.RandomState(11)
    n, d, k, cap = 120, 8, 4, 10
    embs = rng.rand(n, d).astype("float32")
    df = pd.DataFrame({"vec_id": np.arange(n, dtype="int64"),
                       "embedding": list(embs)})
    out1 = (cluster_cap_sample(rd.from_pandas(df), k=k, iters=2, cap=cap)
            .to_pandas().sort_values(["cluster", "rk"]).reset_index(drop=True))
    out4 = (cluster_cap_sample(rd.from_pandas(df).repartition(4), k=k,
                               iters=2, cap=cap)
            .to_pandas().sort_values(["cluster", "rk"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out1, out4)
    per = out1.groupby("cluster")
    assert (per.size() <= cap).all()
    for _, g in per:
        assert list(g["rk"]) == list(range(1, len(g) + 1))
        assert (g["dist"].diff().dropna() >= 0).all()  # nearest first


def test_grouped_quantile_gate_properties(ray_session):
    """Each group's survivors are exactly its docs at/above the group's
    PERCENTILE_DISC median; whitespace-only docs are excluded; the
    result is partition-insensitive."""
    import math

    import ray.data as rd

    from ocr_ray.stages.analysis import grouped_quantile_gate

    rng = np.random.RandomState(5)
    rows = []
    for i in range(200):
        g = ["en", "de", "fr"][i % 3]
        n = int(rng.randint(1, 40))
        rows.append((i, g, " ".join(["tok"] * n)))
    rows.append((900, "en", "   "))  # whitespace-only: no score
    df = pd.DataFrame(rows, columns=["doc_id", "lang", "text"])

    out1 = (grouped_quantile_gate(rd.from_pandas(df), q=0.5)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    out6 = (grouped_quantile_gate(rd.from_pandas(df).repartition(6), q=0.5)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out1, out6)
    assert 900 not in set(out1["doc_id"])

    scored = df[df["text"].str.strip() != ""].copy()
    scored["n"] = scored["text"].str.split().str.len()
    for g, sub in scored.groupby("lang"):
        vals = np.sort(sub["n"].to_numpy())
        thr = int(vals[math.ceil(0.5 * len(vals)) - 1])  # PERCENTILE_DISC
        exp = set(sub.loc[sub["n"] >= thr, "doc_id"])
        got = set(out1.loc[out1["lang"] == g, "doc_id"])
        assert got == exp
        assert (out1.loc[out1["lang"] == g, "thr_len"] == thr).all()
