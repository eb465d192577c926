"""Wave-15 review fixes over aggregate/similarity/bloom/index: NULL
groups in the per-group HLL, countmin depth validation, heavy-hitters
empty-candidate early return, bloom_screen id_col naming, query-term
lowercasing, LSHProbeScore query normalization, LSH embed-dedup empty
input."""

import numpy as np
import pandas as pd
import pytest


def test_hll_by_keeps_null_group(ray_session):
    import ray.data as rd

    from ocr_ray.stages.aggregate import hll_distinct_terms_by

    df = pd.DataFrame({
        "source": ["a", "a", None, None],
        "text": ["x y z", "x q", "p r", "p s t"],
    })
    out = hll_distinct_terms_by(rd.from_pandas(df), group_col="source")
    assert len(out) == 2  # 'a' + the SQL-null group
    null_row = out[out["source"].isna()]
    assert len(null_row) == 1
    # 4 distinct terms (p r s t): small range -> linear counting is
    # near-exact
    assert 3.0 <= float(null_row["est_distinct"].iloc[0]) <= 5.0


def test_countmin_rejects_bad_depth(ray_session):
    import ray.data as rd

    from ocr_ray.stages.aggregate import CM_A, countmin_estimate, countmin_sketch

    df = pd.DataFrame({"text": ["a b c"]})
    with pytest.raises(ValueError, match="depth"):
        countmin_sketch(rd.from_pandas(df), d=len(CM_A) + 1)
    with pytest.raises(ValueError, match="depth"):
        countmin_estimate(pd.DataFrame({"r": [], "cell": [], "c": []}),
                          ["a"], d=len(CM_A) + 2)


def test_heavy_hitters_uniform_returns_empty_without_verify(ray_session):
    """Uniform distribution: no candidate passes the Misra-Gries bound
    and the result is empty (the early return skips the verify scan)."""
    import ray.data as rd

    from ocr_ray.stages.aggregate import heavy_hitters

    docs = pd.DataFrame({"text": [f"u{i} u{i + 1000}" for i in range(500)]})
    out = heavy_hitters(rd.from_pandas(docs), k=5)
    assert len(out) == 0
    assert list(out.columns) == ["term", "n"]


def test_bloom_screen_honors_id_col(ray_session):
    import ray.data as rd

    from ocr_ray.stages.bloom import bloom_screen

    corpus = rd.from_pandas(pd.DataFrame({"conv_id": [1], "text": ["x y"]}))
    shard = rd.from_pandas(pd.DataFrame({"conv_id": [7, 8],
                                         "text": ["x y", "new doc"]}))
    out = bloom_screen(corpus, shard, id_col="conv_id").to_pandas()
    assert "conv_id" in out.columns and "doc_id" not in out.columns
    assert bool(out.loc[out["conv_id"] == 7, "in_corpus"].iloc[0])


def test_conjunctive_lookup_lowercases_query(ray_session):
    import ray.data as rd

    from ocr_ray.stages.index import build_postings, conjunctive_lookup

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1], "text": ["Paris in spring", "paris again"]}))
    post = build_postings(docs)
    assert conjunctive_lookup(post, ["Paris"]) == [0, 1]
    assert conjunctive_lookup(post, ["PARIS", "SPRING"]) == [0]
    assert conjunctive_lookup(post, ["don't"]) == []  # still rejected


def test_lsh_probe_score_normalizes_raw_query():
    from ocr_ray.stages.similarity import LSHProbeScore

    rng = np.random.RandomState(2)
    vecs = rng.randn(16, 8)
    q = rng.randn(8) * 3.0  # deliberately NOT unit norm
    all_buckets = set(range(16))
    a = LSHProbeScore(8, 4, all_buckets, q)
    b = LSHProbeScore(8, 4, all_buckets, q / np.linalg.norm(q))
    batch = pd.DataFrame({"vec_id": np.arange(16, dtype="int64"),
                          "embedding": [v.tolist() for v in vecs]})
    ra, rb = a(batch), b(batch)
    pd.testing.assert_frame_equal(ra, rb)
    assert (ra["sim"].abs() <= 1.0 + 1e-12).all()  # true cosine range


def test_lsh_embed_dedup_pairs_empty_with_explicit_dim(ray_session):
    """Explicit dim skips the take(1) early return; the exchange kernels
    must still survive the pre-map schema of an all-empty input."""
    import ray.data as rd

    from ocr_ray.stages.similarity import lsh_embed_dedup_pairs

    empty = rd.from_pandas(pd.DataFrame({
        "vec_id": pd.Series(dtype="int64"),
        "embedding": pd.Series(dtype="object")}))
    ds = lsh_embed_dedup_pairs(empty, dim=8)
    assert ds.count() == 0  # (to_pandas drops columns on all-empty —
    # the documented Ray quirk — so only the row count is asserted)
