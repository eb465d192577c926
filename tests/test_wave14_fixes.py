"""Wave-14 review fixes on the older scale stages: grouped_rank null
groups, kmeans seed-contract duplicates, pack budget validation,
bigram-scorer train/score desync guard, gram-form assignment parity."""

import numpy as np
import pandas as pd
import pytest


def test_grouped_rank_null_group_and_nan_string_distinct(ray_session):
    """NULL-group rows get ranks (one SQL-null group) instead of a
    KeyError, and a group literally named 'nan' stays a SEPARATE group
    from the null one (the old string-cast run key merged them)."""
    import ray.data as rd

    from ocr_ray.stages.shuffle import grouped_rank

    df = pd.DataFrame({
        "doc_id": np.arange(12, dtype="int64"),
        "source": ["a", "a", None, None, "nan", "nan"] * 2,
    })
    out = (grouped_rank(rd.from_pandas(df), "source", id_col="doc_id",
                        quota=3, n_buckets=8, n_partitions=4)
           .to_pandas())
    assert len(out) == 12
    nulls = out[out["source"].isna()]
    named = out[out["source"] == "nan"]
    assert len(nulls) == 4 and len(named) == 4
    # each group is ranked 0..3 independently — merged groups would
    # show ranks up to 7
    assert sorted(nulls["src_rank"]) == [0, 1, 2, 3]
    assert sorted(named["src_rank"]) == [0, 1, 2, 3]
    assert (out.groupby(out["source"].astype(str))["kept"].sum() == 3).all()


def test_kmeans_rejects_duplicate_seed_ids(ray_session):
    import ray.data as rd

    from ocr_ray.stages.cluster import kmeans_centroids

    df = pd.DataFrame({
        "vec_id": [0, 1, 1, 5],
        "embedding": [[0.1, 0.2]] * 4,
    })
    with pytest.raises(ValueError, match="distinct"):
        kmeans_centroids(rd.from_pandas(df), k=3, iters=1,
                         id_col="vec_id")


def test_pack_rejects_nonpositive_budget(ray_session):
    import ray.data as rd

    from ocr_ray.stages.shuffle import deterministic_pack

    df = pd.DataFrame({"doc_id": [1], "text": ["a b"]})
    with pytest.raises(ValueError, match="budget"):
        deterministic_pack(rd.from_pandas(df), budget=0)


def test_bigram_scorer_raises_on_desync():
    """A zero unigram count (score-side token never trained) raises
    instead of silently flooring lm_ppm via numpy's int // 0 == 0."""
    from ocr_ray.stages.lm import BigramLMScorer

    c1 = np.zeros(64, dtype=np.int64)   # nothing trained
    c2 = np.ones(256, dtype=np.int64)
    s = BigramLMScorer(c1, c2)
    with pytest.raises(RuntimeError, match="diverged"):
        s(pd.DataFrame({"doc_id": [1], "text": ["two tokens here"]}))


def test_assign_gram_form_matches_difference_form():
    """The gram-identity assignment is bit-identical (distances AND
    argmin ties) to the materialized difference tensor."""
    from ocr_ray.stages.cluster import _assign, quantize_embeddings

    rng = np.random.RandomState(3)
    x = quantize_embeddings(rng.randn(200, 16))
    cents = quantize_embeddings(rng.randn(7, 16))
    cents[3] = cents[5]  # force exact distance ties across clusters
    a, d = _assign(x, cents)
    diff = x[:, None, :] - cents[None, :, :]
    dist = np.einsum("bkd,bkd->bk", diff, diff)
    a2 = dist.argmin(axis=1)
    assert (a == a2).all()
    assert (d == dist[np.arange(len(x)), a2]).all()
