"""Wave-9 review regressions over the exchange/join core.

Headline finding: `pd.merge` matches int64 1 to float64 1.0 by VALUE,
but `pd.util.hash_pandas_object` hashes them differently — so a mixed
int/float key pair landed matching rows in DIFFERENT partitions and the
exchange joins silently dropped them (and the Bloom prefilter pruned
them before the exchange).  Fixed by hashing integral floats through
the int64 path elementwise (join._key_hash / join._jbloom_key64).

Also: asof/range joins total on all-empty pre-map-schema sides;
n_partitions floored at 2 (num_returns=1 returns a bare ObjectRef);
remaining to_pandas-drops-columns consumers guarded (dsir/lm count
tables, dedup_pairs facade, pagerank zero-weight graphs, gram_matrix);
lsh_embed_dedup_pairs total on an empty corpus."""

import numpy as np
import pandas as pd
import pytest


def _int_float_sides(rd):
    left = rd.from_pandas(pd.DataFrame({
        "k": np.arange(16, dtype="int64"),
        "lv": np.arange(16, dtype="int64") * 10,
    })).repartition(3)
    right = rd.from_pandas(pd.DataFrame({
        "k": np.arange(16).astype("float64"),  # 0.0, 1.0, ... == int keys
        "rv": np.arange(16, dtype="int64") * 100,
    })).repartition(2)
    return left, right


def test_exchange_join_matches_int_vs_float_keys(ray_session):
    import ray.data as rd

    from ocr_ray.stages.join import exchange_join

    left, right = _int_float_sides(rd)
    out = exchange_join(left, right, on="k", n_partitions=4).to_pandas()
    # pd.merge matches every key by value; the exchange must too
    assert len(out) == 16
    got = out.sort_values("lv").reset_index(drop=True)
    assert (got["rv"].to_numpy() == got["lv"].to_numpy() * 10).all()


def test_bloom_pruned_join_matches_int_vs_float_keys(ray_session):
    import ray.data as rd

    from ocr_ray.stages.join import bloom_pruned_join

    left, right = _int_float_sides(rd)
    out = bloom_pruned_join(left, right, on="k", n_partitions=4).to_pandas()
    assert len(out) == 16  # no genuinely-matching left row was pruned


def test_key_hash_nonintegral_floats_self_consistent():
    from ocr_ray.stages.join import _key_hash

    a = _key_hash(pd.Series([1.5, 2.5, np.nan], dtype="float64"))
    b = _key_hash(pd.Series([1.5, 2.5, np.nan], dtype="float64"))
    assert (a == b).all()
    # integral float hashes equal the int hash of the same value
    hi = _key_hash(pd.Series([7], dtype="int64"))
    hf = _key_hash(pd.Series([7.0], dtype="float64"))
    assert hi[0] == hf[0]


def test_asof_join_all_empty_right_premap_schema(ray_session):
    import ray.data as rd

    from ocr_ray.stages.join import asof_join

    left = rd.from_pandas(pd.DataFrame({
        "g": ["a", "a", "b"], "t": np.array([1, 5, 3], dtype="int64"),
    }))
    # empty right whose zero-row blocks skip the rename UDF -> pre-map schema
    right = rd.from_pandas(pd.DataFrame({
        "g0": ["a"], "t0": np.array([0], dtype="int64"),
        "val": np.array([9], dtype="int64"),
    })).filter(lambda r: False).map_batches(
        lambda b: b.rename(columns={"g0": "g", "t0": "t"}),
        batch_format="pandas")
    out = asof_join(left, right, by="g", on="t", n_partitions=2).to_pandas()
    assert len(out) == 3  # all left rows survive, unmatched


def test_range_join_all_empty_intervals_premap_schema(ray_session):
    import ray.data as rd

    from ocr_ray.stages.join import range_join

    points = rd.from_pandas(pd.DataFrame({
        "g": ["a", "b"], "p": np.array([2, 4], dtype="int64"),
    }))
    ivals = rd.from_pandas(pd.DataFrame({
        "g0": ["a"], "s0": np.array([0], dtype="int64"),
        "e0": np.array([10], dtype="int64"), "iid": np.array([1], dtype="int64"),
    })).filter(lambda r: False).map_batches(
        lambda b: b.rename(columns={"g0": "g", "s0": "s", "e0": "e"}),
        batch_format="pandas")
    out = range_join(points, ivals, by="g", point_col="p", start_col="s",
                     end_col="e", idx_col="iid", n_partitions=2).to_pandas()
    assert len(out) == 2
    assert (out["iid"] == -1).all()


def test_resolve_partitions_floors_explicit_one(ray_session):
    from ocr_ray.stages.join import launch_splits, resolve_partitions

    assert resolve_partitions(None, 1) == 2
    with pytest.raises(ValueError, match="n_partitions >= 2"):
        launch_splits([], "k", 1)


def test_train_counts_tokenless_corpus(ray_session):
    import ray.data as rd

    from ocr_ray.stages.dsir import train_unigram_counts
    from ocr_ray.stages.lm import train_bigram_counts

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(3, dtype="int64"),
        "text": ["", "solo", " "],  # no doc has two tokens
    }))
    uni = train_unigram_counts(
        docs.filter(lambda r: r["text"] == ""))  # fully empty corpus
    assert (uni == 0).all()
    c1, c2 = train_bigram_counts(docs)
    assert (c2 == 0).all()  # no bigram anywhere


def test_dedup_pairs_exact_duplicate_free(ray_session):
    import ray.data as rd

    from ocr_ray.api import dedup_pairs

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(6, dtype="int64"),
        "text": [f"unique text {i}" for i in range(6)],
    }))
    out = dedup_pairs(docs, method="exact")
    assert len(out) == 0
    assert list(out.columns) == ["left_id", "right_id"]


def test_pagerank_all_zero_weights(ray_session):
    import ray.data as rd

    from ocr_ray.stages.graph import pagerank

    edges = rd.from_pandas(pd.DataFrame({
        "src": np.array([1, 3], dtype="int64"),
        "dst": np.array([2, 4], dtype="int64"),
        "w": np.zeros(2, dtype="int64"),
    }))
    out = pagerank(edges, iters=2)
    assert len(out) == 4
    # teleport-only ranks: every node gets the same mass
    assert out["pr_ppm"].nunique() == 1
    assert (out["out_w"] == 0).all()


def test_gram_matrix_empty_embeddings(ray_session):
    import ray.data as rd

    from ocr_ray.api import gram_matrix

    empty = rd.from_pandas(pd.DataFrame({
        "vec_id": np.array([1], dtype="int64"),
        "embedding": [np.zeros(4).tolist()],
    })).filter(lambda r: False)
    out = gram_matrix(empty, dim=4)
    assert len(out) == 4 * 5 // 2  # full upper triangle
    assert (out["g"] == 0).all()


def test_near_dup_embeddings_empty_corpus(ray_session):
    import ray.data as rd

    from ocr_ray.api import near_dup_embeddings

    empty = rd.from_pandas(pd.DataFrame({
        "vec_id": np.array([1], dtype="int64"),
        "embedding": [np.ones(8).tolist()],
    })).filter(lambda r: False)
    out = near_dup_embeddings(empty).to_pandas()
    assert len(out) == 0
