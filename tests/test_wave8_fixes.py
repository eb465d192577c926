"""Wave-8 review regressions.

Findings fixed: int64-accuracy block mixes from calculate_similarity's
empty branch; benchmark_summary / heavy_hitters / hll sketches /
kmv_distinct_shingles crashing on all-empty inputs (Ray's to_pandas()
drops columns on an all-empty Dataset, and zero-row blocks skip
map_batches UDFs so exchanges see the pre-map schema); SentenceOverlapQA
missing sentence-final words and breaking its [0,1]-score contract;
kmeans silently shrinking k on non-dense ids; semantic_dedup's (m, m, d)
difference tensor replaced with the exact int64 gram identity;
generate_transcripts accepting out-of-range mega_share."""

import numpy as np
import pandas as pd
import pytest


def _empty_docs(rd):
    """All-empty (doc_id, text) dataset whose zero-row blocks carry the
    source schema (the UDF-skip path)."""
    return rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(8, dtype="int64"),
        "text": ["alpha beta"] * 8,
    })).repartition(2).filter(lambda r: r["doc_id"] < 0)


def test_calculate_similarity_empty_is_float():
    from ocr_ray.stages.benchmark import calculate_similarity

    v = calculate_similarity("", "anything")
    assert isinstance(v, float) and v == 0.0
    assert isinstance(calculate_similarity("a", ""), float)


def test_engine_benchmark_all_empty_gt_block_is_float64(ray_session):
    """A block whose every ground truth is empty must still emit a float64
    accuracy column (an int64 block would crash the summary exchange)."""
    from ocr_ray.stages.benchmark import EngineBenchmark

    b = pd.DataFrame({
        "conv_id": ["c1", "c1"],
        "turn_idx": [0, 1],
        "text": ["some payload", "other payload"],
        "expected": ["", ""],
    })
    out = EngineBenchmark()(b)
    assert out["accuracy"].dtype == np.float64
    assert (out["accuracy"] == 0.0).all()


def test_benchmark_summary_empty_results(ray_session):
    import ray.data as rd

    from ocr_ray.stages.benchmark import benchmark_summary

    empty = rd.from_pandas(pd.DataFrame({
        "engine": ["tagstrip"], "layout_preserved": [True],
        "accuracy": [1.0], "processing_time": [0.1],
    })).filter(lambda r: False)
    out = benchmark_summary(empty)
    assert len(out) == 0
    assert list(out.columns) == [
        "engine", "layout_preserved", "n", "mean_accuracy", "mean_time"]


def test_heavy_hitters_all_empty_input(ray_session):
    import ray.data as rd

    from ocr_ray.stages.aggregate import heavy_hitters

    out = heavy_hitters(_empty_docs(rd), k=8)
    assert len(out) == 0
    assert list(out.columns) == ["term", "n"]


def test_hll_distinct_terms_tokenless_corpus(ray_session):
    import ray.data as rd

    from ocr_ray.stages.aggregate import hll_distinct_terms

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(4, dtype="int64"),
        "text": ["", "   ", "\n\n", " \t "],
    }))
    out = hll_distinct_terms(docs).to_pandas()
    assert len(out) == 1
    assert int(out.loc[0, "n_zero_registers"]) == 256
    assert int(out.loc[0, "sum_rho"]) == 0
    # all-zero registers -> linear counting of 0 distinct terms
    assert float(out.loc[0, "est_distinct"]) == 0.0


def test_hll_distinct_terms_by_tokenless_corpus(ray_session):
    import ray.data as rd

    from ocr_ray.stages.aggregate import hll_distinct_terms_by

    docs = rd.from_pandas(pd.DataFrame({
        "source": ["a", "b"], "text": ["", "  "],
    }))
    out = hll_distinct_terms_by(docs, group_col="source")
    assert len(out) == 0
    assert "est_distinct" in out.columns


def test_kmv_distinct_shingles_all_empty_input(ray_session):
    import ray.data as rd

    from ocr_ray.stages.aggregate import kmv_distinct_shingles

    out = kmv_distinct_shingles(_empty_docs(rd)).to_pandas()
    assert len(out) == 0  # no row, not a KeyError


def test_sentence_overlap_qa_contract():
    from ocr_ray.stages.rag import SentenceOverlapQA

    qa = SentenceOverlapQA()
    # sentence-final word carries the '.', must still match
    res = qa("what is quality", "This is quality.")
    assert res["answer"] == "This is quality."
    assert res["score"] == 0.5  # 'quality' of qwords {what, quality} matched
    # repeated query word cannot push the overlap fraction past 1
    res = qa("quality", "quality quality quality end.")
    assert 0.0 <= res["score"] <= 1.0
    # empty context: empty answer, score 0, start/end -1
    res = qa("anything here", "")
    assert res == {"answer": "", "score": 0.0, "start": -1, "end": -1}


def test_kmeans_rejects_non_dense_ids(ray_session):
    import ray.data as rd

    from ocr_ray.stages.cluster import kmeans_centroids

    vecs = pd.DataFrame({
        "vec_id": np.arange(1000, 1016, dtype="int64"),
        "embedding": [np.random.default_rng(i).normal(size=4).tolist()
                      for i in range(16)],
    })
    with pytest.raises(ValueError, match="dense 0-based"):
        kmeans_centroids(rd.from_pandas(vecs), k=4, iters=1)


def test_semantic_dedup_gram_identity_matches_bruteforce():
    """The O(m^2)-memory gram form must produce the exact same int64
    distances as the (m, m, d) difference tensor it replaced."""
    from ocr_ray.stages.cluster import quantize_embeddings

    rng = np.random.default_rng(7)
    x = quantize_embeddings(rng.normal(size=(50, 64)))
    d = x[:, None, :] - x[None, :, :]
    brute = np.einsum("mnd,mnd->mn", d, d)
    n2 = np.einsum("md,md->m", x, x)
    gram = n2[:, None] + n2[None, :] - 2 * (x @ x.T)
    assert (brute == gram).all()


def test_generate_transcripts_mega_share_bounds(tmp_path):
    from ocr_ray.sources.transcripts import generate_transcripts

    with pytest.raises(ValueError, match="mega_share"):
        generate_transcripts(str(tmp_path / "a"), n_convs=4, mega_share=1.0)
    with pytest.raises(ValueError, match="n_convs"):
        generate_transcripts(str(tmp_path / "b"), n_convs=1, mega_share=0.5)
