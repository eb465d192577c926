"""Wave-10 review regressions: dedup/validate totality on empty inputs,
driver-side MinHash banding validation, per-row boxed segment parse.

All-empty-input crashes fixed here share one mechanism the repo documents
elsewhere: zero-row blocks skip map_batches UDFs (the exchange sees the
pre-map schema) and Ray's to_pandas() on an all-empty Dataset drops
columns."""

import numpy as np
import pandas as pd
import pytest


def _empty_docs(rd):
    return rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(4, dtype="int64"),
        "text": ["alpha beta gamma delta"] * 4,
    })).filter(lambda r: False)


def test_simhash_dedup_pairs_empty_input(ray_session):
    import ray.data as rd

    from ocr_ray.stages.dedup import simhash_dedup_pairs

    out = simhash_dedup_pairs(_empty_docs(rd)).to_pandas()
    assert len(out) == 0


def test_keep_representatives_empty_inputs(ray_session):
    import ray.data as rd

    from ocr_ray.stages.dedup import keep_representatives

    docs = _empty_docs(rd)
    clusters = rd.from_pandas(pd.DataFrame({
        "doc_id": np.array([1], dtype="int64"),
        "cluster_id": np.array([0], dtype="int64"),
    })).filter(lambda r: False)
    out = keep_representatives(docs, clusters).to_pandas()
    assert len(out) == 0


def test_incremental_containment_empty_corpus(ray_session):
    """Crawl-refresh bootstrap: screening the first shard against a
    not-yet-populated corpus — nothing has been seen, containment 0."""
    import ray.data as rd

    from ocr_ray.stages.dedup import incremental_containment

    corpus = _empty_docs(rd)
    shard = rd.from_pandas(pd.DataFrame({
        "doc_id": np.array([10], dtype="int64"),
        "text": ["alpha beta gamma delta epsilon"],
    }))
    out = incremental_containment(corpus, shard).to_pandas()
    assert len(out) == 1
    assert float(out.loc[0, "containment"]) == 0.0
    assert int(out.loc[0, "is_dup"]) == 0


def test_contract_check_empty_shard(ray_session):
    import ray.data as rd

    from ocr_ray.stages.validate import contract_check

    empty = rd.from_pandas(pd.DataFrame({
        "conv_id": ["c"], "turn_idx": np.array([0], dtype="int32"),
        "role": ["user"], "text": ["x"], "tool": [""],
        "ts": pd.to_datetime([0], unit="us"),
    })).filter(lambda r: False)
    out = contract_check(empty)
    assert len(out) == 1
    assert int(out.loc[0, "n_rows"]) == 0
    for c in ("null_conv_id", "neg_idx", "bad_enum", "null_ts",
              "oversize_text"):
        assert int(out.loc[0, c]) == 0


def test_minhasher_validates_band_divisibility():
    from ocr_ray.stages.dedup import MinHasher

    with pytest.raises(ValueError, match="n_bands must divide n_perm"):
        MinHasher(n_perm=64, n_bands=10)
    MinHasher(n_perm=64, n_bands=16)  # valid config still constructs


def test_boxed_segments_parsed_per_row(ray_session):
    """Every boxed row in a batch must emit its own boxes as segments
    (the old single-entry cache only served the batch's LAST boxed row —
    values were still right, but each earlier row re-paid json.loads;
    this pins the per-row behavior the restructure relies on)."""
    import json

    import pyarrow as pa

    from ocr_ray.config import DEFAULT_CONFIG
    from ocr_ray.stages.extract import Extractor

    def boxed(words):
        return json.dumps({"page_height": 400, "boxes": [
            {"x0": 40.0 + 60 * i, "y0": 40.0, "x1": 90.0 + 60 * i,
             "y1": 52.0, "text": w, "conf": 0.9}
            for i, w in enumerate(words)
        ]})

    batch = pa.table({
        "norm_text": [boxed(["alpha", "beta"]), boxed(["gamma"])],
        "kind": ["boxed", "boxed"],
    })
    ex = Extractor(config=DEFAULT_CONFIG, with_clean=False,
                   emit_segments=True)
    out = ex(batch)
    segs = out["segments"].to_pylist()
    assert [s["text"] for s in segs[0]] == ["alpha", "beta"]
    assert [s["text"] for s in segs[1]] == ["gamma"]
