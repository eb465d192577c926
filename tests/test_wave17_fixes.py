"""Wave-17 review fixes over api/sources/rag/model_engine/multimodal."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_generator_clears_stale_shards(tmp_path):
    """Shrinking n_shards on regeneration must not leave old shard files
    that readers would union as duplicated conversations."""
    import glob
    import os

    from ocr_ray.sources.transcripts import generate_transcripts

    d = str(tmp_path / "t")
    generate_transcripts(d, n_convs=8, n_shards=8, parallel=False)
    assert len(glob.glob(os.path.join(d, "transcripts", "*.parquet"))) == 8
    generate_transcripts(d, n_convs=8, n_shards=4, parallel=False)
    files = glob.glob(os.path.join(d, "transcripts", "*.parquet"))
    assert len(files) == 4
    # total conversations = 8 exactly once
    t = pd.concat([pd.read_parquet(f) for f in files])
    assert t["conv_id"].nunique() == 8
    assert not t.duplicated(["conv_id", "turn_idx"]).any()


def test_mega_probe_equivalence():
    """The length-only probe must equal the full-build probe turn count
    (make_conv's FIRST rng draw is _conv_len)."""
    import hashlib
    import random

    from ocr_ray.sources.transcripts import _conv_len, make_conv

    for i in range(1, 30):
        key = hashlib.sha256(f"42:{i}".encode()).digest()
        n = _conv_len(random.Random(int.from_bytes(key[:8], "big")))
        assert n == len(make_conv(i, 42)[0])


def test_payload_cap_single_source():
    from ocr_ray.config import DEFAULT_CONFIG
    from ocr_ray.sources.transcripts import PAYLOAD_CAP

    assert PAYLOAD_CAP == DEFAULT_CONFIG.payload_cap


def test_curate_and_redact_tolerate_null_text(ray_session):
    import ray.data as rd

    from ocr_ray import api

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["ten words of real content here for the gate pass",
                 None,
                 "another real document with plenty of distinct tokens ok"],
    }))
    out = api.curate(docs, min_tokens=5).to_pandas()
    assert set(out["doc_id"]) == {1, 3}  # null text gated, no crash

    red = api.redact_pii(docs).to_pandas().sort_values("doc_id")
    assert red.loc[red["doc_id"] == 2, "redacted"].iloc[0] == ""
    assert (red.loc[red["doc_id"] == 2,
                    ["n_urls", "n_emails", "n_phones", "n_dates"]]
            .iloc[0] == 0).all()


def test_frame_stub_preserves_string_ids(ray_session):
    from ocr_ray.stages.multimodal import FrameSampleStub

    t = pa.table({"doc_id": ["conv-1", "conv-2"],
                  "payload": [b"x" * 2048, b"y" * 1024]})
    out = FrameSampleStub(every_n=1)(t)
    assert pa.types.is_string(out["doc_id"].type)
    assert out["doc_id"].to_pylist()[0] == "conv-1"


def test_model_scorer_flags_nan_text(tmp_path):
    from ocr_ray.stages.model_engine import ModelScorer, build_model_artifact

    path = str(tmp_path / "artifact.pkl")
    build_model_artifact(path)
    s = ModelScorer(path)
    out = s(pd.DataFrame({"doc_id": [1, 2, 3],
                          "text": ["fine", None, np.nan]}))
    assert list(out["model_error"]) == ["", "null text", "null text"]


def test_qa_span_points_at_winning_occurrence():
    """When the best sentence appears twice (overlapping chunks), the
    span must locate the matched occurrence, not context.find()'s first
    hit of a possibly-different sentence with the same text."""
    from ocr_ray.stages.rag import SentenceOverlapQA

    qa = SentenceOverlapQA()
    ctx = "Filler without answer words. The quality answer lives here."
    res = qa("where does the quality answer live", ctx)
    assert res["answer"] == "The quality answer lives here."
    assert ctx[res["start"]:res["end"]] == res["answer"]
    # duplicate winning sentence: span must still slice to the answer
    ctx2 = "The answer. The answer."
    res2 = qa("answer", ctx2)
    assert ctx2[res2["start"]:res2["end"]] == res2["answer"]
