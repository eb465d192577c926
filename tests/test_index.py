"""Inverted-index stage: postings correctness, the max-df stop-term gate,
and conjunctive lookup semantics (including the absent-term empty-AND)."""

import pandas as pd
import pytest


DOCS = pd.DataFrame(
    {
        "doc_id": [1, 2, 3, 4],
        "text": [
            "the cat sat",
            "the dog sat sat",
            "the cat ran",
            "the THE The",
        ],
    }
)


@pytest.fixture(scope="module")
def postings_df(ray_session):
    import ray.data as rd

    from ocr_ray.stages.index import build_postings

    ds = rd.from_pandas(DOCS)
    return build_postings(ds, n_partitions=3).to_pandas().set_index("term")


def test_postings_lists_sorted_and_exact(postings_df):
    p = postings_df
    assert p.loc["the", "postings"] == "1,2,3,4"
    assert p.loc["the", "df"] == 4
    assert p.loc["the", "tf_total"] == 6  # doc 4 contributes 3
    assert p.loc["sat", "postings"] == "1,2"
    assert p.loc["sat", "tf_total"] == 3
    assert p.loc["cat", "postings"] == "1,3"
    assert set(p.index) == {"the", "cat", "dog", "sat", "ran"}


def test_max_df_gate_drops_stop_terms(ray_session):
    import ray.data as rd

    from ocr_ray.stages.index import build_postings

    # gate: 2*df <= max_df -> with max_df = n_docs = 4, only df <= 2 survive
    p = build_postings(
        rd.from_pandas(DOCS), n_partitions=2, max_df=len(DOCS)
    ).to_pandas()
    assert "the" not in set(p["term"])  # df=4, pruned
    assert set(p["term"]) == {"cat", "dog", "sat", "ran"}


def test_conjunctive_lookup(ray_session):
    import ray.data as rd

    from ocr_ray.stages.index import build_postings, conjunctive_lookup

    post = build_postings(rd.from_pandas(DOCS), n_partitions=2)
    assert conjunctive_lookup(post, ["the", "cat"]) == [1, 3]
    assert conjunctive_lookup(post, ["cat", "dog"]) == []
    # a term absent from the index (or max-df-pruned) -> empty AND
    assert conjunctive_lookup(post, ["cat", "zebra"]) == []
