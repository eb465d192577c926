"""Synthetic-fixture parity pins for the four least-driver-exercised
queries that had no dedicated pytest (VERDICT r3 task #1): corpus_pmi,
doc_budget_mix, embed_cluster_cap, io_jsonl_roundtrip.  Each test builds
its own tiny fixture, runs the engine query AND its DuckDB oracle on it,
and asserts hand-computed invariants on top of the frame equality — so a
regression in either side fails even if the driver never samples these
names again."""

import os

import numpy as np
import pandas as pd
import pytest


def _con(d, tables):
    import duckdb

    con = duckdb.connect()
    for t in tables:
        con.execute(f"create view {t} as select * from "
                    f"'{os.path.join(d, t + '.parquet')}'")
    return con


def test_corpus_pmi_synthetic_parity(ray_session, tmp_path):
    """PMI over a corpus small enough to verify by hand: pair counts,
    doc frequencies, the ln(N*c_ab/(c_a*c_b)) value, and the
    (c_ab DESC, a, b) ordering all match the oracle."""
    from ocr_ray.pipelines.queries import ORACLE_SQL, q_corpus_pmi

    d = str(tmp_path)
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype="int64"),
        "text": [
            "alpha beta gamma",
            "alpha beta",
            "beta gamma",
            "alpha beta gamma delta",
            "delta epsilon",
            "  alpha   beta  ",          # whitespace runs / trim parity
        ],
    })
    docs.to_parquet(os.path.join(d, "documents.parquet"))

    got = q_corpus_pmi(d)
    # row order: the oracle's post-LIMIT joins don't preserve ORDER BY
    # (the driver compare sorts rows, so only the SET of top-20 is
    # contractual) — compare sorted
    exp = _con(d, ["documents"]).execute(ORACLE_SQL["corpus_pmi"]).df()
    pd.testing.assert_frame_equal(
        got.sort_values(["a", "b"]).reset_index(drop=True),
        exp.sort_values(["a", "b"]).reset_index(drop=True),
        check_dtype=False)

    r = got.set_index(["a", "b"])
    assert r.loc[("alpha", "beta"), "c_ab"] == 4       # docs 0,1,3,5
    assert r.loc[("beta", "gamma"), "c_ab"] == 3       # docs 0,2,3
    # pmi(alpha,gamma) = ln(6*2/(4*3)) = ln(1) = 0 exactly
    assert r.loc[("alpha", "gamma"), "pmi"] == 0.0
    # ordering: the count-4 pair leads
    assert got.iloc[0][["a", "b"]].tolist() == ["alpha", "beta"]


def test_doc_budget_mix_boundary(ray_session, tmp_path):
    """Budget-600 prefix selection: a doc landing EXACTLY on the budget
    is kept (cum <= budget), the first doc crossing it is dropped, and a
    small later doc stays dropped too (prefix rule, not best-fit)."""
    from ocr_ray.pipelines.queries import ORACLE_SQL, q_doc_budget_mix

    d = str(tmp_path)

    def words(n):
        return " ".join(["tok"] * n)

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype="int64"),
        "source": ["A", "A", "A", "B", "B", "B"],
        # A: 250 + 250 (cum 500 kept) + 250 (cum 750 dropped)
        # B: 300 + 300 (cum 600 kept — exact boundary) + 5 (cum 605
        #    dropped even though 5 would "fit" the remaining 0 tokens)
        "text": [words(250), words(250), words(250),
                 words(300), words(300), words(5)],
    })
    docs.to_parquet(os.path.join(d, "documents.parquet"))

    got = (q_doc_budget_mix(d).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = (_con(d, ["documents"]).execute(ORACLE_SQL["doc_budget_mix"]).df()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert set(got["doc_id"]) == {0, 1, 3, 4}
    assert int(got.set_index("doc_id").loc[4, "cum_tok"]) == 600


def test_embed_cluster_cap_synthetic_parity(ray_session, tmp_path):
    """Cluster-balanced resample on synthetic 64-dim embeddings: the
    bit-exact k-means assignment + per-cluster quota window matches the
    oracle, every cluster keeps <= 32 members, and ranks are
    (dist asc, id asc) contiguous from 1."""
    from ocr_ray.pipelines.queries import (ORACLE_SQL,
                                           q_embed_cluster_cap)

    d = str(tmp_path)
    rng = np.random.default_rng(11)
    n, dim = 300, 64
    import pyarrow as pa
    import pyarrow.parquet as pq
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n, dtype="int64")),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 3, n).astype("int32")),
    }), os.path.join(d, "embeddings.parquet"))

    got = (q_embed_cluster_cap(d).to_pandas()
           .sort_values(["cluster", "rk"]).reset_index(drop=True))
    exp = (_con(d, ["embeddings"])
           .execute(ORACLE_SQL["embed_cluster_cap"]).df()
           .sort_values(["cluster", "rk"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    per = got.groupby("cluster")["rk"]
    assert (per.max() <= 32).all() and (per.min() == 1).all()
    for _, g in got.groupby("cluster"):
        assert g["rk"].tolist() == list(range(1, len(g) + 1))
        assert (g.sort_values("rk")["dist"].diff().dropna() >= 0).all()


def test_io_jsonl_roundtrip_synthetic(ray_session, tmp_path):
    """JSONL export -> read_json round-trip is lossless for the
    aggregate: per-lang doc counts + char sums over a fixture with
    unicode lang tags and char counts past 2^31 survive byte-exact."""
    from ocr_ray.pipelines.queries import (ORACLE_SQL,
                                           q_io_jsonl_roundtrip)

    d = str(tmp_path)
    docs = pd.DataFrame({
        "doc_id": np.arange(7, dtype="int64"),
        "lang": ["en", "en", "de", "zh-中文", "zh-中文", "pt", "en"],
        "n_chars": np.array([10, 20, 5, 7, 9, 2_200_000_000, 1],
                            dtype="int64"),
        "text": [f"body {i}" for i in range(7)],
        "source": ["s"] * 7,
    })
    docs.to_parquet(os.path.join(d, "documents.parquet"))

    got = (q_io_jsonl_roundtrip(d)
           .sort_values("lang").reset_index(drop=True))
    exp = (_con(d, ["documents"])
           .execute(ORACLE_SQL["io_jsonl_roundtrip"]).df()
           .sort_values("lang").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    r = got.set_index("lang")
    assert int(r.loc["en", "n_docs"]) == 3
    assert int(r.loc["en", "sum_chars"]) == 31
    assert int(r.loc["pt", "sum_chars"]) == 2_200_000_000  # no int32 wrap
    assert int(r.loc["zh-中文", "n_docs"]) == 2            # unicode key
