"""Wave-18 operators: the exact -> near-dup cascade composite."""

import os
import tempfile

import pandas as pd


def test_pipeline_cascade_all_stages_bite(ray_session):
    """Every disposition arises on a synthetic corpus — exact dups collapse
    first (an exact copy of a near-dup member is labeled exact_dup, never
    near_dup), near-dup CHAINS merge into one component keeping the min id,
    uniques stay kept — and the engine matches the composed DuckDB oracle."""
    import duckdb

    from ocr_ray.pipelines.queries import ORACLE_SQL, q_pipeline_cascade

    base = " ".join(f"tok{i}" for i in range(200))
    mut1 = base.replace("tok50", "CHANGED")           # ~0.97 jacc vs base
    mut2 = mut1.replace("tok150", "ALTERED")          # chain: base~mut1~mut2
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base},                  # exact dup of 0
        {"doc_id": 2, "text": base},                  # exact dup of 0
        {"doc_id": 10, "text": mut1},                 # near dup of 0
        {"doc_id": 11, "text": mut2},                 # near dup via chain
        {"doc_id": 12, "text": mut2},                 # EXACT dup of 11
        {"doc_id": 20, "text": "completely different short doc"},
        {"doc_id": 21, "text": " ".join(f"z{i}" for i in range(50))},
    ]
    df = pd.DataFrame(rows)

    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        got = (q_pipeline_cascade(d).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(
            f"create view documents as select * from "
            f"'{os.path.join(d, 'documents.parquet')}'")
        exp = (con.execute(ORACLE_SQL["pipeline_cascade"]).df()
               .sort_values("doc_id").reset_index(drop=True))
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns)
    pd.testing.assert_frame_equal(got[cols], exp[cols], check_dtype=False)

    st = dict(zip(got["doc_id"], got["status"]))
    assert st[0] == "kept"            # min id of the whole near-dup cluster
    assert st[1] == st[2] == "exact_dup"
    assert st[10] == "near_dup"
    assert st[11] == "near_dup"       # chain member, collapsed to 0
    assert st[12] == "exact_dup"      # exact copy of a near-dup member
    assert st[20] == st[21] == "kept"
    assert len(got) == len(df)        # one disposition per input doc


def test_pipeline_cascade_no_pairs(ray_session):
    """All-unique corpus: no exchange leg is empty-schema-poisoned and
    every doc comes back 'kept'."""
    from ocr_ray.pipelines.queries import q_pipeline_cascade

    df = pd.DataFrame({
        "doc_id": range(6),
        "text": [" ".join(f"u{i}_{j}" for j in range(20)) for i in range(6)],
    })
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        got = q_pipeline_cascade(d).to_pandas()
    assert sorted(got["doc_id"]) == list(range(6))
    assert (got["status"] == "kept").all()
