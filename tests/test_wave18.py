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


def test_q14_q19_orphan_partkey_inner_join(ray_session):
    """A lineitem whose l_partkey has no part row must DROP (inner-join
    semantics), not silently probe a neighboring part — pinned against
    the composed DuckDB oracles on a synthetic pair of tables."""
    import duckdb

    from ocr_ray.pipelines.queries import (ORACLE_SQL, q_q14_promo,
                                           q_q19_brand_qty)

    part = pd.DataFrame({
        "p_partkey": [1, 2, 3],
        "p_name": ["a", "b", "c"],
        "p_brand": ["Brand#12", "Brand#23", "Brand#34"],
        "p_type": ["PROMO", "STANDARD", "PROMO"],
        "p_size": [3, 5, 10],
        "p_retailprice": [10.0, 20.0, 30.0],
    })
    li = pd.DataFrame({
        "l_partkey": [1, 2, 3, 99],          # 99 is an orphan
        "l_quantity": [5.0, 15.0, 25.0, 5.0],
        "l_extendedprice": [100.0, 200.0, 300.0, 400.0],
        "l_discount": [0.05, 0.0, 0.1, 0.05],
        "l_shipdate": pd.to_datetime(["1996-03-10"] * 4),
    })
    with tempfile.TemporaryDirectory() as d:
        part.to_parquet(os.path.join(d, "part.parquet"))
        li.to_parquet(os.path.join(d, "lineitem.parquet"))
        con = duckdb.connect()
        for t in ("part", "lineitem"):
            con.execute(f"create view {t} as select * from "
                        f"'{os.path.join(d, t + '.parquet')}'")
        for fn, name in ((q_q14_promo, "q14_promo"),
                         (q_q19_brand_qty, "q19_brand_qty")):
            got = fn(d).reset_index(drop=True)
            exp = con.execute(ORACLE_SQL[name]).df().reset_index(drop=True)
            cols = sorted(got.columns)
            pd.testing.assert_frame_equal(got[cols], exp[cols],
                                          check_dtype=False)
            if name == "q14_promo":
                # the orphan really was at stake: total joins 3 of 4 rows
                assert int(got.loc[0, "n_rows"]) == 3
