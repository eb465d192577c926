"""Wave-20 operators: q12 ship lag, q16 supplier counts, q20 qualified
shippers, q21 sole-late supplier, q22 lost customers — every predicate
edge exercised on a hand-built star schema and value-compared to the
DuckDB oracle."""

import os
import tempfile

import pandas as pd


def _write_tables(d):
    pd.DataFrame({
        "n_nationkey": [1, 2],
        "n_name": ["NATION_1", "NATION_2"],
        "n_regionkey": [0, 0],
    }).to_parquet(os.path.join(d, "nation.parquet"))
    pd.DataFrame({
        "s_suppkey": [1, 2, 3, 4],
        "s_name": ["s_one", "s_two", "s_three", "s_four"],
        "s_nationkey": [1, 1, 2, 2],
        "s_acctbal": [0.0] * 4,
    }).to_parquet(os.path.join(d, "supplier.parquet"))
    pd.DataFrame({
        # p1 passes every q16 filter and is 'small'-prefixed for q20;
        # p2 prefix-matches q20 ('smallish') but is Brand#45 (q16 out);
        # p3 is PROMO (q16 out); p4 size 5 not in the q16 size set;
        # p5 passes q16, not small-prefixed
        "p_partkey": [1, 2, 3, 4, 5],
        "p_name": ["small ring", "smallish bolt", "red gear",
                   "blue gizmo", "hot widget"],
        "p_brand": ["Brand#11", "Brand#45", "Brand#12", "Brand#13",
                    "Brand#14"],
        "p_type": ["ECONOMY", "ECONOMY", "PROMO", "LARGE", "MEDIUM"],
        "p_size": [1, 4, 7, 5, 10],
        "p_retailprice": [1.0] * 5,
    }).to_parquet(os.path.join(d, "part.parquet"))
    pd.DataFrame({
        # positive balances: 100+300+250+350 -> sum_c=100000, n_pos=4.
        # B (300.00): 120000 > 100000, no post-1999 order -> the ONE hit.
        # D (250.00): 100000 == 100000 -> strict > excludes (boundary).
        # F (350.00): above avg but has a 1999 order -> anti-joined out.
        # C negative and E zero never enter the average.
        "c_custkey": [100, 200, 300, 400, 500, 600],
        "c_name": ["A", "B", "D", "C", "F", "E"],
        "c_nationkey": [1, 1, 2, 2, 2, 1],
        "c_acctbal": [100.0, 300.0, 250.0, -50.0, 350.0, 0.0],
        "c_mktsegment": ["X"] * 6,
    }).to_parquet(os.path.join(d, "customer.parquet"))
    pd.DataFrame({
        # o1: F, single-supplier late (q21 needs n_supp>1 -> excluded);
        #     1998 order keeps customer B "lost" for q22.
        # o2: customer F's 1999 order (q22 anti-join arm).
        # o3: F, 2-HIGH, suppliers s1 late / s2 on-time -> q21 blames s1.
        # o4: F, 3-MEDIUM, two late suppliers -> q21 excluded.
        # o5: P status -> q21 excluded even though s1 is late on it.
        "o_orderkey": [1, 2, 3, 4, 5],
        "o_custkey": [200, 500, 100, 100, 300],
        "o_orderstatus": ["F", "O", "F", "F", "P"],
        "o_totalprice": [0.0] * 5,
        "o_orderdate": pd.to_datetime(
            ["1998-06-01", "1999-06-01", "1996-01-01", "1996-01-10",
             "1996-02-01"]),
        "o_orderpriority": ["1-URGENT", "5-LOW", "2-HIGH", "3-MEDIUM",
                            "1-URGENT"],
    }).to_parquet(os.path.join(d, "orders.parquet"))
    pd.DataFrame({
        "l_orderkey": [3, 3, 3, 3, 4, 4, 5, 1, 3, 4],
        "l_partkey": [1, 1, 3, 5, 1, 4, 1, 2, 99, 2],
        "l_suppkey": [1, 2, 2, 2, 1, 3, 1, 4, 1, 3],
        "l_linenumber": [1, 2, 3, 4, 1, 2, 1, 1, 5, 3],
        # q20 centiunits: s1 small-qty 10000+5000+4000=19000 (> 10000 in);
        # s2 6000 (< in-window small); s3 exactly 10000 via the last row
        # (strict > excludes); s4's 1998 ship is outside the window.
        "l_quantity": [100.0, 60.0, 10.0, 40.0, 50.0, 30.0, 40.0, 500.0,
                       10.0, 100.0],
        "l_extendedprice": [1.0] * 10,
        "l_discount": [0.0] * 10,
        "l_tax": [0.0] * 10,
        "l_returnflag": ["N"] * 10,
        "l_linestatus": ["O"] * 10,
        # row 3 ships EXACTLY 60 days after o3's order date (1996-01-01 +
        # 60d = 1996-03-01, leap year) -> on-time under the strict >.
        # rows 2 and 4 share (o3, 1996-02-15) -> the q12 combiner merges
        # them into one n=2 partial.  row 9 is an orphan partkey (99):
        # q16/q20 drop it, q12/q21 (no part join) keep it.
        "l_shipdate": pd.to_datetime(
            ["1996-03-15", "1996-02-15", "1996-03-01", "1996-02-15",
             "1996-06-01", "1996-07-01", "1996-08-01", "1998-09-01",
             "1996-04-01", "1996-05-01"]),
    }).to_parquet(os.path.join(d, "lineitem.parquet"))


def test_q12_q16_q20_q21_q22_synthetic_parity(ray_session):
    import duckdb

    from ocr_ray.pipelines.queries import (
        ORACLE_SQL, q_q12_ship_lag, q_q16_supplier_cnt,
        q_q20_qualified_shippers, q_q21_late_supplier,
        q_q22_lost_customers)

    with tempfile.TemporaryDirectory() as d:
        _write_tables(d)
        con = duckdb.connect()
        for t in ("nation", "supplier", "part", "customer", "orders",
                  "lineitem"):
            con.execute(f"create view {t} as select * from "
                        f"'{os.path.join(d, t + '.parquet')}'")
        for fn, name in ((q_q12_ship_lag, "q12_ship_lag"),
                         (q_q16_supplier_cnt, "q16_supplier_cnt"),
                         (q_q20_qualified_shippers, "q20_qualified_shippers"),
                         (q_q21_late_supplier, "q21_late_supplier"),
                         (q_q22_lost_customers, "q22_lost_customers")):
            got = fn(d).reset_index(drop=True)
            exp = con.execute(ORACLE_SQL[name]).df().reset_index(drop=True)
            cols = sorted(got.columns)
            assert cols == sorted(exp.columns), name
            pd.testing.assert_frame_equal(got[cols], exp[cols],
                                          check_dtype=False), name

        # the edges really were at stake:
        q12 = q_q12_ship_lag(d).set_index("priority_class")
        # high = o3 (2-HIGH) + o5 (1-URGENT): late rows mar15/apr1/aug1,
        # on-time rows feb15 x2 (combiner n=2) + the exact-60-day mar 1
        assert (int(q12.loc["high", "late_count"]),
                int(q12.loc["high", "ontime_count"])) == (3, 3)
        # low = o4 (3-MEDIUM): all three ship months late, none on time
        assert (int(q12.loc["low", "late_count"]),
                int(q12.loc["low", "ontime_count"])) == (3, 0)

        q16 = q_q16_supplier_cnt(d)
        # only p1 (s1+s2 distinct despite s1's three shipments) and p5 (s2)
        assert q16["p_brand"].tolist() == ["Brand#11", "Brand#14"]
        assert q16["supplier_cnt"].tolist() == [2, 1]

        q20 = q_q20_qualified_shippers(d)
        # s1 at 19000 > 10000 in; s3 at EXACTLY 10000 out (strict >);
        # s2 under; s4 out of window
        assert q20["s_suppkey"].tolist() == [1]
        assert q20["qty_c"].tolist() == [19000]

        q21 = q_q21_late_supplier(d)
        # only o3 is a multi-supplier F order with exactly one late
        # supplier; the orphan-part row does not double-count s1
        assert q21["s_suppkey"].tolist() == [1]
        assert q21["numwait"].tolist() == [1]

        q22 = q_q22_lost_customers(d)
        assert q22["nation"].tolist() == ["NATION_1"]
        assert q22["n_cust"].tolist() == [1]
        assert q22["bal_c"].tolist() == [30000]


def test_bm25_topk_semantics(ray_session):
    """BM25 vs a hand-rolled brute-force reference on a tiny corpus:
    exact scores (to the 6-dp contract), rank order, zero-match docs
    filling the tail with score 0, repeated query terms deduped, and the
    empty-corpus typed-empty path."""
    import math

    import numpy as np
    import ray.data as rd

    from ocr_ray.stages.rag import bm25_topk

    texts = {
        1: "data data data pipeline",          # heavy tf, short doc
        2: "data pipeline value stream stream stream stream stream",
        3: "value",                            # rare-term doc, tiny dl
        4: "stream batch shuffle arrow",       # zero-match
        5: "data " * 50,                       # tf saturation vs doc 1
    }
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())}))
    # repeated 'data' must not double-count the term
    got = bm25_topk(docs, ["data", "pipeline", "value", "data"], k=5)

    # brute force
    toks = {i: t.split() for i, t in texts.items()}
    n = len(texts)
    avgdl = sum(len(v) for v in toks.values()) / n
    def idf(term):
        df = sum(1 for v in toks.values() if term in v)
        return math.log(1 + (n - df + 0.5) / (df + 0.5))
    def score(i):
        dl = len(toks[i])
        s = 0.0
        for t in ["data", "pipeline", "value"]:
            tf = toks[i].count(t)
            s += idf(t) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        return round(s, 6)
    exp = sorted(((score(i), i) for i in texts),
                 key=lambda p: (-p[0], p[1]))
    assert got["doc_id"].tolist() == [i for _, i in exp]
    assert np.allclose(got["score"].to_numpy(),
                       [s for s, _ in exp], atol=1e-9)
    # the zero-match doc is present with exactly 0
    assert got.loc[got["doc_id"] == 4, "score"].iloc[0] == 0.0
    # saturation: doc 5's 50x tf must not scale linearly over doc 1's 3x
    s1 = got.loc[got["doc_id"] == 1, "score"].iloc[0]
    s5 = got.loc[got["doc_id"] == 5, "score"].iloc[0]
    assert s5 < 3 * s1

    empty = bm25_topk(
        rd.from_pandas(pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                     "text": pd.Series(dtype=object)})),
        ["data"], k=5)
    assert list(empty.columns) == ["doc_id", "score"] and not len(empty)


def test_wave20_queries_empty_inputs(ray_session, tmp_path):
    """All-empty base tables must return TYPED empty frames (Ray drops
    columns on all-empty outputs) instead of raising in the final
    astype/driver arithmetic."""
    d = str(tmp_path)
    pd.DataFrame({
        "l_orderkey": pd.Series(dtype="int64"),
        "l_partkey": pd.Series(dtype="int64"),
        "l_suppkey": pd.Series(dtype="int64"),
        "l_linenumber": pd.Series(dtype="int32"),
        "l_quantity": pd.Series(dtype="float64"),
        "l_extendedprice": pd.Series(dtype="float64"),
        "l_discount": pd.Series(dtype="float64"),
        "l_tax": pd.Series(dtype="float64"),
        "l_returnflag": pd.Series(dtype=object),
        "l_linestatus": pd.Series(dtype=object),
        "l_shipdate": pd.Series(dtype="datetime64[us]"),
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    pd.DataFrame({
        "o_orderkey": pd.Series(dtype="int64"),
        "o_custkey": pd.Series(dtype="int64"),
        "o_orderstatus": pd.Series(dtype=object),
        "o_totalprice": pd.Series(dtype="float64"),
        "o_orderdate": pd.Series(dtype="datetime64[us]"),
        "o_orderpriority": pd.Series(dtype=object),
    }).to_parquet(os.path.join(d, "orders.parquet"))
    pd.DataFrame({
        "p_partkey": pd.Series(dtype="int64"),
        "p_name": pd.Series(dtype=object),
        "p_brand": pd.Series(dtype=object),
        "p_type": pd.Series(dtype=object),
        "p_size": pd.Series(dtype="int32"),
        "p_retailprice": pd.Series(dtype="float64"),
    }).to_parquet(os.path.join(d, "part.parquet"))
    pd.DataFrame({
        "s_suppkey": pd.Series(dtype="int64"),
        "s_name": pd.Series(dtype=object),
        "s_nationkey": pd.Series(dtype="int32"),
        "s_acctbal": pd.Series(dtype="float64"),
    }).to_parquet(os.path.join(d, "supplier.parquet"))
    pd.DataFrame({
        "c_custkey": pd.Series(dtype="int64"),
        "c_name": pd.Series(dtype=object),
        "c_nationkey": pd.Series(dtype="int32"),
        "c_acctbal": pd.Series(dtype="float64"),
        "c_mktsegment": pd.Series(dtype=object),
    }).to_parquet(os.path.join(d, "customer.parquet"))
    pd.DataFrame({
        "n_nationkey": pd.Series(dtype="int32"),
        "n_name": pd.Series(dtype=object),
        "n_regionkey": pd.Series(dtype="int32"),
    }).to_parquet(os.path.join(d, "nation.parquet"))

    from ocr_ray.pipelines.queries import (
        q_q12_ship_lag, q_q16_supplier_cnt, q_q20_qualified_shippers,
        q_q21_late_supplier, q_q22_lost_customers)

    for fn, cols in (
        (q_q12_ship_lag, ["priority_class", "late_count", "ontime_count"]),
        (q_q16_supplier_cnt, ["p_brand", "p_type", "p_size", "supplier_cnt"]),
        (q_q20_qualified_shippers, ["s_suppkey", "s_name", "qty_c"]),
        (q_q21_late_supplier, ["s_suppkey", "s_name", "numwait"]),
        (q_q22_lost_customers, ["nation", "n_cust", "bal_c"]),
    ):
        out = fn(d)
        assert list(out.columns) == cols, fn.__name__
        assert not len(out), fn.__name__


def test_bm25_rerank_cascade(ray_session):
    """The rerank stage is a pure permutation of the BM25 shortlist: same
    doc ids, rk is 1..n by (model_score DESC, doc_id), and the expensive
    scorer runs only on shortlist members (pinned by the row count)."""
    sf = "/root/testdata/sf0.001"
    from ocr_ray.pipelines.queries import q_rag_bm25_rerank, q_rag_bm25_topk

    top = q_rag_bm25_topk(sf)
    rer = q_rag_bm25_rerank(sf)
    assert len(rer) == 50
    # top-10 ids are a subset of the 50-doc shortlist the rerank permutes
    assert set(top["doc_id"]) <= set(rer["doc_id"])
    assert rer["rk"].tolist() == list(range(1, 51))
    ms = rer["model_score"].to_numpy()
    # rerank order: model_score non-increasing, doc_id ascending on ties
    assert (ms[:-1] >= ms[1:]).all()
    ties = ms[:-1] == ms[1:]
    ids = rer["doc_id"].to_numpy()
    assert (ids[:-1][ties] < ids[1:][ties]).all()
    # and it genuinely reorders: the BM25-score order differs from rk
    assert not rer["score"].is_monotonic_decreasing


def test_events_markov_synthetic_parity(ray_session, tmp_path):
    """Transition counts vs DuckDB on a hand-built event log: ts ties break
    on event_id, single-event users emit nothing, and a SQL-null user
    group chains like PARTITION BY (factorize-coded boundaries — a plain
    != would break every null-null adjacency)."""
    import duckdb
    import numpy as np

    from ocr_ray.pipelines.queries import ORACLE_SQL, q_events_markov

    d = str(tmp_path)
    ev = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6, 7, 8, 9],
        "ts": pd.to_datetime([
            "2026-01-01 10:00", "2026-01-01 10:05", "2026-01-01 10:05",
            "2026-01-01 11:00", "2026-01-02 09:00", "2026-01-02 09:01",
            "2026-01-01 08:00", "2026-01-03 12:00", "2026-01-03 12:30",
        ]),
        # user 1: a->(b,c tie on ts: event_id 2 then 3)->d
        # user 2: a->a ; user 3: single event, no transitions
        # null user: two events -> one b->c transition
        "user_id": pd.array([1, 1, 1, 1, 2, 2, 3, None, None],
                            dtype="Int64"),
        "event_type": ["a", "b", "c", "d", "a", "a", "a", "b", "c"],
        "value": [0.0] * 9,
        "props": ["{}"] * 9,
    })
    ev.to_parquet(os.path.join(d, "events.parquet"))

    got = q_events_markov(d).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"create view events as select * from "
                f"'{os.path.join(d, 'events.parquet')}'")
    exp = con.execute(ORACLE_SQL["events_markov"]).df().reset_index(drop=True)
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns)
    pd.testing.assert_frame_equal(got[cols], exp[cols], check_dtype=False)
    # the edges were at stake: the tie resolved b-before-c via event_id,
    # the null-user pair chained, the single-event user vanished
    as_dict = {(r.src_type, r.dst_type): r.n_trans for r in got.itertuples()}
    assert as_dict[("a", "b")] == 1 and as_dict[("b", "c")] == 2
    assert as_dict[("c", "d")] == 1 and as_dict[("a", "a")] == 1
    assert sum(as_dict.values()) == 5


def test_fk_violations_counts_orphans(ray_session, tmp_path):
    """The gate actually counts: plant orphans on every FK edge (including
    duplicates of one orphan key — each ROW counts) and pin the per-edge
    totals against DuckDB and by hand."""
    import duckdb

    from ocr_ray.pipelines.queries import ORACLE_SQL, q_fk_violations

    d = str(tmp_path)
    pd.DataFrame({"o_orderkey": [1, 2], "o_custkey": [10, 99],  # 99 orphan
                  "o_orderstatus": ["F", "O"], "o_totalprice": [0.0, 0.0],
                  "o_orderdate": pd.to_datetime(["1996-01-01"] * 2),
                  "o_orderpriority": ["1-URGENT"] * 2,
                  }).to_parquet(os.path.join(d, "orders.parquet"))
    pd.DataFrame({"c_custkey": [10], "c_name": ["c"], "c_nationkey": [1],
                  "c_acctbal": [0.0], "c_mktsegment": ["X"],
                  }).to_parquet(os.path.join(d, "customer.parquet"))
    pd.DataFrame({"p_partkey": [5], "p_name": ["small ring"],
                  "p_brand": ["Brand#11"], "p_type": ["ECONOMY"],
                  "p_size": [1], "p_retailprice": [1.0],
                  }).to_parquet(os.path.join(d, "part.parquet"))
    pd.DataFrame({"s_suppkey": [7], "s_name": ["s"], "s_nationkey": [1],
                  "s_acctbal": [0.0],
                  }).to_parquet(os.path.join(d, "supplier.parquet"))
    pd.DataFrame({
        # rows: clean / orphan order (x2 dup key: both rows count) /
        # orphan part / orphan supplier
        "l_orderkey": [1, 33, 33, 1, 1],
        "l_partkey": [5, 5, 5, 44, 5],
        "l_suppkey": [7, 7, 7, 7, 55],
        "l_linenumber": [1, 1, 2, 2, 3],
        "l_quantity": [1.0] * 5, "l_extendedprice": [1.0] * 5,
        "l_discount": [0.0] * 5, "l_tax": [0.0] * 5,
        "l_returnflag": ["N"] * 5, "l_linestatus": ["O"] * 5,
        "l_shipdate": pd.to_datetime(["1996-02-01"] * 5),
    }).to_parquet(os.path.join(d, "lineitem.parquet"))

    got = q_fk_violations(d)
    con = duckdb.connect()
    for t in ("orders", "customer", "part", "supplier", "lineitem"):
        con.execute(f"create view {t} as select * from "
                    f"'{os.path.join(d, t + '.parquet')}'")
    exp = con.execute(ORACLE_SQL["fk_violations"]).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    as_dict = dict(zip(got["fk"], got["n_orphans"]))
    assert as_dict["lineitem.l_orderkey->orders"] == 2  # dup orphan rows
    assert as_dict["lineitem.l_partkey->part"] == 1
    assert as_dict["lineitem.l_suppkey->supplier"] == 1
    assert as_dict["orders.o_custkey->customer"] == 1


def test_query_surface_contract():
    """Every queries() entry is either DuckDB-oracle-checked or on the
    DOCUMENTED rows-only list (each rows-only entry has a dedicated
    replica/recall pytest).  A new query landing without an oracle now
    fails here instead of silently weakening the correctness gate."""
    import __ray_entry__ as e

    qs, sql = e.queries(), e.oracle_sql()
    ROWS_ONLY = {
        "ann_ivf", "ann_lsh_topk",            # recall pytests
        "rag_embed_answer", "rag_model_answer",  # replica pytests
        "multimodal_transcribe",              # A5 generative replica pytest
        "transcripts_extract", "transcripts_segments",
        "transcripts_benchmark",              # engine x layout timing matrix
        "transcripts_model_rescore", "transcripts_dpo_pairs",
        "embed_pca",                          # eigh replica pytest (wave-22)
        "dedup_minhash_est",                  # estimator pytest (round 4)
    }
    assert set(sql) <= set(qs), "oracle without a query"
    assert set(qs) - set(sql) == ROWS_ONLY, (
        "rows-only set drifted: " + repr(sorted(set(qs) - set(sql))))
    assert len(qs) >= 189


def test_q2_min_shipper_argmin_edges(ray_session, tmp_path):
    """Per-group argmin edges on a hand-built schema: exact qty ties break
    to the LOWEST suppkey, non-region suppliers never contend (even when
    they shipped less), and a part whose only shippers are out-of-region
    vanishes (inner semantics)."""
    import duckdb

    from ocr_ray.pipelines.queries import ORACLE_SQL, q_q2_min_shipper

    d = str(tmp_path)
    pd.DataFrame({"r_regionkey": [0, 1], "r_name": ["EUROPE", "ASIA"],
                  }).to_parquet(os.path.join(d, "region.parquet"))
    pd.DataFrame({"n_nationkey": [1, 2], "n_name": ["N1", "N2"],
                  "n_regionkey": [0, 1],
                  }).to_parquet(os.path.join(d, "nation.parquet"))
    pd.DataFrame({"s_suppkey": [1, 2, 3], "s_name": ["a", "b", "c"],
                  "s_nationkey": [1, 1, 2],  # s3 out of region
                  "s_acctbal": [0.0] * 3,
                  }).to_parquet(os.path.join(d, "supplier.parquet"))
    pd.DataFrame({"p_partkey": [10, 20, 30],
                  "p_name": ["x", "y", "z"], "p_brand": ["B"] * 3,
                  "p_type": ["T"] * 3, "p_size": [15, 15, 15],
                  "p_retailprice": [1.0] * 3,
                  }).to_parquet(os.path.join(d, "part.parquet"))
    pd.DataFrame({
        # part 10: s1 and s2 tie at 5.0 -> s1 wins (lowest suppkey);
        #          s3 shipped only 1.0 but is out of region -> ignored
        # part 20: s2 (3.0) beats s1 (4.0)
        # part 30: only s3 shipped it -> part absent from the result
        "l_orderkey": [1] * 6, "l_linenumber": list(range(1, 7)),
        "l_partkey": [10, 10, 10, 20, 20, 30],
        "l_suppkey": [1, 2, 3, 1, 2, 3],
        "l_quantity": [5.0, 5.0, 1.0, 4.0, 3.0, 2.0],
        "l_extendedprice": [1.0] * 6, "l_discount": [0.0] * 6,
        "l_tax": [0.0] * 6, "l_returnflag": ["N"] * 6,
        "l_linestatus": ["O"] * 6,
        "l_shipdate": pd.to_datetime(["1996-01-01"] * 6),
    }).to_parquet(os.path.join(d, "lineitem.parquet"))

    got = q_q2_min_shipper(d)
    con = duckdb.connect()
    for t in ("region", "nation", "supplier", "part", "lineitem"):
        con.execute(f"create view {t} as select * from "
                    f"'{os.path.join(d, t + '.parquet')}'")
    exp = con.execute(ORACLE_SQL["q2_min_shipper"]).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got["p_partkey"].tolist() == [10, 20]
    assert got["s_suppkey"].tolist() == [1, 2]   # tie -> lowest key; then min
    assert got["qty_c"].tolist() == [500, 300]


def test_snapshot_diff_semantics(ray_session):
    """snapshot_diff per-row statuses on hand-built sides: added / removed
    / changed / unchanged all present, null-vs-null compares unchanged and
    null-vs-value changed (hash fold = IS NOT DISTINCT FROM), duplicate
    keys within a side rejected loudly, null keys rejected loudly."""
    import pytest
    import ray.data as rd

    from ocr_ray.stages.validate import snapshot_diff

    left = rd.from_pandas(pd.DataFrame({
        "k": [1, 2, 3, 4, 5],
        "v": ["a", "b", None, "d", None],
    }))
    right = rd.from_pandas(pd.DataFrame({
        "k": [1, 2, 3, 5, 9],
        # 1 unchanged, 2 changed, 3 null->value changed, 5 null==null
        # unchanged; 4 removed; 9 added
        "v": ["a", "B", "c", None, "z"],
    }))
    out = snapshot_diff(left, right, key_col="k",
                        compare_cols=["v"]).to_pandas()
    got = dict(zip(out["k"].astype(int), out["status"]))
    assert got == {1: "unchanged", 2: "changed", 3: "changed",
                   4: "removed", 5: "unchanged", 9: "added"}

    dup = rd.from_pandas(pd.DataFrame({"k": [1, 1], "v": ["a", "b"]}))
    with pytest.raises(Exception, match="duplicate k"):
        snapshot_diff(dup, right, key_col="k",
                      compare_cols=["v"]).to_pandas()

    nullk = rd.from_pandas(pd.DataFrame({"k": pd.array([1, None],
                                                       dtype="Int64"),
                                         "v": ["a", "b"]}))
    with pytest.raises(Exception, match="null k"):
        snapshot_diff(nullk, right, key_col="k",
                      compare_cols=["v"]).to_pandas()
