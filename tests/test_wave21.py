"""Wave-21 hardening: null FK keys are violations (not a crash / silent
under-count), the wave-18 relational queries survive all-empty base tables
(driver dim reads + schema guards), and BM25 treats NULL text as an empty
document instead of the literal token "none"."""

import os

import numpy as np
import pandas as pd
import pytest


def _write_star(d: str, *, lineitem=None, orders=None):
    """Write a minimal star schema; lineitem/orders overridable."""
    (lineitem if lineitem is not None else pd.DataFrame({
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
    })).to_parquet(os.path.join(d, "lineitem.parquet"))
    (orders if orders is not None else pd.DataFrame({
        "o_orderkey": pd.Series(dtype="int64"),
        "o_custkey": pd.Series(dtype="int64"),
        "o_orderstatus": pd.Series(dtype=object),
        "o_totalprice": pd.Series(dtype="float64"),
        "o_orderdate": pd.Series(dtype="datetime64[us]"),
        "o_orderpriority": pd.Series(dtype=object),
    })).to_parquet(os.path.join(d, "orders.parquet"))
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
    pd.DataFrame({
        "r_regionkey": pd.Series(dtype="int32"),
        "r_name": pd.Series(dtype=object),
    }).to_parquet(os.path.join(d, "region.parquet"))
    pd.DataFrame({
        "event_id": pd.Series(dtype="int64"),
        "ts": pd.Series(dtype="datetime64[us]"),
        "user_id": pd.Series(dtype="int64"),
        "event_type": pd.Series(dtype=object),
        "value": pd.Series(dtype="float64"),
        "props": pd.Series(dtype=object),
    }).to_parquet(os.path.join(d, "events.parquet"))
    pd.DataFrame({
        "doc_id": pd.Series(dtype="int64"),
        "text": pd.Series(dtype=object),
        "lang": pd.Series(dtype=object),
        "source": pd.Series(dtype=object),
        "n_chars": pd.Series(dtype="int64"),
    }).to_parquet(os.path.join(d, "documents.parquet"))


def test_null_fk_keys_are_violations(ray_session, tmp_path):
    """A NULL child FK references nothing -> it IS an orphan.  The engine
    must not crash on the int64 cast, and the oracle must not silently
    drop it via naive NOT IN three-valued logic.  Engine == oracle ==
    hand count."""
    import duckdb

    from ocr_ray.pipelines.queries import ORACLE_SQL, q_fk_violations

    d = str(tmp_path)
    lineitem = pd.DataFrame({
        # row 0 clean; row 1 null partkey (violation); row 2 null suppkey
        # AND orphan orderkey (two different edges each count once)
        "l_orderkey": pd.array([1, 1, 99], dtype="Int64"),
        "l_partkey": pd.array([5, None, 5], dtype="Int64"),
        "l_suppkey": pd.array([7, 7, None], dtype="Int64"),
        "l_linenumber": [1, 2, 3],
        "l_quantity": [1.0] * 3, "l_extendedprice": [1.0] * 3,
        "l_discount": [0.0] * 3, "l_tax": [0.0] * 3,
        "l_returnflag": ["N"] * 3, "l_linestatus": ["O"] * 3,
        "l_shipdate": pd.to_datetime(["1996-02-01"] * 3),
    })
    orders = pd.DataFrame({
        "o_orderkey": pd.array([1, 2], dtype="Int64"),
        "o_custkey": pd.array([10, None], dtype="Int64"),  # null custkey
        "o_orderstatus": ["F", "O"], "o_totalprice": [0.0, 0.0],
        "o_orderdate": pd.to_datetime(["1996-01-01"] * 2),
        "o_orderpriority": ["1-URGENT"] * 2,
    })
    _write_star(d, lineitem=lineitem, orders=orders)
    pd.DataFrame({"p_partkey": [5], "p_name": ["small ring"],
                  "p_brand": ["Brand#11"], "p_type": ["ECONOMY"],
                  "p_size": [1], "p_retailprice": [1.0],
                  }).to_parquet(os.path.join(d, "part.parquet"))
    pd.DataFrame({"s_suppkey": [7], "s_name": ["s"], "s_nationkey": [1],
                  "s_acctbal": [0.0],
                  }).to_parquet(os.path.join(d, "supplier.parquet"))
    pd.DataFrame({"c_custkey": [10], "c_name": ["c"], "c_nationkey": [1],
                  "c_acctbal": [0.0], "c_mktsegment": ["X"],
                  }).to_parquet(os.path.join(d, "customer.parquet"))

    got = q_fk_violations(d)
    con = duckdb.connect()
    for t in ("orders", "customer", "part", "supplier", "lineitem"):
        con.execute(f"create view {t} as select * from "
                    f"'{os.path.join(d, t + '.parquet')}'")
    exp = con.execute(ORACLE_SQL["fk_violations"]).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    as_dict = dict(zip(got["fk"], got["n_orphans"]))
    assert as_dict["lineitem.l_orderkey->orders"] == 1   # key 99
    assert as_dict["lineitem.l_partkey->part"] == 1      # the null
    assert as_dict["lineitem.l_suppkey->supplier"] == 1  # the null
    assert as_dict["orders.o_custkey->customer"] == 1    # the null


def test_wave18_queries_empty_inputs(ray_session, tmp_path):
    """All-empty base tables: the wave-18 relational queries (broadcast
    dim builds included) return typed frames instead of KeyError-ing on
    dropped columns."""
    d = str(tmp_path)
    _write_star(d)

    from ocr_ray.pipelines.queries import (
        q_events_histogram, q_events_markov, q_events_trend,
        q_fk_violations, q_orders_reconcile, q_q2_min_shipper,
        q_q6_forecast, q_q8_market_share, q_q9_profit, q_q14_promo,
        q_q15_top_supplier, q_q19_brand_qty, q_rag_bm25_topk,
        q_snapshot_diff, q_table_profile, q_table_profile_hll)

    for fn, cols, n in (
        (q_q6_forecast, ["rev_cpm", "n_rows"], 1),
        (q_q14_promo, ["promo_cpm", "total_cpm", "n_rows"], 1),
        (q_q19_brand_qty, ["rev_cpm", "n_rows"], 1),
        (q_q15_top_supplier, ["s_suppkey", "s_name", "total_rev_cpm"], 0),
        (q_q8_market_share, ["o_year", "target_cpm", "total_cpm"], 0),
        (q_q9_profit, ["nation", "o_year", "profit_cpm"], 0),
        (q_q2_min_shipper, ["p_partkey", "s_suppkey", "s_name", "qty_c"], 0),
        (q_events_markov, ["src_type", "dst_type", "n_trans"], 0),
        (q_snapshot_diff, ["status", "n"], 0),
        (q_rag_bm25_topk, ["doc_id", "score"], 0),
        (q_events_trend, ["event_type", "slope_num", "slope_den"], 0),
        (q_events_histogram, ["event_type", "bin", "n"], 0),
        (q_orders_reconcile,
         ["n_orders", "n_no_lines", "n_match", "n_mismatch",
          "max_abs_diff"], 1),
        (q_table_profile,
         ["col", "n", "n_null", "n_distinct", "min_str", "max_str"], 6),
        (q_table_profile_hll,
         ["col", "m", "n_zero_registers", "sum_rho", "est_raw",
          "est_distinct"], 6),
    ):
        out = fn(d)
        assert list(out.columns) == cols, fn.__name__
        assert len(out) == n, fn.__name__
        if fn is q_q6_forecast:
            assert int(out["rev_cpm"].iloc[0]) == 0

    fk = q_fk_violations(d)
    assert list(fk["n_orphans"]) == [0, 0, 0, 0]


def test_bm25_null_text_is_empty_doc(ray_session):
    """NULL text must contribute dl=0 / no terms — str(None) would emit
    the token 'none', inflating avgdl/df and matching a query term
    'none'."""
    import ray.data as rd

    from ocr_ray.stages.rag import bm25_topk

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["none of the data here", None, "data data data"],
    }))
    top = bm25_topk(docs, ["none", "data"], k=3)
    scores = dict(zip(top["doc_id"], top["score"]))
    # the null doc scores exactly 0 (no terms, dl=0)
    assert scores[2] == 0.0
    # doc 1 is the ONLY 'none' match: if the null doc tokenized as
    # "none", df('none') would be 2 and doc 2 would outscore 0
    assert scores[1] > scores[3] or (scores[1] > 0 and scores[3] > 0)
    # determinism: null handling keeps the stats integer-exact
    top2 = bm25_topk(docs, ["none", "data"], k=3)
    pd.testing.assert_frame_equal(top, top2)


def test_profile_table_semantics(ray_session, tmp_path):
    """profile_table vs DuckDB on a synthetic mixed-dtype table: nullable
    int64 stays integer-formatted (the pyarrow min_max rationale — a
    pandas batch would widen to float64 and emit '10.0'), an all-null
    column profiles with null bounds and 0 distinct, string bounds are
    lexicographic, and an empty table profiles as all-zero."""
    import duckdb
    import ray.data as rd

    from ocr_ray.stages.validate import profile_table

    df = pd.DataFrame({
        "k": pd.array([10, 2, None, 2, 30], dtype="Int64"),
        "f": [1.5, -2.25, 0.1, 1.5, None],
        "s": ["b", None, "a", "ab", "b"],
        "t": pd.to_datetime(["1996-01-02", None, "1995-12-31",
                             "1996-01-02", "2000-06-01"]),
        "all_null": pd.array([None] * 5, dtype="Int64"),
    })
    p = os.path.join(str(tmp_path), "t.parquet")
    df.to_parquet(p)
    cols = ["k", "f", "s", "t", "all_null"]
    got = profile_table(rd.read_parquet(p), cols)

    con = duckdb.connect()
    con.execute(f"create view t as select * from '{p}'")
    arms = " UNION ALL ".join(
        f"SELECT '{c}' AS col, count(*) AS n, count(*)-count({c}) AS n_null,"
        f" count(DISTINCT {c}) AS n_distinct,"
        f" CAST(min({c}) AS VARCHAR) AS min_str,"
        f" CAST(max({c}) AS VARCHAR) AS max_str FROM t" for c in cols)
    exp = con.execute(
        f"SELECT * FROM ({arms}) ORDER BY col").df()
    exp[["n", "n_null", "n_distinct"]] = exp[
        ["n", "n_null", "n_distinct"]].astype("int64")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    row = got.set_index("col")
    assert row.loc["k", "min_str"] == "2"          # integer, not '2.0'
    assert row.loc["k", "n_distinct"] == 3         # nulls excluded
    assert row.loc["all_null", "min_str"] is None
    assert row.loc["all_null", "n_distinct"] == 0
    assert row.loc["s", "min_str"] == "a" and row.loc["s", "max_str"] == "b"
    assert row.loc["f", "min_str"] == "-2.25"

    # empty table: all-zero profile, bounds null
    pe = os.path.join(str(tmp_path), "e.parquet")
    df.iloc[:0].to_parquet(pe)
    empty = profile_table(rd.read_parquet(pe), cols).set_index("col")
    assert (empty["n"] == 0).all() and (empty["n_distinct"] == 0).all()
    assert empty["min_str"].isna().all()


def test_hll_distinct_values_accuracy(ray_session, tmp_path):
    """The per-column HLL estimate lands within the 256-register error
    envelope of the exact count, an all-null column estimates 0 via
    linear counting, and the sketch is partitioning-invariant."""
    import ray.data as rd

    from ocr_ray.stages.aggregate import hll_distinct_values

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "key": np.arange(5000, dtype="int64"),          # all distinct
        "cat": rng.integers(0, 12, 5000).astype("int64"),  # 12 distinct
        "all_null": pd.array([None] * 5000, dtype="Int64"),
    })
    p = os.path.join(str(tmp_path), "t.parquet")
    df.to_parquet(p)

    est = hll_distinct_values(
        rd.read_parquet(p), ["key", "cat", "all_null"]).set_index("col")
    # 256 registers -> ~6.5% std error; allow 3 sigma
    assert abs(est.loc["key", "est_distinct"] - 5000) < 0.2 * 5000
    assert abs(est.loc["cat", "est_distinct"] - 12) < 3  # linear-count range
    assert est.loc["all_null", "est_distinct"] == 0.0
    assert est.loc["all_null", "n_zero_registers"] == 256

    # partitioning-invariance: registers are max-merged, so a different
    # partition count is bit-identical
    est2 = hll_distinct_values(
        rd.read_parquet(p).repartition(7), ["key", "cat", "all_null"],
        n_partitions=3).set_index("col")
    pd.testing.assert_frame_equal(est.reset_index(), est2.reset_index())


def test_orders_reconcile_all_arms(ray_session, tmp_path):
    """Reconciliation classifies every arm: an order whose lines sum
    EXACTLY to the header (integer cpm2 equality), a mismatching order
    with the diff reported in exact units, and a headers-without-lines
    order — engine == oracle == hand counts."""
    import duckdb

    from ocr_ray.pipelines.queries import ORACLE_SQL, q_orders_reconcile

    d = str(tmp_path)
    # order 1: one line, ext=100.00, disc=0.10, tax=0.20 ->
    #   line_v = 10000 * 900 * 1200 = 10_800_000_000 cpm2 = 108.00 total
    # order 2: header 50.00 but lines sum to 40.00 (no disc/tax) ->
    #   diff = (4000 - 5000) * 1e6 = 1e9 cpm2
    # order 3: no lines at all
    _write_star(
        d,
        lineitem=pd.DataFrame({
            "l_orderkey": [1, 2], "l_partkey": [5, 5], "l_suppkey": [7, 7],
            "l_linenumber": [1, 1], "l_quantity": [1.0, 1.0],
            "l_extendedprice": [100.0, 40.0],
            "l_discount": [0.10, 0.0], "l_tax": [0.20, 0.0],
            "l_returnflag": ["N"] * 2, "l_linestatus": ["O"] * 2,
            "l_shipdate": pd.to_datetime(["1996-02-01"] * 2),
        }),
        orders=pd.DataFrame({
            "o_orderkey": [1, 2, 3], "o_custkey": [10, 10, 10],
            "o_orderstatus": ["F"] * 3,
            "o_totalprice": [108.0, 50.0, 9.99],
            "o_orderdate": pd.to_datetime(["1996-01-01"] * 3),
            "o_orderpriority": ["1-URGENT"] * 3,
        }),
    )
    got = q_orders_reconcile(d)
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"create view {t} as select * from "
                    f"'{os.path.join(d, t + '.parquet')}'")
    exp = con.execute(ORACLE_SQL["orders_reconcile"]).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    r = got.iloc[0]
    assert (r["n_orders"], r["n_no_lines"], r["n_match"],
            r["n_mismatch"]) == (3, 1, 1, 1)
    assert r["max_abs_diff"] == 1_000_000_000


def test_events_attribution_edges(ray_session, tmp_path):
    """Attribution pins: inclusive 7-day boundary, exclusion past it,
    no cross-user leak through the run-boundary check, null users
    chaining as one partition, ts ties resolved by event_id, and clicks
    AFTER the purchase never used."""
    import duckdb

    from ocr_ray.pipelines.queries import ORACLE_SQL, q_events_attribution

    d = str(tmp_path)
    t0 = pd.Timestamp("2020-01-10 00:00:00")
    day = pd.Timedelta(days=1)
    rows = [
        # user 1: click exactly 7 days before purchase -> attributed
        (1, t0 - 7 * day, 1, "click"),
        (2, t0, 1, "purchase"),
        # user 2: click 7 days + 1 us before -> NOT attributed
        (3, t0 - 7 * day - pd.Timedelta(microseconds=1), 2, "click"),
        (4, t0, 2, "purchase"),
        # user 3: purchase BEFORE its user's only click; user 2's click
        # must not leak across the boundary either
        (5, t0, 3, "purchase"),
        (6, t0 + day, 3, "click"),
        # null users chain as ONE partition: click then purchase
        (7, t0, None, "click"),
        (8, t0 + day, None, "purchase"),
        # ts tie: two clicks at the same ts -> higher event_id wins
        (9, t0, 4, "click"),
        (10, t0, 4, "click"),
        (11, t0 + day, 4, "purchase"),
    ]
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type"])
    ev["user_id"] = pd.array(ev["user_id"], dtype="Int64")
    ev["value"] = 0.0
    ev["props"] = "{}"
    ev.to_parquet(os.path.join(d, "events.parquet"))

    got = q_events_attribution(d)
    con = duckdb.connect()
    con.execute(f"create view events as select * from "
                f"'{os.path.join(d, 'events.parquet')}'")
    exp = con.execute(ORACLE_SQL["events_attribution"]).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True),
        check_dtype=False)
    r = got.set_index("event_id")
    assert r.loc[2, "attributed_event_id"] == 1      # inclusive boundary
    assert r.loc[2, "lag_s"] == 7 * 86400
    assert pd.isna(r.loc[4, "attributed_event_id"])  # 1 us past window
    assert pd.isna(r.loc[5, "attributed_event_id"])  # later click unused
    assert r.loc[8, "attributed_event_id"] == 7      # null-user chain
    assert r.loc[11, "attributed_event_id"] == 10    # tie -> higher id


def test_compact_parquet_dir_reduces_files(ray_session, tmp_path):
    """Compaction actually coalesces: 64 fragment files become
    ceil(n/target) right-sized files with byte-identical content (row
    count, id set, value sum)."""
    import glob

    import ray.data as rd

    from ocr_ray.api import compact_parquet_dir

    frag = os.path.join(str(tmp_path), "frag")
    comp = os.path.join(str(tmp_path), "comp")
    df = pd.DataFrame({"doc_id": np.arange(10_000, dtype="int64"),
                       "n_chars": np.arange(10_000, dtype="int64") * 3})
    rd.from_pandas(df).repartition(64).write_parquet(frag)
    n_frag = len(glob.glob(os.path.join(frag, "*.parquet")))
    assert n_frag >= 32  # genuinely fragmented

    n_out = compact_parquet_dir(frag, comp, target_rows=4000)
    assert n_out == 3  # ceil(10000/4000)
    files = glob.glob(os.path.join(comp, "*.parquet"))
    assert len(files) <= n_out + 1  # writer may split on block boundary
    assert len(files) < n_frag / 4

    back = rd.read_parquet(comp).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df)


def test_pca_project_semantics(ray_session, tmp_path):
    """PCA pins: the basis is orthonormal with descending explained
    variance, the sign convention holds, a known low-rank subspace is
    recovered (trailing component variance ~ quantization noise), and
    the projection is bit-identical across partitionings (integer
    sufficient statistics -> one driver eigh)."""
    import ray.data as rd

    from ocr_ray.stages.cluster import pca_project

    rng = np.random.default_rng(3)
    n, dim, true_rank = 2000, 16, 3
    basis = np.linalg.qr(rng.normal(size=(dim, true_rank)))[0]
    data = (rng.normal(size=(n, true_rank)) * np.array([5.0, 2.0, 0.5])
            ) @ basis.T
    df = pd.DataFrame({
        "vec_id": np.arange(n, dtype="int64"),
        "embedding": [r.astype("float32") for r in data],
    })
    p = os.path.join(str(tmp_path), "e.parquet")
    df.to_parquet(p)

    out = pca_project(rd.read_parquet(p), k=6, dim=dim,
                      n_partitions=2).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    pcs = out[[f"pc_{i}" for i in range(6)]].to_numpy()

    var = pcs.var(axis=0, ddof=1)
    assert (np.diff(var) <= 1e-6).all()          # descending variance
    # rank-3 input: components 3.. carry only int8 quantization noise
    assert var[:3].min() > 50 * var[3:].max()
    # projections of orthogonal components are uncorrelated
    cc = np.corrcoef(pcs[:, :3], rowvar=False)
    assert np.abs(cc - np.eye(3)).max() < 0.05

    # partitioning invariance: different block layout + exchange width
    out2 = pca_project(rd.read_parquet(p).repartition(7), k=6, dim=dim,
                       n_partitions=5).to_pandas()
    out2 = out2.sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)

    # loud errors: empty and single-vector inputs
    with pytest.raises(ValueError):
        pca_project(rd.from_pandas(df.iloc[:1]), k=2, dim=dim).to_pandas()


def test_events_trend_semantics(ray_session, tmp_path):
    """Trend pins: a hand-checkable exact slope (daily counts 1,2,3 ->
    slope 1), the degenerate single-day group surfacing den=0 instead of
    a float NaN, and null-ts exclusion."""
    import duckdb

    from ocr_ray.pipelines.queries import ORACLE_SQL, q_events_trend

    d = str(tmp_path)
    t = pd.Timestamp("2020-01-01 12:00:00")
    day = pd.Timedelta(days=1)
    rows = []
    eid = 0
    # type 'up': 1, 2, 3 events on consecutive days -> slope exactly 1
    for i, cnt in enumerate([1, 2, 3]):
        for _ in range(cnt):
            rows.append((eid, t + i * day, 1, "up")); eid += 1
    # type 'flat': one day only -> den = 0 (degenerate, surfaced exactly)
    rows.append((eid, t, 1, "flat")); eid += 1
    rows.append((eid, t, 1, "flat")); eid += 1
    # null ts: excluded on both sides
    rows.append((eid, None, 1, "up")); eid += 1
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type"])
    ev["value"] = 0.0
    ev["props"] = "{}"
    ev.to_parquet(os.path.join(d, "events.parquet"))

    got = q_events_trend(d)
    con = duckdb.connect()
    con.execute(f"create view events as select * from "
                f"'{os.path.join(d, 'events.parquet')}'")
    exp = con.execute(ORACLE_SQL["events_trend"]).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    r = got.set_index("event_type")
    # slope 1: num/den = 1 with n=3 days
    assert r.loc["up", "slope_num"] == r.loc["up", "slope_den"] != 0
    assert r.loc["flat", "slope_den"] == 0  # degenerate, not NaN


def test_custom_engine_plugin(ray_session, monkeypatch):
    """The SURVEY §2.9 extension recipe end-to-end: register a new engine
    in the ENGINES name->class dict, select it via config, and best-of-N
    attributes the win to it — the Ray-native analog of subclassing
    BaseOCREngine.extract_text + _initialize_engines registration
    (ocr_app/core/ocr_engine.py:453-471).  Unknown engine names fail
    loud at pool construction, not mid-stream."""
    import pyarrow as pa

    from ocr_ray.config import PipelineConfig
    from ocr_ray.stages import extract as ex

    GOOD = ("This custom engine produces a long, clean, well formed "
            "paragraph. It has sentences, punctuation, and plenty of "
            "words, so the quality scorer prefers it over the sparse "
            "strip of a junk payload.")

    # the engine-callable contract: fn(text, prestripped=...) -> str —
    # a wrong signature is SKIPPED by the fallback ladder (engines may
    # fail per-payload), which the default-config assertion below pins
    def shouty(payload: str, prestripped: bool = False) -> str:
        return GOOD

    monkeypatch.setitem(ex.ENGINES, "shouty", shouty)

    cfg = PipelineConfig(engines=("tagstrip", "shouty"))
    e = ex.Extractor(cfg)
    batch = pa.table({
        "norm_text": ["<div><a href='x'>z</a></div>"],  # junk for tagstrip
        "kind": ["html"],
    })
    out = e(batch)
    assert out["engine"].to_pylist() == ["shouty"]
    assert out["extracted_text"].to_pylist() == [GOOD]

    # the default config stays byte-identical to the golden-parity path
    base = ex.Extractor(PipelineConfig())(batch)
    assert base["engine"].to_pylist() != ["shouty"]

    with pytest.raises(KeyError):
        ex.Extractor(PipelineConfig(engines=("tagstrip", "nope")))


def test_fk_null_leg_fallback_without_stats(ray_session, tmp_path):
    """Parquet written WITHOUT statistics exercises the counting-scan
    fallback of the fk null leg — same counts as the footer path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.queries import q_fk_violations

    d = str(tmp_path)
    _write_star(d)
    li = pa.table({
        "l_orderkey": pa.array([1, None], type=pa.int64()),
        "l_partkey": pa.array([5, 5], type=pa.int64()),
        "l_suppkey": pa.array([7, 7], type=pa.int64()),
        "l_linenumber": pa.array([1, 2], type=pa.int32()),
        "l_quantity": pa.array([1.0, 1.0]),
        "l_extendedprice": pa.array([1.0, 1.0]),
        "l_discount": pa.array([0.0, 0.0]),
        "l_tax": pa.array([0.0, 0.0]),
        "l_returnflag": pa.array(["N", "N"]),
        "l_linestatus": pa.array(["O", "O"]),
        "l_shipdate": pa.array([pd.Timestamp("1996-02-01")] * 2,
                               type=pa.timestamp("us")),
    })
    pq.write_table(li, os.path.join(d, "lineitem.parquet"),
                   write_statistics=False)
    pa_orders = pa.table({
        "o_orderkey": pa.array([1], type=pa.int64()),
        "o_custkey": pa.array([10], type=pa.int64()),
        "o_orderstatus": pa.array(["F"]),
        "o_totalprice": pa.array([0.0]),
        "o_orderdate": pa.array([pd.Timestamp("1996-01-01")],
                                type=pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"]),
    })
    pq.write_table(pa_orders, os.path.join(d, "orders.parquet"),
                   write_statistics=False)
    pd.DataFrame({"p_partkey": [5], "p_name": ["x"], "p_brand": ["b"],
                  "p_type": ["t"], "p_size": [1], "p_retailprice": [1.0],
                  }).to_parquet(os.path.join(d, "part.parquet"))
    pd.DataFrame({"s_suppkey": [7], "s_name": ["s"], "s_nationkey": [1],
                  "s_acctbal": [0.0],
                  }).to_parquet(os.path.join(d, "supplier.parquet"))
    pd.DataFrame({"c_custkey": [10], "c_name": ["c"], "c_nationkey": [1],
                  "c_acctbal": [0.0], "c_mktsegment": ["X"],
                  }).to_parquet(os.path.join(d, "customer.parquet"))

    got = q_fk_violations(d).set_index("fk")["n_orphans"]
    assert got["lineitem.l_orderkey->orders"] == 1  # the null, via fallback
    assert got["lineitem.l_partkey->part"] == 0


def test_events_corr_semantics(ray_session, tmp_path):
    """Correlation pins: r = +1 / -1 for exactly linear groups, NULL for
    a zero-variance group, engine == oracle on the synthetic set."""
    import duckdb

    from ocr_ray.pipelines.queries import ORACLE_SQL, q_events_corr

    d = str(tmp_path)
    t = pd.Timestamp("2020-01-01")
    day = pd.Timedelta(days=1)
    rows = []
    eid = 0
    for i in range(4):   # 'up': value = 1.00 + i -> r = 1
        rows.append((eid, t + i * day, 1, "up", 1.0 + i)); eid += 1
    for i in range(4):   # 'down': value = 9.00 - 2i -> r = -1
        rows.append((eid, t + i * day, 1, "down", 9.0 - 2 * i)); eid += 1
    for i in range(3):   # 'flat': same day, varx = 0 -> r NULL
        rows.append((eid, t, 1, "flat", float(i))); eid += 1
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    ev["props"] = "{}"
    ev.to_parquet(os.path.join(d, "events.parquet"))

    got = q_events_corr(d)
    con = duckdb.connect()
    con.execute(f"create view events as select * from "
                f"'{os.path.join(d, 'events.parquet')}'")
    exp = con.execute(ORACLE_SQL["events_corr"]).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    r = got.set_index("event_type")["r"]
    assert r["up"] == 1.0 and r["down"] == -1.0
    assert pd.isna(r["flat"])


def test_pca_k_bounds(ray_session):
    """k outside [1, dim] fails loud at plan time, not as a worker
    IndexError mid-stream."""
    import ray.data as rd

    from ocr_ray.stages.cluster import pca_project

    df = pd.DataFrame({"vec_id": [0, 1],
                       "embedding": [np.ones(4, dtype="float32"),
                                     np.zeros(4, dtype="float32")]})
    for bad in (0, 5):
        with pytest.raises(ValueError):
            pca_project(rd.from_pandas(df), k=bad, dim=4)


def test_events_moving_window_edges(ray_session, tmp_path):
    """Sliding-window pins: the frame truncates at each user's run start
    (never borrows a previous user's rows), null users chain as one
    partition, ties order by event_id, and the sum is exact cents."""
    import duckdb

    from ocr_ray.pipelines.queries import ORACLE_SQL, q_events_moving

    d = str(tmp_path)
    t = pd.Timestamp("2020-01-01")
    s = pd.Timedelta(seconds=1)
    rows = [
        # user 1: six events, values 1..6 -> window sums truncate then roll
        *[(i, t + i * s, 1, "view", float(i + 1)) for i in range(6)],
        # user 2: one event right after user 1's — must NOT see user 1
        (6, t + 6 * s, 2, "view", 100.0),
        # null users: two events chain together
        (7, t, None, "view", 10.0),
        (8, t + s, None, "view", 20.0),
        # tie ts within user 3: event_id orders the frame
        (9, t, 3, "view", 1.0),
        (10, t, 3, "view", 2.0),
    ]
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    ev["user_id"] = pd.array(ev["user_id"], dtype="Int64")
    ev["props"] = "{}"
    ev.to_parquet(os.path.join(d, "events.parquet"))

    got = q_events_moving(d)
    con = duckdb.connect()
    con.execute(f"create view events as select * from "
                f"'{os.path.join(d, 'events.parquet')}'")
    exp = con.execute(ORACLE_SQL["events_moving"]).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    r = got.set_index("event_id")
    assert list(r.loc[[0, 1, 2, 3, 4, 5], "win_sum_c"]) == [
        100, 300, 600, 1000, 1400, 1800]  # truncated then rolling 4-frame
    assert r.loc[6, "win_n"] == 1 and r.loc[6, "win_sum_c"] == 10000
    assert r.loc[8, "win_n"] == 2 and r.loc[8, "win_sum_c"] == 3000
    assert r.loc[10, "win_n"] == 2  # tie resolved by event_id


def test_summarize_extractive_scalar():
    """Summarizer pins: position order in the output, score ties to the
    earlier sentence, multi-punctuation splits, single-sentence and
    empty inputs."""
    from ocr_ray.functions.answers import summarize_extractive as summ

    # top-2 by significant words, emitted in position order
    assert summ("Tiny. Several significant tokens appear within here. "
                "No. Another informative sentence about pipelines.") == (
        "Several significant tokens appear within here. "
        "Another informative sentence about pipelines.")
    # tie (all score 0): earlier positions win, order preserved
    assert summ("Ab cd. Ef gh. Ij kl.") == "Ab cd. Ef gh."
    # a single 5-letter word ("three") outranks zero-score sentences
    assert summ("One. Two. Three.") == "One. Three."
    assert summ("Solo sentence only.") == "Solo sentence only."
    assert summ("") == ""
    # multi-punctuation boundary splits once, keeps the punctuation
    assert summ("Wow!! Meaningful wonderful sentence here. Eh.") == (
        "Wow!! Meaningful wonderful sentence here.")


def test_doc_readability_semantics(ray_session, tmp_path):
    """Readability pins: hand-computed Flesch for a known doc, the
    word-less doc reporting NULL, and engine == oracle on synthetic
    docs incl. empty text."""
    import duckdb

    from ocr_ray.pipelines.queries import ORACLE_SQL, q_doc_readability

    d = str(tmp_path)
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["The cat sat. The dog ran away quickly!",
                 "!!! ...",        # no words -> NULL score
                 ""],              # empty: 1 sentence, 0 words -> NULL
        "lang": ["en"] * 3, "source": ["s"] * 3, "n_chars": [0] * 3,
    })
    docs.to_parquet(os.path.join(d, "documents.parquet"))

    got = q_doc_readability(d).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"create view documents as select * from "
                f"'{os.path.join(d, 'documents.parquet')}'")
    exp = con.execute(ORACLE_SQL["doc_readability"]).df().sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    r = got.set_index("doc_id")
    # doc 1: 2 sentences, 8 words, syllable groups counted by hand:
    # the(1) cat(1) sat(1) the(1) dog(1) ran(1) away(2: a, ay) quickly(2: ui? ...)
    assert r.loc[1, "n_sent"] == 2 and r.loc[1, "n_words"] == 8
    expected = round(206.835 - 1.015 * (8 / 2)
                     - 84.6 * (int(r.loc[1, "n_syll"]) / 8), 6)
    assert r.loc[1, "flesch"] == expected
    assert pd.isna(r.loc[2, "flesch"]) and pd.isna(r.loc[3, "flesch"])


def test_profile_table_nested_and_bool(ray_session, tmp_path):
    """A nested (list) column fails LOUD at plan time naming the column;
    a boolean column profiles with DuckDB's lowercase VARCHAR bounds and
    the right distinct count."""
    import duckdb
    import ray.data as rd

    from ocr_ray.stages.validate import profile_table

    df = pd.DataFrame({
        "k": [1, 2, 3],
        "flag": [True, False, True],
        "vec": [np.ones(2, dtype="float32")] * 3,
    })
    p = os.path.join(str(tmp_path), "t.parquet")
    df.to_parquet(p)

    with pytest.raises(ValueError, match="vec"):
        profile_table(rd.read_parquet(p), ["k", "vec"])

    got = profile_table(rd.read_parquet(p), ["flag"]).set_index("col")
    assert got.loc["flag", "n_distinct"] == 2
    assert got.loc["flag", "min_str"] == "false"
    assert got.loc["flag", "max_str"] == "true"
    con = duckdb.connect()
    exp = con.execute(
        f"SELECT CAST(min(flag) AS VARCHAR) a, CAST(max(flag) AS VARCHAR) b"
        f" FROM '{p}'").df()
    assert (got.loc["flag", "min_str"], got.loc["flag", "max_str"]) == (
        exp["a"][0], exp["b"][0])
