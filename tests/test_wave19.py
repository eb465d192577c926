"""Wave-19 operators: q8 market share, q9 profit rollup, q15 top supplier."""

import os
import tempfile

import pandas as pd


def _write_dims(d):
    """Minimal 2-region / 4-nation dimensional schema for the q8/q9/q15
    synthetic cases."""
    pd.DataFrame({"r_regionkey": [2, 3],
                  "r_name": ["ASIA", "EUROPE"]}).to_parquet(
        os.path.join(d, "region.parquet"))
    pd.DataFrame({
        "n_nationkey": [7, 8, 9, 10],
        "n_name": ["NATION_7", "NATION_8", "NATION_9", "NATION_10"],
        "n_regionkey": [2, 2, 3, 3],
    }).to_parquet(os.path.join(d, "nation.parquet"))
    pd.DataFrame({
        "s_suppkey": [1, 2, 3],
        "s_name": ["s_one", "s_two", "s_three"],
        "s_nationkey": [7, 8, 9],
        "s_acctbal": [0.0, 0.0, 0.0],
    }).to_parquet(os.path.join(d, "supplier.parquet"))
    pd.DataFrame({
        "c_custkey": [100, 200],
        "c_name": ["c_asia", "c_europe"],
        "c_nationkey": [8, 9],          # 100 in ASIA, 200 outside
        "c_acctbal": [0.0, 0.0],
        "c_mktsegment": ["A", "B"],
    }).to_parquet(os.path.join(d, "customer.parquet"))
    pd.DataFrame({
        "p_partkey": [1, 2],
        "p_name": ["hot gear", "red widget"],   # q9 needle hits part 1 only
        "p_brand": ["Brand#12", "Brand#23"],
        "p_type": ["ECONOMY", "PROMO"],         # q8 type hits part 1 only
        "p_size": [1, 2],
        "p_retailprice": [1.0, 2.0],
    }).to_parquet(os.path.join(d, "part.parquet"))


def test_q8_q9_q15_synthetic_parity(ray_session):
    """Every predicate arm bites on a hand-built star schema — orphan
    part/supp keys drop (inner semantics), out-of-region customers and
    out-of-window orders are excluded, q15 returns BOTH suppliers on an
    exact revenue tie — and each engine result matches its DuckDB oracle
    value-for-value."""
    import duckdb

    from ocr_ray.pipelines.queries import (ORACLE_SQL, q_q8_market_share,
                                           q_q9_profit, q_q15_top_supplier)

    orders = pd.DataFrame({
        "o_orderkey": [10, 11, 12, 13],
        "o_custkey": [100, 100, 200, 100],
        "o_orderstatus": ["F"] * 4,
        "o_totalprice": [0.0] * 4,
        # 13 is outside the q8 1996-1998 window
        "o_orderdate": pd.to_datetime(
            ["1996-06-01", "1997-06-01", "1996-06-01", "1999-06-01"]),
        "o_orderpriority": ["1-URGENT"] * 4,
    })
    li = pd.DataFrame({
        # (order, part, supp): orphan part 99 and orphan supp 99 must drop
        "l_orderkey": [10, 10, 11, 12, 13, 10, 11],
        "l_partkey": [1, 1, 1, 1, 1, 99, 1],
        "l_suppkey": [1, 2, 1, 1, 1, 1, 99],
        "l_linenumber": [1, 2, 1, 1, 1, 3, 2],
        "l_quantity": [1.0] * 7,
        # suppliers 1 and 2 tie exactly inside the q15 window via order 10
        "l_extendedprice": [100.0, 100.0, 50.0, 70.0, 90.0, 60.0, 80.0],
        "l_discount": [0.05, 0.05, 0.0, 0.1, 0.0, 0.0, 0.0],
        "l_tax": [0.0] * 7,
        "l_returnflag": ["N"] * 7,
        "l_linestatus": ["O"] * 7,
        # only the first two rows land inside the q15 1996-Q1 window
        # (q8 windows on o_orderdate and q9 has no window, so the later
        # ship dates don't perturb those)
        "l_shipdate": pd.to_datetime(
            ["1996-02-01", "1996-02-01", "1997-02-01", "1996-06-10",
             "1999-02-01", "1996-06-15", "1997-03-15"]),
    })
    with tempfile.TemporaryDirectory() as d:
        _write_dims(d)
        orders.to_parquet(os.path.join(d, "orders.parquet"))
        li.to_parquet(os.path.join(d, "lineitem.parquet"))
        con = duckdb.connect()
        for t in ("region", "nation", "supplier", "customer", "part",
                  "orders", "lineitem"):
            con.execute(f"create view {t} as select * from "
                        f"'{os.path.join(d, t + '.parquet')}'")
        for fn, name in ((q_q8_market_share, "q8_market_share"),
                         (q_q9_profit, "q9_profit"),
                         (q_q15_top_supplier, "q15_top_supplier")):
            got = fn(d).reset_index(drop=True)
            exp = con.execute(ORACLE_SQL[name]).df().reset_index(drop=True)
            cols = sorted(got.columns)
            assert cols == sorted(exp.columns), name
            pd.testing.assert_frame_equal(got[cols], exp[cols],
                                          check_dtype=False), name

        # the edges really were at stake:
        q15 = q_q15_top_supplier(d)
        # suppliers 1 and 2 tie at 100.00 x (1000-50) cpm inside 1996-Q1
        # (supplier 3 never ships; orphan supp 99 dropped)
        assert q15["s_suppkey"].tolist() == [1, 2]
        assert q15["total_rev_cpm"].nunique() == 1

        q8 = q_q8_market_share(d)
        # order 12 (customer outside ASIA) and order 13 (outside window)
        # contribute nothing; orphan keys dropped
        assert q8["o_year"].tolist() == [1996, 1997]
        # 1996: only order 10's two matched lines (both NATION_7/8 supp,
        # target is supplier 1 -> exactly half the volume)
        y96 = q8[q8["o_year"] == 1996].iloc[0]
        assert int(y96["total_cpm"]) == 2 * int(y96["target_cpm"])

        q9 = q_q9_profit(d)
        # order 13 is in-scope for q9 (no window there) -> 1999 appears
        assert set(q9["o_year"]) == {1996, 1997, 1999}


def test_regen_crash_invalidates_marker(tmp_path, monkeypatch):
    """A crash between the stale-shard clear and the rewrite must leave a
    directory that FAILS the marker check: the marker is removed before
    any destructive step, so the next call regenerates instead of
    trusting a gutted layout."""
    import glob
    import os

    import pytest

    import ocr_ray.sources.transcripts as tr

    d = str(tmp_path / "t")
    tr.generate_transcripts(d, n_convs=6, n_shards=3, parallel=False)
    marker = os.path.join(d, "_GENERATED.json")
    assert os.path.exists(marker)

    def boom(*a, **k):
        raise RuntimeError("simulated crash during shard rewrite")

    monkeypatch.setattr(tr, "_write_shard", boom)
    with pytest.raises(RuntimeError):
        tr.generate_transcripts(d, n_convs=6, n_shards=2, parallel=False)
    # the half-destroyed dir must not look complete
    assert not os.path.exists(marker)
    monkeypatch.undo()

    # ANY params now regenerate — including the original ones whose stale
    # marker would previously have validated the gutted directory
    tr.generate_transcripts(d, n_convs=6, n_shards=3, parallel=False)
    files = glob.glob(os.path.join(d, "transcripts", "*.parquet"))
    assert len(files) == 3
    t = pd.concat([pd.read_parquet(f) for f in files])
    assert t["conv_id"].nunique() == 6
    assert not t.duplicated(["conv_id", "turn_idx"]).any()
