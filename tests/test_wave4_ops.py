"""Wave-4 operator semantics: left-outer join totals, LAG-gap stats,
rollup consistency, BPE merge greediness.  (Value equality vs DuckDB is
covered for all of these by test_all_queries_match_oracles; these tests
pin the semantic invariants that the oracle can't express.)"""

import re
import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.001"


def test_left_outer_keeps_every_customer(ray_session):
    from ocr_ray.pipelines.queries import q_orders_cust_totals

    out = q_orders_cust_totals(SF).to_pandas()
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    assert len(out) == len(cust)
    assert set(out["c_custkey"]) == set(cust["c_custkey"].astype("int64"))
    # no-order customers surface with exact zeros, not nulls
    zero = out[out["n_orders"] == 0]
    assert (zero["total_cents"] == 0).all()
    assert not out["n_orders"].isna().any()


def test_events_gaps_span_is_max_minus_min(ray_session):
    """Sum of consecutive sorted diffs telescopes to max-min per user."""
    from ocr_ray.pipelines.queries import q_events_gaps

    out = q_events_gaps(SF).to_pandas().set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["us"] = ev["ts"].astype("int64")
    ref = ev.groupby("user_id")["us"].agg(["count", "min", "max"])
    assert len(out) == len(ref)
    for uid, row in ref.iterrows():
        assert out.loc[uid, "n_events"] == row["count"]
        assert out.loc[uid, "span_us"] == row["max"] - row["min"]
        assert out.loc[uid, "max_gap_us"] <= out.loc[uid, "span_us"]


def test_rollup_levels_are_consistent(ray_session):
    from ocr_ray.pipelines.queries import q_events_rollup

    out = q_events_rollup(SF)
    fine = out[(out["event_type"] != "ALL") & (out["day"] != "ALL")]
    per_type = out[(out["event_type"] != "ALL") & (out["day"] == "ALL")]
    total = out[(out["event_type"] == "ALL") & (out["day"] == "ALL")]
    assert len(total) == 1
    assert fine["n_events"].sum() == total["n_events"].iloc[0]
    assert per_type["n_events"].sum() == total["n_events"].iloc[0]
    ft = fine.groupby("event_type")["value_cents"].sum()
    pt = per_type.set_index("event_type")["value_cents"]
    assert ft.sort_index().equals(pt.sort_index())


def test_pivot_row_sums(ray_session):
    from ocr_ray.pipelines.queries import q_events_pivot

    out = q_events_pivot(SF)
    parts = out[[c for c in out.columns if c.startswith("n_") and c != "n_total"]]
    assert (parts.sum(axis=1) == out["n_total"]).all()


def test_bpe_merge_is_greedy_left_to_right():
    """The \\b-anchored re.sub merge must equal the classic token-walk
    greedy merge, including self-overlapping pairs ('a a a' -> 'aa a')."""
    def walk_merge(parts, l, r):
        out, i = [], 0
        while i < len(parts):
            if i + 1 < len(parts) and parts[i] == l and parts[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        return out

    cases = [("a a a", "a", "a"), ("a b a b", "a", "b"),
             ("x a b a b y", "a", "b"), ("aa a aa", "aa", "a"),
             ("b a a b", "a", "a")]
    for sym, l, r in cases:
        pat = re.compile(rf"\b{re.escape(l)} {re.escape(r)}\b")
        got = pat.sub(l + r, sym).split(" ")
        assert got == walk_merge(sym.split(" "), l, r), (sym, l, r)


def test_bpe_train_merges_are_distinct_and_counted(ray_session):
    from ocr_ray.pipelines.queries import q_bpe_train

    out = q_bpe_train(SF)
    assert list(out["step"]) == [1, 2, 3]
    assert (out["cnt"] > 0).all()
    pairs = list(zip(out["left_s"], out["right_s"]))
    assert len(set(pairs)) == 3  # a merged pair can't be re-chosen


def test_triangle_counts_sparse_graph(ray_session):
    """Degree-oriented counting vs brute force on a graph with a hub,
    a pendant path, an isolated edge, self-loops and duplicate edges."""
    import itertools

    import numpy as np
    import ray.data as rd

    from ocr_ray.stages.graph import triangle_counts

    edges = [
        (1, 2), (2, 3), (1, 3),          # triangle
        (3, 4), (4, 5), (3, 5),          # second triangle sharing node 3
        (5, 6), (6, 7),                  # path (no triangle)
        (8, 9),                          # isolated edge
        (10, 1), (10, 2), (10, 3),       # hub closing two triangles
        (2, 1), (1, 1), (3, 2),          # duplicate / reversed / self-loop
    ]
    ds = rd.from_pandas(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    )
    got = triangle_counts(ds, n_partitions=4).to_pandas()
    got = dict(zip(got["node"], got["n_triangles"]))

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    want = {}
    for x, y, z in itertools.combinations(nodes, 3):
        if {(x, y), (x, z), (y, z)} <= und:
            for n in (x, y, z):
                want[n] = want.get(n, 0) + 1
    assert got == want
    assert sum(got.values()) % 3 == 0


def test_edit_distance_leq1_kernel():
    from ocr_ray.stages.join import _edit_distance_leq1 as ed

    assert ed("abc", "abc") == 0
    assert ed("abc", "abd") == 1      # substitution
    assert ed("abc", "ab") == 1       # deletion
    assert ed("ab", "abc") == 1       # insertion
    assert ed("abc", "bca") == 2      # rotation is 2 edits
    assert ed("abc", "a") == 2        # length gap 2
    assert ed("", "x") == 1
    assert ed("", "") == 0
    assert ed("aXbYc", "abc") == 2


def test_fuzzy_join_recall_is_exact(ray_session):
    """Deletion-signature blocking must find EVERY ed<=1 pair that a
    brute-force scan finds (sf0.001 customers vs mutants)."""
    from ocr_ray.pipelines.queries import q_fuzzy_join_customers

    got = q_fuzzy_join_customers(SF).to_pandas()
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    orig = dict(zip(cust["c_custkey"].astype("int64"), cust["c_name"]))
    muts = {}
    for k, n in orig.items():
        if k % 7 == 0:
            p = k % len(n)
            muts[k + 10_000_000] = n[:p] + n[p + 1:]

    from ocr_ray.stages.join import _edit_distance_leq1 as ed

    want = {(lk, rk) for lk, ln in orig.items() for rk, rn in muts.items()
            if ed(ln, rn) <= 1}
    assert set(zip(got["left_id"], got["right_id"])) == want
    assert (got["dist"] <= 1).all()


def test_winnow_shared_run_guarantee():
    """Winnowing guarantee (Schleimer et al. §3): two docs sharing a run of
    >= w + k - 1 tokens must share at least one selected fingerprint."""
    from ocr_ray.stages.analysis import WINNOW_K, WINNOW_W, winnow_docs_batch

    shared = " ".join(f"tok{i}" for i in range(WINNOW_W + WINNOW_K - 1))
    a = "alpha beta gamma " + shared + " delta epsilon"
    b = "zeta eta " + shared + " theta iota kappa lambda"
    out = winnow_docs_batch(pd.DataFrame({"doc_id": [1, 2], "text": [a, b]}))
    fps = out.groupby("doc_id")["fp"].agg(set)
    assert fps[1] & fps[2], "no shared fingerprint for a w+k-1 shared run"


def test_winnow_short_doc_edges():
    from ocr_ray.stages.analysis import winnow_docs_batch

    out = winnow_docs_batch(
        pd.DataFrame({"doc_id": [1, 2, 3],
                      "text": ["a b c",            # < k tokens: nothing
                               "a b c d",          # exactly k: one kgram
                               "a b c d e f"]})    # m=3 <= w: one window
    )
    assert 1 not in set(out["doc_id"])
    assert len(out[out["doc_id"] == 2]) == 1
    assert len(out[out["doc_id"] == 3]) == 1  # single whole-sequence window


def test_compact_output_preserves_rows(ray_session, tmp_path):
    import ray.data as rd

    import ocr_ray.api as api

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    rd.range(5000).map_batches(
        lambda b: pd.DataFrame({"x": b["id"], "y": b["id"] * 2}),
        batch_format="pandas",
    ).repartition(40).write_parquet(src)
    import glob

    n_in = len(glob.glob(src + "/*.parquet"))
    api.compact_output(src, dst, target_mb=128)
    n_out = len(glob.glob(dst + "/*.parquet"))
    assert n_out < n_in
    a = rd.read_parquet(src).to_pandas().sort_values("x").reset_index(drop=True)
    b = rd.read_parquet(dst).to_pandas().sort_values("x").reset_index(drop=True)
    assert a.equals(b)


def test_duplicated_spans_geometry(ray_session):
    """A shared 10-token run yields ONE maximal span exactly covering it
    on both docs; unique text yields nothing; an intra-doc repeat of the
    window length is detected too."""
    import ray.data as rd

    from ocr_ray.stages.dedup import duplicated_spans

    shared = " ".join(f"tok{i}" for i in range(10))          # 10 tokens
    a = "aa bb cc " + shared + " dd ee"                      # run at 3..12
    b = shared + " xx yy zz ww vv uu tt ss"                  # run at 0..9
    c = "one two three four five six seven eight nine ten"   # unique
    rep = " ".join(f"r{i}" for i in range(8))
    d = rep + " mid1 mid2 " + rep                            # intra-doc dup
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": [a, b, c, d]}))
    out = duplicated_spans(docs, L=8).to_pandas()
    spans = {int(r.doc_id): (int(r.span_start), int(r.span_end))
             for r in out.itertuples() if r.doc_id in (1, 2)}
    assert spans[1] == (3, 12)
    assert spans[2] == (0, 9)
    assert 3 not in set(out["doc_id"])
    d_spans = sorted((int(r.span_start), int(r.span_end))
                     for r in out.itertuples() if r.doc_id == 4)
    assert d_spans == [(0, 7), (10, 17)]


def test_contract_check_counts_violations(ray_session):
    import ray.data as rd

    from ocr_ray.stages.validate import contract_check

    good = {"conv_id": "c1", "turn_idx": 0, "role": "user",
            "text": "hi", "tool": "", "ts": pd.Timestamp("2024-01-01")}
    bad = dict(good, turn_idx=-3, role="robot", ts=pd.NaT, text=None)
    df = pd.DataFrame([good, good, bad])
    out = contract_check(rd.from_pandas(df))
    row = out.iloc[0]
    assert row["n_rows"] == 3
    assert row["neg_idx"] == 1
    assert row["bad_enum"] == 1
    assert row["null_ts"] == 1
    assert row["null_text"] == 1
    assert row["null_conv_id"] == 0


def test_duplicated_spans_partition_invariant(ray_session):
    """Span output must not depend on the exchange partition count."""
    import ray.data as rd

    from ocr_ray.stages.dedup import duplicated_spans

    docs = rd.read_parquet(f"{SF}/documents.parquet").select_columns(
        ["doc_id", "text"])
    a = duplicated_spans(docs, L=8, n_partitions=3).to_pandas()
    b = duplicated_spans(docs, L=8, n_partitions=16).to_pandas()
    key = ["doc_id", "span_start", "span_end"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True))


def test_apply_upserts_last_write_wins(ray_session, tmp_path):
    import ray.data as rd

    import ocr_ray.api as api

    base = rd.from_pandas(pd.DataFrame({
        "k": [1, 2, 3], "v": ["a", "b", "c"], "ver": [1, 1, 1]}))
    changes = rd.from_pandas(pd.DataFrame({
        "k": [2, 4], "v": ["b2", "d"], "ver": [2, 1]}))
    out = str(tmp_path / "merged")
    api.apply_upserts(base, changes, key="k", order_cols=["ver"], out_dir=out)
    got = rd.read_parquet(out).to_pandas().sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == [1, 2, 3, 4]
    assert got.set_index("k")["v"].to_dict() == {1: "a", 2: "b2", 3: "c", 4: "d"}


def test_write_clustered_files_have_disjoint_ranges(ray_session, tmp_path):
    import glob

    import pyarrow.parquet as pq
    import ray.data as rd

    import ocr_ray.api as api

    ds = rd.range(20000).map_batches(
        lambda b: pd.DataFrame({"x": b["id"]}), batch_format="pandas"
    ).random_shuffle(seed=7)
    out = str(tmp_path / "clustered")
    api.write_clustered(ds, "x", out)
    ranges = []
    for f in glob.glob(out + "/*.parquet"):
        t = pq.read_table(f, columns=["x"])
        if t.num_rows:
            import pyarrow.compute as pc
            ranges.append((pc.min(t["x"]).as_py(), pc.max(t["x"]).as_py()))
    ranges.sort()
    assert len(ranges) > 1
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "file key ranges overlap — clustering broken"


def test_daily_filled_inserts_zero_days(ray_session, tmp_path):
    """The fixture span has no gaps, so prove the fill on synthetic data:
    a type active on days 1 and 4 gains zero rows for days 2-3, and the
    grid covers the GLOBAL span for every type."""
    from ocr_ray.pipelines.queries import q_events_daily_filled

    df = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01", "2024-01-04", "2024-01-02"]),
        "event_type": ["click", "click", "view"],
    })
    df.to_parquet(tmp_path / "events.parquet")
    out = q_events_daily_filled(str(tmp_path)).to_pandas()
    click = out[out["event_type"] == "click"].set_index("day")["n"]
    assert len(out) == 8  # 2 types x 4-day global span
    assert click[pd.Timestamp("2024-01-02")] == 0
    assert click[pd.Timestamp("2024-01-03")] == 0
    assert click[pd.Timestamp("2024-01-01")] == 1
    view = out[out["event_type"] == "view"].set_index("day")["n"]
    assert view[pd.Timestamp("2024-01-04")] == 0
