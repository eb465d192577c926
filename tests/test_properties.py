"""Property-based tests (hypothesis) for the exact-match scalar surface and
the SQL-replicable hashing — invariants that hold for ALL inputs, not just
the golden corpus."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + " \t\n.,;:!?()-'\"",
    max_size=400,
)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_preprocess_idempotent(t):
    """M9 cleanup is idempotent: cleaning clean text changes nothing."""
    from ocr_ray.functions.textops import preprocess_text

    once = preprocess_text(t)
    assert preprocess_text(once) == once


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_clean_extracted_idempotent(t):
    from ocr_ray.functions.textops import clean_extracted_text

    once = clean_extracted_text(t)
    assert clean_extracted_text(once) == once


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_window_chunker_covers_all_words(t):
    """R2 window chunks preserve every word in order (stride < window)."""
    from ocr_ray.functions.chunking import get_text_chunks

    words = t.split()
    chunks = get_text_chunks(t)
    if not words:
        assert chunks == []
        return
    # first chunk starts at word 0; consecutive chunks overlap by 20
    rebuilt = []
    for i, c in enumerate(chunks):
        cw = c.split()
        start = i * 80
        assert cw == words[start:start + 100]
        rebuilt.extend(cw if i == 0 else cw[20:] if len(cw) > 20 else [])
    # every word appears in some chunk
    seen = [w for c in chunks for w in c.split()]
    assert set(seen) == set(words)


@settings(max_examples=100, deadline=None)
@given(TEXT)
def test_poly_simhash_bounds_and_determinism(t):
    from ocr_ray.stages.dedup import PolySimHasher

    h = PolySimHasher()
    s = h.signature_of(t)
    assert 0 <= s < (1 << 62)
    assert s == PolySimHasher().signature_of(t)


@settings(max_examples=100, deadline=None)
@given(TEXT)
def test_redact_counts_match_findall(t):
    """Counts reported by redact_pii equal pattern match counts on the
    raw text regardless of input."""
    from ocr_ray.functions.entities import (
        _DATE_PATTERNS,
        _EMAIL,
        _PHONE,
        _URL,
        redact_pii,
    )

    r = redact_pii(t)
    assert r["n_emails"] == len(_EMAIL.findall(t))
    assert r["n_phones"] == len(_PHONE.findall(t))
    assert r["n_urls"] == len(_URL.findall(t))
    assert r["n_dates"] == sum(len(p.findall(t)) for p in _DATE_PATTERNS)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=60),
       st.floats(min_value=0.01, max_value=0.99))
def test_quantile_histogram_equals_sort(values, q):
    """The histogram order-statistic equals the direct sorted-rank lookup
    (PERCENTILE_DISC: value at rank ceil(q*n))."""
    import math
    from collections import Counter

    import numpy as np

    if not values:
        return
    hist = sorted(Counter(values).items())
    cum = np.cumsum([c for _, c in hist])
    rank = math.ceil(q * len(values))
    idx = int(np.searchsorted(cum, rank, side="left"))
    via_hist = hist[idx][0]
    via_sort = sorted(values)[rank - 1]
    assert via_hist == via_sort


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from("alpha beta gamma delta eps zeta".split()),
                min_size=0, max_size=60))
def test_winnow_matches_bruteforce(words):
    """The vectorized sliding-window winnowing equals a brute-force
    per-window rightmost-min reference for arbitrary token streams."""
    import numpy as np
    import pandas as pd

    from ocr_ray.stages.analysis import (
        WINNOW_K, WINNOW_W, winnow_docs_batch)
    from ocr_ray.stages.embed import hash_token

    text = " ".join(words)
    got = winnow_docs_batch(pd.DataFrame({"doc_id": [1], "text": [text]}))
    got_set = set(zip(got["pos"], got["fp"]))

    n = len(words)
    if n < WINNOW_K:
        assert got_set == set()
        return
    B, M = 1000003, (1 << 31) - 1
    th = [hash_token(t) for t in words]
    m = n - WINNOW_K + 1
    kg = []
    for j in range(m):
        a = 0
        for i in range(WINNOW_K):
            a = (a * B + th[j + i]) % M
        kg.append(a)
    want = set()
    starts = range(m - WINNOW_W + 1) if m > WINNOW_W else [0]
    for j in starts:
        win = kg[j:j + WINNOW_W]
        mn = min(win)
        # rightmost occurrence of the min in the window
        p = j + max(i for i, v in enumerate(win) if v == mn)
        want.add((p, mn))
    assert got_set == want


@settings(max_examples=100, deadline=None)
@given(st.lists(
    st.tuples(st.sampled_from(["user", "assistant", "system", "tool"]),
              st.sampled_from(["", "one", "two words", "three word text"])),
    min_size=1, max_size=12))
def test_sft_prompt_window_matches_naive(turns):
    """The groupby-shift SFT prompt construction equals a naive per-turn
    walk (last-3 formatted turns joined by newlines)."""
    import pandas as pd

    g = pd.DataFrame({
        "conv_id": ["c"] * len(turns),
        "turn_idx": list(range(len(turns))),
        "role": [r for r, _ in turns],
        "clean_text": [t for _, t in turns],
    })
    # the SHARED helper the queries use, compared to an independent
    # naive per-turn walk
    import __ray_entry__ as entry

    gg = g.sort_values(["conv_id", "turn_idx"], kind="stable").copy()
    prompt = entry._prompt_window(gg)

    fmts = list("[" + gg["role"] + "] " + gg["clean_text"])
    for i in range(len(turns)):
        want = "\n".join(fmts[max(0, i - 3):i])
        assert prompt.iloc[i] == want


@settings(max_examples=100, deadline=None)
@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),   # conv index
              st.sampled_from(["user", "assistant", "system", "tool"]),
              st.sampled_from(["", "one", "two words", "three word text"])),
    min_size=1, max_size=24),
    st.booleans(), st.booleans())
def test_examples_pa_matches_pandas_reference(turns, gate, drop_empty):
    """The Arrow SFT kernel (_examples_pa: dictionary-code group
    boundaries, take-shifted concat_ws, optional fused alternation gate)
    equals the pandas reference path on arbitrary multi-conversation
    partitions, for every (gate, drop_empty) combination."""
    import pandas as pd
    import pyarrow as pa

    import __ray_entry__ as entry

    df = pd.DataFrame({
        "conv_id": [f"conv-{c:08d}" for c, _, _ in turns],
        "role": [r for _, r, _ in turns],
        "clean_text": [t for _, _, t in turns],
    })
    # turn_idx: position within its conversation (arrival order)
    df["turn_idx"] = df.groupby("conv_id").cumcount().astype("int64")

    # pandas reference: the retained _prompt_window path + explicit gate
    g = df.sort_values(["conv_id", "turn_idx"], kind="stable").copy()
    if gate:
        d = g[g["role"].isin(["user", "assistant"])]
        prev = d.groupby("conv_id")["role"].shift()
        bad = set(d.loc[d["role"] == prev, "conv_id"])
        g = g[~g["conv_id"].isin(bad)].copy()
    if len(g):
        prompt = entry._prompt_window(g)
        keep = g["role"] == "assistant"
        if drop_empty:
            keep &= g["clean_text"] != ""
        want = pd.DataFrame({
            "conv_id": g["conv_id"][keep],
            "turn_idx": g["turn_idx"][keep].astype("int64"),
            "prompt": prompt[keep],
            "completion": g["clean_text"][keep],
        }).reset_index(drop=True)
    else:
        want = pd.DataFrame({"conv_id": pd.Series(dtype="object"),
                             "turn_idx": pd.Series(dtype="int64"),
                             "prompt": pd.Series(dtype="object"),
                             "completion": pd.Series(dtype="object")})

    # shuffle the input: the kernel must not depend on arrival order
    got = entry._examples_pa(
        pa.Table.from_pandas(df.sample(frac=1, random_state=1),
                             preserve_index=False),
        gate=gate, drop_empty=drop_empty).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        want.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))


# -------------------------------------------------- exchange join property
_KEYS = st.integers(min_value=-3, max_value=6)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(_KEYS, min_size=0, max_size=40),
    st.lists(_KEYS, min_size=0, max_size=15),
    st.sampled_from(["inner", "left", "semi", "anti"]),
)
def test_exchange_join_matches_pandas(ray_session, lkeys, rkeys, how):
    """exchange_join over the raw-task hash exchange must equal the pandas
    merge for every how, on arbitrary key multisets (dups, empties,
    one-sided keys) and any partitioning."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ocr_ray.stages.join import exchange_join

    left = pd.DataFrame({"k": pd.Series(lkeys, dtype="int64"),
                         "v": np.arange(len(lkeys), dtype="int64")})
    right = (pd.DataFrame({"k": pd.Series(sorted(set(rkeys)), dtype="int64")})
             .assign(r=lambda d: d["k"] * 10))  # unique right keys

    got = exchange_join(
        rd.from_pandas(left).repartition(3),
        rd.from_pandas(right).repartition(2) if len(right)
        else rd.from_pandas(right),
        on="k", n_partitions=3, how=how,
    ).to_pandas()

    if how in ("semi", "anti"):
        m = left["k"].isin(set(right["k"]))
        want = left[m if how == "semi" else ~m]
        got = got.sort_values(["v"]).reset_index(drop=True) if len(got) \
            else got
        assert len(got) == len(want)
        if len(want):
            pd.testing.assert_frame_equal(
                got[["k", "v"]],
                want.sort_values("v").reset_index(drop=True)[["k", "v"]])
        return
    want = left.merge(right, on="k", how=how)
    assert len(got) == len(want)
    if len(want):
        got = got.sort_values(["v"]).reset_index(drop=True)
        want = want.sort_values(["v"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["k", "v"]], want[["k", "v"]])
        assert (got["r"].fillna(-1) == want["r"].fillna(-1)).all()


# -------------------------------------------- hash aggregate property
@settings(max_examples=6, deadline=None)
@given(st.lists(st.one_of(_KEYS, st.none()), min_size=1, max_size=40))
def test_hash_aggregate_null_keys_match_pandas(ray_session, fkeys):
    """hash_aggregate over a float64 key with NaNs must equal pandas
    groupby(dropna=False): all NULL keys form ONE group (SQL GROUP BY
    semantics) and meet through the exchange regardless of partitioning."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ocr_ray.stages.aggregate import hash_aggregate

    fdf = pd.DataFrame({"k": pd.Series([np.nan if k is None else float(k)
                                        for k in fkeys], dtype="float64"),
                        "v": np.arange(len(fkeys), dtype="int64")})
    got = (hash_aggregate(rd.from_pandas(fdf).repartition(4),
                          keys=["k"], aggs={"v": "sum"})
           .to_pandas())
    exp = fdf.groupby("k", as_index=False, dropna=False)["v"].sum()

    assert len(got) == len(exp)
    gn, en = got[got["k"].isna()], exp[exp["k"].isna()]
    assert len(gn) == len(en)
    if len(en):
        assert int(gn["v"].iloc[0]) == int(en["v"].iloc[0])
    g2 = got.dropna(subset=["k"]).sort_values("k").reset_index(drop=True)
    e2 = exp.dropna(subset=["k"]).sort_values("k").reset_index(drop=True)
    assert (g2["k"].to_numpy() == e2["k"].to_numpy()).all()
    assert (g2["v"].to_numpy(dtype="int64")
            == e2["v"].to_numpy(dtype="int64")).all()


def test_exchange_schema_drift_fails_loudly(ray_session):
    """A union whose blocks disagree on a column's physical dtype (int64
    shards + double shards — ingest-level schema drift) cannot produce a
    consistent exchange result schema; the exchange must fail with a
    CLEAR remediation error, not a cryptic worker-side ArrowTypeError.
    (Cross-SIDE int-vs-float join keys remain supported — each side
    concats separately and the value-unified key hash aligns them.)"""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from ocr_ray.stages.aggregate import hash_aggregate

    idf = pd.DataFrame({"k": pd.Series([1, 2, 3] * 10, dtype="int64"),
                        "v": np.ones(30, dtype="int64")})
    fdf = pd.DataFrame({"k": pd.Series([1.0, 2.0] * 10, dtype="float64"),
                        "v": np.ones(20, dtype="int64")})
    ds = rd.from_pandas(idf).union(rd.from_pandas(fdf))
    with pytest.raises(Exception, match="schema drift|int64|double"):
        hash_aggregate(ds, keys=["k"], aggs={"v": "sum"}).to_pandas()


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),            # user slot (3 -> SQL NULL)
            st.integers(0, 1_000_000),    # ts offset seconds (~11.6 days)
            st.sampled_from(["click", "purchase", "view"]),
        ),
        max_size=40,
    )
)
def test_attribution_matches_bruteforce(ray_session, rows):
    """events_attribution == an O(n^2) brute-force reference for ANY
    event stream: per purchase, the latest (ts, event_id)-preceding
    same-user click within 7 days (null users form one group)."""
    import os
    import tempfile

    import numpy as np
    import pandas as pd

    from ocr_ray.pipelines.queries import q_events_attribution

    d = tempfile.mkdtemp(prefix="attr_prop_")
    t0 = pd.Timestamp("2020-01-01")
    ev = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype="int64"),
        "ts": [t0 + pd.Timedelta(seconds=s) for _, s, _ in rows],
        "user_id": pd.array([None if u == 3 else u for u, _, _ in rows],
                            dtype="Int64"),
        "event_type": [t for _, _, t in rows],
        "value": 0.0,
        "props": "{}",
    })
    ev.to_parquet(os.path.join(d, "events.parquet"))

    got = q_events_attribution(d).set_index("event_id")

    W = pd.Timedelta(days=7)
    expected = {}
    for _, p in ev[ev["event_type"] == "purchase"].iterrows():
        same = ev[(ev["user_id"].isna() & pd.isna(p["user_id"]))
                  | (ev["user_id"] == p["user_id"])]
        cand = same[(same["event_type"] == "click")
                    & ((same["ts"] < p["ts"])
                       | ((same["ts"] == p["ts"])
                          & (same["event_id"] < p["event_id"])))]
        cand = cand[p["ts"] - cand["ts"] <= W]
        if len(cand):
            w = cand.sort_values(["ts", "event_id"]).iloc[-1]
            expected[int(p["event_id"])] = (
                int(w["event_id"]),
                int((p["ts"] - w["ts"]).total_seconds()))
        else:
            expected[int(p["event_id"])] = None

    assert set(got.index) == set(expected)
    for eid, exp in expected.items():
        a = got.loc[eid, "attributed_event_id"]
        if exp is None:
            assert pd.isna(a)
        else:
            assert (int(a), int(got.loc[eid, "lag_s"])) == exp


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 12), st.integers(0, 3)),
             max_size=20, unique_by=lambda t: t[0]),
    st.lists(st.tuples(st.integers(0, 12), st.integers(0, 3)),
             max_size=20, unique_by=lambda t: t[0]),
)
def test_snapshot_diff_matches_reference(ray_session, left, right):
    """snapshot_diff == the FULL OUTER JOIN case ladder for ANY pair of
    keyed tables (unique keys per side)."""
    import ray.data as rd

    import pandas as pd

    from ocr_ray.stages.validate import snapshot_diff

    lf = pd.DataFrame(left or [(99, 0)], columns=["k", "v"]).astype("int64")
    rf = pd.DataFrame(right or [(98, 1)], columns=["k", "v"]).astype("int64")
    got = snapshot_diff(rd.from_pandas(lf), rd.from_pandas(rf),
                        key_col="k", compare_cols=["v"]).to_pandas()
    got = dict(zip(got["k"], got["status"])) if "k" in got.columns else {}

    m = lf.merge(rf, on="k", how="outer", suffixes=("_l", "_r"),
                 indicator=True)
    exp = {}
    for _, r in m.iterrows():
        if r["_merge"] == "right_only":
            exp[int(r["k"])] = "added"
        elif r["_merge"] == "left_only":
            exp[int(r["k"])] = "removed"
        else:
            exp[int(r["k"])] = ("unchanged" if r["v_l"] == r["v_r"]
                                else "changed")
    assert got == exp


@settings(max_examples=60, deadline=None)
@given(
    st.lists(  # (bucket_a, bucket_b, id) rows, duplicates allowed
        st.tuples(st.integers(0, 4), st.integers(0, 6),
                  st.integers(0, 30)),
        max_size=60),
)
def test_pairs_vectorized_matches_combinations(rows):
    """The round-4 vectorized LSH pair kernel == the itertools reference
    for ANY bucket structure (multi-column keys, duplicate (bucket, id)
    rows, singleton and empty buckets): same pair multiset, each pair
    (smaller id, larger id), no cross-bucket pairs."""
    import itertools

    import numpy as np
    import pandas as pd

    from ocr_ray.stages.dedup import _pairs_from_bucket_partition

    g = pd.DataFrame(rows or [(0, 0, 0)],
                     columns=["band_id", "band_hash", "doc_id"])
    g["doc_id"] = g["doc_id"].astype("int64")
    got = _pairs_from_bucket_partition(g, ["band_id", "band_hash"],
                                       "doc_id")

    exp_l, exp_r = [], []
    for _, b in g.groupby(["band_id", "band_hash"], sort=False):
        for a, c in itertools.combinations(sorted(b["doc_id"].unique()), 2):
            exp_l.append(a)
            exp_r.append(c)
    exp = (pd.DataFrame({"left_id": pd.Series(exp_l, dtype="int64"),
                         "right_id": pd.Series(exp_r, dtype="int64")})
           .sort_values(["left_id", "right_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.sort_values(["left_id", "right_id"]).reset_index(drop=True),
        exp)
    assert (got["left_id"] < got["right_id"]).all() if len(got) else True
