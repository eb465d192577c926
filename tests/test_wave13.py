"""Wave-13: quality-aware dedup representative selection, per-group
token-budget mixture selection, winsorized group statistics."""

import numpy as np
import pandas as pd


def test_keep_best_prefers_high_score_then_low_id(ray_session):
    """In a cluster the max-score member survives; score ties resolve to
    the lowest id; singletons (no cluster membership) always survive."""
    import ray.data as rd

    from ocr_ray.stages.dedup import keep_best_representatives

    meta = pd.DataFrame({
        "doc_id": [1, 2, 3, 10, 11, 20],
        "n_chars": [5, 9, 9, 7, 7, 3],
    })
    # cluster A = {1,2,3} (winner 2: score 9, tie vs 3 -> lower id);
    # cluster B = {10,11} (tie -> 10); 20 is a singleton.
    clusters = pd.DataFrame({
        "doc_id": [1, 2, 3, 10, 11],
        "cluster_id": [1, 1, 1, 10, 10],
    })
    out = (keep_best_representatives(rd.from_pandas(meta),
                                     rd.from_pandas(clusters))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out["doc_id"]) == [2, 10, 20]
    assert list(out["n_chars"]) == [9, 7, 3]


def test_keep_best_partition_insensitive_and_no_pairs(ray_session):
    """Result is independent of input block layout; with an empty
    cluster table every doc survives with its true score."""
    import ray.data as rd

    from ocr_ray.stages.dedup import keep_best_representatives

    rng = np.random.RandomState(7)
    meta = pd.DataFrame({
        "doc_id": np.arange(50, dtype="int64"),
        "n_chars": rng.randint(0, 30, size=50).astype("int64"),
    })
    clusters = pd.DataFrame({
        "doc_id": [0, 1, 2, 40, 41],
        "cluster_id": [0, 0, 0, 40, 40],
    })
    a = (keep_best_representatives(rd.from_pandas(meta),
                                   rd.from_pandas(clusters))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (keep_best_representatives(rd.from_pandas(meta).repartition(8),
                                   rd.from_pandas(clusters).repartition(3))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)

    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "cluster_id": pd.Series(dtype="int64")})
    allkept = (keep_best_representatives(rd.from_pandas(meta),
                                         rd.from_pandas(empty))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        allkept, meta.sort_values("doc_id").reset_index(drop=True))


def test_budget_select_prefix_and_zero_token_docs(ray_session):
    """Selection is the id-ordered prefix per group; a zero-token doc
    inside budget is kept, and once the running sum crosses the budget
    nothing later in the group is emitted (monotone cumsum)."""
    import ray.data as rd

    from ocr_ray.stages.analysis import budget_select_per_group

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6, 7, 8],
        "source": ["a"] * 4 + ["b"] * 2 + ["c"] * 2,
        # a: 3 + 0 + 4 (crosses at id 3 with budget 6) + 0
        "text": ["x y z", "   ", "p q r s", "w", "one two", "",
                 "", "x"],
    })
    out = (budget_select_per_group(rd.from_pandas(df), budget=6)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out["doc_id"]) == [1, 2, 5, 6, 7, 8]
    assert list(out["cum_tok"]) == [3, 3, 2, 2, 0, 1]

    # budget 0: only zero-token docs in a group's LEADING prefix survive
    # (doc 6 is zero-token but rides behind doc 5's two tokens)
    z = (budget_select_per_group(rd.from_pandas(df), budget=0)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(z["doc_id"]) == [7]


def test_budget_select_partition_insensitive(ray_session):
    """Cumulative sums agree across block layouts (the per-group order
    is global id order, not arrival order)."""
    import ray.data as rd

    from ocr_ray.stages.analysis import budget_select_per_group

    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "doc_id": rng.permutation(200).astype("int64"),
        "source": [f"s{i % 5}" for i in range(200)],
        "text": [" ".join(["t"] * rng.randint(0, 9)) for _ in range(200)],
    })
    a = (budget_select_per_group(rd.from_pandas(df), budget=40)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (budget_select_per_group(rd.from_pandas(df).repartition(16),
                                 budget=40)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_winsorize_matches_naive_and_integer_ranks(ray_session):
    """Engine thresholds equal the naive PERCENTILE_DISC definition
    (value at 1-based rank max(1, ceil(q*n)) of the sorted scores) —
    including n=40-style cases where float ceil(0.05*n) would misround
    — and the clamped sums equal a per-row numpy clip."""
    import math

    import ray.data as rd

    from ocr_ray.stages.analysis import winsorized_group_stats

    rng = np.random.RandomState(5)
    rows = []
    for g, n in [("a", 40), ("b", 20), ("c", 7), ("d", 1)]:
        for i in range(n):
            rows.append({"source": g,
                         "text": " ".join(["w"] * int(rng.randint(0, 50)))})
    df = pd.DataFrame(rows)
    out = winsorized_group_stats(rd.from_pandas(df), lo=0.05, hi=0.95)
    out = out.sort_values("source").reset_index(drop=True)

    ntok = df["text"].str.split().str.len().astype("int64")
    for _, r in out.iterrows():
        vals = np.sort(ntok[df["source"] == r["source"]].to_numpy())
        n = len(vals)
        lo_rank = max(1, (n * 50 + 999) // 1000)
        hi_rank = max(1, (n * 950 + 999) // 1000)
        assert r["lo_thr"] == vals[lo_rank - 1]
        assert r["hi_thr"] == vals[hi_rank - 1]
        assert r["n_docs"] == n
        assert r["sum_tok"] == vals.sum()
        assert r["sum_tok_winsor"] == np.clip(
            vals, r["lo_thr"], r["hi_thr"]).sum()
    # the documented float hazard is real: IEEE 0.07*100 rounds up to
    # 7.000000000000001, so a float-ceil rank would read 8 where the
    # exact PERCENTILE_DISC rank is 7
    assert math.ceil(0.07 * 100) == 8 and (100 * 70 + 999) // 1000 == 7


def test_winsorize_empty_and_bad_bounds(ray_session):
    """All-empty corpus returns the typed empty frame; lo > hi raises."""
    import pytest
    import ray.data as rd

    from ocr_ray.stages.analysis import winsorized_group_stats

    df = pd.DataFrame({"source": pd.Series(dtype="object"),
                       "text": pd.Series(dtype="object")})
    out = winsorized_group_stats(rd.from_pandas(df))
    assert len(out) == 0
    assert list(out.columns) == ["source", "n_docs", "lo_thr", "hi_thr",
                                 "sum_tok", "sum_tok_winsor"]

    with pytest.raises(ValueError):
        winsorized_group_stats(rd.from_pandas(df), lo=0.9, hi=0.1)


def test_null_group_keys_and_float_scores(ray_session):
    """Code-review regressions: (a) budget selection and winsorize must
    treat NULL group values as ONE SQL-null group instead of crashing;
    (b) keep_best must preserve float score dtypes (an int64 cast would
    truncate quality scores to 0); (c) the grouped quantile gate's rank
    must use exact integer permille for non-default q."""
    import ray.data as rd

    from ocr_ray.stages.analysis import (
        budget_select_per_group,
        grouped_quantile_gate,
        winsorized_group_stats,
    )
    from ocr_ray.stages.dedup import keep_best_representatives

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "source": ["a", None, None, "a"],
        "text": ["x y", "p q r", "s", "t u v w"],
    })
    sel = (budget_select_per_group(rd.from_pandas(df), budget=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # null group: ids 2,3 -> cum 3,4 both kept; group a: 2,(2+4=6 drop)
    assert list(sel["doc_id"]) == [1, 2, 3]
    assert list(sel["cum_tok"]) == [2, 3, 4]

    w = winsorized_group_stats(rd.from_pandas(df), lo=0.0, hi=1.0)
    assert len(w) == 2  # 'a' + the null group
    null_row = w[w["source"].isna()].iloc[0]
    assert null_row["n_docs"] == 2 and null_row["sum_tok"] == 4

    g = grouped_quantile_gate(
        rd.from_pandas(pd.DataFrame({
            "doc_id": range(100), "lang": ["l"] * 100,
            "text": [" ".join(["w"] * (i + 1)) for i in range(100)],
        })), group_col="lang", q=0.07).to_pandas()
    # exact rank 7 of 1..100 -> threshold 7 -> 94 docs; float ceil
    # would read rank 8 and keep 93
    assert len(g) == 94 and g["thr_len"].iloc[0] == 7

    meta = pd.DataFrame({"doc_id": [1, 2, 3],
                         "quality": [0.9, 0.4, 0.7]})
    clusters = pd.DataFrame({"doc_id": [1, 2], "cluster_id": [1, 1]})
    out = (keep_best_representatives(rd.from_pandas(meta),
                                     rd.from_pandas(clusters),
                                     score_col="quality")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out["doc_id"]) == [1, 3]
    assert out["quality"].tolist() == [0.9, 0.7]  # floats, untruncated


def test_temperature_mix_quota_shape(ray_session):
    """alpha=0.5 upweights small sources: the kept-token share of a
    small source exceeds the big source's; quotas are floor(scale *
    sqrt(tot)) and per-group selections are the id-order prefix."""
    import ray.data as rd

    from ocr_ray.stages.analysis import temperature_mix_select

    # big: 100 docs x 10 tokens = 1000; small: 4 docs x 10 = 40
    rows = [{"doc_id": i, "source": "big",
             "text": " ".join(["w"] * 10)} for i in range(100)]
    rows += [{"doc_id": 1000 + i, "source": "small",
              "text": " ".join(["w"] * 10)} for i in range(4)]
    df = pd.DataFrame(rows)
    out = (temperature_mix_select(rd.from_pandas(df), scale=10,
                                  alpha_pm=500)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    big = out[out["source"] == "big"]
    small = out[out["source"] == "small"]
    # quotas: floor(10*sqrt(1000)) = 316 -> 31 docs; floor(10*sqrt(40))
    # = 63 -> 4 docs (everything)
    assert len(big) == 31 and len(small) == 4
    assert list(big["doc_id"]) == list(range(31))  # id-order prefix
    assert big["n_tok"].sum() / 1000 < small["n_tok"].sum() / 40


def test_temperature_mix_null_source_parity(ray_session):
    """Null-source docs form one group with their OWN quota, and the
    oracle SQL (IS NOT DISTINCT FROM join) agrees with the engine on a
    null-bearing corpus — the review-found divergence where a plain
    USING(source) join silently dropped the NULL group."""
    import duckdb
    import ray.data as rd

    from ocr_ray.pipelines.queries import MIX_TEMP_SCALE, ORACLE_SQL
    from ocr_ray.stages.analysis import temperature_mix_select

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "source": [None, None, "a", "a"],
        "text": ["x y z", "p q", " ".join(["w"] * 200), "t"],
    })
    got = (temperature_mix_select(rd.from_pandas(df),
                                  scale=MIX_TEMP_SCALE, alpha_pm=500)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", df)
    exp = (con.execute(ORACLE_SQL["doc_mix_temperature"]).df()
           .sort_values("doc_id").reset_index(drop=True))
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns)
    pd.testing.assert_frame_equal(got[cols], exp[cols], check_dtype=False)
    # the null group kept both docs (tot 5 -> quota 22); 'a' kept only
    # the 1-token doc 4? no: prefix order is doc_id, so doc 3 (200 tok)
    # exceeds quota floor(10*sqrt(201)) = 141 and blocks doc 4 too
    assert set(got.loc[got["source"].isna(), "doc_id"]) == {1, 2}
    assert (got["source"] == "a").sum() == 0


def test_pipeline_mixture_all_stages_bite(ray_session):
    """The composite's three stages each do work on a synthetic corpus
    (short docs gated, exact dups collapsed keep-first, quotas cap the
    big source) and the engine matches the composed DuckDB oracle."""
    import duckdb
    import ray.data as rd

    from ocr_ray.pipelines.queries import ORACLE_SQL, q_pipeline_mixture

    long = " ".join(f"w{i}" for i in range(30))
    rows = []
    for i in range(60):  # big source incl. 10 exact dups of one text
        rows.append({"doc_id": i, "source": "big",
                     "text": long if i < 10 else long + f" extra{i}"})
    rows.append({"doc_id": 100, "source": "big", "text": "too short"})
    rows.append({"doc_id": 101, "source": None,
                 "text": " ".join(["n"] * 26)})
    df = pd.DataFrame(rows)

    import os
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        got = (q_pipeline_mixture(d).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(
            f"create view documents as select * from "
            f"'{os.path.join(d, 'documents.parquet')}'")
        exp = (con.execute(ORACLE_SQL["pipeline_mixture"]).df()
               .sort_values("doc_id").reset_index(drop=True))
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns)
    pd.testing.assert_frame_equal(got[cols], exp[cols], check_dtype=False)
    kept = set(got["doc_id"])
    assert 100 not in kept                      # gated (9 tokens)
    assert kept & set(range(10)) == {0}         # dup cluster -> keep-first
    assert 101 in kept                          # null source, own quota
