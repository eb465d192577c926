"""Wave-11 hardening: SQL NULL-group parity in hash_aggregate, fuzzy-join
totality on all-empty inputs."""

import numpy as np
import pandas as pd


def test_hash_aggregate_groups_null_keys_like_sql(ray_session):
    """SQL GROUP BY puts every NULL key in ONE group; pandas' groupby
    default silently drops NaN/None-keyed rows.  hash_aggregate must keep
    them (dropna=False) or any aggregate over a nullable key understates."""
    import ray.data as rd

    from ocr_ray.stages.aggregate import hash_aggregate

    # float key with NaNs, spread over several blocks so null-keyed rows
    # must MEET through the exchange (the hash has to be deterministic)
    df = pd.DataFrame({
        "k": [1.0, np.nan, 2.0, np.nan, np.nan, 1.0] * 50,
        "v": np.arange(300, dtype="int64"),
    })
    out = (hash_aggregate(rd.from_pandas(df).repartition(6),
                          keys=["k"], aggs={"v": "sum"})
           .to_pandas())
    exp = df.groupby("k", as_index=False, dropna=False)["v"].sum()
    got_nan = int(out.loc[out["k"].isna(), "v"].sum())
    exp_nan = int(exp.loc[exp["k"].isna(), "v"].sum())
    assert len(out) == 3  # 1.0, 2.0 and the single merged NULL group
    assert (out["k"].isna()).sum() == 1
    assert got_nan == exp_nan
    for key in (1.0, 2.0):
        assert (int(out.loc[out["k"] == key, "v"].iloc[0])
                == int(exp.loc[exp["k"] == key, "v"].iloc[0]))

    # object key with None: same contract
    df2 = pd.DataFrame({"k": ["a", None, "b", None] * 25,
                        "v": np.ones(100, dtype="int64")})
    out2 = (hash_aggregate(rd.from_pandas(df2).repartition(4),
                           keys=["k"], aggs={"v": "sum"})
            .to_pandas())
    assert len(out2) == 3
    assert int(out2.loc[out2["k"].isna(), "v"].iloc[0]) == 50


def test_fuzzy_join_total_on_empty_inputs(ray_session):
    """All-empty sides: every upstream block skips the tagging UDF, so the
    candidate partition carries a pre-map schema without `_side` — the
    pair kernel must return the typed empty, not KeyError."""
    import ray.data as rd

    from ocr_ray.stages.join import fuzzy_join_ed1

    empty = pd.DataFrame({"cid": pd.Series(dtype="int64"),
                          "name": pd.Series(dtype="object")})
    left = rd.from_pandas(empty)
    right = rd.from_pandas(empty.rename(columns={"cid": "sid"}))
    out = fuzzy_join_ed1(left, right, left_id="cid", left_name="name",
                         right_id="sid", right_name="name",
                         n_partitions=4)
    assert out.count() == 0

    # one-sided empty: still total, still zero matches
    l2 = rd.from_pandas(pd.DataFrame({"cid": [1, 2],
                                      "name": ["alpha", "beta"]}))
    out2 = fuzzy_join_ed1(l2, right, left_id="cid", left_name="name",
                          right_id="sid", right_name="name",
                          n_partitions=4)
    assert out2.count() == 0
