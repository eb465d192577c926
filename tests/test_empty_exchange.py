"""All-empty exchange inputs must stay total.

Ray Data passes zero-row blocks through map_batches WITHOUT running the
UDF, so an all-empty upstream delivers the PRE-map schema to the exchange
(join._split_blocks keeps one schema-bearing empty split).  Before the
round-3 hardening, hash_aggregate's combine and exchange_join's merge
KeyError'd on the absent post-map key columns — observed live on
q7_nation_flows at sf0.001, where the nation pair has no suppliers at
all.  These tests pin the fixed behavior: a filter that legitimately
drops every row yields a typed-empty result, not a crash."""

import numpy as np
import pandas as pd
import pytest


def _empty_after_map(rd):
    """A dataset whose map RENAMES columns but whose input is all-empty:
    zero-row blocks skip the UDF, so downstream sees the pre-map schema."""
    src = rd.from_pandas(pd.DataFrame({
        "a": np.arange(64, dtype="int64"),
        "v": np.arange(64, dtype="int64"),
    })).repartition(4).filter(lambda r: r["a"] < 0)  # drops everything

    def rename(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"key": b["a"], "val": b["v"] * 2})

    return src.map_batches(rename, batch_format="pandas")


def test_hash_aggregate_all_empty_premap_schema(ray_session):
    import ray.data as rd

    from ocr_ray.stages.aggregate import hash_aggregate

    out = hash_aggregate(
        _empty_after_map(rd), keys=["key"], aggs={"val": "sum"},
        n_partitions=4,
    )
    assert out.count() == 0  # total, not a KeyError


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_exchange_join_all_empty_left_premap_schema(ray_session, how):
    import ray.data as rd

    from ocr_ray.stages.join import exchange_join

    right = rd.from_pandas(pd.DataFrame({
        "key": np.arange(8, dtype="int64"),
        "r": np.arange(8, dtype="int64"),
    }))
    out = exchange_join(_empty_after_map(rd), right, on="key",
                        n_partitions=4, how=how)
    assert out.count() == 0


@pytest.mark.parametrize("how", ["inner", "semi", "anti"])
def test_exchange_join_all_empty_right_premap_schema(ray_session, how):
    import ray.data as rd

    from ocr_ray.stages.join import exchange_join

    left = rd.from_pandas(pd.DataFrame({
        "key": np.arange(8, dtype="int64"),
        "l": np.arange(8, dtype="int64"),
    }))
    out = exchange_join(left, _empty_after_map(rd), on="key",
                        n_partitions=4, how=how)
    n = out.count()
    if how == "anti":  # nothing to exclude: every left row survives
        assert n == 8
    else:
        assert n == 0


def test_nonempty_missing_key_still_raises(ray_session):
    """The guard must not mask real caller bugs: a NON-empty side without
    the join key is an error, not an empty result."""
    import ray

    import ray.data as rd
    from ocr_ray.stages.join import exchange_join

    left = rd.from_pandas(pd.DataFrame({"wrong": np.arange(4, dtype="int64")}))
    right = rd.from_pandas(pd.DataFrame({"key": np.arange(4, dtype="int64")}))
    with pytest.raises((KeyError, ray.exceptions.RayTaskError, Exception)):
        exchange_join(left, right, on="key", n_partitions=2).materialize()
