"""Round-3 fixes: distributed exact-dedup facade, single-scan minhash,
NaN-safe props-stats partials, deterministic CDC tiebreak, winnow guard.

Each test pins a judge/advisor finding from VERDICT.md r2 / ADVICE.md."""

import os

import numpy as np
import pandas as pd
import pytest


def test_dedup_pairs_exact_facade_matches_query(ray_session, tmp_path):
    """api.dedup_pairs(method='exact') must produce the same pairs as the
    oracle-checked q_dedup_exact path — computed distributed (hash
    exchange), never by materializing the hashed corpus on the driver
    (VERDICT r2 'What's wrong' #1)."""
    import ray.data as rd

    import ocr_ray.api as ocr

    rng = np.random.default_rng(7)
    texts = [f"document body number {i % 40} with shared tail" for i in range(400)]
    df = pd.DataFrame({"doc_id": rng.permutation(400).astype("int64"),
                       "text": texts})
    ds = rd.from_pandas(df).repartition(8)

    got = ocr.dedup_pairs(ds, method="exact")

    # ground truth straight from pandas: min-id representative per text
    exp_l, exp_r = [], []
    for _, g in df.groupby("text"):
        ids = sorted(g["doc_id"])
        exp_l.extend(ids[0] for _ in ids[1:])
        exp_r.extend(ids[1:])
    exp = (pd.DataFrame({"left_id": exp_l, "right_id": exp_r})
           .astype("int64")
           .sort_values(["left_id", "right_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype("int64").reset_index(drop=True), exp
    )


def test_minhash_input_scanned_once(ray_session):
    """minhash_dedup_pairs has three logical consumers of its input
    (band explode + left/right text attach); the input must be
    materialized once, not re-executed per consumer (VERDICT r2 'What's
    wrong' #2).  A counting pass on the source proves single-scan."""
    import ray
    import ray.data as rd

    from ocr_ray.stages.dedup import minhash_dedup_pairs

    @ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def add(self, k):
            self.n += k

        def total(self):
            return self.n

    counter = Counter.remote()

    df = pd.DataFrame({
        "doc_id": np.arange(60, dtype="int64"),
        "text": [
            " ".join(f"tok{(i * 13 + j) % 25}" for j in range(30))
            for i in range(60)
        ],
    })

    def tick(b: pd.DataFrame) -> pd.DataFrame:
        ray.get(counter.add.remote(len(b)))
        return b

    src = rd.from_pandas(df).repartition(4).map_batches(
        tick, batch_format="pandas")
    pairs = minhash_dedup_pairs(src, threshold=0.5, n_partitions=4)
    pairs.to_pandas()  # drive to completion
    assert ray.get(counter.total.remote()) == len(df)


def test_props_stats_all_nan_batch_does_not_poison_min(ray_session, tmp_path):
    """ADVICE medium: a batch slice whose every props['k'] is malformed
    must not contribute min_k=0 — semantics are TRY_CAST->NULL exclusion,
    matching the DuckDB oracle (COALESCE over NULL-skipping min/max)."""
    import duckdb

    from ocr_ray.pipelines.queries import q_events_props_stats

    sf_dir = str(tmp_path)
    os.makedirs(os.path.join(sf_dir, "events.parquet"), exist_ok=True)
    # shard 0: event_type 'buy' all-malformed (would emit min_k=0 under the
    # old fillna(0) partial); shard 1: real k values for 'buy', all > 0
    pd.DataFrame({
        "event_type": ["buy", "buy", "view"],
        "props": ['{"j": 1}', "not json", '{"k": 7}'],
    }).to_parquet(os.path.join(sf_dir, "events.parquet", "s0.parquet"))
    pd.DataFrame({
        "event_type": ["buy", "buy", "drop"],
        "props": ['{"k": 5}', '{"k": 9}', "{}"],
    }).to_parquet(os.path.join(sf_dir, "events.parquet", "s1.parquet"))

    got = (q_events_props_stats(sf_dir).to_pandas()
           .sort_values("event_type").reset_index(drop=True))

    con = duckdb.connect()
    glob = os.path.join(sf_dir, "events.parquet", "*.parquet")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{glob}')"
    )
    exp = con.execute(r"""
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
          CAST(COALESCE(sum(TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)), 0) AS BIGINT) AS sum_k,
          CAST(COALESCE(min(TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)), 0) AS BIGINT) AS min_k,
          CAST(COALESCE(max(TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)), 0) AS BIGINT) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type
    """).df()
    pd.testing.assert_frame_equal(got, exp)
    # the regression itself: 'buy' min over {5, 9} is 5, never 0
    assert int(got.loc[got["event_type"] == "buy", "min_k"].iloc[0]) == 5
    # all-NULL group coalesces to 0 like the oracle
    assert int(got.loc[got["event_type"] == "drop", "min_k"].iloc[0]) == 0


def test_apply_upserts_change_wins_version_tie(ray_session, tmp_path):
    """ADVICE low: a change row tied with its base row on every order col
    must deterministically win (standard CDC merge expectation)."""
    import ray.data as rd

    from ocr_ray.api import apply_upserts

    base = rd.from_pandas(pd.DataFrame(
        {"k": [1, 2], "version": [3, 3], "v": ["base1", "base2"]}
    ))
    changes = rd.from_pandas(pd.DataFrame(
        {"k": [1], "version": [3], "v": ["change1"]}  # same version as base
    ))
    out_dir = str(tmp_path / "merged")
    for _ in range(3):  # deterministic across repeated runs
        apply_upserts(base, changes, key="k", order_cols=["version"],
                      out_dir=out_dir)
        got = (rd.read_parquet(out_dir).to_pandas()
               .sort_values("k").reset_index(drop=True))
        assert list(got.columns.sort_values()) == ["k", "v", "version"]
        assert list(got["v"]) == ["change1", "base2"]
        import shutil
        shutil.rmtree(out_dir)


def test_winnow_guard_oversized_doc_raises():
    """ADVICE low: a doc with >= 2^20 k-grams must fail loudly instead of
    silently wrapping the position tiebreak."""
    from ocr_ray.stages.analysis import WINNOW_C, WINNOW_K, winnow_docs_batch

    n_tokens = WINNOW_C + WINNOW_K - 1  # exactly C k-grams -> overflow
    batch = pd.DataFrame({"doc_id": [1],
                          "text": [" ".join(["t"] * n_tokens)]})
    with pytest.raises(ValueError, match="WINNOW_C"):
        winnow_docs_batch(batch)

    # the boundary-legal case still works
    ok = pd.DataFrame({"doc_id": [2], "text": ["a b c d e f g h"]})
    out = winnow_docs_batch(ok)
    assert len(out) > 0


def test_auto_partitions_size_derived(ray_session, monkeypatch):
    """VERDICT r2 #4: exchange partition counts derive from input size.
    Same results under an artificially tiny per-partition budget (more,
    smaller partitions) as under the default — the exchange contract is
    partition-count invariant."""
    import ray.data as rd

    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import resolve_partitions

    # explicit wins; non-dataset falls back to default
    assert resolve_partitions(None, 7) == 7
    assert resolve_partitions([1, 2], None, default=5) == 5

    df = pd.DataFrame({"k": np.arange(2000, dtype="int64") % 13,
                       "v": np.ones(2000, dtype="int64")})
    ds = rd.from_pandas(df)  # materialized -> exact size estimate
    n_default = resolve_partitions(ds, None)
    monkeypatch.setenv("OCR_RAY_EXCHANGE_BUDGET_MB", "1")
    # a tiny budget must never shrink the partition count
    assert resolve_partitions(ds, None) >= n_default

    # end-to-end: aggregate result identical under the tiny budget
    out_small = (hash_aggregate(ds, keys=["k"], aggs={"v": "sum"})
                 .to_pandas().sort_values("k").reset_index(drop=True))
    monkeypatch.delenv("OCR_RAY_EXCHANGE_BUDGET_MB")
    out_norm = (hash_aggregate(ds, keys=["k"], aggs={"v": "sum"})
                .to_pandas().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(out_small, out_norm)
    exp = (df.groupby("k", as_index=False)["v"].sum()
           .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(out_norm, exp)


def test_auto_partitions_lazy_read_is_metadata_only(ray_session):
    """The size estimate for a lazy read-based pipeline comes from parquet
    metadata — resolving partitions must not execute the dataset."""
    import ray.data as rd

    from ocr_ray.stages.join import _estimate_bytes, resolve_partitions

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    lazy = ds.map_batches(lambda b: b, batch_format="pandas")
    est = _estimate_bytes(lazy)
    assert est is not None and est > 0
    n = resolve_partitions(lazy, None)
    assert 8 <= n <= 256


def test_connected_components_long_chain_pointer_jumping(ray_session):
    """A 300-node path graph needs ~300 min-propagation rounds; pointer
    jumping must converge it well inside the default max_rounds and label
    every node with the chain minimum."""
    import ray.data as rd

    from ocr_ray.stages.dedup import connected_components

    n = 300
    pairs = pd.DataFrame({
        "left_id": np.arange(n - 1, dtype="int64"),
        "right_id": np.arange(1, n, dtype="int64"),
    })
    out = (connected_components(rd.from_pandas(pairs), n_partitions=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(out) == n
    assert set(out["cluster_id"]) == {0}

    # two chains + a singleton pair: labels stay per-component
    pairs2 = pd.concat([
        pairs,
        pd.DataFrame({"left_id": np.arange(1000, 1099, dtype="int64"),
                      "right_id": np.arange(1001, 1100, dtype="int64")}),
    ], ignore_index=True)
    out2 = (connected_components(rd.from_pandas(pairs2), n_partitions=4)
            .to_pandas())
    assert set(out2.loc[out2["doc_id"] >= 1000, "cluster_id"]) == {1000}
    assert set(out2.loc[out2["doc_id"] < 1000, "cluster_id"]) == {0}
