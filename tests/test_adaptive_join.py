"""adaptive_join: the AQE-style skew dispatch built on the round-5
crossover measurement — pure decision rule + end-to-end equality with
both underlying strategies, and the probe-reuse contract."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


class TestAdaptiveChoice:
    def test_memory_mandatory_beats_latency_threshold(self):
        from ocr_ray.stages.join import _adaptive_choice

        # tiny row count but enormous rows: hot partition would not fit
        # one worker -> skew regardless of min_hot_rows
        assert _adaptive_choice(max_lb=1000, bytes_per_row=1e7,
                                heap_budget=1 << 30,
                                min_hot_rows=50_000_000) == "skew"

    def test_latency_crossover(self):
        from ocr_ray.stages.join import _adaptive_choice

        kw = dict(bytes_per_row=16.0, heap_budget=4 << 30)
        assert _adaptive_choice(49_000_000, min_hot_rows=50_000_000,
                                **kw) == "exchange"
        assert _adaptive_choice(50_000_000, min_hot_rows=50_000_000,
                                **kw) == "skew"

    def test_unknown_bytes_per_row_falls_back_to_rows(self):
        from ocr_ray.stages.join import _adaptive_choice

        assert _adaptive_choice(10, bytes_per_row=0.0,
                                heap_budget=1 << 30,
                                min_hot_rows=100) == "exchange"


class TestAdaptiveJoinEndToEnd:
    def _sides(self, n=40_000, skew=0.4):
        rng = np.random.default_rng(3)
        keys = np.where(rng.random(n) < skew, 7,
                        rng.integers(0, 500, size=n)).astype("int64")
        left = pd.DataFrame({"k": keys, "v": np.arange(n, dtype="int64")})
        right = pd.DataFrame({"k": np.arange(500, dtype="int64"),
                              "r": np.arange(500, dtype="int64")})
        return (rd.from_pandas(left).repartition(8).materialize(),
                rd.from_pandas(right).materialize())

    def _canon(self, ds):
        return (ds.to_pandas().sort_values(["k", "v"])
                .reset_index(drop=True)[["k", "v", "r"]])

    def test_below_crossover_matches_exchange(self, ray_session):
        from ocr_ray.stages.join import adaptive_join, exchange_join

        lds, rds = self._sides()
        got = self._canon(adaptive_join(lds, rds, on="k",
                                        n_partitions=8))
        want = self._canon(exchange_join(lds, rds, on="k",
                                         n_partitions=8))
        pd.testing.assert_frame_equal(got, want)

    def test_above_crossover_matches_skew_join(self, ray_session):
        """Force the skew path with min_hot_rows below the planted hot
        mass — results must equal both skew_join and the plain
        exchange (join semantics are strategy-independent)."""
        from ocr_ray.stages.join import (adaptive_join, exchange_join,
                                         skew_join)

        lds, rds = self._sides()
        got = self._canon(adaptive_join(lds, rds, on="k", n_partitions=8,
                                        min_hot_rows=1000))
        pd.testing.assert_frame_equal(
            got, self._canon(skew_join(lds, rds, on="k", n_partitions=8,
                                       left_key_source=lds)))
        pd.testing.assert_frame_equal(
            got, self._canon(exchange_join(lds, rds, on="k",
                                           n_partitions=8)))

    def test_uniform_keys_take_exchange_even_when_forced(self, ray_session):
        """No hot key -> exchange path regardless of thresholds (the
        probe's empty hot set short-circuits)."""
        from ocr_ray.stages.join import adaptive_join, exchange_join

        rng = np.random.default_rng(5)
        left = pd.DataFrame({"k": rng.integers(0, 5000, 20_000)
                             .astype("int64"),
                             "v": np.arange(20_000, dtype="int64")})
        right = pd.DataFrame({"k": np.arange(5000, dtype="int64"),
                              "r": np.arange(5000, dtype="int64")})
        lds = rd.from_pandas(left).repartition(4).materialize()
        rds = rd.from_pandas(right).materialize()
        got = self._canon(adaptive_join(lds, rds, on="k", n_partitions=4,
                                        min_hot_rows=1))
        want = self._canon(exchange_join(lds, rds, on="k",
                                         n_partitions=4))
        pd.testing.assert_frame_equal(got, want)

    def test_facade(self, ray_session):
        import ocr_ray.api as api

        lds, rds = self._sides(n=5000)
        out = api.join_adaptive(lds, rds, on="k").to_pandas()
        assert len(out) == 5000

    def test_unsupported_how_raises_upfront(self, ray_session):
        """how='semi' must fail at PLAN time, not the day skew appears:
        a data-dependent dispatch cannot accept semantics only one of
        its arms supports."""
        from ocr_ray.stages.join import adaptive_join

        lds, rds = self._sides(n=1000)
        with pytest.raises(ValueError, match="inner"):
            adaptive_join(lds, rds, on="k", how="semi")


class TestExemptionProvenance:
    def test_lazy_estimate_keeps_the_floor(self, ray_session):
        """A lazy source's leaf-read estimate understates expanding
        transforms — only EXACT estimates (int src / materialized
        dataset) may bypass the per-core admission floor."""
        import ray

        from ocr_ray.stages.join import exchange_task_memory

        res = ray.cluster_resources()
        floor = int(res["memory"] // max(1, int(res["CPU"])))

        lazy = rd.range(1000)  # tiny leaf estimate, NOT materialized
        req_lazy = exchange_task_memory(lazy, 8)
        # the 4-CPU test session's floor can exceed the 16 GB absolute cap
        assert req_lazy is not None and req_lazy >= min(floor, 16 << 30)

        req_exact = exchange_task_memory(10 << 20, 8)  # 10 MB known bytes
        assert req_exact is not None and req_exact < floor
        assert req_exact == 512 << 20

        mat = rd.range(1000).materialize()
        req_mat = exchange_task_memory(mat, 8)
        assert req_mat is not None and req_mat < floor
