#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline transcript-extraction pipeline plus every
queries() entry over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) under
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and
prints ONE JSON line::

  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "turns": N, "turns_per_sec": N}

``--scaling``: runs the headline pipeline in two fresh processes
(num_cpus=8 and 32) on the same input and prints both throughputs plus the
scaling efficiency ``(T8/T32)/4``.

Env knobs: GRAFT_SF_DIR, RAY_GRAFT_CPUS, GRAFT_BENCH_CONVS (transcript
conversations; default 100000), GRAFT_HEADLINE_ONLY=1 (skip per-query timing).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_CONVS = int(os.environ.get("GRAFT_BENCH_CONVS", "100000"))

# Ray Data's own guidance: >=50% of memory for the object store (default
# 42.9% on this box).  Measured on the headline: 9.2-9.9 s vs 10.0-13.3 s
# across A/B orderings — never worse, up to ~25% better on cold page
# cache.  Inherited by the --scaling subprocesses via the environment.
os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.5")


def _bench_transcripts(n_convs: int) -> str:
    """Deterministic bench transcript table (generated once, cached in /tmp)."""
    from ocr_ray.sources.transcripts import generate_transcripts

    root = f"/tmp/graft_bench_transcripts/c{n_convs}"
    generate_transcripts(
        root, n_convs=n_convs, seed=42, n_shards=64, with_oracle=False, parallel=True
    )
    return os.path.join(root, "transcripts")


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NCPU,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from ocr_ray.pipelines.extract import build_turn_pipeline

    tdir = _bench_transcripts(N_CONVS)

    # warm the OS page cache so we measure compute + shuffle, not cold
    # disk.  count() alone is a parquet-METADATA fast path (reads no data),
    # so force a real full-column scan and take the row count from it
    import pyarrow as _pa

    n_turns = int(
        rd.read_parquet(tdir)
        .map_batches(lambda t: _pa.table({"n": [t.num_rows]}),
                     batch_format="pyarrow")
        .sum("n")
    )

    out_dir = f"/tmp/graft_bench_out/turns-{NCPU}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    # min_rows_per_file sized so write tasks stay parallel at bench scale
    # (200k would coalesce the whole output into one serial write task)
    build_turn_pipeline(tdir).write_parquet(out_dir, min_rows_per_file=20_000)
    headline = time.perf_counter() - t0

    result = {
        "metric": "transcript extraction wall time (read->normalize->extract->clean->write)",
        "value": round(headline, 3),
        "unit": "sec",
        "sf": SF_DIR,
        "num_cpus": NCPU,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / headline, 1),
        "queries": {},
    }

    if os.environ.get("GRAFT_HEADLINE_ONLY") != "1":
        import __ray_entry__ as entry_mod

        for name, fn in entry_mod.queries().items():
            t0 = time.perf_counter()
            res = fn(SF_DIR)
            if hasattr(res, "to_pandas"):
                res = res.to_pandas()
            result["queries"][name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    return result


def run_skew() -> dict:
    """Mega-conversation skew evidence: same conv count, ~30% of all turns
    in one conversation, through extraction + salted reassembly."""
    import ray

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ocr_ray.pipelines.extract import build_turn_pipeline
    from ocr_ray.sources.transcripts import generate_transcripts
    from ocr_ray.stages.reassemble import assemble_conversations

    n_convs = max(2000, N_CONVS // 5)
    out = {}
    for label, mega in [("uniform", 0.0), ("mega30", 0.3)]:
        root = f"/tmp/graft_skew_transcripts/{label}-c{n_convs}"
        generate_transcripts(root, n_convs=n_convs, seed=42, n_shards=32,
                             mega_share=mega, with_oracle=False, parallel=True)
        tdir = os.path.join(root, "transcripts")
        import ray.data as rd

        n = rd.read_parquet(tdir).count()
        t0 = time.perf_counter()
        turns = build_turn_pipeline(tdir)
        convs = assemble_conversations(turns).materialize()
        el = time.perf_counter() - t0
        out[label] = {"turns": n, "convs": convs.count(), "sec": round(el, 3),
                      "turns_per_sec": round(n / el, 1)}
    out["metric"] = "extract+reassemble under mega-conversation skew"
    out["skew_slowdown"] = round(
        (out["mega30"]["sec"] / out["mega30"]["turns"])
        / (out["uniform"]["sec"] / out["uniform"]["turns"]), 3)
    ray.shutdown()
    return out


def run_skew_join() -> dict:
    """A/B: plain exchange_join vs skew_join on a 40%-mass mega key —
    measures the straggler cost the salt-and-replicate path removes."""
    import numpy as np
    import pandas as pd

    import ray

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ocr_ray.stages.join import exchange_join, skew_join

    rng = np.random.default_rng(42)
    n = 4_000_000
    keys = np.where(rng.random(n) < 0.4, 7,
                    rng.integers(0, 10_000, size=n)).astype("int64")
    left = pd.DataFrame({"k": keys, "v": np.arange(n, dtype="int64")})
    right = pd.DataFrame({"k": np.arange(10_000, dtype="int64"),
                          "r": np.arange(10_000, dtype="int64")})
    lds = rd.from_pandas(left).repartition(64).materialize()
    rds = rd.from_pandas(right).materialize()

    out = {"metric": "exchange_join vs skew_join under 40% single-key skew",
           "rows": n, "num_cpus": NCPU}
    t0 = time.perf_counter()
    n1 = exchange_join(lds, rds, on="k", n_partitions=NCPU).count()
    out["exchange_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    n2 = skew_join(lds, rds, on="k", n_partitions=NCPU,
                   left_key_source=lds.select_columns(["k"])).count()
    out["skew_join_sec"] = round(time.perf_counter() - t0, 3)
    assert n1 == n2 == n, (n1, n2, n)
    out["speedup"] = round(out["exchange_sec"] / out["skew_join_sec"], 3)
    ray.shutdown()
    return out


def run_bloom_join() -> dict:
    """A/B: plain exchange_join vs bloom_pruned_join when only ~0.9% of
    the left side matches — measures the shuffle the Bloom mask avoids."""
    import numpy as np
    import pandas as pd

    import ray

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ocr_ray.stages.join import bloom_pruned_join, exchange_join

    rng = np.random.default_rng(42)
    n = 8_000_000
    left = pd.DataFrame({
        "k": rng.integers(0, 1_000_000, size=n).astype("int64"),
        "v": np.arange(n, dtype="int64"),
        # payload column: the bytes the prune saves from the exchange
        "payload": pd.Series(["x" * 64] * n, dtype="string"),
    })
    right = pd.DataFrame({"k": np.arange(0, 9_000, dtype="int64"),
                          "r": np.arange(9_000, dtype="int64")})
    lds = rd.from_pandas(left).repartition(64).materialize()
    rds = rd.from_pandas(right).materialize()

    out = {"metric": "exchange_join vs bloom_pruned_join at ~0.9% selectivity",
           "rows": n, "num_cpus": NCPU}
    t0 = time.perf_counter()
    n1 = exchange_join(lds, rds, on="k", n_partitions=NCPU).count()
    out["exchange_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    n2 = bloom_pruned_join(lds, rds, on="k", n_partitions=NCPU).count()
    out["bloom_sec"] = round(time.perf_counter() - t0, 3)
    assert n1 == n2, (n1, n2)
    out["matched_rows"] = int(n1)
    out["speedup"] = round(out["exchange_sec"] / out["bloom_sec"], 3)
    ray.shutdown()
    return out


def run_scaling() -> dict:
    # larger input than the default bench so fixed per-execution overhead
    # (actor-pool spawn ~3-5s) stays <10% of wall time at 32 CPUs —
    # efficiency at small inputs measures startup noise, not scaling
    scaling_convs = os.environ.get("GRAFT_SCALING_CONVS", str(max(N_CONVS, 250_000)))

    def one(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_HEADLINE_ONLY="1",
            GRAFT_SF_DIR=SF_DIR,
            GRAFT_BENCH_CONVS=scaling_convs,
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = (int(x) for x in os.environ.get("GRAFT_SCALING_CPUS", "8,32").split(","))
    # generation + one warm pass happen inside each child; same input both runs
    r_lo, r_hi = one(lo), one(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    # key names carry the actual CPU counts: with GRAFT_SCALING_CPUS=2,8
    # a hardcoded sec_8/sec_32 would attribute the 2-CPU leg to 8 CPUs
    return {
        "metric": "scaling efficiency (N vs 4N cpus, same input)",
        "cpus": [lo, hi],
        f"sec_{lo}": r_lo["value"],
        f"sec_{hi}": r_hi["value"],
        "turns": r_hi["turns"],
        f"turns_per_sec_{lo}": r_lo["turns_per_sec"],
        f"turns_per_sec_{hi}": r_hi["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--skew-join" in sys.argv:
        print(json.dumps(run_skew_join()))
    elif "--bloom-join" in sys.argv:
        print(json.dumps(run_bloom_join()))
    elif "--skew" in sys.argv:
        print(json.dumps(run_skew()))
    else:
        print(json.dumps(run_bench()))
