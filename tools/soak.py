#!/usr/bin/env python
"""Sustained-scale soak with memory evidence (VERDICT r3 task #5).

Phase 1: the flagship extraction pipeline over a ~10x-sf0.1 transcript
corpus (default 1M conversations, ~12.6M turns).  Phase 2: distributed
MinHash near-dup over a 5M-doc corpus with controlled duplicate
structure (see the phase-2 comment for why the templated conversation
generator is the wrong dedup input).  Both run in ONE 32-CPU session
while a sampler thread records peak Ray object-store usage and peak
summed ray-process RSS — proving the streaming claim with a memory
ceiling, not just wall time.

Usage: python tools/soak.py
  [SOAK_CONVS=1000000] [SOAK_DOCS=5000000] [RAY_GRAFT_CPUS=32]
Prints one JSON line per phase.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CONVS = int(os.environ.get("SOAK_CONVS", "1000000"))
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# 0.5 per Ray Data's own guidance: with exchange task heap throttled by
# the memory-resource requests (join.py memory invariant), the bigger
# store is safe and halves the spill volume the dedup phase pushes to
# disk (a 0.35 store ran this box's disk to the 95% OutOfDisk cutoff)
os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.5")


class MemSampler(threading.Thread):
    """0.5s cadence: Ray object-store bytes in use (total - available)
    and summed RSS of every live process with 'ray' in its argv (raylet,
    plasma, workers — the driver included)."""

    def __init__(self):
        super().__init__(daemon=True)
        self.peak_obj = 0.0
        self.peak_rss_kb = 0
        self.stop = threading.Event()

    def run(self):
        import ray

        total = ray.cluster_resources().get("object_store_memory", 0.0)
        while not self.stop.is_set():
            try:
                avail = ray.available_resources().get(
                    "object_store_memory", total)
                self.peak_obj = max(self.peak_obj, total - avail)
                out = subprocess.run(
                    ["ps", "-eo", "rss=,args="], capture_output=True,
                    text=True, timeout=5).stdout
                rss = sum(int(line.split(None, 1)[0])
                          for line in out.splitlines()
                          if "ray" in line.lower() and line.split())
                self.peak_rss_kb = max(self.peak_rss_kb, rss)
            except Exception:
                pass
            self.stop.wait(0.5)


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ocr_ray.pipelines.extract import build_turn_pipeline
    from ocr_ray.sources.transcripts import generate_transcripts
    from ocr_ray.stages.dedup import minhash_dedup_pairs


    def corpus(n_convs: int) -> "tuple[str, int]":
        root = f"/tmp/graft_bench_transcripts/c{n_convs}"
        generate_transcripts(root, n_convs=n_convs, seed=42, n_shards=64,
                             with_oracle=False, parallel=True)
        tdir = os.path.join(root, "transcripts")
        # full-column warm scan (count() alone is a metadata fast path)
        n = int(rd.read_parquet(tdir)
                .map_batches(lambda t: pa.table({"n": [t.num_rows]}),
                             batch_format="pyarrow").sum("n"))
        return tdir, n

    tdir, n_turns = corpus(N_CONVS)

    sampler = MemSampler()
    sampler.start()

    out_dir = f"/tmp/graft_soak_out/turns-{NCPU}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    build_turn_pipeline(tdir).write_parquet(out_dir,
                                            min_rows_per_file=20_000)
    flagship_sec = time.perf_counter() - t0
    # measured and verified written — free the ~8 GB before the dedup
    # phase so object-store spill has the disk to itself
    n_files = len(os.listdir(out_dir))
    shutil.rmtree(out_dir, ignore_errors=True)
    print(json.dumps({
        "metric": "soak phase 1: flagship extraction",
        "n_convs": N_CONVS, "turns": n_turns, "num_cpus": NCPU,
        "n_output_files": n_files,
        "flagship_sec": round(flagship_sec, 2),
        "flagship_turns_per_sec": round(n_turns / flagship_sec, 1),
        "peak_object_store_gb": round(sampler.peak_obj / 2**30, 2),
        "peak_ray_rss_gb": round(sampler.peak_rss_kb * 1024 / 2**30, 2),
    }), flush=True)

    # ---- phase 2: MinHash near-dup over a 5M-doc corpus with CONTROLLED
    # duplicate structure (90% unique random-vocab docs, 10% one-token
    # mutants of a base doc).  The conversation corpus from the bench
    # generator is NOT usable here: its templated conversations are
    # pathologically self-similar (100k convs -> 5.15M band candidates,
    # band buckets of 423 docs that are near- but not exactly identical),
    # so conv-level candidates grow ~quadratically at the
    # value-checkable 32x2 band setting and the text-attach traffic is
    # O(pairs x text) on ANY engine — the documented
    # exact-dedup-first / raise-rows-per-band contract governs that
    # input class.  A controlled corpus measures what production dedup
    # actually does: linear candidates, bounded buckets.
    import numpy as np

    @ray.remote(num_cpus=1)
    def gen_doc_shard(path: str, shard: int, n: int, start_id: int,
                      dup_every: int = 10):
        import numpy as _np
        import pandas as _pd

        rng = _np.random.default_rng(1000 + shard)
        ids = _np.arange(start_id, start_id + n, dtype="int64")
        texts = []
        base = None
        for i in range(n):
            if i % dup_every == dup_every - 1 and base is not None:
                toks = base.split()
                toks[len(toks) // 2] = "mutant"
                texts.append(" ".join(toks))
            else:
                toks = [f"tok{v:05d}" for v in rng.integers(0, 50_000, 100)]
                base = " ".join(toks)
                texts.append(base)
        _pd.DataFrame({"doc_id": ids, "text": texts}).to_parquet(
            f"{path}/shard-{shard:05d}.parquet")
        return n

    N_DOCS = int(os.environ.get("SOAK_DOCS", "5000000"))
    ddir = f"/tmp/graft_soak_docs/n{N_DOCS}"
    if not os.path.isdir(ddir):
        os.makedirs(ddir, exist_ok=True)
        per = N_DOCS // 64
        ray.get([gen_doc_shard.remote(ddir, s, per, s * per)
                 for s in range(64)])

    t0 = time.perf_counter()
    docs = rd.read_parquet(ddir)
    pairs = minhash_dedup_pairs(
        docs, n_perm=64, n_bands=16, shingle_k=3, threshold=0.8,
        text_col="text", id_col="doc_id", n_partitions=None)
    n_pairs = pairs.count()
    dedup_sec = time.perf_counter() - t0

    sampler.stop.set()
    sampler.join(timeout=5)

    print(json.dumps({
        "metric": "soak phase 2: doc-level minhash near-dup (controlled "
                  "10% mutant rate)",
        "n_docs": N_DOCS,
        "num_cpus": NCPU,
        "dedup_sec": round(dedup_sec, 2),
        "docs_per_sec": round(N_DOCS / dedup_sec, 1),
        "n_dedup_pairs": int(n_pairs),
        "expected_pairs": N_DOCS // 10,
        "peak_object_store_gb": round(sampler.peak_obj / 2**30, 2),
        "object_store_total_gb": round(
            ray.cluster_resources().get("object_store_memory", 0) / 2**30,
            2),
        "peak_ray_rss_gb": round(sampler.peak_rss_kb * 1024 / 2**30, 2),
    }), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
