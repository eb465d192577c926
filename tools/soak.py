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
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    # SOAK_PHASES selects which phases run (default "1,2", the original
    # surface): 1 = flagship extraction, 2 = exact-verify MinHash,
    # 3 = SimHash (same controlled corpus), 4 = estimate-verify MinHash
    # with planted-pair recall / false-survivor accounting vs the exact
    # pair set.
    phases = set(os.environ.get("SOAK_PHASES", "1,2").split(","))

    if "1" in phases:
        _phase1()
    if phases & {"2", "3", "4"}:
        _doc_phases(phases)
    ray.shutdown()


def _sampled(fn):
    """Run ``fn`` under a fresh memory sampler; returns (result, sec,
    peak_store_gb, peak_rss_gb) — per-phase peaks, not run-wide."""
    sampler = MemSampler()
    sampler.start()
    t0 = time.perf_counter()
    out = fn()
    sec = time.perf_counter() - t0
    sampler.stop.set()
    sampler.join(timeout=5)
    return (out, sec, round(sampler.peak_obj / 2**30, 2),
            round(sampler.peak_rss_kb * 1024 / 2**30, 2))


def _phase1() -> None:
    import pyarrow as pa

    import ray.data as rd
    from ocr_ray.pipelines.extract import build_turn_pipeline
    from ocr_ray.sources.transcripts import generate_transcripts

    root = f"/tmp/graft_bench_transcripts/c{N_CONVS}"
    generate_transcripts(root, n_convs=N_CONVS, seed=42, n_shards=64,
                         with_oracle=False, parallel=True)
    tdir = os.path.join(root, "transcripts")
    # full-column warm scan (count() alone is a metadata fast path)
    n_turns = int(rd.read_parquet(tdir)
                  .map_batches(lambda t: pa.table({"n": [t.num_rows]}),
                               batch_format="pyarrow").sum("n"))

    out_dir = f"/tmp/graft_soak_out/turns-{NCPU}"
    shutil.rmtree(out_dir, ignore_errors=True)
    _, sec, peak_store, peak_rss = _sampled(
        lambda: build_turn_pipeline(tdir).write_parquet(
            out_dir, min_rows_per_file=20_000))
    # measured and verified written — free the ~8 GB before the dedup
    # phase so object-store spill has the disk to itself
    n_files = len(os.listdir(out_dir))
    shutil.rmtree(out_dir, ignore_errors=True)
    print(json.dumps({
        "metric": "soak phase 1: flagship extraction",
        "n_convs": N_CONVS, "turns": n_turns, "num_cpus": NCPU,
        "n_output_files": n_files,
        "flagship_sec": round(sec, 2),
        "flagship_turns_per_sec": round(n_turns / sec, 1),
        "peak_object_store_gb": peak_store,
        "peak_ray_rss_gb": peak_rss,
    }), flush=True)


def _gen_docs(n_docs: int, n_tokens: int = 100) -> str:
    """The controlled-duplicate doc corpus (90% unique random-vocab
    docs, 10% one-token mutants of the preceding base doc).  The bench
    conversation generator is NOT usable for dedup soaks: its templated
    conversations are pathologically self-similar (100k convs -> 5.15M
    band candidates, 423-doc near-identical buckets), so candidates grow
    ~quadratically at value-checkable band settings and text-attach
    traffic is O(pairs x text) on ANY engine — the documented
    exact-dedup-first / raise-rows-per-band contract governs that input
    class.  A controlled corpus measures what production dedup actually
    does: linear candidates, bounded buckets.  Planted positives are
    exactly the (id-1, id) pairs with id %% 10 == 9 (the first row of a
    shard never mutates: base is None there)."""
    import ray

    @ray.remote(num_cpus=1)
    def gen_doc_shard(path: str, shard: int, n: int, start_id: int,
                      dup_every: int = 10, n_tokens: int = n_tokens):
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
                toks = [f"tok{v:05d}"
                        for v in rng.integers(0, 50_000, n_tokens)]
                base = " ".join(toks)
                texts.append(base)
        _pd.DataFrame({"doc_id": ids, "text": texts}).to_parquet(
            f"{path}/shard-{shard:05d}.parquet")
        return n

    ddir = (f"/tmp/graft_soak_docs/n{n_docs}" if n_tokens == 100
            else f"/tmp/graft_soak_docs/n{n_docs}-t{n_tokens}")
    if not os.path.isdir(ddir):
        os.makedirs(ddir, exist_ok=True)
        per = n_docs // 64
        ray.get([gen_doc_shard.remote(ddir, s, per, s * per)
                 for s in range(64)])
    return ddir


def _planted_stats(pairs_df, per_shard: int):
    """(n_planted_expected, n_planted_found, n_extra) for a pair frame
    with smaller-id-first (left, right) columns.  Planted = the
    (id-1, id) pairs whose SHARD-LOCAL index i = id mod per_shard has
    i % 10 == 9 (ids are start_id + i per shard, and every 10th local
    row mutates — base is already set from local row 0), i.e. exactly
    64 * len(range(9, per_shard, 10)) pairs (499,968 at 5M docs, the
    number the exact path finds)."""
    import numpy as np

    lcol = [c for c in pairs_df.columns if "left" in c or c == "a"][0]
    rcol = [c for c in pairs_df.columns if "right" in c or c == "b"][0]
    left = pairs_df[lcol].to_numpy(dtype="int64")
    right = pairs_df[rcol].to_numpy(dtype="int64")
    lo = np.minimum(left, right)
    hi = np.maximum(left, right)
    planted_mask = (hi == lo + 1) & ((hi % per_shard) % 10 == 9)
    n_expected = 64 * len(range(9, per_shard, 10))
    return n_expected, int(planted_mask.sum()), int((~planted_mask).sum())


def _doc_phases(phases) -> None:
    import ray

    import ray.data as rd
    from ocr_ray.stages.dedup import minhash_dedup_pairs, simhash_dedup_pairs

    n_docs = int(os.environ.get("SOAK_DOCS", "5000000"))
    per_shard = n_docs // 64
    ddir = _gen_docs(n_docs)
    store_total = round(
        ray.cluster_resources().get("object_store_memory", 0) / 2**30, 2)

    if "2" in phases:
        def run():
            pairs = minhash_dedup_pairs(
                rd.read_parquet(ddir), n_perm=64, n_bands=16, shingle_k=3,
                threshold=0.8, text_col="text", id_col="doc_id",
                n_partitions=None)
            return pairs.count()

        n_pairs, sec, peak_store, peak_rss = _sampled(run)
        print(json.dumps({
            "metric": "soak phase 2: doc-level minhash near-dup "
                      "(controlled 10% mutant rate)",
            "n_docs": n_docs, "num_cpus": NCPU,
            "dedup_sec": round(sec, 2),
            "docs_per_sec": round(n_docs / sec, 1),
            "n_dedup_pairs": int(n_pairs),
            "expected_pairs": n_docs // 10,
            "peak_object_store_gb": peak_store,
            "object_store_total_gb": store_total,
            "peak_ray_rss_gb": peak_rss,
        }), flush=True)

    if "3" in phases:
        # SimHash soak parity (VERDICT r4 task #5) — at the PRODUCTION
        # operating point, which differs from minhash's: simhash banding
        # is a VERY-near-dup detector.  Wide bands (4 x 16-bit SipHash,
        # exact for Hamming <= 3) keep random collisions bounded
        # (n/2^16 docs per bucket -> ~27M candidates at 1M docs), where
        # the oracle-checked narrow-band config (10 x ~6-bit) is
        # quadratic in corpus size (64k docs already built 21 GB of
        # store; 6-bit buckets hold n/64 docs each).  Matching the
        # detector, the corpus is 1000-token docs with a one-token
        # mutant every 10th: measured mutant Hamming mean 1.7 / p95 4,
        # so the exact Hamming<=3 filter catches ~90% of planted pairs
        # (reported as planted_found; the filter itself is exact by the
        # pigeonhole banding).  SOAK_SIMHASH_DOCS sizes the corpus.
        n_sim = int(os.environ.get("SOAK_SIMHASH_DOCS", "1000000"))
        sim_per = n_sim // 64
        sdir = _gen_docs(n_sim, n_tokens=1000)

        def run():
            pairs = simhash_dedup_pairs(
                rd.read_parquet(sdir), n_bands=4, shingle_k=3,
                max_hamming=3, scheme="siphash", text_col="text",
                id_col="doc_id", n_partitions=None)
            return pairs.to_pandas()

        pdf, sec, peak_store, peak_rss = _sampled(run)
        n_exp, n_found, n_extra = _planted_stats(pdf, sim_per)
        print(json.dumps({
            "metric": "soak phase 3: doc-level simhash near-dup "
                      "(siphash 4x16-bit bands, exact Hamming<=3, "
                      "1000-token docs)",
            "n_docs": n_sim, "num_cpus": NCPU,
            "dedup_sec": round(sec, 2),
            "docs_per_sec": round(n_sim / sec, 1),
            "n_dedup_pairs": int(len(pdf)),
            "planted_expected": n_exp,
            "planted_found": n_found,
            "planted_recall": round(n_found / max(1, n_exp), 6),
            "non_planted_pairs": n_extra,
            "peak_object_store_gb": peak_store,
            "object_store_total_gb": store_total,
            "peak_ray_rss_gb": peak_rss,
        }), flush=True)

    if "4" in phases:
        # estimate-verify recall at soak scale (VERDICT r4 task #6):
        # verify="estimate" ships 512-byte signatures instead of text;
        # report planted recall AND false survivors vs the planted set
        def run():
            pairs = minhash_dedup_pairs(
                rd.read_parquet(ddir), n_perm=64, n_bands=16, shingle_k=3,
                threshold=0.8, text_col="text", id_col="doc_id",
                n_partitions=None, verify="estimate")
            return pairs.to_pandas()

        pdf, sec, peak_store, peak_rss = _sampled(run)
        n_exp, n_found, n_extra = _planted_stats(pdf, per_shard)
        print(json.dumps({
            "metric": "soak phase 4: minhash estimate-verify "
                      "(signature-scored jaccard_est, same corpus)",
            "n_docs": n_docs, "num_cpus": NCPU,
            "dedup_sec": round(sec, 2),
            "docs_per_sec": round(n_docs / sec, 1),
            "n_dedup_pairs": int(len(pdf)),
            "planted_expected": n_exp,
            "planted_found": n_found,
            "planted_recall": round(n_found / max(1, n_exp), 6),
            "false_survivors": n_extra,
            "peak_object_store_gb": peak_store,
            "object_store_total_gb": store_total,
            "peak_ray_rss_gb": peak_rss,
        }), flush=True)


if __name__ == "__main__":
    main()
