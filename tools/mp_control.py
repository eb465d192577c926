#!/usr/bin/env python
"""No-Ray hardware control for the scaling criterion (BENCH/BASELINE.md).

Runs the flagship per-batch compute (normalize -> extract+clean, identical
code paths to build_turn_pipeline) over the bench transcript shards with a
plain multiprocessing Pool — one task per parquet file, no Ray anywhere.
Reports rows/s at two worker counts so the VM's raw compute-scaling ceiling
(memory bandwidth, host steal) can be separated from engine overhead.

Usage: python tools/mp_control.py [shard_dir] [w1,w2]
Defaults: the 250k-conv scaling table, workers 6,28.
"""
import glob
import os
import sys
import time
from multiprocessing import Pool

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def work(path: str) -> int:
    import pyarrow.parquet as pq

    from ocr_ray.config import DEFAULT_CONFIG
    from ocr_ray.stages.extract import Extractor
    from ocr_ray.stages.normalize import normalize_batch

    t = pq.read_table(path, columns=list(DEFAULT_CONFIG.read_columns))
    t = normalize_batch(t, config=DEFAULT_CONFIG)
    ex = Extractor(config=DEFAULT_CONFIG, with_clean=True)
    n = 0
    # same batch granularity as the Ray pipeline
    for b in t.to_batches(max_chunksize=DEFAULT_CONFIG.batch_size):
        import pyarrow as pa

        n += ex(pa.Table.from_batches([b])).num_rows
    return n


def main() -> None:
    shard_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/graft_bench_transcripts/c250000/transcripts"
    workers = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "6,28").split(",")]
    files = sorted(glob.glob(os.path.join(shard_dir, "*.parquet")))
    assert files, f"no shards under {shard_dir} (run bench.py --scaling first)"
    out = {}
    for w in workers:
        t0 = time.perf_counter()
        with Pool(w) as p:
            rows = sum(p.map(work, files))
        dt = time.perf_counter() - t0
        out[w] = rows / dt
        print(f"workers={w:3d}  rows={rows}  wall={dt:.1f}s  rows/s={rows/dt:,.0f}")
    if len(workers) == 2:
        a, b = workers
        eff = (out[b] / out[a]) / (b / a)
        print(f"raw-hardware efficiency {a}->{b} workers: {eff:.3f}")


if __name__ == "__main__":
    main()
