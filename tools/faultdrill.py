#!/usr/bin/env python
"""Worker-kill fault drill: prove the flagship pipeline loses no data
when Ray workers die mid-run.

The kill-9 resume test (tests/test_kill_resume.py) covers DRIVER death +
checkpoint resume; this drill covers the other failure class a 256-node
cluster sees weekly: individual WORKER processes dying mid-task (OOM
killer, preemption, hardware).  Ray's task retry + Ray Data's
restartable actor pools are supposed to make that invisible — this
records evidence that they actually do for this build's pipelines.

Protocol:
  1. control run: flagship extraction over N convs -> parquet, no faults;
  2. fault run: same input -> fresh output dir, while a killer thread
     SIGKILLs ``FAULT_KILLS`` random ray:: WORKER processes (never the
     raylet/GCS/driver) spread across the run;
  3. read both outputs and compare as (conv_id, turn_idx)-sorted frames —
     byte-equal or the drill FAILS loudly (duplicate rows from a replayed
     write task would show here, not just missing rows).

Runs twice: the map-only flagship (task + actor-pool retry) and the
conversation-assembly EXCHANGE pipeline (raw num_cpus=0 split/merge
tasks + a materialize barrier — lineage reconstruction must replay lost
split outputs for the merges).  Usage:
python tools/faultdrill.py  [FAULT_CONVS=100000] [FAULT_KILLS=3]
Prints one JSON line per phase.
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CONVS = int(os.environ.get("FAULT_CONVS", "100000"))
N_KILLS = int(os.environ.get("FAULT_KILLS", "3"))
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _worker_pids() -> list[int]:
    """PIDs of BUSY Ray worker processes — the ps comm of a worker
    EXECUTING a task is rewritten to ``ray::<TaskName>``; idle workers
    read ``ray::IDLE`` (killing one injects no fault into the drilled
    pipeline, so they are excluded), and raylet / gcs_server / plasma /
    the driver never carry the prefix."""
    out = subprocess.run(["ps", "-eo", "pid=,comm="], capture_output=True,
                         text=True, timeout=10).stdout
    pids = []
    for line in out.splitlines():
        parts = line.split(None, 1)
        if (len(parts) == 2 and parts[1].startswith("ray::")
                and parts[1].strip() != "ray::IDLE"):
            pids.append(int(parts[0]))
    return pids


class Killer(threading.Thread):
    """SIGKILL ``n`` busy workers, spaced ``gap_s`` apart, starting after
    ``delay_s`` (so the pipeline is genuinely mid-flight).  ``stop()``
    is set when the drilled run completes: a straggling killer must not
    leak kills into the NEXT (control) run — that would fault-inject the
    baseline it is compared against.  Cadence via FAULT_KILL_DELAY /
    FAULT_KILL_GAP so short small-scale runs still land their kills."""

    def __init__(self, n: int, exclude=()):
        super().__init__(daemon=True)
        self.n = n
        # env read per instance, not in a default-arg frozen at import
        self.delay_s = float(os.environ.get("FAULT_KILL_DELAY", "3.0"))
        self.gap_s = float(os.environ.get("FAULT_KILL_GAP", "2.0"))
        # workers that existed BEFORE this drill's ray.init belong to
        # OTHER sessions on the box (e.g. the pytest host session) —
        # never kill those, and never count them as injected faults
        self.exclude = set(exclude)
        self.stop = threading.Event()
        self.killed: list[int] = []

    def run(self):
        if self.stop.wait(self.delay_s):
            return
        import random

        rng = random.Random(42)
        deadline = time.time() + 120
        while (len(self.killed) < self.n and time.time() < deadline
               and not self.stop.is_set()):
            pids = [p for p in _worker_pids()
                    if p not in self.killed and p not in self.exclude]
            if pids:
                pid = rng.choice(pids)
                # recheck AFTER the ps scan: stop may have been set
                # while ps ran, and a late kill would fault-inject the
                # NEXT phase's control run
                if self.stop.is_set():
                    return
                try:
                    os.kill(pid, signal.SIGKILL)
                    self.killed.append(pid)
                except ProcessLookupError:
                    pass
            if self.stop.wait(self.gap_s):
                return


def main() -> None:
    import ray

    foreign = set(_worker_pids())  # other sessions' busy workers
    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import pandas as pd

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ocr_ray.pipelines.extract import build_turn_pipeline
    from ocr_ray.sources.transcripts import generate_transcripts

    root = f"/tmp/graft_bench_transcripts/c{N_CONVS}"
    generate_transcripts(root, n_convs=N_CONVS, seed=42, n_shards=64,
                         with_oracle=False, parallel=True)
    tdir = os.path.join(root, "transcripts")

    def run(out_dir: str, kills: int, build) -> "tuple[float, list[int]]":
        shutil.rmtree(out_dir, ignore_errors=True)
        killer = Killer(kills, exclude=foreign) if kills else None
        t0 = time.perf_counter()
        if killer:
            killer.start()
        build().write_parquet(out_dir, min_rows_per_file=20_000)
        sec = time.perf_counter() - t0
        if killer:
            killer.stop.set()
            killer.join(timeout=5)
        return sec, (killer.killed if killer else [])

    # full-frame equality, not just counts: a replayed write task that
    # double-committed would surface as duplicate rows here
    def frame(d: str, sort_cols) -> "pd.DataFrame":
        df = pd.read_parquet(d)
        return (df.sort_values(sort_cols, kind="mergesort")
                .reset_index(drop=True)[sorted(df.columns)])

    def drill(metric: str, build, sort_cols) -> bool:
        import tempfile

        # per-drill dirs: fixed paths collided when two drills (e.g. the
        # pytest gate + a manual run) shared a CPU count
        base = tempfile.mkdtemp(prefix=f"graft_fault_{NCPU}_")
        ctl_dir = os.path.join(base, "ctl")
        flt_dir = os.path.join(base, "flt")
        ctl_sec, _ = run(ctl_dir, 0, build)
        flt_sec, killed = run(flt_dir, N_KILLS, build)
        a, b = frame(ctl_dir, sort_cols), frame(flt_dir, sort_cols)
        equal = a.equals(b)
        print(json.dumps({
            "metric": f"worker-kill fault drill ({metric})",
            "n_convs": N_CONVS, "num_cpus": NCPU,
            "rows": int(len(a)),
            "workers_killed": len(killed),
            "control_sec": round(ctl_sec, 2),
            "fault_sec": round(flt_sec, 2),
            "outputs_identical": bool(equal),
        }), flush=True)
        if equal:
            shutil.rmtree(base, ignore_errors=True)
        else:
            # keep the evidence: a real lost/duplicated-row bug is the
            # event this drill exists to catch — the frames must remain
            # diffable, not vanish with the failure
            print(f"MISMATCH — outputs kept for diffing: {ctl_dir} vs "
                  f"{flt_dir}", flush=True)
        return equal and len(killed) >= N_KILLS

    from ocr_ray.stages.reassemble import assemble_conversations

    ok1 = drill("flagship extraction, map-only",
                lambda: build_turn_pipeline(tdir),
                ["conv_id", "turn_idx"])
    ok2 = drill("conversation assembly, raw-task exchange",
                lambda: assemble_conversations(build_turn_pipeline(tdir)),
                ["conv_id"])
    ray.shutdown()
    if not (ok1 and ok2):
        sys.exit(1)


if __name__ == "__main__":
    main()
