"""The worker-kill fault drill as a repeatable gate, not a one-off
record: tools/faultdrill.py in a subprocess (it owns its own Ray
session — killing workers inside the shared pytest session would poison
every later test), small corpus, both phases (map-only flagship and the
raw-task exchange)."""

import json
import os
import subprocess
import sys


def test_faultdrill_small_scale():
    env = dict(os.environ,
               FAULT_CONVS="20000", FAULT_KILLS="2", RAY_GRAFT_CPUS="8",
               FAULT_KILL_DELAY="1.0", FAULT_KILL_GAP="0.7")
    proc = subprocess.run(
        [sys.executable, "tools/faultdrill.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=420)
    lines = [json.loads(x) for x in proc.stdout.splitlines()
             if x.startswith("{")]
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert len(lines) == 2
    for rec in lines:
        assert rec["outputs_identical"] is True
        assert rec["workers_killed"] == 2
        assert rec["rows"] > 0
