"""Crash-consistency at sf0.1 scale (VERDICT r2 next #8): SIGKILL the job
mid-write of a fragment group, resume, and prove the final output is
content-identical to an uninterrupted run.

The commit protocol under test (pipelines/extract.py + state/lineage.py):
a group's parquet files are NOT the commit — the lineage JSON is.  A group
dir without its lineage record is cleared and recomputed on resume, so a
kill -9 at any point inside the write/checksum/convs window must leave the
final (resumed) output exactly equal to a clean run's, in both the turns
and convs partitions."""

import glob
import json
import os
import signal
import subprocess
import sys
import time

import pandas as pd
import pytest


def _cmd(in_dir: str, out_dir: str):
    return [sys.executable, "-m", "ocr_ray.run_job",
            "--input", in_dir, "--output", out_dir,
            "--concurrency", "2", "--batch-size", "512",
            "--fragment-group-size", "2"]


def _env():
    return {**os.environ, "RAY_ADDRESS": ""}


def _read_sorted(path: str, sort_cols):
    import ray.data as rd

    return (rd.read_parquet(path).to_pandas()
            .sort_values(sort_cols).reset_index(drop=True))


def test_kill9_mid_write_resume_content_identical(ray_session, tmp_path):
    from ocr_ray.config import DEFAULT_CONFIG
    from ocr_ray.sources.transcripts import generate_transcripts
    from ocr_ray.state.lineage import completed_groups, group_out_dir

    ver = DEFAULT_CONFIG.extractor_version

    # sf0.1-tier input (same n_convs the sf0.1 transcript queries use),
    # 8 shards / group size 2 -> 4 groups so the kill lands mid-run
    generate_transcripts(str(tmp_path / "gen"), n_convs=1500, seed=42,
                         n_shards=8, with_oracle=False)
    in_dir = str(tmp_path / "gen" / "transcripts")

    # --- uninterrupted reference run
    out_ref = str(tmp_path / "ref")
    r = subprocess.run(_cmd(in_dir, out_ref), capture_output=True, text=True,
                       timeout=900, env=_env())
    assert r.returncode == 0, r.stderr[-2000:]
    n_groups = json.loads(r.stdout.strip().splitlines()[-1])["groups_total"]
    assert n_groups == 4

    # --- killed run: SIGKILL while group 1's parquet files are appearing
    out_kill = str(tmp_path / "kill")
    turns_dir = os.path.join(out_kill, "turns")
    for attempt in range(3):
        proc = subprocess.Popen(_cmd(in_dir, out_kill), env=_env(),
                                stdout=subprocess.DEVNULL,
                                stderr=subprocess.DEVNULL)
        target = group_out_dir(turns_dir, 1)
        deadline = time.time() + 600
        killed = False
        while time.time() < deadline and proc.poll() is None:
            if glob.glob(os.path.join(target, "*.parquet")):
                proc.send_signal(signal.SIGKILL)  # mid-write of group 1
                killed = True
                break
            time.sleep(0.05)
        if proc.poll() is None:
            proc.wait(timeout=60)
        assert killed, "job finished before group 1 started writing"

        done = set(completed_groups(turns_dir, n_groups, ver))
        partial = [g for g in range(n_groups)
                   if g not in done and glob.glob(
                       os.path.join(group_out_dir(turns_dir, g), "*.parquet"))]
        if partial:
            break  # uncommitted group with files on disk: a true mid-write kill
        # boundary-race (kill landed between groups): clear and retry
        import shutil
        shutil.rmtree(out_kill, ignore_errors=True)
    assert partial, "could not produce a mid-write kill in 3 attempts"
    assert len(done) < n_groups

    # --- resume: recomputes exactly the uncommitted groups
    r2 = subprocess.run(_cmd(in_dir, out_kill), capture_output=True, text=True,
                        timeout=900, env=_env())
    assert r2.returncode == 0, r2.stderr[-2000:]
    m2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert set(m2["groups_skipped"]) == done
    assert len(set(completed_groups(turns_dir, n_groups, ver))) == n_groups

    # --- content equality with the clean run, both partitions
    turns_ref = _read_sorted(os.path.join(out_ref, "turns"),
                             ["conv_id", "turn_idx"])
    turns_res = _read_sorted(os.path.join(out_kill, "turns"),
                             ["conv_id", "turn_idx"])
    pd.testing.assert_frame_equal(turns_res, turns_ref)

    convs_ref = _read_sorted(os.path.join(out_ref, "convs"), ["conv_id"])
    convs_res = _read_sorted(os.path.join(out_kill, "convs"), ["conv_id"])
    pd.testing.assert_frame_equal(convs_res, convs_ref)


def test_resume_detects_shifted_fragment_groups(ray_session, tmp_path):
    """Fourth review wave: adding an input file shifts the sorted fragment
    grouping — resume must NOT keep old group outputs that now map to
    different inputs (lineage records compare fragment lists)."""
    import glob
    import os

    import pandas as pd

    from ocr_ray.state.lineage import (LineageRecord, completed_groups,
                                       write_lineage)

    out = str(tmp_path / "turns")
    os.makedirs(os.path.join(out, "group=00000"), exist_ok=True)
    # a committed record for group 0 over fragments [a, b]
    pd.DataFrame({"x": [1, 2, 3]}).to_parquet(
        os.path.join(out, "group=00000", "part.parquet"))
    write_lineage(out, LineageRecord(
        group_id=0, fragments=["a.parquet", "b.parquet"],
        extractor_version="v1", row_count=3, checksum="00", metrics={}))

    same = completed_groups(out, [["/in/a.parquet", "/in/b.parquet"]], "v1")
    assert same == [0]
    # an added file shifts the grouping: [a, ab] no longer matches [a, b]
    shifted = completed_groups(out, [["/in/a.parquet", "/in/ab.parquet"]], "v1")
    assert shifted == []
    # legacy int form still works (no fragment check)
    legacy = completed_groups(out, 1, "v1")
    assert legacy == [0]
