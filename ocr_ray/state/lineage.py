"""Checkpoint/resume via per-partition lineage records.

Replaces the reference's content-insensitive disk cache
(``ocr_app/utils/performance.py:190-268`` — a known pathology, SURVEY §4.2)
with a deterministic fragment-group → output-partition mapping:

* input Parquet fragments are split into deterministic *groups* (sorted
  path order, fixed group size);
* each group's output lands in ``out_dir/group=<gid>/`` and, once fully
  written, a lineage record ``out_dir/_lineage/group-<gid>.json`` is
  committed with input fragment ids, extractor version, row count and a
  value checksum;
* resume = skip every group whose lineage record exists, is
  version-compatible, and whose output row count re-validates.

The lineage write is the commit point: a crash mid-group leaves no record,
so the rerun redoes that group into the same deterministic location.
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
from typing import Dict, List

import pyarrow.parquet as pq


@dataclasses.dataclass
class LineageRecord:
    group_id: int
    fragments: List[str]
    extractor_version: str
    row_count: int
    checksum: str
    metrics: Dict

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), sort_keys=True)


def group_fragments(input_paths: List[str], group_size: int) -> List[List[str]]:
    """Deterministic grouping: sort paths, chunk by fixed size."""
    paths = sorted(input_paths)
    return [paths[i : i + group_size] for i in range(0, len(paths), group_size)]


def _lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def lineage_path(out_dir: str, group_id: int) -> str:
    return os.path.join(_lineage_dir(out_dir), f"group-{group_id:05d}.json")


def group_out_dir(out_dir: str, group_id: int) -> str:
    return os.path.join(out_dir, f"group={group_id:05d}")


def write_lineage(out_dir: str, record: LineageRecord) -> None:
    os.makedirs(_lineage_dir(out_dir), exist_ok=True)
    tmp = lineage_path(out_dir, record.group_id) + ".tmp"
    with open(tmp, "w") as f:
        f.write(record.to_json())
    os.replace(tmp, lineage_path(out_dir, record.group_id))  # atomic commit


def read_lineage(out_dir: str, group_id: int) -> LineageRecord | None:
    path = lineage_path(out_dir, group_id)
    if not os.path.exists(path):
        return None
    try:
        return LineageRecord(**json.load(open(path)))
    except Exception:
        return None


def validate_group(out_dir: str, record: LineageRecord, extractor_version: str,
                   expected_fragments: "List[str] | None" = None) -> bool:
    """A group is done iff its record matches the running version, maps to
    the SAME input fragments (an added/removed input file shifts the
    sorted grouping — a stale record would silently map old output to the
    wrong inputs), and the written partition still holds exactly the
    recorded row count."""
    if record.extractor_version != extractor_version:
        return False
    if (expected_fragments is not None
            and list(record.fragments) != list(expected_fragments)):
        return False
    gdir = group_out_dir(out_dir, record.group_id)
    files = glob.glob(os.path.join(gdir, "*.parquet"))
    if not files:
        return False
    try:
        rows = 0
        hsum = 0
        has_hash = True
        for f in files:
            pf = pq.ParquetFile(f)
            rows += pf.metadata.num_rows
            if "row_hash" not in pf.schema_arrow.names:
                has_hash = False  # legacy layout: rows-only validation
                continue
            # recompute the persisted value checksum from the 8-byte
            # row_hash column only (~1% of a full re-read) — the same
            # mod-2^64 sum the write pass recorded; without this compare
            # the record's checksum field was write-only and resume
            # accepted any corruption that preserved the row count
            col = pq.read_table(f, columns=["row_hash"])["row_hash"]
            hsum = (hsum + int(col.to_pandas().sum() or 0)) \
                & 0xFFFFFFFFFFFFFFFF
    except Exception:
        return False
    if rows != record.row_count:
        return False
    return (not has_hash) or f"{hsum:016x}" == record.checksum


def completed_groups(out_dir: str, groups, extractor_version: str) -> List[int]:
    """``groups``: either the current list of fragment-path groups (each a
    list of paths — basenames are compared against the committed record)
    or, legacy, a bare group count (skips the fragment check)."""
    if isinstance(groups, int):
        expected = [None] * groups
    else:
        expected = [[os.path.basename(p) for p in g] for g in groups]
    done = []
    for gid, exp in enumerate(expected):
        rec = read_lineage(out_dir, gid)
        if rec is not None and validate_group(out_dir, rec,
                                              extractor_version, exp):
            done.append(gid)
    return done
