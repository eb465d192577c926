"""Flagship extraction pipeline (SURVEY §3.4).

    read_parquet(transcripts)                          # blocks = Arrow tables
      .map_batches(normalize_batch,  pyarrow)          # M1-M8, vectorized
      .map_batches(Extractor, actor pool, pyarrow)     # A1-A3 + C1/C2
      .map_batches(clean_batch,      pyarrow)          # M9/M10 exact-match
      -> per-turn output (no shuffle), and optionally
      .groupby(conv_id salted).map_groups(...)         # L1/L4 reassembly

``run_extraction_job`` adds the scale scaffolding: deterministic
fragment-group checkpointing with per-partition lineage + metrics
(state/lineage.py), so a killed run resumes by skipping committed groups.
"""

from __future__ import annotations

import glob
import os
import shutil
import time
from typing import Dict, List, Optional

import pandas as pd
import pyarrow as pa

import ray.data as rd

from ocr_ray.config import DEFAULT_CONFIG, PipelineConfig
from ocr_ray.stages.extract import Extractor
from ocr_ray.stages.normalize import normalize_batch
from ocr_ray.stages.reassemble import assemble_conversations
from ocr_ray.state import lineage as L


def _default_pool_size() -> int:
    """Actor-pool size that leaves CPU headroom for read/write task pools —
    a pool reserving every CPU starves the other stages (guide: Pitfalls).
    Headroom scales with the node (~1/8 of CPUs, min 2 from 8 CPUs up):
    measured on the 1.27M-turn bench, cpus-4 at 32 CPUs beats cpus-2 by
    ~25% because the parquet write tail otherwise drains on 2 CPUs.  Below
    8 CPUs the headroom is exactly 1 — the old min-2 headroom combined
    with the min-2 pool meant a 2-CPU node reserved BOTH CPUs for actors
    and the read tasks never scheduled (observed permanent stall)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    headroom = max(2, cpus // 8) if cpus >= 8 else 1
    return max(1, cpus - headroom)


def build_turn_pipeline(
    paths: List[str] | str,
    config: PipelineConfig = DEFAULT_CONFIG,
    concurrency: Optional[int] = None,
    emit_segments: bool = False,
) -> "rd.Dataset":
    """Lazy per-turn pipeline: transcripts parquet -> extracted+cleaned turns.

    ``emit_segments=True`` adds the detected-text-element column
    ``segments: list<struct<seg_idx,kind,text,conf>>`` (SURVEY §1.2)."""
    ds = rd.read_parquet(paths, columns=list(config.read_columns))
    ds = ds.map_batches(
        normalize_batch,
        batch_format="pyarrow",
        fn_kwargs={"config": config},
    )
    # cleanup (M9/M10) is fused into the extractor actor call: the actor pool
    # reserves most CPUs for the whole execution, so a separate downstream
    # clean stage would run on the leftover CPUs and serialize the job
    ds = ds.map_batches(
        Extractor,
        batch_format="pyarrow",
        batch_size=config.batch_size,
        concurrency=concurrency or config.extract_concurrency or _default_pool_size(),
        num_cpus=1,
        fn_constructor_kwargs={
            "config": config,
            "with_clean": True,
            "emit_segments": emit_segments,
        },
    )
    return ds


def _add_row_hash(batch: pa.Table) -> pa.Table:
    """Append a per-row value hash over the key+value cols.  Computed in the
    write pass and persisted, so the post-write checksum validation reads
    ONLY this 8-byte column back — not the whole group (the former full
    re-read was a 2x read amplification per group)."""
    df = batch.select(["conv_id", "turn_idx", "clean_text"]).to_pandas()
    h = pd.util.hash_pandas_object(df, index=False).to_numpy()
    return batch.append_column("row_hash", pa.array(h, pa.uint64()))


def _checksum_batch(batch: pa.Table) -> pa.Table:
    """Per-batch partial checksum from the persisted row_hash column."""
    h = int(batch["row_hash"].to_pandas().sum()) & 0xFFFFFFFFFFFFFFFF
    return pa.table(
        {
            "hash_sum": pa.array([h], pa.uint64()),
            "rows": pa.array([batch.num_rows], pa.int64()),
        }
    )


def run_extraction_job(
    input_dir: str,
    out_dir: str,
    config: PipelineConfig = DEFAULT_CONFIG,
    with_conversations: bool = True,
    resume: bool = True,
) -> Dict:
    """Checkpointed run over all fragments in ``input_dir``.

    Output layout (resumable, SURVEY §4):
        out_dir/turns/group=<gid>/*.parquet     per-turn extraction
        out_dir/convs/group=<gid>/*.parquet     per-conversation documents
        out_dir/turns/_lineage/group-<gid>.json lineage commit records
    """
    fragments = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not fragments:
        raise FileNotFoundError(f"no parquet fragments under {input_dir}")
    groups = L.group_fragments(fragments, config.fragment_group_size)
    turns_dir = os.path.join(out_dir, "turns")
    convs_dir = os.path.join(out_dir, "convs")

    done = set()
    if resume:
        for gid in L.completed_groups(turns_dir, groups, config.extractor_version):
            # a group committed by a run with with_conversations=False must
            # not be skipped when this run also needs the convs partition
            if with_conversations and not glob.glob(
                os.path.join(L.group_out_dir(convs_dir, gid), "*.parquet")
            ):
                continue
            done.add(gid)
    job_metrics: Dict = {"groups_total": len(groups), "groups_skipped": sorted(done)}
    t_job = time.perf_counter()
    total_rows = 0

    for gid, frag_paths in enumerate(groups):
        if gid in done:
            continue
        t0 = time.perf_counter()
        gdir = L.group_out_dir(turns_dir, gid)
        # a group without a lineage record is incomplete: clear any partial
        # output so the rerun is deterministic (lineage write is the commit)
        shutil.rmtree(gdir, ignore_errors=True)
        shutil.rmtree(L.group_out_dir(convs_dir, gid), ignore_errors=True)
        # one materialization per group (bounded by fragment_group_size, and
        # the object store spills): feeds BOTH the parquet write and the
        # convs assembly without re-reading or re-extracting the group
        mat = build_turn_pipeline(frag_paths, config).map_batches(
            _add_row_hash, batch_format="pyarrow"
        ).materialize()
        mat.write_parquet(gdir)

        # checksum validates the WRITTEN files via a column-pruned read of
        # the 8-byte row_hash column only (~1% of a full group re-read)
        checks = (
            rd.read_parquet(gdir, columns=["row_hash"])
            .map_batches(_checksum_batch, batch_format="pyarrow")
            .to_pandas()
        )
        row_count = int(checks["rows"].sum())
        checksum = f"{int(checks['hash_sum'].sum()) & 0xFFFFFFFFFFFFFFFF:016x}"
        # compare against the checksum of what we MEANT to write (from the
        # in-memory materialization) — without this expected value the
        # readback validated nothing
        want = (
            mat.select_columns(["row_hash"])
            .map_batches(_checksum_batch, batch_format="pyarrow")
            .to_pandas()
        )
        want_sum = f"{int(want['hash_sum'].sum()) & 0xFFFFFFFFFFFFFFFF:016x}"
        if checksum != want_sum or row_count != int(want["rows"].sum()):
            raise IOError(
                f"group {gid}: written output does not match the computed "
                f"result (checksum {checksum} != {want_sum} or row count "
                f"{row_count} != {int(want['rows'].sum())}) — write-time "
                "corruption; the lineage record was NOT committed")

        if with_conversations:
            convs = assemble_conversations(mat, config)
            convs.write_parquet(L.group_out_dir(convs_dir, gid))

        elapsed = time.perf_counter() - t0
        metrics = {
            "rows": row_count,
            "elapsed_sec": round(elapsed, 3),
            "turns_per_sec": round(row_count / elapsed, 1) if elapsed > 0 else None,
            "with_conversations": with_conversations,
        }
        L.write_lineage(
            turns_dir,
            L.LineageRecord(
                group_id=gid,
                fragments=[os.path.basename(p) for p in frag_paths],
                extractor_version=config.extractor_version,
                row_count=row_count,
                checksum=checksum,
                metrics=metrics,
            ),
        )
        total_rows += row_count

    job_metrics["elapsed_sec"] = round(time.perf_counter() - t_job, 3)
    job_metrics["rows_processed"] = total_rows
    return job_metrics
