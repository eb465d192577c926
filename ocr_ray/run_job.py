"""Job entry point for ``ray job submit`` (north-rule launch path).

On a real cluster::

    ray job submit --working-dir . -- \
        python -m ocr_ray.run_job --input /data/transcripts --output /data/out

In this sandbox the same module runs standalone against a local session
(``ray.init(address="local")`` is guarded — when the job server has already
initialised Ray, the existing session is reused).

The job is checkpoint-resumable: rerunning with the same ``--output``
skips every fragment group whose lineage record validates
(ocr_ray/state/lineage.py), so a preempted job continues where it stopped.
Pass ``--no-resume`` to force a full rerun.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="ocr_ray.run_job")
    ap.add_argument("--input", required=True, help="dir of transcript parquet fragments")
    ap.add_argument("--output", required=True, help="output dir (turns/, convs/, _lineage/)")
    ap.add_argument("--no-resume", action="store_true", help="ignore existing lineage")
    ap.add_argument("--no-conversations", action="store_true",
                    help="skip the groupby(conv_id) reassembly output")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--concurrency", type=int, default=None,
                    help="extractor actor-pool size (default: cluster CPUs - 2)")
    ap.add_argument("--fragment-group-size", type=int, default=None)
    args = ap.parse_args(argv)

    import os

    # Ray Data guidance: >=50% of memory for the object store (measured up
    # to ~25% headline gain on cold caches; never worse).  MUST be set
    # before `import ray`: ray_constants freezes the proportion at module
    # import time, so setting it afterwards is a silent no-op.
    os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.5")

    import ray

    if not ray.is_initialized():  # ray job submit initialises the session for us
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")

    from ocr_ray.config import DEFAULT_CONFIG, PipelineConfig
    from ocr_ray.pipelines.extract import run_extraction_job

    overrides = {}
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    if args.concurrency is not None:
        overrides["extract_concurrency"] = args.concurrency
    if args.fragment_group_size is not None:
        overrides["fragment_group_size"] = args.fragment_group_size
    config = (
        PipelineConfig(**{**DEFAULT_CONFIG.__dict__, **overrides})
        if overrides
        else DEFAULT_CONFIG
    )

    metrics = run_extraction_job(
        args.input,
        args.output,
        config=config,
        with_conversations=not args.no_conversations,
        resume=not args.no_resume,
    )
    print(json.dumps(metrics))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
