"""ocr_ray — a Ray-Data-native extraction engine.

A from-scratch reimplementation of the extraction core of the reference
OCR application (Rayyan9477/OCR-Image-to-text), rebuilt as streaming
``ray.data.Dataset`` pipelines over Parquet tables of multi-turn
conversation / agent transcripts.

Layout:
  functions/  pure, exact-match scalar functions (text cleanup, scoring,
              entities, chunking, layout walk, ...) — semantics pinned to
              the reference (file:line cited per function)
  stages/     Ray Data map_batches stages (stateless fns + actor pools)
  sources/    deterministic synthetic transcript generator + readers
  pipelines/  end-to-end pipeline builders (flagship extraction)
  state/      lineage records + checkpoint/resume manifest

Nothing in this package calls ``ray.init`` / ``ray.shutdown``; sessions
are owned by the caller (bench.py, CLI, test fixture, driver).
"""

__version__ = "0.1.0"
