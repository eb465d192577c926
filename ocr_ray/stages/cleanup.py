"""Stage 3 — exact-match text cleanup (M9/M10).

Applies one of the two reference cleanup modes per row, producing a
``clean_text`` column next to the layout-preserving ``extracted_text``.
Python ``re`` is used deliberately (not RE2 kernels): the contract is byte
equality with the reference's ``re``-based behavior, including its Unicode
``\\s`` semantics.  The regexes are compiled once at module import; the
per-row call is a C-level regex pass.
"""

from __future__ import annotations

import pyarrow as pa

from ocr_ray.config import DEFAULT_CONFIG, PipelineConfig
from ocr_ray.functions.textops import CLEANUP_MODES


def make_clean_batch(config: PipelineConfig = DEFAULT_CONFIG):
    clean = CLEANUP_MODES[config.cleanup_mode]

    def clean_batch(batch: pa.Table) -> pa.Table:
        texts = batch["extracted_text"].to_pylist()
        cleaned = pa.array([clean(t) for t in texts], pa.string())
        return batch.append_column("clean_text", cleaned)

    return clean_batch
