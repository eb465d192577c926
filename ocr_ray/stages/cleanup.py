"""Stage 3 — exact-match text cleanup (M9/M10).

Applies one of the two reference cleanup modes per row, producing a
``clean_text`` column next to the layout-preserving ``extracted_text``.
The column kernels (textops.CLEANUP_COLUMN_MODES) are Arrow RE2 passes that
are byte-identical to the reference's Python-``re`` chains for every input —
the RE2 whitespace class spells out Python's Unicode ``\\s`` charset exactly
(property-tested in tests/test_textops_vector.py) — and ~3x faster.
"""

from __future__ import annotations

import pyarrow as pa

from ocr_ray.config import DEFAULT_CONFIG, PipelineConfig
from ocr_ray.functions.textops import CLEANUP_COLUMN_MODES


def make_clean_batch(config: PipelineConfig = DEFAULT_CONFIG):
    clean_col = CLEANUP_COLUMN_MODES[config.cleanup_mode]

    def clean_batch(batch: pa.Table) -> pa.Table:
        return batch.append_column("clean_text", clean_col(batch["extracted_text"]))

    return clean_batch
