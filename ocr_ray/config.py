"""Pipeline configuration — the analog of the reference's settings system
(``ocr_app/config/settings.py:57-92``), as a frozen dataclass broadcast in
stage closures (tiny; no object-store put needed)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # extraction: best-of-N order, first wins ties (the reference's
    # auto-selection ladder paddle > easy > tesseract analog,
    # ocr_app/core/ocr_engine.py:337-355)
    engines: tuple = ("tagstrip", "density", "domtree")
    cleanup_mode: str = "extracted"           # 'extracted' (src/utils.py) | 'preprocess' (text_utils)
    layout_variant: str = "adaptive"          # 'adaptive' | 'fixed20'
    payload_cap: int = 32768                  # chars per turn (resize/optimize analog, M6)

    # execution
    batch_size: int = 2048                    # rows per extractor batch
    extract_concurrency: int | None = None    # extractor pool size; None = cpus-2
    salt_span: int = 1000                     # turns per reassembly sub-group (skew salt)
    read_columns: tuple = ("conv_id", "turn_idx", "role", "text", "tool", "ts")

    # resumable output
    fragment_group_size: int = 8              # input files per checkpoint group
    extractor_version: str = "ocr-ray-0.1.0"


DEFAULT_CONFIG = PipelineConfig()
