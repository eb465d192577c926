"""Pipeline configuration — the analog of the reference's settings system
(``ocr_app/config/settings.py:57-133``): a frozen dataclass broadcast in
stage closures (tiny; no object-store put needed), loadable from a nested
JSON config file with dot-path get/set overrides exactly like the
reference's ``Settings.get/set``."""

from __future__ import annotations

import json
from dataclasses import dataclass, field, fields, replace
from typing import Any, Dict, Optional


@dataclass(frozen=True)
class PipelineConfig:
    # extraction: best-of-N order, first wins ties (the reference's
    # auto-selection ladder paddle > easy > tesseract analog,
    # ocr_app/core/ocr_engine.py:337-355)
    engines: tuple = ("tagstrip", "density", "domtree")
    cleanup_mode: str = "extracted"           # 'extracted' (src/utils.py) | 'preprocess' (text_utils)
    denoise: str = "standard"                 # 'standard' | 'heavy' (M7 NL-means analog)
    layout_variant: str = "adaptive"          # 'adaptive' | 'fixed20' | 'lex10'
    payload_cap: int = 32768                  # chars per turn (resize/optimize analog, M6)
    model_artifact: Optional[str] = None      # A4 model-backed best-of-N scorer
                                              # (stages/model_engine.py pickle path);
                                              # None = heuristic scorer (golden parity)

    # execution
    batch_size: int = 2048                    # rows per extractor batch
    extract_concurrency: int | None = None    # extractor pool size; None = cpus-2
    salt_span: int = 1000                     # turns per reassembly sub-group (skew salt)
    reassemble_partitions: int = 32           # reduce partitions for a STREAMING reassembly input
                                              # (size total_bytes / worker heap at scale)
    read_columns: tuple = ("conv_id", "turn_idx", "role", "text", "tool", "ts")

    # resumable output
    fragment_group_size: int = 8              # input files per checkpoint group
    extractor_version: str = "ocr-ray-0.2.0"  # bumped: checksum now persisted row_hash


DEFAULT_CONFIG = PipelineConfig()


# dot-path -> dataclass field (the nested sections mirror the reference's
# config.json layout, ocr_app/config/config.json:1-45)
CONFIG_SCHEMA: Dict[str, str] = {
    "extraction.engines": "engines",
    "extraction.cleanup_mode": "cleanup_mode",
    "extraction.denoise": "denoise",
    "extraction.layout_variant": "layout_variant",
    "extraction.payload_cap": "payload_cap",
    "extraction.model_artifact": "model_artifact",
    "execution.batch_size": "batch_size",
    "execution.extract_concurrency": "extract_concurrency",
    "execution.salt_span": "salt_span",
    "execution.reassemble_partitions": "reassemble_partitions",
    "execution.read_columns": "read_columns",
    "output.fragment_group_size": "fragment_group_size",
    "output.extractor_version": "extractor_version",
}
_TUPLE_FIELDS = {"engines", "read_columns"}


def config_get(cfg: Dict, path: str, default: Any = None) -> Any:
    """Dot-path read over a nested config dict
    (``ocr_app/config/settings.py:94-112`` semantics)."""
    node: Any = cfg
    for part in path.split("."):
        if not isinstance(node, dict) or part not in node:
            return default
        node = node[part]
    return node


def config_set(cfg: Dict, path: str, value: Any) -> None:
    """Dot-path write, creating intermediate dicts
    (``ocr_app/config/settings.py:114-133`` semantics)."""
    parts = path.split(".")
    node = cfg
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    node[parts[-1]] = value


def config_to_dict(config: PipelineConfig = DEFAULT_CONFIG) -> Dict:
    """Nested JSON-serializable view of a PipelineConfig."""
    out: Dict = {}
    for path, attr in CONFIG_SCHEMA.items():
        v = getattr(config, attr)
        config_set(out, path, list(v) if isinstance(v, tuple) else v)
    return out


def load_config(
    path_or_dict: "str | Dict | None" = None,
    overrides: Optional[Dict[str, Any]] = None,
) -> PipelineConfig:
    """Build a PipelineConfig from a JSON config file (or dict) plus
    dot-path overrides; unknown dot-paths raise (typo protection the
    reference lacks).  ``load_config(None, {"extraction.engines": [...]})``
    applies overrides to the defaults."""
    raw: Dict = {}
    if isinstance(path_or_dict, str):
        with open(path_or_dict) as f:
            raw = json.load(f)
    elif isinstance(path_or_dict, dict):
        raw = json.loads(json.dumps(path_or_dict))  # deep copy
    for dot, value in (overrides or {}).items():
        if dot not in CONFIG_SCHEMA:
            raise KeyError(f"unknown config path: {dot}")
        config_set(raw, dot, value)

    known = {f.name for f in fields(PipelineConfig)}
    kwargs: Dict[str, Any] = {}
    for dot, attr in CONFIG_SCHEMA.items():
        sentinel = object()
        v = config_get(raw, dot, sentinel)
        if v is sentinel:
            continue
        assert attr in known
        kwargs[attr] = tuple(v) if attr in _TUPLE_FIELDS else v
    return replace(DEFAULT_CONFIG, **kwargs)


def save_config(config: PipelineConfig, path: str) -> None:
    with open(path, "w") as f:
        json.dump(config_to_dict(config), f, indent=2, sort_keys=True)
