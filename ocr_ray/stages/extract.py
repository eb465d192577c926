"""Stage 2 — the extractor actor pool (A1-A3 / C1 / C2 analogs).

The reference runs several OCR engines over each page, scores every result
and keeps the best (``src/ocr_module.py:403-446``), with a fallback ladder
when engines fail (``src/ocr_module.py:216-249``) and in-band error strings
as the last resort (``ocr_app/core/ocr_engine.py:413``).  Here the engines
are rule-based main-content extractors over markup-laden transcript payloads
(ocr_ray.functions.markup), the layout walk reassembles serialized box
payloads (ocr_ray.functions.layout), and a whitespace-grid heuristic
(table-detect analog, ``src/ocr_module.py:478-547``) forces the
layout-preserving path for tabular text.

Used as ``ds.map_batches(Extractor, concurrency=N, batch_size=B,
batch_format="pyarrow", fn_constructor_kwargs={"config": cfg})`` — ruleset
compiled once per actor in ``__init__``, per-batch work in ``__call__``.
"""

from __future__ import annotations

import json
import re
from typing import Callable, Dict, List, Tuple

import pyarrow as pa

from ocr_ray.config import DEFAULT_CONFIG, PipelineConfig
from ocr_ray.functions.layout import group_boxes_into_lines
from ocr_ray.functions.markup import (
    _ANY_TAG,
    extract_density,
    extract_domtree,
    extract_tagstrip,
    repair_wrapping,
    strip_noise,
)
from ocr_ray.functions.scoring import score_ocr_result

ERROR_TEXT = "Error: All OCR engines failed"  # parity: ocr_app/core/ocr_engine.py:413

_DASH_LINE = re.compile(r"^\s*-{3,}\s*$", re.M)
_PIPE = " | "

ENGINES: Dict[str, Callable[[str], str]] = {
    "tagstrip": extract_tagstrip,   # A1: global structural strip
    "density": extract_density,     # A2: flat block link-density filter
    "domtree": extract_domtree,     # A3: readability-style container selection
}


def detect_aligned_table(text: str) -> bool:
    """Whitespace/pipe-grid heuristic (M16 graft): a payload is tabular when
    at least two lines contain column pipes or a dash ruler line exists."""
    if _PIPE not in text and "-" not in text:  # cheap reject for the common case
        return False
    if _DASH_LINE.search(text):
        return True
    pipe_lines = sum(1 for ln in text.split("\n") if _PIPE in ln)
    return pipe_lines >= 2


class Extractor:
    """Best-of-N rule extractor with fallback ladder; one instance per actor.

    ``with_clean=True`` additionally applies the M9/M10 cleanup inside the
    same actor call (identical semantics to the standalone cleanup stage).
    Fusing it here matters for throughput: a mid-pipeline actor pool reserves
    its CPUs for the whole execution, so any non-trivial task-pool stage
    scheduled after it runs on the few CPUs left over and serializes the job.
    """

    def __init__(
        self,
        config: PipelineConfig = DEFAULT_CONFIG,
        with_clean: bool = False,
        emit_segments: bool = False,
    ):
        self.config = config
        self.engines: List[Tuple[str, Callable[[str], str]]] = [
            (name, ENGINES[name]) for name in config.engines
        ]
        self.layout_variant = config.layout_variant
        self.emit_segments = emit_segments
        # optional model-backed scorer (A4 analog): the artifact is loaded
        # ONCE PER ACTOR here — the load-once contract of the reference's
        # lru_cache'd AutoProcessor/Model (src/ocr/nanonets_ocr.py:34-44).
        # When unset (default) best-of-N keeps the heuristic scorer and
        # output is byte-identical to the golden-parity path.
        if config.model_artifact:
            import pickle

            from ocr_ray.stages.model_engine import (ARTIFACT_VERSION,
                                                     model_score_fn)

            with open(config.model_artifact, "rb") as f:
                art = pickle.load(f)
            # same contract check ModelScorer enforces: a stale artifact
            # (different feature order / weight semantics) must fail loud,
            # not silently steer best-of-N with wrong weights
            if art.get("version") != ARTIFACT_VERSION:
                raise ValueError(
                    f"model artifact version {art.get('version')!r} != "
                    f"engine contract {ARTIFACT_VERSION!r}")
            self._model_score: Callable | None = model_score_fn(art)
        else:
            self._model_score = None
        if with_clean:
            from ocr_ray.functions.textops import CLEANUP_COLUMN_MODES

            # column-level Arrow kernel, byte-identical to the scalar chain
            self.clean: Callable | None = CLEANUP_COLUMN_MODES[config.cleanup_mode]
        else:
            self.clean = None

    # ------------------------------------------------------------ per-kind
    def _extract_html(self, payload: str) -> Tuple[str, str, str]:
        pre = strip_noise(payload) if payload else payload  # shared first pass
        best_text, best_engine, best_score = "", "none", float("-inf")
        seen_scores: Dict[str, float] = {}  # engines often tie on identical
        for name, fn in self.engines:       # text — score each output once
            try:
                text = fn(pre, prestripped=True)
            except Exception:
                continue
            score = seen_scores.get(text)
            if score is None:
                score = (self._model_score(text) if self._model_score
                         else score_ocr_result(text))
                seen_scores[text] = score
            if score > best_score:
                best_text, best_engine, best_score = text, name, score
        if best_text:
            return best_text, best_engine, ""
        # fallback ladder: naive tag strip, then in-band error (C2)
        naive = _ANY_TAG.sub("", payload).strip()
        if naive:
            return naive, "naive_strip", ""
        return ERROR_TEXT, "error", "all_engines_empty"

    def _extract_boxed(self, payload: str) -> Tuple[str, str, str]:
        # an oversized boxed payload truncated by payload_cap is cut
        # mid-JSON and lands in the in-band error path below — the C2
        # unreadable-input contract (reference returns {'text': '',
        # 'error': ...} for undecodable pages); raise payload_cap for
        # box-dense corpora rather than expecting partial decode
        try:
            doc = json.loads(payload)
            # cache the parsed doc for _segments_for: with emit_segments
            # the same payload would otherwise pay json.loads twice per
            # row in the actor hot loop (batches process serially, so a
            # single-entry cache is race-free)
            self._boxed_cache = (payload, doc)
            boxes = [
                (b["x0"], b["y0"], b["x1"], b["y1"], b["text"]) for b in doc["boxes"]
            ]
            text = group_boxes_into_lines(
                boxes, page_height=doc.get("page_height", 1000.0), variant=self.layout_variant
            )
            return text, "layout_walk", ""
        except Exception:
            return ERROR_TEXT, "error", "boxed_parse_failed"

    def _extract_text(self, payload: str) -> Tuple[str, str, str]:
        if detect_aligned_table(payload):
            return payload, "passthrough_table", ""
        return repair_wrapping(payload), "wrap_repair", ""

    # ------------------------------------------------------------ segments
    SEGMENT_TYPE = pa.list_(
        pa.struct(
            [
                ("seg_idx", pa.int32()),
                ("kind", pa.string()),
                ("text", pa.string()),
                ("conf", pa.float32()),
            ]
        )
    )

    @staticmethod
    def _conf(text: str) -> float:
        # length-based confidence heuristic, parity: ocr_core/dolphin_reader.py:29
        return min(1.0, len(text) / 100.0)

    def _segments_for(self, kind: str, payload: str, extracted: str) -> List[dict]:
        """Detected-text-element view of one turn (SURVEY §1.2: the
        box/text/conf tuples of the reference's engines become a
        list<struct> column)."""
        if kind == "empty" or not extracted or extracted == ERROR_TEXT:
            return []
        if kind == "boxed":
            # the WHOLE build stays inside the try: a box with conf=null
            # or a non-string text must take the in-band empty path (C2
            # contract), not escape as a TypeError/ArrowInvalid that
            # kills the map task
            try:
                cached = getattr(self, "_boxed_cache", None)
                doc = cached[1] if cached and cached[0] == payload \
                    else json.loads(payload)
                boxes = doc["boxes"]
                return [
                    {
                        "seg_idx": i,
                        "kind": "box",
                        "text": str(b.get("text", "") or ""),
                        "conf": float(b.get("conf") or 0.0),
                    }
                    for i, b in enumerate(boxes)
                ]
            except Exception:
                return []
        seg_kind = "block" if kind == "html" else "text"
        return [
            {"seg_idx": i, "kind": seg_kind, "text": ln, "conf": self._conf(ln)}
            for i, ln in enumerate(extracted.split("\n"))
        ]

    # ------------------------------------------------------------ batch
    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["norm_text"].to_pylist()
        kinds = batch["kind"].to_pylist()
        extracted: List[str] = []
        engines: List[str] = []
        errors: List[str] = []
        has_table: List[bool] = []
        # segments are computed INSIDE the row loop so the single-entry
        # boxed-parse cache (set by _extract_boxed just above each use)
        # serves every boxed row, not only the batch's last one
        segs: "List[list] | None" = [] if self.emit_segments else None
        for payload, kind in zip(texts, kinds):
            if kind == "empty":
                out, eng, err = "", "empty", ""
                tab = False
            elif kind == "boxed":
                out, eng, err = self._extract_boxed(payload)
                tab = False
            elif kind == "html":
                out, eng, err = self._extract_html(payload)
                tab = False
            else:
                out, eng, err = self._extract_text(payload)
                tab = eng == "passthrough_table"
            extracted.append(out)
            engines.append(eng)
            errors.append(err)
            has_table.append(tab)
            if segs is not None:
                segs.append(self._segments_for(kind, payload, out))

        out_tbl = batch.drop_columns(["norm_text"])
        out_tbl = out_tbl.append_column("extracted_text", pa.array(extracted, pa.string()))
        out_tbl = out_tbl.append_column("engine", pa.array(engines, pa.string()))
        out_tbl = out_tbl.append_column("error", pa.array(errors, pa.string()))
        out_tbl = out_tbl.append_column("has_table", pa.array(has_table, pa.bool_()))
        if segs is not None:
            out_tbl = out_tbl.append_column(
                "segments", pa.array(segs, self.SEGMENT_TYPE)
            )
        if self.clean is not None:
            out_tbl = out_tbl.append_column(
                "clean_text", self.clean(out_tbl["extracted_text"])
            )
        return out_tbl
