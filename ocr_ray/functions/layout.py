"""Layout reassembly: the greedy line-grouping walk (L1/L2) and page concat (L4).

The walk is deliberately order-dependent (it compares each element's y to
the *previous element's* y, not to a line anchor, so gradual y-drift chains
into one line) — reproduced exactly from the reference:

* adaptive-tolerance variant: ``src/ocr_module.py:274-312`` (Paddle) /
  ``src/ocr_module.py:339-376`` (Easy): sort by y-center, tolerance
  ``max(10, 0.01 * page_height)``, within-line sort by x at finalize,
  join words with ' ' and lines with '\\n'.
* fixed-tolerance variant: ``ocr_app/core/ocr_engine.py:544-576``:
  sort by top-y, threshold 20, new line when ``last_y >= 0 and
  |top_y - last_y| > 20``, within-line sort by (x, top_y).

Boxes here are axis-aligned ``(x0, y0, x1, y1, text)`` tuples (the
transcript graft serializes pseudo-layout as JSON lists of such boxes);
y-center is ``(y0 + y1) / 2`` and top-y is ``y0``, which match the
references' quad-corner arithmetic for axis-aligned quads.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple

Box = Tuple[float, float, float, float, str]  # x0, y0, x1, y1, text


def group_boxes_into_lines(
    boxes: Sequence[Box],
    page_height: float = 1000.0,
    variant: str = "adaptive",
) -> str:
    """Reassemble detected boxes into a page string.

    ``variant='adaptive'`` follows src/ocr_module.py:274-312;
    ``variant='fixed20'`` follows ocr_app/core/ocr_engine.py:544-576.
    """
    if not boxes:
        return ""
    if variant == "fixed20":
        return _walk_fixed20(boxes)
    if variant == "lex10":
        return _walk_lex10(boxes)
    return _walk_adaptive(boxes, page_height)


def _walk_adaptive(boxes: Sequence[Box], page_height: float) -> str:
    ordered = sorted(boxes, key=lambda b: (b[1] + b[3]) / 2)
    tol = max(10, page_height * 0.01)
    lines: List[List[Box]] = []
    current: List[Box] = []
    last_y = None
    for box in ordered:
        cur_y = (box[1] + box[3]) / 2
        if last_y is None or abs(cur_y - last_y) <= tol:
            current.append(box)
        else:
            current.sort(key=lambda b: b[0])
            lines.append(current)
            current = [box]
        last_y = cur_y
    if current:
        current.sort(key=lambda b: b[0])
        lines.append(current)
    return "\n".join(" ".join(b[4] for b in line) for line in lines)


def _walk_fixed20(boxes: Sequence[Box]) -> str:
    ordered = sorted(boxes, key=lambda b: b[1])
    threshold = 20
    lines: List[str] = []
    current: List[Tuple[Tuple[float, float], str]] = []
    last_y = -1.0
    for box in ordered:
        top_y = box[1]
        if last_y >= 0 and abs(top_y - last_y) > threshold:
            current.sort(key=lambda w: w[0])
            lines.append(" ".join(w[1] for w in current))
            current = []
        current.append(((box[0], top_y), box[4]))
        last_y = top_y
    if current:
        current.sort(key=lambda w: w[0])
        lines.append(" ".join(w[1] for w in current))
    return "\n".join(lines)


def _walk_lex10(boxes: Sequence[Box]) -> str:
    """L3 variant (``src/core/ocr_engine.py:72-100``): sort by (top_y, x)
    LEXICOGRAPHICALLY, then walk comparing each top-y to the LINE ANCHOR
    (the y of the line's first box — unlike the adaptive walk's
    previous-element drift), threshold 10; no within-line re-sort (the
    lexicographic sort already ordered by x within equal y)."""
    ordered = sorted(boxes, key=lambda b: (b[1], b[0]))
    current_y = ordered[0][1]
    lines: List[str] = []
    current: List[str] = []
    for box in ordered:
        y = box[1]
        if abs(y - current_y) > 10:
            if current:
                lines.append(" ".join(current))
            current = [box[4]]
            current_y = y
        else:
            current.append(box[4])
    if current:
        lines.append(" ".join(current))
    return "\n".join(lines)


def concat_pages(pages: Iterable[str], style: str = "cli") -> str:
    """Join per-page strings with page separators.

    ``style='cli'``: ``--- Page N ---`` headers joined with '\\n\\n'
    (ocr_app/ui/cli.py:163-168); ``style='upper'``: ``--- PAGE N ---``
    blocks (src/core/ocr_engine.py:118-128); ``style='plain'``: '\\n\\n'.
    """
    pages = list(pages)
    if style == "cli":
        return "\n\n".join(f"--- Page {i + 1} ---\n{p}" for i, p in enumerate(pages))
    if style == "upper":
        return "".join(f"--- PAGE {i + 1} ---\n{p}\n\n" for i, p in enumerate(pages))
    return "\n\n".join(pages)
