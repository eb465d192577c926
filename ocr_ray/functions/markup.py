"""Main-content extraction from markup-laden payloads — the "OCR engines".

The reference's OCR engines (Tesseract/EasyOCR/PaddleOCR wrappers,
``ocr_app/core/ocr_engine.py:474-649``) define the *pipeline shape*: several
independent extractors over the same input, a quality scorer picking the
best result (``src/ocr_module.py:403-446``), and a fallback ladder
(``src/ocr_module.py:216-249``).  In the transcript graft the "image" is a
markup-laden text payload and the engines are rule-based main-content
extractors (HTML boilerplate strip / DOM heuristics per the north rule):

* :func:`extract_tagstrip`  — "tesseract analog": structural strip. Tokenizes
  tags with a compiled regex, drops <script>/<style>/comment subtrees and any
  element whose tag or class/id marks it as boilerplate (nav, footer, ...),
  renders block-level boundaries as newlines, unescapes entities.
* :func:`extract_density`   — "paddle analog": splits the payload into text
  blocks and keeps those whose link/markup density is low and text share is
  high (content-density heuristic in the spirit of boilerplate-removal
  literature, e.g. Kohlschütter et al., boilerpipe).

Both are pure; the actor-pool stage compiles nothing per call (module-level
compiled regexes; classes in stages/extract.py hold config).
"""

from __future__ import annotations

import html as _html
import re
from typing import List, Tuple

# one tag-or-text tokenizer pass; comments and script/style handled first
_COMMENT = re.compile(r"<!--.*?-->", re.S)
_SCRIPT_STYLE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.S | re.I)
# attrs group also matches a bare trailing '/' so attribute-less
# self-closing tags (<br/>, <nav/>) tokenize instead of leaking verbatim
# into engine output
_TAG = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:\s[^<>]*|/)?)>")
_CLASS_OR_ID = re.compile(r"(?:class|id)\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]+)", re.I)

BOILERPLATE_TAGS = {"nav", "header", "footer", "aside", "form", "button", "iframe", "noscript"}
BOILERPLATE_MARKER = re.compile(
    r"nav|menu|footer|header|sidebar|banner|advert|\bads?\b|breadcrumb|copyright|cookie|promo|related|share|social",
    re.I,
)
BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "body", "html", "head",
    "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol", "table", "tr",
    "td", "th", "blockquote", "pre", "br", "hr", "title",
}

_WS_LINE = re.compile(r"[ \t]+")
_BLANK_LINES = re.compile(r"\n\s*\n+")


def _is_boilerplate(tag: str, attrs: str) -> bool:
    if tag in BOILERPLATE_TAGS:
        return True
    for m in _CLASS_OR_ID.finditer(attrs):
        if BOILERPLATE_MARKER.search(m.group(1).strip("\"'")):
            return True
    return False


def _render(pieces: List[str]) -> str:
    text = "".join(pieces)
    if "&" in text:  # unescape is a no-op (and not free) otherwise
        text = _html.unescape(text)
    lines = [_WS_LINE.sub(" ", ln).strip() for ln in text.split("\n")]
    text = "\n".join(lines)
    text = _BLANK_LINES.sub("\n", text).strip()
    return text


def strip_noise(payload: str) -> str:
    """Comment + script/style removal — the shared first pass of both
    engines; callers holding a pre-stripped payload pass
    ``prestripped=True`` to the extractors to avoid repeating it."""
    return _SCRIPT_STYLE.sub("", _COMMENT.sub("", payload))


def extract_tagstrip(payload: str, prestripped: bool = False) -> str:
    """Structural boilerplate strip: drop unwanted subtrees, keep content text
    with block boundaries as newlines."""
    if not payload:
        return ""
    s = payload if prestripped else strip_noise(payload)
    out: List[str] = []
    pos = 0
    skip_depth = 0          # >0 while inside a dropped subtree
    skip_stack: List[str] = []
    for m in _TAG.finditer(s):
        if skip_depth == 0 and m.start() > pos:
            out.append(s[pos:m.start()])
        closing, tag, attrs = m.group(1) == "/", m.group(2).lower(), m.group(3) or ""
        self_closing = attrs.rstrip().endswith("/") or tag in ("br", "hr", "img", "input", "meta", "link")
        if skip_depth > 0:
            if closing and skip_stack and tag == skip_stack[-1]:
                skip_stack.pop()
                if not skip_stack:
                    skip_depth = 0
            elif not closing and not self_closing and skip_stack and tag == skip_stack[-1]:
                skip_stack.append(tag)  # nested same-tag inside dropped subtree
        else:
            if not closing and _is_boilerplate(tag, attrs):
                if self_closing:
                    pass  # dropped already (no content)
                else:
                    skip_depth = 1
                    skip_stack = [tag]
            elif tag in BLOCK_TAGS:
                out.append("\n")
        pos = m.end()
    if skip_depth == 0 and pos < len(s):
        out.append(s[pos:])
    return _render(out)


_ANCHOR = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.S | re.I)
_ANY_TAG = re.compile(r"<[^>]+>")
_BLOCK_SPLIT = re.compile(
    r"<(?:/?)(?:p|div|section|article|main|h[1-6]|li|ul|ol|table|tr|blockquote|pre|br|hr|title|body|html|head|nav|header|footer|aside)\b[^>]*>",
    re.I,
)


_BOILER_TEXT = re.compile(
    r"copyright|©|\(c\)\s*\d{4}|all rights reserved|cookie|privacy policy|terms of (?:use|service)|skip to",
    re.I,
)


def extract_density(payload: str, min_words: int = 3, max_link_density: float = 0.4,
                    prestripped: bool = False) -> str:
    """Content-density extractor: split on block tags, keep blocks with at
    least ``min_words`` words, anchor-text share below ``max_link_density``,
    and no boilerplate-text markers (copyright/cookie/... lines)."""
    if not payload:
        return ""
    s = payload if prestripped else strip_noise(payload)
    kept: List[str] = []
    for block in _BLOCK_SPLIT.split(s):
        if not block or not block.strip():
            continue
        # cheap prechecks: anchors need a '<a'/'<A' and unescape a '&' —
        # both regex/unescape passes are no-ops otherwise
        if "<a" in block or "<A" in block:
            anchor_chars = sum(len(_ANY_TAG.sub("", a)) for a in _ANCHOR.findall(block))
        else:
            anchor_chars = 0
        text = _ANY_TAG.sub("", block)
        if "&" in text:
            text = _html.unescape(text)
        text = _WS_LINE.sub(" ", text.replace("\n", " ")).strip()
        if not text:
            continue
        words = text.split()
        link_density = anchor_chars / max(1, len(text))
        if len(words) >= min_words and link_density <= max_link_density and not _BOILER_TEXT.search(text):
            kept.append(text)
    return "\n".join(kept).strip()


# ---------------------------------------------------------------- domtree
CONTAINER_TAGS = {"div", "section", "article", "main", "body", "td", "blockquote"}


def extract_domtree(payload: str, prestripped: bool = False) -> str:
    """Third engine ("readability analog", A3): container selection.

    Unlike :func:`extract_tagstrip` (global strip) and
    :func:`extract_density` (flat block filter), this engine builds the
    element tree with a stack parser, accumulates rendered text and
    anchor-text length into each node's NEAREST enclosing container (direct
    parent, not every ancestor — so wrapper containers don't absorb their
    children's score), drops boilerplate subtrees, and returns the text of
    the best-scoring container — score = text_length * (1 - link_density),
    the core readability heuristic (Arc90 readability / Kohlschuetter et
    al.); ties go to the earliest-opened container.  Documents whose
    containers hold no text fall back to the residual (root) render."""
    if not payload:
        return ""
    s = payload if prestripped else strip_noise(payload)

    # open-container frames: [tag, pieces, text_len, anchor_len, order]
    root = ["", [], 0, 0, -1]
    open_containers: List[list] = [root]
    closed: List[list] = []
    stack: List[str] = []          # open container tags (for matching closes)
    skip_depth = 0
    skip_stack: List[str] = []
    anchor_depth = 0
    order = 0

    def add_text(txt: str) -> None:
        fr = open_containers[-1]   # nearest enclosing container only
        fr[1].append(txt)
        fr[2] += len(txt)
        if anchor_depth > 0:
            fr[3] += len(txt)

    def add_break() -> None:
        open_containers[-1][1].append("\n")

    pos = 0
    for m in _TAG.finditer(s):
        if skip_depth == 0 and m.start() > pos:
            add_text(s[pos:m.start()])
        closing, tag, attrs = m.group(1) == "/", m.group(2).lower(), m.group(3) or ""
        self_closing = attrs.rstrip().endswith("/") or tag in (
            "br", "hr", "img", "input", "meta", "link"
        )
        if skip_depth > 0:
            if closing and skip_stack and tag == skip_stack[-1]:
                skip_stack.pop()
                if not skip_stack:
                    skip_depth = 0
            elif not closing and not self_closing and skip_stack and tag == skip_stack[-1]:
                skip_stack.append(tag)
        elif not closing and _is_boilerplate(tag, attrs):
            if not self_closing:
                skip_depth = 1
                skip_stack = [tag]
        else:
            if tag in BLOCK_TAGS:
                add_break()
            if not closing and not self_closing:
                if tag == "a":
                    anchor_depth += 1
                if tag in CONTAINER_TAGS:
                    open_containers.append([tag, [], 0, 0, order])
                    stack.append(tag)
                    order += 1
            elif closing:
                if tag == "a" and anchor_depth > 0:
                    anchor_depth -= 1
                if tag in CONTAINER_TAGS and tag in stack:
                    # unwind to the matching open container (malformed-nesting
                    # tolerant, same spirit as the other engines)
                    while stack:
                        t = stack.pop()
                        closed.append(open_containers.pop())
                        if t == tag:
                            break
        pos = m.end()
    if skip_depth == 0 and pos < len(s):
        add_text(s[pos:])
    while stack:  # close dangling containers at EOF
        stack.pop()
        closed.append(open_containers.pop())

    best_text, best_score, best_order = "", float("-inf"), -1
    for tag, pieces, text_len, anchor_len, order_i in closed:
        text = _render(pieces)
        if not text:
            continue
        score = len(text) * (1.0 - anchor_len / max(1, text_len))
        if score > best_score or (score == best_score and order_i < best_order):
            best_text, best_score, best_order = text, score, order_i
    if best_text:
        return best_text
    return _render(root[1])  # no containers: whole-page fallback


# ---------------------------------------------------------------- wrap repair
_HYPHEN_WRAP = re.compile(r"(\w)-\n(\w)")
_SOFT_WRAP = re.compile(r"(?<!\n)\n(?!\n)")


def repair_wrapping(text: str) -> str:
    """De-hyphenate hard wraps and join soft-wrapped lines (skew-correction
    analog, SURVEY §2.2 M4): ``(\\w)-\\n(\\w)`` -> join, then single newlines
    -> space; paragraph breaks (blank lines) survive."""
    if not text:
        return ""
    if "\n" not in text:  # both regexes are no-ops without a newline
        return text
    text = _HYPHEN_WRAP.sub(r"\1\2", text)
    return _SOFT_WRAP.sub(" ", text)


# ---------------------------------------------------------------- kind sniff
# no \s* after '<': per the HTML spec "< p" is literal text; the
# permissive form misrouted prose/math like "x < a" into tag-stripping.
# The raw pattern STRINGS are the single source of truth — normalize.py's
# vectorized Arrow RE2 sniffer imports them (both engines accept this
# syntax), so the two code paths cannot drift apart again.
HTMLISH_PATTERN = r"<(?:html|body|div|p|script|span|h[1-6]|ul|table|a)\b"
BOXED_PREFIX_PATTERN = r'^\s*\{\s*"page_height"'
_HTMLISH = re.compile(HTMLISH_PATTERN, re.I)
_BOXED = re.compile(BOXED_PREFIX_PATTERN)


def sniff_kind(payload: str) -> str:
    """Payload-kind discriminator (orientation-detect analog, SURVEY M5):
    'empty' | 'boxed' (serialized layout boxes) | 'html' | 'text'."""
    if not payload or not payload.strip():
        return "empty"
    if _BOXED.match(payload):
        return "boxed"
    if _HTMLISH.search(payload):
        return "html"
    return "text"
