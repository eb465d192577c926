"""Stage 1 — payload normalization (M1-M8 analogs), fully vectorized Arrow.

Reference chain: contrast/denoise/resize preprocessing
(``ocr_app/core/image_processor.py:29-71``, ``ocr_app/utils/performance.py:55-90``).
Graft: unicode NFC (glyph crispening), zero-width-char strip (noise
removal), size cap + truncation flag (resize cap), payload-kind sniffing
(orientation detection analog, ``src/ocr_module.py:109-177``).

Stateless ``map_batches`` fn, ``batch_format="pyarrow"``; every op is a
pyarrow.compute kernel — no Python per-row work.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ocr_ray.config import DEFAULT_CONFIG, PipelineConfig

_ZERO_WIDTH = "[\u200b\u200c\u200d\u2060\ufeff]"
# shared with markup.sniff_kind \u2014 ONE source of truth for the kind
# discriminators (the two copies drifted once before; see markup.py)
from ocr_ray.functions.markup import (  # noqa: E402
    BOXED_PREFIX_PATTERN as _BOXED_PREFIX,
    HTMLISH_PATTERN as _HTMLISH,
)


# heavy-denoise extras (M7 NL-means analog, config-gated OFF by default —
# the parity contract covers the standard pass only): C0/C1 control chars
# (except \t\n\r) stripped, and 4+ repeated runs of common noise
# punctuation collapsed to one (RE2 has no backreferences, so one pass per
# character — each is a vectorized kernel).  Known interaction: the dash
# collapse also shortens 4+-dash table ruler lines, so heavy mode can
# demote a dash-ruled aligned table to the wrap-repair path — aggressive
# denoise trades layout fidelity for noise removal BY DESIGN; keep the
# default mode for table-bearing corpora.
_CONTROL = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"
_NOISE_PUNCT = ".!?-=*#_~"


def normalize_batch(batch: pa.Table, config: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    text = pc.cast(batch["text"], pa.string())
    text = pc.fill_null(text, "")
    # NOTE: no unicode NFC here — pyarrow's utf8_normalize decomposes
    # regardless of `form` in this build, and byte-stability of payloads is
    # part of the per-turn parity contract.  Zero-width strip only.
    text = pc.replace_substring_regex(text, pattern=_ZERO_WIDTH, replacement="")
    if config.denoise == "heavy":  # M7: the expensive denoise variant
        text = pc.replace_substring_regex(text, pattern=_CONTROL, replacement="")
        for ch in _NOISE_PUNCT:
            text = pc.replace_substring_regex(
                text, pattern="\\" + ch + "{4,}", replacement=ch
            )

    n = pc.utf8_length(text)
    truncated = pc.greater(n, config.payload_cap)
    text = pc.utf8_slice_codeunits(text, 0, config.payload_cap)

    is_empty = pc.equal(pc.utf8_length(pc.utf8_trim_whitespace(text)), 0)
    is_boxed = pc.match_substring_regex(text, pattern=_BOXED_PREFIX)
    is_html = pc.match_substring_regex(text, pattern=_HTMLISH, ignore_case=True)
    kind = pc.if_else(
        is_empty,
        pa.scalar("empty"),
        pc.if_else(is_boxed, pa.scalar("boxed"), pc.if_else(is_html, pa.scalar("html"), pa.scalar("text"))),
    )

    out = batch.drop_columns(["text"])
    out = out.append_column("norm_text", text)
    out = out.append_column("kind", kind)
    out = out.append_column("truncated", truncated)
    return out
