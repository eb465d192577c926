"""Byte-parity of the vectorized (Arrow RE2) cleanup kernels vs the scalar
reference chains (textops.preprocess_text / clean_extracted_text).

The vector forms back the flagship pipeline's clean stage, so equality here
is what keeps the per-turn exact-match contract intact after the
vectorization.  Two gates:

* the RE2 whitespace class must equal Python's ``\\s`` charset for str
  patterns EXACTLY (enumerated over the whole BMP+SMP range), and
* hypothesis property: scalar(x) == vector([x])[0] for arbitrary unicode.
"""

from __future__ import annotations

import re

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_ray.functions.textops import (
    _PY_WS_CLASS,
    clean_extracted_column,
    clean_extracted_text,
    preprocess_column,
    preprocess_text,
)


def _class_members(cls: str) -> set:
    body = cls[1:-2]  # strip leading '[' and trailing ']+'
    out, i = set(), 0
    while i < len(body):
        if i + 2 < len(body) and body[i + 1] == "-":
            out.update(chr(c) for c in range(ord(body[i]), ord(body[i + 2]) + 1))
            i += 3
        else:
            out.add(body[i])
            i += 1
    return out


def test_ws_class_equals_python_s():
    pyws = {chr(c) for c in range(0x110000) if re.match(r"\s", chr(c))}
    assert _class_members(_PY_WS_CLASS) == pyws


# surrogates excluded: not encodable to the UTF-8 Arrow stores
_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=120
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_TEXT, max_size=8))
def test_vector_matches_scalar(texts):
    arr = pa.array(texts, pa.string())
    assert preprocess_column(arr).to_pylist() == [preprocess_text(t) for t in texts]
    assert clean_extracted_column(arr).to_pylist() == [
        clean_extracted_text(t) for t in texts
    ]


def test_vector_edge_cases():
    cases = [
        "",
        " ",
        "\x00abc\x00",  # NUL survives preprocess (< \x7f), dies in extracted
        "a\xa0b",  # unicode NBSP: Python \s collapses it
        "　 x 　",
        "a\x1c\x1db",  # file separators: in \s but not utf8proc whitespace
        "\n\n\n\nA\r\r\r\rB",  # dead break-run rule territory
        "h\xe9llo w\xf6rld",
        "\x7f\x80\x9f",
    ]
    arr = pa.array(cases, pa.string())
    assert preprocess_column(arr).to_pylist() == [preprocess_text(t) for t in cases]
    assert clean_extracted_column(arr).to_pylist() == [
        clean_extracted_text(t) for t in cases
    ]


def test_vector_null_maps_to_empty():
    """Scalar chains guard None -> ""; the column kernels fill nulls the
    same way instead of propagating them."""
    arr = pa.array(["a", None, " x "], pa.string())
    assert preprocess_column(arr).to_pylist() == ["a", "", "x"]
    assert clean_extracted_column(arr).to_pylist() == ["a", "", "x"]
