"""Output formatting (text / markdown / html).

Semantics: ``ocr_app/utils/text_utils.py:233-276``.  The markdown header
heuristic promotes ALL-CAPS lines with 3 < stripped length < 50 to
``## `` headers (note the ``## `` prefixes the *unstripped* line).
"""

from __future__ import annotations


def format_ocr_result(text: str, format_type: str = "text") -> str:
    if not text:
        return ""
    if format_type == "text":
        return text
    if format_type == "markdown":
        out = []
        for line in text.split("\n"):
            s = line.strip()
            if s.isupper() and len(s) < 50 and len(s) > 3:
                out.append(f"## {line}")
            else:
                out.append(line)
        return "\n".join(out)
    if format_type == "html":
        out = ['<div class="ocr-text">']
        for line in text.split("\n"):
            if not line.strip():
                out.append("<br>")
            else:
                out.append(f"<p>{line}</p>")
        out.append("</div>")
        return "\n".join(out)
    return text
