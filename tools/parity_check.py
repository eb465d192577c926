"""Parity check + golden-fixture freezer.

Executes the *reference's own source* (pure functions only, heavy deps
mocked) from /root/reference on a deterministic randomized corpus, compares
every output against ocr_ray.functions, and freezes the reference outputs
as JSON fixtures under tests/fixtures/.

Run once per round:  python tools/parity_check.py
Exit code != 0 on any mismatch.  Fixtures are committed so `pytest` never
needs /root/reference or the mocks.
"""

from __future__ import annotations

import ast
import importlib.util
import json
import random
import string
import sys
import types
from pathlib import Path

REF = Path("/root/reference")
REPO = Path(__file__).resolve().parent.parent
FIXTURES = REPO / "tests" / "fixtures"

sys.path.insert(0, str(REPO))


# ---------------------------------------------------------------- loaders
def load_module(path: Path, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def install_mocks():
    """Stub the heavy deps so src/ocr_module.py imports; the functions we
    call only touch numpy + the mocked reader objects."""
    import numpy as np

    cv2 = types.ModuleType("cv2")
    cv2.__getattr__ = lambda name: (lambda *a, **k: None)  # type: ignore[attr-defined]
    pytesseract = types.ModuleType("pytesseract")
    pytesseract.image_to_string = lambda *a, **k: ""
    pil = types.ModuleType("PIL")

    class _FakeImage:  # stand-in for PIL.Image.Image
        pass

    pil_image = types.ModuleType("PIL.Image")
    pil_image.Image = _FakeImage
    pil_enh = types.ModuleType("PIL.ImageEnhance")
    pil_enh.Contrast = lambda img: None
    pil.Image = pil_image
    pil.ImageEnhance = pil_enh

    model_manager = types.ModuleType("model_manager")
    model_manager._easy_boxes = []
    model_manager._paddle_boxes = []

    class _EasyReader:
        def readtext(self, img):
            return model_manager._easy_boxes

    class _PaddleReader:
        def ocr(self, img, cls=True):
            return [model_manager._paddle_boxes]

    model_manager.get_easy_ocr = lambda: _EasyReader()
    model_manager.get_paddle_ocr = lambda: _PaddleReader()
    model_manager.get_ocr_config = lambda: {}

    sys.modules["cv2"] = cv2
    sys.modules["pytesseract"] = pytesseract
    sys.modules["PIL"] = pil
    sys.modules["PIL.Image"] = pil_image
    sys.modules["PIL.ImageEnhance"] = pil_enh
    sys.modules["model_manager"] = model_manager
    return model_manager


def extract_function(path: Path, func_name: str, class_name: str | None = None):
    """Compile one function/method out of a reference file without importing it."""
    tree = ast.parse(path.read_text())
    nodes = tree.body
    if class_name:
        nodes = next(n.body for n in nodes if isinstance(n, ast.ClassDef) and n.name == class_name)
    fn = next(n for n in nodes if isinstance(n, ast.FunctionDef) and n.name == func_name)
    mod = ast.Module(body=[fn], type_ignores=[])
    ns: dict = {"__builtins__": __builtins__}
    import re as _re
    import numpy as _np

    ns.update({"re": _re, "np": _np})
    exec(compile(mod, str(path), "exec"), ns)
    return ns[func_name]


# ---------------------------------------------------------------- corpus
def build_corpus(seed: int = 42, n: int = 400) -> list[str]:
    rng = random.Random(seed)
    words = (
        "the quick brown fox jumps over lazy dog lorem ipsum dolor sit amet "
        "data pipeline extraction conversation transcript assistant user tool "
        "HELLO WORLD TITLE SECTION a an is of to for model batch stream"
    ).split()
    specials = [
        "", " ", "\n", "\t\t", "a", "hi\nthere", "x" * 19, "y" * 20,
        "ALL CAPS TITLE", "### header-ish", "line1\nline2\n\n\n\nline3",
        "tab\there", "\r\nwin\r\r\rline", "nul\x00bel\x07",
        "unicode: café naïve — “smart” …", "中文内容测试一下下", "これはテストです",
        "한국어 테스트 문장", "اختبار عربي للنص", "русский текст тест",
        "email me at john.doe+test@example-site.co.uk today",
        "call +1 (555) 123-4567 or 555 987 6543",
        "visit https://example.com/path%20x?y=1 or http://a.b",
        "due 12/31/2024 or 2024-01-02 or Jan 3, 2025 or march 14 1592",
        "mixed​zero‌width⁠chars", "  padded  ",
        "word " * 300, ("para one. " * 30 + "\n\n" + "para two! " * 40),
        # markdown header heuristic boundaries (len(strip) in (3,50) exclusive)
        "ABC", "ABCD", "A" * 49, "A" * 50, " ABCD ", "AB12", "1234",
        "lower\nUPPER HEADER\nlower again", "MIXeD CASE",
        # newline-flavor edge cases for the \n{3,} / (\r\n|\r|\n){3,} rules
        "a\r\n\r\n\r\nb", "a\r\r\r\rb", "a\n\r\n\rb", "a" + "\n" * 10 + "b",
        # emoji / astral plane (non-ASCII strip must drop whole codepoints)
        "emoji 🙂 test 🎉 done", "🙂🙂🙂",
        # entity-ish html remnants
        "5 &lt; 6 &amp; 7 &gt; 4", "<p>not stripped here</p>",
        # hyphen wraps
        "hyphen-\nwrap and an end-\n", "-\n-", "pre -\n post",
        # numbers & punctuation density extremes
        "1 2 3 4 5 6 7 8 9 0", "!!! ??? ... ;;; :::", ". ",
    ]
    corpus = list(specials)
    for _ in range(n - len(specials)):
        k = rng.randint(1, 120)
        toks = [rng.choice(words) for _ in range(k)]
        s = []
        for t in toks:
            s.append(t)
            r = rng.random()
            if r < 0.08:
                s.append("\n" * rng.randint(1, 4))
            elif r < 0.12:
                s.append(" " * rng.randint(2, 5))
            elif r < 0.14:
                s.append(rng.choice(["é", "ü", "→", "•", "\x1b", " "]))
        corpus.append(" ".join(s))
    return corpus


def build_boxes(seed: int = 7, n_pages: int = 60):
    """Synthetic axis-aligned boxes per page: columns, bullets, drift."""
    rng = random.Random(seed)
    pages = []
    for p in range(n_pages):
        boxes = []
        n = rng.randint(0, 40)
        y = 40.0
        for i in range(n):
            # some boxes share a line, some drift, occasional column jump
            if rng.random() < 0.55 and boxes:
                y += rng.uniform(-6, 6)  # same-ish line (within tol)
            else:
                y += rng.uniform(12, 60)  # new line
            x = rng.choice([50, 80, 120, 320, 400]) + rng.uniform(0, 30)
            h = rng.uniform(8, 18)
            boxes.append((round(x, 2), round(y, 2), round(x + rng.uniform(20, 150), 2),
                          round(y + h, 2), f"w{p}_{i}"))
        pages.append({"height": rng.choice([400, 800, 1000, 2000]), "boxes": boxes})
    return pages


def to_quad_easy(b):
    # easyocr: (box[4 points], text, conf); points as [x,y]
    x0, y0, x1, y1, t = b
    return ([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], t, 0.9)


def to_quad_paddle(b):
    x0, y0, x1, y1, t = b
    return [[[x0, y0], [x1, y0], [x1, y1], [x0, y1]], (t, 0.9)]


# ---------------------------------------------------------------- main
def main() -> int:
    import numpy as np

    mm = install_mocks()
    ref_tu = load_module(REF / "ocr_app" / "utils" / "text_utils.py", "ref_text_utils")
    ref_su = load_module(REF / "src" / "utils.py", "ref_src_utils")
    ref_om = load_module(REF / "src" / "ocr_module.py", "ref_ocr_module")
    ref_format_layout = extract_function(
        REF / "ocr_app" / "core" / "ocr_engine.py", "_format_with_layout", "EasyOCREngine")
    ref_score01 = extract_function(
        REF / "ocr_app" / "core" / "ocr_engine.py", "_score_result", "OCREngine")
    ref_answer = extract_function(
        REF / "ocr_app" / "rag" / "rag_processor.py", "_extract_answer_from_context", "RAGProcessor")

    import ocr_ray.functions as F

    corpus = build_corpus()
    mismatches = []
    golden: dict = {"corpus": corpus, "cases": {}}

    def check(name, ref_fn, my_fn, inputs):
        outs = []
        for x in inputs:
            r = ref_fn(x) if not isinstance(x, tuple) else ref_fn(*x)
            m = my_fn(x) if not isinstance(x, tuple) else my_fn(*x)
            if r != m:
                mismatches.append((name, repr(x)[:80], repr(r)[:120], repr(m)[:120]))
            outs.append(r)
        golden["cases"][name] = outs

    check("preprocess_text", ref_tu.preprocess_text, F.preprocess_text, corpus)
    check("clean_extracted_text", ref_su.clean_extracted_text, F.clean_extracted_text, corpus)
    check("score_ocr_result", ref_om.score_ocr_result, F.score_ocr_result, corpus)
    check("score_result_01", lambda t: ref_score01(None, t), F.score_result_01, corpus)
    check("extract_entities", ref_tu.extract_entities, F.extract_entities, corpus)
    check("split_text_into_chunks", ref_tu.split_text_into_chunks, F.split_text_into_chunks, corpus)
    check("get_text_chunks", ref_su.get_text_chunks, F.get_text_chunks, corpus)
    check("format_md", lambda t: ref_tu.format_ocr_result(t, "markdown"),
          lambda t: F.format_ocr_result(t, "markdown"), corpus)
    check("format_html", lambda t: ref_tu.format_ocr_result(t, "html"),
          lambda t: F.format_ocr_result(t, "html"), corpus)

    # language fallback: force the except branch (no langdetect installed -> the
    # reference's try fails with ImportError and falls through to unicode ranges)
    check("detect_language", ref_su.detect_language, F.detect_language_fallback, corpus)

    # answer extraction: (query, context) pairs
    queries = ["who wrote the report", "when is the deadline",
               "what is the total", "where is the office", "how does it work"]
    contexts = [c for c in corpus if len(c) > 40][:40]
    qc_pairs = [(q, c) for q in queries for c in contexts[:10]]
    check("extract_answer", lambda q, c: ref_answer(None, q, c),
          F.extract_answer_from_context, [(q, c) for q, c in qc_pairs])

    # keyword search over chunked corpus
    kw_cases = []
    kw_golden = []
    for c in contexts[:20]:
        chunks = ref_tu.split_text_into_chunks(c)
        for q in queries[:3]:
            r = ref_tu._keyword_search(q.lower(), chunks, 3)
            m = F.keyword_search(q, chunks, 3)
            if [(t, float(s)) for t, s in r] != [(t, float(s)) for t, s in m]:
                mismatches.append(("keyword_search", q, repr(r)[:120], repr(m)[:120]))
            kw_cases.append({"query": q, "chunks": chunks})
            kw_golden.append([[t, float(s)] for t, s in r])
            r2 = ref_su.fallback_keyword_search(chunks, q, 3)
            m2 = F.fallback_keyword_search(chunks, q, 3)
            if r2 != m2:
                mismatches.append(("fallback_keyword_search", q, repr(r2)[:120], repr(m2)[:120]))
    golden["cases"]["keyword_search_inputs"] = kw_cases
    golden["cases"]["keyword_search"] = kw_golden

    # layout walks: run the real reference code paths with mocked readers
    pages = build_boxes()
    import numpy as _np

    adaptive_golden, fixed_golden = [], []
    for page in pages:
        boxes = [tuple(b) for b in page["boxes"]]
        h = page["height"]
        img = _np.zeros((h, 600), dtype=_np.uint8)

        mm._easy_boxes = [to_quad_easy(b) for b in boxes]
        r_easy = ref_om.easyocr_ocr(img, preserve_layout=True)
        m_easy = F.group_boxes_into_lines(boxes, page_height=h, variant="adaptive")
        if r_easy != m_easy:
            mismatches.append(("walk_adaptive_easy", f"page h={h} n={len(boxes)}",
                               repr(r_easy)[:120], repr(m_easy)[:120]))

        mm._paddle_boxes = [to_quad_paddle(b) for b in boxes]
        r_paddle = ref_om.paddle_ocr(img, preserve_layout=True)
        if boxes and r_paddle != m_easy:
            # for axis-aligned quads the paddle and easy walks agree
            mismatches.append(("walk_adaptive_paddle", f"page h={h}",
                               repr(r_paddle)[:120], repr(m_easy)[:120]))

        r_fixed = ref_format_layout(None, [to_quad_easy(b) for b in boxes])
        m_fixed = F.group_boxes_into_lines(boxes, variant="fixed20")
        if r_fixed != m_fixed:
            mismatches.append(("walk_fixed20", f"page h={h} n={len(boxes)}",
                               repr(r_fixed)[:120], repr(m_fixed)[:120]))
        adaptive_golden.append(r_easy)
        fixed_golden.append(r_fixed)
    golden["cases"]["layout_pages"] = pages
    golden["cases"]["layout_adaptive"] = adaptive_golden
    golden["cases"]["layout_fixed20"] = fixed_golden

    FIXTURES.mkdir(parents=True, exist_ok=True)
    (FIXTURES / "golden_scalars.json").write_text(json.dumps(golden))

    if mismatches:
        print(f"{len(mismatches)} MISMATCHES")
        for m in mismatches[:25]:
            print(" ", m)
        return 1
    print(f"parity OK: {sum(len(v) for k, v in golden['cases'].items())} cases frozen "
          f"-> {FIXTURES / 'golden_scalars.json'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
