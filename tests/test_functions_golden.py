"""Exact-match tests of ocr_ray.functions against golden fixtures.

Fixtures were produced by executing the reference's own source
(tools/parity_check.py); these tests require neither Ray nor the
reference checkout.
"""

import ocr_ray.functions as F


def _corpus(golden):
    return golden["corpus"]


def test_preprocess_text(golden):
    for text, want in zip(_corpus(golden), golden["cases"]["preprocess_text"]):
        assert F.preprocess_text(text) == want


def test_clean_extracted_text(golden):
    for text, want in zip(_corpus(golden), golden["cases"]["clean_extracted_text"]):
        assert F.clean_extracted_text(text) == want


def test_score_ocr_result(golden):
    for text, want in zip(_corpus(golden), golden["cases"]["score_ocr_result"]):
        assert F.score_ocr_result(text) == want


def test_score_result_01(golden):
    for text, want in zip(_corpus(golden), golden["cases"]["score_result_01"]):
        assert F.score_result_01(text) == want


def test_extract_entities(golden):
    for text, want in zip(_corpus(golden), golden["cases"]["extract_entities"]):
        assert F.extract_entities(text) == want


def test_chunking(golden):
    for text, want in zip(_corpus(golden), golden["cases"]["split_text_into_chunks"]):
        assert F.split_text_into_chunks(text) == want
    for text, want in zip(_corpus(golden), golden["cases"]["get_text_chunks"]):
        assert F.get_text_chunks(text) == want


def test_formatting(golden):
    for text, want in zip(_corpus(golden), golden["cases"]["format_md"]):
        assert F.format_ocr_result(text, "markdown") == want
    for text, want in zip(_corpus(golden), golden["cases"]["format_html"]):
        assert F.format_ocr_result(text, "html") == want


def test_language_fallback(golden):
    for text, want in zip(_corpus(golden), golden["cases"]["detect_language"]):
        assert F.detect_language_fallback(text) == want


def test_keyword_search(golden):
    inputs = golden["cases"]["keyword_search_inputs"]
    wants = golden["cases"]["keyword_search"]
    for case, want in zip(inputs, wants):
        got = F.keyword_search(case["query"], case["chunks"], 3)
        assert [[t, float(s)] for t, s in got] == want


def test_layout_walks(golden):
    pages = golden["cases"]["layout_pages"]
    for page, want_a, want_f in zip(
        pages, golden["cases"]["layout_adaptive"], golden["cases"]["layout_fixed20"]
    ):
        boxes = [tuple(b) for b in page["boxes"]]
        assert F.group_boxes_into_lines(boxes, page_height=page["height"]) == want_a
        assert F.group_boxes_into_lines(boxes, variant="fixed20") == want_f


def test_concat_pages():
    assert F.concat_pages(["a", "b"], "cli") == "--- Page 1 ---\na\n\n--- Page 2 ---\nb"
    assert F.concat_pages(["a"], "upper") == "--- PAGE 1 ---\na\n\n"
    assert F.concat_pages(["a", "b"], "plain") == "a\n\nb"


def test_edge_cases():
    assert F.preprocess_text("") == ""
    assert F.preprocess_text(None) == ""
    assert F.clean_extracted_text("") == ""
    assert F.score_ocr_result("") == 0
    assert F.split_text_into_chunks("") == []
    assert F.get_text_chunks("") == []
    assert F.group_boxes_into_lines([]) == ""


def test_poly_simhash_properties():
    """SQL-replicable simhash: deterministic, set-semantic (duplicate
    shingles don't double-vote), short-doc fold, near-dup locality."""
    from ocr_ray.stages.dedup import PolySimHasher, hamming64

    h = PolySimHasher()
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    assert h.signature_of(base) == PolySimHasher().signature_of(base)
    # distinct-feature semantics: repeating the text changes nothing
    assert h.signature_of(base) == h.signature_of(base + " " + base.strip())
    # dropping one word stays close; unrelated text lands far
    near = " ".join(base.split()[:-1])
    far = "one two three four five six seven eight nine ten " * 5
    assert hamming64(h.signature_of(base), h.signature_of(near)) <= 9
    assert hamming64(h.signature_of(base), h.signature_of(far)) > 9
    # short docs (n < k) still produce a signature from the single fold
    assert h.signature_of("ab") != 0
    assert h.signature_of("") == 0
    # signatures fit in the declared 62 bits
    assert h.signature_of(base) < (1 << 62)


def test_redact_pii_golden():
    from ocr_ray.functions.entities import redact_pii

    r = redact_pii("Reach x_1@y.co or (555) 123-4567 by 2024-01-05, "
                   "Jan 5, 2024 or 1/5/24; docs at http://d.io/a%2Fb page")
    # reference quirks preserved: the phone pattern's \b can't precede "(",
    # so the paren survives; the URL class has no "/", so the path survives
    assert r["redacted"] == ("Reach [EMAIL] or ([PHONE] by [DATE], "
                             "[DATE] or [DATE]; docs at [URL]/a%2Fb page")
    assert (r["n_emails"], r["n_phones"], r["n_urls"], r["n_dates"]) == (1, 1, 1, 3)
    # no PII -> text unchanged
    clean = redact_pii("nothing sensitive here")
    assert clean["redacted"] == "nothing sensitive here"
    assert clean["n_emails"] == clean["n_dates"] == 0


def test_poly_hash_sql_equivalence():
    """The polynomial hash folds MUST stay bit-identical between Python and
    DuckDB — every SQL-replicable oracle (simhash, contamination, ann_lsh,
    embedder, fingerprint) rests on this equivalence."""
    import duckdb

    from ocr_ray.stages.dedup import PolySimHasher, _poly_hash_token
    from ocr_ray.stages.embed import hash_token

    con = duckdb.connect()
    # domain = non-empty tokens (regex token streams / whitespace splits of
    # trimmed text never yield '' — DuckDB's string_split('', '') quirk
    # diverges there, outside every oracle's reachable inputs)
    words = ["alpha", "Beta42", "z", "répé", "12:7"]
    for w in words:
        got = con.execute(
            """SELECT list_reduce(list_prepend(CAST(7 AS BIGINT),
                 list_transform(string_split(?, ''), c -> CAST(unicode(c) AS BIGINT))),
                 (a, b) -> (a * 31 + b) % 1000003)""", [w]).fetchone()[0]
        assert got == hash_token(w) == _poly_hash_token(w)[0], w
        got2 = con.execute(
            """SELECT list_reduce(list_prepend(CAST(11 AS BIGINT),
                 list_transform(string_split(?, ''), c -> CAST(unicode(c) AS BIGINT))),
                 (a, b) -> (a * 37 + b) % 1000033)""", [w]).fetchone()[0]
        assert got2 == _poly_hash_token(w)[1], w

    # full 62-bit signature equivalence on one realistic text
    text = "the quick brown fox jumps over the lazy dog repeatedly today"
    h = PolySimHasher()
    sig_sql = con.execute("""
WITH u AS (SELECT string_split_regex(trim(?), '\\s+') AS w),
th AS (SELECT len(w) AS n,
   list_transform(w, t -> list_reduce(list_prepend(CAST(7 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 31 + b) % 1000003)) AS t1,
   list_transform(w, t -> list_reduce(list_prepend(CAST(11 AS BIGINT),
       list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 37 + b) % 1000033)) AS t2
 FROM u),
feats AS (SELECT list_distinct(list_transform(generate_series(1, n - 2), i ->
       ((t1[i] * 1000003 + t1[i+1]) % 2147483647 * 1000003 + t1[i+2]) % 2147483647
       + ((t2[i] * 1000033 + t2[i+1]) % 2147483647 * 1000033 + t2[i+2]) % 2147483647 * 2147483648)) AS hs
   FROM th),
bits AS (SELECT b.j, CASE WHEN sum(((x.h >> b.j) & 1) * 2 - 1) > 0 THEN 1 ELSE 0 END AS bit
         FROM feats, unnest(feats.hs) AS x(h),
              (SELECT unnest(generate_series(0, 61)) AS j) AS b
         GROUP BY b.j)
SELECT CAST(sum(bit << j) AS BIGINT) FROM bits""", [text]).fetchone()[0]
    assert sig_sql == h.signature_of(text)
