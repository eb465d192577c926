"""Text-analysis operators over document tables (SURVEY §2.2 M9-M15 applied
at table scale, plus the training-data-pipeline extras: token counting,
quality scoring, language-ID).

All stages are ``map_batches`` functions over pandas/pyarrow batches; the
per-row scalar semantics come from ocr_ray.functions (reference parity).
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa

from ocr_ray.functions.chunking import get_text_chunks
from ocr_ray.functions.langid import detect_language_fallback
from ocr_ray.functions.scoring import score_ocr_result
from ocr_ray.functions.textops import clean_extracted_text, preprocess_text

_WORD = re.compile(r"\w+")

# stop-word set from the reference's answer extraction
# (ocr_app/rag/rag_processor.py:193)
STOP_WORDS = (
    "the", "a", "an", "is", "are", "was", "were", "in", "on", "at",
    "by", "to", "for", "with", "about",
)
_STOP_SET = frozenset(STOP_WORDS)


def clean_docs_batch(batch: pa.Table) -> pa.Table:
    """M9/M10 cleanup as pure Arrow RE2 kernels (zero Python-object rows).

    Semantic notes vs the scalar reference functions (textops.py): the
    ``\\n{3,}`` / break-run rules are dead after the leading ``\\s+``
    collapse (reference quirk, kept); RE2's ``\\s`` is ASCII-only where
    Python's is Unicode — no payload in the corpus distinguishes them
    (both the batch-vs-scalar pytest and the RE2-based DuckDB oracle gate
    this), and the non-ASCII strip removes the residue either way."""
    import pyarrow.compute as pc

    txt = batch["text"]
    ws = pc.replace_substring_regex(txt, r"\s+", " ")
    pre = pc.utf8_trim_whitespace(pc.replace_substring_regex(ws, r"[^\x00-\x7F]+", ""))
    ext = pc.utf8_trim_whitespace(pc.replace_substring_regex(ws, r"[^\x20-\x7E\n\t]", ""))
    return pa.table(
        {"doc_id": batch["doc_id"], "clean_preprocess": pre, "clean_extracted": ext}
    )


def score_docs_batch(batch: pd.DataFrame) -> pd.DataFrame:
    import math

    # floor(x*1e6+0.5)/1e6 instead of round(): Python round() and DuckDB
    # round() disagree on exact half-boundaries (observed: raw score
    # 16.2621875 -> 16.262187 vs 16.262188).  The scaled-floor form runs
    # the identical IEEE ops on both engines, so the boundary cannot split.
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "score": [
                math.floor(score_ocr_result(t) * 1e6 + 0.5) / 1e6
                for t in batch["text"]
            ],
        }
    )


def quality_docs_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Token counting + quality signals (length / stopword ratio / mean token
    length) — the language-model-data quality-scoring analog of M15."""
    rows: Dict[str, List] = {
        "doc_id": [], "n_chars": [], "n_tokens": [], "n_distinct": [],
        "stop_ratio": [], "mean_token_len": [], "lang_fallback": [],
    }
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        toks = _WORD.findall(text.lower())
        n = len(toks)
        rows["doc_id"].append(doc_id)
        rows["n_chars"].append(len(text))
        rows["n_tokens"].append(n)
        rows["n_distinct"].append(len(set(toks)))
        rows["stop_ratio"].append(round(sum(t in _STOP_SET for t in toks) / max(1, n), 6))
        rows["mean_token_len"].append(round(sum(len(t) for t in toks) / max(1, n), 6))
        rows["lang_fallback"].append(detect_language_fallback(text))
    return pd.DataFrame(rows)


def chunk_docs_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Flat-map each document into its word-window chunks (R2 semantics,
    ``src/utils.py:10-24``): one output row per (doc_id, chunk_idx)."""
    doc_ids: List[int] = []
    idxs: List[int] = []
    chunks: List[str] = []
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        for i, chunk in enumerate(get_text_chunks(text, 100, 20)):
            doc_ids.append(doc_id)
            idxs.append(i)
            chunks.append(chunk)
    return pd.DataFrame({"doc_id": doc_ids, "chunk_idx": idxs, "chunk": chunks})


# language-ID marker profiles: common function words per language (n-gram /
# stopword-profile heuristic; the deterministic complement to the reference's
# unicode-range fallback, which only separates scripts, src/utils.py:105-122)
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"),
    "fr": ("le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des"),
    "es": ("el", "los", "las", "una", "por", "para", "con", "del", "como", "pero"),
}
_LANG_SETS = {k: frozenset(v) for k, v in LANG_MARKERS.items()}
_LANG_ORDER = ("en", "de", "fr", "es")  # >= tie-break priority


def langid_docs_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Stopword-profile language ID: per-language marker-token counts,
    argmax with fixed priority (all-zero -> 'en').  Shared semantics with
    the SQL oracle (same token regex, same marker sets, same tie-break)."""
    out: Dict[str, List] = {"doc_id": [], "lang_guess": []}
    for lang in _LANG_ORDER:
        out[f"n_{lang}"] = []
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        toks = _WORD.findall(text.lower())
        counts = {lang: sum(t in _LANG_SETS[lang] for t in toks) for lang in _LANG_ORDER}
        guess = "en"
        for lang in _LANG_ORDER:
            if all(counts[lang] >= counts[o] for o in _LANG_ORDER if o != lang):
                guess = lang
                break
        out["doc_id"].append(doc_id)
        out["lang_guess"].append(guess)
        for lang in _LANG_ORDER:
            out[f"n_{lang}"].append(counts[lang])
    return pd.DataFrame(out)


# BPE-ish tokenizer classes (subset shared verbatim with the SQL oracle so
# both sides count identical tokens; RE2-safe, no lookarounds)
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_BPE = re.compile(BPE_PATTERN)


def token_count_batch(batch: pa.Table) -> pa.Table:
    """Token counting (training-data-pipeline op) as Arrow RE2 count
    kernels — one ``count_substring_regex`` pass per counter, no Python
    loop (batch-vs-scalar parity gated in pytest)."""
    import pyarrow.compute as pc

    txt = batch["text"]

    def cnt(pattern: str):
        return pc.cast(pc.count_substring_regex(txt, pattern), pa.int64())

    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_ws_tokens": cnt(r"\S+"),
            "n_bpe_tokens": cnt(BPE_PATTERN),
            "n_alpha": cnt(r"[A-Za-z]+"),
            "n_num": cnt(r"[0-9]+"),
        }
    )


def synth_structured(text: str) -> str:
    """Deterministic structured payload derived from a flat doc text: an
    ALL-CAPS heading line over the body (the test tables are flat word runs,
    so formatter/table heuristics need synthesized line structure; the SQL
    oracle applies the identical synthesis)."""
    heading = " ".join(text.split()[:4]).upper()
    return heading + "\n" + text


def format_docs_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """M13 output formatter (``ocr_app/utils/text_utils.py:233-276``) over the
    synthesized structured payload: markdown header promotion + html wrap."""
    from ocr_ray.functions.formatting import format_ocr_result

    out = {"doc_id": [], "md": [], "html": []}
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        synth = synth_structured(text)
        out["doc_id"].append(doc_id)
        out["md"].append(format_ocr_result(synth, "markdown"))
        out["html"].append(format_ocr_result(synth, "html"))
    return pd.DataFrame(out)


_TABLE_BLOCK = "| a | b |\n| 1 | 2 |\n| 3 | 4 |"
_PIPE = re.compile(r"\|")


def synth_with_table(text: str, doc_id: int) -> str:
    """Append a deterministic pipe-table block to every 5th doc (positives for
    the table detector; identical synthesis in the SQL oracle)."""
    if int(doc_id) % 5 == 0:
        return text + "\n" + _TABLE_BLOCK
    return text


def table_detect_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """M16 graft (``ocr_app/core/image_processor.py:115-167``): detect
    tabular/aligned blocks — a line with >=2 pipe chars is a "grid line";
    >=3 grid lines (the reference's h-line/v-line count>3 analog) => table."""
    out = {"doc_id": [], "n_pipe_lines": [], "has_table": []}
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        synth = synth_with_table(text, doc_id)
        n = sum(1 for ln in synth.split("\n") if len(_PIPE.findall(ln)) >= 2)
        out["doc_id"].append(doc_id)
        out["n_pipe_lines"].append(n)
        out["has_table"].append(n >= 3)
    return pd.DataFrame(out)


def _normalize_ref(value: float, min_val: float, max_val: float) -> float:
    """The reference's 0-1 normalizer (ocr_app/core/image_processor.py:236-241):
    below min -> value/min; above max -> 1.0; else linear."""
    if value < min_val:
        return value / min_val
    if value > max_val:
        return 1.0
    return (value - min_val) / (max_val - min_val)


# ASCII punctuation class — identical regex both here and in the SQL oracle
_NOISE_CHARS = re.compile(r"[!-/:-@\[-`{-~]")


def quality_score_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """M15 parity: the reference's weighted quality_score
    (0.3 contrast + 0.2 brightness + 0.3 sharpness + 0.1 inv-noise +
    0.1 resolution, ``ocr_app/core/image_processor.py:211-232``) and issue
    tags (``src/ocr_module.py:549-587``) grafted onto text-payload signals:

      contrast   = distinct characters            (intensity spread analog)
      brightness = mean codepoint                 (mean intensity analog)
      sharpness  = codepoint variance             (Laplacian-variance analog)
      noise      = 100 * punct_chars / chars      (high-pass noise analog)
      resolution = min(1, chars/1000)             (min-dimension analog)

    Issue tags use the reference's thresholds verbatim: low_resolution
    (<1000), blurry (sharpness<100), low_contrast (codepoint spread<50),
    noise (noise level>20).  All intermediate sums are exact integers so
    the DuckDB oracle reproduces identical doubles branch-for-branch."""
    out: Dict[str, List] = {
        "doc_id": [], "contrast": [], "brightness": [], "sharpness": [],
        "noise_level": [], "quality_score": [], "issues": [],
    }
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
        n = len(codes)
        if n == 0:
            contrast = brightness = sharpness = noise = 0.0
            spread = 0.0
            res = 0.0
        else:
            sx = int(codes.sum(dtype=np.uint64))
            sxx = int((codes.astype(np.uint64) ** 2).sum(dtype=np.uint64))
            contrast = float(len(np.unique(codes)))
            brightness = sx / n
            sharpness = sxx / n - brightness * brightness
            noise = 100.0 * len(_NOISE_CHARS.findall(text)) / n
            spread = float(int(codes.max()) - int(codes.min()))
            res = min(1.0, n / 1000.0)
        score = (
            _normalize_ref(contrast, 40, 80) * 0.3
            + _normalize_ref(brightness, 100, 200) * 0.2
            + _normalize_ref(sharpness, 50, 200) * 0.3
            + (1.0 - _normalize_ref(noise, 0, 10)) * 0.1
            + res * 0.1
        )
        issues = []
        if n < 1000:
            issues.append("low_resolution")
        if sharpness < 100:
            issues.append("blurry")
        if spread < 50:
            issues.append("low_contrast")
        if noise > 20:
            issues.append("noise")
        # floats left UNROUNDED: both sides compute bit-identical doubles
        # (exact-int intermediates); rounding here would re-introduce
        # rounding-MODE divergence (Python half-even vs DuckDB half-away)
        out["doc_id"].append(doc_id)
        out["contrast"].append(contrast)
        out["brightness"].append(brightness)
        out["sharpness"].append(sharpness)
        out["noise_level"].append(noise)
        out["quality_score"].append(score)
        out["issues"].append(",".join(issues))
    return pd.DataFrame(out)


def fingerprint_docs_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Document fingerprinting: deterministic content hash (sha256 prefix)
    + a rolling polynomial hash over the token stream (Rabin-Karp style).
    Both components are chosen SQL-replicable — the per-token hash is the
    same codepoint polynomial as the embedder (stages/embed.py:hash_token),
    so the DuckDB oracle reproduces values exactly."""
    import hashlib

    from ocr_ray.stages.embed import hash_token

    out = {"doc_id": [], "content_sha": [], "rolling_fp": []}
    B, M = 1000003, (1 << 31) - 1
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        out["doc_id"].append(doc_id)
        out["content_sha"].append(hashlib.sha256(text.encode()).hexdigest()[:16])
        fp = 0
        for tok in text.split():
            fp = (fp * B + hash_token(tok)) % M
        out["rolling_fp"].append(fp)
    return pd.DataFrame(out)


# Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
# SIGMOD 2003 — the MOSS local document-fingerprinting algorithm).
# Guarantee: any shared substring of >= WINNOW_W + WINNOW_K - 1 tokens
# between two documents yields at least one shared selected fingerprint.
# Constants are frozen into the DuckDB oracle; WINNOW_C bounds kgram
# positions (docs are capped far below 2^20 kgrams at this payload size).
WINNOW_K = 4          # tokens per k-gram
WINNOW_W = 5          # window size (k-grams per window)
WINNOW_C = 1 << 20    # position tiebreak radix: key = h*C - pos


def winnow_docs_batch(batch: pd.DataFrame, k: int = WINNOW_K,
                      w: int = WINNOW_W) -> pd.DataFrame:
    """One row per SELECTED fingerprint: (doc_id, pos, fp).

    Per doc: token hashes (same SQL-replicable codepoint polynomial as
    fingerprint_docs_batch), k-gram rolling hashes kg[j] = fold
    (a*1000003 + th) % (2^31-1), then rightmost-min winnowing — each
    length-w window of k-grams selects its minimum hash, rightmost on
    ties.  The tiebreak is folded into a single integer key
    ``h*C - pos`` (favoring larger pos at equal h; exact in int64 since
    h < 2^31, C = 2^20), so the per-window argmin is one vectorized
    sliding-window min and the DuckDB oracle is the identical window
    MIN.  Docs with fewer than k tokens emit nothing; docs with fewer
    than w k-grams use one whole-sequence window."""
    from ocr_ray.stages.embed import hash_token

    B, M = 1000003, (1 << 31) - 1
    ids_out: list = []
    pos_out: list = []
    fp_out: list = []
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        toks = text.split()
        n = len(toks)
        if n < k:
            continue
        m = n - k + 1
        if m >= WINNOW_C:
            # the folded tiebreak key h*C - pos is only injective for
            # pos < C; a >=2^20-kgram (~1M-token) doc would silently wrap
            # pos and corrupt the decoded (fp, pos) — fail loudly instead
            raise ValueError(
                f"winnow_docs_batch: doc_id={doc_id} has {m} k-grams "
                f">= WINNOW_C={WINNOW_C}; split oversized docs upstream "
                "(the position tiebreak radix cannot represent them)"
            )
        th = np.fromiter((hash_token(t) for t in toks), dtype=np.int64, count=n)
        kg = np.zeros(m, dtype=np.int64)
        for i in range(k):  # kg*B < 2^51: exact in int64
            kg = (kg * B + th[i:i + m]) % M
        key = kg * WINNOW_C - np.arange(m, dtype=np.int64)
        if m <= w:
            mins = np.array([key.min()], dtype=np.int64)
        else:
            mins = np.lib.stride_tricks.sliding_window_view(key, w).min(axis=1)
        sel = np.unique(mins)
        p = (-sel) % WINNOW_C          # decode pos: key = h*C - pos
        h = (sel + p) // WINNOW_C
        ids_out.append(np.full(sel.size, doc_id, dtype=np.int64))
        pos_out.append(p)
        fp_out.append(h)
    if not ids_out:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "pos": pd.Series([], dtype="int64"),
                             "fp": pd.Series([], dtype="int64")})
    return pd.DataFrame({"doc_id": np.concatenate(ids_out),
                         "pos": np.concatenate(pos_out),
                         "fp": np.concatenate(fp_out)})


# Gopher rule thresholds (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", Table A1).  All
# keep-conditions are evaluated as scaled-integer comparisons so the
# DuckDB oracle is value-exact (no float-threshold boundary splits).
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
# single-char class on purpose: Gopher's "word contains an alphabetic
# character" test uses search(), not a full-run match
_ALPHA = re.compile(r"[a-zA-Z]")
_LOWER_RUN = re.compile(r"[a-z]+")


def gopher_rules_batch(batch: pd.DataFrame, min_stop_hits: int = 2) -> pd.DataFrame:
    """Gopher quality-rule bundle: per doc, every rule signal plus the
    composite keep flag.

    Rules (integer-exact forms):
      * 50 <= n_words <= 100_000
      * mean word length in [3, 10]       -> 3*W <= chars <= 10*W
      * symbol-to-word ratio <= 0.1       -> 10*symbols <= W
        (symbols = '#' occurrences + non-overlapping '...' occurrences)
      * bullet-start lines <= 90%         -> 10*bullet <= 9*lines
      * ellipsis-end lines <= 30%         -> 10*ellipsis <= 3*lines
      * >= 80% words contain an alphabetic char -> 5*alpha >= 4*W
      * >= ``min_stop_hits`` of the 8 required stop words present
        (published default 2; callers over corpora whose vocabulary is
        synthetic — like the sf test tables, which carry at most one of
        the canonical stops — pass 1 so the gate still discriminates)
    Words = whitespace tokens (ASCII strip parity with the SQL oracle);
    per-row map, no shuffle — the gate composes with hash-split/dedup
    stages exactly like doc_clf / doc_lm.
    """
    out = {"doc_id": [], "n_words": [], "mean_word_len": [], "n_symbols": [],
           "n_lines": [], "n_bullet_lines": [], "n_ellipsis_lines": [],
           "n_alpha_words": [], "n_stop_hits": [], "keep": []}
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        words = text.split()
        n_words = len(words)
        total_chars = sum(len(w) for w in words)
        n_alpha = sum(1 for w in words if _ALPHA.search(w))
        n_symbols = text.count("#") + text.count("...")
        lines = text.split("\n")
        n_lines = len(lines)
        n_bullet = sum(1 for ln in lines if ln.lstrip(" \t")[:1] in ("-", "*", "•"))
        n_ellipsis = sum(1 for ln in lines if ln.rstrip(" \t").endswith("..."))
        toks = set(_LOWER_RUN.findall(text.lower()))
        n_stops = sum(1 for s in GOPHER_STOPS if s in toks)
        keep = (
            50 <= n_words <= 100_000
            and 3 * n_words <= total_chars <= 10 * n_words
            and 10 * n_symbols <= n_words
            and 10 * n_bullet <= 9 * n_lines
            and 10 * n_ellipsis <= 3 * n_lines
            and 5 * n_alpha >= 4 * n_words
            and n_stops >= min_stop_hits
        )
        out["doc_id"].append(int(doc_id))
        out["n_words"].append(n_words)
        out["mean_word_len"].append(
            round(total_chars / n_words, 6) if n_words else 0.0
        )
        out["n_symbols"].append(n_symbols)
        out["n_lines"].append(n_lines)
        out["n_bullet_lines"].append(n_bullet)
        out["n_ellipsis_lines"].append(n_ellipsis)
        out["n_alpha_words"].append(n_alpha)
        out["n_stop_hits"].append(n_stops)
        out["keep"].append(bool(keep))
    df = pd.DataFrame(out)
    for c in ("doc_id", "n_words", "n_symbols", "n_lines", "n_bullet_lines",
              "n_ellipsis_lines", "n_alpha_words", "n_stop_hits"):
        df[c] = df[c].astype("int64")
    return df


def _norm_group_key(v):
    """Dict key for a group value, SQL-NULL-safe: NaN/None/NaT all map to
    ``None`` (NaN is unusable as a broadcast dict key — it hashes but
    never compares equal, and a deserialized NaN is a different object),
    matching hash_aggregate's dropna=False convention that all null keys
    form ONE group."""
    return None if pd.isna(v) else v


def _q_permille(q: float) -> int:
    """Quantile as exact permille for integer PERCENTILE_DISC ranks.
    IEEE ``ceil(q*n)`` misrounds when the exact product is an integer
    (float ``0.07*100 = 7.000000000000001`` reads rank 8 where the exact
    rank is 7), so ranks are computed as ``(n*q_pm + 999) // 1000``;
    ``q`` must be permille-representable — a q that isn't (1/3, 0.0625)
    raises rather than silently computing a nearby quantile."""
    q_pm = round(q * 1000)
    if not 0 <= q_pm <= 1000:
        raise ValueError(f"quantile out of [0, 1]: {q}")
    if abs(q * 1000 - q_pm) > 1e-9:
        raise ValueError(
            f"quantile {q} is not permille-representable; use a multiple "
            f"of 0.001 (exact integer ranks are what keeps engine/oracle "
            f"parity bit-exact)")
    return q_pm


def _disc_rank(n: int, q_pm: int) -> int:
    """1-based PERCENTILE_DISC rank: max(1, ceil(n * q_pm / 1000)) in
    exact integer arithmetic."""
    return max(1, (n * q_pm + 999) // 1000)


def grouped_quantile_gate(
    docs: "object",
    group_col: str = "lang",
    q: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_partitions: "int | None" = None,
) -> "object":
    """Per-GROUP adaptive quality gate: keep each group's docs whose
    token count reaches that group's q-quantile (PERCENTILE_DISC) — the
    "filter every language to its own upper half" curation pattern,
    where one global threshold would gut low-resource languages.

    Exact and sort-free at scale: pass 1 reduces the corpus to a
    per-(group, score) COUNT HISTOGRAM through the bounded hash
    exchange (cardinality = groups x distinct scores, never rows); the
    per-group threshold is read off the cumulative histogram on the
    driver (PERCENTILE_DISC: smallest value at rank >= ceil(q*n), the
    rank in exact integer permille arithmetic — see :func:`_q_permille`
    — so q must be permille-representable; null groups form one SQL-NULL
    group); pass
    2 re-streams the corpus filtering score >= broadcast
    threshold[group] — no shuffle of document rows at any point.
    Whitespace-only docs carry no score and are excluded (mirroring the
    oracle's ``trim(text) <> ''`` filter).  Output ``(id, group,
    token_len, thr_len)``, deterministic."""
    import numpy as np
    import ray

    from ocr_ray.stages.aggregate import hash_aggregate

    q_pm = _q_permille(q)  # validate BEFORE the corpus-wide pass

    def scores(b: pd.DataFrame) -> pd.DataFrame:
        keep = b[text_col].str.strip() != ""
        n = b.loc[keep, text_col].str.split().str.len().astype("int64")
        return pd.DataFrame({group_col: b.loc[keep, group_col],
                             "token_len": n})

    hist = hash_aggregate(
        docs.map_batches(scores, batch_format="pandas"),
        keys=[group_col, "token_len"], aggs={"cnt": "count"},
        n_partitions=n_partitions,
    ).to_pandas()
    if group_col not in hist.columns or not len(hist):
        # all-whitespace corpus (to_pandas drops columns on all-empty)
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame({
            id_col: pd.Series(dtype="int64"),
            group_col: pd.Series(dtype="object"),
            "token_len": pd.Series(dtype="int64"),
            "thr_len": pd.Series(dtype="int64")}))

    thr = {}
    for g, sub in hist.groupby(group_col, sort=False, dropna=False):
        sub = sub.sort_values("token_len")
        cum = sub["cnt"].to_numpy(dtype="int64").cumsum()
        rank = _disc_rank(int(cum[-1]), q_pm)
        idx = int(np.searchsorted(cum, rank, side="left"))
        thr[_norm_group_key(g)] = int(sub["token_len"].iloc[idx])
    thr_ref = ray.put(thr)

    def gate(b: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(thr_ref)
        keep = b[text_col].str.strip() != ""
        sub = b[keep]
        n = sub[text_col].str.split().str.len().astype("int64")
        lim = sub[group_col].map(
            lambda v: t[_norm_group_key(v)]).astype("int64")
        sel = n >= lim
        return pd.DataFrame({
            id_col: sub.loc[sel, id_col].astype("int64"),
            group_col: sub.loc[sel, group_col],
            "token_len": n[sel],
            "thr_len": lim[sel],
        })

    return docs.map_batches(gate, batch_format="pandas")


def budget_select_per_group(
    docs: "object",
    budget: "int | Dict",
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_partitions: "int | None" = None,
    token_col: "str | None" = None,
) -> "object":
    """Token-budget data mixing: per group (source/domain), keep docs in
    deterministic id order while the group's cumulative whitespace-token
    count stays within ``budget`` — the "take N tokens from each feed"
    quota step of building a training mixture.

    One streaming tokenize pass reduces each row to ``(id, group,
    n_tok)`` — three fixed-width columns, so the group-keyed exchange
    moves metadata, never document text.  Inside each partition the
    per-group prefix sum is a vectorized sort + groupby-cumsum.  Skew
    note: one group's rows meet in one partition (the prefix sum is
    order-sequential by definition); for a single mega-group beyond one
    worker's memory, route through the bucket-offset two-pass used by
    transcripts_packed (exact distributed prefix sum) instead.

    Output ``(id, group, n_tok, cum_tok)`` for kept docs.  A zero-token
    doc inside budget is kept; once the cumulative crosses ``budget``
    the group emits nothing further (cumsum is monotone).

    ``budget`` is one global int, or a dict of per-group budgets (keys
    null-normalized via :func:`_norm_group_key`; a group absent from the
    dict keeps nothing) — the hook :func:`temperature_mix_select` uses
    to turn source weights into quotas.  ``token_col``: pass the name of
    an existing per-row token-count column to skip the tokenize pass
    (``text_col`` is then ignored) — callers that already paid the
    str.split (temperature mixing's totals pass) reuse it instead of
    re-reading the text."""
    from ocr_ray.stages.join import exchange_map_partitions

    budget_map = ({_norm_group_key(k): int(v) for k, v in budget.items()}
                  if isinstance(budget, dict) else None)

    def ntok(b: pd.DataFrame) -> pd.DataFrame:
        n = (b[token_col] if token_col is not None
             else b[text_col].str.split().str.len())
        return pd.DataFrame({
            id_col: b[id_col].astype("int64"),
            group_col: b[group_col],
            "n_tok": n.astype("int64"),
        })

    slim = docs.map_batches(ntok, batch_format="pandas")

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        if id_col not in g.columns or not len(g):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 group_col: pd.Series(dtype="object"),
                                 "n_tok": pd.Series(dtype="int64"),
                                 "cum_tok": pd.Series(dtype="int64")})
        g = g.sort_values([group_col, id_col], kind="mergesort").copy()
        # dropna=False: a NULL group is one group (SQL PARTITION BY
        # semantics) — pandas' default drops its rows, leaving NaN
        # cumsums that crash the int cast
        g["cum_tok"] = (g.groupby(group_col, dropna=False)["n_tok"]
                        .cumsum().astype("int64"))
        if budget_map is None:
            lim = budget
        else:
            lim = g[group_col].map(
                lambda s: budget_map.get(_norm_group_key(s), -1))
        return g.loc[g["cum_tok"] <= lim,
                     [id_col, group_col, "n_tok", "cum_tok"]]

    return exchange_map_partitions(slim, group_col, pick, n_partitions)


def temperature_mix_select(
    docs: "object",
    scale: int = 1000,
    alpha_pm: int = 500,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_partitions: "int | None" = None,
    token_col: "str | None" = None,
) -> "object":
    """Temperature-weighted mixture selection — the GPT-3/PaLM-style
    data-mixing rule ``quota_g ∝ tokens_g^alpha`` (alpha < 1 upweights
    small sources relative to proportional sampling): per-group budget
    ``floor(scale * tot_g^(alpha_pm/1000))``, then the deterministic
    id-order prefix selection of :func:`budget_select_per_group`.

    The corpus text is tokenized ONCE: the str.split pass reduces each
    row to a (id, group, n_tok) metadata table which is materialized
    (it has two consumers — ~24 bytes/row in the object store,
    spillable, vs re-reading and re-splitting the full text) and feeds
    both the per-group totals aggregate (histogram-sized exchange,
    budgets computed on the driver) and the metadata-only selection
    pass.  Exponentiation is IEEE double
    ``pow`` on both sides (DuckDB ``power(tot, alpha)`` and numpy
    ``tot ** alpha`` are the same correctly-rounded operation on the
    same inputs), and the budget is floored to an exact BIGINT before
    any comparison, so the value check is bit-exact.  ``alpha_pm`` is
    the exponent in permille (500 = sqrt)."""
    from ocr_ray.stages.aggregate import hash_aggregate

    def ntok(b: pd.DataFrame) -> pd.DataFrame:
        n = (b[token_col] if token_col is not None
             else b[text_col].str.split().str.len())
        return pd.DataFrame({
            id_col: b[id_col].astype("int64"),
            group_col: b[group_col],
            "n_tok": n.astype("int64"),
        })

    slim = docs.map_batches(ntok, batch_format="pandas").materialize()
    totals = hash_aggregate(
        slim, keys=[group_col], aggs={"n_tok": "sum"},
        n_partitions=n_partitions,
    ).to_pandas()
    budgets = {}
    if group_col in totals.columns:
        for g, tot in zip(totals[group_col], totals["n_tok"]):
            budgets[_norm_group_key(g)] = int(
                np.floor(scale * float(int(tot)) ** (alpha_pm / 1000.0)))
    return budget_select_per_group(
        slim, budgets, group_col=group_col, id_col=id_col,
        n_partitions=n_partitions, token_col="n_tok")


def winsorized_group_stats(
    docs: "object",
    group_col: str = "source",
    lo: float = 0.05,
    hi: float = 0.95,
    text_col: str = "text",
    n_partitions: "int | None" = None,
) -> pd.DataFrame:
    """Per-group winsorized token statistics — the robust-stats corpus
    report (outlier-insensitive size accounting per feed): clamp each
    doc's whitespace-token count into the group's own
    [``lo``-quantile, ``hi``-quantile] band (PERCENTILE_DISC, exact
    integers) and report raw vs clamped sums.

    Same two-pass, shuffle-free plan as :func:`grouped_quantile_gate`:
    pass 1 reduces the corpus to a (group, n_tok) COUNT HISTOGRAM via
    the bounded hash exchange; both thresholds are read off the
    cumulative histogram (rank ``ceil(q*n)``, PERCENTILE_DISC
    semantics, computed as INTEGER ceil over permille — ``(n*q_pm +
    999) // 1000`` — because IEEE ``ceil(q*n)`` and DuckDB's
    decimal-literal arithmetic disagree when ``q*n`` lands on an
    integer, e.g. float ``0.07*100 = 7.000000000000001`` so a float
    ceil reads rank 8 where the exact rank is 7; ``lo``/``hi`` must be
    permille-representable); pass 2 re-streams partial integer
    sums of the clamped values per group into a tiny final aggregate.
    All-integer output — the value check is bit-exact.  Output
    ``(group, n_docs, lo_thr, hi_thr, sum_tok, sum_tok_winsor)``."""
    import numpy as np
    import ray

    from ocr_ray.stages.aggregate import hash_aggregate

    lo_pm, hi_pm = _q_permille(lo), _q_permille(hi)
    if lo_pm > hi_pm:
        raise ValueError(f"need lo <= hi: {lo}, {hi}")

    def scores(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            group_col: b[group_col],
            "n_tok": b[text_col].str.split().str.len().astype("int64"),
        })

    hist = hash_aggregate(
        docs.map_batches(scores, batch_format="pandas"),
        keys=[group_col, "n_tok"], aggs={"cnt": "count"},
        n_partitions=n_partitions,
    ).to_pandas()
    if group_col not in hist.columns or not len(hist):
        return pd.DataFrame({group_col: pd.Series(dtype="object"),
                             "n_docs": pd.Series(dtype="int64"),
                             "lo_thr": pd.Series(dtype="int64"),
                             "hi_thr": pd.Series(dtype="int64"),
                             "sum_tok": pd.Series(dtype="int64"),
                             "sum_tok_winsor": pd.Series(dtype="int64")})

    thr = {}
    for g, sub in hist.groupby(group_col, sort=False, dropna=False):
        sub = sub.sort_values("n_tok")
        cum = sub["cnt"].to_numpy(dtype="int64").cumsum()
        vals = sub["n_tok"].to_numpy(dtype="int64")
        n = int(cum[-1])

        def pick(q_pm: int) -> int:
            return int(vals[int(np.searchsorted(
                cum, _disc_rank(n, q_pm), side="left"))])

        thr[_norm_group_key(g)] = (pick(lo_pm), pick(hi_pm))
    thr_ref = ray.put(thr)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(thr_ref)
        n = b[text_col].str.split().str.len().astype("int64")
        lo_t = b[group_col].map(
            lambda s: t[_norm_group_key(s)][0]).astype("int64")
        hi_t = b[group_col].map(
            lambda s: t[_norm_group_key(s)][1]).astype("int64")
        return pd.DataFrame({
            group_col: b[group_col],
            "n_docs": np.int64(1),
            "sum_tok": n,
            "sum_tok_winsor": n.clip(lower=lo_t, upper=hi_t),
        }).groupby(group_col, as_index=False, dropna=False).sum()

    out = hash_aggregate(
        docs.map_batches(partial, batch_format="pandas"),
        keys=[group_col],
        aggs={"n_docs": "sum", "sum_tok": "sum", "sum_tok_winsor": "sum"},
        n_partitions=n_partitions,
    ).to_pandas()
    for c in ("n_docs", "sum_tok", "sum_tok_winsor"):
        out[c] = out[c].astype("int64")
    t = thr
    out["lo_thr"] = out[group_col].map(
        lambda s: t[_norm_group_key(s)][0]).astype("int64")
    out["hi_thr"] = out[group_col].map(
        lambda s: t[_norm_group_key(s)][1]).astype("int64")
    return out[[group_col, "n_docs", "lo_thr", "hi_thr",
                "sum_tok", "sum_tok_winsor"]]
