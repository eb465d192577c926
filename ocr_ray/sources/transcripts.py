"""Deterministic synthetic transcript tables (the engine's canonical input).

Schema per ``BASELINE.json.input_hint``:
  conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
  ts:timestamp[us]

Each turn's ``text`` payload is one of the kinds in FIXTURES.md §1 (plain /
markup / wrapped / noisy / boxed / entity-rich / tabular / empty / error /
oversized).  Generation is pure per-conversation (``make_conv``), keyed by
``(seed, conv_idx)``, so shards can be produced in parallel and any subset
regenerated bit-identically.

Alongside the input the generator emits an *oracle* table with the expected
extraction results per turn — derived from the generator's knowledge of the
embedded main content (never by running the extractor), per FIXTURES.md §2.
Row order inside each shard is shuffled so pipeline tests prove the
(conv_id, turn_idx) ordering shuffle.
"""

from __future__ import annotations

import hashlib
import json
import os
import random
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ocr_ray.functions.textops import clean_extracted_text

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

ORACLE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("kind", pa.string()),
        ("expected_extracted", pa.string()),
        ("expected_clean", pa.string()),
    ]
)

# max chars per turn before truncation (M6 analog) — imported from the
# config so the golden oracle truncates at the SAME cap the engine uses
# (an independent constant here would silently diverge if the config
# knob were tuned); same single-source rationale as ERROR_TEXT below
from ocr_ray.config import DEFAULT_CONFIG as _CFG  # noqa: E402

PAYLOAD_CAP = _CFG.payload_cap
# single source of truth for the in-band error sentinel (C2 parity): the
# generator oracle and the extractor MUST emit byte-identical strings
from ocr_ray.stages.extract import ERROR_TEXT  # noqa: E402

_WORDS = (
    "system pipeline extract transform stream batch shuffle partition arrow "
    "table column schema worker actor block record payload segment classify "
    "order merge window value metric quality result engine layout content "
    "report analysis section detail summary context answer question token"
).split()

_KINDS = [
    ("plain", 0.28),
    ("markup", 0.20),
    ("wrapped", 0.12),
    ("noisy", 0.10),
    ("boxed", 0.08),
    ("entity", 0.08),
    ("tabular", 0.06),
    ("empty", 0.03),
    ("error", 0.03),
    ("oversized", 0.02),
]
_KIND_NAMES = [k for k, _ in _KINDS]
_KIND_CUM = np.cumsum([w for _, w in _KINDS])

_BASE_TS_US = 1_700_000_000_000_000  # fixed epoch base


def _prose(rng: random.Random, n_words: int) -> str:
    out = []
    for i in range(n_words):
        w = rng.choice(_WORDS)
        if i == 0 or (out and out[-1].endswith(".")):
            w = w.capitalize()
        if rng.random() < 0.1 and i > 2:
            w += "."
        out.append(w)
    s = " ".join(out)
    if not s.endswith("."):
        s += "."
    return s


def _sentence_words(rng: random.Random, lo: int, hi: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(rng.randint(lo, hi)))


# ---------------------------------------------------------------- payloads
def _payload_plain(rng: random.Random) -> Tuple[str, str]:
    text = _prose(rng, rng.randint(8, 120))
    return text, text


def _payload_markup(rng: random.Random) -> Tuple[str, str]:
    """HTML-ish page with nav/footer/script boilerplate around known content."""
    heading = _sentence_words(rng, 3, 6).title()
    paras = [_prose(rng, rng.randint(10, 60)) for _ in range(rng.randint(1, 4))]
    # escape &, <-free content; sprinkle entities the extractor must unescape
    esc_paras = [p.replace("&", "&amp;") for p in paras]
    if rng.random() < 0.5:
        esc_paras[0] = esc_paras[0].replace(" ", "&#32;", 1)
    nav_items = "".join(
        f'<li><a href="/{rng.choice(_WORDS)}">{rng.choice(_WORDS).title()}</a></li>'
        for _ in range(rng.randint(2, 5))
    )
    body_paras = "".join(f"<p>{p}</p>" for p in esc_paras)
    sidebar = f'<div class="sidebar"><a href="/x">{rng.choice(_WORDS)}</a> promo</div>'
    payload = (
        "<html><head>"
        f"<style>.x{{color:red}}</style><script>var t={rng.randint(0, 99)};</script>"
        "</head><body>"
        f'<nav><ul>{nav_items}</ul></nav>'
        f'<div class="content"><h1>{heading}</h1>{body_paras}</div>'
        f"{sidebar}"
        f'<div class="footer">Copyright &copy; {rng.randint(2019, 2025)} example</div>'
        "</body></html>"
    )
    expected = "\n".join([heading] + paras)
    return payload, expected


def _payload_wrapped(rng: random.Random) -> Tuple[str, str]:
    """Hard-wrapped prose with hyphen splits; expected is the unwrapped text."""
    text = _prose(rng, rng.randint(40, 150))
    words = text.split()
    lines: List[str] = []
    cur = ""
    for w in words:
        if len(cur) + len(w) + 1 > 72 and cur:
            if len(w) > 8 and rng.random() < 0.3:
                cut = rng.randint(3, len(w) - 3)
                head, tail = w[:cut], w[cut:]
                if head[-1].isalnum() and tail[0].isalnum():
                    lines.append((cur + " " + head + "-").strip())
                    cur = tail
                    continue
            lines.append(cur)
            cur = w
        else:
            cur = (cur + " " + w).strip()
    if cur:
        lines.append(cur)
    return "\n".join(lines), text


def _payload_noisy(rng: random.Random) -> Tuple[str, str]:
    base = _prose(rng, rng.randint(10, 60))
    noisy = []
    for ch in base:
        noisy.append(ch)
        r = rng.random()
        if r < 0.02:
            noisy.append(rng.choice(["\x00", "\x07", "\x1b", "​", "‍"]))
        elif r < 0.04:
            noisy.append(rng.choice(["é", "→", "•", "✓"]))
        elif r < 0.06:
            noisy.append(" " * rng.randint(1, 4))
    raw = "".join(noisy)
    if rng.random() < 0.4:
        raw += "\n" * rng.randint(3, 6) + _prose(rng, 8)
    expected = raw.replace("​", "").replace("‍", "")  # normalize strips zero-width
    return raw, expected


def _payload_boxed(rng: random.Random) -> Tuple[str, str]:
    """Serialized pseudo-layout boxes; expected is the line-grouped page text."""
    height = rng.choice([400, 800, 1200])
    n_lines = rng.randint(1, 8)
    y = 40.0
    boxes = []
    expected_lines = []
    for li in range(n_lines):
        n_words = rng.randint(1, 6)
        xs = sorted(rng.sample(range(40, 560), n_words))
        line_words = [rng.choice(_WORDS) for _ in range(n_words)]
        for x, w in zip(xs, line_words):
            boxes.append(
                {
                    "x0": float(x),
                    "y0": round(y, 1),
                    "x1": float(x + 8 * len(w)),
                    "y1": round(y + 12.0, 1),
                    "text": w,
                    "conf": round(rng.uniform(0.5, 0.99), 2),
                }
            )
        expected_lines.append(" ".join(line_words))
        y += rng.uniform(35, 80)  # > tolerance: distinct lines
    rng.shuffle(boxes)
    payload = json.dumps({"page_height": height, "boxes": boxes})
    return payload, "\n".join(expected_lines)


def _payload_entity(rng: random.Random) -> Tuple[str, str]:
    name = rng.choice(["alice", "bob", "carol", "dave"])
    text = (
        f"{_prose(rng, rng.randint(5, 20))} Contact {name}.{rng.choice(_WORDS)}@example.com "
        f"or +1 (555) {rng.randint(100, 999)}-{rng.randint(1000, 9999)} "
        f"by {rng.randint(1, 12)}/{rng.randint(1, 28)}/{rng.randint(2020, 2025)} "
        f"see https://docs.example.com/{rng.choice(_WORDS)} {_prose(rng, rng.randint(5, 15))}"
    )
    return text, text


def _payload_tabular(rng: random.Random) -> Tuple[str, str]:
    cols = rng.randint(2, 4)
    rows = rng.randint(2, 6)
    header = " | ".join(rng.choice(_WORDS) for _ in range(cols))
    lines = [header, "-" * len(header)]
    for _ in range(rows):
        lines.append(" | ".join(str(rng.randint(0, 999)) for _ in range(cols)))
    text = "\n".join(lines)
    return text, text


def _payload_error(rng: random.Random) -> Tuple[str, str]:
    # boxed-looking but unparseable -> extractor fallback ladder exhausts
    payload = '{"page_height": 800, "boxes": [{"x0": 1, "corrupt...'
    return payload, ERROR_TEXT


def _payload_oversized(rng: random.Random) -> Tuple[str, str]:
    text = _prose(rng, 9000)  # well over PAYLOAD_CAP chars
    truncated = text[:PAYLOAD_CAP]
    return text, truncated


_BUILDERS = {
    "plain": _payload_plain,
    "markup": _payload_markup,
    "wrapped": _payload_wrapped,
    "noisy": _payload_noisy,
    "boxed": _payload_boxed,
    "entity": _payload_entity,
    "tabular": _payload_tabular,
    "empty": lambda rng: ("", ""),
    "error": _payload_error,
    "oversized": _payload_oversized,
}


# ---------------------------------------------------------------- conv builder
def _conv_len(rng: random.Random, mean: float = 12.0, cap: int = 400) -> int:
    # heavy-tailed (approx Zipf-ish) conversation lengths
    u = max(rng.random(), 1e-9)
    n = int(2 + mean * (u ** -0.6 - 1.0) / 1.5)
    return max(2, min(n, cap))


def make_conv(
    conv_idx: int,
    seed: int = 42,
    n_turns_override: int | None = None,
) -> Tuple[List[Dict], List[Dict]]:
    """Build one conversation deterministically; returns (turns, oracle_rows)."""
    key = hashlib.sha256(f"{seed}:{conv_idx}".encode()).digest()
    rng = random.Random(int.from_bytes(key[:8], "big"))
    conv_id = f"conv-{conv_idx:08d}"
    n_turns = n_turns_override if n_turns_override is not None else _conv_len(rng)
    conv_ts0 = _BASE_TS_US + conv_idx * 3_600_000_000

    turns: List[Dict] = []
    oracle: List[Dict] = []
    for t in range(n_turns):
        r = rng.random()
        kind = _KIND_NAMES[int(np.searchsorted(_KIND_CUM, r))]
        payload, expected = _BUILDERS[kind](rng)
        if t == 0 and rng.random() < 0.2:
            role = "system"
        elif kind == "boxed" or (rng.random() < 0.1 and t > 0):
            role = "tool"
        else:
            role = "user" if t % 2 == 0 else "assistant"
        tool = rng.choice(["search", "browser", "calculator", "reader"]) if role == "tool" else ""
        turns.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": payload,
                "tool": tool,
                "ts": conv_ts0 + t * 7_000_000,
            }
        )
        oracle.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "kind": kind,
                "expected_extracted": expected,
                "expected_clean": clean_extracted_text(expected),
            }
        )
    return turns, oracle


def _rows_to_tables(turns: List[Dict], oracle: List[Dict]) -> Tuple[pa.Table, pa.Table]:
    t = pa.Table.from_pylist(turns, schema=TRANSCRIPT_SCHEMA)
    o = pa.Table.from_pylist(oracle, schema=ORACLE_SCHEMA)
    return t, o


def generate_transcripts(
    out_dir: str,
    n_convs: int = 100,
    seed: int = 42,
    n_shards: int = 8,
    mega_share: float = 0.0,
    with_oracle: bool = True,
    force: bool = False,
    parallel: bool = False,
) -> str:
    """Write ``out_dir/transcripts/shard-XXXXX.parquet`` (+ ``oracle/``).

    Shard s holds conversations with ``conv_idx % n_shards == s``; rows are
    shuffled within each shard.  ``mega_share`` > 0 grows conversation 0 to
    roughly that share of all turns (skew testing).  Idempotent: if the
    marker file exists with matching params, generation is skipped.
    """
    if not 0.0 <= mega_share < 1.0:
        raise ValueError(f"mega_share must be in [0, 1), got {mega_share}")
    if mega_share > 0 and n_convs < 2:
        raise ValueError(
            "mega_share needs n_convs >= 2: the mega conversation is sized "
            "from the average length of the OTHER conversations")
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_GENERATED.json")
    params = {
        "n_convs": n_convs,
        "seed": seed,
        "n_shards": n_shards,
        "mega_share": mega_share,
        "with_oracle": with_oracle,
        "version": 3,
    }
    if not force and os.path.exists(marker):
        try:
            if json.load(open(marker)) == params:
                return out_dir
        except Exception:
            pass

    tdir = os.path.join(out_dir, "transcripts")
    odir = os.path.join(out_dir, "oracle")
    os.makedirs(tdir, exist_ok=True)
    if with_oracle:
        os.makedirs(odir, exist_ok=True)
    # regenerating: invalidate the marker BEFORE any destructive step — a
    # crash between the shard clear and the rewrite must leave a dir that
    # FAILS the marker check on the next call (a stale marker matching the
    # previous params would validate the gutted directory as complete)
    if os.path.exists(marker):
        os.remove(marker)
    # then clear stale shard files — a shrink of n_shards would otherwise
    # leave old shard-0000N.parquet files that readers union with the new
    # layout (duplicated conversations), and the refreshed marker would
    # make the corruption permanent
    import glob as _glob

    for d in (tdir, odir):
        if os.path.isdir(d):
            for f in _glob.glob(os.path.join(d, "*.parquet")):
                os.remove(f)

    mega_turns = 0
    if mega_share > 0:
        # estimate average turns to size the mega conversation — length
        # only (same rng seeding as make_conv, whose first draw is
        # _conv_len; equivalence pinned by test), not a full payload
        # build of 49 conversations that _write_shard then regenerates
        def _len_of(i: int) -> int:
            key = hashlib.sha256(f"{seed}:{i}".encode()).digest()
            return _conv_len(random.Random(int.from_bytes(key[:8], "big")))

        probe = sum(_len_of(i) for i in range(1, min(50, n_convs)))
        avg = probe / max(1, min(50, n_convs) - 1)
        normal_total = avg * (n_convs - 1)
        mega_turns = int(mega_share * normal_total / (1 - mega_share))

    if parallel:
        import ray

        shard_fn = ray.remote(_write_shard)
        ray.get(
            [
                shard_fn.remote(
                    s, n_convs, n_shards, seed, mega_turns, tdir,
                    odir if with_oracle else None,
                )
                for s in range(n_shards)
            ]
        )
    else:
        for s in range(n_shards):
            _write_shard(
                s, n_convs, n_shards, seed, mega_turns, tdir,
                odir if with_oracle else None,
            )

    with open(marker, "w") as f:
        json.dump(params, f)
    return out_dir


def _write_shard(
    s: int,
    n_convs: int,
    n_shards: int,
    seed: int,
    mega_turns: int,
    tdir: str,
    odir: str | None,
) -> None:
    turns: List[Dict] = []
    oracle: List[Dict] = []
    for conv_idx in range(s, n_convs, n_shards):
        override = mega_turns if (conv_idx == 0 and mega_turns > 0) else None
        t, o = make_conv(conv_idx, seed, n_turns_override=override)
        turns.extend(t)
        oracle.extend(o)
    rng = random.Random(seed * 1000 + s)
    order = list(range(len(turns)))
    rng.shuffle(order)
    turns = [turns[i] for i in order]
    tt, ot = _rows_to_tables(turns, oracle)
    pq.write_table(tt, os.path.join(tdir, f"shard-{s:05d}.parquet"))
    if odir is not None:
        pq.write_table(ot, os.path.join(odir, f"shard-{s:05d}.parquet"))
