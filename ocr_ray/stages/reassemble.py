"""Stage 4 — conversation reassembly (L1/L4 analog): the one all-to-all.

Restores stable turn ordering per conversation and joins turns into a
single conversation document (page-concat analog,
``ocr_app/ui/cli.py:163-168``).  Ordering is explicit — Ray Data does not
guarantee row order through shuffles — so each group sorts by ``turn_idx``
before joining.

Skew handling (SURVEY §4): conversation length is heavy-tailed, so the
shuffle key is salted as ``(conv_id, turn_idx // salt_span)``.  Phase 1
reassembles contiguous sub-ranges; phase 2 concatenates the (few) sub-range
rows per conversation in salt order.  Valid because joining a contiguous
turn range with a fixed separator is associative under turn ordering.
"""

from __future__ import annotations

import pandas as pd

import ray.data

from ocr_ray.config import DEFAULT_CONFIG, PipelineConfig

_SEP = "\n\n"


def _format_turn(role: str, text: str) -> str:
    return f"[{role}] {text}"


def _assemble_part(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values("turn_idx")
    part = _SEP.join(_format_turn(r, t) for r, t in zip(g["role"], g["clean_text"]))
    return pd.DataFrame(
        {
            "conv_id": [g["conv_id"].iloc[0]],
            "salt": [g["salt"].iloc[0]],
            "n_turns": [len(g)],
            "part_text": [part],
        }
    )


def _assemble_final(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values("salt")
    return pd.DataFrame(
        {
            "conv_id": [g["conv_id"].iloc[0]],
            "n_turns": [int(g["n_turns"].sum())],
            "conv_text": [_SEP.join(g["part_text"])],
        }
    )


def assemble_conversations(
    turns: "ray.data.Dataset", config: PipelineConfig = DEFAULT_CONFIG
) -> "ray.data.Dataset":
    """turns (conv_id, turn_idx, role, clean_text, ...) -> one row per conv."""
    span = config.salt_span

    def add_salt(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["conv_id", "turn_idx", "role", "clean_text"]].copy()
        out["salt"] = (out["turn_idx"] // span).astype("int32")
        return out

    salted = turns.map_batches(add_salt, batch_format="pandas")
    parts = salted.groupby(["conv_id", "salt"]).map_groups(
        _assemble_part, batch_format="pandas"
    )
    return parts.groupby("conv_id").map_groups(_assemble_final, batch_format="pandas")
