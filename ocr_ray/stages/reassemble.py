"""Stage 4 — conversation reassembly (L1/L4 analog): the one all-to-all.

Restores stable turn ordering per conversation and joins turns into a
single conversation document (page-concat analog,
``ocr_app/ui/cli.py:163-168``).  Ordering is explicit — Ray Data does not
guarantee row order through shuffles — so turns sort by ``turn_idx`` before
joining.

Skew handling (SURVEY §4): conversation length is heavy-tailed, so phase 1
exchanges on the *salted* key ``hash(conv_id) + turn_idx // salt_span`` and
assembles contiguous sub-ranges; phase 2 concatenates the (few) sub-range
rows per conversation in salt order.  Valid because joining a contiguous
turn range with a fixed separator is associative under turn ordering.  A
mega-conversation's sub-ranges land in *different* phase-1 partitions, so no
single task ever holds more than ``salt_span`` of its turns.

Shuffle mechanics — an explicit two-stage hash exchange over raw Ray tasks
(the SURVEY §2 "last resort" tier, justified by measurement at 1.27M turns /
2.9 GB on 32 CPUs):

* ``Dataset.groupby(key).map_groups``: 240 s keyed by conv_id (100k distinct
  keys), 49 s keyed by a bounded partition id — the sort-based shuffle
  dominates either way (``sort(conv_id)`` alone: 72 s).
* this exchange: split each input block by partition id into *compacted*
  Arrow sub-tables (``combine_chunks`` — a zero-copy slice would serialize
  its entire parent buffer, re-shipping every block P times), one reduce
  task per partition concatenates its pieces and assembles vectorized:
  ~10 s end-to-end.

Partitioning assumption: all rows of one (conv_id, salt) pair meet in one
phase-1 partition and all parts of one conv_id in one phase-2 partition —
guaranteed by the deterministic hash.  ``n_partitions`` bounds per-task
memory: size so total_bytes / n_partitions fits a worker heap.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ocr_ray.config import DEFAULT_CONFIG, PipelineConfig

_SEP = "\n\n"
_COLS = ["conv_id", "turn_idx", "role", "clean_text"]


def _split_table(t: pa.Table, pk: np.ndarray, n_partitions: int) -> Tuple[pa.Table, ...]:
    """Split an Arrow table into compacted per-partition sub-tables."""
    order = np.argsort(pk, kind="stable")
    sorted_t = t.take(order)
    spk = pk[order]
    bounds = np.searchsorted(spk, np.arange(n_partitions + 1))
    return tuple(
        sorted_t.slice(bounds[j], bounds[j + 1] - bounds[j]).combine_chunks()
        for j in range(n_partitions)
    )


@ray.remote(num_cpus=0)
def _split_turns(n_partitions: int, span: int, *parts) -> Tuple[pa.Table, ...]:
    tables = []
    for t in parts:
        if isinstance(t, pd.DataFrame):  # internal refs may hold pandas blocks
            t = pa.Table.from_pandas(t, preserve_index=False)
        tables.append(t.select(_COLS))
    t = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
    for c in _COLS:
        nc = t[c].null_count
        if nc:
            # fail LOUDLY at the exchange entry: a null conv_id breaks
            # the zero-copy dictionary-code grouping (ArrowInvalid), a
            # null turn_idx would NaN-cast into salt INT_MIN and
            # silently misorder the conversation, and a null role/
            # clean_text would null the ENTIRE conversation's text via
            # binary_join's null propagation
            raise ValueError(
                f"assemble_conversations: column '{c}' carries {nc} "
                f"null(s); the turn exchange requires non-null keys and "
                f"text — filter or fill nulls upstream")
    salt = (t["turn_idx"].to_numpy() // span).astype(np.int32)
    h = pd.util.hash_pandas_object(t["conv_id"].to_pandas(), index=False).to_numpy()
    pk = ((h + salt.astype(np.uint64)) % n_partitions).astype(np.int32)
    return _split_table(t.append_column("salt", pa.array(salt)), pk, n_partitions)


def _as_array(col) -> pa.Array:
    """Flatten a (possibly chunked) column to a single pa.Array."""
    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks == 0:
            return pa.array([], type=col.type)
        if col.num_chunks == 1:
            return col.chunk(0)
        return pa.concat_arrays(col.chunks)
    return col


def _group_offsets(*key_arrays: np.ndarray) -> np.ndarray:
    """Offsets of consecutive-equal-key runs over pre-sorted key arrays."""
    n = len(key_arrays[0])
    if n == 0:
        return np.array([0], dtype=np.int64)
    change = np.zeros(n - 1, dtype=bool)
    for k in key_arrays:
        change |= k[1:] != k[:-1]
    return np.concatenate(([0], np.nonzero(change)[0] + 1, [n]))


def _join_groups(fmt: pa.Array, offsets: np.ndarray) -> pa.Array:
    la = pa.ListArray.from_arrays(pa.array(offsets, pa.int64()).cast(pa.int32()), fmt)
    return pa.compute.binary_join(la, _SEP)


@ray.remote(num_cpus=0)
def _assemble_parts(*pieces: pa.Table) -> pa.Table:
    """Per-partition phase 1: join each (conv_id, salt) sub-range in
    turn_idx order.  Pure Arrow kernels (sort_by / binary_join) — no Python
    string objects are ever created."""
    import pyarrow.compute as pc

    t = pa.concat_tables(pieces)
    st = t.sort_by(
        [("conv_id", "ascending"), ("salt", "ascending"), ("turn_idx", "ascending")]
    )
    fmt = _as_array(
        pc.binary_join_element_wise(
            "[", _as_array(st["role"]), "] ", _as_array(st["clean_text"]), ""
        )
    )
    conv_codes = _as_array(st["conv_id"]).dictionary_encode().indices.to_numpy()
    salts = st["salt"].to_numpy()
    off = _group_offsets(conv_codes, salts)
    starts = pa.array(off[:-1])
    return pa.table(
        {
            "conv_id": _as_array(st["conv_id"]).take(starts),
            "salt": _as_array(st["salt"]).take(starts),
            "n_turns": pa.array(np.diff(off).astype(np.int64)),
            "part_text": _join_groups(fmt, off),
        }
    )


@ray.remote(num_cpus=0)
def _split_parts(t: pa.Table, n_partitions: int) -> Tuple[pa.Table, ...]:
    h = pd.util.hash_pandas_object(t["conv_id"].to_pandas(), index=False).to_numpy()
    return _split_table(t, (h % n_partitions).astype(np.int32), n_partitions)


@ray.remote(num_cpus=0)
def _assemble_final(*pieces: pa.Table) -> pa.Table:
    """Per-partition phase 2: concatenate sub-ranges in salt order (pure
    Arrow, as in phase 1)."""
    t = pa.concat_tables(pieces)
    st = t.sort_by([("conv_id", "ascending"), ("salt", "ascending")])
    conv_codes = _as_array(st["conv_id"]).dictionary_encode().indices.to_numpy()
    off = _group_offsets(conv_codes)
    starts = off[:-1]
    if len(starts):
        n_turns = np.add.reduceat(st["n_turns"].to_numpy(), starts).astype(np.int64)
    else:
        n_turns = np.array([], dtype=np.int64)
    return pa.table(
        {
            "conv_id": _as_array(st["conv_id"]).take(pa.array(starts)),
            "n_turns": pa.array(n_turns),
            "conv_text": _join_groups(_as_array(st["part_text"]), off),
        }
    )


def assemble_conversations(
    turns: "ray.data.Dataset",
    config: PipelineConfig = DEFAULT_CONFIG,
    n_partitions: int | None = None,
) -> "ray.data.Dataset":
    """turns (conv_id, turn_idx, role, clean_text, ...) -> one row per conv.

    STREAMING phase-1 split: upstream blocks are consumed via
    ``iter_internal_ref_bundles()`` and salted split tasks launch as each
    bundle materializes — the exchange's map side overlaps the extract
    stage instead of waiting behind a full ``materialize()`` barrier (at
    100 TB that barrier is a whole-dataset object-store round-trip).
    Consecutive tiny blocks are bundled to ``min_rows`` per split task so
    tiny-block inputs don't ship blocks x partitions near-empty objects.

    ``n_partitions`` defaults to an already-materialized input's
    size-based estimate (~64 MB per reduce partition) and to
    ``config.reassemble_partitions`` for a streaming input — at
    production scale pass it explicitly (total_bytes / worker-heap
    budget)."""
    span = config.salt_span
    if n_partitions is None:
        # the shared sizing policy (join.resolve_partitions — lifted from
        # this function in round 3 and since extended with lazy-input size
        # estimation and the CPU-aware floor); config.reassemble_partitions
        # remains the fallback when no estimate exists
        from ocr_ray.stages.join import resolve_partitions

        n_partitions = resolve_partitions(
            turns, None, default=config.reassemble_partitions)
    # num_returns=1 would hand back a bare ObjectRef (not a 1-list) and the
    # per-partition indexing below would TypeError — floor at 2
    n_partitions = max(2, n_partitions)

    min_rows = 32768
    splits: List = []
    pending: List = []
    pending_rows = 0
    for bundle in turns.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                pending.append(ref)
                pending_rows += meta.num_rows
                if pending_rows >= min_rows:
                    splits.append(
                        _split_turns.options(num_returns=n_partitions).remote(
                            n_partitions, span, *pending
                        )
                    )
                    pending, pending_rows = [], 0
    if pending:
        splits.append(
            _split_turns.options(num_returns=n_partitions).remote(
                n_partitions, span, *pending
            )
        )
    if not splits:  # no counted block was appended => zero rows total
        # preserve the INPUT's conv_id type in the typed-empty result: a
        # hardcoded string here would schema-mismatch the non-empty
        # outputs of sibling calls under int64 conv_ids
        cid_type = pa.string()
        try:
            f = turns.schema().base_schema.field("conv_id")
            cid_type = f.type
        except Exception:
            try:
                cid_type = turns.schema().field("conv_id").type
            except Exception:
                pass  # schema unavailable (fully consumed lazy input)
        return ray.data.from_arrow(
            pa.table(
                {
                    "conv_id": pa.array([], cid_type),
                    "n_turns": pa.array([], pa.int64()),
                    "conv_text": pa.array([], pa.string()),
                }
            )
        )
    part_refs = [
        _assemble_parts.remote(*[s[j] for s in splits]) for j in range(n_partitions)
    ]
    part_splits: List = [
        _split_parts.options(num_returns=n_partitions).remote(r, n_partitions)
        for r in part_refs
    ]
    conv_refs = [
        _assemble_final.remote(*[s[j] for s in part_splits])
        for j in range(n_partitions)
    ]
    return ray.data.from_arrow_refs(conv_refs)
