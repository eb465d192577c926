"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship transcript-extraction pipeline on a small
deterministic synthetic transcript table; ``queries()`` exposes one callable
per implemented operator (SURVEY §2 / COVERAGE.md) over the sf parquet
tables; ``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible query.  Rows-only entries (each with a pytest covering its
semantics instead; pinned by tests/test_wave20.py::test_query_surface_contract):
ann_ivf / ann_lsh_topk (genuinely approximate — recall-vs-brute-force
pytests), rag_embed_answer / rag_model_answer (reference-verbatim
np.argsort tie order on heavily tied chunk sims — replica pytests; measured
150+ docs with exact top-rank ties, so no SQL ordering can match),
multimodal_transcribe (autoregressive generation — bit-exact replica
pytest), transcripts_model_rescore / transcripts_dpo_pairs (model-scored
transcript waves — replica pytests), embed_pca (eigendecomposition —
integer-sufficient-statistics replica pytest), dedup_minhash_est
(signature-estimated Jaccard — genuinely approximate; pair-set-agreement
and estimator-error pytest vs the exact oracle-checked path), and
transcripts_extract / transcripts_segments / transcripts_benchmark
(synthesized inputs; generator-oracle parity is pytest-checked AND the
per-turn equality invariant is driver-value-checked via
``transcripts_parity`` / ``transcripts_convs``, whose oracle SQL reads
the golden expected-output parquet the generator writes).
Everything else — including simhash (62-bit SQL-replicable polynomial
signatures), LSH buckets (sign projections), fingerprints, and the dedup
cluster components — is value-checked against DuckDB.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_SF_CONVS = {"sf0.001": 100, "sf0.01": 400, "sf0.1": 1500}


def _transcripts_for(sf_dir: str) -> str:
    """Deterministic synthetic transcripts sized to the sf tier (the
    transcript table is this engine's canonical input; TESTDATA tables don't
    include one, so it is synthesized per BASELINE.json.input_hint)."""
    from ocr_ray.sources.transcripts import generate_transcripts

    tier = os.path.basename(os.path.normpath(sf_dir))
    n_convs = _SF_CONVS.get(tier, 100)
    root = f"/tmp/graft_transcripts/{tier}-{n_convs}"
    generate_transcripts(root, n_convs=n_convs, seed=42, n_shards=8)
    return os.path.join(root, "transcripts")


def _q_transcripts_extract(sf_dir: str):
    from ocr_ray.pipelines.extract import build_turn_pipeline

    ds = build_turn_pipeline(_transcripts_for(sf_dir))
    return ds.select_columns(
        ["conv_id", "turn_idx", "role", "kind", "engine", "error", "extracted_text", "clean_text"]
    )


def _q_transcripts_segments(sf_dir: str):
    """Flat detected-segments table (rows-only): one row per segment with
    (conv_id, turn_idx, seg_idx, seg_kind, seg_text, conf)."""
    import pyarrow as pa

    from ocr_ray.pipelines.extract import build_turn_pipeline

    ds = build_turn_pipeline(_transcripts_for(sf_dir), emit_segments=True)

    def explode(t: pa.Table) -> pa.Table:
        import pandas as pd

        rows = {"conv_id": [], "turn_idx": [], "seg_idx": [], "seg_kind": [],
                "seg_text": [], "conf": []}
        for conv, ti, segs in zip(
            t["conv_id"].to_pylist(), t["turn_idx"].to_pylist(), t["segments"].to_pylist()
        ):
            for s in segs:
                rows["conv_id"].append(conv)
                rows["turn_idx"].append(ti)
                rows["seg_idx"].append(s["seg_idx"])
                rows["seg_kind"].append(s["kind"])
                rows["seg_text"].append(s["text"])
                rows["conf"].append(round(float(s["conf"]), 6))
        return pa.Table.from_pydict(rows)

    return ds.map_batches(explode, batch_format="pyarrow")


def _q_transcripts_benchmark(sf_dir: str):
    """Accuracy benchmark (src/ocr_benchmark.py analog, rows-only): every
    engine x layout mode over every turn, scored vs the generator oracle."""
    from ocr_ray.stages.benchmark import benchmark_engines

    tdir = _transcripts_for(sf_dir)
    odir = os.path.join(os.path.dirname(tdir), "oracle")
    return benchmark_engines(tdir, odir)


def _q_transcripts_convs(sf_dir: str):
    from ocr_ray.pipelines.extract import build_turn_pipeline
    from ocr_ray.stages.reassemble import assemble_conversations

    turns = build_turn_pipeline(_transcripts_for(sf_dir))
    return assemble_conversations(turns)


def _q_transcripts_parity(sf_dir: str):
    """Per-turn text-equality surface (the north_rule's core invariant,
    driver-value-checked): the flagship pipeline's extracted + cleaned
    text per (conv_id, turn_idx), compared against the golden
    expected-output table the deterministic generator wrote alongside the
    transcripts.  The oracle SQL reads that golden parquet directly, so
    the driver's hash compare IS the per-turn equality check."""
    from ocr_ray.pipelines.extract import build_turn_pipeline

    ds = build_turn_pipeline(_transcripts_for(sf_dir))
    return ds.select_columns(["conv_id", "turn_idx", "extracted_text", "clean_text"])


def _q_transcripts_mask(sf_dir: str):
    """Loss-mask accounting (the SFT trainer's assistant-only masking,
    applied per conversation): how many turns and cleaned characters per
    conversation are TRAINABLE (role == 'assistant') vs context.  A
    per-batch combiner reduces each block to per-conv partials before one
    bounded conv_id hash aggregate — raw turns never shuffle."""
    import numpy as np
    import pandas as pd

    from ocr_ray.pipelines.extract import build_turn_pipeline
    from ocr_ray.stages.aggregate import hash_aggregate

    turns = build_turn_pipeline(_transcripts_for(sf_dir))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        is_train = (b["role"] == "assistant").to_numpy()
        n = b["clean_text"].str.len().to_numpy(dtype="int64")
        return pd.DataFrame(
            {
                "conv_id": b["conv_id"],
                "n_turns": np.int64(1),
                "n_train_turns": is_train.astype("int64"),
                "train_chars": np.where(is_train, n, 0),
                "total_chars": n,
            }
        )

    out = hash_aggregate(
        turns.map_batches(partial, batch_format="pandas"),
        keys=["conv_id"],
        aggs={"n_turns": "sum", "n_train_turns": "sum",
              "train_chars": "sum", "total_chars": "sum"},
        n_partitions=None,
    )

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        for c in ("n_turns", "n_train_turns", "train_chars", "total_chars"):
            b[c] = b[c].astype("int64")
        return b

    return out.map_batches(cast, batch_format="pandas")


def _prompt_window(g):
    """Last-3-turns SFT prompt per row of a (conv-sorted) turn frame:
    ``[role] clean`` strings joined oldest-first by newlines, exactly
    DuckDB's ``concat_ws(chr(10), p3, p2, p1)`` (nulls form a prefix —
    shift(k) null implies shift(k+1) null — so each present part except
    the last carries its own separator).  Shared by transcripts_sft,
    pipeline_sft and the property test; returns a Series aligned to
    ``g.index``.  ``g`` must already be sorted by (conv_id, turn_idx)."""
    import numpy as np
    import pandas as pd

    fmt = "[" + g["role"] + "] " + g["clean_text"]
    by = fmt.groupby(g["conv_id"])
    p1, p2, p3 = by.shift(1), by.shift(2), by.shift(3)
    return pd.Series(
        np.where(p3.notna(), p3.fillna("") + "\n", "")
        + np.where(p2.notna(), p2.fillna("") + "\n", "")
        + p1.fillna(""),
        index=g.index,
    )


def _conv_turn_key(b):
    """Lexicographic ``conv_id:turn_idx`` composite (zero-padded so string
    order equals (conv_id, turn_idx) order) — the deterministic keep-first
    key shared by turn dedup and the SFT composite."""
    return b["conv_id"] + ":" + b["turn_idx"].astype("int64").map("{:06d}".format)


def _conv_turn_key_pa(t):
    """Arrow sibling of :func:`_conv_turn_key` — ``utf8_lpad`` zero-pads
    to the identical 6 digits for the (non-negative, contract-gated)
    turn indices."""
    import pyarrow as pa
    import pyarrow.compute as pc

    k = pc.binary_join_element_wise(
        t.column("conv_id"),
        pc.utf8_lpad(pc.cast(t.column("turn_idx"), pa.string()), 6, "0"),
        ":")
    return k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k


def _one_chunk(col):
    """One contiguous Array from a (possibly chunked) table column —
    required before ``dictionary_encode`` (per-chunk dictionaries are not
    comparable) and before numpy zero-copy views."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col


def _fmt_turns_pa(role, text):
    """``[role] text`` per row — one Arrow varargs-concat kernel, no
    object-dtype widening."""
    import pyarrow as pa
    import pyarrow.compute as pc

    f = pc.binary_join_element_wise("[", role, "] ", text, "")
    return f.combine_chunks() if isinstance(f, pa.ChunkedArray) else f


def _examples_pa(t, gate: bool = False, drop_empty: bool = False):
    """Arrow-native SFT example kernel over one conv-co-located partition
    (the pyarrow exchange sibling of the pandas ``_prompt_window`` path,
    which remains as the property-test reference): sort by (conv_id,
    turn_idx), optionally drop conversations with an adjacent same-role
    dialogue repeat (the alternation gate), then emit one (prompt,
    completion) row per assistant turn where prompt = up to 3 preceding
    ``[role] clean`` turns joined by newlines.

    Group-boundary logic runs on dictionary CODES (int32 numpy, zero
    string materialization); the window shift is ``take`` on shifted
    indices with group-start masking; the null-prefix parts join with
    ``binary_join_element_wise(..., null_handling="skip")`` — exactly
    DuckDB's ``concat_ws``.  ``p1`` is null-filled to "" first: pyarrow
    16's skip-join DROPS a row whose every part is null (output shorter
    than input!) rather than emitting "" — fill_null both restores the
    pandas ``p1.fillna("")`` semantics and keeps the kernel
    length-preserving."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    empty = pa.table({
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int64()),
        "prompt": pa.array([], pa.string()),
        "completion": pa.array([], pa.string()),
    })
    if not t.num_rows:
        return empty
    t = t.take(pc.sort_indices(t, sort_keys=[("conv_id", "ascending"),
                                             ("turn_idx", "ascending")]))
    if gate:
        conv = _one_chunk(t.column("conv_id"))
        role = _one_chunk(t.column("role"))
        cc = pc.dictionary_encode(conv).indices.to_numpy()
        rc = pc.dictionary_encode(role).indices.to_numpy()
        dmask = pc.is_in(role, value_set=pa.array(["user", "assistant"])
                         ).to_numpy(zero_copy_only=False)
        di = np.flatnonzero(dmask)
        if di.size > 1:
            same = (cc[di[1:]] == cc[di[:-1]]) & (rc[di[1:]] == rc[di[:-1]])
            bad = np.unique(cc[di[1:][same]])
            if bad.size:
                t = t.filter(pa.array(~np.isin(cc, bad)))
                if not t.num_rows:
                    return empty
    conv = _one_chunk(t.column("conv_id"))
    role = _one_chunk(t.column("role"))
    text = _one_chunk(t.column("clean_text"))
    cc = pc.dictionary_encode(conv).indices.to_numpy()
    n = t.num_rows
    newg = np.ones(n, dtype=bool)
    newg[1:] = cc[1:] != cc[:-1]
    idx = np.arange(n, dtype=np.int64)
    gstart = np.maximum.accumulate(np.where(newg, idx, 0))
    fmt = _fmt_turns_pa(role, text)
    parts = []
    for k in (3, 2, 1):
        src = idx - k
        valid = src >= gstart
        pk = fmt.take(pa.array(np.where(valid, src, 0), pa.int64()))
        pk = pc.if_else(pa.array(valid), pk, pa.scalar(None, pa.string()))
        parts.append(pk)
    parts[-1] = pc.fill_null(parts[-1], "")
    prompt = pc.binary_join_element_wise(*parts, "\n", null_handling="skip")
    keep = pc.equal(role, "assistant")
    if drop_empty:
        keep = pc.and_(keep, pc.not_equal(text, ""))
    out = pa.table({
        "conv_id": conv,
        "turn_idx": _one_chunk(pc.cast(t.column("turn_idx"), pa.int64())),
        "prompt": prompt,
        "completion": text,
    })
    return out.filter(keep)


def _conv_texts_pa(t, with_mutants: bool = False, id_name: str = "doc_id"):
    """Arrow-native conversation-text assembly over one conv-co-located
    partition: ``[role] clean`` turns in (conv_id, turn_idx) order joined
    by blank lines, one row per conversation with its int id parsed from
    the ``conv-%08d`` string (regex-guarded against format drift — an
    equivalent check to reconstructing the string, and it runs on the
    partition's DISTINCT conv values only).  ``with_mutants`` adds a
    second text per conversation missing its final turn, at id + 10M
    (the convdedup planted-positive construction).  Strings stay
    Arrow-packed end-to-end: per-conv join is ``group_by(...).aggregate
    ([("_fmt", "list")])`` + ``binary_join`` — no object-dtype pandas."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    empty = pa.table({id_name: pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    if not t.num_rows:
        return empty
    t = t.take(pc.sort_indices(t, sort_keys=[("conv_id", "ascending"),
                                             ("turn_idx", "ascending")]))
    conv = _one_chunk(t.column("conv_id"))
    uniq = pc.unique(conv)
    if not pc.all(pc.match_substring_regex(uniq, r"^conv-\d{8}$")).as_py():
        raise ValueError(
            "conv_id format drifted from 'conv-%08d' — the int id "
            "derivation (and, for mutants, the +10M id range; for "
            "decontaminate, the split hashing) would mis-bucket")
    fmt = _fmt_turns_pa(_one_chunk(t.column("role")),
                        _one_chunk(t.column("clean_text")))
    tb = pa.table({"conv_id": conv, "_fmt": fmt})

    def agg(src, id_offset=0):
        g = src.group_by("conv_id", use_threads=False).aggregate(
            [("_fmt", "list")])
        ids = pc.cast(pc.utf8_slice_codeunits(g.column("conv_id"), 5),
                      pa.int64())
        if id_offset:
            ids = pc.add_checked(ids, pa.scalar(id_offset, pa.int64()))
        return pa.table({id_name: _one_chunk(ids),
                         "text": _one_chunk(
                             pc.binary_join(g.column("_fmt_list"), "\n\n"))})

    out = [agg(tb)]
    if with_mutants:
        cc = pc.dictionary_encode(conv).indices.to_numpy()
        is_last = np.ones(len(cc), dtype=bool)
        is_last[:-1] = cc[1:] != cc[:-1]
        mt = tb.filter(pa.array(~is_last))
        if mt.num_rows:
            out.append(agg(mt, id_offset=10_000_000))
    return pa.concat_tables(out) if len(out) > 1 else out[0]


def _q_transcripts_toolstats(sf_dir: str):
    """Per-tool usage statistics over the raw transcript table (the agent
    telemetry rollup): call count, distinct conversations touched, and the
    exact sum of turn positions (kept integer — no float averaging — so
    the driver value-check is bit-exact).  Per-batch (tool, conv_id) pair
    dedup bounds the exchange to the distinct-pair table; one tool-keyed
    exchange finishes with an exact nunique."""
    import pandas as pd

    import ray.data as rd

    from ocr_ray.stages.join import exchange_map_partitions

    ds = rd.read_parquet(
        _transcripts_for(sf_dir),
        columns=["conv_id", "turn_idx", "role", "tool"],
    ).filter(expr="role == 'tool'")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(n=1, sum_turn_idx=b["turn_idx"].astype("int64"))
        return b.groupby(["tool", "conv_id"], as_index=False).agg(
            n=("n", "sum"), sum_turn_idx=("sum_turn_idx", "sum")
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("tool").agg(
            n_calls=("n", "sum"),
            n_convs=("conv_id", "nunique"),
            sum_turn_idx=("sum_turn_idx", "sum"),
        ).reset_index()
        for c in ("n_calls", "n_convs", "sum_turn_idx"):
            out[c] = out[c].astype("int64")
        return out

    return exchange_map_partitions(
        ds.map_batches(partial, batch_format="pandas"),
        ["tool"], combine, n_partitions=4,
    )


def _q_transcripts_alternation(sf_dir: str):
    """Role-sequence validation per conversation (the transcript-integrity
    gate an SFT pipeline runs before building examples): over the
    user/assistant dialogue subsequence in turn order, count adjacent
    same-role repeats (``n_breaks``); plus total turns, dialogue turns,
    and whether turn 0 is a system prompt.  One conv_id hash exchange;
    every per-conv statistic is a vectorized sort + groupby-shift inside
    the partition."""
    import numpy as np
    import pandas as pd

    import ray.data as rd

    from ocr_ray.stages.join import exchange_map_partitions

    ds = rd.read_parquet(
        _transcripts_for(sf_dir), columns=["conv_id", "turn_idx", "role"]
    )

    def stats(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "conv_id": pd.Series([], dtype="object"),
                "n_turns": pd.Series([], dtype="int64"),
                "n_dialogue": pd.Series([], dtype="int64"),
                "n_breaks": pd.Series([], dtype="int64"),
                "starts_system": pd.Series([], dtype="int64"),
            })
        g = g.sort_values(["conv_id", "turn_idx"], kind="stable")
        base = g.groupby("conv_id", as_index=False).agg(n_turns=("turn_idx", "size"))
        first = g[g["turn_idx"] == 0]
        base = base.merge(
            pd.DataFrame({
                "conv_id": first["conv_id"],
                "starts_system": (first["role"] == "system").astype("int64"),
            }),
            on="conv_id", how="left",
        )
        d = g[g["role"].isin(["user", "assistant"])].copy()
        if len(d):
            prev = d.groupby("conv_id")["role"].shift()
            d["brk"] = (d["role"] == prev).astype("int64")
            dia = d.groupby("conv_id", as_index=False).agg(
                n_dialogue=("role", "size"), n_breaks=("brk", "sum")
            )
            base = base.merge(dia, on="conv_id", how="left")
        else:
            base["n_dialogue"] = np.int64(0)
            base["n_breaks"] = np.int64(0)
        for c in ("n_turns", "n_dialogue", "n_breaks", "starts_system"):
            base[c] = base[c].fillna(0).astype("int64")
        return base

    return exchange_map_partitions(ds, "conv_id", stats, n_partitions=None)


def _q_transcripts_sft(sf_dir: str):
    """SFT example builder — the transform that turns extracted
    conversations into (prompt, completion) training rows: one example per
    assistant turn, prompt = up to the 3 preceding turns formatted
    ``[role] clean`` joined by newlines (the bounded context window),
    completion = the turn's cleaned text.  Runs the flagship extraction
    pipeline, then ONE conv_id hash exchange; the context join is the
    Arrow-native :func:`_examples_pa` kernel (dictionary-code group
    boundaries + take-shifted ``concat_ws`` — text never widens to
    object-dtype pandas through the exchange)."""
    from ocr_ray.pipelines.extract import build_turn_pipeline
    from ocr_ray.stages.join import exchange_map_partitions

    turns = build_turn_pipeline(_transcripts_for(sf_dir)).select_columns(
        ["conv_id", "turn_idx", "role", "clean_text"]
    )
    return exchange_map_partitions(turns, "conv_id", _examples_pa,
                                   n_partitions=None,
                                   batch_format="pyarrow")


def _q_transcripts_turn_dedup(sf_dir: str):
    """Cross-conversation duplicate assistant responses (templated-reply
    detection — the turn-granular exact dedup an SFT curation run applies
    before training): group non-empty assistant ``clean_text`` corpus-wide,
    emit (first_key, n_copies) for every response text occurring >= 2
    times, where first_key is the lexicographically first
    ``conv_id:turn_idx`` holder.  Texts are content-hashed per batch
    (vectorized sha256 prefix) so the exchange ships 16-byte keys +
    composite ids, never payloads; all rows of one hash co-locate, so
    min/sum are exact."""
    import pandas as pd

    from ocr_ray.pipelines.extract import build_turn_pipeline
    from ocr_ray.stages.aggregate import hash_aggregate

    turns = build_turn_pipeline(_transcripts_for(sf_dir)).select_columns(
        ["conv_id", "turn_idx", "role", "clean_text"]
    )

    def partial(t):
        import hashlib

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        mask = pc.and_(pc.equal(t.column("role"), "assistant"),
                       pc.not_equal(t.column("clean_text"), ""))
        t = t.filter(mask)
        if not t.num_rows:
            return pa.table({"content_hash": pa.array([], pa.string()),
                             "first_key": pa.array([], pa.string()),
                             "n_copies": pa.array([], pa.int64())})
        # sha256 is inherently per-string; everything else stays Arrow
        hashes = [hashlib.sha256(s.encode()).hexdigest()[:16]
                  for s in t.column("clean_text").to_pylist()]
        return pa.table({
            "content_hash": pa.array(hashes, pa.string()),
            "first_key": _conv_turn_key_pa(t),
            "n_copies": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })

    agg = hash_aggregate(
        turns.map_batches(partial, batch_format="pyarrow"),
        keys=["content_hash"],
        aggs={"first_key": "min", "n_copies": "sum"},
        n_partitions=None,
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["n_copies"] >= 2]
        return pd.DataFrame({
            "first_key": b["first_key"].astype("object"),
            "n_copies": b["n_copies"].astype("int64"),
        })

    return agg.map_batches(finish, batch_format="pandas")


def _q_transcripts_convdedup(sf_dir: str):
    """Conversation-level near-dup detection — MinHash+LSH over ASSEMBLED
    conversation texts (the whole-dialogue dedup an SFT curation run needs:
    re-rolled sessions, retried agent runs and copy-pasted dialogues differ
    by a turn or two, not verbatim).  Deterministic positives: every
    conversation is unioned with a mutant missing its final turn
    (id + 10M).  One conv_id exchange assembles base+mutant texts, then the
    fully distributed LSH pipeline (stages/dedup.py:minhash_dedup_pairs)
    with 32 bands x 2 rows: at the 0.8 verify threshold the per-pair miss
    probability is (1 - J^2)^32 <= 6e-15, so the output provably equals
    the all-pairs shingle-Jaccard filter the DuckDB oracle computes —
    value-checked, not rows-only.  Low-similarity candidate noise from the
    shallow bands is discarded by the exact verify step (precision is
    exact by construction; at production scale raise rows_per_band and
    the guaranteed-recall threshold together)."""
    from ocr_ray.pipelines.extract import build_turn_pipeline
    from ocr_ray.stages.dedup import minhash_dedup_pairs
    from ocr_ray.stages.join import exchange_map_partitions

    turns = build_turn_pipeline(_transcripts_for(sf_dir)).select_columns(
        ["conv_id", "turn_idx", "role", "clean_text"]
    )

    def conv_texts(t):
        # Arrow-native assembly (regex round-trip guard inside — a
        # conv_id format drift would silently collide base ids with the
        # +10M mutant id range)
        return _conv_texts_pa(t, with_mutants=True, id_name="cid")

    both = exchange_map_partitions(turns, "conv_id", conv_texts,
                                   n_partitions=None,
                                   batch_format="pyarrow")
    return minhash_dedup_pairs(
        both, n_perm=64, n_bands=32, shingle_k=3, threshold=0.8,
        text_col="text", id_col="cid", n_partitions=None,
    )


def _q_pipeline_sft(sf_dir: str):
    """End-to-end SFT curation composite — the full transcript-to-training
    -examples pipeline as ONE streaming job: flagship extraction →
    role-alternation gate (conversations with any adjacent same-role
    dialogue repeat are dropped entirely — malformed sessions) → SFT
    example construction (last-3-turns context window per assistant turn)
    → corpus-wide exact completion dedup, keep-first (templated replies
    collapse to their lexicographically first holder; empty completions
    dropped).  Three bounded exchanges total: conv_id (gate + examples
    fused in one partition pass), then completion-hash (16-byte keys +
    ids move, never payloads twice).  The oracle chains the same steps
    as CTEs over the golden table."""
    from ocr_ray.pipelines.extract import build_turn_pipeline
    from ocr_ray.stages.join import exchange_map_partitions

    turns = build_turn_pipeline(_transcripts_for(sf_dir)).select_columns(
        ["conv_id", "turn_idx", "role", "clean_text"]
    )

    def gated_examples(t):
        """Alternation gate + SFT example build, fused (the exchange
        already co-located every turn of a conversation) — the Arrow
        kernel end-to-end."""
        return _examples_pa(t, gate=True, drop_empty=True)

    examples = exchange_map_partitions(turns, "conv_id", gated_examples,
                                       n_partitions=None,
                                       batch_format="pyarrow")

    def hashed(t):
        import hashlib

        import pyarrow as pa

        if not t.num_rows:
            if "completion" not in t.schema.names:  # pre-map empty block
                return t
            return (t.append_column("_h", pa.array([], pa.string()))
                     .append_column("_key", pa.array([], pa.string())))
        hashes = [hashlib.sha256(s.encode()).hexdigest()[:16]
                  for s in t.column("completion").to_pylist()]
        return (t.append_column("_h", pa.array(hashes, pa.string()))
                 .append_column("_key", _conv_turn_key_pa(t)))

    def keep_first(t):
        import pyarrow.compute as pc

        drop = [c for c in ("_h", "_key") if c in t.schema.names]
        if not t.num_rows:
            return t.drop_columns(drop)
        # per-hash min key via group_by, then an Arrow hash-join back —
        # prompt/completion strings stay Arrow-packed through the kernel
        mins = t.group_by("_h", use_threads=False).aggregate(
            [("_key", "min")])
        j = t.join(mins, "_h")
        j = j.filter(pc.equal(j.column("_key"), j.column("_key_min")))
        return j.drop_columns(["_h", "_key", "_key_min"])

    return exchange_map_partitions(
        examples.map_batches(hashed, batch_format="pyarrow"),
        "_h", keep_first, n_partitions=None,
        batch_format="pyarrow",
    )


def _q_transcripts_packed(sf_dir: str):
    """Packed-batch layout with loss masks — the final artifact an SFT
    trainer consumes: every turn's exact global token offset and
    1024-token training bin under the canonical (conv_id, turn_idx)
    stream order, plus its trainable (assistant) flag.  Exact distributed
    prefix-sum with NO sort-shuffle and NO driver row data: conversations
    bucket by conv-index high bits (order-preserving), pass 1 reduces
    per-bucket token sums (64 ints to the driver), pass 2 exchanges by
    bucket and adds local cumsums to the driver's bucket offsets — the
    same scan shape as stages/shuffle.py:deterministic_pack, but in
    dialogue order so conversations stay contiguous in the packed
    stream."""
    import numpy as np
    import pandas as pd

    import ray.data as rd

    from ocr_ray.pipelines.extract import build_turn_pipeline
    from ocr_ray.stages.join import exchange_map_partitions

    BUDGET = 1024
    tdir = _transcripts_for(sf_dir)
    # max conv index from the raw table (one-column scan; no extraction)
    maxc = int(
        rd.read_parquet(tdir, columns=["conv_id"])
        .map_batches(
            lambda b: pd.DataFrame(
                {"c": [b["conv_id"].str[5:].astype("int64").max()]}),
            batch_format="pandas")
        .max("c")
    )
    shift = max(0, int(maxc + 1).bit_length() - 6)  # <= 64 buckets

    turns = build_turn_pipeline(tdir).select_columns(
        ["conv_id", "turn_idx", "role", "clean_text"]
    )

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        cint = b["conv_id"].str[5:].astype("int64")
        ntok = np.fromiter((len(t.split()) for t in b["clean_text"]),
                           dtype=np.int64, count=len(b))
        return pd.DataFrame({
            "conv_id": b["conv_id"],
            "turn_idx": b["turn_idx"].astype("int64"),
            "trainable": (b["role"] == "assistant").astype("int64"),
            "n_tokens": ntok,
            "_bucket": (cint.to_numpy() >> shift).astype("int64"),
        })

    # materialize the REDUCED per-turn table (5 scalar columns, no
    # payload text): it is consumed twice (bucket-sum pass + exchange)
    # and re-running the extraction pipeline per consumer would double
    # the query's compute
    kt = turns.map_batches(keyed, batch_format="pandas").materialize()

    def sum_buckets(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("_bucket")["n_tokens"].sum()
        return pd.DataFrame({"_bucket": g.index.to_numpy(dtype="int64"),
                             "s": g.to_numpy(dtype="int64")})

    sums = (kt.map_batches(sum_buckets, batch_format="pandas")
            .to_pandas().groupby("_bucket")["s"].sum())
    n_buckets = (maxc >> shift) + 1
    tok_offsets = np.zeros(n_buckets + 1, dtype=np.int64)
    tok_offsets[sums.index.to_numpy(dtype="int64") + 1] = sums.to_numpy()
    tok_offsets = np.cumsum(tok_offsets)

    def pack_partition(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "conv_id": pd.Series([], dtype="object"),
                "turn_idx": pd.Series([], dtype="int64"),
                "trainable": pd.Series([], dtype="int64"),
                "n_tokens": pd.Series([], dtype="int64"),
                "start_offset": pd.Series([], dtype="int64"),
                "bin": pd.Series([], dtype="int64"),
            })
        out = []
        for bk, grp in g.groupby("_bucket", sort=True):
            grp = grp.sort_values(["conv_id", "turn_idx"],
                                  kind="mergesort").copy()
            n = grp["n_tokens"].to_numpy(dtype="int64")
            grp["start_offset"] = tok_offsets[int(bk)] + np.concatenate(
                ([0], np.cumsum(n)[:-1]))
            out.append(grp)
        g = pd.concat(out, ignore_index=True)
        g["bin"] = g["start_offset"] // BUDGET
        return g.drop(columns=["_bucket"])

    return exchange_map_partitions(kt, "_bucket", pack_partition,
                                   n_partitions=None)


def _q_transcripts_toolflow(sf_dir: str):
    """Tool-transition matrix over the raw transcripts (agent telemetry:
    which tool follows which inside a conversation): for consecutive
    tool-role turns in turn order, count (prev_tool, tool) pairs
    corpus-wide, with '^' marking a conversation's first tool call.  One
    conv_id exchange computes per-partition transition partials (a
    bounded |tools|^2 table each), then a tiny pair aggregate."""
    import pandas as pd

    import ray.data as rd

    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.join import exchange_map_partitions

    ds = rd.read_parquet(
        _transcripts_for(sf_dir), columns=["conv_id", "turn_idx", "role", "tool"]
    ).filter(expr="role == 'tool'")

    def transitions(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"prev_tool": pd.Series([], dtype="object"),
                                 "tool": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        g = g.sort_values(["conv_id", "turn_idx"], kind="stable")
        prev = g.groupby("conv_id")["tool"].shift().fillna("^")
        out = pd.DataFrame({"prev_tool": prev, "tool": g["tool"], "n": 1})
        return out.groupby(["prev_tool", "tool"], as_index=False)["n"].sum()

    partials = exchange_map_partitions(ds, "conv_id", transitions,
                                       n_partitions=None)
    out = hash_aggregate(partials, keys=["prev_tool", "tool"],
                         aggs={"n": "sum"}, n_partitions=4)
    return out.map_batches(
        lambda b: b.assign(n=b["n"].astype("int64")), batch_format="pandas"
    )


def _q_transcripts_latency(sf_dir: str):
    """Response-latency telemetry from the timestamp column: for every
    adjacent user->assistant turn pair inside a conversation, the gap in
    exact microseconds; per conversation the response count and the
    sum/max gap (all int64 — no float averaging, so value-checked).  One
    conv_id exchange, vectorized groupby-shift inside the partition."""
    import pandas as pd

    import ray.data as rd

    from ocr_ray.stages.join import exchange_map_partitions

    ds = rd.read_parquet(
        _transcripts_for(sf_dir), columns=["conv_id", "turn_idx", "role", "ts"]
    )

    def stats(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "conv_id": pd.Series([], dtype="object"),
                "n_responses": pd.Series([], dtype="int64"),
                "sum_gap_us": pd.Series([], dtype="int64"),
                "max_gap_us": pd.Series([], dtype="int64"),
            })
        g = g.sort_values(["conv_id", "turn_idx"], kind="stable").copy()
        # integer microseconds end to end: float total_seconds() would
        # truncate inexact divisions (249us -> 248) and break the oracle
        g["_tsus"] = g["ts"].values.astype("datetime64[us]").astype("int64")
        by = g.groupby("conv_id")
        prev_role = by["role"].shift()
        prev_ts = by["_tsus"].shift().astype("Int64")
        m = (g["role"] == "assistant") & (prev_role == "user")
        gap = (g["_tsus"] - prev_ts)[m]
        d = pd.DataFrame({"conv_id": g["conv_id"][m],
                          "gap": gap.astype("int64")})
        if not len(d):
            return pd.DataFrame({
                "conv_id": pd.Series([], dtype="object"),
                "n_responses": pd.Series([], dtype="int64"),
                "sum_gap_us": pd.Series([], dtype="int64"),
                "max_gap_us": pd.Series([], dtype="int64"),
            })
        out = d.groupby("conv_id", as_index=False).agg(
            n_responses=("gap", "size"), sum_gap_us=("gap", "sum"),
            max_gap_us=("gap", "max"))
        for c in ("n_responses", "sum_gap_us", "max_gap_us"):
            out[c] = out[c].astype("int64")
        return out

    return exchange_map_partitions(ds, "conv_id", stats, n_partitions=None)


def _q_transcripts_split(sf_dir: str):
    """Leakage-safe train/val/test assignment at the CONVERSATION level
    (splitting at turn granularity leaks dialogue context across splits):
    deterministic 80/10/10 by the SQL-replicable polynomial hash of the
    conv_id string — zero shuffle for the assignment itself, one bounded
    conv aggregate for the per-conv turn counts.  Reproducible across
    runs, engines and cluster sizes (pure function of the key)."""
    import pandas as pd

    import ray.data as rd

    from ocr_ray.stages.aggregate import hash_aggregate
    from ocr_ray.stages.embed import hash_token

    ds = rd.read_parquet(_transcripts_for(sf_dir), columns=["conv_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("conv_id", as_index=False).size()
        return g.rename(columns={"size": "n_turns"})

    agg = hash_aggregate(ds.map_batches(partial, batch_format="pandas"),
                         keys=["conv_id"], aggs={"n_turns": "sum"},
                         n_partitions=None)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        buckets = b["conv_id"].map(lambda c: hash_token(c) % 100)
        split = buckets.map(
            lambda x: "train" if x < 80 else ("val" if x < 90 else "test"))
        return pd.DataFrame({
            "conv_id": b["conv_id"],
            "split": split.astype("object"),
            "n_turns": b["n_turns"].astype("int64"),
        })

    return agg.map_batches(assign, batch_format="pandas")


def _q_transcripts_decontaminate(sf_dir: str):
    """Cross-split contamination guard at the CONVERSATION level: every
    val/test conversation sharing ANY 3-word shingle of its assembled
    dialogue text with any train conversation is flagged (the leakage
    check run before an eval set is trusted).  Splits are the SAME pure
    conv_id-hash assignment as transcripts_split, so no side table
    ships; boilerplate shingles held by > 50 conversations are excluded
    (the skew guard — role-tag/error-template shingles would otherwise
    flag everything AND pile one partition).  One conv exchange builds
    texts, then the shingle-hash exchange of
    stages/dedup.py:cross_split_contamination."""
    import numpy as np

    from ocr_ray.pipelines.extract import build_turn_pipeline
    from ocr_ray.stages.dedup import cross_split_contamination
    from ocr_ray.stages.embed import hash_token
    from ocr_ray.stages.join import exchange_map_partitions

    turns = build_turn_pipeline(_transcripts_for(sf_dir)).select_columns(
        ["conv_id", "turn_idx", "role", "clean_text"]
    )

    def conv_texts(t):
        # Arrow-native assembly; split_of below re-derives conv_id
        # strings from the parsed ints, and the kernel's regex guard
        # fails loudly if the id format ever drifts (a silent round-trip
        # mismatch would mis-bucket the leakage guard)
        return _conv_texts_pa(t, id_name="doc_id")

    convs = exchange_map_partitions(turns, "conv_id", conv_texts,
                                    n_partitions=None,
                                    batch_format="pyarrow")

    def split_of(ids: np.ndarray):
        buckets = np.array([hash_token(f"conv-{int(i):08d}") % 100
                            for i in ids])
        labels = np.where(buckets < 80, "train",
                          np.where(buckets < 90, "val", "test"))
        return buckets < 80, labels

    return cross_split_contamination(convs, split_of, shingle_k=3,
                                     n_partitions=None, max_df=50)


def _q_transcripts_contract(sf_dir: str):
    """Data-contract gate over the raw transcript table
    (stages/validate.py:contract_check): one summary row of violation
    counts — nulls per column, negative/null turn indices, out-of-enum
    roles, null timestamps, oversized payloads.  One scan, one small row
    per batch to the reduce; the ingest-shard quarantine check."""
    import ray.data as rd

    from ocr_ray.stages.validate import contract_check

    ds = rd.read_parquet(_transcripts_for(sf_dir))
    return contract_check(ds)


def transcripts_oracle_sql(sf_dir: str) -> dict[str, str]:
    """Golden-table oracles for the synthesized-transcript pipelines,
    parameterized by sf tier (the registered strings bake the driver's
    sf0.01 paths; tools/check_oracles rebuilds them per tier).  Calling
    this also guarantees the golden tables exist before the SQL runs."""
    root = os.path.dirname(_transcripts_for(sf_dir))
    return {
        "transcripts_parity": f"""
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
       expected_extracted AS extracted_text, expected_clean AS clean_text
FROM read_parquet('{root}/oracle/*.parquet')
""",
        # conv_text = '[role] clean' turns joined with blank lines in
        # turn order — same associative-join format as stages/reassemble
        "transcripts_convs": f"""
WITH t AS (SELECT conv_id, turn_idx, role
           FROM read_parquet('{root}/transcripts/*.parquet')),
o AS (SELECT conv_id, turn_idx, expected_clean
      FROM read_parquet('{root}/oracle/*.parquet')),
j AS (SELECT t.conv_id, t.turn_idx,
             '[' || t.role || '] ' || o.expected_clean AS fmt
      FROM t JOIN o USING (conv_id, turn_idx))
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
       string_agg(fmt, e'\n\n' ORDER BY turn_idx) AS conv_text
FROM j GROUP BY conv_id
""",
        "transcripts_mask": f"""
WITH t AS (SELECT conv_id, turn_idx, role
           FROM read_parquet('{root}/transcripts/*.parquet')),
o AS (SELECT conv_id, turn_idx, expected_clean
      FROM read_parquet('{root}/oracle/*.parquet')),
j AS (SELECT t.conv_id, t.role, o.expected_clean
      FROM t JOIN o USING (conv_id, turn_idx))
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
  CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_train_turns,
  CAST(sum(CASE WHEN role = 'assistant' THEN len(expected_clean) ELSE 0 END)
    AS BIGINT) AS train_chars,
  CAST(sum(len(expected_clean)) AS BIGINT) AS total_chars
FROM j GROUP BY conv_id
""",
        "transcripts_toolstats": f"""
SELECT tool, CAST(count(*) AS BIGINT) AS n_calls,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
       CAST(sum(turn_idx) AS BIGINT) AS sum_turn_idx
FROM read_parquet('{root}/transcripts/*.parquet')
WHERE role = 'tool' GROUP BY tool
""",
        "transcripts_alternation": f"""
WITH t AS (SELECT conv_id, turn_idx, role
           FROM read_parquet('{root}/transcripts/*.parquet')),
base AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
    CAST(max(CASE WHEN turn_idx = 0 AND role = 'system' THEN 1 ELSE 0 END)
         AS BIGINT) AS starts_system
    FROM t GROUP BY conv_id),
d AS (SELECT conv_id, role,
    lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS pr
    FROM t WHERE role IN ('user', 'assistant')),
dia AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_dialogue,
    CAST(sum(CASE WHEN role = pr THEN 1 ELSE 0 END) AS BIGINT) AS n_breaks
    FROM d GROUP BY conv_id)
SELECT base.conv_id, base.n_turns,
    COALESCE(dia.n_dialogue, 0) AS n_dialogue,
    COALESCE(dia.n_breaks, 0) AS n_breaks,
    base.starts_system
FROM base LEFT JOIN dia USING (conv_id)
""",
        "transcripts_sft": f"""
WITH t AS (SELECT conv_id, turn_idx, role
           FROM read_parquet('{root}/transcripts/*.parquet')),
o AS (SELECT conv_id, turn_idx, expected_clean
      FROM read_parquet('{root}/oracle/*.parquet')),
j AS (SELECT t.conv_id, t.turn_idx, t.role, o.expected_clean,
             '[' || t.role || '] ' || o.expected_clean AS fmt
      FROM t JOIN o USING (conv_id, turn_idx)),
w AS (SELECT conv_id, turn_idx, role, expected_clean,
    lag(fmt, 1) OVER win AS p1,
    lag(fmt, 2) OVER win AS p2,
    lag(fmt, 3) OVER win AS p3
    FROM j WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx))
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
       concat_ws(chr(10), p3, p2, p1) AS prompt,
       expected_clean AS completion
FROM w WHERE role = 'assistant'
""",
        "transcripts_turn_dedup": f"""
WITH t AS (SELECT conv_id, turn_idx, role
           FROM read_parquet('{root}/transcripts/*.parquet')),
o AS (SELECT conv_id, turn_idx, expected_clean
      FROM read_parquet('{root}/oracle/*.parquet')),
j AS (SELECT t.conv_id, t.turn_idx, o.expected_clean
      FROM t JOIN o USING (conv_id, turn_idx)
      WHERE t.role = 'assistant' AND o.expected_clean <> '')
SELECT min(conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 6, '0'))
         AS first_key,
       CAST(count(*) AS BIGINT) AS n_copies
FROM j GROUP BY expected_clean HAVING count(*) >= 2
""",
        # conversation near-dup: all-pairs shingle Jaccard >= 0.8 over the
        # base + drop-last-turn-mutant union (sparse shingle self-join —
        # the LSH pipeline's guaranteed-recall output must equal it)
        "transcripts_convdedup": f"""
WITH t AS (SELECT conv_id, turn_idx, role
           FROM read_parquet('{root}/transcripts/*.parquet')),
o AS (SELECT conv_id, turn_idx, expected_clean
      FROM read_parquet('{root}/oracle/*.parquet')),
j AS (SELECT t.conv_id, t.turn_idx,
             '[' || t.role || '] ' || o.expected_clean AS fmt,
             max(t.turn_idx) OVER (PARTITION BY t.conv_id) AS mx
      FROM t JOIN o USING (conv_id, turn_idx)),
base AS (SELECT CAST(substr(conv_id, 6) AS BIGINT) AS id,
                string_agg(fmt, e'\n\n' ORDER BY turn_idx) AS text
         FROM j GROUP BY conv_id),
mut AS (SELECT CAST(substr(conv_id, 6) AS BIGINT) + 10000000 AS id,
               string_agg(fmt, e'\n\n' ORDER BY turn_idx) AS text
        FROM j WHERE turn_idx < mx GROUP BY conv_id),
u AS (SELECT * FROM base UNION ALL SELECT * FROM mut),
ww AS (SELECT id, string_split_regex(trim(text), '\\s+') AS w FROM u),
s AS (SELECT id,
        CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
             ELSE list_distinct(list_transform(generate_series(1, len(w) - 2),
                                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) END AS sh
      FROM ww),
sz AS (SELECT id, len(sh) AS n FROM s),
f AS (SELECT id, unnest(sh) AS g FROM s),
inter AS (SELECT a.id AS l, b.id AS r, count(*) AS i
          FROM f a JOIN f b ON a.g = b.g AND a.id < b.id
          GROUP BY a.id, b.id)
SELECT CAST(l AS BIGINT) AS left_id, CAST(r AS BIGINT) AS right_id,
  round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
FROM inter JOIN sz sa ON sa.id = l JOIN sz sb ON sb.id = r
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
""",
        # the SFT curation composite, chained as CTEs: alternation gate ->
        # example build (lag window) -> keep-first completion dedup
        "pipeline_sft": f"""
WITH t AS (SELECT conv_id, turn_idx, role
           FROM read_parquet('{root}/transcripts/*.parquet')),
o AS (SELECT conv_id, turn_idx, expected_clean
      FROM read_parquet('{root}/oracle/*.parquet')),
d AS (SELECT conv_id, role,
        lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS pr
      FROM t WHERE role IN ('user', 'assistant')),
bad AS (SELECT DISTINCT conv_id FROM d WHERE role = pr),
j AS (SELECT t.conv_id, t.turn_idx, t.role, o.expected_clean,
             '[' || t.role || '] ' || o.expected_clean AS fmt
      FROM t JOIN o USING (conv_id, turn_idx)
      WHERE t.conv_id NOT IN (SELECT conv_id FROM bad)),
w AS (SELECT conv_id, turn_idx, role, expected_clean,
        lag(fmt, 1) OVER win AS p1,
        lag(fmt, 2) OVER win AS p2,
        lag(fmt, 3) OVER win AS p3
      FROM j WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx)),
ex AS (SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
         concat_ws(chr(10), p3, p2, p1) AS prompt,
         expected_clean AS completion,
         conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 6, '0') AS key
       FROM w WHERE role = 'assistant' AND expected_clean <> '')
SELECT conv_id, turn_idx, prompt, completion
FROM ex QUALIFY key = min(key) OVER (PARTITION BY completion)
""",
        # packed layout: exact global prefix sum of per-turn token counts
        # in (conv_id, turn_idx) stream order
        "transcripts_packed": f"""
WITH t AS (SELECT conv_id, turn_idx, role
           FROM read_parquet('{root}/transcripts/*.parquet')),
o AS (SELECT conv_id, turn_idx, expected_clean
      FROM read_parquet('{root}/oracle/*.parquet')),
n AS (SELECT t.conv_id, CAST(t.turn_idx AS BIGINT) AS turn_idx,
        CAST(CASE WHEN t.role = 'assistant' THEN 1 ELSE 0 END AS BIGINT)
          AS trainable,
        CAST(CASE WHEN trim(o.expected_clean) = '' THEN 0
             ELSE len(string_split_regex(trim(o.expected_clean), '\\s+'))
             END AS BIGINT) AS n_tokens
      FROM t JOIN o USING (conv_id, turn_idx)),
w AS (SELECT conv_id, turn_idx, trainable, n_tokens,
        CAST(COALESCE(sum(n_tokens) OVER (ORDER BY conv_id, turn_idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          AS start_offset
      FROM n)
SELECT conv_id, turn_idx, trainable, n_tokens, start_offset,
       CAST(start_offset // 1024 AS BIGINT) AS bin
FROM w
""",
        "transcripts_toolflow": f"""
WITH t AS (SELECT conv_id, turn_idx, tool
           FROM read_parquet('{root}/transcripts/*.parquet')
           WHERE role = 'tool'),
w AS (SELECT conv_id, tool,
        COALESCE(lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx),
                 '^') AS prev_tool
      FROM t)
SELECT prev_tool, tool, CAST(count(*) AS BIGINT) AS n
FROM w GROUP BY prev_tool, tool
""",
        "transcripts_latency": f"""
WITH t AS (SELECT conv_id, turn_idx, role, ts
           FROM read_parquet('{root}/transcripts/*.parquet')),
w AS (SELECT conv_id, role, ts,
        lag(role) OVER win AS pr, lag(ts) OVER win AS pts
      FROM t WINDOW win AS (PARTITION BY conv_id ORDER BY turn_idx)),
g AS (SELECT conv_id,
        CAST(date_diff('microsecond', pts, ts) AS BIGINT) AS gap
      FROM w WHERE role = 'assistant' AND pr = 'user')
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_responses,
       CAST(sum(gap) AS BIGINT) AS sum_gap_us,
       CAST(max(gap) AS BIGINT) AS max_gap_us
FROM g GROUP BY conv_id
""",
        "transcripts_split": f"""
WITH c AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns
           FROM read_parquet('{root}/transcripts/*.parquet')
           GROUP BY conv_id),
h AS (SELECT conv_id, n_turns,
        list_reduce(list_prepend(CAST(7 AS BIGINT),
            list_transform(string_split(conv_id, ''),
                           ch -> CAST(unicode(ch) AS BIGINT))),
            (a, b) -> (a * 31 + b) % 1000003) % 100 AS bucket
      FROM c)
SELECT conv_id,
  CASE WHEN bucket < 80 THEN 'train'
       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
  n_turns
FROM h
""",
        # conv-level leakage: identical PolySimHasher 62-bit shingle
        # features over assembled conv texts, same conv_id-hash split as
        # transcripts_split, df<=50 boilerplate gate
        "transcripts_decontaminate": f"""
WITH t AS (SELECT conv_id, turn_idx, role
           FROM read_parquet('{root}/transcripts/*.parquet')),
o AS (SELECT conv_id, turn_idx, expected_clean
      FROM read_parquet('{root}/oracle/*.parquet')),
j AS (SELECT t.conv_id, t.turn_idx,
             '[' || t.role || '] ' || o.expected_clean AS fmt
      FROM t JOIN o USING (conv_id, turn_idx)),
u AS (SELECT CAST(substr(conv_id, 6) AS BIGINT) AS id,
             list_reduce(list_prepend(CAST(7 AS BIGINT),
                 list_transform(string_split(conv_id, ''),
                                ch -> CAST(unicode(ch) AS BIGINT))),
                 (a, b) -> (a * 31 + b) % 1000003) % 100 AS bucket,
             string_agg(fmt, e'\n\n' ORDER BY turn_idx) AS text
      FROM j GROUP BY conv_id),
ww AS (SELECT id, bucket, string_split_regex(trim(text), '\\s+') AS w FROM u),
th AS (SELECT id, bucket, len(w) AS n,
   list_transform(w, tok -> list_reduce(list_prepend(CAST(7 AS BIGINT),
       list_transform(string_split(tok, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 31 + b) % 1000003)) AS t1,
   list_transform(w, tok -> list_reduce(list_prepend(CAST(11 AS BIGINT),
       list_transform(string_split(tok, ''), c -> CAST(unicode(c) AS BIGINT))),
       (a, b) -> (a * 37 + b) % 1000033)) AS t2
 FROM ww),
feats AS (SELECT id, bucket,
   CASE WHEN n < 3 THEN
     [ list_reduce(list_prepend(CAST(0 AS BIGINT), t1), (a, b) -> (a * 1000003 + b) % 2147483647)
       + list_reduce(list_prepend(CAST(0 AS BIGINT), t2), (a, b) -> (a * 1000033 + b) % 2147483647) * 2147483648 ]
   ELSE
     list_distinct(list_transform(generate_series(1, n - 2), i ->
       ((t1[i] * 1000003 + t1[i+1]) % 2147483647 * 1000003 + t1[i+2]) % 2147483647
       + ((t2[i] * 1000033 + t2[i+1]) % 2147483647 * 1000033 + t2[i+2]) % 2147483647 * 2147483648))
   END AS h
 FROM th),
f AS (SELECT id, bucket, unnest(h) AS h FROM feats),
fd AS (SELECT h FROM (SELECT h, count(DISTINCT id) AS df FROM f GROUP BY h)
       WHERE df <= 50),
fg AS (SELECT f.id, f.bucket, f.h FROM f JOIN fd USING (h)),
tr AS (SELECT DISTINCT h FROM fg WHERE bucket < 80)
SELECT DISTINCT fg.id AS doc_id,
       CASE WHEN fg.bucket < 90 THEN 'val' ELSE 'test' END AS split
FROM fg
WHERE fg.bucket >= 80 AND fg.h IN (SELECT h FROM tr)
""",
        "transcripts_contract": f"""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN conv_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_conv_id,
  CAST(sum(CASE WHEN role IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_role,
  CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_text,
  CAST(sum(CASE WHEN tool IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_tool,
  CAST(sum(CASE WHEN COALESCE(turn_idx, 0) < 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg_idx,
  CAST(sum(CASE WHEN turn_idx IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_idx,
  CAST(sum(CASE WHEN role NOT IN ('system', 'user', 'assistant', 'tool')
                 AND role IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS bad_enum,
  CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ts,
  CAST(sum(CASE WHEN len(COALESCE(text, '')) > 1048576 THEN 1 ELSE 0 END)
       AS BIGINT) AS oversize_text
FROM read_parquet('{root}/transcripts/*.parquet')
""",
    }


def entry() -> Any:
    """Flagship pipeline on a deterministic sf0.001-scale transcript table."""
    return _q_transcripts_extract("/root/testdata/sf0.001")


def _q_transcripts_model_rescore(sf_dir: str):
    """A4 model-backed best-of-N over the flagship extraction: the ridge
    scorer artifact (built once, deterministic) replaces the heuristic
    score inside the Extractor actors via PipelineConfig.model_artifact —
    loaded once per actor in Extractor.__init__ (the reference's VLM
    load-once contract).  Returns per-engine win counts; rows-only check
    (engine choice isn't SQL-expressible), semantics pinned by
    tests/test_model_engine.py."""
    import pandas as pd

    from ocr_ray.config import PipelineConfig
    from ocr_ray.pipelines.extract import build_turn_pipeline
    from ocr_ray.pipelines.queries import _ensure_model_artifact
    from ocr_ray.stages.aggregate import hash_aggregate

    cfg = PipelineConfig(model_artifact=_ensure_model_artifact())
    ds = build_turn_pipeline(_transcripts_for(sf_dir), config=cfg)

    def count(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("engine", as_index=False).size()
        return g.rename(columns={"size": "n"})

    out = hash_aggregate(
        ds.map_batches(count, batch_format="pandas"),
        keys=["engine"], aggs={"n": "sum"}, n_partitions=4,
    ).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("engine").reset_index(drop=True)


def _q_transcripts_dpo_pairs(sf_dir: str):
    """DPO-style preference-pair builder from best-of-N engine
    disagreement: every turn runs all three extraction engines, each
    output is scored with the reference quality scorer
    (functions/scoring.py:score_ocr_result, src/ocr_module.py:448-476
    semantics); chosen = highest-scoring output, rejected = lowest
    (ties break by engine registry order, so the pair is a pure
    function of the payload), and turns where every engine agrees emit
    nothing.  A pure per-row actor-pool map — zero shuffle; the margin
    ships as exact ppm int64.  Rows-only driver check (engine outputs
    aren't SQL-expressible); tests/test_wave5_ops.py value-checks the
    pair semantics against a direct-function replica."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    class PairBuilder:
        def __init__(self):
            from ocr_ray.functions.scoring import score_ocr_result
            from ocr_ray.stages.extract import ENGINES

            self.engines = [(n, ENGINES[n])
                            for n in ("tagstrip", "density", "domtree")]
            self.score = score_ocr_result

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for conv_id, turn_idx, payload in zip(
                b["conv_id"], b["turn_idx"], b["text"]
            ):
                outs = []
                for name, fn in self.engines:
                    try:
                        t = fn(payload)
                    except Exception:
                        t = ""
                    outs.append((name, t, self.score(t)))
                best = max(outs, key=lambda o: o[2])   # first maximal:
                worst = min(outs, key=lambda o: o[2])  # registry-order tie
                if best[1] == worst[1]:
                    continue
                rows.append({
                    "conv_id": conv_id,
                    "turn_idx": int(turn_idx),
                    "chosen_engine": best[0],
                    "rejected_engine": worst[0],
                    "chosen": best[1],
                    "rejected": worst[1],
                    "margin_ppm": int(np.floor(
                        (best[2] - worst[2]) * 1e6 + 0.5)),
                })
            cols = ["conv_id", "turn_idx", "chosen_engine",
                    "rejected_engine", "chosen", "rejected", "margin_ppm"]
            if not rows:
                return pd.DataFrame({
                    "conv_id": pd.Series(dtype="object"),
                    "turn_idx": pd.Series(dtype="int64"),
                    "chosen_engine": pd.Series(dtype="object"),
                    "rejected_engine": pd.Series(dtype="object"),
                    "chosen": pd.Series(dtype="object"),
                    "rejected": pd.Series(dtype="object"),
                    "margin_ppm": pd.Series(dtype="int64"),
                })
            out = pd.DataFrame(rows)[cols]
            out["turn_idx"] = out["turn_idx"].astype("int64")
            out["margin_ppm"] = out["margin_ppm"].astype("int64")
            return out

    ds = rd.read_parquet(_transcripts_for(sf_dir),
                         columns=["conv_id", "turn_idx", "text"])
    return ds.map_batches(PairBuilder, concurrency=4,
                          batch_format="pandas")


def queries() -> dict[str, Callable[[str], Any]]:
    from ocr_ray.pipelines.queries import queries as _queries

    q = dict(_queries())
    q["transcripts_extract"] = _q_transcripts_extract
    q["transcripts_convs"] = _q_transcripts_convs
    q["transcripts_segments"] = _q_transcripts_segments
    q["transcripts_benchmark"] = _q_transcripts_benchmark
    q["transcripts_parity"] = _q_transcripts_parity
    q["transcripts_mask"] = _q_transcripts_mask
    q["transcripts_toolstats"] = _q_transcripts_toolstats
    q["transcripts_alternation"] = _q_transcripts_alternation
    q["transcripts_sft"] = _q_transcripts_sft
    q["transcripts_turn_dedup"] = _q_transcripts_turn_dedup
    q["transcripts_convdedup"] = _q_transcripts_convdedup
    q["pipeline_sft"] = _q_pipeline_sft
    q["transcripts_packed"] = _q_transcripts_packed
    q["transcripts_toolflow"] = _q_transcripts_toolflow
    q["transcripts_latency"] = _q_transcripts_latency
    q["transcripts_split"] = _q_transcripts_split
    q["transcripts_decontaminate"] = _q_transcripts_decontaminate
    q["transcripts_contract"] = _q_transcripts_contract
    q["transcripts_model_rescore"] = _q_transcripts_model_rescore
    q["transcripts_dpo_pairs"] = _q_transcripts_dpo_pairs
    return q


def oracle_sql() -> dict[str, str]:
    from ocr_ray.pipelines.queries import ORACLE_SQL

    d = dict(ORACLE_SQL)
    # driver compares at sf0.01; the helper also (re)generates the golden
    # tables so the SQL is runnable regardless of query/oracle order
    d.update(transcripts_oracle_sql("/root/testdata/sf0.01"))
    return d
