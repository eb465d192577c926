"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship transcript-extraction pipeline on a small
deterministic synthetic transcript table; ``queries()`` exposes one callable
per implemented operator (SURVEY §2 / COVERAGE.md) over the sf parquet
tables; ``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible query.  Rows-only entries (each with a pytest covering its
semantics instead): ann_ivf / ann_lsh_topk (genuinely approximate —
recall-vs-brute-force pytests), rag_embed_answer (reference-verbatim
np.argsort tie order on heavily tied chunk sims — replica pytest; measured
150+ docs with exact top-rank ties, so no SQL ordering can match), and
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
        n_partitions=16,
    )

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        for c in ("n_turns", "n_train_turns", "train_chars", "total_chars"):
            b[c] = b[c].astype("int64")
        return b

    return out.map_batches(cast, batch_format="pandas")


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
    }


def entry() -> Any:
    """Flagship pipeline on a deterministic sf0.001-scale transcript table."""
    return _q_transcripts_extract("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from ocr_ray.pipelines.queries import queries as _queries

    q = dict(_queries())
    q["transcripts_extract"] = _q_transcripts_extract
    q["transcripts_convs"] = _q_transcripts_convs
    q["transcripts_segments"] = _q_transcripts_segments
    q["transcripts_benchmark"] = _q_transcripts_benchmark
    q["transcripts_parity"] = _q_transcripts_parity
    q["transcripts_mask"] = _q_transcripts_mask
    return q


def oracle_sql() -> dict[str, str]:
    from ocr_ray.pipelines.queries import ORACLE_SQL

    d = dict(ORACLE_SQL)
    # driver compares at sf0.01; the helper also (re)generates the golden
    # tables so the SQL is runnable regardless of query/oracle order
    d.update(transcripts_oracle_sql("/root/testdata/sf0.01"))
    return d
