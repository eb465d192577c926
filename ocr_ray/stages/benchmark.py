"""Accuracy benchmark operator (``src/ocr_benchmark.py:21-130`` analog).

The reference benchmarks every image x engine x layout-mode against a
ground-truth CSV with ``SequenceMatcher.ratio``.  Grafted: the "images" are
transcript turn payloads, the ground truth is the generator's oracle table
(expected extraction per turn), and the run is a Ray pipeline — oracle and
payload sides meet through the bounded hash exchange (exchange_join on a
composite turn key), then an actor-pool stage times every engine in both
layout modes and scores similarity.

Output schema (one row per turn x engine x layout mode — the reference's
results-DataFrame columns, ``src/ocr_benchmark.py:104-124``):
    conv_id, turn_idx, engine, layout_preserved, processing_time,
    text_length, accuracy, has_table
"""

from __future__ import annotations

import time
from difflib import SequenceMatcher
from typing import List

import pandas as pd

import ray.data as rd


def calculate_similarity(a: str, b: str) -> float:
    """``src/ocr_benchmark.py:21-25`` verbatim semantics (0 on empty).

    Returns float 0.0 (not int 0): a block whose rows ALL hit the empty
    branch would otherwise carry an int64 ``accuracy`` column, and the
    downstream exchange's ``pa.concat_tables`` raises ArrowTypeError on
    int64-vs-double block mixes."""
    if not a or not b:
        return 0.0
    return SequenceMatcher(None, a, b).ratio()


class EngineBenchmark:
    """Actor-pool stage: per turn, run every configured engine with and
    without layout preservation (plain mode collapses newlines — the
    non-layout OCR analog), score vs ground truth.

    ``max_chars`` bounds the quadratic ``SequenceMatcher`` cost per record
    (both sides truncated): the reference scores page-sized OCR outputs;
    unbounded ratio() on 32 KB oversized payloads is O(n^2) and would
    dominate the whole benchmark at scale."""

    def __init__(self, engines: tuple = ("tagstrip", "density", "domtree"),
                 max_chars: int = 4096):
        from ocr_ray.stages.extract import ENGINES, detect_aligned_table

        self.engines = [(name, ENGINES[name]) for name in engines]
        self.detect_table = detect_aligned_table
        self.max_chars = max_chars

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows: List[dict] = []
        for conv_id, turn_idx, payload, gt in zip(
            batch["conv_id"], batch["turn_idx"], batch["text"], batch["expected"]
        ):
            has_table = self.detect_table(payload)
            for name, fn in self.engines:
                t0 = time.perf_counter()
                try:
                    formatted = fn(payload)
                except Exception:
                    formatted = ""
                format_time = time.perf_counter() - t0
                t0 = time.perf_counter()
                plain = " ".join(formatted.split())
                plain_time = format_time + (time.perf_counter() - t0)
                gt_plain = " ".join(gt.split())
                acc_fmt = None
                for preserved, text, secs in (
                    (True, formatted, format_time),
                    (False, plain, plain_time),
                ):
                    gt_cmp = gt if preserved else gt_plain
                    if preserved:
                        acc = acc_fmt = calculate_similarity(
                            text[: self.max_chars], gt_cmp[: self.max_chars]
                        )
                    elif text == formatted and gt_cmp == gt:
                        # single-line payload: plain mode compares the exact
                        # same pair — reuse instead of re-running the O(n^2)
                        # SequenceMatcher (value-identical by construction)
                        acc = acc_fmt
                    else:
                        acc = calculate_similarity(
                            text[: self.max_chars], gt_cmp[: self.max_chars]
                        )
                    rows.append(
                        {
                            "conv_id": conv_id,
                            "turn_idx": int(turn_idx),
                            "engine": name,
                            "layout_preserved": preserved,
                            "processing_time": round(secs, 6),
                            "text_length": len(text),
                            "accuracy": round(acc, 6),
                            "has_table": has_table,
                        }
                    )
        return pd.DataFrame(
            rows,
            columns=[
                "conv_id", "turn_idx", "engine", "layout_preserved",
                "processing_time", "text_length", "accuracy", "has_table",
            ],
        )


def benchmark_engines(
    transcripts_dir: str,
    oracle_dir: str,
    engines: tuple = ("tagstrip", "density", "domtree"),
    n_partitions: "int | None" = None,
    concurrency: int = 4,
) -> "rd.Dataset":
    """Distributed engine benchmark: join payloads with ground truth on the
    composite turn key via the hash exchange, then fan the engine matrix out
    over an actor pool."""
    from ocr_ray.stages.join import exchange_join

    def key_payload(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "_k": b["conv_id"].astype(str) + ":" + b["turn_idx"].astype(str),
                "conv_id": b["conv_id"],
                "turn_idx": b["turn_idx"],
                "text": b["text"],
            }
        )

    def key_oracle(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "_k": b["conv_id"].astype(str) + ":" + b["turn_idx"].astype(str),
                "expected": b["expected_extracted"],
            }
        )

    turns = rd.read_parquet(
        transcripts_dir, columns=["conv_id", "turn_idx", "text"]
    ).map_batches(key_payload, batch_format="pandas")
    oracle = rd.read_parquet(
        oracle_dir, columns=["conv_id", "turn_idx", "expected_extracted"]
    ).map_batches(key_oracle, batch_format="pandas")
    from ocr_ray.stages.taskpool import task_pool

    joined = exchange_join(turns, oracle, on="_k", n_partitions=n_partitions)
    return joined.map_batches(
        task_pool(EngineBenchmark, engines=engines), batch_format="pandas"
    )


def benchmark_summary(results: "rd.Dataset") -> pd.DataFrame:
    """Per engine x layout mode: n, mean accuracy, mean time — the
    reference's printed summary table (``src/ocr_benchmark.py:132-160``)."""
    from ocr_ray.stages.aggregate import hash_aggregate

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(n=1)
        return b.groupby(["engine", "layout_preserved"], as_index=False).agg(
            n=("n", "sum"), acc_sum=("accuracy", "sum"), time_sum=("processing_time", "sum")
        )

    agg = hash_aggregate(
        results.map_batches(partial, batch_format="pandas"),
        keys=["engine", "layout_preserved"],
        aggs={"n": "sum", "acc_sum": "sum", "time_sum": "sum"},
        n_partitions=8,
    ).to_pandas()
    if not len(agg) or "acc_sum" not in agg.columns:
        # empty results (e.g. disjoint payload/oracle keys): to_pandas()
        # on an all-empty Dataset drops columns — rebuild the typed empty
        return pd.DataFrame({
            "engine": pd.Series(dtype="object"),
            "layout_preserved": pd.Series(dtype="bool"),
            "n": pd.Series(dtype="int64"),
            "mean_accuracy": pd.Series(dtype="float64"),
            "mean_time": pd.Series(dtype="float64"),
        })
    agg["mean_accuracy"] = (agg["acc_sum"] / agg["n"]).round(6)
    agg["mean_time"] = (agg["time_sum"] / agg["n"]).round(6)
    return agg.drop(columns=["acc_sum", "time_sum"]).sort_values(
        ["engine", "layout_preserved"]
    ).reset_index(drop=True)
